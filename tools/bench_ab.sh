#!/usr/bin/env bash
# Interleaved A/B benchmark of HEAD vs a baseline sha — the controlled
# protocol AB_r16.json ran by hand, as one command (round-16 verdict #6).
#
#   tools/bench_ab.sh <baseline-sha> [sweeps] [sf-dir]
#
# Builds the baseline in a git worktree, then alternates full single-run
# sweeps HEAD, BASE, HEAD, BASE ... (default 2 each) on the same machine
# within the same window, so ambient contention hits both trees alike.
# Per-query best-of-sweeps per tree are merged by tools/bench_ab_merge.py
# into an ab block (ratio on the common query set, top regressions);
# re-running graft.Bench with SPARK_GRAFT_BENCH_AB_FILE pointing at the
# merged file embeds the block into bench_detail.json, so the round's
# BENCH artifact carries the adjudication.
set -euo pipefail

SHA="${1:?usage: tools/bench_ab.sh <baseline-sha> [sweeps] [sf-dir]}"
SWEEPS="${2:-2}"
SF_DIR="${3:-${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WT="/tmp/graft-ab-$SHA"
OUT="/tmp/graft-ab-out"
mkdir -p "$OUT"

if [ ! -d "$WT" ]; then
  git -C "$REPO" worktree add --detach "$WT" "$SHA"
fi
echo "[ab] building baseline $SHA in $WT ..."
(cd "$WT" && sbt -batch compile > /dev/null)
echo "[ab] building HEAD ..."
(cd "$REPO" && sbt -batch compile > /dev/null)

run_sweep() { # $1=tree dir, $2=detail output path
  (cd "$1" && SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_BENCH_RUNS=1 \
    SPARK_GRAFT_BENCH_DETAIL="$2" sbt -batch "runMain graft.Bench" \
    | grep '"metric"' || true)
}

for i in $(seq 1 "$SWEEPS"); do
  echo "[ab] sweep $i/$SWEEPS: HEAD"
  run_sweep "$REPO" "$OUT/head_$i.json"
  echo "[ab] sweep $i/$SWEEPS: BASE $SHA"
  run_sweep "$WT" "$OUT/base_$i.json"
done

HEAD_SHA="$(git -C "$REPO" rev-parse --short HEAD)"
python3 "$REPO/tools/bench_ab_merge.py" \
  --head-sha "$HEAD_SHA" --base-sha "$SHA" --out "$OUT/ab.json" \
  --head "$OUT"/head_*.json --base "$OUT"/base_*.json
echo "[ab] merged: $OUT/ab.json — embed with SPARK_GRAFT_BENCH_AB_FILE=$OUT/ab.json"
