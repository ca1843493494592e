#!/usr/bin/env python3
"""Merge interleaved A/B bench sweeps into one ab block (see
tools/bench_ab.sh). Per tree, a query's time is the MIN across sweeps
(best-of-N, the contention-robust statistic); the headline ratio is over
the COMMON green query set so added/removed queries cannot skew it."""
import argparse, json


def load(paths):
    per = {}
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        for q, row in d.get("queries", {}).items():
            if row.get("err") is None and row.get("min") is not None:
                per.setdefault(q, []).append(row["min"])
    return {q: min(v) for q, v in per.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--head-sha", required=True)
    ap.add_argument("--base-sha", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--head", nargs="+", required=True)
    ap.add_argument("--base", nargs="+", required=True)
    a = ap.parse_args()

    head, base = load(a.head), load(a.base)
    common = sorted(set(head) & set(base))
    ht = round(sum(head[q] for q in common), 3)
    bt = round(sum(base[q] for q in common), 3)
    per_q = {
        q: {
            "head": head[q],
            "base": base[q],
            "ratio": round(head[q] / base[q], 3) if base[q] > 0 else None,
        }
        for q in common
    }
    regressions = sorted(
        ((q, r["ratio"]) for q, r in per_q.items()
         if r["ratio"] is not None and r["ratio"] > 1.2),
        key=lambda x: -x[1])[:10]
    ab = {
        "head_sha": a.head_sha,
        "base_sha": a.base_sha,
        "sweeps_head": len(a.head),
        "sweeps_base": len(a.base),
        "n_common": len(common),
        "head_only": sorted(set(head) - set(base)),
        "base_only": sorted(set(base) - set(head)),
        "head_total_common": ht,
        "base_total_common": bt,
        "ratio_common": round(ht / bt, 4) if bt > 0 else None,
        "top_regressions": [{"query": q, "ratio": r} for q, r in regressions],
        "per_query": per_q,
    }
    with open(a.out, "w") as f:
        json.dump(ab, f, indent=2)
    print(f"[ab] common={len(common)} head={ht}s base={bt}s "
          f"ratio={ab['ratio_common']}")


if __name__ == "__main__":
    main()
