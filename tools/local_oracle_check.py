#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/local_oracle_check.py SFDIR OUTDIR
  SFDIR  = testdata dir (e.g. /root/testdata/sf0.01)
  OUTDIR = graft.Verify output dir (per-query parquet + oracle_sql.json)

For each query: read the Spark result parquet, run the oracle SQL in DuckDB
with each testdata table registered as a view, sort columns by name and rows
by value, and compare cell-by-cell (exact; floats reported with diff detail).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    if type(a) is not type(b):
        return str(a) == str(b)
    return a == b


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import os
    all_queries = sorted(d for d in os.listdir(outdir)
                         if os.path.isdir(os.path.join(outdir, d)))
    for name in all_queries:
        if name not in oracle:
            print(f"[rows-only] {name}: no oracle (weaker check)")
            continue
    for name, sql in sorted(oracle.items()):
        # targeted SPARK_GRAFT_VERIFY_ONLY runs dump a subset of parquet
        # dirs; silently skip oracles with nothing to compare against
        if not os.path.isdir(os.path.join(outdir, name)):
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            s_cols = list(spark_rel.columns)
            s_types = dict(zip(s_cols, (str(t) for t in spark_rel.types)))
            s_rows = spark_rel.fetchall()
            o_rel = con.sql(sql)
            o_cols = list(o_rel.columns)
            o_types = dict(zip(o_cols, (str(t) for t in o_rel.types)))
            o_rows = o_rel.fetchall()
        except Exception as e:
            print(f"[ERROR] {name}: {e}")
            n_fail += 1
            continue
        sc, sr = normalize(s_rows, s_cols)
        oc, or_ = normalize(o_rows, o_cols)
        if sc != oc:
            print(f"[FAIL] {name}: column mismatch spark={sc} oracle={oc}")
            n_fail += 1
            continue
        # the driver's hash is representation-sensitive (e.g. DuckDB HUGEINT
        # sums land as float64 in pandas) — exact type equality is required
        t_diff = {c: (s_types[c], o_types[c]) for c in sc
                  if s_types[c] != o_types[c]}
        if t_diff:
            print(f"[FAIL] {name}: type mismatch {t_diff}")
            n_fail += 1
            continue
        if len(sr) != len(or_):
            print(f"[FAIL] {name}: row count spark={len(sr)} oracle={len(or_)}")
            print(f"   spark head: {sr[:3]}")
            print(f"   oracle head: {or_[:3]}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, or_)):
            if not all(cells_equal(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"[FAIL] {name}: row {bad[0]} spark={bad[1]} oracle={bad[2]} (cols={sc})")
            n_fail += 1
        else:
            print(f"[PASS] {name}: {len(sr)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
