#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
output against the DuckDB oracle, mirroring the driver's compare
(columns sorted by name, values compared row-wise).

Usage: oracle_check.py <sfdir> <verify-outdir> [query ...]
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    sql = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    failures = 0
    for name in sorted(sql):
        if only and name not in only:
            continue
        q = sql[name]
        try:
            sp = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"{name}: NO SPARK OUTPUT ({e})"); failures += 1; continue
        try:
            orc = con.execute(q).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR ({e})"); failures += 1; continue
        sp = sp.reindex(sorted(sp.columns), axis=1)
        orc = orc.reindex(sorted(orc.columns), axis=1)
        if list(sp.columns) != list(orc.columns):
            print(f"{name}: SCHEMA MISMATCH spark={list(sp.columns)} oracle={list(orc.columns)}")
            failures += 1; continue
        if sp.shape != orc.shape:
            print(f"{name}: ROWS MISMATCH spark={sp.shape[0]} oracle={orc.shape[0]}")
            failures += 1; continue
        bad = None
        for c in sp.columns:
            a, b = sp[c].tolist(), orc[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                eq = (x == y) or (str(x) == str(y)) or \
                     (isinstance(x, float) and isinstance(y, float) and
                      (math.isnan(x) and math.isnan(y) or x == y))
                if not eq:
                    bad = (c, i, x, y); break
            if bad: break
        if bad:
            print(f"{name}: VALUE MISMATCH col={bad[0]} row={bad[1]} spark={bad[2]!r} oracle={bad[3]!r}")
            failures += 1
        else:
            print(f"{name}: MATCH rows={sp.shape[0]}")
    sys.exit(1 if failures else 0)

main()
