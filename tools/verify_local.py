#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not part of the
engine). Usage:
    python3 tools/verify_local.py /tmp/verify_out /root/testdata/sf0.01 [query...]

Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run first.
For each query: loads <outDir>/<name> parquet (Spark result), runs the oracle
SQL from oracle_sql.json in DuckDB over the sfDir tables, sorts columns by
name, and compares row-by-row.
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    return v


def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rel.fetchall():
        out.append(tuple(norm(row[i]) for i in order))
    return [cols[i] for i in order], out


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_path = out_dir / name
        if not res_path.exists():
            print(f"FAIL {name}: no spark output at {res_path}")
            n_fail += 1
            continue
        try:
            got_cols, got = rows_of(con.sql(
                f"SELECT * FROM '{res_path}/*.parquet'"))
            exp_cols, exp = rows_of(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rowcount {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        bad = [(i, g, e) for i, (g, e) in enumerate(zip(got, exp)) if g != e]
        if bad:
            i, g, e = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(got)} rows differ; "
                  f"first at {i}:\n  spark={g}\n  duck ={e}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
