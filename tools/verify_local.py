#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not part of the
engine). Usage:
    python3 tools/verify_local.py /tmp/verify_out /root/testdata/sf0.01 [query...]

Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run first.

Replicates the driver's exact comparison methodology (round-1 judge verified
this is what the gate does):
  - Spark result: read the parquet dir with pandas/pyarrow (pd.read_parquet).
    DECIMAL columns arrive as Python Decimal objects, int64 stays int64,
    NULL -> None/NaN.
  - Oracle: run the SQL from oracle_sql.json in DuckDB over the sfDir tables
    and materialize with .df(). DECIMAL -> float64, SUM(int) -> HUGEINT ->
    float64, NULL -> nan.
  - Both frames: reorder columns sorted by name, sort rows by all columns
    (pandas sort_values -- crashes on array cells, exactly like the driver),
    then compare the STRINGIFIED cells.
Numerically-equal values that stringify differently (Decimal('1.00') vs 1.0,
1976 vs 1976.0, None vs nan) are FAILURES here, as at the gate.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame):
    """Sorted-column, sorted-row, stringified cell matrix (driver replica)."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return [[str(v) for v in row] for row in df.itertuples(index=False,
                                                           name=None)]


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
            got_df = pd.read_parquet(res_path)
            exp_df = con.sql(sql).df()
            got_cols = sorted(got_df.columns)
            exp_cols = sorted(exp_df.columns)
            if got_cols != exp_cols:
                print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
                n_fail += 1
                continue
            if len(got_df) != len(exp_df):
                print(f"FAIL {name}: rowcount {len(got_df)} != {len(exp_df)}")
                n_fail += 1
                continue
            got = canon(got_df)
            exp = canon(exp_df)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}")
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
