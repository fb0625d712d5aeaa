#!/usr/bin/env python3
"""Dev-only local harness mimicking the driver's correctness gate.

NOT part of the engine (the Scala library has zero Python deps) — this just
lets us self-check Spark-vs-DuckDB oracle parity before the driver does.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
  (run `sbt "runMain graft.Verify <sf_dir> <verify_out_dir>"` first)
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    # driver sorts columns by name before hashing values
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
            continue
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                same = (a.isna() & b.isna()) | (a == b)
            except Exception:
                same = a.astype(str) == b.astype(str)
            if not same.all():
                i = int((~same).idxmax())
                mismatch = (c, i, a[i], b[i])
                break
        if mismatch:
            c, i, av, bv = mismatch
            print(f"FAIL {name}: col={c} row={i} spark={av!r} oracle={bv!r}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} failed ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
