"""Local reproduction of the driver's correctness gate: run
`__spark_entry__.queries()` against `oracle_sql()` on DuckDB at a
given sf dir and compare rows / column names / sorted values.

    python scripts/gate_check.py [--sf /root/testdata/sf0.01] [name ...]

With no names, checks every query that has an oracle.
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
        elif df[c].dtype.kind == "f":
            df[c] = df[c].map(
                lambda v: None if v is None or math.isnan(v) else round(float(v), 6)
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from pyspider_spark.engine.session import get_spark

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    queries, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    names = args.names or [n for n in queries if n in oracles]
    failed = []
    for name in names:
        if name not in oracles:
            print(f"{name}: SKIP (no oracle)")
            continue
        try:
            got = _norm(queries[name](spark, args.sf).toPandas())
            want = _norm(con.execute(oracles[name]).fetchdf())
            if list(got.columns) != list(want.columns):
                raise AssertionError(f"columns {list(got.columns)} != {list(want.columns)}")
            if len(got) != len(want):
                raise AssertionError(f"rows {len(got)} != {len(want)}")
            if not got.astype(object).where(got.notna(), None).equals(
                want.astype(object).where(want.notna(), None)
            ):
                diff = (got.astype(object) != want.astype(object)).any(axis=1)
                raise AssertionError(
                    f"values differ, first rows:\n{got[diff].head(3)}\nvs\n{want[diff].head(3)}"
                )
            print(f"{name}: OK ({len(got)} rows)")
        except Exception as e:
            failed.append(name)
            print(f"{name}: FAIL — {e}")
    print(f"\n{len(names) - len(failed)}/{len(names)} green")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
