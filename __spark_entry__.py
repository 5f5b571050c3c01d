"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All query/oracle definitions live in ``pyspider_spark.contract``
(tested locally by tests/test_contract_oracle.py, which replicates the
driver's compare at sf0.001 before every commit).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the crawl scheduling core end-to-end on sf0.001 —
    derived frontier → candidates → per-host politeness cut (O1/O2/O3)
    → fetch join (J1) → per-host crawl-order log."""
    from pyspider_spark.contract import entry_df

    return entry_df(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pyspider_spark.contract import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from pyspider_spark.contract import build_oracles

    return build_oracles()
