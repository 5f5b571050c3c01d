"""Deterministic stratified sampling — the corpus-mixing step of a
training-data pipeline: keep each stratum (language, source domain,
quality band, …) at its own rate so the mixture matches a target
recipe (e.g. down-weight boilerplate-heavy sources, up-weight rare
languages).

Determinism is the design constraint at 100 TB: `df.sample()` draws
from a per-task RNG, so the selected set changes with partitioning,
task retries and cluster size — a retried stage could silently
change the corpus. Here the coin is md5(doc_id): a doc's fate is a
pure function of its id, identical on every run, every cluster
shape, and both sides of the DuckDB oracle. Comparison is exact
integer arithmetic (first 8 md5 hex digits vs floor(rate·2³²)) —
no float thresholds to drift between engines.

Scale shape: one broadcast of the rates dim (|strata| rows) and one
JVM-side filter on the scan — no shuffle, no RNG, no UDF.

Reference parity: pyspider has no sampling surface; brief-mandated
LLM-pipeline functionality (SURVEY §2.11).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_HASH_SPACE = 1 << 32


def _u32_expr(id_col: str):
    """First 8 md5 hex digits of the id as an integer in [0, 2^32) —
    the deterministic uniform coin (same construction as the export
    shard ids and the contract's _md5_half). NULL ids share the
    md5('') coin instead of vanishing (md5(NULL) is NULL and a NULL
    comparison would silently drop the row from every stratum)."""
    return F.conv(
        F.substring(F.md5(F.coalesce(F.col(id_col).cast("string"), F.lit(""))), 1, 8),
        16,
        10,
    ).cast("long")


def stratified_sample(
    spark: SparkSession,
    docs: DataFrame,
    rates: dict[str, float],
    key_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Rows of ``docs`` kept iff u32(id) < floor(rate(key) · 2³²),
    where ``rates`` maps stratum value → keep fraction in [0, 1] and
    strata absent from the map use ``default_rate``. Row-identical
    across runs, partitionings and cluster sizes; expected stratum
    size = rate · |stratum| with binomial concentration."""
    for k, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    dim = spark.createDataFrame(
        [(k, int(r * _HASH_SPACE)) for k, r in rates.items()],
        f"{key_col} string, _thresh long",
    )
    return (
        docs.join(F.broadcast(dim), key_col, "left")
        .withColumn(
            "_thresh",
            F.coalesce(F.col("_thresh"), F.lit(int(default_rate * _HASH_SPACE))),
        )
        .filter(_u32_expr(id_col) < F.col("_thresh"))
        .drop("_thresh")
    )
