"""Token-budget shard packing — the training-data "concat and chunk"
step: documents in a deterministic global order (doc_id) are laid
end-to-end on a token tape and the tape is cut every ``budget``
tokens; each document belongs to the shard where it STARTS, so a
shard overruns by less than one document — the standard block-packing
semantic (a packer that must never overrun instead truncates/splits
documents, which is a tokenizer-side concern, not a layout one).

Scale shape: the global exclusive prefix sum is a two-level
reduction — per-bucket token totals (bounded hash aggs, ≤ ~2×
``n_buckets`` rows through the driver) become broadcast bucket
offsets, and the within-bucket running sum is a window partitioned
by bucket, so no single-partition global window exists anywhere and
every expression stays JVM-side. Buckets are contiguous ``doc_id``
value ranges (order-preserving across the two levels), and skewed id
distributions — e.g. one snowflake-scale outlier that would collapse
uniform ranges into a single bucket — are handled by re-splitting
over-full level-1 buckets over their own [min, max] span, assigned
O(1)/row via a broadcast dim. The input is scanned by three bounded
aggregations plus the output pass — callers composing onto an
expensive lineage should persist it first (jobs/corpus_export.py
does).

Reference parity: pyspider has no corpus layout surface; this is
brief-mandated LLM-training-pipeline functionality (SURVEY §2.11),
composing with ops/export.py's quality-filtered shard export.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def _refined_buckets(
    spark: SparkSession, base: DataFrame, lo: int, hi: int, n_buckets: int
) -> DataFrame:
    """``base`` plus an order-preserving ``_bkt`` column: contiguous
    doc_id value-range buckets, skew-refined. Uniform value ranges
    collapse when ids are skewed (one snowflake-scale outlier widens
    the level-1 width until every real doc shares bucket 0 — the
    global-window shape this module exists to avoid), so each
    over-full level-1 bucket is re-split uniformly over ITS OWN
    [min, max] span (level-1 stats are a ≤ n_buckets-row collect —
    the documented dim-collect class). Assignment stays O(1)/row via
    one broadcast dim: _bkt = _off1 + (doc_id - _mn) div _sub_w."""
    w1 = max(1, (hi - lo) // n_buckets + 1)
    b1 = base.withColumn(
        "_b1", F.floor((F.col("doc_id") - F.lit(lo)) / F.lit(w1)).cast("long")
    )
    stats = {
        int(r["_b1"]): (int(r["c"]), int(r["mn"]), int(r["mx"]))
        for r in b1.groupBy("_b1")
        .agg(
            F.count("*").alias("c"),
            F.min("doc_id").alias("mn"),
            F.max("doc_id").alias("mx"),
        )
        .collect()
    }
    total_rows = sum(c for c, _, _ in stats.values())
    target = max(1, -(-total_rows // n_buckets))  # ceil rows/bucket
    dim, offset = [], 0
    for k in sorted(stats):
        cnt, mn, mx = stats[k]
        k_sub = min(n_buckets, max(1, -(-cnt // target)))
        sub_w = max(1, (mx - mn) // k_sub + 1)
        dim.append((k, mn, sub_w, offset))
        offset += (mx - mn) // sub_w + 1  # sub-ranges actually spanned
    dim_df = F.broadcast(
        spark.createDataFrame(dim, "_b1 long, _mn long, _sub_w long, _off1 long")
    )
    return (
        b1.join(dim_df, "_b1")
        .withColumn(
            "_bkt", F.col("_off1") + F.expr("(doc_id - _mn) div _sub_w")
        )
        .drop("_b1", "_mn", "_sub_w", "_off1")
    )


def pack_shards(
    spark: SparkSession,
    docs: DataFrame,
    budget: int,
    n_buckets: int = 1024,
    count_col: str = "token_count",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(doc_id, token_count, shard_id) with

        shard_id = floor(exclusive_prefix_sum(token_count) / budget)

    over ascending ``doc_id``. NULL counts pack as 0-token documents
    (they sit where the tape stands and never advance it). The result
    is deterministic for a given input set; ``budget`` must be > 0.

    ``tiebreak_col`` (carried through to the output) makes the tape
    order deterministic when ``doc_id`` values can collide — the
    string-id case where the caller derives a numeric key by hashing
    (jobs/corpus_export.py): tied keys order by the tiebreak instead
    of partition luck.

    Id-range caveat: bucket math subtracts ``lo`` in long arithmetic,
    so an id set spanning more than the full signed-64 range minus
    one bucket width (i.e. ids at BOTH LONG_MIN and LONG_MAX scale —
    no real id scheme does this) would wrap; md5-derived keys (60-bit,
    non-negative) and every snowflake/epoch scheme are fine.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    cols = [
        F.col("doc_id").cast("long").alias("doc_id"),
        F.coalesce(F.col(count_col), F.lit(0)).cast("long").alias("_tc"),
    ]
    if tiebreak_col is not None:
        cols.append(F.col(tiebreak_col))
    base = docs.select(*cols)
    lo_hi = base.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")).first()
    if lo_hi["lo"] is None:
        return (
            base.withColumnRenamed("_tc", "token_count")
            .withColumn("shard_id", F.lit(0).cast("long"))
            .select(
                "doc_id",
                "token_count",
                "shard_id",
                *([tiebreak_col] if tiebreak_col is not None else []),
            )
        )
    lo, hi = int(lo_hi["lo"]), int(lo_hi["hi"])
    b = _refined_buckets(spark, base, lo, hi, n_buckets)
    # bucket token totals -> exclusive bucket offsets (≤ ~2·n_buckets
    # rows after refinement)
    totals = {
        int(r["_bkt"]): int(r["t"])
        for r in b.groupBy("_bkt").agg(F.sum("_tc").alias("t")).collect()
    }
    offs, acc = [], 0
    for k in sorted(totals):
        offs.append((k, acc))
        acc += totals[k]
    off_df = F.broadcast(spark.createDataFrame(offs, "_bkt long, _off long"))
    # level 2: within-bucket exclusive running sum + the bucket offset
    order = ["doc_id"] + ([tiebreak_col] if tiebreak_col is not None else [])
    w = (
        Window.partitionBy("_bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out_cols = [
        F.col("doc_id"),
        F.col("_tc").alias("token_count"),
        # `div` is exact long division; floor(double/) loses integer
        # precision past 2^53 total tokens (100 TB corpora sit near
        # 2^52 — too close to lean on doubles)
        F.expr(f"_pre div {budget}").alias("shard_id"),
    ]
    if tiebreak_col is not None:
        out_cols.append(F.col(tiebreak_col))
    return (
        b.join(off_df, "_bkt")
        .withColumn(
            "_pre", F.coalesce(F.sum("_tc").over(w), F.lit(0)) + F.col("_off")
        )
        .select(*out_cols)
    )
