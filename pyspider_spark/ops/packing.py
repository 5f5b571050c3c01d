"""Token-budget shard packing — the training-data "concat and chunk"
step: documents in a deterministic global order (doc_id) are laid
end-to-end on a token tape and the tape is cut every ``budget``
tokens; each document belongs to the shard where it STARTS, so a
shard overruns by less than one document — the standard block-packing
semantic (a packer that must never overrun instead truncates/splits
documents, which is a tokenizer-side concern, not a layout one).

Scale shape: the global exclusive prefix sum is a two-level
reduction — per-bucket token totals (one hash agg, ≤ ``n_buckets``
rows through the driver, a bounded dim collect) become broadcast
bucket offsets, and the within-bucket running sum is a window
partitioned by bucket, so no single-partition global window exists
anywhere and every expression stays JVM-side. Buckets are contiguous
``doc_id`` value ranges, which preserves the global order across the
two levels.

Reference parity: pyspider has no corpus layout surface; this is
brief-mandated LLM-training-pipeline functionality (SURVEY §2.11),
composing with ops/export.py's quality-filtered shard export.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


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
    width = max(1, (hi - lo) // n_buckets + 1)
    b = base.withColumn(
        "_bkt", F.floor((F.col("doc_id") - F.lit(lo)) / F.lit(width)).cast("long")
    )
    # level 1: bucket totals -> exclusive bucket offsets (≤ n_buckets
    # rows, bounded by the argument — the documented dim-collect class)
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
        # exact integer division (floor(double/) would drift past
        # 2^52 total tokens; 100 TB corpora sit near that)
        ((F.col("_pre") - F.pmod("_pre", F.lit(budget))) / budget)
        .cast("long")
        .alias("shard_id"),
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
