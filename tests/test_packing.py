"""ops/packing.pack_shards — token-budget "concat and chunk" layout:
exclusive-prefix-sum semantics, NULL/oversize behavior, and the plan
property that makes it scale (the running sum is a window partitioned
by bounded value-range buckets, never one global partition)."""

import pyspark.sql.functions as F
import pytest

from pyspider_spark.ops.packing import pack_shards


def _ref_pack(rows, budget):
    """Driver-side reference: lay docs on the tape in doc_id order."""
    out, pre = {}, 0
    for doc_id, tc in sorted(rows):
        tc = tc or 0
        out[doc_id] = (tc, pre // budget)
        pre += tc
    return out


def test_pack_matches_reference_with_gaps_nulls_and_oversize(spark):
    # non-contiguous ids, a NULL count, and a doc bigger than the
    # budget (it starts its shard and overruns — block semantics)
    rows = [(3, 100), (7, None), (11, 900), (200, 50), (201, 50), (500, 10)]
    got = {
        r["doc_id"]: (r["token_count"], r["shard_id"])
        for r in pack_shards(
            spark,
            spark.createDataFrame(rows, "doc_id long, token_count long"),
            budget=128,
            n_buckets=4,
        ).collect()
    }
    assert got == _ref_pack(rows, 128)
    # the 900-token doc occupies shards 0.. on its own; the next doc
    # starts in the shard where the tape stands after it
    assert got[11][1] == 0 and got[200][1] == (100 + 900) // 128


def test_pack_single_bucket_equals_many_buckets(spark):
    rows = [(i, (i * 37) % 200) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, token_count long")
    one = {tuple(r) for r in pack_shards(spark, df, 256, n_buckets=1).collect()}
    many = {tuple(r) for r in pack_shards(spark, df, 256, n_buckets=16).collect()}
    assert one == many == {
        (d, tc, s) for d, (tc, s) in _ref_pack(rows, 256).items()
    }


def test_pack_empty_and_bad_budget(spark):
    empty = spark.createDataFrame([], "doc_id long, token_count long")
    assert pack_shards(spark, empty, 128).count() == 0
    with pytest.raises(ValueError):
        pack_shards(spark, empty, 0)


def test_pack_window_is_bucket_partitioned(spark):
    """Scale pin: the running-sum window partitions by the bucket
    column (bounded groups), not a single global partition, and the
    bucket-offset join is a broadcast."""
    df = spark.createDataFrame(
        [(i, 10) for i in range(100)], "doc_id long, token_count long"
    )
    plan = (
        pack_shards(spark, df, 64, n_buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition(_bkt" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_pack_skewed_ids_still_bucket_bounded_and_correct(spark):
    """A snowflake-scale outlier id must not collapse the value-range
    buckets into one global window: the refinement re-splits the hot
    level-1 bucket over its own [min, max] span, and the packing
    output still matches the reference exactly."""
    from pyspider_spark.ops.packing import _refined_buckets

    rows = [(i, 10) for i in range(2000)] + [(1 << 61, 7)]
    df = spark.createDataFrame(rows, "doc_id long, token_count long")
    got = {
        r["doc_id"]: (r["token_count"], r["shard_id"])
        for r in pack_shards(spark, df, budget=128, n_buckets=16).collect()
    }
    assert got == _ref_pack(rows, 128)
    # the bound itself: no refined bucket holds more than ~2x the
    # target rows (2001/16 ≈ 125)
    base = df.selectExpr("doc_id", "token_count as _tc")
    counts = (
        _refined_buckets(spark, base, 0, 1 << 61, 16)
        .groupBy("_bkt")
        .count()
        .collect()
    )
    assert max(r["count"] for r in counts) <= 2 * (2001 // 16 + 1)
