"""ops/sampling.stratified_sample — deterministic corpus-mixing:
identical keep set under any partitioning (the property per-task RNG
sampling cannot give), exact stratum semantics for unknown/NULL keys,
and the no-shuffle plan shape."""

import pyspark.sql.functions as F
import pytest

from pyspider_spark.ops.sampling import stratified_sample


def _docs(spark, n=400, parts=None):
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("zh")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )
    return df.repartition(parts) if parts else df


def test_sample_rates_and_determinism_across_partitionings(spark):
    rates = {"en": 1.0, "de": 0.5, "zh": 0.0}
    a = {r["doc_id"] for r in stratified_sample(spark, _docs(spark), rates).collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(spark, _docs(spark, parts=13), rates).collect()
    }
    assert a == b  # partitioning-independent — a retried stage can't drift
    langs = dict(
        stratified_sample(spark, _docs(spark), rates)
        .groupBy("lang")
        .count()
        .collect()
    )
    # rate 1.0 keeps every row, 0.0 keeps none, 0.5 keeps a binomial
    # share (134 coins; loose 3-sigma bounds)
    assert langs.get("en") == 134 and "zh" not in langs
    assert 40 <= langs.get("de", 0) <= 94


def test_sample_unknown_and_null_strata_use_default(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "xx"), (3, None)], "doc_id long, lang string"
    )
    kept = {
        r["doc_id"]
        for r in stratified_sample(
            spark, df, {"en": 1.0}, default_rate=0.0
        ).collect()
    }
    assert kept == {1}
    kept_all = {
        r["doc_id"]
        for r in stratified_sample(
            spark, df, {"en": 1.0}, default_rate=1.0
        ).collect()
    }
    assert kept_all == {1, 2, 3}


def test_sample_rate_validation(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        stratified_sample(spark, df, {"en": 1.5})
    with pytest.raises(ValueError):
        stratified_sample(spark, df, {"en": 0.5}, default_rate=-0.1)


def test_sample_plan_has_no_shuffle(spark):
    """Scale pin: one broadcast of the rates dim + a scan-side filter
    — no shuffle exchange anywhere in the plan."""
    plan = (
        stratified_sample(spark, _docs(spark), {"en": 0.5, "de": 0.5, "zh": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan


def test_sample_null_id_keeps_rate_semantics(spark):
    """md5(NULL) is NULL — without the coalesced coin a NULL doc_id
    would be silently dropped from every stratum, even at rate 1.0."""
    df = spark.createDataFrame(
        [(None, "en"), (1, "en")], "doc_id long, lang string"
    )
    kept = stratified_sample(spark, df, {"en": 1.0}).count()
    assert kept == 2
