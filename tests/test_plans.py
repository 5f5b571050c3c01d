"""Physical-plan regression tests — pin the plan *shapes* the engine's
scale story depends on, so a refactor that silently degrades a plan
(broadcast → sort-merge, TakeOrdered → global sort, lost parquet
pushdown, lost map-side combine) fails loudly at test time instead of
at 100 TB.

Each assertion reads ``df._jdf.queryExecution().executedPlan()`` (or
the formatted explain string) BEFORE execution — these tests cost
milliseconds, not jobs.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from pyspider_spark.config import RoundConfig

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _plan(df) -> str:
    """Formatted physical plan (post-Catalyst, pre-execution)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# ---------------------------------------------------------------------------
# result paging: TakeOrderedAndProject, never a whole-table window sort
# ---------------------------------------------------------------------------
def test_select_results_is_take_ordered(spark):
    from pyspider_spark.engine.results import select_results

    results = spark.createDataFrame(
        [("p", f"t{i}", f"u{i}", "{}", float(i)) for i in range(100)],
        "project string, taskid string, url string, result string, updatetime double",
    )
    plan = _plan(select_results(results, offset=20, limit=20))
    assert "TakeOrderedAndProject" in plan
    # the window must be fed by the bounded head, not the full table:
    # a global Sort over the input would betray a whole-table shuffle
    assert plan.index("TakeOrderedAndProject") > plan.index("Window")


def test_cosine_topk_is_take_ordered(spark):
    import numpy as np

    from pyspider_spark.ops.similarity import cosine_topk

    emb = spark.createDataFrame(
        [(i, [float(i % 5), 1.0]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    plan = _plan(cosine_topk(spark, emb, np.array([1.0, 0.0]), k=5))
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# fetch join: bounded schedule ⇒ broadcast build side, pages side streams;
# unbounded schedule ⇒ NO forced broadcast (AQE decides from sizes)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def pages_and_sched(spark):
    pages = spark.createDataFrame(
        [(f"http://h{i % 7}.test/p{i}", bytearray(b"<html>x</html>")) for i in range(50)],
        "canon_url string, html binary",
    )
    sched = spark.createDataFrame(
        [
            ("proj", f"t{i}", f"http://h{i % 7}.test/p{i}", f"h{i % 7}.test", 0, 3, "index_page")
            for i in range(10)
        ],
        "project string, taskid string, canon_url string, host string, "
        "priority int, retries_left int, callback string",
    )
    return pages, sched


def test_fetch_join_broadcasts_bounded_schedule(spark, pages_and_sched):
    from pyspider_spark.engine.fetchx import fetch_and_extract

    pages, sched = pages_and_sched
    cfg = RoundConfig(n_partitions=4, round_budget=100)
    plan = _plan(fetch_and_extract(sched, pages, cfg, sched_rows=10))
    assert "BroadcastHashJoin" in plan


def test_fetch_extraction_runs_above_rebalance(spark, pages_and_sched):
    """The Python extraction must sit ABOVE a rebalance exchange: the
    join's surviving rows inherit the scan's splits, and schedules are
    clustered in the pages table (discovery-order ingest), so without
    the exchange one scan task does the whole round's extraction
    (measured 225k pages on one core at bench scale)."""
    from pyspider_spark.engine.fetchx import fetch_and_extract

    pages, sched = pages_and_sched
    cfg = RoundConfig(n_partitions=4, round_budget=100)
    plan = _plan(fetch_and_extract(sched, pages, cfg, sched_rows=10))
    assert "ArrowEvalPython" in plan
    assert "REBALANCE" in plan
    # topology: the UDF eval is downstream (earlier in explain output)
    # of the rebalance exchange
    assert plan.index("ArrowEvalPython") < plan.index("REBALANCE")


def test_fetch_miss_antijoin_never_shuffles_corpus_keys(spark, pages_and_sched):
    """Bounded schedule ⇒ miss detection = key-only streamed scan +
    broadcast anti join; a hashpartitioning exchange of the pages key
    column would shuffle 10^10 keys per round at north scale."""
    from pyspider_spark.engine.fetchx import fetch_and_extract

    pages, sched = pages_and_sched
    cfg = RoundConfig(n_partitions=4, round_budget=100)
    plan = _plan(fetch_and_extract(sched, pages, cfg, sched_rows=10))
    assert "SortMergeJoin" not in plan


def test_fetch_join_no_forced_broadcast_when_unbounded(spark, pages_and_sched):
    from pyspider_spark.engine.fetchx import fetch_and_extract

    pages, sched = pages_and_sched
    cfg = RoundConfig(n_partitions=4, round_budget=None)
    df = fetch_and_extract(sched, pages, cfg, sched_rows=None)
    # the logical plan must not carry a broadcast HINT on the schedule
    # side (AQE may still *choose* broadcast from observed sizes — the
    # guard is about not forcing an unbounded collect)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert "UnresolvedHint" not in logical
    assert "hints=[broadcast]" not in logical.replace(" ", "").lower()


# ---------------------------------------------------------------------------
# frontier candidates scan: status/exetime predicates reach the parquet
# reader as pushed filters (pruned columnar read, no frontier rewrite)
# ---------------------------------------------------------------------------
def test_frontier_scan_pushes_down_predicates(spark, tmp_path):
    from pyspider_spark.config import ACTIVE

    p = str(tmp_path / "fr.parquet")
    spark.createDataFrame(
        [("p", f"t{i}", ACTIVE if i % 2 else "SUCCESS", float(i)) for i in range(100)],
        "project string, taskid string, status string, exetime double",
    ).write.parquet(p)
    df = (
        spark.read.parquet(p)
        .filter((F.col("status") == ACTIVE) & (F.col("exetime") <= 50.0))
        .select("project", "taskid")
    )
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "IsNotNull(status)" in plan or "EqualTo(status" in plan
    # column pruning: the scan must not read the status payload columns
    # beyond those referenced
    assert "ReadSchema" in plan


# ---------------------------------------------------------------------------
# A4 collapse: partial + final hash aggregate (map-side combine), so the
# shuffle moves pre-aggregated rows, not raw updates
# ---------------------------------------------------------------------------
def test_collapse_updates_has_map_side_combine(spark):
    from pyspider_spark.engine.schema import UPDATE_SCHEMA
    from pyspider_spark.engine.stages import collapse_updates
    from pyspider_spark.engine.schema import empty_df

    upd = empty_df(spark, UPDATE_SCHEMA)
    plan = _plan(collapse_updates(upd))
    # two aggregate nodes around one exchange = partial + final
    n_aggs = plan.count("HashAggregate") + plan.count("SortAggregate")
    assert n_aggs >= 2
    assert "Exchange" in plan


# ---------------------------------------------------------------------------
# exact dedup / status counts: aggregations stay whole-stage-codegen'd
# (JVM side) — no Python eval in the hot path
# ---------------------------------------------------------------------------
def test_status_counts_stays_jvm_side(spark):
    from pyspider_spark.engine.results import status_counts

    fr = spark.createDataFrame(
        [("p", "t1", "ACTIVE"), ("p", "t2", "SUCCESS")],
        "project string, taskid string, status string",
    )
    plan = _plan(status_counts(fr))
    # map-side combine: partial_count before the exchange, final after
    assert "partial_count" in plan
    assert plan.count("HashAggregate") >= 2
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan


# ---------------------------------------------------------------------------
# robots join: broadcast only under a KNOWN row bound (a web-scale robots
# dim must not be force-collected to the driver)
# ---------------------------------------------------------------------------
def test_robots_join_broadcast_is_bounded(spark):
    from pyspider_spark.engine.politeness import check_robots

    cands = spark.range(1000).select(
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string")).alias("host"),
        F.concat(F.lit("http://h/"), F.col("id").cast("string")).alias("canon_url"),
    )
    robots = spark.createDataFrame(
        [("h1", "User-agent: *\nDisallow: /x")], "host string, robots_txt string"
    )
    cfg = RoundConfig(n_partitions=4)

    bounded = check_robots(cands, robots, cfg, robots_rows=1)
    assert "BroadcastHashJoin" in _plan(bounded)

    # unknown or over-bound size: no FORCED broadcast hint in the
    # optimized logical plan (AQE may still pick one from measured
    # stats at runtime - which is the point)
    unbounded = check_robots(cands, robots, cfg, robots_rows=None)
    logical = unbounded._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in logical
    over = check_robots(
        cands, robots, cfg, robots_rows=cfg.robots_broadcast_max_rows + 1
    )
    assert "ResolvedHint" not in over._jdf.queryExecution().optimizedPlan().toString()
