"""Frontier merge-on-read layout (engine/frontier.py; Iceberg MoR
analog of SURVEY §2.1 S3).

Invariants under test:
- with compaction disabled, a round appends ONE delta dir and never
  rewrites a base file — round-0 bases survive by path through N rounds;
- the MoR-resolved frontier is row-identical to a copy-on-write run
  (``frontier_compact_frac = 0`` folds every round — the old behavior);
- the manifest's incremental per-pid live-row lineage stays exact
  (equal to counting the resolved frontier) with and without
  compaction, across inserts, restarts, settles and cancel tombstones;
- the delta-dir read-amplification bound (``frontier_max_delta_dirs``)
  triggers folds.
"""

from __future__ import annotations

from dataclasses import replace

import pytest

from pyspider_spark.config import RoundConfig
from pyspider_spark.engine.frontier import entries_of
from pyspider_spark.engine.round import CrawlEngine, pid_col
from pyspider_spark.kernels.canon import canonicalize, taskid_of

ROUNDS = 4
# compaction OFF: ratio never fires, dir bound never fires
MOR_CFG = RoundConfig(
    n_partitions=4,
    round_budget=1000,
    frontier_compact_frac=1e18,
    frontier_max_delta_dirs=10**6,
)
# compaction EVERY round == copy-on-write
COW_CFG = replace(MOR_CFG, frontier_compact_frac=0.0)


def _run(spark, fixtures, state_dir, cfg, rounds=ROUNDS, inject_at=None):
    eng = CrawlEngine(
        spark,
        state_dir,
        cfg,
        pages_path=fixtures["pages"],
        projects_path=fixtures["projects"],
        robots_path=fixtures["robots"],
    )
    eng.run_rounds(
        rounds, seeds=spark.read.parquet(fixtures["seeds"]), inject_at=inject_at
    )
    return eng


def _rows(eng):
    return sorted(tuple(r) for r in eng.frontier().collect())


def _live_lineage(eng):
    man = eng.snap.read_manifest()
    return {
        int(p): int(n)
        for p, n in man["lineage"]["frontier_pid_rows"].items()
    }


def _actual_pid_counts(eng, n_partitions):
    return {
        int(r["pid"]): int(r["count"])
        for r in eng.frontier()
        .groupBy(pid_col(n_partitions).alias("pid"))
        .count()
        .collect()
    }


def test_mor_equals_cow_and_bases_never_rewritten(spark, smoke_fixtures, tmp_path):
    mor = _run(spark, smoke_fixtures, str(tmp_path / "mor"), MOR_CFG)
    cow = _run(spark, smoke_fixtures, str(tmp_path / "cow"), COW_CFG)

    assert _rows(mor) == _rows(cow)

    ents = entries_of(mor.snap.read_manifest())
    # every base (if any) dates from round 0's compaction-free write
    # path... with compaction disabled NO base is ever written after
    # round 0; rounds 1..N only appended deltas
    for p, e in ents.items():
        if e["base"]:
            assert "r000000" in e["base"], e
        # a smoke crawl touches every partition every round
        assert e["deltas"], e
        for d in e["deltas"]:
            assert "frontier_delta" in d
    # CoW run: every entry is a folded base, zero outstanding deltas
    for p, e in entries_of(cow.snap.read_manifest()).items():
        assert e["base"] and not e["deltas"]

    # exact incremental lineage == resolved counts, both layouts
    assert _live_lineage(mor) == _actual_pid_counts(mor, MOR_CFG.n_partitions)
    assert _live_lineage(cow) == _actual_pid_counts(cow, COW_CFG.n_partitions)
    man = mor.snap.read_manifest()
    assert sum(_live_lineage(mor).values()) == man["lineage"]["counts"]["frontier"]


def test_delta_dir_bound_triggers_fold(spark, smoke_fixtures, tmp_path):
    cfg = replace(MOR_CFG, frontier_max_delta_dirs=2)
    eng = _run(spark, smoke_fixtures, str(tmp_path / "bound"), cfg)
    ents = entries_of(eng.snap.read_manifest())
    assert ents
    for p, e in ents.items():
        # the fold runs CONCURRENTLY with the round that observes the
        # bound reached (it folds the pre-round dirs while that round
        # appends its own delta), so a partition holds at most the
        # bound-reaching dirs' fold plus the one in-flight delta:
        # outstanding deltas stay <= the bound
        assert len(e["deltas"]) <= 2, e
    # folds happened and were recorded
    man = eng.snap.read_manifest()
    assert any("frontier_base" in (e["base"] or "") for e in ents.values())
    assert _live_lineage(eng) == _actual_pid_counts(eng, cfg.n_partitions)


def test_compacted_bases_cluster_by_exetime_for_rowgroup_skip(spark, tmp_path):
    """Compaction writes bases sorted by exetime in bounded row groups,
    so the candidates scan's pushed `exetime <= now` predicate can skip
    never-due row groups via parquet min/max stats (the 10^10-row
    design point is a mostly-cold frontier)."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from pyspider_spark.engine import frontier as FR
    from pyspider_spark.engine import schema as S
    from pyspider_spark.engine.snapshot import SnapshotStore

    now = 1000.0
    n_due, n_cold = 500, 50_000
    rows = spark.range(n_due + n_cold).select(
        F.lit("p").alias("project"),
        F.concat(F.lit("t"), F.col("id")).alias("taskid"),
        F.concat(F.lit("http://h0.test/"), F.col("id")).alias("url"),
        F.concat(F.lit("http://h0.test/"), F.col("id")).alias("canon_url"),
        F.lit("h0.test").alias("host"),
        F.lit(1).alias("status"),
        F.lit(0).alias("priority"),
        F.lit(3).alias("retries_left"),
        F.when(F.col("id") < n_due, F.lit(now - 1.0))
        .otherwise(F.lit(now + 1e9))
        .alias("exetime"),
        F.lit(-1.0).alias("age"),
        F.lit(None).cast("string").alias("itag"),
        F.lit(False).alias("force_update"),
        F.lit(False).alias("auto_recrawl"),
        F.lit(None).cast("string").alias("callback"),
        F.lit(0.0).alias("lastcrawltime"),
        F.lit(0.0).alias("updatetime"),
        F.lit(0).alias("round_added"),
    )
    snap = SnapshotStore(str(tmp_path))
    base0 = str(tmp_path / "seed_base")
    rows.write.parquet(base0)
    entries = {0: {"base": snap.rel(base0), "deltas": []}}
    out = str(tmp_path / "compacted")
    # tiny row groups so the 50k-row file splits into many groups
    FR.compact(spark, snap, entries, [0], out, 1, row_group_bytes=1 << 17)

    pid_dir = os.path.join(out, "pid=0")
    files = [f for f in os.listdir(pid_dir) if f.endswith(".parquet")]
    assert len(files) == 1
    md = pq.ParquetFile(os.path.join(pid_dir, files[0])).metadata
    idx = md.schema.names.index("exetime")
    mins = [md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups)]
    maxs = [md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups)]
    assert md.num_row_groups >= 4, "row_group_bytes bound not applied"
    assert mins == sorted(mins), "base file not clustered by exetime"
    skippable = sum(1 for m in mins if m > now)
    assert skippable >= md.num_row_groups - 2, (
        f"cold mass not isolated into skippable row groups: {mins[:4]}..."
    )
    # correctness: the due predicate over the compacted base returns
    # exactly the due rows
    got = (
        spark.read.schema(S.FRONTIER_SCHEMA)
        .parquet(pid_dir)
        .filter(F.col("exetime") <= now)
        .count()
    )
    assert got == n_due
    # first row group holds the due rows (scan reads ~1 group of many)
    assert mins[0] <= now < maxs[-1]


def test_cancel_tombstone_under_mor(spark, smoke_fixtures, tmp_path):
    import pyarrow.parquet as pq

    url = pq.read_table(smoke_fixtures["seeds"])["url"][0].as_py()
    cancel = spark.createDataFrame(
        [(url, "test_project", True)], "url string, project string, cancel boolean"
    )
    eng = _run(
        spark,
        smoke_fixtures,
        str(tmp_path / "tomb"),
        MOR_CFG,
        rounds=3,
        inject_at={2: cancel},
    )
    tid = taskid_of(canonicalize(url))
    assert eng.frontier().filter(f"taskid = '{tid}'").count() == 0
    # live lineage recomputed exactly on the (rare) cancel path
    assert _live_lineage(eng) == _actual_pid_counts(eng, MOR_CFG.n_partitions)


def test_resolve_shuffle_anti_join_equals_broadcast(spark, smoke_fixtures, tmp_path):
    """Round-4 soak finding: the MoR resolve force-broadcast ALL
    outstanding delta keys — at a 64 M-row injection round (the 10^10
    production twin) that crashes Spark's 8 GB broadcast cap exactly
    when the global-compaction fold needs the resolve most. Above
    ``broadcast_max_keys`` the anti-join must go shuffle-side and be
    row-identical."""
    from pyspider_spark.engine import frontier as FR

    eng = _run(spark, smoke_fixtures, str(tmp_path / "s"), MOR_CFG, rounds=3)
    entries = entries_of(eng.snap.read_manifest())
    pids = sorted(entries)
    assert any(e["deltas"] for e in entries.values())  # deltas outstanding
    a = FR.read_resolved(spark, eng.snap, entries, pids)
    b = FR.read_resolved(spark, eng.snap, entries, pids, broadcast_max_keys=0)
    assert "ResolvedHint" not in b._jdf.queryExecution().logical().toString()
    assert sorted(tuple(r) for r in a.collect()) == sorted(
        tuple(r) for r in b.collect()
    )


def test_rounds_identical_with_broadcast_hints_disabled(spark, smoke_fixtures, tmp_path):
    """Above the row bounds every forced broadcast hint drops and AQE
    picks join strategies — results must be identical (the hints are
    pure performance). Pins the 10^8-row-round code path at smoke
    scale by setting all bounds to 0."""
    hinted = _run(spark, smoke_fixtures, str(tmp_path / "hint"), MOR_CFG, rounds=3)
    nohint_cfg = replace(
        MOR_CFG,
        merge_broadcast_max_rows=0,
        robots_broadcast_max_rows=0,
        fetch_broadcast_max_rows=0,
    )
    nohint = _run(spark, smoke_fixtures, str(tmp_path / "nohint"), nohint_cfg, rounds=3)
    assert _rows(hinted) == _rows(nohint)
    assert _live_lineage(hinted) == _live_lineage(nohint)
