"""Engine ⇄ oracle-simulator equivalence (SURVEY §5.2.2-3): the Spark
rounds must produce the same per-(round, host) fetch order, the same
final frontier statuses, and byte-identical extracted text as the
single-threaded reference-semantics simulator on the smoke fixtures.
This is the crawl-order gate mandated by BASELINE.json:6."""

from __future__ import annotations

import json

import pyarrow.parquet as pq
import pytest

from pyspider_spark.config import RoundConfig
from pyspider_spark.engine.round import CrawlEngine
from pyspider_spark.kernels.canon import canonicalize
from pyspider_spark.oracle.simulator import Simulator

ROUNDS = 6
CFG = RoundConfig(n_partitions=4, round_budget=1000)


def _sim_inputs(paths):
    pages_t = pq.read_table(paths["pages"])
    pages = {
        canonicalize(u): h
        for u, h in zip(pages_t["url"].to_pylist(), pages_t["html"].to_pylist())
    }
    robots_t = pq.read_table(paths["robots"])
    robots = dict(zip(robots_t["host"].to_pylist(), robots_t["robots_txt"].to_pylist()))
    proj_t = pq.read_table(paths["projects"])
    projects = {
        r["project"]: r for r in proj_t.to_pylist()
    }
    seeds = pq.read_table(paths["seeds"]).to_pylist()
    return pages, robots, projects, seeds


@pytest.fixture(scope="module")
def sim_state(smoke_fixtures):
    pages, robots, projects, seeds = _sim_inputs(smoke_fixtures)
    sim = Simulator(CFG, pages, robots, projects)
    sim.run(ROUNDS, seeds)
    return sim.state


@pytest.fixture(scope="module")
def engine_run(spark, smoke_fixtures, tmp_path_factory):
    state_dir = str(tmp_path_factory.mktemp("state"))
    eng = CrawlEngine(
        spark,
        state_dir,
        CFG,
        pages_path=smoke_fixtures["pages"],
        projects_path=smoke_fixtures["projects"],
        robots_path=smoke_fixtures["robots"],
    )
    seeds = spark.read.parquet(smoke_fixtures["seeds"])
    metrics = eng.run_rounds(ROUNDS, seeds=seeds)
    return eng, metrics


def _engine_schedule(spark, eng):
    man = eng.snap.read_manifest()
    paths = [eng.snap.abspath(p) for p in man["tables"]["schedule"]]
    rows = spark.read.parquet(*paths).collect()
    out = {}
    for r in rows:
        out.setdefault((r["round"], r["host"]), []).append(
            (r["seq_in_host"], r["project"], r["taskid"])
        )
    return {
        k: [(p, t) for _, p, t in sorted(v)] for k, v in out.items()
    }


def test_crawl_order_equivalence(spark, engine_run, sim_state):
    """Same per-(round, host) schedule, in the same order."""
    eng, _ = engine_run
    got = _engine_schedule(spark, eng)
    want = {}
    for e in sim_state.schedule_log:
        want.setdefault((e["round"], e["host"]), []).append(
            (e["project"], e["taskid"])
        )
    assert got == want


def test_final_frontier_equivalence(spark, engine_run, sim_state):
    """Same (project, taskid) → (status, retries_left) after N rounds."""
    eng, _ = engine_run
    fr = eng.frontier().collect()
    got = {(r["project"], r["taskid"]): (r["status"], r["retries_left"]) for r in fr}
    want = {
        k: (t.status, t.retries_left) for k, t in sim_state.frontier.items()
    }
    assert got == want


def test_results_equivalence(spark, engine_run, sim_state):
    """Same successful extractions: (project, taskid, text_len, n_links)."""
    eng, _ = engine_run
    man = eng.snap.read_manifest()
    paths = [eng.snap.abspath(p) for p in man["tables"]["results"]]
    rows = spark.read.parquet(*paths).collect()
    got = {
        (r["project"], r["taskid"], r["updatetime"]): tuple(
            json.loads(r["result"])[k] for k in ("text_len", "n_links")
        )
        for r in rows
    }
    want = {
        (r["project"], r["taskid"], r["updatetime"]): tuple(
            json.loads(r["result"])[k] for k in ("text_len", "n_links")
        )
        for r in sim_state.results
    }
    assert got == want


def test_metrics_match_simulator(engine_run, sim_state):
    eng, metrics = engine_run
    for m_eng, m_sim in zip(metrics, sim_state.metrics):
        for k in ("scheduled", "ok", "failed", "robots_blocked", "new_urls", "frontier"):
            assert m_eng[k] == m_sim[k], (k, m_eng, m_sim)


def test_text_byte_identity(spark, engine_run, smoke_fixtures):
    """debug_one's extracted text equals the golden pages.text column
    byte-for-byte (BASELINE.json:15 invariant)."""
    eng, _ = engine_run
    pages = pq.read_table(smoke_fixtures["pages"]).to_pylist()
    for row in pages[:5] + pages[-3:]:
        d = eng.debug_one(row["url"])
        assert d["status_code"] == 200
        assert d["text"] == row["text"]


def test_message_routing_and_dispatch(spark, engine_run, sim_state):
    """U1-U4 scenario checks on the engine's final state: send_message
    landed an _on_message task in msg_project; catch_errors settled its
    404 SUCCESS; strict_page exceptions paused flaky_project before its
    future-due seed could schedule; json_fields decoded its data: url."""
    eng, _ = engine_run
    fr = eng.frontier().collect()
    by_cb = {}
    for row in fr:
        by_cb.setdefault((row["project"], row["callback"]), []).append(row)

    # _on_message row exists in msg_project and succeeded (status 2)
    msgs = by_cb.get(("msg_project", "_on_message"), [])
    assert msgs and all(m["status"] == 2 for m in msgs)
    assert all(m["canon_url"].startswith("data:,_on_message|") for m in msgs)

    # catch_errors: a 404 url settled SUCCESS with a result row
    catches = by_cb.get(("test_project", "catch_errors"), [])
    assert catches and all(c["status"] == 2 for c in catches)

    # flaky_project paused: the future-due seed stays ACTIVE, never run
    man = eng.snap.read_manifest()
    assert "flaky_project" in man["state"]["paused"]
    flaky = [r for r in fr if r["project"] == "flaky_project"]
    future = [r for r in flaky if r["callback"] == "index_page"]
    assert future and all(r["status"] == 1 and r["lastcrawltime"] == 0.0 for r in future)

    # json_fields data: row produced the canonical dump
    jrows = by_cb.get(("test_project", "json_fields"), [])
    assert jrows and all(j["status"] == 2 for j in jrows)

    # and the simulator agrees it paused too
    assert "flaky_project" in sim_state.paused


def test_track_capture(spark, engine_run):
    """F11 — settle rows carry the truncated fetch/process track."""
    eng, _ = engine_run
    man = eng.snap.read_manifest()
    paths = [eng.snap.abspath(p) for p in man["tables"]["settle"]]
    rows = spark.read.parquet(*paths).collect()
    tracks = [json.loads(r["track"]) for r in rows if r["track"]]
    assert tracks
    assert all({"fetch", "process"} <= set(t) for t in tracks)
    errs = [t for t in tracks if t["process"].get("exception")]
    assert errs  # strict_page exceptions captured
    assert all(len(t["process"]["exception"]) <= 200 for t in errs)
    assert all(t["process"]["exception"].startswith("ValueError") for t in errs)


def test_progressive_discovery(engine_run):
    """Follows expand the frontier across rounds (the loop actually
    iterates) and at least one fetch succeeds every early round."""
    _, metrics = engine_run
    assert metrics[0]["new_urls"] > 0
    assert metrics[1]["new_urls"] > 0  # follows from round 0 landed
    assert all(m["ok"] > 0 for m in metrics[:3])
    assert metrics[-1]["frontier"] > metrics[0]["frontier"]
