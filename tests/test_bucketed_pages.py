"""Bucketed pages ingest (engine/ingest.py): the past-broadcast-bound
fetch-join layout. Pins (a) the physical property that makes it the
100 TB plan — the corpus side of the join reads bucketed with ZERO
Exchange; only the schedule shuffles — and (b) end-to-end crawl
equivalence: an engine pointed at the ingested dir produces exactly
the tables a plain-parquet engine does.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pyspider_spark.config import RoundConfig
from pyspider_spark.engine.ingest import ingest_pages, is_bucketed, register_pages
from pyspider_spark.engine.round import CrawlEngine
from pyspider_spark.oracle.extractor import extract_page

HOSTS = [f"bh{i}.example" for i in range(6)]
SEM_KEYS = ("scheduled", "ok", "failed", "robots_blocked", "new_urls", "frontier")


def _mk_fixtures(tmp_path):
    urls, htmls = [], []
    for h in HOSTS:
        urls.append(f"http://{h}/p/0")
        htmls.append(f'<html><body><a href="/p/1">next</a> seed {h}</body></html>'.encode())
        urls.append(f"http://{h}/p/1")
        htmls.append(f"<html><body><p>leaf {h}</p></body></html>".encode())
    pages = pa.table(
        {
            "url": pa.array(urls),
            "warc_ts": pa.array(
                [dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)] * len(urls),
                pa.timestamp("us", tz="UTC"),
            ),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array([extract_page(h, u).text for h, u in zip(htmls, urls)]),
            "lang": pa.array(["en"] * len(urls)),
        }
    )
    projects = pa.table(
        {
            "project": pa.array(["test_project"]),
            "status": pa.array(["RUNNING"]),
            "rate": pa.array([10.0]),
            "burst": pa.array([10.0]),
            "min_tick": pa.array([0.0]),
            "script_ref": pa.array(["default_extractor"]),
        }
    )
    paths = {}
    for name, tbl in (("pages", pages), ("projects", projects)):
        p = str(tmp_path / f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths


@pytest.fixture()
def bucketed(spark, tmp_path):
    paths = _mk_fixtures(tmp_path)
    loc = str(tmp_path / "pages_bucketed")
    ingest_pages(spark, paths["pages"], loc, n_buckets=4)
    return paths, loc


def test_ingest_layout(spark, bucketed):
    _, loc = bucketed
    assert is_bucketed(loc)
    # bucket ids ride the file names (one file per bucket: the ingest
    # repartitions by the bucket hash before the bucketed write)
    buckets = sorted(
        fn.split("_")[1][:5]
        for fn in os.listdir(loc)
        if fn.endswith(".parquet")
    )
    assert len(buckets) == len(set(buckets)) <= 4


def test_join_plans_have_no_corpus_exchange(spark, bucketed):
    _, loc = bucketed
    tbl = register_pages(spark, loc)
    sched = spark.createDataFrame(
        [(f"http://{h}/p/0",) for h in HOSTS], "canon_url string"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hits = tbl.join(sched, "canon_url", "inner")
        plan = hits._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert plan.count("Exchange") == 1  # schedule side only
        anti = sched.join(tbl.select("canon_url"), "canon_url", "left_anti")
        aplan = anti._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in aplan
        assert aplan.count("Exchange") == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _sem(metrics):
    return [{k: m[k] for k in SEM_KEYS} for m in metrics]


def test_engine_equivalence_bucketed_vs_plain(spark, tmp_path, bucketed):
    paths, loc = bucketed
    seeds = spark.createDataFrame(
        [(f"http://{h}/p/0", "test_project") for h in HOSTS],
        "url string, project string",
    )

    def run(pages_path, name, **cfg_kw):
        cfg = RoundConfig(n_partitions=2, respect_robots=False, **cfg_kw)
        eng = CrawlEngine(
            spark,
            str(tmp_path / name),
            cfg,
            pages_path=pages_path,
            projects_path=paths["projects"],
        )
        return eng, eng.run_rounds(3, seeds=seeds)

    # bucketed engine forced past the broadcast bound exercises the
    # co-located SMJ path end to end
    eng_b, m_b = run(loc, "state_bucketed", fetch_broadcast_max_rows=0)
    eng_p, m_p = run(paths["pages"], "state_plain")

    assert _sem(m_b) == _sem(m_p)
    assert {tuple(r) for r in eng_b.frontier().collect()} == {
        tuple(r) for r in eng_p.frontier().collect()
    }
    man_b, man_p = eng_b.snap.read_manifest(), eng_p.snap.read_manifest()
    res_b = {
        tuple(r)
        for rel in man_b["tables"].get("results", [])
        for r in spark.read.parquet(eng_b.snap.abspath(rel)).collect()
    }
    res_p = {
        tuple(r)
        for rel in man_p["tables"].get("results", [])
        for r in spark.read.parquet(eng_p.snap.abspath(rel)).collect()
    }
    assert res_b == res_p
