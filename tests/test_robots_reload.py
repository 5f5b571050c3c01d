"""Robots dim hot-reload (S10): the reference fetcher re-fetches a
host's robots.txt after a 1h cache expiry (``fetcher/tornado_fetcher.py
— can_fetch()/robots_txt_cache``); the batch analog is a stat-guarded
re-read of the robots dim each round — rules changed between rounds
take effect on the next round without rebuilding the engine.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from pyspider_spark.config import RoundConfig
from pyspider_spark.engine.round import CrawlEngine
from pyspider_spark.oracle.extractor import extract_page

HOSTS = ["ra.example", "rb.example"]


def _write_robots(path: str, blocked_hosts: list[str]) -> None:
    pq.write_table(
        pa.table(
            {
                "host": pa.array(blocked_hosts, pa.string()),
                "robots_txt": pa.array(
                    ["User-agent: *\nDisallow: /"] * len(blocked_hosts), pa.string()
                ),
            }
        ),
        path,
    )


def test_robots_change_applies_next_round(spark, tmp_path):
    urls = [f"http://{h}/p/0" for h in HOSTS]
    htmls = [f"<html><body><p>page {h}</p></body></html>".encode() for h in HOSTS]
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
    pq.write_table(pages, str(tmp_path / "pages.parquet"))
    pq.write_table(projects, str(tmp_path / "projects.parquet"))
    robots_path = str(tmp_path / "robots.parquet")
    _write_robots(robots_path, [])  # nothing blocked at round 0

    eng = CrawlEngine(
        spark,
        str(tmp_path / "state"),
        RoundConfig(n_partitions=2, respect_robots=True),
        pages_path=str(tmp_path / "pages.parquet"),
        projects_path=str(tmp_path / "projects.parquet"),
        robots_path=robots_path,
    )
    seeds = spark.createDataFrame(
        [(u, "test_project") for u in urls], "url string, project string"
    )
    m0 = eng.run_rounds(1, seeds=seeds)[0]
    assert m0["ok"] == 2 and m0["robots_blocked"] == 0

    # operator publishes a Disallow-all for ra.example between rounds
    _write_robots(robots_path, [HOSTS[0]])
    recrawl = spark.createDataFrame(
        [(u, "test_project", True) for u in urls],
        "url string, project string, force_update boolean",
    )
    m1 = eng.run_rounds(1, inject_at={1: recrawl})[0]
    assert m1["robots_blocked"] == 1 and m1["ok"] == 1
