"""Stateful streaming frontier ops (streaming/frontier.py): the
URL-seen bloom gate and token-bucket politeness as
applyInPandasWithState streams. The two-trigger protocol (drain →
append files → drain again over the same checkpoint) pins that state
survives in the state store across runs and that each operator's math
matches the batch kernels it reuses.
"""

from __future__ import annotations

import pytest

from pyspider_spark.streaming.frontier import (
    URLS_SCHEMA,
    politeness_stream,
    read_urls_stream,
    run_stream,
    seen_filter_stream,
)


def _row(url: str, host: str, priority: int = 0, ts: float = 100.0, project: str = "p0"):
    return (url, url, host, project, priority, ts)


def _write(spark, d: str, rows) -> None:
    spark.createDataFrame(rows, URLS_SCHEMA).coalesce(1).write.mode("append").parquet(d)


def test_seen_filter_state_survives_checkpoint(spark, tmp_path):
    src_dir = str(tmp_path / "urls")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write(
        spark,
        src_dir,
        [
            _row("http://a.example/1", "a.example"),
            _row("http://a.example/2", "a.example"),
            _row("http://a.example/2", "a.example"),  # in-batch dup
            _row("http://b.example/1", "b.example"),
        ],
    )
    run_stream(seen_filter_stream(read_urls_stream(spark, src_dir)), out_dir, ckpt)
    got1 = {r["canon_url"] for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {"http://a.example/1", "http://a.example/2", "http://b.example/1"}

    # trigger 2: all-seen rows plus one new — only the new one emits
    # (the bloom blobs came back from the state store, not memory)
    _write(
        spark,
        src_dir,
        [
            _row("http://a.example/1", "a.example"),
            _row("http://b.example/1", "b.example"),
            _row("http://b.example/2", "b.example"),
        ],
    )
    run_stream(seen_filter_stream(read_urls_stream(spark, src_dir)), out_dir, ckpt)
    got2 = {r["canon_url"] for r in spark.read.parquet(out_dir).collect()}
    assert got2 == got1 | {"http://b.example/2"}

    # same project+canon key under a different project is unseen
    _write(spark, src_dir, [_row("http://a.example/1", "a.example", project="p1")])
    run_stream(seen_filter_stream(read_urls_stream(spark, src_dir)), out_dir, ckpt)
    got3 = spark.read.parquet(out_dir).filter("project = 'p1'").count()
    assert got3 == 1


def test_politeness_stream_bucket_math(spark, tmp_path):
    src_dir = str(tmp_path / "urls")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # trigger 1 at ts=100: fresh bucket = burst tokens = 3 → admit the
    # top-3 by (priority desc, canon_url asc)
    _write(
        spark,
        src_dir,
        [_row(f"http://h.example/{i}", "h.example", priority=i, ts=100.0) for i in range(5)],
    )
    run_stream(
        politeness_stream(read_urls_stream(spark, src_dir), rate=1.0, burst=3.0),
        out_dir,
        ckpt,
    )
    got1 = sorted(
        (r["priority"], r["seq_in_host"])
        for r in spark.read.parquet(out_dir).collect()
    )
    assert got1 == [(2, 2), (3, 1), (4, 0)]

    # trigger 2 at ts=102: tokens = min(burst, 0 + rate*2) = 2 → admit 2
    _write(
        spark,
        src_dir,
        [_row(f"http://h.example/n{i}", "h.example", priority=10 - i, ts=102.0) for i in range(4)],
    )
    run_stream(
        politeness_stream(read_urls_stream(spark, src_dir), rate=1.0, burst=3.0),
        out_dir,
        ckpt,
    )
    got2 = sorted(
        r["priority"] for r in spark.read.parquet(out_dir).filter("ts = 102.0").collect()
    )
    assert got2 == [9, 10]
