"""Structured Streaming mode (SURVEY §2.8 T6): incremental page
analysis with exactly-once resume, and watermarked A2 windows.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest


def _ts(minute: int, second: int = 0) -> datetime:
    # naive UTC wall time: session tz is pinned to UTC, and parquet
    # round-trips it as-is for both TIMESTAMP and TIMESTAMP_NTZ
    return datetime(2026, 1, 1, 10, minute, second)


def _write_pages(spark, d: str, rows: list[tuple[str, str]]) -> None:
    df = spark.createDataFrame(
        [(u, _ts(0), t.encode(), t, "en") for u, t in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    df.coalesce(1).write.mode("append").parquet(d)


def test_page_analysis_stream_exactly_once(spark, tmp_path):
    from pyspider_spark.ops.textstats import analyze_text
    from pyspider_spark.streaming.ingest import stream_page_analysis

    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [("http://a/1", "the quick brown fox and the lazy dog"), ("http://a/2", "der hund und die katze ist im haus")]
    _write_pages(spark, pages, batch1)
    stream_page_analysis(spark, pages, out, ckpt).awaitTermination(120)

    got = {r["url"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {"http://a/1", "http://a/2"}
    n, lang, q, sh = analyze_text(batch1[0][1])
    r = got["http://a/1"]
    assert (r["token_count"], r["lang_guess"], r["simhash"]) == (n, lang, sh)
    assert r["quality"] == pytest.approx(q)
    assert got["http://a/2"]["lang_guess"] == "de"

    # re-run with nothing new: checkpoint file-index = ledger, 0 new rows
    stream_page_analysis(spark, pages, out, ckpt).awaitTermination(120)
    assert spark.read.parquet(out).count() == 2

    # new files land → only the delta is processed, no duplicates
    _write_pages(spark, pages, [("http://a/3", "completely fresh text")])
    stream_page_analysis(spark, pages, out, ckpt).awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 3
    assert sorted(r["url"] for r in rows) == ["http://a/1", "http://a/2", "http://a/3"]


def _write_events(spark, d: str, rows: list[tuple[int, datetime, str, float]]) -> None:
    df = spark.createDataFrame(
        [(i, ts, i % 5, et, v, "{}") for i, ts, et, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("append").parquet(d)


def test_window_counts_watermark_semantics(spark, tmp_path):
    from pyspider_spark.streaming.ingest import stream_window_counts

    events = str(tmp_path / "events")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: two 5-minute windows' worth of events (10:00 and 10:05)
    _write_events(
        spark,
        events,
        [
            (1, _ts(1), "click", 1.0),
            (2, _ts(2), "click", 2.0),
            (3, _ts(3), "view", 1.5),
            (4, _ts(6), "click", 4.0),
        ],
    )
    stream_window_counts(spark, events, out, ckpt).awaitTermination(120)
    # append mode: watermark (max ts 10:06 − 10 min) has not passed any
    # window end yet → nothing finalized, nothing emitted
    import glob

    assert not glob.glob(out + "/*.parquet") or spark.read.parquet(out).count() == 0

    # batch 2: event at 10:30 → watermark advances to 10:20, past both
    # early window ends → they finalize and emit
    _write_events(spark, events, [(5, _ts(30), "view", 1.0)])
    stream_window_counts(spark, events, out, ckpt).awaitTermination(120)

    def emitted():
        return {
            (r["window_start"].minute, r["event_type"]): (r["cnt"], r["sum_value"])
            for r in spark.read.parquet(out).collect()
        }

    expect = {
        (0, "click"): (2, 3.0),
        (0, "view"): (1, 1.5),
        (5, "click"): (1, 4.0),
    }
    assert emitted() == expect

    # batch 3: straggler at 10:02 — older than the persisted watermark
    # (10:20), its window is already finalized/evicted → DROPPED, output
    # unchanged
    _write_events(spark, events, [(6, _ts(2), "click", 99.0)])
    stream_window_counts(spark, events, out, ckpt).awaitTermination(120)
    assert emitted() == expect
