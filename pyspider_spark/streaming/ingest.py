"""Structured Streaming surface (SURVEY §2.8 T6): continuous analogs
of two batch-round stages for deployments where pages and events arrive
continuously (a fetch fleet appending to the pages table) instead of in
discrete rounds.

The batch engine stays the v1 design (rounds are the north rule); this
module is the streaming execution mode of the SAME kernels:

- ``stream_page_analysis`` — per-page analysis (ops/textstats) as an
  incremental file-source stream: each micro-batch processes only files
  that appeared since the last checkpoint, so re-running after new page
  snapshots land is exactly-once by construction (the checkpoint's file
  index is the ledger; at 100 TB the source swaps to the Iceberg
  incremental-scan equivalent of the same table).
- ``stream_window_counts`` — the A2 metrics windows (``pyspider/libs/
  counter.py — TimebaseAverageWindowCounter``) as a true watermarked
  tumbling-window stream over the events table. The watermark bounds
  state (the reference's in-memory counter dicts have no such bound);
  append mode emits a window only once it is finalized.

Scale notes: both streams are stateless-per-row (analysis) or
partial-aggregated (windows) — no groupBy over unbounded keys without a
watermark, so executor state stays O(open windows), never O(stream).
``maxFilesPerTrigger`` caps micro-batch size for backfills.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

ANALYSIS_SCHEMA = (
    "url string, warc_ts timestamp, token_count int, lang_guess string, "
    "quality double, simhash long"
)


def page_analysis_stream(
    spark: SparkSession, pages_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """The streaming analysis DataFrame: incremental parquet file source
    → Arrow-batched per-page analysis (same kernel as the batch round's
    ``RoundConfig.analyze`` path — one code path, two execution modes).
    """
    from pyspider_spark.ops.textstats import analyze_frame

    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    src = reader.parquet(pages_dir).select("url", "warc_ts", "text")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = analyze_frame(pdf["text"])
            out.insert(0, "url", pdf["url"].values)
            out.insert(1, "warc_ts", pdf["warc_ts"].values)
            yield out

    return src.mapInPandas(fn, ANALYSIS_SCHEMA)


def stream_page_analysis(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Run the analysis stream with an ``availableNow`` trigger: drain
    everything new since the checkpoint, then stop. Calling it again
    after more page files land processes only the delta (exactly-once
    resume, SURVEY §2.8 T5 in streaming form)."""
    df = page_analysis_stream(spark, pages_dir, max_files_per_trigger)
    return (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def window_counts_stream(
    spark: SparkSession,
    events_dir: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """A2 as a true stream: watermarked tumbling-window counts per
    event_type. State is bounded by the watermark: a window closes (and
    is emitted, in append mode) once the stream's max event time passes
    window_end + watermark; later-than-watermark events are dropped."""
    src = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(events_dir)
    return (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def stream_window_counts(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> StreamingQuery:
    """Drain available events through the windowed counter (append mode:
    only finalized windows are written — a window for which the
    watermark has not yet passed stays in state until a later
    micro-batch advances event time past it)."""
    df = window_counts_stream(spark, events_dir, window, watermark)
    return (
        df.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
