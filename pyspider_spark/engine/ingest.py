"""Bucketed pages ingest — the 100 TB fetch-join layout.

The fetch join's broadcast decomposition (engine/fetchx.py) holds while
the schedule is broadcastable. Past that bound the scale plan is the
one the Iceberg design promises (SURVEY §2.3 J1): **bucket the pages
table by canon_url at ingest** so every fetch join co-locates — the
corpus side never exchanges (neither payloads nor keys); only the
schedule shuffles into the corpus's bucketing. This module implements
that layout with Spark's native bucketed tables (the parquet-shim
analog of an Iceberg `bucket(N, canon_url)` partition spec):

- ``ingest_pages``: one-time full pass over a raw pages table —
  canonicalize urls (same kernel as the round engine), repartition by
  the bucket hash (one file per bucket), write with
  ``bucketBy(n, canon_url).sortBy(canon_url)``. A ``_bucketing.json``
  marker in the output dir records the spec.
- ``register_pages``: re-attach the bucketed files to any later
  SparkSession (the in-memory catalog does not persist) via
  ``CREATE TABLE … CLUSTERED BY … LOCATION``; bucket ids ride the file
  names, so the catalog entry is pure metadata.

``CrawlEngine`` auto-detects the marker: pointing ``pages_path`` at an
ingested directory makes every round's fetch join bucketed with no
other configuration. With the schedule side under the broadcast bound
the engine still prefers the broadcast decomposition (streams the scan
with no sort); above it, Catalyst plans a sort-merge join whose
corpus side reads bucketed — one Exchange total, schedule-sized
(pinned by tests/test_bucketed_pages.py).
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MARKER = "_bucketing.json"


def _table_name(location: str) -> str:
    """Deterministic catalog name for a bucketed location, so repeated
    registrations (tests, resumed sessions) agree without coordination."""
    return "pages_b_" + hashlib.md5(os.path.abspath(location).encode()).hexdigest()[:10]


def ingest_pages(
    spark: SparkSession,
    pages_path: str,
    location: str,
    n_buckets: int = 64,
    precanonical: bool = False,
) -> str:
    """One-time ingest: raw pages → canon-keyed bucketed table.

    Returns the location (pass it as CrawlEngine's ``pages_path``).
    ``n_buckets`` sizes the join parallelism floor at crawl time —
    pick ~2× target cluster cores; the corpus rewrite is the only
    full-scan cost, paid once per corpus (production: Iceberg writes
    this layout at ingest, no rewrite at all).
    """
    from pyspider_spark.engine.fetchx import canon_udf

    raw = spark.read.parquet(pages_path)
    key = F.col("url") if precanonical else canon_udf(F.col("url"))
    pages = raw.select(key.alias("canon_url"), "html")
    table = _table_name(location)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        pages.repartition(n_buckets, "canon_url")
        .write.bucketBy(n_buckets, "canon_url")
        .sortBy("canon_url")
        .mode("overwrite")
        .format("parquet")
        .option("path", location)
        .saveAsTable(table)
    )
    with open(os.path.join(location, MARKER), "w") as f:
        json.dump({"n_buckets": n_buckets, "key": "canon_url"}, f)
    return location


def is_bucketed(pages_path: str) -> bool:
    return os.path.isdir(pages_path) and os.path.exists(
        os.path.join(pages_path, MARKER)
    )


def register_pages(spark: SparkSession, location: str) -> DataFrame:
    """Attach an ingested bucketed location to this session's catalog
    and return it as a DataFrame (canon_url, html). Idempotent: the
    name is derived from the location, the entry is metadata-only."""
    with open(os.path.join(location, MARKER)) as f:
        spec = json.load(f)
    table = _table_name(location)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} (canon_url string, html binary) USING parquet "
        f"CLUSTERED BY (canon_url) SORTED BY (canon_url) "
        f"INTO {int(spec['n_buckets'])} BUCKETS LOCATION '{os.path.abspath(location)}'"
    )
    return spark.table(table)
