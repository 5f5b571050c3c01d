"""Distributed synthetic-web generation for the crawl benchmark.

Derives a deterministic pages/seeds/projects/robots fixture set from the
driver's ``orders`` table (dense ``o_orderkey`` 0..K-1), entirely with
JVM-side column expressions — no driver loop, no Python in the hot path
— so generation itself scales with the input (the same expressions
would synthesize a 10^10-page web from a 10^10-row key table).

Workload shape (mirrors FIXTURES.md §1 and the reference bench harness
``pyspider/libs/bench.py — bench_test_10x100`` link-tree idea):

- one page per orderkey; host = pure function of the key, with a
  deliberate **hot host**: every 10th page lands on ``host0.example``
  (~10% of the web on one host — the skew/salting scenario,
  BASELINE.json:14 "skew handled explicitly");
- each page's HTML embeds absolute links to other keys (always
  resolvable), one relative link (usually a cross-host 404 — the fetch
  miss path), and one duplicate link (within-page dedup);
- ``text`` is the golden extraction of ``html`` (computed with the same
  Arrow UDF the engine uses — byte-identity invariant preserved).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

T0 = 1_767_225_600.0  # 2026-01-01T00:00:00Z

LINK_OFFSETS = (1, 17, 257, 4097, 65537)  # absolute in-web links per page
GEN_VERSION = 5  # bump to invalidate cached bench fixtures

# 12-token rotating vocabulary for page bodies (token-diverse enough
# for the analysis stage, compresses well in parquet)
_WORDS = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor "


def _host_of(k: Column, n_hosts: int) -> Column:
    """Deterministic host assignment with a 10% hot host (host0)."""
    return F.when(k % 10 == 0, F.lit("host0.example")).otherwise(
        F.concat(
            F.lit("host"),
            F.pmod(F.xxhash64(k), F.lit(n_hosts)).cast("string"),
            F.lit(".example"),
        )
    )


def _url_of(k: Column, n_hosts: int) -> Column:
    return F.concat(F.lit("http://"), _host_of(k, n_hosts), F.lit("/o/"), k.cast("string"))


def _keyspace(
    spark: SparkSession, sf_dir: str, mult: int, n_shards: int = 1
) -> tuple[DataFrame, int]:
    """Dense key column 0..K*mult-1 from orders (mult pages per order
    row — lets the bench web outgrow the driver tables without any
    driver-side generation loop). ``n_shards`` range-partitions the key
    column BEFORE any downstream generation expressions run, so html
    synthesis parallelizes and each shard lands as its own output file
    — shuffling here moves 8-byte keys, not generated page bodies."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n = orders.count() * mult  # o_orderkey is dense 0..count-1
    df = orders.select(
        F.col("o_orderkey").alias("base"),
        F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("m"),
    ).select((F.col("base") * mult + F.col("m")).alias("k"))
    if n_shards > 1:
        df = df.repartitionByRange(n_shards, "k").sortWithinPartitions("k")
    return df, n


def synth_pages(
    spark: SparkSession,
    sf_dir: str,
    n_hosts: int,
    mult: int = 1,
    page_words: int = 30,
    golden_text: bool = True,
    n_shards: int = 1,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) from the orders keyspace.
    ``page_words`` sets body length — real web pages carry hundreds of
    words, which is what makes extraction+analysis the dominant
    (and perfectly parallel) per-round compute.

    ``golden_text=False`` leaves the text column null: the engine only
    reads (url, html) from pages (column pruning), and skipping the
    golden-extraction pass avoids round-tripping the full html volume
    through Arrow at generation time (matters at multi-GB fixtures).
    Byte-identity tests use the small fixtures/gen.py set, which always
    carries golden text."""
    from pyspider_spark.engine.fetchx import extract_udf

    k = F.col("k")
    df, n = _keyspace(spark, sf_dir, mult, n_shards=n_shards)

    anchors = []
    for j in LINK_OFFSETS:
        tgt = _url_of((k + F.lit(j)) % F.lit(n), n_hosts)
        anchors.append(F.concat(F.lit('<a href="'), tgt, F.lit('">x</a>')))
    # duplicate of the first link (within-page dedup scenario)
    anchors.append(
        F.concat(F.lit('<a href="'), _url_of((k + F.lit(LINK_OFFSETS[0])) % F.lit(n), n_hosts), F.lit('">x</a>'))
    )
    # every 7th page carries a relative link — resolves on the page's
    # own host, where its target usually lives on another host: the 404
    # fetch-miss scenario (~7% of follows); other pages get one more
    # valid absolute link, keeping extraction the dominant compute
    anchors.append(
        F.when(
            k % 7 == 0,
            F.concat(
                F.lit('<a href="/o/'),
                ((k + F.lit(3)) % F.lit(n)).cast("string"),
                F.lit('">r</a>'),
            ),
        ).otherwise(
            F.concat(
                F.lit('<a href="'),
                _url_of((k + F.lit(31)) % F.lit(n), n_hosts),
                F.lit('">x</a>'),
            )
        )
    )

    reps = max(1, page_words // 12)
    body = F.concat(
        F.lit("<p>order page "),
        k.cast("string"),
        F.lit(" "),
        F.repeat(F.lit(_WORDS), (F.lit(reps) + k % 5).cast("int")),
        F.lit("</p>"),
    )
    html_str = F.concat(
        F.lit('<html><head><meta charset="utf-8"><title>bench '),
        k.cast("string"),
        F.lit("</title></head><body>"),
        body,
        *anchors,
        F.lit("</body></html>"),
    )
    url = _url_of(k, n_hosts)
    pages = df.select(
        url.alias("url"),
        F.timestamp_seconds(F.lit(T0) + (k % 86400).cast("double")).alias("warc_ts"),
        F.encode(html_str, "utf-8").alias("html"),
    )
    text_col = (
        extract_udf(F.col("html"), F.col("url")).getField("text")
        if golden_text
        else F.lit(None).cast("string")
    )
    return pages.select(
        "url",
        "warc_ts",
        "html",
        text_col.alias("text"),
        F.when(F.col("url").substr(-1, 1).isin("0", "7"), F.lit("de"))
        .otherwise(F.lit("en"))
        .alias("lang"),
    )


def synth_seeds(
    spark: SparkSession,
    sf_dir: str,
    n_hosts: int,
    n_seeds: int,
    mult: int = 1,
    every: int | None = None,
) -> DataFrame:
    """``every=None``: seeds = first n_seeds keys (discovery-order
    cluster — the sparse default). ``every=d``: seeds = every d-th key,
    spread across the keyspace so follow targets (k+offset) land mostly
    on UNSEEN keys — the dense-round regime for the scaling bench,
    where every round must stay ~10^6 URLs instead of collapsing into
    the already-seen seed neighborhood after round 0."""
    k = F.col("k")
    df, _n = _keyspace(spark, sf_dir, mult)
    return (
        df.filter((k % every == 0) if every else (k < n_seeds))
        .select(
            _url_of(k, n_hosts).alias("url"),
            F.lit("bench").alias("project"),
            (k % 10).cast("int").alias("priority"),
            F.lit(0.0).alias("exetime"),
            F.lit(-1.0).alias("age"),
            F.lit(None).cast("string").alias("itag"),
            F.lit(False).alias("force_update"),
            F.lit(False).alias("auto_recrawl"),
            F.lit("index_page").alias("callback"),
        )
    )


def synth_projects(spark: SparkSession) -> DataFrame:
    # NULL rate/burst = unthrottled project (the bench measures engine
    # throughput, not a configured project cap); the J5 cap path is
    # correctness-covered by the equivalence suite + gate entries.
    return spark.createDataFrame(
        [("bench", "RUNNING", None, None, 0.0, "default_extractor")],
        "project string, status string, rate double, burst double, "
        "min_tick double, script_ref string",
    )


def synth_robots(spark: SparkSession) -> DataFrame:
    """A handful of real robots rows so the J4 gate does real work:
    host1 disallows the /o/13* prefix; host2 has an empty (allow-all)
    robots; everyone else has no row (allow by default)."""
    rows = [
        ("host1.example", "User-agent: *\nDisallow: /o/13"),
        ("host2.example", ""),
        ("host3.example", "User-agent: *\nAllow: /"),
    ]
    return spark.createDataFrame(rows, "host string, robots_txt string")


def materialize(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_hosts: int = 500,
    n_seeds: int = 1000,
    mult: int = 1,
    page_words: int = 30,
    golden_text: bool = False,
    seeds_every: int | None = None,
) -> dict[str, str]:
    """Write the fixture set once; cached across bench runs (pure
    function of sf_dir contents + parameters)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {t: os.path.join(out_dir, f"{t}.parquet") for t in ("pages", "seeds", "projects", "robots")}
    # Ingest-realistic physical layout: a crawl fleet lands pages as
    # MANY files with row groups ≈ the scan split size (32 MB — the
    # engine's maxPartitionBytes), never one monolithic file with
    # 128 MB row groups. Layout is a writer artifact, not semantics —
    # but it bounds any engine's scan parallelism: one 3.4 GB file with
    # 27 row groups caps the fetch-join scan at 27 tasks and pins an
    # entire seed batch's decode+shuffle on one straggler task
    # (measured: 78 s straggler vs 12 s median at mult=48). Discovery
    # order (k) is PRESERVED within and across files — seed clustering
    # stays, as in a real crawl log; the engine handles that skew via
    # its post-join rebalance, not via a conveniently shuffled input.
    n_rows = _keyspace(spark, sf_dir, mult)[1]
    n_files = max(1, n_rows // 450_000)
    synth_pages(
        spark, sf_dir, n_hosts, mult, page_words, golden_text, n_shards=n_files
    ).write.mode("overwrite").option("parquet.block.size", 32 << 20).parquet(
        paths["pages"]
    )
    synth_seeds(spark, sf_dir, n_hosts, n_seeds, mult, every=seeds_every).write.mode(
        "overwrite"
    ).parquet(paths["seeds"])
    synth_projects(spark).coalesce(1).write.mode("overwrite").parquet(paths["projects"])
    synth_robots(spark).coalesce(1).write.mode("overwrite").parquet(paths["robots"])
    return paths
