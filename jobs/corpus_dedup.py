"""Corpus-dedup post-pass over crawl output — the pipeline-level
composition of the dedup ops (ops/dedup.py) with the engine's own
tables:

    spark-submit --py-files dist/pyspider_spark.zip jobs/corpus_dedup.py \
        --state <crawl-state-dir> [--fixtures <dir>] [--max-hamming 3] \
        [--out <dir>]

Reads the committed manifest's ``results`` tables (every crawled
round), takes the LATEST crawl per url, obtains a 32-bit SimHash per
page — from the result JSON when the crawl ran with analysis on,
otherwise recomputed from the pages table's text through the same
``analyze_text`` kernel — and emits the keep table
(url, dup_of, is_canonical) via banded hamming pairs + connected
components. Prints one JSON metrics line.

Scale shape: one scan over results (frontier-sized at most), a band
self-join whose candidate volume is bounded by band width, and
component joins over near-dup edges only — no all-pairs anything.
pyspider has no corpus dedup (its dedup is the URL-seen set); this is
the training-data-pipeline surface the brief mandates on top.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def keep_table(spark, results, pages=None):
    """(url, dup_of, is_canonical) from a results DataFrame
    (project, taskid, url, result-json, updatetime); ``pages`` is the
    fallback text source when results carry no simhash."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from pyspider_spark.ops.dedup import simhash_keep_table

    latest = (
        results.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("url").orderBy(
                    F.desc("updatetime"), F.desc("taskid")
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    sh = latest.select(
        "url",
        F.get_json_object("result", "$.simhash").cast("long").alias("simhash"),
    )
    n_missing = sh.filter(F.col("simhash").isNull()).limit(1).count()
    if n_missing and pages is not None:
        # analysis was off during the crawl: recompute fingerprints
        # from page text with the SAME kernel the engine uses per page
        from pyspider_spark.ops.textstats import analyze_frame

        simhash_udf = F.pandas_udf(lambda s: analyze_frame(s)["simhash"], "long")

        sh = (
            latest.select("url")
            .join(
                pages.select(
                    F.col("url").alias("page_url"), simhash_udf("text").alias("simhash")
                ),
                F.col("url") == F.col("page_url"),
                "left",
            )
            .select("url", "simhash")
        )
    fps = sh.filter(F.col("simhash").isNotNull()).select(
        F.col("url").alias("doc_id"), "simhash"
    )
    keep = simhash_keep_table(fps)
    return keep.select(
        F.col("doc_id").alias("url"),
        "dup_of",
        (F.col("dup_of") == F.col("doc_id")).alias("is_canonical"),
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", required=True, help="crawl snapshot state dir")
    ap.add_argument("--fixtures", default=None, help="fixtures dir (pages fallback)")
    ap.add_argument("--out", default=None, help="output dir (default <state>/keep)")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspider_spark.engine.session import get_spark
    from pyspider_spark.engine.snapshot import SnapshotStore

    spark = get_spark(cores=args.cores, app_name="corpus_dedup")
    snap = SnapshotStore(args.state)
    man = snap.read_manifest()
    if not man:
        print(json.dumps({"error": "no committed manifest", "state": args.state}))
        return 2
    rels = man.get("tables", {}).get("results", [])
    if not rels:
        print(json.dumps({"error": "no results tables in manifest"}))
        return 2
    results = spark.read.parquet(*[snap.abspath(r) for r in rels])
    pages = None
    if args.fixtures:
        pages = spark.read.parquet(f"{args.fixtures.rstrip('/')}/pages.parquet")
    keep = keep_table(spark, results, pages).persist()
    out = args.out or os.path.join(args.state, "keep")
    keep.write.mode("overwrite").parquet(out)
    n = keep.count()
    n_dup = keep.filter(~keep.is_canonical).count()
    print(
        json.dumps(
            {"docs": n, "duplicates": n_dup, "canonical": n - n_dup, "out": out}
        )
    )
    keep.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
