"""One-time pages ingest: raw (url, html, ...) parquet → canon-keyed
BUCKETED pages table (engine/ingest.py), the 100 TB fetch-join layout.

    spark-submit --py-files dist/pyspider_spark.zip jobs/ingest_pages.py \
        --pages <raw-pages.parquet> --out <bucketed-dir> [--buckets 64]

Point crawl_rounds at the output dir afterwards (a pages path whose
dir carries the `_bucketing.json` marker is auto-registered as a
bucketed table and every fetch join co-locates on canon_url).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="raw pages parquet (url, html, ...)")
    ap.add_argument("--out", required=True, help="output dir for the bucketed table")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument(
        "--precanonical",
        action="store_true",
        help="urls are already canonical; skip the canon kernel",
    )
    args = ap.parse_args(argv)

    from pyspider_spark.engine.ingest import ingest_pages
    from pyspider_spark.engine.session import get_spark

    spark = get_spark(cores=args.cores, app_name="ingest_pages")
    loc = ingest_pages(
        spark,
        args.pages,
        args.out,
        n_buckets=args.buckets,
        precanonical=args.precanonical,
    )
    print(json.dumps({"location": loc, "buckets": args.buckets}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
