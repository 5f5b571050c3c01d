"""Run N crawl rounds over a pages table — the spark-submit entrypoint
(SURVEY §3.2; BASELINE.json:14 "spark-submit --py-files ...").

    spark-submit --py-files dist/pyspider_spark.zip jobs/crawl_rounds.py \
        --fixtures <dir-with-pages/seeds/projects/robots.parquet> \
        --state <state-dir> --rounds 5 [--cores 32] [--budget 100000]

Also runnable as plain `python jobs/crawl_rounds.py ...` in local mode
(the session helper builds local[cores]). Resumes automatically from
the state dir's last committed snapshot.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# local-mode convenience: make the repo root importable when invoked as
# `python jobs/crawl_rounds.py` (on a cluster, --py-files ships the pkg)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixtures", required=True, help="dir with pages/seeds/projects/robots parquet")
    ap.add_argument("--state", required=True, help="snapshot state dir")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--budget", type=int, default=100_000)
    ap.add_argument("--n-partitions", type=int, default=8)
    ap.add_argument("--rate", type=float, default=1.0)
    ap.add_argument("--burst", type=float, default=10.0)
    ap.add_argument("--stop-when-quiet", action="store_true")
    ap.add_argument(
        "--fetch-stage",
        choices=("join", "http"),
        default="join",
        help="'join' = simulated fetch vs the pages table (sandbox); "
        "'http' = production transport-injectable HTTP stage",
    )
    ap.add_argument(
        "--transport",
        default=None,
        help="http stage transport factory 'module:callable' "
        "(default: real urllib transport)",
    )
    ap.add_argument(
        "--transport-arg",
        default=None,
        help="argument for the transport factory (e.g. routes JSON "
        "path for file_transport)",
    )
    ap.add_argument(
        "--migrate-to",
        type=int,
        default=None,
        help="re-bucket the committed state to this partition count "
        "(engine.migrate) before running rounds; use with --rounds 0 "
        "for a standalone migration",
    )
    args = ap.parse_args(argv)

    from pyspider_spark.config import RoundConfig
    from pyspider_spark.engine.round import CrawlEngine
    from pyspider_spark.engine.session import get_spark

    spark = get_spark(cores=args.cores, app_name="crawl_rounds")
    fetch_kw: dict = {"fetch_stage": args.fetch_stage}
    if args.transport:
        fetch_kw["http_transport"] = args.transport
    if args.transport_arg:
        fetch_kw["http_transport_arg"] = args.transport_arg
    cfg = RoundConfig(
        round_budget=args.budget,
        n_partitions=args.n_partitions,
        rate=args.rate,
        burst=args.burst,
        **fetch_kw,
    )
    fx = args.fixtures.rstrip("/")
    eng = CrawlEngine(
        spark,
        args.state,
        cfg,
        pages_path=f"{fx}/pages.parquet",
        projects_path=f"{fx}/projects.parquet",
        robots_path=f"{fx}/robots.parquet",
    )
    if args.migrate_to is not None:
        from pyspider_spark.engine.migrate import migrate_partitions

        print(json.dumps({"migration": migrate_partitions(eng, args.migrate_to)}))
    seeds = spark.read.parquet(f"{fx}/seeds.parquet")
    metrics = eng.run_rounds(args.rounds, seeds=seeds, stop_when_quiet=args.stop_when_quiet)
    for m in metrics:
        print(json.dumps(m))
    return 0


if __name__ == "__main__":
    sys.exit(main())
