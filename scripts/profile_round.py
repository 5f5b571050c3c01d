"""Phase-attributed executor-utilization profile of the dense crawl.

Runs the same dense-regime crawl as `bench.py --scaling` legs in ONE
process with the Spark UI enabled, records each phase's wall-clock
interval, then buckets every stage's executorRunTime / executorCpuTime
(from the UI REST API) into the phase whose interval contains the
stage's submission. The gap between `phase wall x cores` and the
executor-busy time inside that phase is the non-scaling cost (driver
bookkeeping, Catalyst planning, job scheduling, barriers) that caps
local[8]->local[32] speedup.

    SPARK_GRAFT_CPUS=32 python scripts/profile_round.py [--mult 48]
        [--rounds 3] [--words 1200] [--seeds-div 5] [--host-rate 3000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--mult", type=int, default=48)
    ap.add_argument("--words", type=int, default=1200)
    ap.add_argument("--seeds-div", type=int, default=5)
    ap.add_argument("--host-rate", type=float, default=3000.0)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--executors", type=int, default=None,
                    help="profile on local-cluster[N,4,*] executor JVMs")
    ap.add_argument("--broadcast-rows", type=int, default=None)
    ap.add_argument("--tasks", action="store_true",
                    help="also report per-phase max task counts (width)")
    args = ap.parse_args()

    from bench import ensure_fixtures
    from pyspider_spark.config import RoundConfig
    from pyspider_spark.engine.round import CrawlEngine
    from pyspider_spark.engine.session import get_spark

    os.environ["SPARK_GRAFT_UI"] = "1"  # REST metrics source
    spark = get_spark(cores=args.cores, app_name="profile_round", n_executors=args.executors)
    fixtures = ensure_fixtures(
        spark, args.sf_dir, mult=args.mult, page_words=args.words, seeds_div=args.seeds_div
    )
    state = os.path.join(fixtures, f"state_prof_{os.getpid()}")
    shutil.rmtree(state, ignore_errors=True)
    cfg_kw = {}
    if args.broadcast_rows is not None:
        cfg_kw["fetch_broadcast_max_rows"] = args.broadcast_rows
        cfg_kw["merge_broadcast_max_rows"] = args.broadcast_rows
    cfg = RoundConfig(
        rate=args.host_rate,
        burst=args.host_rate,
        n_partitions=32,
        round_budget=None,
        analyze=True,
        pages_precanonical=True,
        **cfg_kw,
    )
    eng = CrawlEngine(
        spark,
        state,
        cfg,
        pages_path=os.path.join(fixtures, "pages.parquet"),
        projects_path=os.path.join(fixtures, "projects.parquet"),
        robots_path=os.path.join(fixtures, "robots.parquet"),
    )
    seeds = spark.read.parquet(os.path.join(fixtures, "seeds.parquet"))

    # wrap run_round's mark() by sampling wall clock around each round;
    # phase intervals are reconstructed from the phase_s dict order
    # (dict preserves insertion order) + the round start timestamp.
    intervals: list[tuple[str, float, float]] = []  # (label, t0, t1)
    metrics = []
    for r in range(args.rounds):
        t0 = time.time()
        m = eng.run_round(r, seeds if r == 0 else None)
        metrics.append(m)
        t = t0
        for name, dur in m["phase_s"].items():
            intervals.append((f"r{r}:{name}", t, t + dur))
            t += dur

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    )
    # bucket stages into phases by submission time
    import datetime

    def _ts(s: str) -> float:
        # "2026-08-21T01:02:03.456GMT"
        return (
            datetime.datetime.strptime(s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
            .timestamp()
        )

    per_phase: dict[str, dict] = {}
    unattributed = {"run_ms": 0, "cpu_ms": 0, "stages": 0}
    for st in stages:
        sub = _ts(st["submissionTime"]) if "submissionTime" in st else None
        run_ms = st.get("executorRunTime", 0)
        cpu_ms = st.get("executorCpuTime", 0) / 1e6  # ns -> ms
        label = None
        if sub is not None:
            for name, a, b in intervals:
                if a <= sub <= b:
                    label = name
                    break
        if label is None:
            unattributed["run_ms"] += run_ms
            unattributed["cpu_ms"] += int(cpu_ms)
            unattributed["stages"] += 1
            continue
        d = per_phase.setdefault(
            label,
            {"run_ms": 0, "cpu_ms": 0, "stages": 0, "tasks": 0, "sh_mb": 0},
        )
        d["run_ms"] += run_ms
        d["cpu_ms"] += int(cpu_ms)
        d["stages"] += 1
        d["tasks"] += st.get("numTasks", 0)
        d["sh_mb"] += int(
            (st.get("shuffleWriteBytes", 0) + st.get("shuffleReadBytes", 0)) / 1e6
        )

    # in executor mode the real width is N executors x EXECUTOR_CORES —
    # --cores only shapes local[] mode and must not inflate the
    # parallel_frac denominator
    from pyspider_spark.engine.session import EXECUTOR_CORES

    cores = args.executors * EXECUTOR_CORES if args.executors else args.cores
    rows = []
    for r in range(args.rounds):
        for name, dur in metrics[r]["phase_s"].items():
            lab = f"r{r}:{name}"
            d = per_phase.get(
                lab, {"run_ms": 0, "cpu_ms": 0, "stages": 0, "tasks": 0, "sh_mb": 0}
            )
            busy_s = d["run_ms"] / 1000.0 / cores  # executor-busy wall equivalent
            rows.append(
                {
                    "phase": lab,
                    "wall_s": dur,
                    "exec_busy_s": round(busy_s, 1),
                    "parallel_frac": round(busy_s / dur, 2) if dur > 0 else None,
                    "cpu_over_run": round(d["cpu_ms"] / d["run_ms"], 2) if d["run_ms"] else None,
                    "stages": d["stages"],
                    "tasks": d["tasks"],
                    "shuffle_mb": d["sh_mb"],
                }
            )
    report = {
        "cores": cores,
        "executors": args.executors,
        "mult": args.mult,
        "rounds": [
            {k: m[k] for k in ("round", "scheduled", "ok", "new_urls", "wall_s")}
            for m in metrics
        ],
        "phases": rows,
        "unattributed": unattributed,
    }
    print(json.dumps(report, indent=1))
    shutil.rmtree(state, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
