"""CrawlEngine — the batch-iterative round driver (SURVEY §3.1, §7.5).

One round = one Spark job replaying the reference's loop phases
(``pyspider/scheduler/scheduler.py — run_once(): _update_projects →
_check_task_done → _check_request → _check_cron → _check_select``) as
DataFrame stages:

    read frontier snapshot → normalize+collapse updates (follows from
    last round ∪ injected ∪ cron) → bloom/cuckoo seen probe
    [SHUFFLE pid] → MERGE frontier [SHUFFLE key] → candidates (P2/P3/P6)
    → robots (J4, broadcast dim) → salted politeness (O1/O2)
    [SHUFFLE host] → budget cut (O3, TakeOrdered) → fetch join (J1)
    [broadcast/SMJ canon_url] → extract (Arrow UDF) → settle + follows
    → atomic snapshot commit (frontier, results, metrics, schedule,
    host_state, seen blobs, cron state)

Cross-round state lives only in the snapshot store (Iceberg in
production, Parquet+manifest shim here) ⇒ exact resume: a crash
mid-round leaves the previous manifest; re-running the round is
idempotent (BASELINE.json:14).
"""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

from pyspider_spark.config import ACTIVE, BAD, FAILED, SUCCESS, RoundConfig
from pyspider_spark.engine import schema as S
from pyspider_spark.engine.fetchx import fetch_and_extract, prepare_pages
from pyspider_spark.engine.politeness import schedule_round
from pyspider_spark.engine.seen import probe_and_update
from pyspider_spark.engine.snapshot import SnapshotStore
from pyspider_spark.engine.stages import (
    KEY,
    order_cols,
    collapse_updates,
    ensure_raw_columns,
    merge_frontier,
    normalize_updates,
)

SCHEDULABLE = ("RUNNING", "DEBUG")


def _parquet_rows(d: str) -> int:
    """Row count of a parquet directory from file footers (no Spark job)."""
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(os.path.join(d, fn)).metadata.num_rows
        for fn in os.listdir(d)
        if fn.endswith(".parquet")
    )


def _parquet_column(d: str, column: str) -> list:
    """One column of a parquet directory, read driver-side (tiny tables)."""
    import pyarrow.parquet as pq

    out: list = []
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".parquet"):
            out.extend(
                pq.read_table(os.path.join(d, fn), columns=[column])[column].to_pylist()
            )
    return out


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        cfg: RoundConfig,
        pages_path: str,
        projects_path: str,
        robots_path: str | None = None,
    ):
        self.spark = spark
        self.cfg = cfg
        self.snap = SnapshotStore(state_dir)
        # Canonical page index (canon_url → html), materialized ONCE as
        # parquet: the canon pandas UDF over the whole pages table must
        # not re-run inside every round's fetch join, and a parquet
        # index beats an in-memory persist (vectorized reader, column
        # pruning, no executor-memory pressure from html blobs).
        # Production analog: canon_url is a stored column of the Iceberg
        # pages table, bucketed on it, written once at ingest.
        if cfg.pages_precanonical:
            # ingest already wrote canonical urls — read pristine parquet
            self.pages_canon = (
                spark.read.parquet(pages_path)
                .select(F.col("url").alias("canon_url"), "html")
            )
        else:
            canon_dir = os.path.join(state_dir, "pages_canon.parquet")
            if not os.path.exists(os.path.join(canon_dir, "_SUCCESS")):
                prepare_pages(spark.read.parquet(pages_path)).write.mode(
                    "overwrite"
                ).parquet(canon_dir)
            self.pages_canon = spark.read.parquet(canon_dir)
        self.projects = spark.read.parquet(projects_path)
        if robots_path:
            self.robots = spark.read.parquet(robots_path)
        else:
            self.robots = spark.createDataFrame(
                [], "host string, robots_txt string"
            )
        # tiny dim — driver-side copy for cron/schedulability decisions
        self._proj_rows = {
            r["project"]: r.asDict() for r in self.projects.collect()
        }

    # ---- snapshot-backed state reads -------------------------------------
    def _read(self, man: dict | None, name: str, schema) -> DataFrame:
        if man and name in man.get("tables", {}):
            return self.spark.read.parquet(self.snap.abspath(man["tables"][name]))
        return S.empty_df(self.spark, schema)

    def _write(self, df: DataFrame, r: int, name: str, partitions: int | None = None) -> str:
        path = self.snap.table_dir(r, name)
        (df.coalesce(partitions) if partitions else df).write.mode("overwrite").parquet(path)
        return self.snap.rel(path)

    # ---- cron (F9) --------------------------------------------------------
    def _cron_rows(self, cron_state: dict[str, int], now: float) -> tuple[list, dict]:
        cfg = self.cfg
        rows, new_state = [], dict(cron_state)
        for name in sorted(self._proj_rows):
            p = self._proj_rows[name]
            tick = p.get("min_tick") or 0
            if tick > 0 and p["status"] in SCHEDULABLE and now - cfg.t0 >= 0:
                k = int((now - cfg.t0) // tick)
                if k > new_state.get(name, -1):
                    new_state[name] = k
                    rows.append((f"data:,_on_cronjob|{name}|{k}", name, "_on_cronjob"))
        return rows, new_state

    # ---- one round ----------------------------------------------------------
    def run_round(self, r: int, inject: DataFrame | None = None) -> dict:
        cfg, snap, spark = self.cfg, self.snap, self.spark
        now = cfg.now(r)
        t_start = time.time()
        phase_s: dict[str, float] = {}
        _t = [t_start]

        def mark(name: str) -> None:
            t = time.time()
            phase_s[name] = round(t - _t[0], 3)
            _t[0] = t

        man = snap.read_manifest()
        state = (man or {}).get("state", {})

        fr = self._read(man, "frontier", S.FRONTIER_SCHEMA)
        follows = self._read(man, "follows", S.RAW_UPDATE_SCHEMA)
        host_state = self._read(man, "host_state", S.HOST_STATE_SCHEMA)

        cron_rows, cron_state = self._cron_rows(state.get("cron_count", {}), now)
        raw = ensure_raw_columns(follows)
        if inject is not None:
            raw = raw.unionByName(ensure_raw_columns(inject))
        if cron_rows:
            cron_df = spark.createDataFrame(
                [(u, None, p, cb) for (u, p, cb) in cron_rows],
                "url string, canon_url string, project string, callback string",
            )
            raw = raw.unionByName(ensure_raw_columns(cron_df))

        # persist: cancels/probe/merge all branch off this pipeline — the
        # normalize (Python mapInPandas) + collapse (shuffle) must run once.
        upd_all = normalize_updates(raw, cfg).persist(StorageLevel.MEMORY_AND_DISK)
        cancels = upd_all.filter(F.col("cancel")).dropDuplicates(["seen_k"])
        upd = collapse_updates(upd_all.filter(~F.col("cancel"))).persist(
            StorageLevel.MEMORY_AND_DISK
        )

        # --- seen probe: materialized eagerly so the deterministic blob
        # writes happen exactly once per round attempt (J2/J3).
        probe_cols = ["project", "taskid", "seen_k", "pid"]
        probe_in = cancels.select(*probe_cols, "cancel").unionByName(
            upd.select(*probe_cols).withColumn("cancel", F.lit(False))
        )
        prev_blobs = {
            int(pid): (self.snap.abspath(b), self.snap.abspath(c))
            for pid, (b, c) in (man or {}).get("blobs", {}).items()
        }
        probe_out = probe_and_update(probe_in, prev_blobs, snap.blob_dir(r), cfg)
        probe_rel = self._write(probe_out, r, "probe")
        probe = spark.read.parquet(snap.abspath(probe_rel))
        mark("normalize_probe")

        # --- merge (steps 0-1). No count actions here: frontier size
        # comes from the written parquet footers, and the pre-merge size
        # from the previous manifest (exact fallback below when cancels
        # actually removed rows this round).
        fr1 = fr.join(cancels.select(*KEY), KEY, "left_anti")
        fr2 = merge_frontier(
            fr1, upd, probe.filter(~F.col("cancel")), now, r, cfg
        ).persist(StorageLevel.MEMORY_AND_DISK)

        # --- candidates (P2/P3/P6)
        schedulable = [
            n for n, p in self._proj_rows.items() if p["status"] in SCHEDULABLE
        ]
        cands = fr2.filter(
            (F.col("status") == ACTIVE)
            & (F.col("exetime") <= F.lit(now))
            & F.col("project").isin(schedulable)
        )

        # --- politeness (O1/O2/O3/J4)
        sched, blocked = schedule_round(cands, self.robots, host_state, cfg, now)
        sched = sched.persist(StorageLevel.MEMORY_AND_DISK)
        blocked = blocked.persist(StorageLevel.MEMORY_AND_DISK)

        # --- host_state carry-over (only hosts that actually scheduled)
        hs_new = (
            sched.filter(F.col("host") != "")
            .groupBy("host")
            .agg(
                (F.first("refilled") - F.count("*")).alias("tokens"),
                F.lit(now).alias("last_ts"),
            )
        )
        host_state_next = host_state.join(
            hs_new.select("host"), "host", "left_anti"
        ).unionByName(hs_new)

        # --- fetch + extract (J1, F5/F7)
        fetched = fetch_and_extract(sched, self.pages_canon, cfg).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        ok = fetched.filter(F.col("code") == 200)
        fail = fetched.filter(F.col("code") != 200)

        res_fields = [
            F.length(F.coalesce("text", F.lit(""))).alias("text_len"),
            F.coalesce(F.size("links"), F.lit(0)).alias("n_links"),
        ]
        if cfg.analyze:
            res_fields += [
                F.col("analysis.token_count").alias("token_count"),
                F.col("analysis.lang_guess").alias("lang_guess"),
                F.col("analysis.quality").alias("quality"),
                F.col("analysis.simhash").alias("simhash"),
            ]
        results = ok.select(
            "project",
            "taskid",
            F.col("canon_url").alias("url"),
            F.to_json(F.struct(*res_fields)).alias("result"),
            F.lit(now).alias("updatetime"),
        )
        new_follows = ok.select(
            F.explode("links").alias("url"), F.col("project")
        ).withColumn("canon_url", F.col("url"))

        # --- settlement (steps 9 + robots BAD): per-key status deltas
        retry_case = F.lit(float(cfg.retry_delay[""]))
        for retried_n, delay in sorted(
            (k, v) for k, v in cfg.retry_delay.items() if k != ""
        ):
            retry_case = F.when(
                F.lit(cfg.max_retries) - F.col("retries_left") == retried_n,
                F.lit(float(delay)),
            ).otherwise(retry_case)

        settle_ok = ok.select(
            *KEY,
            F.when(
                F.col("auto_recrawl") & (F.col("age") >= 0), F.lit(ACTIVE)
            ).otherwise(F.lit(SUCCESS)).alias("new_status"),
            F.when(
                F.col("auto_recrawl") & (F.col("age") >= 0), F.lit(now) + F.col("age")
            ).alias("new_exetime"),
            F.lit(None).cast("int").alias("new_retries_left"),
            F.lit(now).alias("new_lastcrawltime"),
            F.lit("ok").alias("kind"),
        )
        settle_fail = fail.select(
            *KEY,
            F.when(F.col("retries_left") > 0, F.lit(ACTIVE))
            .otherwise(F.lit(FAILED))
            .alias("new_status"),
            F.when(F.col("retries_left") > 0, F.lit(now) + retry_case).alias("new_exetime"),
            F.when(F.col("retries_left") > 0, F.col("retries_left") - 1)
            .otherwise(F.col("retries_left"))
            .alias("new_retries_left"),
            F.lit(None).cast("double").alias("new_lastcrawltime"),
            F.lit("fail").alias("kind"),
        )
        settle_bad = blocked.select(
            *KEY,
            F.lit(BAD).alias("new_status"),
            F.lit(None).cast("double").alias("new_exetime"),
            F.lit(None).cast("int").alias("new_retries_left"),
            F.lit(None).cast("double").alias("new_lastcrawltime"),
            F.lit("blocked").alias("kind"),
        )
        settle = settle_ok.unionByName(settle_fail).unionByName(settle_bad)

        fr_final = (
            fr2.alias("o")
            .join(settle.alias("s"), KEY, "left")
            .select(
                *KEY,
                *[
                    F.col(f"o.{c}").alias(c)
                    for c in fr2.columns
                    if c
                    not in (*KEY, "status", "exetime", "retries_left", "lastcrawltime", "updatetime")
                ],
                F.coalesce("s.new_status", "o.status").alias("status"),
                F.coalesce("s.new_exetime", "o.exetime").alias("exetime"),
                F.coalesce("s.new_retries_left", "o.retries_left").alias("retries_left"),
                F.coalesce("s.new_lastcrawltime", "o.lastcrawltime").alias("lastcrawltime"),
                F.when(F.col("s.new_status").isNotNull(), F.lit(now))
                .otherwise(F.col("o.updatetime"))
                .alias("updatetime"),
            )
            .select([f.name for f in S.FRONTIER_SCHEMA.fields])
        )

        # per-host deterministic sequence for the schedule log (the
        # crawl-order artifact the equivalence gate checks)
        from pyspark.sql import Window

        w = Window.partitionBy("host").orderBy(*order_cols())
        schedule_log = sched.select(
            F.lit(r).alias("round"),
            "host",
            (F.row_number().over(w) - 1).alias("seq_in_host"),
            "project",
            "taskid",
            "canon_url",
            "priority",
        )

        # --- writes + atomic commit. ONE job (the frontier write)
        # materializes the whole merge→politeness→fetch→extract→settle
        # chain into the persisted intermediates; the remaining sinks
        # then run as concurrent cache-served Spark jobs (driver
        # threads). All metric counts come from the written parquet
        # footers — zero standalone count actions per round.
        tables = dict((man or {}).get("tables", {}))
        tables["frontier"] = self._write(fr_final, r, "frontier")
        mark("pipeline")

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=5) as pool:
            f_follows = pool.submit(self._write, new_follows, r, "follows")
            f_host = pool.submit(self._write, host_state_next, r, "host_state", 1)
            f_results = pool.submit(self._write, results, r, "results")
            f_sched_log = pool.submit(self._write, schedule_log, r, "schedule")
            f_settle = pool.submit(self._write, settle, r, "settle")
            tables["follows"] = f_follows.result()
            tables["host_state"] = f_host.result()
            tables["probe"] = probe_rel
            tables.setdefault("results", [])
            tables["results"] = list(tables["results"]) + [f_results.result()]
            tables.setdefault("schedule", [])
            tables["schedule"] = list(tables["schedule"]) + [f_sched_log.result()]
            tables.setdefault("settle", [])
            tables["settle"] = list(tables["settle"]) + [f_settle.result()]

        # --- counts from written artifacts (driver-side, no Spark jobs)
        n_frontier = _parquet_rows(snap.abspath(tables["frontier"]))
        n_sched = _parquet_rows(snap.abspath(tables["schedule"][-1]))
        kinds = _parquet_column(snap.abspath(tables["settle"][-1]), "kind")
        n_ok = sum(1 for k in kinds if k == "ok")
        n_fail = sum(1 for k in kinds if k == "fail")
        n_blocked = sum(1 for k in kinds if k == "blocked")
        prev_frontier = ((man or {}).get("lineage", {}).get("counts", {})).get(
            "frontier", 0
        )
        had_cancels = any(_parquet_column(snap.abspath(probe_rel), "cancel"))
        if had_cancels:
            n_prev = fr1.count()  # exact (rare path: cancels this round)
        else:
            n_prev = prev_frontier
        n_new = n_frontier - n_prev

        wall = time.time() - t_start
        metrics_df = self.spark.createDataFrame(
            [(r, n_sched, n_ok, n_fail, n_blocked, n_new, n_frontier, wall)],
            S.METRICS_SCHEMA,
        )
        tables.setdefault("metrics", [])
        tables["metrics"] = list(tables["metrics"]) + [
            self._write(metrics_df, r, "metrics", partitions=1)
        ]

        blobs = dict((man or {}).get("blobs", {}))
        blob_dir = snap.blob_dir(r)
        for fn in os.listdir(blob_dir):
            kind, pid = fn.rsplit(".", 1)[0].split("_")
            ent = blobs.get(pid) or [None, None]
            ent = list(ent)
            rel = snap.rel(os.path.join(blob_dir, fn))
            if kind == "bloom":
                ent[0] = rel
            else:
                ent[1] = rel
            blobs[pid] = ent

        snap.commit(
            {
                "round": r,
                "tables": tables,
                "blobs": blobs,
                "state": {"cron_count": cron_state},
                "lineage": {
                    "round": r,
                    "now": now,
                    "counts": {
                        "scheduled": n_sched,
                        "ok": n_ok,
                        "failed": n_fail,
                        "robots_blocked": n_blocked,
                        "new_urls": n_new,
                        "frontier": n_frontier,
                    },
                },
            }
        )
        mark("sinks_commit")
        for df in (fr2, sched, blocked, fetched, upd_all, upd):
            df.unpersist()
        return {
            "phase_s": phase_s,
            "round": r,
            "scheduled": n_sched,
            "ok": n_ok,
            "failed": n_fail,
            "robots_blocked": n_blocked,
            "new_urls": n_new,
            "frontier": n_frontier,
            "wall_s": wall,
        }

    # ---- multi-round driver ---------------------------------------------
    def run_rounds(
        self,
        rounds: int,
        seeds: DataFrame | None = None,
        inject_at: dict[int, DataFrame] | None = None,
        stop_when_quiet: bool = False,
    ) -> list[dict]:
        """Run rounds starting after the last committed one (resume).
        Seeds are injected at round 0 only (ignored on resume past 0)."""
        man = self.snap.read_manifest()
        start = (man["round"] + 1) if man else 0
        inject_at = dict(inject_at or {})
        if seeds is not None and start == 0:
            base = inject_at.get(0)
            inject_at[0] = (
                ensure_raw_columns(base).unionByName(ensure_raw_columns(seeds))
                if base is not None
                else seeds
            )
        out = []
        for r in range(start, start + rounds):
            m = self.run_round(r, inject_at.get(r))
            out.append(m)
            if stop_when_quiet and m["scheduled"] == 0 and m["new_urls"] == 0:
                break
        return out

    # ---- single-task debug (webui/debug.py — run()) -----------------------
    def debug_one(self, url: str) -> dict:
        """Fetch+extract one url against the pages table, no state writes
        (mirrors the WebUI debug run, SURVEY §3.3)."""
        from pyspider_spark.kernels.canon import canonicalize, url_host

        cu = canonicalize(url)
        one = self.spark.createDataFrame(
            [(cu, "debug", "debug", url, url_host(cu), 0, 0.0, -1.0, False, "index_page", 0)],
            "canon_url string, project string, taskid string, url string, host string, "
            "priority int, exetime double, age double, auto_recrawl boolean, "
            "callback string, retries_left int",
        )
        row = fetch_and_extract(one, self.pages_canon, self.cfg).collect()[0]
        return {
            "url": cu,
            "status_code": row["code"],
            "text": row["text"],
            "follows": list(row["links"] or []),
        }
