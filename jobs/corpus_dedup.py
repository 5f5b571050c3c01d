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

``--incremental`` switches to the per-round production mode: only
urls not yet in the versioned ``--dedup-state`` are deduped, against
the persisted keepers' fingerprints (ops/dedup.simhash_incremental);
the state advances atomically (STATE.json os.replace) and a crashed
run re-runs idempotently. O(batch) per round instead of re-deduping
the whole corpus — including the state WRITE: version dirs hold
per-batch deltas, reads union the live dirs (merge-on-read, the
frontier pattern — rows are append-only so no resolve), and a
geometric fold (when deltas outgrow the base) keeps read
amplification bounded at amortized O(1) write cost per row.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _latest_fps(spark, results, pages=None):
    """(doc_id=url, simhash) fingerprints: latest crawl per url, from
    the result JSON when the crawl ran with analysis on, otherwise
    recomputed from the pages table's text through the same
    ``analyze_text`` kernel."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

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
    return sh.filter(F.col("simhash").isNotNull()).select(
        F.col("url").alias("doc_id"), "simhash"
    )


def keep_table(spark, results, pages=None):
    """(url, dup_of, is_canonical) from a results DataFrame
    (project, taskid, url, result-json, updatetime); ``pages`` is the
    fallback text source when results carry no simhash."""
    import pyspark.sql.functions as F

    from pyspider_spark.ops.dedup import simhash_keep_table

    keep = simhash_keep_table(_latest_fps(spark, results, pages))
    return keep.select(
        F.col("doc_id").alias("url"),
        "dup_of",
        (F.col("dup_of") == F.col("doc_id")).alias("is_canonical"),
    )


_KEEP_SCHEMA = "url string, dup_of string, is_canonical boolean"
_FPS_SCHEMA = "doc_id string, simhash long"
# fold when the accumulated deltas outgrow the base (corpus roughly
# doubled since the last fold — the geometric policy that makes fold
# cost amortized O(1) per row, the frontier-MoR argument) or when the
# live-dir count alone threatens read amplification
_FOLD_MIN_DIRS = 3
_MAX_DELTA_DIRS = 64


def _read_meta(state_dir):
    p = os.path.join(state_dir, "STATE.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        meta = json.load(f)
    if "live" not in meta:
        # pre-delta layout: the latest version dir held the full state
        meta["live"] = [f"v{int(meta['version']):06d}"]
    return meta


def _union_dirs(spark, state_dir, live, name, schema):
    """Merge-on-read over the live state dirs (base fold + per-batch
    deltas). Keep/fps rows are append-only — a keeper assignment never
    changes — so the union IS the state, no resolve step needed.
    Explicit schema: a delta whose batch produced no keepers is a
    legal empty dir."""
    if not live:
        return None
    return spark.read.schema(schema).parquet(
        *[os.path.join(state_dir, d, name) for d in live]
    )


def _read_state(spark, state_dir):
    """Current dedup-state version:
    (version, keep_df|None, fps_df|None, processed result-dir rels)."""
    meta = _read_meta(state_dir)
    if meta is None:
        return 0, None, None, []
    live = list(meta["live"])
    return (
        int(meta["version"]),
        _union_dirs(spark, state_dir, live, "keep.parquet", _KEEP_SCHEMA),
        _union_dirs(spark, state_dir, live, "fps.parquet", _FPS_SCHEMA),
        list(meta.get("processed", [])),
    )


def incremental_keep(
    spark, results, state_dir, pages=None, max_hamming=3, processed_add=None
):
    """ONE incremental dedup batch over a growing crawl — the
    production mode: urls not yet in the persisted dedup state are
    fingerprint-deduped against the state keepers
    (ops/dedup.simhash_incremental — band collision + exact hamming),
    then the state advances one version atomically (versioned dirs +
    STATE.json os.replace, the SnapshotStore commit pattern; a crash
    mid-write leaves the previous version live and the re-run is
    idempotent). Batch cost is O(new urls + collisions); prior rounds'
    texts and fingerprints are never re-deduped.

    Returns (keep_new, n_batch, n_dup): the batch's keep table and
    counts. Re-crawls of already-deduped urls keep their original
    assignment (the crawl's URL-seen set makes genuinely re-fetched
    urls rare; a changed page that must be re-deduped is a delete +
    re-add on the state, out of scope for the batch path). Single
    writer per state dir, like the crawl's manifest — run it as the
    per-round post-pass, not concurrently with itself.

    State writes are O(batch) too: each version dir holds only the
    batch's keep/fps DELTA and reads union the live dirs
    (merge-on-read; rows are append-only so no resolve is needed).
    When accumulated deltas outgrow the base — the corpus roughly
    doubled — the write folds everything into one dir (amortized O(1)
    per row); superseded dirs are GC'd after the atomic commit."""
    import shutil

    import pyspark.sql.functions as F

    from pyspider_spark.ops.dedup import simhash_incremental

    os.makedirs(state_dir, exist_ok=True)
    meta = _read_meta(state_dir) or {
        "version": 0,
        "processed": [],
        "live": [],
        "base_rows": 0,
        "delta_rows": 0,
    }
    v = int(meta["version"])
    live = list(meta["live"])
    processed = list(meta.get("processed", []))
    keep_old = _union_dirs(spark, state_dir, live, "keep.parquet", _KEEP_SCHEMA)
    fps_old = _union_dirs(spark, state_dir, live, "fps.parquet", _FPS_SCHEMA)
    if live and "base_rows" not in meta:
        # migrating a pre-delta layout: without real counts the fold
        # heuristic would see base_rows=0 and rewrite the full corpus
        # every few batches forever — count the inherited state ONCE
        # (persisted below, so this never repeats)
        meta["base_rows"] = keep_old.count()
        meta["delta_rows"] = 0
    fps_all = _latest_fps(spark, results, pages)
    batch = (
        fps_all
        if keep_old is None
        else fps_all.join(
            keep_old.select(F.col("url").alias("doc_id")), "doc_id", "left_anti"
        )
    )
    state_fps = (
        fps_old
        if fps_old is not None
        else spark.createDataFrame([], "doc_id string, simhash long")
    )
    keep_new = simhash_incremental(
        batch, state_fps, bits=64, max_hamming=max_hamming
    ).select(
        F.col("doc_id").alias("url"),
        "dup_of",
        (F.col("dup_of") == F.col("doc_id")).alias("is_canonical"),
    ).persist()
    n_batch = keep_new.count()
    n_dup = keep_new.filter(~F.col("is_canonical")).count()

    new_keeper_fps = batch.join(
        keep_new.filter(F.col("is_canonical")).select(
            F.col("url").alias("doc_id")
        ),
        "doc_id",
        "left_semi",
    )
    base_rows = int(meta.get("base_rows", 0))
    delta_rows = int(meta.get("delta_rows", 0))
    new_live = live
    if n_batch:
        d = f"v{v + 1:06d}"
        vd = os.path.join(state_dir, d)
        fold = not live or (
            len(live) >= _FOLD_MIN_DIRS and delta_rows + n_batch > base_rows
        ) or len(live) >= _MAX_DELTA_DIRS
        if fold:
            keep_w = keep_new if keep_old is None else keep_old.unionByName(keep_new)
            fps_w = (
                new_keeper_fps
                if fps_old is None
                else fps_old.unionByName(new_keeper_fps)
            )
            new_live = [d]
            base_rows, delta_rows = base_rows + delta_rows + n_batch, 0
        else:
            keep_w, fps_w = keep_new, new_keeper_fps
            new_live = live + [d]
            delta_rows += n_batch
        keep_w.write.mode("overwrite").parquet(os.path.join(vd, "keep.parquet"))
        fps_w.write.mode("overwrite").parquet(os.path.join(vd, "fps.parquet"))
    tmp = os.path.join(state_dir, "STATE.json.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {
                "version": v + 1,
                "live": new_live,
                "base_rows": base_rows,
                "delta_rows": delta_rows,
                # result dirs folded into this state: the caller passes
                # each manifest results dir ONCE, so every run scans
                # only the new rounds' tables — O(batch) including the
                # scan (the latest-per-url window runs over batch rows,
                # never the whole results history)
                "processed": sorted(set(processed) | set(processed_add or [])),
            },
            f,
        )
    os.replace(tmp, os.path.join(state_dir, "STATE.json"))
    # GC superseded dirs (only after the atomic commit; single-writer
    # contract makes this safe — no concurrent reader holds them)
    keep_set = set(new_live)
    for name in os.listdir(state_dir):
        if (
            name.startswith("v")
            and name[1:].isdigit()
            and int(name[1:]) <= v + 1
            and name not in keep_set
        ):
            shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)
    keep_new.unpersist()
    return keep_new, n_batch, n_dup


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", required=True, help="crawl snapshot state dir")
    ap.add_argument("--fixtures", default=None, help="fixtures dir (pages fallback)")
    ap.add_argument("--out", default=None, help="output dir (default <state>/keep)")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument(
        "--incremental",
        action="store_true",
        help="dedup only urls not yet in --dedup-state against the "
        "persisted keeper fingerprints (O(batch), not O(corpus))",
    )
    ap.add_argument(
        "--dedup-state",
        default=None,
        help="versioned incremental dedup state dir (default <state>/dedup_state)",
    )
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
    if args.incremental:
        sd = args.dedup_state or os.path.join(args.state, "dedup_state")
        _, _, _, processed = _read_state(spark, sd)
        fresh = [r for r in rels if r not in set(processed)]
        if not fresh:
            print(json.dumps({"batch": 0, "duplicates": 0, "canonical": 0,
                              "dedup_state": sd, "new_dirs": 0}))
            return 0
        # scan ONLY the rounds not yet folded into the state
        batch_results = spark.read.parquet(*[snap.abspath(r) for r in fresh])
        _, n_batch, n_dup = incremental_keep(
            spark, batch_results, sd, pages, processed_add=fresh
        )
        print(
            json.dumps(
                {
                    "batch": n_batch,
                    "duplicates": n_dup,
                    "canonical": n_batch - n_dup,
                    "dedup_state": sd,
                    "new_dirs": len(fresh),
                }
            )
        )
        return 0
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
