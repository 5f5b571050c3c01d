"""Training-corpus export — the terminal stage of the pipeline the
brief mandates on top of the crawl engine: per-document analysis →
quality/language filter → near-dup removal → deterministic sharding.

Composition (every stage is an existing, individually-gated op):

- :func:`with_text_stats` — ONE Arrow ``mapInPandas`` pass running the
  same ``analyze_text`` kernel the crawl's extract stage fuses in
  (ops/textstats.py), appending (token_count, lang, quality, simhash)
  to arbitrary input columns.
- quality gate — plain Catalyst filter on the appended columns
  (pushable, codegen'd; no Python).
- optional near-dup removal — ``ops/dedup.simhash_keep_table`` over
  the fingerprints just computed (banded hamming pairs → connected
  components → keep-assignment; never all-pairs), then keep only
  canonical docs via an inner join on the keep table.
- :func:`with_shard` — deterministic shard id from the first 8 hex
  chars of ``md5(key)`` (the same portable F1-style derivation the
  contract uses), so shard membership is stable across runs, engines
  and cluster sizes — a re-export after an incremental crawl moves no
  previously-exported document between shards.

Reference parity: pyspider stops at resultdb (database/base/
resultdb.py); corpus export is pipeline surface beyond the reference,
mandated by the brief's training-data requirements.

Scale shape (100 TB): stats are one streaming Arrow pass (no shuffle);
the filter is map-side; dedup shuffles band keys + near-dup edges only
(band-bounded, see ops/dedup.py); the keep-join is a key shuffle of
(key, dup_of) pairs; sharding adds ONE hash exchange on the shard id
so each output shard is written by exactly the tasks that own it
(bounded file counts — without the repartition a partitionBy write
emits n_tasks × n_shards files).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from pyspider_spark.ops.textstats import analyze_frame

_STATS_FIELDS = "token_count int, lang string, quality double, simhash long"


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append (token_count, lang, quality, simhash) computed by the
    engine's ``analyze_text`` kernel — one Arrow batch pass, all input
    columns carried through. Input columns that already carry these
    names (e.g. crawl results re-exported with the engine's own
    analyze fields) are dropped first — appending a second ``simhash``
    would yield a duplicate-name schema that breaks every downstream
    ``F.col`` (review r4)."""
    stat_names = {"token_count", "lang", "quality", "simhash"}
    clash = [c for c in docs.columns if c in stat_names]
    if clash:
        docs = docs.drop(*clash)
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in docs.schema.fields
    )
    schema = f"{schema}, {_STATS_FIELDS}"

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = analyze_frame(pdf[text_col])
            stats.columns = ["token_count", "lang", "quality", "simhash"]
            yield pd.concat([pdf.reset_index(drop=True), stats], axis=1)

    return docs.mapInPandas(fn, schema)


def with_shard(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """Deterministic shard id: first 8 md5 hex chars of the key as an
    integer, mod n_shards (portable across engines — `contract._h32`)."""
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
    return df.withColumn(
        "shard", F.pmod(h.cast("long"), F.lit(n_shards)).cast("int")
    )


def export_corpus(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_tokens: int = 1,
    min_quality: float = 0.0,
    langs: tuple[str, ...] | None = None,
    n_shards: int = 16,
    dedup: bool = False,
    max_hamming: int = 3,
    max_band_width: int | None = None,
) -> DataFrame:
    """The full export plan: stats → filter → (optional) near-dup
    removal → shard. Returns the input columns + (token_count, lang,
    quality, simhash, shard); callers write it partitioned by
    ``shard`` (see jobs/corpus_export.py)."""
    out = with_text_stats(docs, text_col)
    out = out.filter(
        (F.col("token_count") >= min_tokens) & (F.col("quality") >= min_quality)
    )
    if langs:
        out = out.filter(F.col("lang").isin(*langs))
    if dedup:
        from pyspider_spark.ops.dedup import simhash_keep_table

        # the dedup branch fans `out` into ~6 consumers while building
        # the keep table (both sides of the band self-join, the
        # component nodes) — without a materialization point each one
        # re-runs the Python analyze pass over all text (review r4).
        # Persist `out` for the (already-eager) keep-table build, then
        # materialize ONLY the small keeper-KEY table (localCheckpoint
        # of keys, not corpus) and unpersist before returning the lazy
        # final join: a long-lived session must not accumulate cached
        # partitions per call (round-4 advice), and checkpointing the
        # full text corpus into executor block storage would double
        # storage (round-5 review). Caveat: localCheckpoint blocks are
        # executor-held, so losing an executor holding `canon`'s
        # blocks before the caller's action still fails that action —
        # the slimming removes the storage-doubling cost, not the
        # executor-loss exposure (which a keys-only table keeps small
        # and cheap to re-run). Cost: the caller's write action
        # streams ONE more analyze pass over the text.
        out = out.persist()
        try:
            fps = out.select(F.col(key_col).alias("doc_id"), "simhash")
            keep = simhash_keep_table(
                fps, bits=64, max_hamming=max_hamming,
                max_band_width=max_band_width,
            )
            canon = (
                keep.filter(F.col("doc_id") == F.col("dup_of"))
                .select(F.col("doc_id").alias(key_col))
                .localCheckpoint()
            )
        finally:
            out.unpersist()
        out = out.join(canon, key_col, "inner")
    return with_shard(out, key_col, n_shards)


def write_shards(
    df: DataFrame, out_dir: str, fmt: str = "parquet", n_shards: int | None = None
) -> None:
    """Write the export partitioned by shard. One exchange on the
    shard id first so file count stays O(n_shards), not
    O(tasks × n_shards)."""
    rep = df.repartition(n_shards, "shard") if n_shards else df.repartition("shard")
    w = rep.write.mode("overwrite").partitionBy("shard")
    if fmt == "json":
        w.json(out_dir)
    else:
        w.parquet(out_dir)
