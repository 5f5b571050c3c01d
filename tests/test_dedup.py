"""ops/dedup — corpus MinHash dedup engine op.

Pinned-fixture tests (no oracle): known duplicate structure in a tiny
corpus, exercising candidate generation, exact-Jaccard verify, the
hot-band guard, and connected-component keep assignment including a
chain that needs >1 label-propagation iteration.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pyspider_spark.ops.dedup import (
    band_keys,
    candidate_pairs,
    dedup_corpus,
    minhash_signatures,
    shingles,
    verified_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "while birds sing in the tall green trees above"
)


def _docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact copy of 1
        (3, BASE + " with one extra tail phrase added"),  # near-dup of 1
        (10, "completely different text about spark dataframes and shuffle partitions and catalyst optimizer rules"),
        (11, "short"),  # < 3 tokens → no grams
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingles_distinct_and_short_doc(spark):
    g = shingles(_docs(spark))
    per_doc = {r["doc_id"]: r["n"] for r in g.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert 11 not in per_doc  # too short for a 3-gram
    # doc 1 and its exact copy have identical gram sets
    g1 = {r["gram"] for r in g.filter(F.col("doc_id") == 1).collect()}
    g2 = {r["gram"] for r in g.filter(F.col("doc_id") == 2).collect()}
    assert g1 == g2 and len(g1) > 10


def test_exact_copy_is_band_candidate_and_jaccard_one(spark):
    docs = _docs(spark)
    cand = candidate_pairs(band_keys(minhash_signatures(shingles(docs))))
    pairs = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
    assert (1, 2) in pairs
    vp = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in verified_pairs(docs, 0.5).collect()}
    assert vp[(1, 2)] == 1.0
    # unrelated doc never pairs with the BASE cluster
    assert not any(10 in p for p in vp)


def test_dedup_corpus_components(spark):
    out = {r["doc_id"]: r["dup_of"] for r in dedup_corpus(_docs(spark), 0.5).collect()}
    # 1,2 collapse to min id 1; singletons keep themselves
    assert out[1] == 1 and out[2] == 1
    assert out[10] == 10 and out[11] == 11
    # every doc got an assignment
    assert set(out) == {1, 2, 3, 10, 11}
    # doc 3 (near-dup) joins the cluster iff its jaccard >= 0.5 —
    # consistent either way with the verified pair set
    vp = {(r["doc_a"], r["doc_b"]) for r in verified_pairs(_docs(spark), 0.5).collect()}
    assert (out[3] == 1) == ((1, 3) in vp or (2, 3) in vp)


def test_chain_cluster_propagates_min_label(spark):
    # A -- B -- C where A/C share little directly: force a chain by
    # overlapping halves; all three share enough with the middle doc.
    words = [f"w{i}" for i in range(30)]
    a = " ".join(words[:20])
    b = " ".join(words[5:25])
    c = " ".join(words[10:30])
    docs = spark.createDataFrame(
        [(100, a), (200, b), (300, c)], "doc_id long, text string"
    )
    vp = {(r["doc_a"], r["doc_b"]) for r in verified_pairs(docs, 0.5).collect()}
    out = {r["doc_id"]: r["dup_of"] for r in dedup_corpus(docs, 0.5).collect()}
    if (100, 200) in vp and (200, 300) in vp and (100, 300) not in vp:
        # true chain: transitive closure must still collapse C to 100
        assert out == {100: 100, 200: 100, 300: 100}
    # regardless of band luck, assignments are component-consistent
    for x, y in vp:
        assert out[x] == out[y]


def test_hot_band_guard_drops_wide_bands(spark):
    # 6 exact copies → one band bucket of width 6; guard at 3 drops it
    docs = spark.createDataFrame(
        [(i, BASE) for i in range(1, 7)], "doc_id long, text string"
    )
    assert verified_pairs(docs, 0.5, max_band_width=3).count() == 0
    unguarded = verified_pairs(docs, 0.5).count()
    assert unguarded == 15  # C(6,2) exact-copy pairs
