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


def _brute_hamming(fps: dict[int, int], max_h: int):
    ids = sorted(fps)
    m = (1 << 64) - 1  # mask: signed int64 fingerprints xor correctly
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin((fps[a] ^ fps[b]) & m).count("1")
            if h <= max_h:
                out.add((a, b, h))
    return out


def _i64(u: int) -> int:
    """unsigned 64-bit → the signed value a Spark long carries."""
    return u - (1 << 64) if u >= (1 << 63) else u


def test_simhash_64bit_signed_fingerprints(spark):
    """bits=64 (the analyze_text default): fingerprints with bit 63
    set are NEGATIVE int64s — banding and the bit_count verify must be
    representation-exact across the sign wrap (round-2 verdict #2)."""
    from pyspider_spark.ops.dedup import simhash_near_dup

    base = _i64(0xDEAD_BEEF_CAFE_F00D)  # bit 63 set → negative
    fps = {i: _i64(((i * 0x9E3779B97F4A7C15) ^ (i << 40)) & ((1 << 64) - 1))
           for i in range(1, 40)}
    fps[100] = base
    fps[101] = _i64((base & ((1 << 64) - 1)) ^ 0b101)  # hamming 2, low band
    fps[102] = _i64((base & ((1 << 64) - 1)) ^ (0b11 << 62))  # hamming 2, sign band
    fps[103] = _i64((base & ((1 << 64) - 1)) ^ ((1 << 63) | (1 << 1)))  # crosses sign
    fps[104] = _i64((base & ((1 << 64) - 1)) ^ 0b1111)  # hamming 4 (dropped)
    df = spark.createDataFrame(
        [(k, v) for k, v in fps.items()], "doc_id long, simhash long"
    )
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_dup(df, bits=64, max_hamming=3).collect()
    }
    assert got == _brute_hamming(fps, 3)
    assert (100, 101, 2) in got and (100, 102, 2) in got and (100, 103, 2) in got
    assert not any(a == 100 and b == 104 for a, b, _ in got)


def test_simhash_64bit_band_width():
    """At the 64-bit default with max_hamming=3 the pigeonhole bands
    are 16 bits wide — the web-scale requirement (8-bit bands from
    32-bit fingerprints collide ~N/256 times per value at 10^9 docs)."""
    bits, max_hamming = 64, 3
    n_bands = max_hamming + 1
    width = bits // n_bands
    assert width == 16
    # last band takes the remainder; all bands cover exactly 64 bits
    widths = [width] * (n_bands - 1) + [bits - width * (n_bands - 1)]
    assert sum(widths) == 64 and min(widths) >= 16


def test_simhash_near_dup_exact_vs_brute_force(spark):
    from pyspider_spark.ops.dedup import simhash_near_dup

    # deterministic pseudo-random 32-bit fingerprints + planted pairs
    fps = {i: (i * 2654435761) % (1 << 32) for i in range(1, 40)}
    fps[100] = fps[1]  # hamming 0
    fps[101] = fps[1] ^ 0b111  # hamming 3 (kept)
    fps[102] = fps[1] ^ 0b1111  # hamming 4 (dropped)
    fps[103] = fps[1] ^ ((1 << 31) | (1 << 0))  # spread across bands
    df = spark.createDataFrame(
        [(k, v) for k, v in fps.items()], "doc_id long, simhash long"
    )
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_dup(df, bits=32, max_hamming=3).collect()
    }
    expect = _brute_hamming(fps, 3)
    assert got == expect
    assert (1, 100, 0) in got and (1, 101, 3) in got and (1, 103, 2) in got
    assert not any(a == 1 and b == 102 for a, b, _ in got)


def test_simhash_band_remainder_bits(spark):
    from pyspider_spark.ops.dedup import simhash_near_dup

    # bits=30 with 4 bands → widths 7,7,7,9: pairs differing only in
    # the top remainder bits must still be found (last band covers them)
    fps = {1: 0, 2: 1 << 29, 3: (1 << 29) | (1 << 28) | (1 << 27) | (1 << 26)}
    df = spark.createDataFrame(
        [(k, v) for k, v in fps.items()], "doc_id long, simhash long"
    )
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_dup(df, bits=30, max_hamming=3).collect()
    }
    assert got == _brute_hamming(fps, 3)
    assert (1, 2, 1) in got


def test_simhash_keep_table_url_keys(spark):
    from pyspider_spark.ops.dedup import simhash_keep_table

    # url-string doc ids: exact fp copies collapse to the lexicographic
    # min url; distinct fps stay canonical
    rows = [
        ("http://a.example/1", 0xDEADBEEF),
        ("http://b.example/1", 0xDEADBEEF),
        ("http://c.example/1", 0xDEADBEEE),  # hamming 1 from the pair
        ("http://z.example/9", 0x12345678),
    ]
    df = spark.createDataFrame(rows, "doc_id string, simhash long")
    out = {r["doc_id"]: r["dup_of"] for r in simhash_keep_table(df).collect()}
    assert out["http://a.example/1"] == "http://a.example/1"
    assert out["http://b.example/1"] == "http://a.example/1"
    assert out["http://c.example/1"] == "http://a.example/1"
    assert out["http://z.example/9"] == "http://z.example/9"


def test_corpus_dedup_job_keep_table(spark):
    """jobs/corpus_dedup.keep_table over a results-shaped frame:
    latest-crawl-wins per url, simhash parsed from the result JSON."""
    from jobs.corpus_dedup import keep_table

    def res(url, simhash, t, taskid="t0"):
        return ("p0", taskid, url, f'{{"text_len":9,"simhash":{simhash}}}', t)

    rows = [
        res("http://a.example/1", 7, 1.0),
        res("http://a.example/1", 99, 2.0, "t1"),  # later crawl wins
        res("http://b.example/1", 99, 1.0),
        res("http://c.example/1", 1 << 20, 1.0),
    ]
    results = spark.createDataFrame(
        rows, "project string, taskid string, url string, result string, updatetime double"
    )
    out = {r["url"]: (r["dup_of"], r["is_canonical"]) for r in keep_table(spark, results).collect()}
    # a and b both fingerprint 99 after latest-wins → one cluster
    assert out["http://a.example/1"] == ("http://a.example/1", True)
    assert out["http://b.example/1"] == ("http://a.example/1", False)
    assert out["http://c.example/1"] == ("http://c.example/1", True)


def test_hot_band_guard_drops_wide_bands(spark):
    # 6 exact copies → one band bucket of width 6; guard at 3 drops it
    docs = spark.createDataFrame(
        [(i, BASE) for i in range(1, 7)], "doc_id long, text string"
    )
    assert verified_pairs(docs, 0.5, max_band_width=3).count() == 0
    unguarded = verified_pairs(docs, 0.5).count()
    assert unguarded == 15  # C(6,2) exact-copy pairs


def test_simhash_keep_table_identical_cluster_is_linear(spark):
    """Round-4 verdict "wrong" #1: 10 000 identical fingerprints
    (exact text copies — mirrored boilerplate) must NOT reach the band
    self-join as 10 000 rows. The fp-collapse sends ONE representative
    per distinct fingerprint; uncollapsed, the join would emit
    4 bands × C(10k,2) ≈ 2·10⁸ candidate rows and this test would not
    finish. Output semantics are pinned unchanged: everyone collapses
    to the component's min doc_id, including hamming-neighbors of the
    cluster."""
    from pyspider_spark.ops.dedup import simhash_keep_table, simhash_near_dup

    n = 10_000
    rows = [(i, 0x0DDBA11) for i in range(1, n + 1)]
    rows += [(n + 1, 0x0DDBA11 ^ 0b11), (n + 2, 0x5A5A5A5A)]
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    out = {
        r["doc_id"]: r["dup_of"]
        for r in simhash_keep_table(df, bits=32).collect()
    }
    assert len(out) == n + 2
    assert all(out[i] == 1 for i in range(1, n + 1))
    assert out[n + 1] == 1  # hamming-2 neighbor joins via its representative
    assert out[n + 2] == n + 2
    # candidate volume over the collapsed reps is O(distinct fps): the
    # same derivation keep_table uses yields exactly one near-dup edge
    reps = df.groupBy("simhash").agg(F.min("doc_id").alias("doc_id"))
    assert simhash_near_dup(reps, bits=32).count() == 1


def test_simhash_keep_table_null_fp_singletons(spark):
    """NULL fingerprints (never-analyzed docs) carry no similarity
    evidence: they must stay singletons, not collapse into one fake
    cluster through the fp-groupBy."""
    from pyspider_spark.ops.dedup import simhash_keep_table

    df = spark.createDataFrame(
        [(1, 7), (2, 7), (3, None), (4, None)], "doc_id long, simhash long"
    )
    out = {r["doc_id"]: r["dup_of"] for r in simhash_keep_table(df, bits=32).collect()}
    assert out == {1: 1, 2: 1, 3: 3, 4: 4}


def test_simhash_max_band_width_guard(spark):
    """The band-join guard (mirrors candidate_pairs'): a band value
    wider than the bound is dropped; narrow bands still pair."""
    from pyspider_spark.ops.dedup import simhash_near_dup

    # 50 DISTINCT fps agreeing on all four bands' worth of low bits
    # except their top band — near-identical mega-cluster: every band
    # except the last is width-50-hot
    fps = [(i, i << 24) for i in range(50)]  # bands 0..2 identical (=0)
    df = spark.createDataFrame(fps, "doc_id long, simhash long")
    guarded = simhash_near_dup(df, bits=32, max_hamming=3, max_band_width=10)
    unguarded = simhash_near_dup(df, bits=32, max_hamming=3)
    # unguarded finds every hamming<=3 pair among the top-band values;
    # the guard drops the three hot bands, keeping only pairs that
    # agree on the (narrow) top band — i.e. none of these
    assert unguarded.count() > 0
    assert guarded.count() == 0
    # a pair agreeing on a narrow band survives the guard
    df2 = spark.createDataFrame(
        fps + [(100, (7 << 24) | 1)], "doc_id long, simhash long"
    )  # doc 100 shares doc 7's top band, differs in one low bit
    g2 = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_dup(
            df2, bits=32, max_hamming=3, max_band_width=10
        ).collect()
    }
    assert (7, 100, 1) in g2


def test_dedup_corpus_identical_cluster_is_linear(spark):
    """Round-5: the MinHash keep path collapses identical texts to one
    representative before banding (the simhash_keep_table trick) — a
    10 000-exact-copy cluster costs O(M), where the uncollapsed band
    join would emit C(10k,2) candidate AND verify rows and this test
    would not finish. Sub-shingle identical texts stay singletons
    (they produce no grams — pinned pairwise-oracle semantics)."""
    n = 10_000
    rows = [(i, BASE) for i in range(1, n + 1)]
    rows += [
        (n + 1, BASE + " with one extra tail phrase added"),
        (20001, "hi there"),  # 2 tokens < SHINGLE_N
        (20002, "hi there"),
        (30000, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["dup_of"] for r in dedup_corpus(docs, 0.5).collect()}
    assert len(out) == n + 4
    assert all(out[i] == 1 for i in range(1, n + 1))
    assert out[n + 1] in (1, n + 1)  # near-dup joins iff its pair verified
    assert out[20001] == 20001 and out[20002] == 20002
    assert out[30000] == 30000


def test_exact_dedup_ignores_null_text(spark):
    """Review r4: md5(NULL) is NULL — null-text docs must not collapse
    into one fake 'duplicate' cluster."""
    from pyspider_spark.ops.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "same body"), (2, "same body"), (3, None), (4, None), (5, "unique")],
        "doc_id long, text string",
    )
    rows = exact_dedup(df).collect()
    assert len(rows) == 1
    assert (rows[0]["keeper"], rows[0]["n_copies"]) == (1, 2)


# --- incremental dedup (ops/dedup.dedup_incremental) -------------------

OTHER = (
    "completely different text about spark dataframes and shuffle "
    "partitions and catalyst optimizer rules for query planning"
)


def _state_for(spark, old_rows):
    from pyspider_spark.ops.dedup import dedup_corpus, keeper_signatures

    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    return keeper_signatures(old, dedup_corpus(old, 0.5))


def test_dedup_incremental_absorb_and_self_dedup(spark):
    """Stage 1: a new exact copy of an old keeper's text is absorbed
    (identical text ⇒ identical signature ⇒ band collision + 8/8
    agreement). Stage 2: new-only duplicates collapse among
    themselves; sub-shingle and unique docs stay singletons."""
    from pyspider_spark.ops.dedup import dedup_incremental

    state = _state_for(spark, [(1, BASE), (2, BASE), (10, OTHER)])
    new = spark.createDataFrame(
        [
            (101, BASE),  # copy of old keeper 1 → absorbed
            (103, OTHER + " now with a fresh unique ending phrase"),
            (104, "entirely novel content talking about bloom filters and cuckoo shadows at web scale"),
            (105, "entirely novel content talking about bloom filters and cuckoo shadows at web scale"),
            (106, "hi there"),  # < SHINGLE_N tokens → singleton
            (107, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["dup_of"] for r in dedup_incremental(new, state).collect()}
    assert out[101] == 1  # absorbed by the OLD keeper id, not a new one
    assert out[104] == 104 and out[105] == 104  # new-only pair collapses
    assert out[106] == 106 and out[107] == 107
    # 103 is near OTHER but must map to either itself or old keeper 10,
    # never to another new doc
    assert out[103] in (103, 10)


def test_dedup_incremental_two_batches(spark):
    """The state-evolution loop: batch-2 state = batch-1 state ∪
    keeper_signatures of batch-1's kept docs; a batch-2 copy of a
    batch-1 keeper absorbs into it without any old text being read."""
    from pyspider_spark.ops.dedup import dedup_incremental, keeper_signatures

    state1 = _state_for(spark, [(1, BASE)])
    b1 = spark.createDataFrame([(200, OTHER)], "doc_id long, text string")
    keep1 = dedup_incremental(b1, state1)
    state2 = state1.unionByName(keeper_signatures(b1, keep1))
    b2 = spark.createDataFrame(
        [(300, OTHER), (301, BASE)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["dup_of"] for r in dedup_incremental(b2, state2).collect()}
    assert out[300] == 200  # absorbed by the batch-1 keeper
    assert out[301] == 1  # absorbed by the original corpus keeper


def test_dedup_incremental_identical_cluster_is_linear(spark):
    """The exact-copy collapse holds on the incremental path too: a
    10 000-identical-copy new batch costs O(M) (one representative
    reaches banding), where the uncollapsed self-join would emit
    C(10k,2) candidate rows and this test would not finish."""
    from pyspider_spark.ops.dedup import dedup_incremental

    state = _state_for(spark, [(1, OTHER)])
    n = 10_000
    rows = [(100_000 + i, BASE) for i in range(1, n + 1)]
    new = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["dup_of"] for r in dedup_incremental(new, state).collect()}
    assert len(out) == n
    assert all(v == 100_001 for v in out.values())


def test_dedup_incremental_hot_band_guard(spark):
    """max_band_width drops bands hot across EITHER side of the state
    join — near-identical-but-distinct mega-clusters stay bounded (the
    recall-for-bound trade candidate_pairs pins)."""
    from pyspider_spark.ops.dedup import dedup_incremental

    state = _state_for(spark, [(1, BASE)])
    new = spark.createDataFrame(
        [(100 + i, BASE + f" variant tail number {i} token") for i in range(40)],
        "doc_id long, text string",
    )
    # every variant shares band 0 (first 4 sigs dominated by BASE grams)
    # with high probability; with a tiny width bound the op must still
    # return one row per doc and never crash
    out = dedup_incremental(new, state, max_band_width=2).collect()
    assert len(out) == 40


def test_simhash_incremental_absorb_and_self_dedup(spark):
    """Crawl-native incremental path: a new fingerprint within the
    hamming ball of an old keeper's absorbs into it (exact verify —
    the fp IS the state); new-only clusters collapse among
    themselves; NULL fingerprints stay singletons."""
    from pyspider_spark.ops.dedup import simhash_incremental

    state = spark.createDataFrame(
        [(1, 0x0F0F0F0F), (10, 0x70000000)], "doc_id long, simhash long"
    )
    new = spark.createDataFrame(
        [
            (101, 0x0F0F0F0E),  # hamming 1 from keeper 1 → absorbed
            (102, 0x0F0F0F0F),  # identical to keeper 1 → absorbed
            (103, 0x55AA55AA),  # far from both keepers
            (104, 0x55AA55AB),  # hamming 1 from 103 → new-only pair
            (105, None),
        ],
        "doc_id long, simhash long",
    )
    out = {
        r["doc_id"]: r["dup_of"]
        for r in simhash_incremental(new, state, bits=32, max_hamming=3).collect()
    }
    assert out[101] == 1 and out[102] == 1
    assert out[103] == 103 and out[104] == 103
    assert out[105] == 105


def test_simhash_incremental_identical_cluster_is_linear(spark):
    """Exact-fp collapse on the incremental path: 10 000 identical
    fingerprints reach banding as ONE representative (uncollapsed,
    the state join and self-join would each emit O(M²) rows)."""
    from pyspider_spark.ops.dedup import simhash_incremental

    state = spark.createDataFrame([(1, 0x70000000)], "doc_id long, simhash long")
    n = 10_000
    new = spark.createDataFrame(
        [(100_000 + i, 0x0F0F0F0F) for i in range(1, n + 1)],
        "doc_id long, simhash long",
    )
    out = {
        r["doc_id"]: r["dup_of"]
        for r in simhash_incremental(new, state, bits=32, max_hamming=3).collect()
    }
    assert len(out) == n
    assert all(v == 100_001 for v in out.values())


def test_incremental_keep_job_state_evolution(spark, tmp_path):
    """jobs/corpus_dedup.incremental_keep: batch 1 seeds the versioned
    state; batch 2 dedups ONLY its new urls against the persisted
    keeper fingerprints (a near-fp absorbs into the batch-1 keeper, a
    re-crawled url is skipped); an immediately repeated run is
    idempotent (empty batch, state version still advances atomically)."""
    from jobs.corpus_dedup import _read_state, incremental_keep

    sd = str(tmp_path / "dstate")

    def res(url, simhash, t, taskid="t0"):
        return ("p0", taskid, url, f'{{"simhash":{simhash}}}', t)

    schema = "project string, taskid string, url string, result string, updatetime double"
    b1 = spark.createDataFrame(
        [res("http://a.ex/1", 7, 1.0), res("http://b.ex/1", 7, 1.0),
         res("http://c.ex/1", 0x1F00000, 1.0)],
        schema,
    )
    _, n1, d1 = incremental_keep(spark, b1, sd)
    assert (n1, d1) == (3, 1)  # a/b identical fps → one dup
    # batch 2 = cumulative results (the job reads ALL manifest results
    # each run): only the new urls form the batch
    b2 = b1.unionByName(
        spark.createDataFrame(
            [res("http://d.ex/1", 6, 2.0),  # hamming 1 from keeper a → absorbed
             res("http://a.ex/1", 9999, 2.0, "t1"),  # re-crawl: skipped
             res("http://e.ex/1", 0x1F00000 ^ (1 << 20), 2.0)],  # near c
            schema,
        )
    )
    _, n2, d2 = incremental_keep(spark, b2, sd, processed_add=["rounds/r2"])
    assert (n2, d2) == (2, 2)
    v, keep, fps, processed = _read_state(spark, sd)
    assert v == 2 and processed == ["rounds/r2"]  # dir-watermark recorded
    out = {r["url"]: r["dup_of"] for r in keep.collect()}
    assert out["http://d.ex/1"] == "http://a.ex/1"
    assert out["http://e.ex/1"] == "http://c.ex/1"
    assert out["http://a.ex/1"] == "http://a.ex/1"  # original assignment kept
    # keeper fp state never holds absorbed urls
    assert {r["doc_id"] for r in fps.collect()} == {"http://a.ex/1", "http://c.ex/1"}
    # idempotent re-run: nothing new
    _, n3, d3 = incremental_keep(spark, b2, sd, processed_add=["rounds/r2"])
    assert (n3, d3) == (0, 0)
    v3, keep3, _, p3 = _read_state(spark, sd)
    assert v3 == 3 and keep3.count() == 5 and p3 == ["rounds/r2"]


def test_incremental_keep_state_writes_are_delta_sized_then_fold(spark, tmp_path):
    """The versioned state is LSM-style: each batch writes ONLY its
    own keep/fps rows (O(batch), never O(corpus)); reads union the
    live dirs; when accumulated deltas outgrow the base the write
    folds to one dir (geometric ⇒ amortized O(1) per row) and
    superseded dirs are GC'd."""
    import json as _json
    import os

    from jobs.corpus_dedup import _read_meta, _read_state, incremental_keep

    sd = str(tmp_path / "dstate")
    schema = "project string, taskid string, url string, result string, updatetime double"

    def batch(urls_fps, t):
        return spark.createDataFrame(
            [("p0", "t0", u, _json.dumps({"simhash": fp}), t) for u, fp in urls_fps],
            schema,
        )

    # base: 4 distinct fps (well-separated — no dups)
    incremental_keep(spark, batch([(f"http://h{i}.ex/", 1 << (i * 8)) for i in range(4)], 1.0), sd)
    m1 = _read_meta(sd)
    assert m1["live"] == ["v000001"] and (m1["base_rows"], m1["delta_rows"]) == (4, 0)

    # two delta batches of 2: each version dir holds ONLY its batch
    for k, t in ((4, 2.0), (6, 3.0)):
        incremental_keep(
            spark,
            batch([(f"http://h{i}.ex/", 1 << ((i % 8) * 8) | 3) for i in (k, k + 1)], t),
            sd,
        )
    m3 = _read_meta(sd)
    assert m3["live"] == ["v000001", "v000002", "v000003"]
    assert (m3["base_rows"], m3["delta_rows"]) == (4, 4)
    d3 = spark.read.parquet(os.path.join(sd, "v000003", "keep.parquet"))
    assert d3.count() == 2  # the O(batch) write, not the 8-row corpus

    # batch 4 tips deltas (4+2) past the base (4) with >= 3 live dirs
    # -> fold: one live dir, everything readable, old dirs GC'd
    incremental_keep(
        spark, batch([(f"http://h{i}.ex/", 1 << ((i % 8) * 8) | 5) for i in (8, 9)], 4.0), sd
    )
    m4 = _read_meta(sd)
    assert m4["live"] == ["v000004"] and (m4["base_rows"], m4["delta_rows"]) == (10, 0)
    assert sorted(n for n in os.listdir(sd) if n.startswith("v")) == ["v000004"]
    v, keep, fps, _ = _read_state(spark, sd)
    assert v == 4 and keep.count() == 10
    # every url kept exactly once across the folded state
    assert keep.select("url").distinct().count() == 10


def test_incremental_keep_migrates_pre_delta_layout(spark, tmp_path):
    """A pre-delta STATE.json (no live/base_rows) must migrate with
    REAL row counts: without them the fold heuristic sees base_rows=0
    and rewrites the full corpus every few batches forever."""
    import json as _json
    import os

    from jobs.corpus_dedup import _read_meta, incremental_keep

    sd = str(tmp_path / "dstate")
    os.makedirs(os.path.join(sd, "v000001"))
    spark.createDataFrame(
        [(f"http://h{i}.ex/", f"http://h{i}.ex/", True) for i in range(6)],
        "url string, dup_of string, is_canonical boolean",
    ).write.parquet(os.path.join(sd, "v000001", "keep.parquet"))
    spark.createDataFrame(
        [(f"http://h{i}.ex/", 1 << (i * 8)) for i in range(6)],
        "doc_id string, simhash long",
    ).write.parquet(os.path.join(sd, "v000001", "fps.parquet"))
    with open(os.path.join(sd, "STATE.json"), "w") as f:
        _json.dump({"version": 1, "processed": []}, f)  # old layout

    batch = spark.createDataFrame(
        [("p0", "t0", "http://new.ex/", _json.dumps({"simhash": 3}), 1.0)],
        "project string, taskid string, url string, result string, updatetime double",
    )
    _, n, _ = incremental_keep(spark, batch, sd)
    assert n == 1
    m = _read_meta(sd)
    # inherited corpus counted once; the batch wrote a DELTA dir
    assert m["base_rows"] == 6 and m["delta_rows"] == 1
    assert m["live"] == ["v000001", "v000002"]
