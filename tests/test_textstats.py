"""ops/textstats — deterministic per-page analysis kernel + the
engine's analyze mode (RoundConfig.analyze) end-to-end."""

from __future__ import annotations

import json

from pyspider_spark.ops.textstats import analyze_text


def test_analyze_basic():
    n, lang, q, sh = analyze_text("the quick brown fox and the lazy dog. it is fine!")
    assert n == 11
    assert lang == "en"
    assert 0.0 < q <= 1.0
    assert sh != 0


def test_analyze_deterministic_and_lang():
    a = analyze_text("der hund und die katze im haus")
    b = analyze_text("der hund und die katze im haus")
    assert a == b
    assert a[1] == "de"
    assert analyze_text("") == (0, "und", 0.0, 0)
    assert analyze_text("zzz qqq xxx")[1] == "und"


def test_simhash_locality():
    base = "the cat sat on the mat and looked at the dog " * 20
    near = base + " extra token"
    far = "completely different vocabulary everywhere banana apple orange " * 20
    h0 = analyze_text(base)[3]
    h1 = analyze_text(near)[3]
    h2 = analyze_text(far)[3]
    d01 = bin(h0 ^ h1).count("1")
    d02 = bin(h0 ^ h2).count("1")
    assert d01 < d02  # near-dup closer in hamming space than unrelated


def test_engine_analyze_mode(spark, smoke_fixtures, tmp_path):
    """One round with analyze=True: results JSON carries the analysis
    fields, and they match the plain-python kernel on the golden text."""
    import pyarrow.parquet as pq

    from pyspider_spark.config import RoundConfig
    from pyspider_spark.engine.round import CrawlEngine

    cfg = RoundConfig(n_partitions=4, round_budget=1000, analyze=True)
    eng = CrawlEngine(
        spark,
        str(tmp_path / "state"),
        cfg,
        pages_path=smoke_fixtures["pages"],
        projects_path=smoke_fixtures["projects"],
        robots_path=smoke_fixtures["robots"],
    )
    seeds = spark.read.parquet(smoke_fixtures["seeds"])
    eng.run_rounds(1, seeds=seeds)
    man = eng.snap.read_manifest()
    rows = spark.read.parquet(eng.snap.abspath(man["tables"]["results"][0])).collect()
    assert rows
    golden = {
        r["url"]: r["text"] for r in pq.read_table(smoke_fixtures["pages"]).to_pylist()
    }
    from pyspider_spark.kernels.canon import canonicalize

    golden = {canonicalize(u): t for u, t in golden.items()}
    checked = 0
    for r in rows:
        res = json.loads(r["result"])
        assert set(res) >= {"token_count", "lang_guess", "quality", "simhash"}
        if r["url"] in golden:
            n, lang, q, sh = analyze_text(golden[r["url"]])
            assert (res["token_count"], res["lang_guess"], res["simhash"]) == (n, lang, sh)
            assert abs(res["quality"] - q) < 1e-6
            checked += 1
    assert checked > 0