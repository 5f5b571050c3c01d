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
    m = (1 << 64) - 1  # fingerprints are signed int64 wraps of 64 bits
    d01 = bin((h0 ^ h1) & m).count("1")
    d02 = bin((h0 ^ h2) & m).count("1")
    assert d01 < d02  # near-dup closer in hamming space than unrelated


def test_simhash_is_64_bit_signed():
    """The fingerprint must exercise the full 64-bit space (round-2
    verdict: 32-bit saturates banding at web scale) and fit a Spark
    long (signed wrap)."""
    seen_high = False
    for i in range(40):
        sh = analyze_text(f"document body variant {i} with words " * 10)[3]
        assert -(1 << 63) <= sh < (1 << 63)
        if (sh & ((1 << 64) - 1)) >> 32:
            seen_high = True
    assert seen_high  # high 32 bits are populated, not zero-padded 32-bit


def test_token_hash_halves_independent():
    """Round-3 advice (medium): the old high half crc32(t, seed) was
    crc32(t) XOR C(len(t)) by CRC linearity — hi^lo CONSTANT per token
    length, mirroring low bits into high and doubling near-dup Hamming
    distance. With md5-derived halves, hi^lo must vary freely within a
    length class."""
    from hashlib import md5

    toks = [f"tok{i:04d}".encode() for i in range(200)]  # all same length
    xors = set()
    for t in toks:
        h = int.from_bytes(md5(t).digest()[:8], "little")
        xors.add((h >> 32) ^ (h & 0xFFFFFFFF))
    assert len(xors) > 190  # crc-seeded scheme would give len(xors) == 1


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

def _analyze_reference(text: str) -> tuple[int, str, float, int]:
    """The pre-fast-path regex algorithm, kept verbatim as the parity
    reference for the ASCII bytes tokenizer."""
    import numpy as np
    from collections import Counter
    from hashlib import md5

    from pyspider_spark.ops.textstats import (
        _BITS64,
        _PUNCT,
        _TOKEN_RE,
        STOP_DE,
        STOP_EN,
    )

    if not text:
        return 0, "und", 0.0, 0
    toks = _TOKEN_RE.findall(text.lower())
    n = len(toks)
    if n == 0:
        return 0, "und", 0.0, 0
    counts = Counter(toks)
    en = sum(c for t, c in counts.items() if t in STOP_EN)
    de = sum(c for t, c in counts.items() if t in STOP_DE)
    lang = "und" if en == 0 and de == 0 else ("en" if en >= de else "de")
    stop_ratio = (en + de) / n
    punct = sum(text.count(ch) for ch in _PUNCT)
    punct_density = punct / max(len(text), 1)
    mean_len = sum(len(t) * c for t, c in counts.items()) / n
    len_sanity = 1.0 - min(abs(mean_len - 5.0) / 5.0, 1.0)
    quality = round(
        0.5 * min(stop_ratio * 3.0, 1.0)
        + 0.2 * min(punct_density * 20.0, 1.0)
        + 0.3 * len_sanity,
        6,
    )
    bts = [t.encode() for t in counts]
    dig = b"".join(md5(t).digest() for t in bts)
    hs = np.frombuffer(dig, dtype="<u8")[0::2]
    w = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    bits = ((hs[:, None] >> _BITS64) & np.uint64(1)).astype(np.int64)
    acc = ((bits * 2 - 1) * w[:, None]).sum(axis=0)
    uh = int(((acc > 0).astype(np.uint64) << _BITS64).sum(dtype=np.uint64))
    simhash = uh - (1 << 64) if uh >= (1 << 63) else uh
    return n, lang, quality, simhash


def test_ascii_fast_path_parity():
    import random
    import string

    rng = random.Random(73)
    samples = [
        "",
        "   ",
        "...!!!",
        "the quick brown fox. der hund und die katze!",
        "a" * 5000,
        "x0 y1 z2 " * 400,
    ]
    for _ in range(500):
        samples.append(
            "".join(rng.choice(string.printable) for _ in range(rng.randint(0, 300)))
        )
    # non-ascii must take the regex path and still work
    samples += ["héllo wörld the of", "日本語テキスト the and to", "naïve café. the!"]
    for s in samples:
        assert analyze_text(s) == _analyze_reference(s), repr(s)
