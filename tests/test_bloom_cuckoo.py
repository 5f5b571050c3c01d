"""Bloom (no false negatives, bounded FPR) + cuckoo (insert/delete/
contains, serialization) — SURVEY §5.2.1."""

import numpy as np
import pytest

from pyspider_spark.kernels.bloom import BloomFilter
from pyspider_spark.kernels.canon import taskid_of
from pyspider_spark.kernels.cuckoo import CuckooFilter


def ids(prefix, n):
    return [taskid_of(f"http://{prefix}.example/p/{i}") for i in range(n)]


def test_bloom_no_false_negatives():
    bf = BloomFilter(1 << 16, 7)
    keys = ids("a", 2000)
    bf.add_many(keys)
    assert bf.contains_many(keys).all()


def test_bloom_fpr_bounded():
    m, k, n = 1 << 17, 7, 5000
    bf = BloomFilter(m, k)
    bf.add_many(ids("in", n))
    probe = ids("out", 20000)
    fpr = bf.contains_many(probe).mean()
    # theoretical fpr ≈ (1 - e^(-kn/m))^k ≈ 0.0006 at these params
    assert fpr < 0.01


def test_bloom_roundtrip_and_merge():
    a = BloomFilter(1 << 12, 5)
    b = BloomFilter(1 << 12, 5)
    a.add_many(ids("x", 100))
    b.add_many(ids("y", 100))
    m = BloomFilter.from_bytes(a.to_bytes()).merge(b)
    assert m.contains_many(ids("x", 100)).all()
    assert m.contains_many(ids("y", 100)).all()


def test_bloom_empty():
    bf = BloomFilter(1 << 10, 3)
    assert bf.contains_many([]).shape == (0,)
    bf.add_many([])
    assert not bf.contains_many(ids("z", 50)).any()


def test_cuckoo_insert_contains_delete():
    cf = CuckooFilter(1 << 10)
    keys = ids("c", 500)
    for kk in keys:
        assert cf.insert(kk)
    assert cf.contains_many(keys).all()
    for kk in keys[:100]:
        assert cf.delete(kk)
    got = cf.contains_many(keys[:100])
    # deletions remove the fingerprint; residual hits only via fp collision
    assert got.mean() < 0.05
    assert cf.contains_many(keys[100:]).all()


def test_cuckoo_roundtrip():
    cf = CuckooFilter(1 << 8)
    for kk in ids("r", 50):
        cf.insert(kk)
    cf2 = CuckooFilter.from_bytes(cf.to_bytes())
    assert np.array_equal(cf.table, cf2.table)
    assert cf2.contains_many(ids("r", 50)).all()


def test_cuckoo_rejects_non_pow2():
    with pytest.raises(ValueError):
        CuckooFilter(1000)


def test_membership_rule_bloom_and_not_cuckoo():
    """seen := bloom(t) ∧ ¬cuckoo(t) — cancel marks re-crawlable (J3)."""
    bf = BloomFilter(1 << 14, 7)
    cf = CuckooFilter(1 << 8)
    keys = ids("m", 200)
    bf.add_many(keys)
    cancelled = keys[:20]
    for kk in cancelled:
        cf.insert(kk)
    seen = bf.contains_many(keys) & ~cf.contains_many(keys)
    assert not seen[:20].any()
    assert seen[20:].all()
