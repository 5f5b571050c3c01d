"""Unit + property tests for URL canonicalization (SURVEY §5.2.1)."""

import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspider_spark.kernels.canon import canonicalize, taskid_of, url_host

GOLDEN = [
    ("http://Host0.Example/p/1", "http://host0.example/p/1"),
    ("http://host0.example:80/p/1", "http://host0.example/p/1"),
    ("https://host0.example:443/p/1", "https://host0.example/p/1"),
    ("http://host0.example:8080/p/1", "http://host0.example:8080/p/1"),
    ("http://host0.example/p/1#frag", "http://host0.example/p/1"),
    ("http://host0.example/p/1?b=2&a=1", "http://host0.example/p/1?a=1&b=2"),
    ("http://host0.example", "http://host0.example/"),
    ("HTTP://HOST0.EXAMPLE:80/p/1?z=9&a=1#x", "http://host0.example/p/1?a=1&z=9"),
    ("http://host0.example/p/1?a=&b=1", "http://host0.example/p/1?a=&b=1"),
    ("mailto:x@y.z", ""),
    ("javascript:void(0)", ""),
    ("", ""),
    ("data:,hello", "data:,hello"),
]


@pytest.mark.parametrize("raw,expect", GOLDEN)
def test_golden_pairs(raw, expect):
    assert canonicalize(raw) == expect


def test_idempotent_on_golden():
    for raw, expect in GOLDEN:
        assert canonicalize(expect) == expect


def test_host():
    assert url_host("http://HostX.Example:8080/p") == "hostx.example"
    assert url_host("data:,x") == ""


def test_taskid_is_md5_hex():
    t = taskid_of("http://host0.example/p/1")
    assert len(t) == 32 and all(c in string.hexdigits for c in t)
    assert t == taskid_of("http://host0.example/p/1")


_url_chars = st.text(
    alphabet=string.ascii_letters + string.digits + ":/?#[]@!$&'()*+,;=.-_~%",
    max_size=60,
)


@settings(max_examples=300, deadline=None)
@given(_url_chars)
def test_idempotent_property(s):
    u = "http://" + s
    c = canonicalize(u)
    assert canonicalize(c) == c  # canon is idempotent on its own output


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 99), st.integers(0, 999))
def test_noise_variants_collapse(h, i):
    base = f"http://host{h}.example/p/{i}"
    assert canonicalize(f"http://HOST{h}.example:80/p/{i}#frag") == base
    assert canonicalize(base) == base
