"""Oracle extractor: text + links golden behavior (F4/F5/F7)."""

from pyspider_spark.fixtures.gen import SIZES, build_html, page_url
from pyspider_spark.kernels.canon import canonicalize
from pyspider_spark.oracle.extractor import detect_encoding, extract_page


def test_basic_text_and_links():
    html = (
        b'<html><head><meta charset="utf-8"><title>T</title></head>'
        b'<body><p>hello world</p>'
        b'<a href="/a">A</a><a href="b#frag">B</a>'
        b'<a href="http://Other.Example:80/c?b=2&a=1">C</a>'
        b'<a href="mailto:x@y">M</a>'
        b"<script>skip me</script></body></html>"
    )
    ext = extract_page(html, "http://h.example/dir/page")
    assert ext.text == "T\nhello world\nA\nB\nC\nM"
    assert ext.links == [
        "http://h.example/a",
        "http://h.example/dir/b",
        "http://other.example/c?a=1&b=2",
    ]


def test_duplicate_links_kept_in_doc_order():
    html = b'<a href="/x">1</a><a href="/y">2</a><a href="/x">3</a>'
    ext = extract_page(html, "http://h.example/")
    assert ext.links == [
        "http://h.example/x",
        "http://h.example/y",
        "http://h.example/x",
    ]


def test_encoding_detection_meta_latin1():
    html = '<html><head><meta charset="latin-1"></head><body>café straße</body></html>'.encode(
        "latin-1"
    )
    assert detect_encoding(html) == "latin-1"
    ext = extract_page(html, "http://h.example/")
    assert "café straße" in ext.text


def test_encoding_header_beats_meta():
    html = b'<meta charset="latin-1"><body>x</body>'
    assert detect_encoding(html, "text/html; charset=utf-8") == "utf-8"


def test_empty_and_none():
    assert extract_page(None, "http://h.example/").text == ""
    assert extract_page(b"", "http://h.example/").links == []


def test_fixture_html_roundtrip_deterministic():
    size = SIZES["smoke"]
    h1 = build_html(2, 3, size)
    h2 = build_html(2, 3, size)
    assert h1 == h2
    e1 = extract_page(h1, canonicalize(page_url(2, 3)))
    e2 = extract_page(h2, canonicalize(page_url(2, 3)))
    assert e1.text == e2.text and e1.links == e2.links
    assert len(e1.links) >= 4
    # script content never leaks into text
    assert "var x=1" not in e1.text
