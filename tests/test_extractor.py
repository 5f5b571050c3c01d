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


def _parser_reference(raw: str) -> tuple[list[str], list[str]]:
    from pyspider_spark.oracle.extractor import _Extractor

    p = _Extractor()
    try:
        p.feed(raw)
        p.close()
    except Exception:
        pass
    return p.chunks, p.hrefs


def test_fast_path_parity_fuzz():
    """_fast_extract must equal the html.parser reference whenever it
    does not bail — over adversarial fragment soup."""
    import random

    from pyspider_spark.oracle.extractor import _fast_extract

    rng = random.Random(911)
    frags = [
        "plain text ",
        "with.punct! ",
        "<p>", "</p>", "<P >", "<div>", "</div>",
        '<a href="http://x.example/a">', "</a>",
        "<a href='http://x.example/b'>",
        "<a href=http://x.example/c>",
        '<a href="">', "<a href>", "<a>", "<a name=z href=\"http://y.example/\">",
        '<a HREF="HTTP://UP.EXAMPLE/P">',
        "<br/>", "<br />", "<img src=\"i.png\"/>",
        "<noscript>", "</noscript>", "<template>", "</template>",
        "<script>var x=1;</script>", "<style>.a{}</style>",
        "<!-- comment -->", "<!DOCTYPE html>", "<?php ?>",
        "a &amp; b ", "5 > 3 ", "x < y ",
        "<a href=\"q?a=1&b=2\">", "</a >", "<a href='x\"y'>",
        "<weird-tag>", "<a href=\"x>y\">", "< notatag>", "<a href=",
        "\n\t  ", "tail",
    ]
    hits = 0
    for _ in range(3000):
        raw = "".join(rng.choice(frags) for _ in range(rng.randint(0, 12)))
        fast = _fast_extract(raw)
        if fast is not None:
            hits += 1
            assert fast == tuple(_parser_reference(raw)) or list(fast) == list(
                _parser_reference(raw)
            ), repr(raw)
    assert hits > 200, "fast path should fire on a meaningful share"


def test_fast_path_on_fixture_and_bench_shapes():
    """Smoke fixture pages carry <script> blocks on purpose — they must
    BAIL to the parser (and extract identically end-to-end). The bench
    webgen shape (plain <p>/<a> soup, no scripts/charrefs) must take
    the fast path and match the parser exactly — the perf pin."""
    from pyspider_spark.oracle.extractor import _fast_extract

    size = SIZES["smoke"]
    for k in range(4):
        raw = build_html(2, k, size).decode("utf-8")
        if "<script" in raw:
            assert _fast_extract(raw) is None
        else:
            f = _fast_extract(raw)
            assert f is None or tuple(f) == tuple(_parser_reference(raw))

    # webgen-shaped page (mirrors pyspider_spark/bench/webgen.py)
    words = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 150
    anchors = "".join(
        f'<a href="http://host{j}.example/o/{j}">x</a>' for j in range(8)
    )
    raw = (
        '<html><head><meta charset="utf-8"><title>bench 1</title></head>'
        f"<body><p>order page 1 {words}</p>{anchors}</body></html>"
    )
    fast = _fast_extract(raw)
    assert fast is not None
    assert tuple(fast) == tuple(_parser_reference(raw))
    assert len(fast[1]) == 8
