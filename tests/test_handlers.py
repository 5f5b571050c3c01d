"""Handler registry + data: url units — reimplements the reference's
tests/test_processor.py assertions (follows absolute+canonical, result
returned, `_on_message` routing, @catch_status_code_error dispatch) and
tests/test_fetcher.py's data:-URL expectations against our registry
(SURVEY §2.9 U1-U4, §2.1 S8, §2.7 F6/F12)."""

from __future__ import annotations

import json

from pyspider_spark import handlers as H
from pyspider_spark.kernels.dataurl import decode, encode


def test_dataurl_roundtrip_base64():
    content = b'{"a": 1}'
    url = encode(content, "application/json")
    assert url.startswith("data:application/json;base64,")
    got, mime = decode(url)
    assert got == content and mime == "application/json"


def test_dataurl_roundtrip_percent():
    url = encode("héllo wörld".encode(), use_base64=False)
    got, mime = decode(url)
    assert got.decode() == "héllo wörld"
    assert mime == "text/plain"


def test_dataurl_plain_and_default_mediatype():
    got, mime = decode("data:,_on_cronjob|proj|3")
    assert got == b"_on_cronjob|proj|3"
    assert mime == "text/plain;charset=US-ASCII"


def test_dataurl_malformed_is_empty_not_raise():
    got, _ = decode("data:;base64,!!!not-base64!!!")
    assert got == b""


def test_default_handler_extracts_follows_absolute_canonical():
    html = b'<html><body><p>hi</p><a href="/x">l</a><a href="HTTP://B.EX:80/y#f">l</a></body></html>'
    res = H.get("index_page").fn(html, "http://a.ex/base/")
    assert res.text == "hi\nl\nl"
    assert res.links == ["http://a.ex/x", "http://b.ex/y"]
    assert res.messages == []


def test_unknown_callback_falls_back_to_default():
    assert H.get("no_such_callback") is H.DEFAULT
    assert H.get(None) is H.DEFAULT


def test_detail_page_drops_links_and_has_config_defaults():
    html = b'<a href="/x">l</a>'
    res = H.get("detail_page").fn(html, "http://a.ex/")
    assert res.links == []
    h = H.REGISTRY["detail_page"]
    assert h.priority == 2 and h.age == 3600.0  # @config(priority=2, age=3600)


def test_send_message_routing():
    html = b"<p>pg</p>"
    res = H.get("index_and_notify").fn(html, "http://a.ex/p")
    assert res.messages == [("msg_project", "http://a.ex/p")]
    murl = H.message_url("http://a.ex/p")
    assert murl.startswith("data:,")
    # the message row's handler sees the payload as its text
    res2 = H.get("_on_message").fn(None, murl)
    assert res2.text == "_on_message|http://a.ex/p"


def test_cronjob_payload_decodes():
    res = H.get("_on_cronjob").fn(None, "data:,_on_cronjob|proj|7")
    assert res.text == "_on_cronjob|proj|7"
    assert res.links == []


def test_json_fields_response_json():
    url = encode(b'{"b": [1, 2], "a": 1}', "application/json")
    res = H.get("json_fields").fn(None, url)
    assert json.loads(res.text) == {"a": 1, "b": [1, 2]}
    assert res.text == '{"a":1,"b":[1,2]}'  # canonical dump (sorted, compact)


def test_catch_status_code_error_runs_on_failure():
    h = H.REGISTRY["catch_errors"]
    assert h.catch_status_code_error
    res = h.fn(None, "http://a.ex/missing")
    assert res.text == "fetch-error http://a.ex/missing"
    # and still extracts normally on success
    res2 = h.fn(b"<p>ok</p>", "http://a.ex/p")
    assert res2.text == "ok"


def test_catch_error_callbacks_listing():
    assert H.catch_error_callbacks() == ["catch_errors"]


def test_render_js_reveals_scripted_links_and_marks():
    html = b'<html><body><p>t</p><a data-js-href="/j/1">y</a></body></html>'
    # plain path: the scripted anchor is linkless
    plain = H.get("index_page").fn(html, "http://a.ex/p")
    assert plain.links == []
    # js path: the render materializes it and stamps the marker
    res = H.get("js_page").fn(html, "http://a.ex/p")
    assert res.links == ["http://a.ex/j/1"]
    assert res.text == "t\ny\n[rendered]"


def test_js_script_reaches_render_through_dispatch():
    """A handler registered with js_script must actually run it when
    dispatched by name (round-2 ADVICE: the field was declared but
    never passed through h_js_page)."""
    import hashlib

    html = b"<html><body><p>t</p></body></html>"
    h = H.get("js_scripted")
    assert h.js_script  # the registered example script
    tag = hashlib.md5(h.js_script.encode()).hexdigest()[:8]
    res = h.fn(html, "http://a.ex/p")
    assert res.text == f"t\n[rendered]\n[js:{tag}]"
    # the scriptless default handler stays marker-free (its contract
    # oracle pins the no-script rendered text)
    assert H.get("js_page").fn(html, "http://a.ex/p").text == "t\n[rendered]"


def test_render_js_script_marker_content_addressed():
    import hashlib

    out = H.render_js(b"<body>x</body>", "http://a.ex/", js_script="window.scrollTo(0,9)")
    tag = hashlib.md5(b"window.scrollTo(0,9)").hexdigest()[:8]
    assert out == b"<body>x<p>[rendered]</p><p>[js:" + tag.encode() + b"]</p></body>"
    # deterministic: same script, same bytes
    assert out == H.render_js(b"<body>x</body>", "http://a.ex/", js_script="window.scrollTo(0,9)")


def test_render_js_none_and_production_hook():
    import pytest

    assert H.render_js(None, "http://a.ex/") is None
    with pytest.raises(NotImplementedError):
        H.render_js(b"<body></body>", "http://a.ex/", fake=False)


def test_js_callbacks_listing():
    assert H.js_callbacks() == ["js_page", "js_scripted"]
    assert H.get("js_page").fetch_type == "js"
    assert H.get("index_page").fetch_type == "http"
