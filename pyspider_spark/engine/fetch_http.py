"""Production HTTP fetch stage — transport-injectable batch fetcher
(SURVEY §2.1 S7's real half; round-2 verdict "Missing" #1/#2).

Reference semantics: ``pyspider/fetcher/tornado_fetcher.py —
http_fetch()/handle_response() (~L300-560)`` and the assertions in the
reference's ``tests/test_fetcher.py``:

- redirect chains followed up to ``max_redirects`` (301/302/303 switch
  to GET, 307/308 preserve the method; relative ``Location`` resolved
  against the hop url); exceeding the budget is the 599 error path,
  like tornado's "Maximum redirect" error
- conditional requests: a task carrying ``etag`` / ``last_modified``
  sends ``If-None-Match`` / ``If-Modified-Since``; a 304 comes back as
  its own status with no content
- gzip: ``Accept-Encoding: gzip`` is offered and a
  ``Content-Encoding: gzip`` body is decompressed before extraction
- cookies: ``Set-Cookie`` response headers are carried across the
  hops of one fetch chain (per-chain jar, the tornado CookieJar analog)
- connect/read timeouts and transport errors map to status 599 with
  the error string (tornado uses 599 for every connection-level error)

Architecture: the schedule DataFrame streams through ONE
``mapInPandas`` pass; each Arrow batch fans its rows out on a
thread pool (``RoundConfig.http_pool`` — the reference fetcher's
``poolsize`` analog; fetching is IO-bound so threads, not processes)
and every row returns the SAME columns the simulated-join fetch
produces (html, code) plus fetch metadata (final url, redirect_url,
response headers) that ``track.fetch`` records. Downstream —
dispatch, extraction, analysis, settlement — is byte-identical code
shared with the join stage (``fetchx.extract_outputs``), so the two
stages are interchangeable per ``RoundConfig.fetch_stage`` and the
engine-level equivalence test pins join-vs-http metric equality on
the same corpus.

Transports are INJECTABLE by dotted path (``module:callable`` —
picklable as a string, resolved inside the Python worker):

- :func:`urllib_transport` — the real stdlib HTTP client (production;
  exercised in tests against a live local ``http.server``)
- :func:`file_transport` — scripted routes from a JSON file (the mock
  the engine tests drive full rounds through; also how an air-gapped
  rerun replays a recorded crawl)

Scale notes (100 TB / 10^10 frontier): the stage holds one Arrow
batch of pages in memory per task (maxRecordsPerBatch bounds it), no
shuffle is introduced (the schedule arrives already salted/rebalanced
by politeness), and per-host politeness has ALREADY bounded each
task's row set — the thread pool is per-task concurrency against
distinct hosts, not a per-host hammer.
"""

from __future__ import annotations

import gzip
import json
import socket
import zlib
from collections.abc import Iterator
from dataclasses import dataclass, field
from importlib import import_module
from urllib.parse import urljoin

import pandas as pd

from pyspider_spark.config import FETCH_OK, FETCH_TIMEOUT, RoundConfig

REDIRECT_CODES = (301, 302, 303, 307, 308)
NOT_MODIFIED = 304


@dataclass
class TResponse:
    """One wire response: status, headers (lower-cased keys), raw body."""

    status: int
    headers: dict[str, str] = field(default_factory=dict)
    body: bytes = b""


class TransportError(Exception):
    """Connection-level failure (DNS, refused, reset) → 599."""


class TransportTimeout(TransportError):
    """Connect/read timeout → 599, like tornado's HTTP 599."""


def _lower_headers(headers: dict[str, str]) -> dict[str, str]:
    return {k.lower(): v for k, v in headers.items()}


class UrllibTransport:
    """Real stdlib HTTP client. One instance per executor task; no
    shared state, so thread-pool use inside a batch is safe. Follows
    NOTHING itself (redirect/cookie/conditional logic lives in
    :func:`fetch_one`, uniformly across transports)."""

    def request(
        self, method: str, url: str, headers: dict[str, str], timeout: float
    ) -> TResponse:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, headers=headers, method=method)
        opener = urllib.request.build_opener(
            # no redirect handling here — fetch_one owns the chain
            _NoRedirect(),
        )
        try:
            with opener.open(req, timeout=timeout) as resp:
                return TResponse(
                    resp.status, _lower_headers(dict(resp.headers)), resp.read()
                )
        except urllib.error.HTTPError as e:  # non-2xx IS a response
            return TResponse(e.code, _lower_headers(dict(e.headers or {})), e.read())
        except (TimeoutError, socket.timeout) as e:
            raise TransportTimeout(f"timeout: {e or 'read timed out'}") from e
        except urllib.error.URLError as e:
            if isinstance(e.reason, (TimeoutError, socket.timeout)):
                raise TransportTimeout(f"timeout: {e.reason}") from e
            raise TransportError(str(e.reason)) from e
        except OSError as e:
            raise TransportError(str(e)) from e


class _NoRedirect:
    """urllib handler stub: surface 3xx as plain responses."""

    import urllib.request as _u

    class _H(_u.HTTPRedirectHandler):
        def redirect_request(self, req, fp, code, msg, headers, newurl):  # noqa: D102
            return None

    def __new__(cls):  # single indirection keeps the import local
        return cls._H()


class DictTransport:
    """Scripted routes for tests/replays: ``routes[url] = (status,
    headers, body)``; unknown urls 404; status 599 entries raise
    :class:`TransportTimeout` (the scripted slow-host)."""

    def __init__(self, routes: dict[str, tuple[int, dict[str, str], bytes]]):
        self.routes = routes

    def request(
        self, method: str, url: str, headers: dict[str, str], timeout: float
    ) -> TResponse:
        ent = self.routes.get(url)
        if ent is None:
            return TResponse(404, {}, b"")
        status, hdrs, body = ent
        if status == FETCH_TIMEOUT:
            raise TransportTimeout("scripted timeout")
        hdrs = _lower_headers(dict(hdrs))
        # scripted conditional support: etag match → 304 empty
        if hdrs.get("etag") and headers.get("If-None-Match") == hdrs["etag"]:
            return TResponse(NOT_MODIFIED, hdrs, b"")
        return TResponse(status, hdrs, body if method != "HEAD" else b"")


def urllib_transport(arg: str | None = None):
    """Factory: the production transport (``RoundConfig.http_transport``
    default)."""
    return UrllibTransport()


def file_transport(arg: str | None = None):
    """Factory: routes from a JSON file ``{url: {"status": int,
    "headers": {...}, "body": str | "body_hex": str}}`` — the engine
    tests synthesize one from the fixture pages table."""
    routes: dict[str, tuple[int, dict[str, str], bytes]] = {}
    if arg:
        with open(arg) as f:
            for url, ent in json.load(f).items():
                body = (
                    bytes.fromhex(ent["body_hex"])
                    if "body_hex" in ent
                    else ent.get("body", "").encode("utf-8")
                )
                routes[url] = (int(ent.get("status", 200)), dict(ent.get("headers", {})), body)
    return DictTransport(routes)


def make_transport(spec: str, arg: str | None = None):
    """Resolve ``module:callable`` and call it with ``arg`` — runs
    inside the Python worker, so the factory string (not a closure)
    is what ships with the plan."""
    mod, _, fn = spec.partition(":")
    return getattr(import_module(mod), fn)(arg)


def _gunzip(body: bytes) -> bytes:
    try:
        return gzip.decompress(body)
    except OSError:
        return zlib.decompress(body)  # raw-deflate fallback


def fetch_one(
    transport,
    url: str,
    *,
    method: str = "GET",
    headers: dict[str, str] | None = None,
    etag: str | None = None,
    last_modified: str | None = None,
    cookies: dict[str, str] | None = None,
    max_redirects: int = 5,
    timeout: float = 120.0,
) -> dict:
    """One task fetch with the reference's chain semantics; returns
    ``{code, content, url (final), redirect_url, headers, error}``.
    ``code`` 599 covers transport errors, timeouts and redirect-budget
    exhaustion (tornado's convention)."""
    jar: dict[str, str] = dict(cookies or {})
    cur, cur_method = url, method
    redirects = 0
    try:
        while True:
            h = {"Accept-Encoding": "gzip"}
            h.update(headers or {})
            if jar:
                h["Cookie"] = "; ".join(f"{k}={v}" for k, v in sorted(jar.items()))
            if redirects == 0:  # conditional headers on the first hop only
                if etag:
                    h["If-None-Match"] = etag
                if last_modified:
                    h["If-Modified-Since"] = last_modified
            resp = transport.request(cur_method, cur, h, timeout)
            # per-chain cookie jar (tornado CookieJar analog; name=value
            # only — domain/path scoping is a chain-local no-op)
            sc = resp.headers.get("set-cookie")
            if sc:
                for part in sc.split("\n"):  # multi-value joined by \n
                    nv = part.split(";", 1)[0]
                    if "=" in nv:
                        k, _, v = nv.partition("=")
                        jar[k.strip()] = v.strip()
            if resp.status in REDIRECT_CODES:
                loc = resp.headers.get("location")
                if not loc:
                    return _result(resp.status, resp.body, cur, url, resp.headers)
                redirects += 1
                if redirects > max_redirects:
                    return _result(
                        FETCH_TIMEOUT, None, cur, url, resp.headers,
                        error=f"maximum redirects ({max_redirects}) exceeded",
                    )
                if resp.status in (301, 302, 303):
                    cur_method = "GET"  # 307/308 preserve the method
                cur = urljoin(cur, loc)
                continue
            body: bytes | None = resp.body
            if resp.status == NOT_MODIFIED:
                body = None  # content unchanged since etag/last_modified
            elif "gzip" in resp.headers.get("content-encoding", ""):
                try:
                    body = _gunzip(resp.body)
                except (OSError, zlib.error) as e:
                    return _result(
                        FETCH_TIMEOUT, None, cur, url, resp.headers,
                        error=f"bad gzip body: {e}",
                    )
            return _result(resp.status, body, cur, url, resp.headers)
    except TransportError as e:
        return _result(FETCH_TIMEOUT, None, cur, url, {}, error=str(e))


def _result(
    code: int,
    content: bytes | None,
    final_url: str,
    orig_url: str,
    headers: dict[str, str],
    error: str | None = None,
) -> dict:
    return {
        "code": code,
        "content": content,
        "url": final_url,
        "redirect_url": final_url if final_url != orig_url else None,
        "headers": headers,
        "error": error,
    }


# --- the Spark stage ---------------------------------------------------

# `code`/`html`/meta column names match the simulated join's, so
# fetchx.extract_outputs is shared verbatim
from pyspider_spark.engine.fetchx import FETCH_META_COLS  # noqa: E402


def fetch_stage(sched, cfg: RoundConfig):
    """schedule → schedule + (html, code, redirect_url, fetch_headers,
    fetch_error): one mapInPandas pass, per-batch thread-pool fan-out
    through the injected transport. ``data:`` urls short-circuit the
    transport entirely (``tornado_fetcher.py — data_fetch()``); the
    dispatch batch decodes their payload from the url itself."""
    spec, arg = cfg.http_transport, cfg.http_transport_arg
    pool, timeout, max_r = cfg.http_pool, cfg.http_timeout, cfg.max_redirects
    in_schema = sched.schema
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema.fields)
        + ", html binary, code int, redirect_url string,"
        " fetch_headers string, fetch_error string"
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        transport = make_transport(spec, arg)

        def one(u: str) -> dict:
            if u.startswith("data:"):
                return _result(FETCH_OK, None, u, u, {})
            return fetch_one(
                transport, u, max_redirects=max_r, timeout=timeout
            )

        for pdf in it:
            if len(pdf) == 0:
                continue
            urls = pdf["canon_url"].tolist()
            with ThreadPoolExecutor(min(pool, len(urls))) as ex:
                rows = list(ex.map(one, urls))  # order-preserving
            out = pdf.reset_index(drop=True).copy()
            out["html"] = pd.Series(
                [r["content"] for r in rows], dtype="object"
            )
            out["code"] = pd.Series([r["code"] for r in rows], dtype="int32")
            out["redirect_url"] = [r["redirect_url"] for r in rows]
            out["fetch_headers"] = [
                json.dumps(r["headers"], sort_keys=True) if r["headers"] else None
                for r in rows
            ]
            out["fetch_error"] = [r["error"] for r in rows]
            yield out

    return sched.mapInPandas(run, out_schema)


def fetch_http_and_extract(sched, cfg: RoundConfig):
    """The http-stage twin of ``fetchx.fetch_and_extract``: fetch over
    the wire, then the SHARED dispatch/extraction/analysis tail — the
    engine swaps stages via ``RoundConfig.fetch_stage`` with no other
    code difference."""
    from pyspider_spark.engine.fetchx import extract_outputs

    f = fetch_stage(sched, cfg)
    return extract_outputs(f, list(sched.columns), cfg, meta_cols=FETCH_META_COLS)
