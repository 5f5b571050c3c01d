"""Handler registry — pyspider's user-programmability surface recast
as named vectorizable callbacks (SURVEY §2.9 U1-U4).

The reference compiles project scripts from projectdb at runtime
(``pyspider/processor/project_module.py — ProjectManager.get()``) and
dispatches ``process.callback`` on them (``libs/base_handler.py —
BaseHandler.run_task()/_run_task()``). Our build ships a registry of
named plain-Python handlers with the package (``spark-submit
--py-files`` — no code-from-DB compilation, a deliberate
simplification; ``projects.script_ref`` names the module). Each row's
``callback`` column selects its handler inside the SAME Arrow extract
batch — dispatch is per-row function lookup, not per-row Python UDF
overhead (the handlers themselves are the plain functions the oracle
simulator calls, so engine⇄oracle byte-identity holds by construction).

Decorator semantics mirrored (``libs/base_handler.py — every()/
config()/catch_status_code_error()``):
- ``@config(priority=, age=)`` → per-handler defaults applied to tasks
  *crawled toward* that callback (follow rows inherit the target
  handler's priority/age).
- ``@catch_status_code_error`` → the handler also runs on non-200
  fetches, and a successful run settles the task SUCCESS (the
  reference's processor marks ok from the callback outcome, not the
  fetch code).
- ``@every`` → projects.min_tick cron (engine F9), arriving here as
  ``_on_cronjob`` data: rows.
- ``send_message(project, msg)`` (U4) → handlers return messages;
  the engine/simulator route them as ``data:,_on_message|<payload>``
  update rows targeted at the receiving project, through the same
  follows union (``Scheduler.on_request`` message branch analog).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspider_spark.kernels.dataurl import decode as dataurl_decode
from pyspider_spark.oracle.extractor import extract_page


@dataclass(frozen=True)
class HandlerResult:
    text: str = ""
    links: list = field(default_factory=list)
    messages: list = field(default_factory=list)  # [(target_project, payload)]


@dataclass(frozen=True)
class Handler:
    """One named callback. `fn(content, url) -> HandlerResult` where
    content is the fetched bytes (html, or decoded data: payload) or
    None on fetch failure."""

    name: str
    fn: object
    follow_callback: str = "index_page"  # callback follows are crawled toward
    priority: int = 0  # @config defaults for tasks targeting this handler
    age: float = -1.0
    catch_status_code_error: bool = False
    # @config(fetch_type='js') — tasks targeting this handler want the
    # rendering fetcher (S9, ``fetcher/tornado_fetcher.py — fetch()``
    # dispatch). In the simulated-join engine the render step runs
    # inside the dispatch batch (render_js below); a production HTTP
    # fetch stage routes fetch_type='js' rows to a headless-browser
    # pool instead — the routing predicate is js_callbacks(), JVM-side.
    fetch_type: str = "http"
    js_script: str | None = None  # user script run at document-ready
    # per-task fetch section (``libs/base_handler.py — fetch_fields``,
    # consumed by ``fetcher/tornado_fetcher.py — http_fetch()``): tasks
    # crawled toward this callback fetch with these — the @config
    # analog of the reference's crawl(method=, data=, headers=,
    # user_agent=) kwargs. headers is a pairs tuple (frozen dataclass);
    # the production fetch stage (engine/fetch_http.fetch_stage) reads
    # them from the registry inside the worker, keyed by the row's
    # callback column — per-CALLBACK constants never widen the
    # politeness shuffle, only the per-TASK validators (etag/
    # last_modified) ride the schedule as columns.
    fetch_method: str = "GET"
    fetch_data: str | None = None  # request body (POST forms etc.)
    fetch_headers: tuple = ()  # ((name, value), ...) extra headers
    user_agent: str | None = None  # overrides the transport default UA
    # the reference's ``fetch.robots_txt`` task field — there robots
    # checking is per-task OPT-IN (default False,
    # ``tornado_fetcher.py — http_fetch`` checks can_fetch only when
    # set); our engine inverts the default to crawl-wide ON
    # (``RoundConfig.respect_robots``, the responsible default for a
    # web-scale crawler) and this flag is the per-callback OPT-OUT
    # that completes the parity: tasks toward a robots_txt=False
    # callback bypass the robots gate (e.g. fetching a host's own
    # robots/sitemap endpoints, or an API the operator controls).
    robots_txt: bool = True
    # the reference's ``fetch.validate_cert`` task field: tasks toward
    # a validate_cert=False callback accept self-signed/invalid TLS
    # certs (the production fetch stage routes them through an
    # unverified-context transport twin; see fetch_http.fetch_stage)
    validate_cert: bool = True


def _content_of(content: bytes | None, url: str) -> bytes | None:
    """data: rows carry their payload in the url (S8/F12)."""
    if url.startswith("data:"):
        return dataurl_decode(url)[0]
    return content


def render_js(
    html: bytes | None,
    url: str,
    js_script: str | None = None,
    fake: bool = True,
) -> bytes | None:
    """S9 — the js-rendering fetch step (``pyspider/fetcher/
    phantomjs_fetcher.js`` + ``tornado_fetcher.py — phantomjs_fetch()``:
    load the page, run ``js_script`` at document-ready, return the
    rendered DOM's html).

    ``fake=True`` (sandbox — no browser runtime in env) is a
    DETERMINISTIC render analog exercising exactly what js fetch exists
    for — content invisible to the plain fetcher becomes visible:

    - scripted links materialize: ``data-js-href`` attributes become
      real ``href`` (an ``<a data-js-href=...>`` is linkless to the
      http path, a followable anchor after render);
    - the rendered DOM differs from the wire bytes: a ``[rendered]``
      marker paragraph lands before ``</body>``;
    - ``js_script`` evaluation: a ``[js:<md5(script)[:8]>]`` paragraph
      records the (content-addressed) script that ran.

    ``fake=False`` is the production hook (headless chromium via a
    browser pool inside the fetch stage's mapInPandas batch) — not
    implementable in this environment."""
    if html is None:
        return None
    if not fake:
        raise NotImplementedError(
            "real js rendering needs a headless-browser runtime "
            "(playwright/chromium) — not available in this environment"
        )
    out = html.replace(b"data-js-href=", b"href=")
    tail = b"<p>[rendered]</p>"
    if js_script is not None:
        import hashlib

        tag = hashlib.md5(js_script.encode("utf-8")).hexdigest()[:8]
        tail += b"<p>[js:" + tag.encode("ascii") + b"]</p>"
    if b"</body>" in out:
        return out.replace(b"</body>", tail + b"</body>", 1)
    return out + tail


# --- built-in handlers -------------------------------------------------

def h_index_page(content: bytes | None, url: str) -> HandlerResult:
    """The default crawl handler (``libs/sample_handler.py``): extract
    text + follow every link."""
    ext = extract_page(_content_of(content, url), url)
    return HandlerResult(text=ext.text, links=ext.links)


def h_detail_page(content: bytes | None, url: str) -> HandlerResult:
    """Leaf handler: text only, no follow expansion (the sample
    handler's detail_page returning a result dict)."""
    ext = extract_page(_content_of(content, url), url)
    return HandlerResult(text=ext.text)


def h_index_and_notify(content: bytes | None, url: str) -> HandlerResult:
    """index_page variant that also ``send_message``s the page url to
    msg_project (mirrors tests/test_processor.py — _on_message
    routing); follows go to detail_page (exercises @config defaults)."""
    ext = extract_page(_content_of(content, url), url)
    return HandlerResult(
        text=ext.text, links=ext.links, messages=[("msg_project", url)]
    )


def h_data_text(content: bytes | None, url: str) -> HandlerResult:
    """_on_cronjob/_on_message: the decoded payload IS the text — no
    html parsing (``BaseHandler._on_cronjob/_on_message`` receive the
    message, they don't parse a page)."""
    c = _content_of(content, url)
    return HandlerResult(text=(c or b"").decode("utf-8", errors="replace"))


def h_json_fields(content: bytes | None, url: str) -> HandlerResult:
    """F6 Response.json: parse the payload as JSON; text = canonical
    compact dump (sorted keys) so byte-identity is well-defined."""
    c = _content_of(content, url)
    try:
        obj = json.loads((c or b"").decode("utf-8", errors="replace") or "null")
    except ValueError:
        obj = None
    return HandlerResult(text=json.dumps(obj, sort_keys=True, separators=(",", ":")))


def h_catch_errors(content: bytes | None, url: str) -> HandlerResult:
    """@catch_status_code_error demo: non-200 rows still produce a
    result row (text records the miss) and settle SUCCESS."""
    c = _content_of(content, url)
    if c is None:
        return HandlerResult(text=f"fetch-error {url}")
    ext = extract_page(c, url)
    return HandlerResult(text=ext.text, links=ext.links)


def _js_page(content: bytes | None, url: str, script: str | None) -> HandlerResult:
    rendered = render_js(_content_of(content, url), url, js_script=script)
    ext = extract_page(rendered, url)
    return HandlerResult(text=ext.text, links=ext.links)


def h_js_page(content: bytes | None, url: str) -> HandlerResult:
    """S9 fetch_type='js' handler: the dispatch batch renders the page
    (scripted links + render marker) before the standard extraction —
    the sandbox seam where a production fetch stage would hand over
    browser-rendered html instead. The document-ready script is the
    REGISTERED handler's ``js_script`` (none for this default one), so
    a handler declaring one actually runs it through dispatch."""
    return _js_page(content, url, REGISTRY["js_page"].js_script)


def h_js_scripted(content: bytes | None, url: str) -> HandlerResult:
    """fetch_type='js' + js_script handler (``base_handler.py —
    @config(js_script=...)``; the README's scroll-to-bottom example):
    render runs the script, leaving the content-addressed ``[js:<md5>]``
    marker in the rendered DOM — proving the script reached the render
    step through normal dispatch, not only via direct test calls."""
    return _js_page(content, url, REGISTRY["js_scripted"].js_script)


def h_post_form(content: bytes | None, url: str) -> HandlerResult:
    """Fetch-fields demo (``tests/test_fetcher.py`` POST assertions):
    tasks toward this callback POST a form body (see the registry
    entry's fetch_method/fetch_data) and extract the response."""
    ext = extract_page(_content_of(content, url), url)
    return HandlerResult(text=ext.text, links=ext.links)


def h_strict_page(content: bytes | None, url: str) -> HandlerResult:
    """A deliberately-broken handler: always raises. Exercises the
    processor-exception path — track.process.exception capture (F11)
    and the scheduler's exception-burst project pause (P6,
    ``scheduler/scheduler.py — Project.paused / EXCEPTION_LIMIT``)."""
    raise ValueError(f"strict_page refuses {url}")


REGISTRY: dict[str, Handler] = {
    h.name: h
    for h in (
        Handler("index_page", h_index_page),
        Handler(
            "detail_page", h_detail_page, follow_callback="detail_page",
            priority=2, age=3600.0,
        ),
        Handler(
            "index_and_notify", h_index_and_notify, follow_callback="detail_page"
        ),
        Handler("_on_cronjob", h_data_text, follow_callback="index_page"),
        Handler("_on_message", h_data_text, follow_callback="index_page"),
        Handler("json_fields", h_json_fields, follow_callback="json_fields"),
        Handler(
            "catch_errors", h_catch_errors, follow_callback="index_page",
            catch_status_code_error=True,
        ),
        Handler(
            "js_page", h_js_page, follow_callback="detail_page",
            fetch_type="js",
        ),
        Handler(
            "js_scripted", h_js_scripted, follow_callback="detail_page",
            fetch_type="js",
            js_script="window.scrollTo(0, document.body.scrollHeight);",
        ),
        Handler(
            "post_form", h_post_form, follow_callback="detail_page",
            fetch_method="POST",
            fetch_data="q=ping&src=crawler",
            fetch_headers=(("Content-Type", "application/x-www-form-urlencoded"),),
            user_agent="pyspider-spark-post/1.0",
        ),
        Handler("strict_page", h_strict_page),
        # robots-exempt crawl (the reference's robots_txt=False
        # default, scoped to one callback): same extraction as
        # index_page, but the robots gate is bypassed
        Handler(
            "robots_exempt_page", h_index_page, follow_callback="detail_page",
            robots_txt=False,
        ),
        # validate_cert=False crawl (self-signed/internal TLS hosts):
        # the fetch stage routes these through the unverified-context
        # transport twin
        Handler(
            "insecure_tls_page", h_index_page, follow_callback="detail_page",
            validate_cert=False,
        ),
    )
}

DEFAULT = REGISTRY["index_page"]


def get(name: str | None) -> Handler:
    return REGISTRY.get(name or "", DEFAULT)


def catch_error_callbacks() -> list[str]:
    return sorted(h.name for h in REGISTRY.values() if h.catch_status_code_error)


def no_robots_callbacks() -> list[str]:
    """Callbacks whose tasks bypass the robots gate (robots_txt=False
    — the per-callback opt-out of the crawl-wide default; consumed
    JVM-side in ``engine/politeness.check_robots``)."""
    return sorted(h.name for h in REGISTRY.values() if not h.robots_txt)


def js_callbacks() -> list[str]:
    """Callbacks whose tasks want the rendering fetcher (S9) — the
    JVM-side routing predicate a production fetch stage uses to split
    its batch between the HTTP pool and the browser pool."""
    return sorted(h.name for h in REGISTRY.values() if h.fetch_type == "js")


def message_url(payload: str) -> str:
    """The data: url a message row travels as (taskid = md5 of it, so
    identical payloads to the same project dedup — content-addressed)."""
    return f"data:,_on_message|{payload}"
