"""Deterministic synthetic crawl fixtures (FIXTURES.md; seed=42, no
external data, no RNG — everything derived from md5 of stable strings
so generation is order- and process-independent).

Tables produced (parquet via pyarrow):
  pages(url, warc_ts, html, text, lang)      — per BASELINE.json input_hint
  seeds(url, project, priority, exetime, age, itag, force_update,
        auto_recrawl, callback)
  projects(project, status, rate, burst, min_tick, script_ref)
  robots(host, robots_txt, fetched_ts)

The golden ``text`` column is produced by the oracle extractor
(byte-identity contract — FIXTURES.md §1/§6).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

from pyspider_spark.kernels.canon import canonicalize
from pyspider_spark.oracle.extractor import extract_page

T0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
T0_EPOCH = T0.timestamp()

_VOCAB = (
    "crawl frontier spark shuffle page link host fetch parse index token "
    "bucket bloom filter queue priority round snapshot merge state text"
).split()


def _h(s: str) -> int:
    """Stable 64-bit hash (seed=42 folded into the tag)."""
    return int.from_bytes(hashlib.md5(f"42|{s}".encode()).digest()[:8], "big")


@dataclass(frozen=True)
class Size:
    hosts: int
    pages_per_host: int
    hot_frac: float = 0.0  # extra share of pages on host0 (skew scenario)


SIZES = {
    "smoke": Size(5, 20),
    "correctness": Size(20, 200),
    "bench": Size(200, 3000, hot_frac=0.30),
}


def host_name(h: int) -> str:
    return f"host{h}.example"


def page_url(h: int, i: int) -> str:
    """~10% of stored urls carry canonicalization noise (FIXTURES.md §1)."""
    base = f"http://host{h}.example/p/{i}"
    r = _h(f"noise|{h}|{i}") % 10
    if r == 0:
        return f"http://HOST{h}.example:80/p/{i}?b=2&a=1#frag"
    return base


def _n_pages(h: int, size: Size) -> int:
    if size.hot_frac and h == 0:
        total = size.hosts * size.pages_per_host
        return int(total * size.hot_frac)
    return size.pages_per_host


def _links_for(h: int, i: int, size: Size) -> list[str]:
    """Deterministic link mix: relative, absolute, cross-host, duplicate,
    fragment, noisy, missing(404) and slow-host links (FIXTURES.md §1)."""
    np_h = _n_pages(h, size)
    links = [
        f"/p/{(i + 1) % np_h}",                       # relative absolute-path
        f"p/{(i + 2) % np_h}",                        # relative
        f"/p/{(i + 1) % np_h}",                       # duplicate
        f"/p/{(i + 3) % np_h}#sec2",                  # fragment (canon-strips)
    ]
    nh = (h + 1) % size.hosts
    links.append(f"http://host{nh}.example/p/{i % size.pages_per_host}")  # cross-host
    if _h(f"noisylink|{h}|{i}") % 10 == 0:
        links.append(f"HTTP://HOST{nh}.EXAMPLE:80/p/{(i + 5) % size.pages_per_host}?z=1&a=2")
    if _h(f"missing|{h}|{i}") % 17 == 0:
        links.append(f"/missing/{i}")                  # 404 scenario
    if h == 0 and i % 50 == 7:
        links.append(f"http://slow.example/p/{i}")     # timeout scenario
    if _h(f"mailto|{h}|{i}") % 29 == 0:
        links.append("mailto:nobody@example.com")      # non-http (dropped)
    return links


def _body_text(h: int, i: int) -> str:
    n = 8 + _h(f"len|{h}|{i}") % 25
    return " ".join(_VOCAB[_h(f"w|{h}|{i}|{j}") % len(_VOCAB)] for j in range(n))


def build_html(h: int, i: int, size: Size) -> bytes:
    anchors = "".join(f'<a href="{u}">l{k}</a> ' for k, u in enumerate(_links_for(h, i, size)))
    latin = _h(f"latin|{h}|{i}") % 13 == 0
    if latin:
        head = '<meta charset="latin-1">'
        extra = "café straße niño"
        enc = "latin-1"
    else:
        head = '<meta charset="utf-8">'
        extra = ""
        enc = "utf-8"
    doc = (
        f"<html><head>{head}<title>host{h}.example page {i}</title></head>"
        f"<body><p>{_body_text(h, i)} {extra}</p>{anchors}"
        f"<script>var x=1;</script></body></html>"
    )
    return doc.encode(enc, errors="replace")


def gen_pages(size: Size) -> pa.Table:
    urls, tss, htmls, texts, langs = [], [], [], [], []
    k = 0
    for h in range(size.hosts):
        for i in range(_n_pages(h, size)):
            url = page_url(h, i)
            html = build_html(h, i, size)
            ext = extract_page(html, canonicalize(url))
            urls.append(url)
            tss.append(
                dt.datetime.fromtimestamp(
                    T0_EPOCH + _h(f"ts|{url}") % 86400, tz=dt.timezone.utc
                )
            )
            htmls.append(html)
            texts.append(ext.text)
            langs.append("de" if k % 7 == 6 else "en")
            k += 1
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def gen_seeds(size: Size) -> pa.Table:
    rows = []

    def add(url, project="test_project", priority=0, exetime=0.0, age=-1.0,
            itag=None, force_update=False, auto_recrawl=False, callback="index_page"):
        rows.append((url, project, priority, exetime, age, itag,
                     force_update, auto_recrawl, callback))

    n_seed_hosts = min(size.hosts, 10)
    for h in range(n_seed_hosts):
        add(f"http://host{h}.example/p/0", priority=_h(f"prio|{h}") % 10)
    # 3 exact duplicates + 2 non-canonical variants of host0 root (dedup)
    add("http://host0.example/p/0")
    add("http://host1.example/p/0")
    add("http://host2.example/p/0")
    add("http://HOST0.example:80/p/0")
    add("http://host0.example/p/0#top")
    # time-queue scenario: future exetime
    add("http://host3.example/p/5", exetime=T0_EPOCH + 300.0)
    # re-crawl scenarios
    add("http://host4.example/p/1", age=3600.0)
    add("http://host1.example/p/1", force_update=True)
    add("http://host2.example/p/1", force_update=True)
    add("http://host3.example/p/1", auto_recrawl=True, age=5.0)
    add("http://host1.example/p/2", itag="v1")
    # second project (message routing) + stopped project (excluded)
    add("http://host5.example/p/0" if size.hosts > 5 else "http://host0.example/p/3",
        project="msg_project")
    add("http://host0.example/p/9", project="stopped_project")
    # handler-dispatch scenarios (U1-U4, S8, F6, @catch_status_code_error):
    # notify handler send_messages to msg_project and follows→detail_page
    add("http://host2.example/p/2", callback="index_and_notify")
    # leaf handler: text only, no follow expansion
    add("http://host4.example/p/2", callback="detail_page")
    # catch_status_code_error: 404 url still settles SUCCESS with a result
    add("http://host1.example/missing/77", callback="catch_errors")
    # data: payload decode (S8/F12) + Response.json (F6)
    from pyspider_spark.kernels.dataurl import encode as dataurl_encode

    add(dataurl_encode(b'{"b": [1, 2], "a": 1}', "application/json"),
        callback="json_fields")
    # exception burst (P6): 3 strict_page exceptions in round 0 pause
    # flaky_project; its 4th (future-due) seed must never be scheduled.
    # (urls chosen noise-free so all three actually fetch 200 and the
    # exceptions come from the handler, not the 404 path)
    for u in ("http://host0.example/p/3", "http://host1.example/p/4",
              "http://host2.example/p/3"):
        add(u, project="flaky_project", callback="strict_page")
    add("http://host4.example/p/4", project="flaky_project",
        exetime=T0_EPOCH + 2.0)
    cols = list(zip(*rows))
    return pa.table(
        {
            "url": pa.array(cols[0], pa.string()),
            "project": pa.array(cols[1], pa.string()),
            "priority": pa.array(cols[2], pa.int32()),
            "exetime": pa.array(cols[3], pa.float64()),
            "age": pa.array(cols[4], pa.float64()),
            "itag": pa.array(cols[5], pa.string()),
            "force_update": pa.array(cols[6], pa.bool_()),
            "auto_recrawl": pa.array(cols[7], pa.bool_()),
            "callback": pa.array(cols[8], pa.string()),
        }
    )


def gen_projects() -> pa.Table:
    # heterogeneous rate/burst: the per-project cap (J5) binds for
    # test_project from round 1 on (candidates outgrow the refill) and
    # stays loose for msg_project — both paths exercised in the
    # engine⇄simulator equivalence suite.
    rows = [
        ("test_project", "RUNNING", 8.0, 18.0, 30.0, "default_extractor"),
        ("msg_project", "RUNNING", 2.0, 3.0, 0.0, "default_extractor"),
        ("stopped_project", "STOP", 1.0, 10.0, 0.0, "default_extractor"),
        # unthrottled (NULL rate/burst) — P6 pause scenario
        ("flaky_project", "RUNNING", None, None, 0.0, "default_extractor"),
    ]
    cols = list(zip(*rows))
    return pa.table(
        {
            "project": pa.array(cols[0], pa.string()),
            "status": pa.array(cols[1], pa.string()),
            "rate": pa.array(cols[2], pa.float64()),
            "burst": pa.array(cols[3], pa.float64()),
            "min_tick": pa.array(cols[4], pa.float64()),
            "script_ref": pa.array(cols[5], pa.string()),
        }
    )


def gen_robots(size: Size) -> pa.Table:
    hosts, txts, tss = [], [], []
    for h in range(size.hosts):
        hosts.append(host_name(h))
        if h == 3:
            txts.append("User-agent: *\nDisallow: /p/1")  # blocks /p/1*
        elif h == 1:
            txts.append("")  # empty robots → allow all
        else:
            txts.append("User-agent: *\nAllow: /")
        tss.append(T0)
    hosts.append("slow.example")
    txts.append("User-agent: *\nAllow: /")
    tss.append(T0)
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "robots_txt": pa.array(txts, pa.string()),
            "fetched_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
        }
    )


def materialize(out_dir: str, size_name: str = "smoke") -> dict[str, str]:
    """Write all fixture tables under out_dir; idempotent (skips if the
    sentinel exists). Returns {table: path}."""
    size = SIZES[size_name]
    os.makedirs(out_dir, exist_ok=True)
    sentinel = os.path.join(out_dir, f".done-{size_name}")
    paths = {
        t: os.path.join(out_dir, f"{t}.parquet")
        for t in ("pages", "seeds", "projects", "robots")
    }
    if os.path.exists(sentinel):
        return paths
    pq.write_table(gen_pages(size), paths["pages"])
    pq.write_table(gen_seeds(size), paths["seeds"])
    pq.write_table(gen_projects(), paths["projects"])
    pq.write_table(gen_robots(size), paths["robots"])
    with open(sentinel, "w") as f:
        f.write("ok")
    return paths


if __name__ == "__main__":
    import sys

    name = sys.argv[1] if len(sys.argv) > 1 else "smoke"
    out = sys.argv[2] if len(sys.argv) > 2 else f".fixtures/{name}"
    print(materialize(out, name))
