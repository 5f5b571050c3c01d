"""URL canonicalization (SURVEY §2.7 F2/F10).

The reference dedups on the *exact* url string (taskid =
``md5string(url)``, ``pyspider/libs/base_handler.py — get_taskid()
(~L190)``); per BASELINE.json:6 our build replaces that with a
well-defined canonical key: lowercase scheme+host, strip fragment,
strip default port, sort query params. Idempotent by construction
(golden + hypothesis tests pin it).

Pure Python + pandas-vectorized wrappers; the same function is used by
the oracle simulator and (via pandas UDF) the Spark engine, so both
sides share one definition.
"""

from __future__ import annotations

import hashlib
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pandas as pd

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}


def canonicalize(url: str) -> str:
    """Canonical form of ``url``; returns '' for unusable urls.

    data: urls pass through untouched (S8 — they carry payload, not
    location). Non-http(s) schemes other than data: are unusable for
    the crawl and return '' (their rows are dropped at normalize, the
    same as no-host/malformed urls).
    """
    if not url:
        return ""
    url = url.strip()
    if url.startswith("data:"):
        return url
    try:
        parts = urlsplit(url)
    except ValueError:
        return ""
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return ""
    try:
        host = (parts.hostname or "").lower()
        port = parts.port  # lazy property — raises on malformed port
    except ValueError:
        return ""
    if not host:
        return ""
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"
    path = parts.path or "/"
    query = parts.query
    if query:
        pairs = parse_qsl(query, keep_blank_values=True)
        pairs.sort()
        query = urlencode(pairs)
    return urlunsplit((scheme, netloc, path, query, ""))


def url_host(url: str) -> str:
    """Politeness key: lowercase hostname ('' if none / data: url)."""
    if not url or url.startswith("data:"):
        return ""
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def partition_of(host: str, n_partitions: int) -> int:
    """Deterministic bucket(host) partition id for state co-location
    (SURVEY §4.3.1). md5-based — independent of PYTHONHASHSEED and of
    Spark's internal hash, shared by simulator and engine."""
    import hashlib

    return int.from_bytes(hashlib.md5(host.encode()).digest()[:4], "big") % n_partitions


def taskid_of(canon_url: str) -> str:
    """taskid = md5 hex of the canonical url (F1; byte-compatible with
    ``libs/utils.py — md5string()``)."""
    return hashlib.md5(canon_url.encode("utf-8")).hexdigest()


# --- pandas-vectorized wrappers (used inside Arrow UDFs) ----------------

def canonicalize_series(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize, na_action="ignore").fillna("")


def host_series(urls: pd.Series) -> pd.Series:
    return urls.map(url_host, na_action="ignore").fillna("")


def taskid_series(canon_urls: pd.Series) -> pd.Series:
    return canon_urls.map(taskid_of, na_action="ignore").fillna("")
