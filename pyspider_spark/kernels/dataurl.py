"""data: URL encode/decode (SURVEY §2.1 S8, §2.7 F12).

Mirrors the reference's ``pyspider/libs/dataurl.py — encode()/decode()``
(RFC 2397 subset): ``data:[<mediatype>][;base64],<data>`` — base64 or
percent-encoded payloads. The reference routes cron/info/message tasks
through data: urls (``fetcher/tornado_fetcher.py — data_fetch()``), so
the payload must actually decode and flow into the processor; round 1
discarded it (VERDICT S8/F12) — this kernel closes that.

Pure stdlib; shared verbatim by the oracle simulator and the engine's
Arrow extract batch (byte-identity by construction).
"""

from __future__ import annotations

import base64
from urllib.parse import quote, unquote_to_bytes

_DEFAULT_MEDIATYPE = "text/plain;charset=US-ASCII"


def decode(url: str) -> tuple[bytes, str]:
    """(content_bytes, mediatype) of a data: url. Malformed payloads
    decode to b'' rather than raising (the fetch path must not die on
    a bad task row — mirrors data_fetch's tolerant handling)."""
    if not url.startswith("data:"):
        raise ValueError("not a data: url")
    body = url[5:]
    head, sep, data = body.partition(",")
    if not sep:
        # no comma — the whole body is payload with default mediatype
        head, data = "", body
    is_b64 = head.endswith(";base64")
    mediatype = head[: -len(";base64")] if is_b64 else head
    if not mediatype:
        mediatype = _DEFAULT_MEDIATYPE
    try:
        if is_b64:
            pad = "=" * (-len(data) % 4)
            content = base64.b64decode(data + pad)
        else:
            content = unquote_to_bytes(data)
    except (ValueError, TypeError):
        content = b""
    return content, mediatype


def encode(content: bytes, mediatype: str = "text/plain", use_base64: bool = True) -> str:
    """Inverse of :func:`decode` (libs/dataurl.py — encode())."""
    if use_base64:
        return f"data:{mediatype};base64,{base64.b64encode(content).decode('ascii')}"
    return f"data:{mediatype},{quote(content.decode('utf-8'))}"
