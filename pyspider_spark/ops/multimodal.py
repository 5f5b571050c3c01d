"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed batch-wise with mapInPandas (Arrow transfer).

The image/audio decode libraries are not in this container, so the
actual decode is STUBBED: ``decode_image`` raises NotImplementedError
unless a deterministic fake decoder is requested. Everything around it
— schema, Arrow batch shape, partition-parallel execution, bounded
per-batch memory — is real and tested, so swapping in a real decoder
(PIL / libvips / ffmpeg via pandas UDF) is a one-function change.

Scale notes: payload bytes never leave the executor (mapInPandas keeps
them in Arrow buffers per partition); feature rows are tiny, so the
output shuffles cheaply. For 100 TB of media, partition the input table
by size-bucketed file groups so batches stay within
``spark.sql.execution.arrow.maxRecordsPerBatch`` × mean payload size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, md5 string, "
    "width int, height int, channels int"
)


def decode_image(payload: bytes, mime: str, fake: bool = True) -> tuple[int, int, int]:
    """Return (width, height, channels).

    Real decoders are unavailable in this environment. ``fake=True``
    derives deterministic pseudo-dimensions from the payload hash so
    the distributed plumbing is exercised end-to-end; ``fake=False`` is
    the production hook.
    """
    if not fake:
        raise NotImplementedError(
            "real image decode requires PIL/libvips — not installed; "
            "plug in here and flip fake=False"
        )
    h = hashlib.md5(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, 1 + h[2] % 4


def resize_image(
    payload: bytes, mime: str, target: tuple[int, int], fake: bool = True
) -> bytes:
    """Return the re-encoded resized payload.

    ``fake=True`` emits a deterministic surrogate (md5 of payload +
    target box) so batch shape / byte round-trip is exercised;
    ``fake=False`` is the production hook (PIL ``Image.resize``)."""
    if not fake:
        raise NotImplementedError("real resize requires PIL — plug in here")
    tag = f"{target[0]}x{target[1]}".encode()
    return hashlib.md5(payload + tag).digest() + tag


def sample_frames(
    payload: bytes, mime: str, every_n: int = 10, fake: bool = True
) -> list[bytes]:
    """Frame-sample a video payload: every ``every_n``-th frame.

    ``fake=True`` derives a deterministic frame count (payload hash) and
    returns surrogate frame payloads; ``fake=False`` is the production
    hook (ffmpeg/pyav)."""
    if not fake:
        raise NotImplementedError("real frame sampling requires ffmpeg/pyav")
    h = hashlib.md5(payload).digest()
    n_frames = 1 + h[3] % 120
    return [
        hashlib.md5(payload + i.to_bytes(4, "big")).digest()
        for i in range(0, n_frames, every_n)
    ]


def _drop_null_rows(pdf: pd.DataFrame, payload_col: str) -> pd.DataFrame:
    """Skip rows with a NULL payload or doc_id (failed media fetches):
    ``bytes(None)`` raises TypeError and a NaN doc_id breaks the int64
    cast — one bad row must not kill the whole task (review r4)."""
    keep = pdf[payload_col].notna() & pdf["doc_id"].notna()
    return pdf[keep] if not keep.all() else pdf


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction over a binary column.

    Input must carry ``doc_id``, ``mime`` and ``payload_col``; output is
    one small feature row per input row (FEATURE_SCHEMA).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = _drop_null_rows(pdf, payload_col)
            if len(pdf) == 0:
                continue
            dims = [decode_image(bytes(p), m) for p, m in zip(pdf[payload_col], pdf["mime"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mime": pdf["mime"],
                    "n_bytes": [len(bytes(p)) for p in pdf[payload_col]],
                    "md5": [hashlib.md5(bytes(p)).hexdigest() for p in pdf[payload_col]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def resize_batch(
    df: DataFrame, target: tuple[int, int] = (224, 224), payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas resize over a binary column → (doc_id, mime, resized
    binary, width, height). Bytes stay in Arrow buffers executor-side."""
    w, h = int(target[0]), int(target[1])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = _drop_null_rows(pdf, payload_col)
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mime": pdf["mime"],
                    "resized": [
                        resize_image(bytes(p), m, (w, h))
                        for p, m in zip(pdf[payload_col], pdf["mime"])
                    ],
                    "width": w,
                    "height": h,
                }
            )

    return df.mapInPandas(
        fn, "doc_id long, mime string, resized binary, width int, height int"
    )


def sample_frames_batch(
    df: DataFrame, every_n: int = 10, payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas frame sampling → one row per sampled frame
    (doc_id, frame_idx, frame binary) — the explode happens inside the
    batch so frame bytes never transit the driver."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = _drop_null_rows(pdf, payload_col)
            ids, idxs, frames = [], [], []
            for did, p in zip(pdf["doc_id"], pdf[payload_col]):
                for i, fr in enumerate(sample_frames(bytes(p), "", every_n)):
                    ids.append(int(did))
                    idxs.append(i * every_n)
                    frames.append(fr)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(fn, "doc_id long, frame_idx int, frame binary")
