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
    "doc_id long, mime string, n_bytes long, sha1 string, "
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
    h = hashlib.sha1(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, 1 + h[2] % 4


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction over a binary column.

    Input must carry ``doc_id``, ``mime`` and ``payload_col``; output is
    one small feature row per input row (FEATURE_SCHEMA).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode_image(bytes(p), m) for p, m in zip(pdf[payload_col], pdf["mime"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mime": pdf["mime"],
                    "n_bytes": [len(bytes(p)) for p in pdf[payload_col]],
                    "sha1": [hashlib.sha1(bytes(p)).hexdigest() for p in pdf[payload_col]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)
