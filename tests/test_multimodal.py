"""Multimodal plumbing tests: binary payload columns through
mapInPandas decode/resize/frame-sample (SURVEY-adjacent training-data
ops; decode itself is a deterministic fake — the container has no
image/audio libs — but schema, batching and byte round-trips are real).
"""

from __future__ import annotations

import hashlib

import pytest
import pyspark.sql.functions as F

from pyspider_spark.ops.multimodal import (
    decode_image,
    resize_image,
    sample_frames,
)


def test_decode_image_deterministic():
    d1 = decode_image(b"payload-bytes", "image/fake")
    d2 = decode_image(b"payload-bytes", "image/fake")
    assert d1 == d2
    w, h, c = d1
    assert 16 <= w < 256 and 16 <= h < 256 and 1 <= c <= 4


def test_decode_image_real_path_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"x", "image/png", fake=False)


def test_resize_and_frames_deterministic():
    p = b"some video bytes"
    assert resize_image(p, "image/fake", (224, 224)) == resize_image(
        p, "image/fake", (224, 224)
    )
    assert resize_image(p, "image/fake", (64, 64)) != resize_image(
        p, "image/fake", (224, 224)
    )
    fr = sample_frames(p, "video/fake", every_n=10)
    assert fr == sample_frames(p, "video/fake", every_n=10)
    assert len(fr) >= 1
    with pytest.raises(NotImplementedError):
        sample_frames(p, "video/fake", fake=False)


def _docs(spark):
    rows = [(i, f"doc body {i}".encode(), "image/fake") for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, payload binary, mime string")


def test_extract_features_spark(spark):
    from pyspider_spark.ops.multimodal import extract_features

    out = extract_features(_docs(spark)).collect()
    assert len(out) == 40
    by_id = {r["doc_id"]: r for r in out}
    expect = hashlib.md5(b"doc body 7").hexdigest()
    assert by_id[7]["md5"] == expect
    assert by_id[7]["n_bytes"] == len(b"doc body 7")
    w, h, c = decode_image(b"doc body 7", "image/fake")
    assert (by_id[7]["width"], by_id[7]["height"], by_id[7]["channels"]) == (w, h, c)


def test_resize_batch_spark(spark):
    from pyspider_spark.ops.multimodal import resize_batch

    out = resize_batch(_docs(spark), target=(64, 48)).collect()
    assert len(out) == 40
    r = next(x for x in out if x["doc_id"] == 3)
    assert bytes(r["resized"]) == resize_image(b"doc body 3", "image/fake", (64, 48))
    assert (r["width"], r["height"]) == (64, 48)


def test_sample_frames_batch_spark(spark):
    from pyspider_spark.ops.multimodal import sample_frames_batch

    out = sample_frames_batch(_docs(spark), every_n=10).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert set(per_doc) == set(range(40))
    rows3 = sorted(per_doc[3], key=lambda r: r["frame_idx"])
    expect = sample_frames(b"doc body 3", "", every_n=10)
    assert [bytes(r["frame"]) for r in rows3] == expect
    assert [r["frame_idx"] for r in rows3] == [i * 10 for i in range(len(expect))]


def test_near_dup_pairs_matches_bruteforce(spark):
    """ops/similarity numpy kernel vs a plain-python oracle on a tiny
    deterministic embedding set."""
    import numpy as np

    from pyspider_spark.ops.similarity import cosine_topk, near_dup_pairs

    rng_rows = []
    for i in range(30):
        vec = [float(((i * 31 + j * 7) % 11) - 5) for j in range(8)]
        rng_rows.append((i, vec))
    emb = spark.createDataFrame(rng_rows, "vec_id long, embedding array<float>")

    got = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in near_dup_pairs(spark, emb, threshold=0.2).collect()
    }
    mat = np.stack([np.array(v, dtype=np.float32).astype(np.float64) for _, v in rng_rows])
    matn = mat / np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    expect = {}
    for i in range(30):
        for j in range(i + 1, 30):
            c = round(float(matn[i] @ matn[j]), 6)
            if c >= 0.2:
                expect[(i, j)] = c
    assert got == expect

    topk = cosine_topk(spark, emb, np.array(rng_rows[5][1]), k=5).collect()
    assert len(topk) == 5
    assert topk[0]["vec_id"] == 5  # self-similarity = 1.0 ranks first
    assert abs(topk[0]["cosine"] - 1.0) < 1e-9

def test_cosine_topk_boundary_tie_keeps_smaller_vec_id(spark):
    """Review r4: the per-batch prune must use the global (cosine DESC,
    vec_id ASC) order — positional nlargest dropped the smaller id when
    duplicates tied at the k boundary."""
    import numpy as np

    from pyspider_spark.ops.similarity import cosine_topk

    q = np.ones(4, dtype=np.float64)
    # one batch, higher id FIRST by position; identical embeddings
    emb = spark.createDataFrame(
        [(5, [1.0] * 4), (1, [1.0] * 4), (9, [-1.0] * 4)],
        "vec_id long, embedding array<double>",
    ).repartition(1)
    got = cosine_topk(spark, emb, q, k=1).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == [(1, 1.0)]


def test_multimodal_null_rows_skipped(spark):
    """Review r4: one NULL payload (failed media fetch) must not kill
    the task — null rows are skipped, the rest decode."""
    from pyspider_spark.ops.multimodal import (
        extract_features,
        resize_batch,
        sample_frames_batch,
    )

    df = spark.createDataFrame(
        [(1, b"good bytes", "image/fake"), (2, None, "image/fake")],
        "doc_id long, payload binary, mime string",
    )
    assert [r["doc_id"] for r in extract_features(df).collect()] == [1]
    assert [r["doc_id"] for r in resize_batch(df).collect()] == [1]
    assert {r["doc_id"] for r in sample_frames_batch(df).collect()} == {1}


def test_ann_topk_empty_queries(spark):
    from pyspider_spark.ops.ann import ann_topk

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    empty_q = emb.filter("vec_id < 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann_topk(spark, emb, empty_q, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "vec_id", "cosine", "rnk"]


def test_train_ivf_is_magnitude_invariant(spark):
    """Review r4: spherical k-means must accumulate unit directions —
    scaling any row by a positive factor must not move the centroids."""
    import numpy as np

    from pyspider_spark.ops.ann import train_ivf

    rows, scaled = [], []
    for i in range(40):
        vec = [float(((i * 13 + j * 5) % 9) - 4) or 1.0 for j in range(6)]
        rows.append((i, vec))
        s = 1.0 + (i % 7) * 1000.0  # wildly varying positive magnitudes
        scaled.append((i, [x * s for x in vec]))
    a = train_ivf(
        spark, spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        n_centroids=4, n_iters=3,
    )
    b = train_ivf(
        spark, spark.createDataFrame(scaled, "vec_id long, embedding array<double>"),
        n_centroids=4, n_iters=3,
    )
    assert np.allclose(a, b, atol=1e-12)
