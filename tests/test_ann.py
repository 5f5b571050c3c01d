"""ops/ann — IVF training, assignment, and multi-query top-k.

Pinned-fixture tests: exactness of the brute-force path vs a numpy
oracle (including cosine-tie boundaries across Arrow batches),
determinism of RNG-free Lloyd training, and recall of the probed IVF
path on a corpus with planted cluster structure.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from pyspider_spark.ops.ann import ann_topk, ivf_assign, train_ivf
from pyspider_spark.ops.similarity import _normalize

DIM = 8


def _vec(rng: np.random.Generator, center: np.ndarray, eps: float) -> list[float]:
    return (center + eps * rng.standard_normal(DIM)).tolist()


def _clustered(spark, n_clusters=8, per_cluster=40, eps=0.05):
    """Deterministic planted-cluster corpus: cluster centers are
    axis-ish unit vectors, members are small perturbations."""
    rng = np.random.default_rng(7)  # test-only seed; ops are RNG-free
    centers = _normalize(rng.standard_normal((n_clusters, DIM)))
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            rows.append((vid, _vec(rng, centers[c], eps)))
            vid += 1
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        centers,
    )


def _brute_topk(rows: list[tuple[int, list[float]]], q: np.ndarray, k: int):
    ids = np.array([r[0] for r in rows])
    mat = _normalize(np.stack([np.array(r[1]) for r in rows]).astype(np.float64))
    cos = np.round(mat @ _normalize(q.reshape(1, -1))[0], 6)
    order = np.lexsort((ids, -cos))[:k]
    return [(int(ids[i]), float(cos[i])) for i in order]


def test_bruteforce_matches_numpy_oracle(spark):
    df, _ = _clustered(spark, n_clusters=4, per_cluster=25)
    rows = [(r["vec_id"], r["embedding"]) for r in df.collect()]
    q = np.array(rows[3][1])
    queries = spark.createDataFrame(
        [(99, q.tolist())], "query_id long, embedding array<double>"
    )
    # many small partitions → per-batch top-k pruning is exercised
    got = (
        ann_topk(spark, df.repartition(16), queries, k=10)
        .orderBy("rnk")
        .collect()
    )
    expect = _brute_topk(rows, q, 10)
    assert [(r["vec_id"], r["cosine"]) for r in got] == expect
    assert [r["rnk"] for r in got] == list(range(1, 11))


def test_tie_break_across_batches(spark):
    # 30 identical vectors → all cosine 1.0; exact top-5 must be the 5
    # SMALLEST vec_ids even when batches only see larger ids first
    v = [1.0] + [0.0] * (DIM - 1)
    df = spark.createDataFrame(
        [(i, v) for i in range(100, 130)], "vec_id long, embedding array<double>"
    ).repartition(8)
    queries = spark.createDataFrame(
        [(0, v)], "query_id long, embedding array<double>"
    )
    got = ann_topk(spark, df, queries, k=5).orderBy("rnk").collect()
    assert [r["vec_id"] for r in got] == [100, 101, 102, 103, 104]


def test_train_ivf_deterministic_unit_norm(spark):
    df, _ = _clustered(spark)
    c1 = train_ivf(spark, df, n_centroids=8, n_iters=3)
    c2 = train_ivf(spark, df, n_centroids=8, n_iters=3)
    assert np.array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_two_level_reduce_bounds_and_values(spark):
    """Round-3 verdict #2: the partial-sum reduce must be TWO-level so
    no task holds O(n_batches) rows. Level 1 caps every cent_id at
    n_salts pre-reduced rows (the level-2 group bound); values must
    equal the plain per-centroid sums and be run-to-run identical."""
    from pyspider_spark.ops.ann import _PARTIAL_SCHEMA, _reduce_partials

    rows = []
    for b in range(100):  # 100 "Arrow batches" × 2 centroids
        for cid in (0, 1):
            rows.append((cid, b * 10, 3, [float(b), float(cid), 1.0]))
    partials = spark.createDataFrame(rows, _PARTIAL_SCHEMA)

    n_salts = 4
    lvl1 = (
        partials.withColumn(
            "salt", F.pmod(F.xxhash64(F.col("bkey")), F.lit(n_salts)).cast("int")
        )
        .groupBy("cent_id", "salt")
        .count()
        .collect()
    )
    # level-2 group size = number of level-1 rows per cent_id ≤ n_salts
    per_cent: dict[int, int] = {}
    for r in lvl1:
        per_cent[r["cent_id"]] = per_cent.get(r["cent_id"], 0) + 1
    assert all(v <= n_salts for v in per_cent.values())
    # level-1 tasks each fold ~n_batches/n_salts partials, not all 100:
    # hashed salting spreads even stride-10 bkeys (mod-salting would
    # hit only 2 of 4 classes here); allow 2x expected for hash skew
    assert all(r["count"] <= 2 * (100 // n_salts) for r in lvl1)
    assert len(per_cent) == 2 and all(v >= 3 for v in per_cent.values())

    out1 = {
        r["cent_id"]: (r["cnt"], r["vsum"])
        for r in _reduce_partials(partials, n_salts=n_salts).collect()
    }
    out2 = {
        r["cent_id"]: (r["cnt"], r["vsum"])
        for r in _reduce_partials(partials, n_salts=n_salts).collect()
    }
    assert out1 == out2  # bit-reproducible
    for cid in (0, 1):
        cnt, vsum = out1[cid]
        assert cnt == 300
        assert vsum == [float(sum(range(100))), float(cid) * 100, 100.0]


def test_ivf_assign_is_argmax(spark):
    df, _ = _clustered(spark, n_clusters=3, per_cluster=10)
    cents = train_ivf(spark, df, n_centroids=3, n_iters=2)
    got = {r["vec_id"]: r["cent_id"] for r in ivf_assign(spark, df, cents).collect()}
    for r in df.collect():
        v = _normalize(np.array(r["embedding"]).reshape(1, -1))[0]
        assert got[r["vec_id"]] == int(np.argmax(cents @ v))


def test_ivf_probe_recall_on_planted_clusters(spark):
    df, centers = _clustered(spark, n_clusters=8, per_cluster=40, eps=0.05)
    queries = spark.createDataFrame(
        [(i, centers[i].tolist()) for i in range(8)],
        "query_id long, embedding array<double>",
    )
    cents = train_ivf(spark, df, n_centroids=8, n_iters=4)
    exact = ann_topk(spark, df, queries, k=10)
    probed = ann_topk(spark, df, queries, k=10, centroids=cents, nprobe=2)
    ex = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    pr = {(r["query_id"], r["vec_id"]) for r in probed.collect()}
    recall = len(ex & pr) / len(ex)
    # tight clusters + 2-of-8 probes: the true neighbors live in the
    # query's own inverted list, so recall should be essentially total
    assert recall >= 0.95, f"recall {recall}"
    # probed path scores a subset — it can never exceed exact cosine
    exc = {(r["query_id"], r["vec_id"]): r["cosine"] for r in exact.collect()}
    for r in probed.collect():
        key = (r["query_id"], r["vec_id"])
        if key in exc:
            assert abs(r["cosine"] - exc[key]) < 1e-9


def test_ann_index_persist_and_query(spark, tmp_path):
    """jobs/ann_index: build persists centroids + cent_id-partitioned
    inverted lists (atomic INDEX.json commit); query partition-prunes
    to the probed lists and returns ROW-IDENTICAL results to the
    unpersisted IVF path."""
    import json
    import os

    import pyspark.sql.functions as F

    from jobs.ann_index import build_index, load_centroids, query_index
    from pyspider_spark.ops.ann import ann_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "ivf_idx")
    meta = build_index(spark, emb, idx, n_centroids=8, n_iters=3)
    assert meta["n_vectors"] == emb.count() and meta["n_centroids"] == 8
    # partitioned inverted lists on disk
    lists = [d for d in os.listdir(os.path.join(idx, "vectors.parquet")) if d.startswith("cent_id=")]
    assert len(lists) >= 2

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    via_index = query_index(spark, idx, queries, k=5, nprobe=3)
    cents = load_centroids(spark, idx)
    direct = ann_topk(spark, emb, queries, k=5, centroids=cents, nprobe=3)
    rows_i = sorted(map(tuple, via_index.collect()))
    rows_d = sorted(map(tuple, direct.collect()))
    assert rows_i == rows_d and len(rows_i) == 15

    # the probe scan is partition-pruned: cent_id rides the plan's
    # partition filters, not a post-scan row filter
    with open(os.path.join(idx, "INDEX.json")) as f:
        assert json.load(f)["dim"] == len(emb.first()["embedding"])
    import numpy as np

    from pyspider_spark.ops.similarity import _normalize

    qmat = _normalize(np.stack([r["embedding"] for r in queries.collect()]).astype(np.float64))
    order = np.argsort(-(qmat @ _normalize(cents.astype(np.float64)).T), axis=1, kind="stable")
    probed = sorted({int(c) for row in order[:, :3] for c in row})
    scan = spark.read.parquet(os.path.join(idx, "vectors.parquet")).filter(
        F.col("cent_id").isin(probed)
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cent_id" in plan.split("PartitionFilters")[1][:200]


def test_ann_index_add_segment(spark, tmp_path):
    """LSM-style index maintenance: `add` assigns a new batch with the
    STORED centroids, writes one new partitioned segment, and flips
    INDEX.json atomically; query reads the segment union and returns
    exactly what a fresh assign over the union would."""
    import json
    import os

    import pyspark.sql.functions as F

    from jobs.ann_index import add_to_index, build_index, load_centroids, query_index
    from pyspider_spark.ops.ann import ann_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") < 400)
    extra = emb.filter(F.col("vec_id") >= 400).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding", "label"
    )
    idx = str(tmp_path / "ivf_lsm")
    build_index(spark, base, idx, n_centroids=8, n_iters=3)
    out = add_to_index(spark, extra, idx)
    assert out["segment"] == "add_000001.parquet" and out["added"] == extra.count()
    with open(os.path.join(idx, "INDEX.json")) as f:
        meta = json.load(f)
    assert meta["segments"] == ["vectors.parquet", "add_000001.parquet"]
    assert meta["n_vectors"] == base.count() + extra.count()

    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = load_centroids(spark, idx)
    union = base.unionByName(extra)
    via_index = sorted(map(tuple, query_index(spark, idx, queries, k=5, nprobe=3).collect()))
    direct = sorted(
        map(tuple, ann_topk(spark, union, queries, k=5, centroids=cents, nprobe=3).collect())
    )
    assert via_index == direct and len(via_index) == 10
