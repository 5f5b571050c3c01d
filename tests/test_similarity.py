"""ops/similarity — exact/approximate embedding near-dup kernels.

Round-5 focus: the LSH path's hot-bucket bound (round-4 verdict
"wrong" #2). RHP buckets are data-skewed by construction; a whole
bucket must never be one applyInPandas group. The per-bucket grid
decomposition is pinned here for both the bound (no cell ever holds
more than ~2·cell_rows rows) and exactness (output identical to the
unsplit within-bucket all-pairs the gate `sim_lsh_near_dup` proves
against its DuckDB oracle).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from pyspider_spark.ops.similarity import (
    _lsh_grid_cells,
    lsh_near_dup,
    with_rhp_buckets,
)

DIM = 8


def _emb(spark, n=120, seed=3):
    rng = np.random.default_rng(seed)
    rows = [(i, rng.standard_normal(DIM).tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lsh_grid_split_is_output_identical(spark):
    """cell_rows small enough to force splitting vs effectively-infinite
    (one cell per bucket = the pre-split behavior the gate proves):
    identical pair sets, identical cosines."""
    emb = _emb(spark)
    unsplit = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in lsh_near_dup(spark, emb, 0.2, cell_rows=10**9).collect()
    }
    split = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in lsh_near_dup(spark, emb, 0.2, cell_rows=7).collect()
    }
    assert split == unsplit and len(unsplit) > 0
    # the split actually engaged on this fixture (a bucket exceeds 7)
    b = with_rhp_buckets(emb.select("vec_id", "embedding"), 4, DIM)
    assert max(r["count"] for r in b.groupBy("bucket").count().collect()) > 7


def test_lsh_skewed_bucket_cells_bounded(spark):
    """Adversarial skew: every vector lands in ONE bucket (identical
    direction + tiny jitter). The grid must bound every cell at
    ~2·cell_rows rows, and the scored output must still be the exact
    within-bucket all-pairs set."""
    n, cell = 100, 10
    rng = np.random.default_rng(5)
    base = np.abs(rng.standard_normal(DIM)) + 1.0
    rows = [
        (i, (base + 0.001 * rng.standard_normal(DIM)).tolist()) for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bucketed = with_rhp_buckets(emb.select("vec_id", "embedding"), 4, DIM)
    assert bucketed.select("bucket").distinct().count() == 1  # skew planted
    per_cell = [
        r["n"]
        for r in _lsh_grid_cells(bucketed, cell)
        .groupBy("bucket", "bi", "bj")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert max(per_cell) <= 2 * cell
    assert len(per_cell) > 1  # the hot bucket was actually decomposed
    got = {
        (r["vec_a"], r["vec_b"])
        for r in lsh_near_dup(spark, emb, 0.9, cell_rows=cell).collect()
    }
    # near-identical vectors: every unordered pair clears cosine 0.9
    assert got == {(a, b) for a in range(n) for b in range(a + 1, n)}


def test_lsh_singleton_buckets_single_cell(spark):
    """Buckets under the cell bound pay nothing: nb == 1, one cell,
    no replication."""
    emb = _emb(spark, n=40)
    bucketed = with_rhp_buckets(emb.select("vec_id", "embedding"), 4, DIM)
    cells = _lsh_grid_cells(bucketed, 10**9)
    assert cells.count() == 40  # no row replicated
    assert cells.filter((F.col("bi") != 0) | (F.col("bj") != 0)).count() == 0


def test_embedding_keep_table_collapses_duplicates(spark):
    """embedding_keep_table: exact-duplicate vectors (cosine 1) plus a
    near-dup chain collapse to the component's min vec_id; orthogonal
    vectors keep themselves."""
    from pyspider_spark.ops.similarity import embedding_keep_table

    base = [1.0] + [0.0] * (DIM - 1)
    near = [0.999, 0.04] + [0.0] * (DIM - 2)
    ortho = [0.0, 0.0, 1.0] + [0.0] * (DIM - 3)
    emb = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (9, ortho)],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: r["dup_of"]
        for r in embedding_keep_table(spark, emb, threshold=0.9).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 9: 9}
    # the approximate (LSH) path agrees on this fixture
    out2 = {
        r["vec_id"]: r["dup_of"]
        for r in embedding_keep_table(
            spark, emb, threshold=0.9, exact=False, dim=DIM
        ).collect()
    }
    assert out2 == out


def test_embedding_incremental_absorb_and_self_dedup(spark):
    """Stage 1 absorbs a new vector into the cosine-matching old
    keeper (min keeper under multiple matches); stage 2 collapses
    new-only clusters; isolated vectors keep themselves. Checked on
    BOTH the broadcast fast path and the forced two-sided grid."""
    from pyspider_spark.ops.similarity import _cross_pairs, embedding_incremental

    d = 8

    def row(i, base, eps=0.0):
        v = [0.0] * d
        v[base] = 1.0
        v[(base + 1) % d] = eps
        return (i, v)

    state = spark.createDataFrame(
        [row(1, 0), row(10, 2)], "vec_id long, embedding array<float>"
    )
    new = spark.createDataFrame(
        [row(101, 0, 0.1),   # cosine ~0.995 vs keeper 1 → absorbed
         row(103, 4), row(104, 4, 0.05),  # new-only pair
         row(105, 6)],       # isolated
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r["dup_of"]
        for r in embedding_incremental(spark, new, state, threshold=0.9).collect()
    }
    assert out == {101: 1, 103: 103, 104: 103, 105: 105}
    # the forced grid path scores the same cross pairs as broadcast
    bc = {(r["new_id"], r["old_id"]) for r in _cross_pairs(spark, new, state, 0.9).collect()}
    grid = {
        (r["new_id"], r["old_id"])
        for r in _cross_pairs(spark, new, state, 0.9, cell_rows=2, broadcast_max_rows=0).collect()
    }
    assert bc == grid == {(101, 1)}


def test_embedding_incremental_all_absorbed_empty_rest(spark):
    """Every new vector absorbed → stage-2 runs on an EMPTY table;
    the broadcast kernel's empty guard must return no pairs instead
    of crashing np.stack."""
    from pyspider_spark.ops.similarity import embedding_incremental

    d = 4
    state = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    new = spark.createDataFrame(
        [(101, [1.0, 0.01, 0.0, 0.0]), (102, [1.0, 0.0, 0.01, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r["dup_of"]
        for r in embedding_incremental(spark, new, state, threshold=0.9).collect()
    }
    assert out == {101: 1, 102: 1}


def test_cross_pairs_broadcast_path_no_shuffle(spark):
    """The incremental state probe's headline scale property, pinned
    at the plan level: on the fast path the batch matrix rides a
    broadcast variable and the corpus-sized state STREAMS through
    mapInPandas — the physical plan contains NO Exchange at all."""
    from pyspider_spark.ops.similarity import _cross_pairs

    state = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, 0.0, 0.0]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    new = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    plan = _cross_pairs(spark, new, state, 0.9)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
