"""Embedding similarity ops — vectorized numpy kernels behind
mapInPandas (the training-data-pipeline ANN surface).

Brute-force all-pairs / top-k cosine is the baseline; the scale path
for 10^8+ vectors is the LSH-bucketed variant (``sim_lsh_buckets`` in
the contract: random-hyperplane buckets → pairs only within a bucket)
or IVF coarse quantization (``sim_ivf_assign``) — both already
DataFrame-shaped, so this module only carries the dense block kernel.

Scale note: ``near_dup_pairs`` broadcasts the (normalized) candidate
matrix and streams row blocks through BLAS matmul — each Spark task
compares its Arrow batch against the broadcast side, i.e. the classic
block-pairs pattern. The broadcast side must be the *smaller* relation
(here: a dim-table-sized embedding set; beyond broadcast size, swap in
the LSH/IVF pre-bucketing and run this same kernel per bucket).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _normalize(mat: np.ndarray) -> np.ndarray:
    nrm = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    nrm[nrm == 0.0] = 1.0
    return mat / nrm


def near_dup_pairs(
    spark: SparkSession, emb: DataFrame, threshold: float = 0.2
) -> DataFrame:
    """All pairs (vec_a < vec_b) with round(cosine, 6) >= threshold.

    Equivalent to the SQL self-theta-join oracle but each pair costs one
    fused BLAS multiply-add instead of an interpreted array fold.
    """
    pdf_all = emb.select("vec_id", "embedding").toPandas()
    ids_all = pdf_all["vec_id"].to_numpy(dtype=np.int64)
    bmat = _normalize(np.stack(pdf_all["embedding"].to_numpy()).astype(np.float64))
    bc = spark.sparkContext.broadcast((ids_all, bmat))

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b, mat_b = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            a = _normalize(np.stack(pdf["embedding"].to_numpy()).astype(np.float64))
            ids_a = pdf["vec_id"].to_numpy(dtype=np.int64)
            cos = np.round(a @ mat_b.T, 6)
            mask = (cos >= threshold) & (ids_a[:, None] < ids_b[None, :])
            ii, jj = np.nonzero(mask)
            yield pd.DataFrame(
                {"vec_a": ids_a[ii], "vec_b": ids_b[jj], "cosine": cos[ii, jj]}
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        fn, "vec_a bigint, vec_b bigint, cosine double"
    )


def cosine_topk(
    spark: SparkSession, emb: DataFrame, query: np.ndarray, k: int = 10
) -> DataFrame:
    """Brute-force top-k by cosine vs one query vector: per-batch numpy
    scores + per-partition top-k, merged by a tiny global sort (the
    TakeOrdered pattern — no full global sort materialization)."""
    import pyspark.sql.functions as F

    qn = _normalize(query.astype(np.float64).reshape(1, -1))[0]
    bc = spark.sparkContext.broadcast(qn)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            a = _normalize(np.stack(pdf["embedding"].to_numpy()).astype(np.float64))
            cos = np.round(a @ q, 6)
            out = pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(), "cosine": cos})
            yield out.nlargest(min(k, len(out)), "cosine")

    scored = emb.select("vec_id", "embedding").mapInPandas(
        fn, "vec_id bigint, cosine double"
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
