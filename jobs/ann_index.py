"""Persisted IVF index over an embeddings table — the production
shape of the similarity-search surface (train once, probe many):

    spark-submit --py-files dist/pyspider_spark.zip jobs/ann_index.py \
        build --embeddings <dir> --index <dir> [--centroids 16] [--iters 5]
    spark-submit ... jobs/ann_index.py \
        query --index <dir> --queries <dir> --out <dir> [--k 10] [--nprobe 4]

``build`` trains the RNG-free spherical k-means (ops/ann.train_ivf),
assigns every vector, and writes the index directory:

- ``centroids.parquet`` — (cent_id, centroid array<double>)
- ``vectors.parquet``   — (vec_id, embedding) **partitioned by
  cent_id**: the on-disk inverted lists
- ``INDEX.json``        — params + row counts (atomic os.replace
  commit, same pattern as the crawl manifest: a crashed build leaves
  no committed index; rebuilds are idempotent)

``query`` loads the centroids (C rows — dim-table), derives each
query's ``nprobe`` nearest lists driver-side, and scans ONLY the
union of probed partitions (Spark partition pruning on cent_id —
at 10^9 vectors with C=4096 lists and nprobe=8, the probe reads
~0.2 % of the corpus instead of all of it), then runs the exact
ops/ann.ann_topk kernel over the pruned scan. The result is
row-identical to the unpersisted IVF path (pinned in
tests/test_ann.py) because rows outside the probed union are masked
for every query anyway.

``add`` appends a batch as a new LSM-style segment (assigned with the
STORED centroids — no retrain; rebuild when the distribution drifts);
the segment list flips atomically with INDEX.json. Single writer per
index dir, like the crawl manifest and the dedup state.

Reference parity: pyspider has no vector search; this is
training-data-pipeline surface mandated by the brief (SURVEY §2.11).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_index(
    spark,
    emb,
    index_dir: str,
    n_centroids: int = 16,
    n_iters: int = 5,
) -> dict:
    """Train + assign + persist; returns the committed INDEX.json dict."""
    import pyspark.sql.functions as F

    from pyspider_spark.ops.ann import ivf_assign, train_ivf

    os.makedirs(index_dir, exist_ok=True)
    cents = train_ivf(spark, emb, n_centroids=n_centroids, n_iters=n_iters)
    dim = int(cents.shape[1])
    cent_rows = [(i, [float(x) for x in cents[i]]) for i in range(len(cents))]
    spark.createDataFrame(
        cent_rows, "cent_id int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(index_dir, "centroids.parquet")
    )
    assigned = ivf_assign(spark, emb, cents).select("vec_id", "cent_id")
    (
        emb.select("vec_id", "embedding")
        .join(assigned, "vec_id")
        # one exchange clusters each inverted list's rows into its own
        # partition directory — the probe-time pruning unit
        .repartition(F.col("cent_id"))
        .write.mode("overwrite")
        .partitionBy("cent_id")
        .parquet(os.path.join(index_dir, "vectors.parquet"))
    )
    meta = {
        "n_centroids": int(len(cents)),
        "dim": dim,
        "n_vectors": int(emb.count()),
        "n_iters": int(n_iters),
        # LSM-style segment list (the frontier-MoR pattern applied to
        # the index): `add` appends new cent_id-partitioned segments
        # and flips this list atomically; query reads the union with
        # the same partition pruning
        "segments": ["vectors.parquet"],
    }
    tmp = os.path.join(index_dir, "INDEX.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, "INDEX.json"))
    return meta


def add_to_index(spark, emb, index_dir: str) -> dict:
    """Append a batch of new vectors WITHOUT retraining: assign them
    to the existing centroids, write one new cent_id-partitioned
    segment, and flip INDEX.json atomically (a crashed add leaves the
    committed index unchanged; the re-run overwrites the same
    uncommitted segment dir — idempotent). Centroids drift is the
    operator's trade: rebuild when the corpus distribution moves."""
    import pyspark.sql.functions as F

    from pyspider_spark.ops.ann import ivf_assign

    with open(os.path.join(index_dir, "INDEX.json")) as f:
        meta = json.load(f)
    cents = load_centroids(spark, index_dir)
    segments = list(meta.get("segments", ["vectors.parquet"]))
    seg = f"add_{len(segments):06d}.parquet"
    assigned = ivf_assign(spark, emb, cents).select("vec_id", "cent_id")
    (
        emb.select("vec_id", "embedding")
        .join(assigned, "vec_id")
        .repartition(F.col("cent_id"))
        .write.mode("overwrite")
        .partitionBy("cent_id")
        .parquet(os.path.join(index_dir, seg))
    )
    n_new = int(emb.count())
    meta["segments"] = segments + [seg]
    meta["n_vectors"] = int(meta["n_vectors"]) + n_new
    tmp = os.path.join(index_dir, "INDEX.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, "INDEX.json"))
    return {"segment": seg, "added": n_new, **meta}


def load_centroids(spark, index_dir: str):
    import numpy as np

    rows = (
        spark.read.parquet(os.path.join(index_dir, "centroids.parquet"))
        .orderBy("cent_id")
        .collect()
    )
    return np.stack([r["centroid"] for r in rows])


def query_index(spark, index_dir: str, queries, k: int = 10, nprobe: int = 4):
    """Top-k per query over the persisted index, partition-pruned to
    the union of every query's nprobe nearest lists."""
    import numpy as np
    import pyspark.sql.functions as F

    from pyspider_spark.ops.ann import _normalize, ann_topk

    with open(os.path.join(index_dir, "INDEX.json")) as f:
        meta = json.load(f)
    cents = load_centroids(spark, index_dir)
    nprobe = min(nprobe, len(cents))
    qrows = queries.select("query_id", "embedding").collect()
    if not qrows:
        from pyspider_spark.engine import schema as S

        return S.empty_df(
            spark, "query_id bigint, vec_id bigint, cosine double, rnk int"
        )
    qmat = _normalize(
        np.stack([r["embedding"] for r in qrows]).astype(np.float64)
    )
    if qmat.shape[1] != int(meta["dim"]):
        raise ValueError(
            f"query dim {qmat.shape[1]} != index dim {meta['dim']} ({index_dir})"
        )
    order = np.argsort(-(qmat @ _normalize(cents.astype(np.float64)).T), axis=1, kind="stable")
    probed = sorted({int(c) for row in order[:, :nprobe] for c in row})
    # one partitioned read per segment (multi-root partition discovery
    # conflicts), each pruned to the probed lists, unioned
    scans = [
        spark.read.parquet(os.path.join(index_dir, s)).filter(
            F.col("cent_id").isin(probed)  # partition-pruned per segment
        )
        for s in meta.get("segments", ["vectors.parquet"])
    ]
    scan = scans[0]
    for s in scans[1:]:
        scan = scan.unionByName(s)
    return ann_topk(spark, scan, queries, k=k, centroids=cents, nprobe=nprobe)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build")
    b.add_argument("--embeddings", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--centroids", type=int, default=16)
    b.add_argument("--iters", type=int, default=5)
    b.add_argument("--cores", type=int, default=None)
    a = sub.add_parser("add")
    a.add_argument("--embeddings", required=True)
    a.add_argument("--index", required=True)
    a.add_argument("--cores", type=int, default=None)
    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--queries", required=True, help="parquet with (query_id, embedding)")
    q.add_argument("--out", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--nprobe", type=int, default=4)
    q.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspider_spark.engine.session import get_spark

    spark = get_spark(cores=args.cores, app_name=f"ann_index_{args.cmd}")
    if args.cmd == "build":
        emb = spark.read.parquet(args.embeddings)
        meta = build_index(
            spark, emb, args.index, n_centroids=args.centroids, n_iters=args.iters
        )
        print(json.dumps({"built": args.index, **meta}))
        return 0
    if args.cmd == "add":
        emb = spark.read.parquet(args.embeddings)
        out = add_to_index(spark, emb, args.index)
        print(json.dumps(out))
        return 0
    queries = spark.read.parquet(args.queries)
    res = query_index(spark, args.index, queries, k=args.k, nprobe=args.nprobe)
    res.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"out": args.out, "rows": n, "k": args.k, "nprobe": args.nprobe}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
