"""Partitioned URL-seen membership: bloom + cuckoo blobs per
bucket(host) partition, probed/updated inside applyInPandas (SURVEY
§2.3 J2/J3, §4.3.1).

Replaces the reference's per-task ``taskdb.get_task`` point lookup
(``pyspider/scheduler/scheduler.py — _check_request()``): at 10^10-URL
scale there are no point lookups — each round's update batch is grouped
by partition id, the partition's two blobs are loaded once, membership
is evaluated vectorized, new keys are folded in, and the mutated blobs
are written back from the executor (per-partition lineage goes to the
manifest).

Membership rule: ``seen = bloom(k) ∧ ¬cuckoo(k)`` — cancelled keys are
*inserted into* the cuckoo shadow to become re-crawlable; re-inserting
such a key deletes it from the cuckoo again (deletion-safe re-crawl,
BASELINE.json:6). Bloom false positives are resolved downstream by an
anti-join against the frontier (no false negatives ⇒ only bloom hits
need the join).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from pyspider_spark.config import RoundConfig
from pyspider_spark.kernels.bloom import BloomFilter
from pyspider_spark.kernels.cuckoo import CuckooFilter

PROBE_SCHEMA = StructType(
    [
        StructField("project", StringType()),
        StructField("taskid", StringType()),
        StructField("pid", IntegerType()),
        StructField("seen", BooleanType()),
        StructField("cancel", BooleanType()),
    ]
)


def bloom_path(d: str, pid: int) -> str:
    return os.path.join(d, f"bloom_{pid:05d}.bin")


def cuckoo_path(d: str, pid: int) -> str:
    return os.path.join(d, f"cuckoo_{pid:05d}.bin")


def probe_and_update(
    updates: DataFrame,
    blob_paths: dict[int, tuple[str | None, str | None]],
    out_dir: str,
    cfg: RoundConfig,
) -> DataFrame:
    """updates cols: project, taskid, seen_k, pid, cancel.

    Returns (project, taskid, pid, seen, cancel): non-cancel rows carry
    the membership verdict; cancel rows are echoed with cancel=True so
    the round can account for them without a separate action. Side
    effect per group: writes updated bloom/cuckoo blobs to out_dir
    (deterministic content ⇒ safe under Spark task retry/recompute).
    """
    bits, k = cfg.bloom_bits, cfg.bloom_k
    n_buckets = cfg.cuckoo_buckets

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        bpath, cpath = blob_paths.get(pid, (None, None))
        if bpath and os.path.exists(bpath):
            bloom = BloomFilter.from_bytes(open(bpath, "rb").read())
        else:
            bloom = BloomFilter(bits, k)
        if cpath and os.path.exists(cpath):
            cuckoo = CuckooFilter.from_bytes(open(cpath, "rb").read())
        else:
            cuckoo = CuckooFilter(n_buckets)

        # cancels first (deterministic: sorted). Skip keys whose
        # fingerprint is already shadowed — the simulator's `cancelled`
        # is a set, so double-cancel must not double-insert (a later
        # single delete would otherwise leave a stale copy).
        cancels = pdf[pdf["cancel"]].sort_values("seen_k")
        c_keys = cancels["seen_k"].tolist()
        already = cuckoo.contains_many(c_keys)
        for sk, a in zip(c_keys, already):
            if not a:
                cuckoo.insert(sk)

        ups = pdf[~pdf["cancel"]].sort_values("seen_k").reset_index(drop=True)
        keys = ups["seen_k"].tolist()
        in_bloom = bloom.contains_many(keys)
        in_cuckoo = cuckoo.contains_many(keys)
        seen = in_bloom & ~in_cuckoo
        new_mask = ~seen
        new_keys = [kk for kk, m in zip(keys, new_mask) if m]
        bloom.add_many(new_keys)
        # re-inserted cancelled keys: restore bloom authority
        for kk, m, c in zip(keys, new_mask, in_cuckoo):
            if m and c:
                cuckoo.delete(kk)

        os.makedirs(out_dir, exist_ok=True)
        tmp_b = bloom_path(out_dir, pid) + ".tmp"
        with open(tmp_b, "wb") as f:
            f.write(bloom.to_bytes())
        os.replace(tmp_b, bloom_path(out_dir, pid))
        tmp_c = cuckoo_path(out_dir, pid) + ".tmp"
        with open(tmp_c, "wb") as f:
            f.write(cuckoo.to_bytes())
        os.replace(tmp_c, cuckoo_path(out_dir, pid))

        out = pd.DataFrame(
            {
                "project": ups["project"],
                "taskid": ups["taskid"],
                "pid": pid,
                "seen": pd.Series(seen, dtype=bool),
                "cancel": False,
            }
        )
        if len(cancels):
            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        {
                            "project": cancels["project"],
                            "taskid": cancels["taskid"],
                            "pid": pid,
                            "seen": False,
                            "cancel": True,
                        }
                    ),
                ],
                ignore_index=True,
            )
        return out

    return updates.groupBy("pid").applyInPandas(fn, schema=PROBE_SCHEMA)
