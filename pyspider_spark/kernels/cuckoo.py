"""Cuckoo filter — the deletion-safe shadow of the URL-seen bloom
(SURVEY §2.3 J3; BASELINE.json:6).

The reference allows re-crawl after taskdb rows are deleted/reset
(``webui`` delete, ``schedule.cancel`` — ``pyspider/scheduler/
scheduler.py — on_old_request()`` cancel branch, ``database/base/
taskdb.py — drop()``). Blooms can't delete, so membership in our build
is: ``bloom(taskid) ∧ ¬cuckoo_deleted(taskid)`` — cancelled/reset
taskids are *inserted into* this filter to mark them re-crawlable.

Standard cuckoo filter (Fan et al. 2014, public): b=4 slots/bucket,
16-bit fingerprints, partial-key cuckoo hashing. Bucket count must be a
power of two. Hashes sliced from the md5-hex taskid (same convention as
bloom.py) so everything is deterministic.
"""

from __future__ import annotations

import numpy as np

from .bloom import _hash_pair

_SLOTS = 4
_FP_MULT = np.uint64(0x5BD1E9955BD1E995)
_MAX_KICKS = 500


class CuckooFilter:
    __slots__ = ("n_buckets", "table", "_rng_state")

    def __init__(self, n_buckets: int, table: np.ndarray | None = None):
        if n_buckets & (n_buckets - 1):
            raise ValueError("n_buckets must be a power of two")
        self.n_buckets = n_buckets
        self.table = (
            table if table is not None else np.zeros((n_buckets, _SLOTS), dtype=np.uint16)
        )
        # deterministic eviction-slot selector (counter, not random)
        self._rng_state = 0

    # --- hashing --------------------------------------------------------
    def _fp_and_index(self, taskids) -> tuple[np.ndarray, np.ndarray]:
        hp = _hash_pair(taskids)
        fp = (hp[:, 1] & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 is the empty sentinel
        i1 = (hp[:, 0] % np.uint64(self.n_buckets)).astype(np.int64)
        return fp, i1

    def _alt_index(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = fp.astype(np.uint64) * _FP_MULT
        return (i.astype(np.uint64) ^ h).astype(np.uint64) % np.uint64(self.n_buckets)

    # --- single-key ops (deletion/cancel path is low-volume) ------------
    def insert(self, taskid: str) -> bool:
        fp_a, i1_a = self._fp_and_index([taskid])
        fp, i1 = int(fp_a[0]), int(i1_a[0])
        i2 = int(self._alt_index(np.array([i1]), np.array([fp], dtype=np.uint16))[0])
        for idx in (i1, i2):
            row = self.table[idx]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        idx = i1
        for _ in range(_MAX_KICKS):
            slot = self._rng_state % _SLOTS
            self._rng_state += 1
            fp, self.table[idx, slot] = int(self.table[idx, slot]), fp
            idx = int(
                self._alt_index(np.array([idx]), np.array([fp], dtype=np.uint16))[0]
            )
            row = self.table[idx]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        return False  # table full — caller should grow/flag

    def delete(self, taskid: str) -> bool:
        fp_a, i1_a = self._fp_and_index([taskid])
        fp, i1 = int(fp_a[0]), int(i1_a[0])
        i2 = int(self._alt_index(np.array([i1]), np.array([fp], dtype=np.uint16))[0])
        for idx in (i1, i2):
            row = self.table[idx]
            hit = np.where(row == fp)[0]
            if len(hit):
                row[hit[0]] = 0
                return True
        return False

    # --- vectorized membership (the hot path inside applyInPandas) ------
    def contains_many(self, taskids) -> np.ndarray:
        if len(taskids) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1 = self._fp_and_index(taskids)
        i2 = self._alt_index(i1, fp).astype(np.int64)
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    # --- serialization ---------------------------------------------------
    def to_bytes(self) -> bytes:
        header = np.array([self.n_buckets], dtype="<u8").tobytes()
        return header + self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        n = int(np.frombuffer(blob[:8], dtype="<u8")[0])
        table = np.frombuffer(blob[8:], dtype=np.uint16).reshape(n, _SLOTS).copy()
        return cls(n, table)
