"""Engine constants and round configuration.

Mirrors (semantically) the reference's scheduler constants:
- status enum: ``pyspider/database/base/taskdb.py — class TaskDB (~L15-25)``
- retry delays: ``pyspider/scheduler/scheduler.py — DEFAULT_RETRY_DELAY (~L45-55)``
- LOOP_LIMIT batching: ``pyspider/scheduler/scheduler.py (~L40-50)``
- token bucket (rate, burst): ``pyspider/scheduler/token_bucket.py — Bucket``
"""

from __future__ import annotations

from dataclasses import dataclass, field

# --- task status enum (taskdb.py) -------------------------------------
ACTIVE = 1
SUCCESS = 2
FAILED = 3
BAD = 4

STATUS_NAMES = {ACTIVE: "ACTIVE", SUCCESS: "SUCCESS", FAILED: "FAILED", BAD: "BAD"}

# --- retry delay map (scheduler.py DEFAULT_RETRY_DELAY) ----------------
# retried-count -> seconds until next attempt; the '' key is the default.
DEFAULT_RETRY_DELAY = {0: 30, 1: 3600, 2: 21600, 3: 43200, "": 86400}
DEFAULT_RETRIES = 3

# --- fetch status codes used by the simulated fetcher -------------------
FETCH_OK = 200
FETCH_NOT_FOUND = 404
FETCH_TIMEOUT = 599  # tornado_fetcher uses 599 for connection/timeout errors
FETCH_ROBOTS_BLOCKED = 403


@dataclass(frozen=True)
class RoundConfig:
    """Deterministic configuration for one crawl run.

    The logical clock is ``now(r) = t0 + r * dt`` — replaces the
    reference's wall-clock ``time.time()`` so bucket refill, exetime,
    retry and age arithmetic are exactly reproducible (SURVEY §4.3.4).
    """

    t0: float = 1_767_225_600.0  # 2026-01-01T00:00:00Z
    dt: float = 1.0  # seconds of logical time per round
    rate: float = 1.0  # token-bucket refill tokens/sec per host
    burst: float = 10.0  # token-bucket capacity per host
    round_budget: int | None = 100_000  # global cap per round (LOOP_LIMIT analog); None = unbounded
    max_retries: int = DEFAULT_RETRIES
    lease: float = 600.0  # processing lease seconds (O4)
    n_partitions: int = 8  # bucket(host) partition count for seen-state
    bloom_bits: int = 1 << 20  # per-partition bloom size (m)
    bloom_k: int = 7
    bloom_seed: int = 42
    cuckoo_buckets: int = 1 << 14  # per-partition cuckoo filter buckets
    hot_host_threshold: int = 50_000  # rows/host above which salting kicks in
    n_salts: int = 16
    respect_robots: bool = True
    analyze: bool = False  # per-page text analysis in the extract pass (ops/textstats)
    # pages table urls already canonical (ingest-time column) ⇒ skip the
    # one-time canon index rewrite at engine init
    pages_precanonical: bool = False
    retry_delay: dict = field(default_factory=lambda: dict(DEFAULT_RETRY_DELAY))

    def now(self, r: int) -> float:
        return self.t0 + r * self.dt
