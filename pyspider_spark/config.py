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
FETCH_NOT_MODIFIED = 304  # conditional refetch hit: content unchanged
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
    # NOTE on the reference's processing lease (O4, ``scheduler/
    # task_queue.py — _check_processing()``): batch rounds settle every
    # scheduled row inside the same round (the fetch join always
    # resolves to ok/fail/blocked), so an in-flight lease/requeue path
    # would be dead code here; crash-mid-round safety comes from the
    # atomic manifest commit instead (tests/test_resume.py).
    n_partitions: int = 8  # bucket(host) partition count for seen-state + frontier layout
    # partition growth policy: when the largest frontier partition
    # exceeds this row count after a round, the engine doubles
    # n_partitions via migrate_partitions (touch-only rewrites and blob
    # parallelism track corpus growth without operator action); None
    # disables auto-split — lineage still reports frontier_pid_max as
    # the manual signal. Default ON at 4M rows/partition (round-2
    # verdict "Next round" #8): a frontier partition is also a bloom/
    # cuckoo blob build domain and a compaction rewrite unit, and at
    # ~150 B/row 4M rows is a ~600 MB base file — past that, rewrite
    # cost and blob build latency stop amortizing, while 10^10 rows /
    # 4M ≈ 2 500 partitions stays well within driver bookkeeping. The
    # bench regimes (≤ 7.2 M frontier over 32 pids) never cross it, so
    # steady-state timing is unchanged; BENCH/migration_bench.json
    # shows a crossing run self-migrating with identical crawl metrics.
    max_rows_per_partition: int | None = 4_000_000
    # --- frontier merge-on-read layout (Iceberg MoR analog) ---------
    # A round appends one small delta file per touched partition
    # (changed rows only: inserts, P4 restarts, settles, cancel
    # tombstones) instead of rewriting partition bases; reads resolve
    # base ⊖ delta-keys ⊕ latest-delta. Compaction folds a partition's
    # deltas into a new base when accumulated delta rows exceed
    # `frontier_compact_frac` × live rows (0 ⇒ compact every round =
    # copy-on-write behavior), when a partition accumulates
    # `frontier_max_delta_dirs` delta files (read-amplification bound),
    # or when TOTAL outstanding delta rows exceed
    # `frontier_delta_max_keys` — the invariant that keeps the
    # resolution anti-join's broadcast side provably small.
    frontier_compact_frac: float = 0.2
    frontier_max_delta_dirs: int = 16
    frontier_delta_max_keys: int = 2_000_000
    # MoR resolve: broadcast the outstanding delta-key set only when
    # the parquet footers prove it fits this many rows; past it the
    # anti-join goes shuffle-side (a 64M-key injection round blew
    # Spark's 8 GB broadcast cap — round-4 soak). Keep this ≥
    # frontier_delta_max_keys or steady-round resolves lose the
    # broadcast plan the write-time invariant guarantees them.
    frontier_broadcast_max_keys: int = 4_000_000
    # Compaction writes each base file clustered by `exetime` in row
    # groups of at most this many bytes, so the candidates scan's
    # pushed-down `exetime <= now` predicate skips never-due row
    # groups via parquet min/max stats — the one phase that still grew
    # with frontier size after MoR (BENCH/frontier_scale_mor.json:
    # `schedule` 21 s → 37 s at 8× frontier) becomes O(due-rows) on a
    # mostly-cold frontier instead of O(frontier).
    frontier_rowgroup_bytes: int = 16 << 20
    # bloom sizing policy: m/k derived from expected keys per partition
    # and a target false-positive rate (see kernels.bloom.bloom_params);
    # partitions whose inserted-key count exceeds `bloom_expected_keys`
    # are rebuilt at 2x capacity from the frontier (the authoritative
    # key set) at the start of the next round.
    bloom_expected_keys: int = 100_000  # design capacity per partition
    bloom_target_fpr: float = 1e-3
    # no bloom seed knob: the k probe positions are sliced from the md5
    # taskid itself (kernels/bloom.py _hash_pair), deterministic by
    # construction with nothing to configure.
    cuckoo_buckets: int = 1 << 14  # per-partition cuckoo filter buckets
    # host-keyed salting for hot-domain skew is unconditional: the
    # two-phase pre-rank is a strict improvement for hot hosts and
    # costs one extra window over already-shuffled data for cold ones.
    n_salts: int = 16
    # fetch-join build side: the schedule is broadcast only when its
    # size is provably under this row bound (round_budget, or the
    # measured schedule size passed by the round driver) — an unbounded
    # schedule must not be force-collected to the driver (8 GB broadcast
    # limit); past the bound the join falls back to AQE's choice.
    fetch_broadcast_max_rows: int = 20_000_000
    # merge/settle/delta joins: the changed-rows batch (updates, merge
    # output, settle outcomes) is broadcast into the frontier-scan
    # joins only when its KNOWN row count (upd.count / staging-table
    # footers) is under this bound; above it the hints drop and AQE
    # picks the strategy — 10^8-row rounds at the 10^10 design point
    # must not force-collect the batch to the driver.
    merge_broadcast_max_rows: int = 20_000_000
    # --- fetch stage selection (S7) --------------------------------
    # "join": the sandbox's simulated fetch (left equi-join vs the
    # pages table — the driver-mandated substitution; engine/fetchx).
    # "http": the production transport-injectable HTTP stage
    # (engine/fetch_http — mapInPandas batch fetcher with redirect/
    # conditional/gzip/cookie semantics from tornado_fetcher.py).
    # Both stages emit identical columns and share the extraction
    # tail, pinned equivalent by tests/test_fetch_http.py.
    fetch_stage: str = "join"
    # transport factory "module:callable", resolved inside the Python
    # worker (a string ships with the plan; no closure pickling):
    # urllib_transport = real stdlib HTTP; file_transport = scripted
    # routes JSON (mock/replay), arg = its path.
    http_transport: str = "pyspider_spark.engine.fetch_http:urllib_transport"
    http_transport_arg: str | None = None
    http_pool: int = 20  # per-task fetch concurrency (fetcher poolsize analog)
    http_timeout: float = 120.0  # tornado_fetcher default timeout
    max_redirects: int = 5  # tornado_fetcher default max_redirects
    # body-size ceiling per fetch (tornado max_buffer_size analog):
    # caps the transport read AND the post-decompress size, so one
    # hostile/giant host can't blow an executor's Arrow batch memory.
    http_max_content: int = 64 << 20
    respect_robots: bool = True
    # robots dim join: broadcast only when the dim's row count is KNOWN
    # (parquet footers) and under this bound — a web-scale robots table
    # (10^7-10^8 hosts x ~KB of rules) must shuffle-join on host
    # instead of being force-collected to the driver. Candidates side
    # skew (hot hosts) is AQE's skew-join problem, not a broadcast's.
    robots_broadcast_max_rows: int = 1_000_000
    # S10 robots-cache expiry (``fetcher/tornado_fetcher.py —
    # ROBOTS_TXT_EXPIRE`` analog, 1 h): at round start, robots rows
    # whose fetched_ts is older than this (logical clock) are
    # re-fetched over the wire through the configured transport and
    # overlay the dim until they expire again. Live-source refresh, so
    # it only engages on the HTTP fetch stage; join-mode engines keep
    # the stat-guarded dim re-read as their refresh path. None = never
    # expire.
    robots_expiry: float | None = 3600.0
    # P6 — pause a project after this many processor exceptions in one
    # round (``scheduler/scheduler.py — EXCEPTION_LIMIT``); unpaused
    # when the projects dim changes (the reference re-enables on
    # project update).
    exception_limit: int = 3
    analyze: bool = False  # per-page text analysis in the extract pass (ops/textstats)
    # pages table urls already canonical (ingest-time column) ⇒ skip the
    # one-time canon index rewrite at engine init
    pages_precanonical: bool = False
    retry_delay: dict = field(default_factory=lambda: dict(DEFAULT_RETRY_DELAY))

    def now(self, r: int) -> float:
        return self.t0 + r * self.dt
