"""Single-threaded oracle simulator of the round semantics (SURVEY
§5.2.2).

This is a tiny re-implementation of the *reference scheduler semantics*
(``pyspider/scheduler/scheduler.py`` heap + token bucket + taskdb-dict,
``pyspider/scheduler/task_queue.py — TaskQueue``) recast as
deterministic batch rounds on the logical clock. The Spark engine must
produce the **same per-(round, host) fetch order and the same final
URL-seen membership** on the fixture crawl — that equivalence check is
the crawl-order gate (BASELINE.json:6).

Normative round semantics (shared spec, engine mirrors exactly):
  1. candidates = frontier rows: status==ACTIVE ∧ exetime<=now ∧
     project schedulable (RUNNING/DEBUG — P2/P3/P6)
  2. robots filter (J4/S10): disallowed rows settle as BAD, no retry
  3. per-host politeness (O1/O2): refill tokens on logical clock,
     admit top-⌊tokens⌋ ordered by (-priority, exetime, taskid)
     — taskid tiebreak replaces heap-FIFO (SURVEY §7.3.1);
     hosts '' (data:/cron rows) bypass the bucket
  4. global round budget (O3): same total order, first `round_budget`
  5. host_state update: tokens = refilled − actually_scheduled
  6. fetch (J1/S7/S8): data: → 200 inline; slow.example → 599;
     canon_url present in pages → 200; else 404
  7. extract (F5/F7) on 200 via the shared oracle extractor
  8. settle: 200 → SUCCESS (auto_recrawl+age ⇒ back to ACTIVE at
     now+age); 404/599 → retry ladder (F8) else FAILED
  9. follows: within-round collapse by taskid (A4: max priority, min
     exetime), then URL-seen check (J2/J3: in-taskdb ∧ ¬cancelled);
     unseen → insert ACTIVE; seen → on_old_request restart rule (P4)
 10. cron (F9): projects with min_tick>0 emit a data: row each time
     (now − t0) crosses a tick boundary
"""

from __future__ import annotations

import json
import urllib.robotparser
from dataclasses import dataclass, field

from pyspider_spark.config import (
    ACTIVE,
    BAD,
    FAILED,
    SUCCESS,
    RoundConfig,
)
from pyspider_spark.kernels.bucket import refill_scalar
from pyspider_spark.kernels.canon import canonicalize, taskid_of, url_host
from pyspider_spark.oracle.extractor import extract_page


@dataclass
class Task:
    taskid: str
    project: str
    url: str
    canon_url: str
    host: str
    status: int = ACTIVE
    priority: int = 0
    retries_left: int = 3
    exetime: float = 0.0
    age: float = -1.0
    itag: str | None = None
    force_update: bool = False
    auto_recrawl: bool = False
    callback: str = "index_page"
    lastcrawltime: float = 0.0
    updatetime: float = 0.0
    round_added: int = 0


@dataclass
class SimState:
    frontier: dict[str, Task] = field(default_factory=dict)
    cancelled: set[str] = field(default_factory=set)  # cuckoo shadow
    host_tokens: dict[str, tuple[float, float]] = field(default_factory=dict)
    schedule_log: list[dict] = field(default_factory=list)
    results: list[dict] = field(default_factory=list)
    metrics: list[dict] = field(default_factory=list)
    cron_count: dict[str, int] = field(default_factory=dict)

    @property
    def seen(self) -> set[str]:
        return set(self.frontier) - self.cancelled


ORDER_KEY = lambda t: (-t.priority, t.exetime, t.taskid)  # noqa: E731 — O1 total order


class Simulator:
    def __init__(self, cfg: RoundConfig, pages: dict[str, bytes], robots: dict[str, str],
                 projects: dict[str, dict]):
        """pages: canon_url -> html bytes; robots: host -> robots_txt;
        projects: name -> {status, rate, burst, min_tick}."""
        self.cfg = cfg
        self.pages = pages
        self.projects = projects
        self._robots: dict[str, urllib.robotparser.RobotFileParser] = {}
        for host, txt in robots.items():
            rp = urllib.robotparser.RobotFileParser()
            rp.parse((txt or "").splitlines())
            self._robots[host] = rp
        self.state = SimState()

    # ---- robots ---------------------------------------------------------
    def allowed(self, host: str, url: str) -> bool:
        if not self.cfg.respect_robots or not host:
            return True
        rp = self._robots.get(host)
        if rp is None:
            return True
        return rp.can_fetch("*", url)

    def _schedulable(self, project: str) -> bool:
        p = self.projects.get(project)
        return bool(p) and p["status"] in ("RUNNING", "DEBUG")

    # ---- task admission (new vs old — steps 9 / P4) ----------------------
    def submit(self, t: Task, now: float, rnd: int) -> None:
        old = self.state.frontier.get(t.taskid)
        if old is None or t.taskid in self.state.cancelled:
            self.state.cancelled.discard(t.taskid)
            t.updatetime = now
            t.round_added = rnd
            self.state.frontier[t.taskid] = t
            return
        # on_old_request (scheduler.py ~L380-440): restart iff force_update
        # OR itag changed OR (age>=0 AND now-lastcrawltime>=age)
        restart = (
            t.force_update
            or (t.itag is not None and t.itag != old.itag)
            or (t.age >= 0 and now - old.lastcrawltime >= t.age)
        )
        if restart:
            old.status = ACTIVE
            old.priority = max(old.priority, t.priority)
            old.exetime = t.exetime
            old.age = t.age if t.age >= 0 else old.age
            old.itag = t.itag if t.itag is not None else old.itag
            old.retries_left = self.cfg.max_retries
            old.auto_recrawl = t.auto_recrawl or old.auto_recrawl
            old.updatetime = now

    def cancel(self, taskid: str) -> None:
        """P5: remove + mark re-crawlable (cuckoo insert)."""
        if taskid in self.state.frontier:
            del self.state.frontier[taskid]
        self.state.cancelled.add(taskid)

    def seed_task(self, row: dict, rnd: int) -> Task | None:
        cu = canonicalize(row["url"])
        if not cu:
            return None
        return Task(
            taskid=taskid_of(cu),
            project=row.get("project", "test_project"),
            url=row["url"],
            canon_url=cu,
            host=url_host(cu),
            priority=int(row.get("priority", 0)),
            retries_left=self.cfg.max_retries,
            exetime=float(row.get("exetime", 0.0)),
            age=float(row.get("age", -1.0)),
            itag=row.get("itag"),
            force_update=bool(row.get("force_update", False)),
            auto_recrawl=bool(row.get("auto_recrawl", False)),
            callback=row.get("callback", "index_page"),
            round_added=rnd,
        )

    # ---- one round --------------------------------------------------------
    def run_round(self, rnd: int, inject: list[dict] | None = None) -> list[Task]:
        cfg = self.cfg
        now = cfg.now(rnd)
        st = self.state

        for row in inject or []:
            if row.get("cancel"):
                cu = canonicalize(row["url"])
                self.cancel(taskid_of(cu))
                continue
            t = self.seed_task(row, rnd)
            if t is not None:
                self.submit(t, now, rnd)

        # cron rows (F9)
        for name, p in sorted(self.projects.items()):
            tick = p.get("min_tick", 0) or 0
            if tick > 0 and self._schedulable(name):
                k = int((now - cfg.t0) // tick)
                if k > st.cron_count.get(name, -1) and (now - cfg.t0) >= 0:
                    st.cron_count[name] = k
                    url = f"data:,_on_cronjob|{name}|{k}"
                    t = Task(
                        taskid=taskid_of(url), project=name, url=url, canon_url=url,
                        host="", callback="_on_cronjob", round_added=rnd,
                        retries_left=cfg.max_retries,
                    )
                    self.submit(t, now, rnd)

        # 1. candidates
        cands = [
            t for t in st.frontier.values()
            if t.status == ACTIVE and t.exetime <= now and self._schedulable(t.project)
        ]

        # 2. robots
        passing = []
        for t in sorted(cands, key=ORDER_KEY):
            if self.allowed(t.host, t.canon_url):
                passing.append(t)
            else:
                t.status = BAD
                t.updatetime = now

        # 3. per-host admission
        by_host: dict[str, list[Task]] = {}
        for t in passing:
            by_host.setdefault(t.host, []).append(t)
        admitted: list[Task] = []
        refilled: dict[str, float] = {}
        for host, ts in by_host.items():
            if host == "":
                admitted.extend(ts)  # cron/data rows bypass the bucket
                continue
            tokens, last = st.host_tokens.get(host, (cfg.burst, now))
            tok = refill_scalar(tokens, last, now, cfg.rate, cfg.burst)
            refilled[host] = tok
            admitted.extend(ts[: int(tok)])

        # 4. global budget
        admitted.sort(key=ORDER_KEY)
        sched = admitted[: cfg.round_budget]

        # 5. host_state update
        per_host_count: dict[str, int] = {}
        for t in sched:
            if t.host:
                per_host_count[t.host] = per_host_count.get(t.host, 0) + 1
        for host, tok in refilled.items():
            st.host_tokens[host] = (tok - per_host_count.get(host, 0), now)

        # schedule log (golden_schedule shape — FIXTURES.md §5)
        seq: dict[str, int] = {}
        for t in sched:
            s = seq.get(t.host, 0)
            seq[t.host] = s + 1
            st.schedule_log.append(
                dict(round=rnd, host=t.host, seq_in_host=s, taskid=t.taskid,
                     canon_url=t.canon_url, priority=t.priority)
            )

        # 6-8. fetch / extract / settle
        n_ok = n_fail = 0
        for t in sched:
            if t.canon_url.startswith("data:"):
                code, html = 200, t.canon_url.split(",", 1)[-1].encode()
            elif t.host == "slow.example":
                code, html = 599, None
            elif t.canon_url in self.pages:
                code, html = 200, self.pages[t.canon_url]
            else:
                code, html = 404, None

            if code == 200:
                n_ok += 1
                ext = extract_page(html, t.canon_url) if not t.canon_url.startswith("data:") \
                    else extract_page(b"", t.canon_url)
                t.status = SUCCESS
                t.lastcrawltime = now
                t.updatetime = now
                st.results.append(
                    dict(project=t.project, taskid=t.taskid, url=t.canon_url,
                         result=json.dumps({"text_len": len(ext.text),
                                            "n_links": len(ext.links)}),
                         updatetime=now)
                )
                if t.auto_recrawl and t.age >= 0:
                    t.status = ACTIVE
                    t.exetime = now + t.age
                # 9. follows — collapse then submit
                collapsed: dict[str, Task] = {}
                for link in ext.links:
                    tid = taskid_of(link)
                    if tid in collapsed:
                        continue
                    collapsed[tid] = Task(
                        taskid=tid, project=t.project, url=link, canon_url=link,
                        host=url_host(link), retries_left=self.cfg.max_retries,
                        round_added=rnd,
                    )
                for f in collapsed.values():
                    self.submit(f, now, rnd)
            else:
                n_fail += 1
                t.updatetime = now
                retried = self.cfg.max_retries - t.retries_left
                if t.retries_left > 0:
                    t.retries_left -= 1
                    delay = self.cfg.retry_delay.get(retried, self.cfg.retry_delay[""])
                    t.exetime = now + delay
                else:
                    t.status = FAILED

        st.metrics.append(
            dict(round=rnd, scheduled=len(sched), ok=n_ok, failed=n_fail,
                 frontier=len(st.frontier))
        )
        return sched

    def run(self, rounds: int, seeds: list[dict], inject_at: dict[int, list[dict]] | None = None):
        inject_at = dict(inject_at or {})
        inject_at.setdefault(0, [])
        inject_at[0] = list(seeds) + list(inject_at[0])
        for r in range(rounds):
            self.run_round(r, inject_at.get(r))
        return self.state
