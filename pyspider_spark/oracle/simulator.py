"""Single-threaded oracle simulator of the round semantics (SURVEY
§5.2.2).

This is a tiny re-implementation of the *reference scheduler semantics*
(``pyspider/scheduler/scheduler.py`` heap + token bucket + taskdb-dict,
``pyspider/scheduler/task_queue.py — TaskQueue``) recast as
deterministic batch rounds on the logical clock. The Spark engine must
produce the **same per-(round, host) fetch order and the same final
URL-seen membership** on the fixture crawl — that equivalence check is
the crawl-order gate (BASELINE.json:6).

Normative round semantics (THE spec — the engine mirrors it exactly):
  0. updates = injected rows ∪ follows discovered last round ∪ cron
     rows due now (F9); cancels (P5) processed first; remaining updates
     collapsed per (project, taskid) with A4 rules (max priority, min
     exetime, max age/itag, OR'd flags, min url/callback)
  1. merge into frontier: unseen → insert ACTIVE; seen → on_old_request
     restart rule (P4: force_update ∨ itag-change ∨ age elapsed).
     Keys are (project, taskid) — the reference taskdb is one table per
     project (``database/base/taskdb.py``), so the same url may be
     crawled by two projects independently.
  2. candidates: status==ACTIVE ∧ exetime<=now ∧ project schedulable
     (RUNNING/DEBUG — P2/P3/P6)
  3. robots filter (J4/S10): disallowed settle BAD, no retry
  4. per-host politeness (O1/O2): refill tokens on the logical clock,
     admit top-⌊tokens⌋ ordered by (-priority, exetime, taskid);
     host '' (data:/cron rows) bypasses the bucket
  4.5 per-project cap (J5/O2): projects with finite rate/burst admit
     at most ⌊project tokens⌋ across all hosts, in the same O1 order;
     consumption counts post-budget dispatched rows
  5. global round budget (O3): same total order, first `round_budget`
  6. host_state update — only hosts with ≥1 scheduled row:
     tokens = refilled − scheduled_count, last_ts = now (hosts with no
     admission keep their old (tokens, ts); mathematically equivalent
     refill, and bit-exact between simulator and engine)
  7. fetch (J1/S7/S8): data: → 200 inline; slow.example → 599;
     canon_url present in pages → 200; else 404
  8. extract (F5/F7) on 200 via the shared oracle extractor; follows
     become next round's updates (deferred merge)
  9. settle: 200 → SUCCESS (auto_recrawl ∧ age≥0 ⇒ ACTIVE again at
     exetime=now+age); 404/599 → retry ladder (F8) else FAILED
"""

from __future__ import annotations

import hashlib
import json
import urllib.robotparser
from dataclasses import dataclass, field, replace

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


def seen_key(project: str, canon_url: str) -> str:
    """Key of the bloom/cuckoo URL-seen set: md5(project|canon_url).
    Distinct from taskid (= md5(canon_url), F1 parity) because the
    reference scopes taskids per project table."""
    return hashlib.md5(f"{project}|{canon_url}".encode()).hexdigest()


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
    frontier: dict[tuple[str, str], Task] = field(default_factory=dict)
    cancelled: set[str] = field(default_factory=set)  # seen_keys (cuckoo shadow)
    host_tokens: dict[str, tuple[float, float]] = field(default_factory=dict)
    project_tokens: dict[str, tuple[float, float]] = field(default_factory=dict)
    paused: set[str] = field(default_factory=set)  # P6 exception-burst
    pending_follows: list[dict] = field(default_factory=list)
    schedule_log: list[dict] = field(default_factory=list)
    results: list[dict] = field(default_factory=list)
    metrics: list[dict] = field(default_factory=list)
    cron_count: dict[str, int] = field(default_factory=dict)

    @property
    def seen(self) -> set[str]:
        keys = {seen_key(t.project, t.canon_url) for t in self.frontier.values()}
        return keys - self.cancelled


# O1 total order; project is the final tiebreak so the same url crawled
# by two projects has a pinned relative order (engine uses the same key).
ORDER_KEY = lambda t: (-t.priority, t.exetime, t.taskid, t.project)  # noqa: E731


def _collapse(rows: list[dict]) -> list[dict]:
    """A4 collapse of update rows per (project, taskid)."""
    merged: dict[tuple[str, str], dict] = {}
    for r in rows:
        key = (r["project"], r["taskid"])
        m = merged.get(key)
        if m is None:
            merged[key] = dict(r)
            continue
        m["priority"] = max(m["priority"], r["priority"])
        m["exetime"] = min(m["exetime"], r["exetime"])
        m["age"] = max(m["age"], r["age"])
        if r.get("itag") is not None:
            m["itag"] = r["itag"] if m.get("itag") is None else max(m["itag"], r["itag"])
        m["force_update"] = m["force_update"] or r["force_update"]
        m["auto_recrawl"] = m["auto_recrawl"] or r["auto_recrawl"]
        m["url"] = min(m["url"], r["url"])
        m["callback"] = min(m["callback"], r["callback"])
    return [merged[k] for k in sorted(merged)]


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

    # ---- helpers ---------------------------------------------------------
    def allowed(self, host: str, url: str) -> bool:
        if not self.cfg.respect_robots or not host:
            return True
        rp = self._robots.get(host)
        return True if rp is None else rp.can_fetch("*", url)

    def _schedulable(self, project: str) -> bool:
        p = self.projects.get(project)
        return (
            bool(p)
            and p["status"] in ("RUNNING", "DEBUG")
            and project not in self.state.paused
        )

    def _norm(self, row: dict) -> dict | None:
        """Normalize an update row: canonicalize, fill defaults."""
        cu = row.get("canon_url") or canonicalize(row["url"])
        if not cu:
            return None
        return dict(
            taskid=taskid_of(cu),
            project=row.get("project") or "test_project",
            url=row["url"],
            canon_url=cu,
            host=url_host(cu),
            priority=int(row.get("priority") or 0),
            exetime=float(row.get("exetime") or 0.0),
            age=float(row["age"]) if row.get("age") is not None else -1.0,
            itag=row.get("itag"),
            force_update=bool(row.get("force_update") or False),
            auto_recrawl=bool(row.get("auto_recrawl") or False),
            callback=row.get("callback") or "index_page",
        )

    # ---- merge (steps 0-1) -------------------------------------------------
    def _merge(self, rows: list[dict], now: float, rnd: int) -> int:
        st = self.state
        cancels, updates = [], []
        for r in rows:
            n = self._norm(r)
            if n is None:
                continue
            (cancels if r.get("cancel") else updates).append(n)
        for c in cancels:
            sk = seen_key(c["project"], c["canon_url"])
            st.frontier.pop((c["project"], c["taskid"]), None)
            st.cancelled.add(sk)
        inserted = 0
        for u in _collapse(updates):
            key = (u["project"], u["taskid"])
            sk = seen_key(u["project"], u["canon_url"])
            old = st.frontier.get(key)
            if old is None or sk in st.cancelled:
                st.cancelled.discard(sk)
                st.frontier[key] = Task(
                    taskid=u["taskid"], project=u["project"], url=u["url"],
                    canon_url=u["canon_url"], host=u["host"], status=ACTIVE,
                    priority=u["priority"], retries_left=self.cfg.max_retries,
                    exetime=u["exetime"], age=u["age"], itag=u["itag"],
                    force_update=u["force_update"], auto_recrawl=u["auto_recrawl"],
                    callback=u["callback"], updatetime=now, round_added=rnd,
                )
                inserted += 1
                continue
            # on_old_request (P4)
            restart = (
                u["force_update"]
                or (u["itag"] is not None and u["itag"] != old.itag)
                or (u["age"] >= 0 and now - old.lastcrawltime >= u["age"])
            )
            if restart:
                old.status = ACTIVE
                old.priority = max(old.priority, u["priority"])
                old.exetime = u["exetime"]
                old.age = u["age"] if u["age"] >= 0 else old.age
                old.itag = u["itag"] if u["itag"] is not None else old.itag
                old.retries_left = self.cfg.max_retries
                old.auto_recrawl = u["auto_recrawl"] or old.auto_recrawl
                old.updatetime = now
        return inserted

    def _cron_rows(self, now: float) -> list[dict]:
        cfg, st = self.cfg, self.state
        out = []
        for name, p in sorted(self.projects.items()):
            tick = p.get("min_tick", 0) or 0
            if tick > 0 and self._schedulable(name) and (now - cfg.t0) >= 0:
                k = int((now - cfg.t0) // tick)
                if k > st.cron_count.get(name, -1):
                    st.cron_count[name] = k
                    out.append(dict(url=f"data:,_on_cronjob|{name}|{k}", project=name,
                                    callback="_on_cronjob"))
        return out

    # ---- one round ----------------------------------------------------------
    def run_round(self, rnd: int, inject: list[dict] | None = None) -> list[Task]:
        cfg = self.cfg
        now = cfg.now(rnd)
        st = self.state

        rows = list(inject or []) + st.pending_follows + self._cron_rows(now)
        st.pending_follows = []
        n_new = self._merge(rows, now, rnd)

        # 2. candidates
        cands = [
            t for t in st.frontier.values()
            if t.status == ACTIVE and t.exetime <= now and self._schedulable(t.project)
        ]

        # 3. robots
        passing, n_blocked = [], 0
        for t in sorted(cands, key=ORDER_KEY):
            if self.allowed(t.host, t.canon_url):
                passing.append(t)
            else:
                t.status = BAD
                t.updatetime = now
                n_blocked += 1

        # 4. per-host admission
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

        # 4.5 per-project second cap (J5): projects with finite
        # rate/burst admit at most ⌊tokens⌋ tasks this round, selected
        # in O1 order across hosts; NULL or ≥2^31 rate/burst ⇒ no cap.
        admitted.sort(key=ORDER_KEY)
        proj_tok: dict[str, float] = {}
        for name, p in sorted(self.projects.items()):
            rate, burst = p.get("rate"), p.get("burst")
            if rate is None or burst is None or rate >= 2**31 or burst >= 2**31:
                continue
            tokens, last = st.project_tokens.get(name, (float(burst), now))
            proj_tok[name] = refill_scalar(
                float(tokens), float(last), now, float(rate), float(burst)
            )
        taken: dict[str, int] = {}
        capped: list[Task] = []
        for t in admitted:
            if t.project in proj_tok:
                if taken.get(t.project, 0) >= int(proj_tok[t.project]):
                    continue
                taken[t.project] = taken.get(t.project, 0) + 1
            capped.append(t)

        # 5. global budget
        sched = capped[: cfg.round_budget]

        # project bucket consumption = post-budget dispatched counts
        per_proj_count: dict[str, int] = {}
        for t in sched:
            per_proj_count[t.project] = per_proj_count.get(t.project, 0) + 1
        for name, cnt in per_proj_count.items():
            if name in proj_tok and cnt > 0:
                st.project_tokens[name] = (proj_tok[name] - cnt, now)

        # 6. host_state update (scheduled hosts only)
        per_host_count: dict[str, int] = {}
        for t in sched:
            if t.host:
                per_host_count[t.host] = per_host_count.get(t.host, 0) + 1
        for host, cnt in per_host_count.items():
            st.host_tokens[host] = (refilled[host] - cnt, now)

        # schedule log (golden_schedule shape — FIXTURES.md §5)
        seq: dict[str, int] = {}
        for t in sched:
            s = seq.get(t.host, 0)
            seq[t.host] = s + 1
            st.schedule_log.append(
                dict(round=rnd, host=t.host, seq_in_host=s, project=t.project,
                     taskid=t.taskid, canon_url=t.canon_url, priority=t.priority)
            )

        # 7-9. fetch / extract (handler dispatch, U1/U2) / settle
        from pyspider_spark import handlers as H

        n_ok = n_fail = 0
        exceptions: dict[str, int] = {}
        for t in sched:
            if t.canon_url.startswith("data:"):
                code, html = 200, None  # payload decoded inside the handler (S8)
            elif t.host == "slow.example":
                code, html = 599, None
            elif t.canon_url in self.pages:
                code, html = 200, self.pages[t.canon_url]
            else:
                code, html = 404, None

            h = H.get(t.callback)
            res = exc = None
            if code == 200 or h.catch_status_code_error:
                try:
                    res = h.fn(html, t.canon_url)
                except Exception as e:  # processor exception (F11/P6)
                    exc = e
                    exceptions[t.project] = exceptions.get(t.project, 0) + 1
            if res is not None:
                n_ok += 1
                t.status = SUCCESS
                t.lastcrawltime = now
                t.updatetime = now
                st.results.append(
                    dict(project=t.project, taskid=t.taskid, url=t.canon_url,
                         result=json.dumps({"text_len": len(res.text),
                                            "n_links": len(res.links)}),
                         updatetime=now)
                )
                if t.auto_recrawl and t.age >= 0:
                    t.status = ACTIVE
                    t.exetime = now + t.age
                tgt = H.get(h.follow_callback)
                for link in res.links:
                    st.pending_follows.append(
                        dict(url=link, canon_url=link, project=t.project,
                             callback=h.follow_callback, priority=tgt.priority,
                             age=tgt.age)
                    )
                for mproj, payload in res.messages:
                    murl = H.message_url(payload)
                    st.pending_follows.append(
                        dict(url=murl, canon_url=murl, project=mproj,
                             callback="_on_message")
                    )
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

        # P6 — exception burst pauses the project from the next round
        for name, cnt in exceptions.items():
            p = self.projects.get(name)
            if cnt >= self.cfg.exception_limit and p and p["status"] in ("RUNNING", "DEBUG"):
                st.paused.add(name)

        st.metrics.append(
            dict(round=rnd, scheduled=len(sched), ok=n_ok, failed=n_fail,
                 robots_blocked=n_blocked, new_urls=n_new, frontier=len(st.frontier))
        )
        return sched

    def run(self, rounds: int, seeds: list[dict], inject_at: dict[int, list[dict]] | None = None):
        inject_at = dict(inject_at or {})
        inject_at[0] = list(seeds) + list(inject_at.get(0, []))
        for r in range(rounds):
            self.run_round(r, inject_at.get(r))
        return self.state


__all__ = ["Simulator", "SimState", "Task", "seen_key", "ORDER_KEY", "replace"]
