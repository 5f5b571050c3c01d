"""Oracle simulator behavior — reimplements the assertions of the
reference's tests/test_scheduler.py + test_task_queue.py scenarios
(SURVEY §5.1/§5.2) against the round semantics spec."""

from pyspider_spark.config import ACTIVE, BAD, FAILED, SUCCESS, RoundConfig
from pyspider_spark.kernels.canon import canonicalize, taskid_of
from pyspider_spark.oracle.extractor import extract_page
from pyspider_spark.oracle.simulator import Simulator, seen_key


def fkey(u, project="test_project"):
    return (project, taskid_of(canonicalize(u)))

T0 = 1_767_225_600.0
PROJECTS = {"test_project": {"status": "RUNNING", "rate": 1.0, "burst": 10.0, "min_tick": 0}}


def mkpages(urls, links=()):
    """canon_url -> html with given hrefs."""
    anchors = "".join(f'<a href="{u}">x</a>' for u in links)
    return {canonicalize(u): f"<html><body>page {u} {anchors}</body></html>".encode()
            for u in urls}


def cfg(**kw):
    kw.setdefault("burst", 10.0)
    kw.setdefault("rate", 1.0)
    return RoundConfig(t0=T0, dt=1.0, **kw)


def seeds(*urls, **kw):
    return [dict(url=u, **kw) for u in urls]


def test_new_task_scheduled_and_duplicates_ignored():
    pages = mkpages(["http://a.example/p/0"])
    sim = Simulator(cfg(), pages, {}, PROJECTS)
    st = sim.run(1, seeds("http://a.example/p/0",
                          "http://a.example/p/0",
                          "http://A.EXAMPLE:80/p/0#top"))
    assert len(st.schedule_log) == 1
    assert st.schedule_log[0]["canon_url"] == "http://a.example/p/0"
    assert st.frontier[("test_project", st.schedule_log[0]["taskid"])].status == SUCCESS


def test_priority_order_within_host():
    urls = [f"http://a.example/p/{i}" for i in range(5)]
    sim = Simulator(cfg(), mkpages(urls), {}, PROJECTS)
    rows = [dict(url=u, priority=p) for u, p in zip(urls, [1, 9, 5, 9, 0])]
    sim.run(1, rows)
    got = [e["canon_url"] for e in sim.state.schedule_log]
    # 9s first (taskid tiebreak), then 5, 1, 0
    assert [u.rsplit("/", 1)[1] for u in got[:2]] in (["1", "3"], ["3", "1"])
    assert got[2].endswith("/2") and got[3].endswith("/0") and got[4].endswith("/4")


def test_token_bucket_limits_per_round():
    urls = [f"http://a.example/p/{i}" for i in range(30)]
    sim = Simulator(cfg(burst=4.0, rate=2.0), mkpages(urls), {}, PROJECTS)
    sim.run(3, seeds(*urls))
    per_round = {}
    for e in sim.state.schedule_log:
        per_round.setdefault(e["round"], 0)
        per_round[e["round"]] += 1
    assert per_round[0] == 4          # burst
    assert per_round[1] == 2          # rate*dt
    assert per_round[2] == 2


def test_exetime_gate_future_task_waits():
    u = "http://a.example/p/0"
    sim = Simulator(cfg(), mkpages([u]), {}, PROJECTS)
    sim.run(3, [dict(url=u, exetime=T0 + 2.0)])
    rounds = [e["round"] for e in sim.state.schedule_log]
    assert rounds == [2]


def test_robots_blocked_is_bad_no_retry():
    urls = ["http://a.example/p/1", "http://a.example/q/1"]
    robots = {"a.example": "User-agent: *\nDisallow: /p/"}
    sim = Simulator(cfg(), mkpages(urls), robots, PROJECTS)
    st = sim.run(2, seeds(*urls))
    scheduled = {e["canon_url"] for e in st.schedule_log}
    assert scheduled == {"http://a.example/q/1"}
    blocked = st.frontier[fkey("http://a.example/p/1")]
    assert blocked.status == BAD


def test_retry_ladder_then_failed():
    u = "http://a.example/missing"
    delays = {0: 1, 1: 2, 2: 3, "": 5}
    c = RoundConfig(t0=T0, dt=1.0, max_retries=2, retry_delay=delays)
    sim = Simulator(c, {}, {}, PROJECTS)
    st = sim.run(6, seeds(u))
    t = st.frontier[fkey(u)]
    rounds = [e["round"] for e in st.schedule_log]
    # round0: fail (retried=0, delay 1) → round1 eligible; fail (retried=1,
    # delay 2) → round3; retries exhausted → FAILED
    assert rounds == [0, 1, 3]
    assert t.status == FAILED


def test_404_retries_and_success_has_lastcrawltime():
    ok = "http://a.example/p/0"
    sim = Simulator(cfg(), mkpages([ok]), {}, PROJECTS)
    st = sim.run(1, seeds(ok, "http://a.example/missing"))
    assert st.frontier[fkey(ok)].lastcrawltime == T0
    missing = st.frontier[fkey("http://a.example/missing")]
    assert missing.status == ACTIVE and missing.exetime == T0 + 30


def test_slow_host_timeout():
    sim = Simulator(cfg(), {}, {}, PROJECTS)
    st = sim.run(1, seeds("http://slow.example/p/0"))
    t = st.frontier[fkey("http://slow.example/p/0")]
    assert t.status == ACTIVE and t.exetime > T0  # 599 → retry path


def test_follows_extracted_and_deduped():
    root = "http://a.example/p/0"
    pages = mkpages([root], links=["/p/1", "/p/1", "p/2", "http://b.example/x#f"])
    sim = Simulator(cfg(), pages, {}, PROJECTS)
    st = sim.run(2, seeds(root))
    scheduled = {e["canon_url"] for e in st.schedule_log}
    assert scheduled == {
        root, "http://a.example/p/1", "http://a.example/p/p/2", "http://b.example/x",
    }
    # byte-identity: extractor output is the golden text
    ext = extract_page(pages[canonicalize(root)], root)
    assert ext.links[0] == "http://a.example/p/1"


def test_force_update_restart_and_age_restart():
    u = "http://a.example/p/0"
    sim = Simulator(cfg(), mkpages([u]), {}, PROJECTS)
    sim.run(1, seeds(u))
    assert sim.state.frontier[fkey(u)].status == SUCCESS
    # re-inject without force → ignored
    sim.run_round(1, seeds(u))
    assert sim.state.frontier[fkey(u)].status == SUCCESS
    # re-inject with force_update → restart → recrawled same round
    sim.run_round(2, [dict(url=u, force_update=True)])
    t = sim.state.frontier[fkey(u)]
    assert t.status == SUCCESS and t.lastcrawltime == T0 + 2
    # age-based restart: age=1, lastcrawltime=round2 → restart at round 5
    sim.run_round(5, [dict(url=u, age=1.0)])
    t = sim.state.frontier[fkey(u)]
    assert t.status == SUCCESS and t.lastcrawltime == T0 + 5
    assert [e["round"] for e in sim.state.schedule_log] == [0, 2, 5]


def test_itag_change_restarts():
    u = "http://a.example/p/0"
    sim = Simulator(cfg(), mkpages([u]), {}, PROJECTS)
    sim.run(1, [dict(url=u, itag="v1")])
    assert sim.state.frontier[fkey(u)].status == SUCCESS
    sim.run_round(1, [dict(url=u, itag="v1")])  # same itag → no restart
    assert sim.state.frontier[fkey(u)].status == SUCCESS
    sim.run_round(2, [dict(url=u, itag="v2")])  # changed → restart+recrawl
    assert [e["round"] for e in sim.state.schedule_log] == [0, 2]


def test_cancel_allows_recrawl():
    u = "http://a.example/p/0"
    sim = Simulator(cfg(), mkpages([u]), {}, PROJECTS)
    sim.run(1, seeds(u))
    sk = seen_key("test_project", canonicalize(u))
    assert sk in sim.state.seen
    sim.run_round(1, [dict(url=u, cancel=True)])
    assert sk not in sim.state.seen
    sim.run_round(2, seeds(u))  # re-crawl allowed
    assert sim.state.frontier[fkey(u)].status == SUCCESS
    assert [e["round"] for e in sim.state.schedule_log] == [0, 2]


def test_auto_recrawl():
    u = "http://a.example/p/0"
    sim = Simulator(cfg(), mkpages([u]), {}, PROJECTS)
    st = sim.run(7, [dict(url=u, auto_recrawl=True, age=3.0)])
    rounds = [e["round"] for e in st.schedule_log]
    assert rounds == [0, 3, 6]


def test_stopped_project_excluded():
    projects = dict(PROJECTS, stopped={"status": "STOP", "rate": 1, "burst": 10, "min_tick": 0})
    u = "http://a.example/p/0"
    sim = Simulator(cfg(), mkpages([u]), {}, projects)
    st = sim.run(1, [dict(url=u, project="stopped")])
    assert st.schedule_log == []


def test_cron_emission():
    projects = {"cronp": {"status": "RUNNING", "rate": 1, "burst": 10, "min_tick": 3.0}}
    sim = Simulator(cfg(), {}, {}, projects)
    st = sim.run(7, [])
    cron = [e for e in st.schedule_log if e["canon_url"].startswith("data:")]
    assert [e["round"] for e in cron] == [0, 3, 6]
    # data: rows fetch inline and succeed
    assert all(st.frontier[(e["project"], e["taskid"])].status == SUCCESS for e in cron)


def test_global_round_budget():
    urls = [f"http://h{i}.example/p/0" for i in range(20)]
    sim = Simulator(cfg(round_budget=5), mkpages(urls), {}, PROJECTS)
    sim.run_round(0, seeds(*urls))
    assert len(sim.state.schedule_log) == 5
