"""engine/round.cron_due_rows — the F9 cron kernel (standalone so the
contract gate drives the same decision the round loop does)."""

from __future__ import annotations

from pyspider_spark.engine.round import cron_due_rows


def _proj(tick, status="RUNNING"):
    return {"min_tick": tick, "status": status}


def test_due_iff_tick_index_advances():
    proj = {"a": _proj(60), "b": _proj(600), "c": _proj(7200)}
    rows, state = cron_due_rows(proj, {}, now=1000.0, t0=0.0)
    # a: k=16, b: k=1, c: 1000//7200=0 > -1 → due with k=0
    assert [(n, int(u.rsplit("|", 1)[1])) for u, n, _ in rows] == [
        ("a", 16), ("b", 1), ("c", 0),
    ]
    assert state == {"a": 16, "b": 1, "c": 0}
    # same now again: nothing advanced → nothing due, state unchanged
    rows2, state2 = cron_due_rows(proj, state, now=1000.0, t0=0.0)
    assert rows2 == [] and state2 == state
    # advance past a's next tick only
    rows3, _ = cron_due_rows(proj, state, now=1030.0, t0=0.0)
    assert [n for _, n, _ in rows3] == ["a"]


def test_gates_paused_status_and_zero_tick():
    proj = {
        "run": _proj(60),
        "stopped": _proj(60, status="STOP"),
        "paused": _proj(60),
        "no_tick": _proj(0),
        "none_tick": {"min_tick": None, "status": "RUNNING"},
    }
    rows, _ = cron_due_rows(proj, {}, now=120.0, t0=0.0, paused={"paused"})
    assert [n for _, n, _ in rows] == ["run"]
    # pre-epoch clock emits nothing
    assert cron_due_rows(proj, {}, now=-1.0, t0=0.0)[0] == []


def test_row_shape_is_cron_task():
    rows, _ = cron_due_rows({"p": _proj(30)}, {}, now=95.0, t0=0.0)
    (url, name, cb) = rows[0]
    assert url == "data:,_on_cronjob|p|3" and name == "p" and cb == "_on_cronjob"
