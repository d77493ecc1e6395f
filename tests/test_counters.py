"""Hierarchical counters (the BPMF_COUNTER analog, c++/counters.h)."""

import time

from bpmf_tpu.utils.counters import Counters, tick


def test_hierarchical_scopes():
    c = Counters(enabled=True)
    with c.scope("main"):
        with c.scope("movies"):
            time.sleep(0.01)
        with c.scope("users"):
            time.sleep(0.01)
    assert "main" in c.hier and "main/movies" in c.hier
    assert c.hier["main"] >= c.hier["main/movies"] + c.hier["main/users"]
    assert c.flat["movies"] > 0
    rep = c.report()
    assert "movies" in rep and "%parent" in rep


def test_disabled_is_free():
    c = Counters(enabled=False)
    with c.scope("x"):
        pass
    assert not c.hier and c.report() == ""


def test_sync_hook_called():
    calls = []
    c = Counters(enabled=True)
    with c.scope("s", sync=lambda: calls.append(1)):
        pass
    assert calls == [1]


def test_tick_monotonic():
    a = tick()
    b = tick()
    assert b >= a
