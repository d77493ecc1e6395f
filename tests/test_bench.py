"""Unit tests for bench.py's orchestration layer.

The bench artifact is the driver's only window into per-round performance
(the reference's own yardstick, c++/bpmf.cpp:193-198); rounds 1-2 lost the
flagship number to rc=124 timeouts, so the rc-0 / headline-always-prints /
diagnosable-marker contract is load-bearing and gets pinned here.  The
measurement legs themselves are exercised on the real TPU via
scripts/tpu_measure_queue.sh; these tests cover only the (pure-host)
subprocess plumbing and fallback routing.
"""

import json
import sys

import pytest

sys.path.insert(0, ".")

import bench


def test_run_leg_unknown_leg_is_error_marker():
    d = bench.run_leg("nonsense", timeout_s=120.0, cpu=True)
    assert d["skipped"] == "leg_error"
    assert d["leg"] == "nonsense"
    assert d["rc"] != 0


def test_run_leg_timeout_is_timeout_marker():
    # 1 s is far below interpreter+jax startup: the subprocess is killed
    d = bench.run_leg("ml1m", timeout_s=1.0, cpu=True)
    assert d == {"skipped": "leg_timeout", "leg": "ml1m", "timeout_s": 1.0}


def _parse_lines(text: str) -> list[dict]:
    return [json.loads(line) for line in text.strip().splitlines()]


def test_main_headline_prints_even_when_every_leg_fails(monkeypatch, capsys):
    """A dead platform + failing legs must still produce the one-line
    headline contract (value 0, rc 0) instead of dying."""
    monkeypatch.setattr(bench, "tpu_reachable",
                        lambda timeout_s=150.0: "tpu_unreachable")
    # a dead probe is retried until half the budget is spent — shrink the
    # budget so the fallback is immediate
    monkeypatch.setattr(bench, "BUDGET_S", 0.01)
    monkeypatch.setattr(
        bench,
        "run_leg",
        lambda leg, timeout_s, cpu, env_overrides=None:
            {"skipped": "leg_timeout", "leg": leg},
    )
    bench.main()
    out = _parse_lines(capsys.readouterr().out)
    assert len(out) == 1
    assert out[0]["value"] == 0.0
    assert out[0]["vs_baseline"] == 0.0
    assert out[0]["unit"] == "items/sec"
    # a degraded headline is self-explaining without the stderr details
    assert out[0]["platform"] == "cpu (tpu_unreachable)"


def test_main_salvages_midrun_wedge_with_cpu_leg(monkeypatch, capsys):
    """TPU probe ok, then the leg hangs (tunnel wedged mid-run): the
    primary is retried on CPU and the result is marked, secondaries are
    skipped with the marker as reason."""
    calls = []

    def fake_run_leg(leg, timeout_s, cpu, env_overrides=None):
        calls.append((leg, cpu))
        if not cpu:
            return {"skipped": "leg_timeout", "leg": leg}
        return {"items_per_sec": 1000.0, "backend": "cpu"}

    monkeypatch.setattr(bench, "tpu_reachable",
                        lambda timeout_s=150.0: "tpu")
    monkeypatch.setattr(bench, "run_leg", fake_run_leg)
    bench.main()
    assert calls == [("ml1m", False), ("ml1m", True)]
    out = _parse_lines(capsys.readouterr().out)
    assert out[0]["value"] == 1000.0
    assert out[0]["vs_baseline"] > 0


def test_main_happy_path_runs_secondaries(monkeypatch, capsys):
    legs = []

    def fake_run_leg(leg, timeout_s, cpu, env_overrides=None):
        legs.append(leg)
        assert not cpu
        assert timeout_s > 60
        return {"items_per_sec": 5e6, "backend": "tpu"}

    monkeypatch.setattr(bench, "tpu_reachable",
                        lambda timeout_s=150.0: "tpu")
    monkeypatch.setattr(bench, "run_leg", fake_run_leg)
    monkeypatch.delenv("BENCH_FAST", raising=False)
    bench.main()
    assert legs == ["ml1m", "chembl", "ml25m_full"]
    out = _parse_lines(capsys.readouterr().out)
    assert out[0]["value"] == 5e6


@pytest.fixture(autouse=True)
def _reset_budget_clock(monkeypatch):
    """main() measures remaining budget from module import time — reset the
    clock per test so earlier (slow) tests can't eat this one's budget."""
    import time

    monkeypatch.setattr(bench, "T0", time.time())
    monkeypatch.setattr(bench, "BUDGET_S", 720.0)


def test_tpu_reachable_retry_recovers_midbudget(monkeypatch):
    """A transient wedge that clears before half the budget is spent must
    NOT forfeit the round to CPU (round-3's single t=0 probe did)."""
    seq = iter(["tpu_unreachable", "tpu_unreachable", "tpu"])
    sleeps = []
    monkeypatch.setattr(bench, "tpu_reachable",
                        lambda timeout_s=150.0: next(seq))
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    monkeypatch.setattr(bench, "BUDGET_S", 1e9)
    assert bench.tpu_reachable_retry() == "tpu"
    assert len(sleeps) == 2


def test_tpu_reachable_retry_gives_up_past_half_budget(monkeypatch):
    monkeypatch.setattr(bench, "tpu_reachable",
                        lambda timeout_s=150.0: "tpu_unreachable")
    monkeypatch.setattr(bench, "BUDGET_S", 0.01)
    assert bench.tpu_reachable_retry() == "tpu_unreachable"
