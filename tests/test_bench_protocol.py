"""Protocol-shape tests for bench.py's scaling harness.

These drive ``run_scaling`` with a stubbed subprocess so the leg
ordering and min-of-repeats reduction are pinned without a Ray
session: the real measurement is expensive (~30 min) and host-noise
dependent, but the protocol logic itself must stay deterministic.
"""

from __future__ import annotations

import json

import bench


class _FakeProc:
    def __init__(self, stdout: str):
        self.stdout = stdout


def _fake_subprocess(calls, leg_secs):
    """Return a subprocess.run stand-in emitting canned bench lines."""

    def fake_run(cmd, **kw):
        if cmd[0] == "ray":  # the inter-leg `ray stop --force`
            return _FakeProc("")
        ncpu = int(kw["env"]["RAY_GRAFT_CPUS"])
        calls.append(ncpu)
        rep = sum(1 for c in calls if c == ncpu)
        val = leg_secs[ncpu][rep - 1]
        fetches = 1_937_129
        out = {
            "value": val,
            "queries": {"crawl": val * 0.9, "processor_chain": val * 0.1},
            "crawl_pages_per_sec": round(fetches / (val * 0.9), 1),
            "headline_pages_per_sec": round(fetches / val, 1),
        }
        return _FakeProc(json.dumps(out))

    return fake_run


def test_run_scaling_interleaves_legs_and_takes_min(monkeypatch):
    calls: list[int] = []
    leg_secs = {8: [500.0, 480.0], 32: [160.0, 150.0]}
    monkeypatch.setattr(bench.subprocess, "run", _fake_subprocess(calls, leg_secs))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    res = bench.run_scaling()

    # alternating 8/32 samples both parallelism levels from the same
    # host-noise windows (see BASELINE.md round-5 protocol note)
    assert calls == [8, 32, 8, 32]
    # min-of-repeats per leg, all repeats reported
    assert res["runs_8"] == [500.0, 480.0]
    assert res["runs_32"] == [160.0, 150.0]
    assert res["sec_8"] == 480.0
    assert res["sec_32"] == 150.0
    # throughputs take the per-metric best across repeats
    assert res["crawl_pages_per_sec_8"] == round(1_937_129 / (480.0 * 0.9), 1)
    # efficiency = (T32/T8) / (32/8)
    expected = round(
        (res["crawl_pages_per_sec_32"] / res["crawl_pages_per_sec_8"]) / 4.0, 3
    )
    assert res["scaling_efficiency"] == expected
    assert res["headline_scaling_efficiency"] == round(
        (res["headline_pages_per_sec_32"] / res["headline_pages_per_sec_8"]) / 4.0, 3
    )


def test_run_scaling_single_repeat(monkeypatch):
    calls: list[int] = []
    leg_secs = {8: [400.0], 32: [100.0]}
    monkeypatch.setattr(bench.subprocess, "run", _fake_subprocess(calls, leg_secs))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    res = bench.run_scaling(repeats=1)

    assert calls == [8, 32]
    assert res["sec_8"] == 400.0 and res["sec_32"] == 100.0
    # perfect 4x speedup -> efficiency 1.0
    assert res["scaling_efficiency"] == 1.0
