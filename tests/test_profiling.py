"""Stall/replay-proof measurement harness (utils/profiling.py).

Round-4 lesson: the official BENCH_r04 record read 2.091 fps for a
108 fps system because the old max-of-2 "trust the slower" replay guard
elected one tunnel stall as the measurement.  These tests pin the new
contract: the MEDIAN of >=3 salted trials wins, replays are rejected by
a physics floor (never by electing the slowest), stalls are rejected by
a robust-median test, and every rejection stays on the record.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from pvn3d_tpu.utils.profiling import device_loop_stats, device_loop_time


def _fake_timer(seq):
    it = iter(seq)

    def timed():
        try:
            return next(it)
        except StopIteration:  # pragma: no cover - budget bug guard
            pytest.fail("harness drew more trials than its budget")
    return timed


def test_one_stall_cannot_shift_the_median():
    # The BENCH_r04 failure mode: one 50x-slow stalled fetch among good
    # trials.  The old harness returned the stall; the new one must
    # return the healthy median and put the stall on the record.
    seq = [0.10, 5.0, 0.10, 0.11, 0.10, 0.09, 0.10]
    s = device_loop_stats(None, iters=10, trials=3, _timed=_fake_timer(seq))
    assert s["s_per_iter"] == pytest.approx(0.10 / 10, rel=0.15)
    assert s["rejected_stall_s"] == [5.0]
    assert s["suspect"] is None


def test_replay_rejected_by_physics_floor_not_by_electing_slowest():
    # A memoized replay reads ~us; the floor rejects it and a fresh
    # trial is drawn.  The slow trials must NOT win — the median of the
    # plausible ones does.
    seq = [0.0001, 0.10, 0.11, 0.10]
    s = device_loop_stats(None, iters=10, trials=3,
                          floor_s_per_iter=0.005,  # 0.05 s total floor
                          _timed=_fake_timer(seq))
    assert s["rejected_replay_s"] == [0.0001]
    assert s["s_per_iter"] == pytest.approx(0.10 / 10, rel=0.15)
    assert s["suspect"] is None


def test_all_replays_flags_suspect_instead_of_hiding():
    seq = [0.0001] * 7
    s = device_loop_stats(None, iters=10, trials=3,
                          floor_s_per_iter=0.005, _timed=_fake_timer(seq))
    assert s["suspect"] == "replay"
    # The value is still reported (median of what was seen), loudly.
    assert s["s_per_iter"] == pytest.approx(0.0001 / 10)


def test_persistent_spread_flags_suspect():
    # Trials that never settle (alternating 3x apart, no single outlier
    # the stall filter can name) must flag "spread", not pick a side.
    seq = [0.10, 0.30, 0.10, 0.30, 0.10, 0.30, 0.10]
    s = device_loop_stats(None, iters=10, trials=3, _timed=_fake_timer(seq))
    assert s["suspect"] == "spread"
    assert len(s["trials_s"]) == 7  # exhausted its retry budget


def test_clean_trials_stop_at_n():
    seq = [0.10, 0.101, 0.099]
    s = device_loop_stats(None, iters=5, trials=3, _timed=_fake_timer(seq))
    assert len(s["trials_s"]) == 3
    assert s["suspect"] is None
    assert s["spread"] <= 1.1


def test_injected_fetch_stall_cannot_shift_reported_value(monkeypatch):
    # End-to-end version with a REAL jitted loop: one value-fetch stalls
    # (sleep injected at the _fetch seam) and the reported number must
    # not move materially.
    import time

    import pvn3d_tpu.utils.profiling as prof

    real_fetch = prof._fetch
    calls = {"n": 0}

    def stalling_fetch(x):
        calls["n"] += 1
        if calls["n"] == 2:          # stall exactly one timed trial
            time.sleep(1.0)
        return real_fetch(x)

    monkeypatch.setattr(prof, "_fetch", stalling_fetch)
    s = device_loop_stats(lambda i: jnp.sum(i * 2.0), iters=4, trials=3)
    assert s["s_per_iter"] < 0.25    # the 1 s stall did not win
    assert calls["n"] >= 3


def test_device_loop_time_float_wrapper():
    dt = device_loop_time(lambda i: i * 2.0, iters=4)
    assert np.isfinite(dt) and dt >= 0
