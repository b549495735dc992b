"""Tracing and step-timing instrumentation.

The reference has no profiling at all (SURVEY §5.1: tqdm bars and wall-clock
prints only).  Here profiling is first-class:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
    TensorBoard/XProf trace of device execution;
  * ``annotate(name)`` — TraceAnnotation for labeling pipeline stages;
  * ``StepTimer`` — rolling wall-clock stats (mean/p50/p95) of whatever it
    wraps, cheap enough to keep on in production loops;
  * ``device_loop_stats`` / ``device_loop_time`` — the measurement harness
    used by bench.py: N>=3 independently-salted trials, each T iterations
    inside one jitted ``lax.scan``, value-fetch synced; replays rejected by
    a physics floor (roofline / tunnel RTT), extra trials drawn on >2x
    spread, MEDIAN reported with all trials on the record.  Every clause
    exists because a benchmark lied without it (see the docstring).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, window: int = 200):
        self.window = window
        self.samples: List[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.samples.append(time.perf_counter() - self._t0)
        if len(self.samples) > self.window:
            self.samples = self.samples[-self.window:]
        return False

    def stats(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        a = np.asarray(self.samples)
        return {"mean_s": float(a.mean()), "p50_s": float(np.median(a)),
                "p95_s": float(np.percentile(a, 95)), "n": len(a)}


# A genuine dispatch through the axon tunnel costs >= ~27 ms round-trip;
# a memoized replay returns in ~us-ms.  Any non-CPU trial whose TOTAL wall
# time is under this is physically impossible and must be a replay.
_TUNNEL_FLOOR_S = 0.005

# Trial-spread threshold (max/min of plausible trials) above which extra
# trials are drawn before electing the median.
_SPREAD_LIMIT = 2.0


def _fetch(x) -> float:
    """Value-fetch sync (monkeypatchable in tests for stall injection).

    Sync by VALUE FETCH, not block_until_ready: the tunnel's
    block_until_ready can return without blocking (measured: a 230 ms
    matmul chain "blocked" in 0.1 ms and the value fetch then took
    796 ms — _roofline_probe, round 4).  Fetching the scalar is the only
    reliable barrier; its ~30-45 ms RTT is the same per-dispatch floor
    the iters>=50 guidance already covers.
    """
    return float(jax.device_get(x))


def device_loop_stats(fn: Callable[[jnp.ndarray], jnp.ndarray],
                      iters: int = 10,
                      trials: int = 3,
                      floor_s_per_iter: float = 0.0,
                      max_extra_trials: int = 4,
                      _timed: Callable[[], float] = None) -> Dict:
    """Seconds/call of ``fn(i) -> scalar`` on-device, stall/replay-proof.

    ``fn`` receives the iteration index as a traced f32 scalar and must
    return a scalar that depends on its inputs (preventing CSE).  Runs
    ``iters`` calls inside one jitted ``lax.scan`` per trial, and
    ``trials`` independently-salted trials, reporting the MEDIAN.

    Why this shape (every clause below was bought with a bad number):

    * The fixed dispatch cost through the tunnel is ~27 ms/call, divided
      across ``iters`` — use iters >= 50 when measuring ops cheaper than
      ~10 ms (a trivial (480,640) sum reads 2.7 ms at iters=10).
    * Every trial carries a RANDOM salt so it is never bit-identical to
      the warmup, to another trial, or to a PREVIOUS process run: the
      tunnel memoizes (executable, inputs) pairs and the persistent XLA
      cache makes executables byte-identical across runs — a fixed salt
      let a repeated bench.py read 66,000 fps from a replay.
    * Replays are rejected by PHYSICS, not by electing the slowest
      trial: any trial faster than ``floor_s_per_iter * iters`` (caller-
      supplied roofline, e.g. measured FLOPs / bf16 peak) or, on a
      non-CPU backend, faster than the ~27 ms tunnel RTT, is discarded
      and redrawn.  Round 4's max-of-2 "trust the slower" guard turned
      ONE tunnel stall into an official 2.091 fps record for a 108 fps
      system (BENCH_r04 vs chip_report_r4) — a slow outlier must lose
      to the median, never win.
    * If surviving trials still spread > 2x, extra trials (up to
      ``max_extra_trials``) are drawn so one stall among three cannot
      drag even the median; all trials are reported for the record.

    Returns a dict: ``s_per_iter`` (median of plausible trials),
    ``trials_s`` (accepted trial wall times), ``rejected_replay_s``
    (below the physics floor), ``rejected_stall_s`` (>5x the peer
    median), ``spread`` (max/min of accepted), ``suspect`` (None, or
    "replay"/"spread" when the record needs a skeptical eye), ``iters``.
    """
    if _timed is None:
        @jax.jit
        def run(salt):
            acc, _ = jax.lax.scan(lambda c, i: (c + fn(i), None), salt,
                                  jnp.arange(iters, dtype=jnp.float32) + salt)
            return acc

        import random
        s0 = random.random()
        run(jnp.float32(s0)).block_until_ready()

        def _timed():
            t0 = time.perf_counter()
            _fetch(run(jnp.float32(s0 + 1.0 + random.random())))
            return time.perf_counter() - t0

    floor_total = floor_s_per_iter * iters
    if jax.default_backend() != "cpu":
        floor_total = max(floor_total, _TUNNEL_FLOOR_S)

    accepted: List[float] = []
    rejected: List[float] = []
    budget = trials + max_extra_trials
    while budget > 0:
        t = _timed()
        budget -= 1
        (rejected if t < floor_total else accepted).append(t)
        if len(accepted) >= trials:
            spread = max(accepted) / max(min(accepted), 1e-12)
            if spread <= _SPREAD_LIMIT:
                break

    suspect = None
    if not accepted:
        # Every trial read below the physics floor: either the floor is
        # wrong or the backend replays everything — surface, don't hide.
        accepted = rejected
        rejected = []
        suspect = "replay"
    # Symmetric stall rejection: a trial >5x the median of its peers is
    # a tunnel stall, not a measurement (the median is robust, so this
    # cannot recreate the trust-the-fast pathology).  Rejected stalls
    # stay on the record like rejected replays do.
    med = float(np.median(accepted))
    stalls = [t for t in accepted if t > 5.0 * med]
    if stalls and len(stalls) < len(accepted):
        accepted = [t for t in accepted if t <= 5.0 * med]
    else:
        stalls = []
    spread = max(accepted) / max(min(accepted), 1e-12)
    if suspect is None and spread > _SPREAD_LIMIT:
        suspect = "spread"

    return {
        "s_per_iter": float(np.median(accepted)) / iters,
        "trials_s": [round(t, 6) for t in accepted],
        "rejected_replay_s": [round(t, 6) for t in rejected],
        "rejected_stall_s": [round(t, 6) for t in stalls],
        "spread": round(spread, 3),
        "suspect": suspect,
        "iters": iters,
    }


def device_loop_time(fn: Callable[[jnp.ndarray], jnp.ndarray],
                     iters: int = 10,
                     trials: int = 3,
                     floor_s_per_iter: float = 0.0) -> float:
    """Median seconds per call of ``fn(i) -> scalar`` measured on-device.

    Thin float-returning wrapper over :func:`device_loop_stats` (see its
    docstring for the trial/replay/stall methodology).
    """
    return device_loop_stats(fn, iters=iters, trials=trials,
                             floor_s_per_iter=floor_s_per_iter)["s_per_iter"]
