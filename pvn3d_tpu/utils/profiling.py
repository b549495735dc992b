"""Tracing and step-timing instrumentation.

The reference has no profiling at all (SURVEY §5.1: tqdm bars and wall-clock
prints only).  Here profiling is first-class:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
    TensorBoard/XProf trace of device execution;
  * ``annotate(name)`` — TraceAnnotation for labeling pipeline stages;
  * ``StepTimer`` — rolling wall-clock stats (mean/p50/p95) of whatever it
    wraps, cheap enough to keep on in production loops;
  * ``device_loop_time`` — the measurement harness used by bench.py: runs a
    fn T times inside one jitted ``lax.scan`` with an iteration-dependent
    perturbation so dispatch latency and caching cannot distort the number.
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


def device_loop_time(fn: Callable[[jnp.ndarray], jnp.ndarray],
                     iters: int = 10) -> float:
    """Mean seconds per call of ``fn(i) -> scalar`` measured on-device.

    ``fn`` receives the iteration index as a traced f32 scalar and must
    return a scalar that depends on its inputs (preventing CSE).

    The fixed dispatch cost through the axon tunnel is ~27 ms/call and is
    divided across ``iters`` — use iters >= 50 when measuring ops cheaper
    than ~10 ms or the floor dominates (measured: a trivial (480,640) sum
    reads 2.7 ms at iters=10, 0.27 ms at iters=100).

    The timed dispatch carries a RANDOM salt input so it is never
    bit-identical to the warmup dispatch, or to any dispatch of a
    PREVIOUS process run: the tunnel memoizes same-input calls of the
    same executable, and with the persistent XLA cache the executable is
    byte-identical across runs — a fixed salt let a repeated bench.py
    read 66,000 fps from a memoized replay (a same-process replay reads
    ~3 us/iter; caught live twice).
    """
    @jax.jit
    def run(salt):
        acc, _ = jax.lax.scan(lambda c, i: (c + fn(i), None), salt,
                              jnp.arange(iters, dtype=jnp.float32) + salt)
        return acc

    import random
    s0 = random.random()
    run(jnp.float32(s0)).block_until_ready()

    def timed():
        # Sync by VALUE FETCH, not block_until_ready: the tunnel's
        # block_until_ready can return without blocking (measured: a
        # 230 ms matmul chain "blocked" in 0.1 ms and the value fetch
        # then took 796 ms — _roofline_probe, round 4).  Fetching the
        # scalar is the only reliable barrier; its ~30-45 ms RTT is the
        # same per-dispatch floor the iters>=50 guidance already covers.
        t0 = time.perf_counter()
        float(jax.device_get(
            run(jnp.float32(s0 + 1.0 + random.random()))))
        return time.perf_counter() - t0

    t1 = timed()
    # Replay guard: a random salt defeats the tunnel's same-input
    # memoization in principle, but a one-off replay artifact was still
    # observed (bench.py --batch 4 read 257,000 fps once, round 4).  A
    # second independently-salted dispatch cannot replay the first; if
    # the two disagree by >5x, trust the slower one.
    t2 = timed()
    if max(t1, t2) > 5.0 * min(t1, t2):
        return max(t1, t2) / iters
    return 0.5 * (t1 + t2) / iters
