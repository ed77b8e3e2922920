"""Trustworthy device timing + runtime stopwatches.

Measurement on this stack is subtle: through the axon relay,
``block_until_ready()`` acknowledges before execution finishes, so naive
per-call timing reads dispatch latency, not compute. The only reliable sync
is a device->host readback. :func:`time_device_fn` therefore

1. chains ``iters`` executions through a data dependency (the output is
   folded back into one input), forcing sequential device execution;
2. syncs once with a scalar readback;
3. subtracts the measured relay round-trip.

Also provides the reference-style host stopwatch/statistics
(``PointMatcherSupport::timer`` + ``Histogram``, SURVEY 5: Timer.h:36-60).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import numpy as np


def _sync_scalar(x) -> float:
    import jax.numpy as jnp

    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32)))


_ROUNDTRIP_CACHE: Optional[float] = None


def relay_roundtrip(samples: int = 10) -> float:
    """Measured host<->device round-trip latency (seconds)."""
    global _ROUNDTRIP_CACHE
    if _ROUNDTRIP_CACHE is not None:
        return _ROUNDTRIP_CACHE
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda v: v + 1)
    a = jnp.ones((8,))
    _sync_scalar(f(a))
    t0 = time.perf_counter()
    for _ in range(samples):
        _sync_scalar(f(a))
    _ROUNDTRIP_CACHE = (time.perf_counter() - t0) / samples
    return _ROUNDTRIP_CACHE


def time_device_fn(fn: Callable, args: tuple, iters: int = 20) -> float:
    """Per-iteration wall seconds of ``fn(*args)`` with true serialization.

    ``fn`` must be jittable; its output is reduced to a scalar which
    perturbs the FIRST array argument on the next iteration (a no-op-sized
    nudge that defeats loop invariance and pipelining).
    """
    import jax
    import jax.numpy as jnp

    first, rest = args[0], args[1:]

    @jax.jit
    def step(x, *r):
        out = fn(x, *r)
        leaves = jax.tree.leaves(out)
        # 1e-38 (not 0.0): the algebraic simplifier must not be able to
        # sever the output->next-input dependency.
        tag = sum(
            jnp.sum(l).astype(jnp.float32) * 1e-38
            for l in leaves
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.number)
        )
        return jax.tree.map(
            lambda a: a + tag.astype(a.dtype)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.inexact)
            else a,
            x,
        ), out

    x = first
    x, out = step(x, *rest)  # compile
    _sync_scalar(jax.tree.leaves(out)[0])
    rt = relay_roundtrip()
    t0 = time.perf_counter()
    for _ in range(iters):
        x, out = step(x, *rest)
    _sync_scalar(jax.tree.leaves(out)[0])
    total = time.perf_counter() - t0 - rt
    return max(total, 0.0) / iters


class Timer:
    """Host stopwatch (≙ ``PointMatcherSupport::timer`` / open3d_slam
    ``Timer``): accumulates named durations for rolling statistics."""

    def __init__(self):
        self._t0: Dict[str, float] = {}
        self.durations: Dict[str, List[float]] = {}

    def start(self, name: str) -> None:
        self._t0[name] = time.perf_counter()

    def stop(self, name: str) -> float:
        dt = time.perf_counter() - self._t0.pop(name)
        self.durations.setdefault(name, []).append(dt)
        return dt

    def __call__(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                timer.start(name)

            def __exit__(self, *exc):
                timer.stop(name)

        return _Ctx()

    def stats(self, name: str) -> dict:
        d = np.asarray(self.durations.get(name, []))
        if len(d) == 0:
            return dict(count=0)
        return dict(
            count=len(d),
            mean_ms=float(d.mean() * 1e3),
            p50_ms=float(np.median(d) * 1e3),
            max_ms=float(d.max() * 1e3),
            hz=float(1.0 / d.mean()),
        )

    def report(self) -> str:
        lines = []
        for name in sorted(self.durations):
            s = self.stats(name)
            lines.append(
                f"{name:32s} n={s['count']:5d} mean={s['mean_ms']:8.2f}ms "
                f"p50={s['p50_ms']:8.2f}ms max={s['max_ms']:8.2f}ms ({s['hz']:.1f} Hz)"
            )
        return "\n".join(lines)


class Histogram:
    """Value-distribution collector (≙ ``pointmatcher/Histogram.h``)."""

    def __init__(self, name: str = ""):
        self.name = name
        self.values: List[float] = []

    def add(self, v: float) -> None:
        self.values.append(float(v))

    def stats(self) -> dict:
        v = np.asarray(self.values)
        if len(v) == 0:
            return dict(count=0)
        return dict(
            count=len(v), mean=float(v.mean()), std=float(v.std()),
            min=float(v.min()), p25=float(np.percentile(v, 25)),
            p50=float(np.median(v)), p75=float(np.percentile(v, 75)),
            max=float(v.max()),
        )
