"""Profiling / per-stage timing (the reference's tracing subsystem, §5).

Replaces the ad-hoc ``perf_counter`` + ``torch.cuda.synchronize`` brackets
(selective_rcnn.py:46-76, selective_rpn.py:55-85,
standard_rcnn_tracker_test.py:111-118) with:

* :class:`StageTimer` — named stages timed with ``block_until_ready``;
* :func:`trace` — context manager around ``jax.profiler`` producing
  TensorBoard-loadable traces;
* :func:`benchmark` — warmup + timed repeats of a jitted callable with
  memoization-proof chaining (feeds a data-dependent scalar back into each
  call, required on remote/tunneled backends).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp


class StageTimer:
    """Accumulates wall-clock per named stage; device-synchronized."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result_ref: list | None = None):
        t0 = time.perf_counter()
        yield
        if result_ref:
            jax.block_until_ready(result_ref[0])
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def timed(self, name: str, fn: Callable) -> Callable:
        def wrapped(*args, **kwargs):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*args, **kwargs))
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            return out

        return wrapped

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: total {total * 1e3:.2f} ms, {n} calls, avg {total / n * 1e3:.2f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(fn: Callable[[Any, jax.Array], jax.Array], example: Any, iters: int = 10, warmup: int = 1) -> float:
    """Seconds per call of ``fn(example, seed)``.

    ``fn`` must fold the uint32 ``seed`` into its computation and return an
    array from which the next seed is derived — making every call unique and
    serially dependent, so backends that memoize repeated executions (e.g.
    remote tunnels) measure honestly.
    """
    seed = jnp.uint32(1)
    for _ in range(warmup):
        out = fn(example, seed)
        seed = (jnp.asarray(out).ravel()[0].astype(jnp.uint32) % 251) + 1
    jax.block_until_ready(seed)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(example, seed)
        seed = (jnp.asarray(out).ravel()[0].astype(jnp.uint32) % 251) + 1
    jax.block_until_ready(seed)
    return (time.perf_counter() - t0) / iters
