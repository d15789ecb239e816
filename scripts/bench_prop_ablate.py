#!/usr/bin/env python
"""Pallas proposals kernel cost attribution on the real TPU.

Stages (cumulative): dma_only -> +integral (ii_only) -> +all score maps
(score_only) -> +dilation (no_topk) -> +top-k (full).

Usage: python scripts/bench_prop_ablate.py [modes...]
"""

import sys
import time

import numpy as np

REPO = __file__.rsplit("/scripts/", 1)[0]
sys.path.insert(0, REPO)


def timed(step, buf, iters=16, warmup=2):
    for _ in range(warmup):
        buf = step(buf)
    _ = float(buf.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        buf = step(buf)
    _ = float(buf.reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from apse_uav_tpu.aruco import pallas_proposals as pprop
    from apse_uav_tpu.aruco.detector import DetectorParams

    modes = sys.argv[1:] or ["dma_only", "ii_only", "score_only", "no_topk", "full"]
    on_tpu = jax.devices()[0].platform == "tpu"
    print("platform:", jax.devices()[0].platform)
    w, h, batch, iters = (3840, 2160, 8, 16) if on_tpu else (1280, 736, 2, 2)

    rng = np.random.default_rng(0)
    gray0 = jnp.asarray(rng.integers(0, 255, (batch, h, w), dtype=np.uint8))
    p = DetectorParams()

    def report(name, dt):
        print(f"{name:12s} {dt / batch * 1e3:7.2f} ms/frame   ({batch / dt:7.1f} fps)", flush=True)

    for m in modes:
        @jax.jit
        def s_run(g, m=m):
            c, s, v, ok = pprop.proposals_batched(g, p, interpret=not on_tpu, debug_mode=m)
            t = c.sum() + s.sum() + v.sum()
            return g + (t.astype(jnp.int32).astype(jnp.uint8) | jnp.uint8(1))

        report(m, timed(s_run, gray0, iters))


if __name__ == "__main__":
    main()
