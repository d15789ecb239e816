#!/usr/bin/env python
"""Isolate the backbone fwd vs backward cost in the training step.

The round-5 nomask ablation (BENCH_train_r05.json) implies backbone
backward costs ~236 ms/step (batch 4, 768x1344, bf16) against a ~19 ms
forward — 12x, where conv backward should be ~2-3x forward.  This script
times (a) backbone forward, (b) forward + input/param grads, (c) the same
with jax.checkpoint (remat trades HBM for recompute), to locate the
pathology before attacking it.
"""

import sys
import time

REPO = __file__.rsplit("/scripts/", 1)[0]
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from apse_uav_tpu.dcnn.models.resnet import ResNetFPN

    on_tpu = jax.devices()[0].platform == "tpu"
    b, h, w = (4, 768, 1344) if on_tpu else (1, 128, 128)
    iters = 8 if on_tpu else 2

    model = ResNetFPN(depth=50, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((b, h, w, 3), jnp.float32)
    params = jax.jit(model.init)(rng, x0)["params"]
    x0 = jax.device_put(np.random.default_rng(0).standard_normal((b, h, w, 3)).astype(np.float32))

    def timed(label, fn):
        # fn(params, x) -> f32 scalar; step() jits it with the reduction
        # inside, so the timing loop only moves one scalar per iteration.
        @jax.jit
        def step(p, x, s):
            out = fn(p, x)
            # evolve input through output (tunnel memoization rules)
            return out, x + out * 1e-9

        t0 = time.perf_counter()
        s, x = step(params, x0, 0.0)
        s = float(s)
        print(f"  compile {label}: {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for i in range(iters):
            s_, x = step(params, x, s)
        s = float(s_)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label}: {dt * 1e3:8.1f} ms  (sum {s:.3e})", flush=True)

    def loss(p, x):
        f = model.apply({"params": p}, x)
        return sum(v.astype(jnp.float32).sum() for v in f.values())

    def gradsum(p, x):
        g = jax.grad(loss)(p, x)
        return jax.tree_util.tree_reduce(lambda a, v: a + v.astype(jnp.float32).sum(), g, jnp.float32(0.0))

    timed("fwd", loss)
    timed("fwd+param_grads", gradsum)
    rematted = jax.checkpoint(loss)
    timed("fwd+param_grads remat", lambda p, x: jax.tree_util.tree_reduce(
        lambda a, v: a + v.astype(jnp.float32).sum(), jax.grad(rematted)(p, x), jnp.float32(0.0)))


if __name__ == "__main__":
    main()
