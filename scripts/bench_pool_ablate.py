#!/usr/bin/env python
"""Sub-step attribution of twopass.pool_packed_to_packed on the real chip.

Cumulative variants (each adds one op of the pool chain) so the increment
isolates the op.  Honest-measurement rules per PERF_NOTES.md.  Every variant
consumes its intermediate with a FULL sum (a tiny slice-sum lets XLA's
simplifier rewrite slice-of-pad / slice-of-reduce_window and dead-code the op
under test); the sum's own read-back cost rides every variant, so increments
still attribute fairly.  A startup assert pins the inline chain to
twopass.pool_packed_to_packed so op-by-op drift is caught.
"""

import sys
import time

import numpy as np

REPO = __file__.rsplit("/scripts/", 1)[0]
sys.path.insert(0, REPO)


def timed(step, frames, iters=16, warmup=2):
    for _ in range(warmup):
        frames = step(frames)
    _ = float(frames.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        frames = step(frames)
    _ = float(frames.reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from apse_uav_tpu.aruco.pipeline import ArucoPipeline, ArucoPipelineConfig
    from apse_uav_tpu.core.camera import load_camera_params
    from apse_uav_tpu.preproc import twopass

    w, h = 3840, 2160
    batch = 8
    mtx, dist = load_camera_params(REPO + "/data/cam_params.json")
    pipe = ArucoPipeline(mtx, dist, (w, h), ArucoPipelineConfig())
    dims, pdims = pipe.pre.dims, pipe.pre_pooled.dims

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (batch, 3, h, w), np.uint8)
    frames = jax.device_put(np.asarray(frames).view(np.int32))

    def bump(fr, s):
        return fr + jnp.maximum(s % 47, 1) * jnp.int32(0x01010101)

    pad_y, pad_x = dims.pad_y, dims.pad_x

    def chain(fr, stop):
        packed = pipe.pre.pack(fr)
        if stop == "pack":
            return packed.sum(dtype=jnp.int32)
        core = packed[:, :, pad_y // 8 : (pad_y + h) // 8, :, pad_x // 4 : (pad_x + w) // 4]
        s4 = ((core >> 0) & 255) + ((core >> 8) & 255) + ((core >> 16) & 255) + ((core >> 24) & 255)
        if stop == "s4":
            return s4.sum(dtype=jnp.int32)
        v = jax.lax.reduce_window(s4, jnp.int32(0), jax.lax.add, (1, 1, 1, 4, 1), (1, 1, 1, 4, 1), "VALID")
        byte = (v + 8) >> 4
        if stop == "vert":
            return byte.sum(dtype=jnp.int32)
        lane_w = jnp.left_shift(
            jnp.int32(1), 8 * (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, w // 4), 4) % 4)
        )
        pp = jax.lax.reduce_window(
            byte * lane_w, jnp.int32(0), jax.lax.add, (1, 1, 1, 1, 4), (1, 1, 1, 1, 4), "VALID"
        )
        if stop == "repack":
            return pp.sum(dtype=jnp.int32)
        pp = pp.reshape(batch, 3, h // 4, w // 16)
        hpool, wpool = h // 4, w // 4
        hp2, wp2 = pdims.padded_h, pdims.padded_w
        pp = jnp.pad(
            pp,
            ((0, 0), (0, 0), (pdims.pad_y, hp2 - hpool - pdims.pad_y),
             (pdims.pad_x // 4, (wp2 - pdims.pad_x - wpool) // 4)),
        )
        pp = pp.reshape(batch, 3, hp2 // 8, 8, wp2 // 4)
        if stop == "array":
            return pp
        return pp.sum(dtype=jnp.int32)

    # Drift guard: the inline chain above re-implements
    # twopass.pool_packed_to_packed op by op so each stop isolates one op;
    # assert it still matches the real implementation before timing.
    real = jax.jit(
        lambda fr: twopass.pool_packed_to_packed(pipe.pre.pack(fr), dims, h, w, pdims)
    )(frames)
    inline = jax.jit(lambda fr: chain(fr, "array"))(frames)
    np.testing.assert_array_equal(np.asarray(real), np.asarray(inline))

    for stop in ("pack", "s4", "vert", "repack", "full"):
        @jax.jit
        def step(fr, stop=stop):
            return bump(fr, chain(fr, stop))
        dt = timed(step, frames)
        print(f"{stop:8s} {dt / batch * 1e3:6.3f} ms/frame")


if __name__ == "__main__":
    main()
