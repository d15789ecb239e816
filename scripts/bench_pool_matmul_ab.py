#!/usr/bin/env python
"""A/B: pool_packed_to_packed's lane repack as reduce_window vs MXU matmul.

The pooled byte vector b (…, W/4 lanes, values 0..255) must become packed
i32 lanes out[k] = sum_j b[4k+j] << 8j.  The reduce_window formulation
(weight by 256^(lane%4), stride-4 window sum) costs ~0.5 ms/frame on the
v5e; a banded 0/1-ish matrix ridden on the MXU does the same in two f32
dots that are exact for 16-bit halves (max 255*257 = 65535 < 2^24).
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
    frames_u8 = rng.integers(0, 256, (batch, 3, h, w), np.uint8)
    packed_host = pipe.pre.host_pack(frames_u8)
    packed = jax.device_put(packed_host)

    def bump(fr, s):
        return fr + jnp.maximum(s % 47, 1) * jnp.int32(0x01010101)

    def pool_a(pk):
        return twopass.pool_packed_to_packed(pk, dims, h, w, pdims)

    def pool_b(pk):
        return twopass.pool_packed_to_packed(pk, dims, h, w, pdims, repack="matmul")

    ra = jax.jit(pool_a)(packed)
    rb = jax.jit(pool_b)(packed)
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))
    print("parity OK")

    for name, fn in (("reduce_window", pool_a), ("matmul", pool_b)):
        @jax.jit
        def step(fr, fn=fn):
            return bump(fr, fn(fr).sum(dtype=jnp.int32))
        dt = timed(step, packed)
        print(f"{name:14s} {dt / batch * 1e3:6.3f} ms/frame")


if __name__ == "__main__":
    main()
