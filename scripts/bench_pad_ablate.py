#!/usr/bin/env python
"""Is the pack-pad avoidable?  Time pad variants + a pre-padded front.

Variants:
  pad        jnp.pad (current _pack_frames view branch) + 5-D reshape
  pad2d      jnp.pad alone (no reshape)
  dus        zeros-init + dynamic_update_slice
  reshape    pre-padded input, reshape only (the proposed ingest form)

Each variant consumes its result with a FULL sum — a tiny slice-sum lets the
XLA simplifier rewrite slice-of-pad into a slice and dead-code the pad under
test.  The sum's read-back cost rides every variant equally.
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

    w, h = 3840, 2160
    batch = 8
    mtx, dist = load_camera_params(REPO + "/data/cam_params.json")
    pipe = ArucoPipeline(mtx, dist, (w, h), ArucoPipelineConfig())
    dims = pipe.pre.dims
    pads = ((0, 0), (0, 0), (dims.pad_y, dims.padded_h - h - dims.pad_y),
            (dims.pad_x // 4, (dims.padded_w - dims.pad_x) // 4 - w // 4))

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (batch, 3, h, w), np.uint8)
    frames = jax.device_put(np.asarray(frames).view(np.int32))

    # Pre-padded host form: frame bytes written into the padded geometry.
    fp = np.zeros((batch, 3, dims.padded_h, dims.padded_w // 4), np.int32)
    fp[:, :, pads[2][0]:pads[2][0] + h, pads[3][0]:pads[3][0] + w // 4] = np.asarray(frames)
    frames_p = jax.device_put(fp)

    def bump(fr, s):
        return fr + jnp.maximum(s % 47, 1) * jnp.int32(0x01010101)

    @jax.jit
    def s_pad(fr):
        p = jnp.pad(fr, pads).reshape(batch, 3, dims.padded_h // 8, 8, dims.padded_w // 4)
        return bump(fr, p.sum(dtype=jnp.int32))

    @jax.jit
    def s_pad2d(fr):
        p = jnp.pad(fr, pads)
        return bump(fr, p.sum(dtype=jnp.int32))

    @jax.jit
    def s_dus(fr):
        z = jnp.zeros((batch, 3, dims.padded_h, dims.padded_w // 4), jnp.int32)
        p = jax.lax.dynamic_update_slice(z, fr, (0, 0, pads[2][0], pads[3][0]))
        p = p.reshape(batch, 3, dims.padded_h // 8, 8, dims.padded_w // 4)
        return bump(fr, p.sum(dtype=jnp.int32))

    @jax.jit
    def s_reshape(fr):
        p = fr.reshape(batch, 3, dims.padded_h // 8, 8, dims.padded_w // 4)
        return bump(fr, p.sum(dtype=jnp.int32))

    for name, step, inp in (("pad", s_pad, frames), ("pad2d", s_pad2d, frames),
                            ("dus", s_dus, frames), ("reshape", s_reshape, frames_p)):
        dt = timed(step, inp)
        print(f"{name:8s} {dt / batch * 1e3:6.3f} ms/frame")


if __name__ == "__main__":
    main()
