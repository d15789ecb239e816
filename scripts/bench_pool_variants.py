#!/usr/bin/env python
"""Locate the real cost inside the packed-source pool (headline tp_pool).

Feeds the PRE-PADDED host-packed 5-D form (pack == identity, as bench.py
does) and times cumulative variants of the pool chain plus a flat-4D
reformulation.  PERF_NOTES honest-measurement rules.
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
    print("dims padded", dims.padded_h, dims.padded_w, "pads", dims.pad_y, dims.pad_x)

    rng = np.random.default_rng(0)
    frames_u8 = rng.integers(0, 256, (batch, 3, h, w), np.uint8)
    packed = jax.device_put(pipe.pre.host_pack(frames_u8))

    def bump(fr, s):
        return fr + jnp.maximum(s % 47, 1) * jnp.int32(0x01010101)

    pad_y, pad_x = dims.pad_y, dims.pad_x

    def core_of(pk):
        return pk[:, :, pad_y // 8 : (pad_y + h) // 8, :, pad_x // 4 : (pad_x + w) // 4]

    def s4_of(core):
        return ((core >> 0) & 255) + ((core >> 8) & 255) + ((core >> 16) & 255) + ((core >> 24) & 255)

    def byte_of(s4):
        v = jax.lax.reduce_window(s4, jnp.int32(0), jax.lax.add, (1, 1, 1, 4, 1), (1, 1, 1, 4, 1), "VALID")
        return (v + 8) >> 4

    nl = w // 4
    lane = np.arange(nl)
    p_lo = np.zeros((nl, nl // 4), np.float32)
    p_hi = np.zeros((nl, nl // 4), np.float32)
    sel = (lane % 4) < 2
    p_lo[lane[sel], lane[sel] // 4] = (256 ** (lane[sel] % 4)).astype(np.float32)
    p_hi[lane[~sel], lane[~sel] // 4] = (256 ** (lane[~sel] % 4 - 2)).astype(np.float32)
    p_lo_j = jnp.asarray(p_lo)
    p_hi_j = jnp.asarray(p_hi)

    def repack_of(byte):
        bf = byte.astype(jnp.float32)
        hp = jax.lax.Precision.HIGHEST
        cax = bf.ndim - 1
        lo = jax.lax.dot_general(bf, p_lo_j, (((cax,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=hp)
        hi = jax.lax.dot_general(bf, p_hi_j, (((cax,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=hp)
        return lo.astype(jnp.int32) + (hi.astype(jnp.int32) << 16)

    def tail_of(pp):
        b = pp.shape[0]
        pp = pp.reshape(b, 3, h // 4, w // 16)
        hpool, wpool = h // 4, w // 4
        hp2, wp2 = pdims.padded_h, pdims.padded_w
        pp = jnp.pad(pp, ((0, 0), (0, 0), (pdims.pad_y, hp2 - hpool - pdims.pad_y),
                          (pdims.pad_x // 4, (wp2 - pdims.pad_x - wpool) // 4)))
        return pp.reshape(b, 3, hp2 // 8, 8, wp2 // 4)

    variants = {
        "s4+vert": lambda pk: byte_of(s4_of(core_of(pk))).sum(dtype=jnp.int32),
        "+repack": lambda pk: repack_of(byte_of(s4_of(core_of(pk)))).sum(dtype=jnp.int32),
        "+tail(full)": lambda pk: tail_of(repack_of(byte_of(s4_of(core_of(pk))))).sum(dtype=jnp.int32),
        "ref_impl": lambda pk: twopass.pool_packed_to_packed(pk, dims, h, w, pdims).sum(dtype=jnp.int32),
        "ref_rw": lambda pk: twopass.pool_packed_to_packed(pk, dims, h, w, pdims, repack="rw").sum(dtype=jnp.int32),
    }

    # Flat-4D reformulation: merge the 8-row groups (layout-trivial sublane
    # merge), pool rows on the sublane axis, repack via the dot.
    def flat4d(pk):
        b = pk.shape[0]
        flat = pk.reshape(b, 3, dims.padded_h, dims.padded_w // 4)
        core = flat[:, :, pad_y : pad_y + h, pad_x // 4 : (pad_x + w) // 4]
        s4 = ((core >> 0) & 255) + ((core >> 8) & 255) + ((core >> 16) & 255) + ((core >> 24) & 255)
        v = jax.lax.reduce_window(s4, jnp.int32(0), jax.lax.add, (1, 1, 4, 1), (1, 1, 4, 1), "VALID")
        byte = (v + 8) >> 4  # (B, 3, 540, 960)
        return repack_of(byte).sum(dtype=jnp.int32)

    variants["flat4d"] = flat4d

    from apse_uav_tpu.preproc.pallas_pool import pool_packed_to_packed_pallas

    variants["pallas"] = lambda pk: pool_packed_to_packed_pallas(
        pk, dims, h, w, pdims
    ).sum(dtype=jnp.int32)
    real = jax.jit(lambda pk: twopass.pool_packed_to_packed(pk, dims, h, w, pdims))(packed)
    pal = jax.jit(lambda pk: pool_packed_to_packed_pallas(pk, dims, h, w, pdims))(packed)
    np.testing.assert_array_equal(np.asarray(real), np.asarray(pal))
    print("pallas parity OK (on device)")

    for name, fn in variants.items():
        @jax.jit
        def step(fr, fn=fn):
            return bump(fr, fn(fr))
        dt = timed(step, packed)
        print(f"{name:12s} {dt / batch * 1e3:6.3f} ms/frame")


if __name__ == "__main__":
    main()
