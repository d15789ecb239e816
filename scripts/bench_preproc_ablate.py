#!/usr/bin/env python
"""Preproc cost ablation on the real TPU: where do the ~4 ms/frame go?

Splits the measured preproc stage into:
  pack      — the XLA byte->i32 pack + pad feeding the kernel (wrapper cost)
  dma_only  — kernel with resample/LAB stubbed (DMA + grid-overhead floor)
  no_lab    — full resample, LAB gamma roundtrip replaced by a mean
  full      — production kernel
  unperm    — the XLA lane-reinterleave on the gray output (wrapper cost)

Honest-measurement rules per PERF_NOTES.md: evolve the input every
iteration, end with a host read.

Usage: python scripts/bench_preproc_ablate.py [modes...]
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

    from apse_uav_tpu.core.camera import load_camera_params
    from apse_uav_tpu.preproc import pallas_remap as pr

    modes = sys.argv[1:] or ["pack", "dma_only", "no_lab", "full", "full_f2", "full_f4", "unperm"]
    on_tpu = jax.devices()[0].platform == "tpu"
    print("platform:", jax.devices()[0].platform)
    w, h, batch, iters = (3840, 2160, 8, 16) if on_tpu else (1280, 736, 2, 2)

    mtx, dist = load_camera_params(f"{REPO}/data/cam_params.json")
    mtx = mtx * np.array([[w / 3840, 1, w / 3840], [1, h / 2160, h / 2160], [1, 1, 1.0]])

    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(0, 255, (batch, 3, h, w), dtype=np.uint8))

    def report(name, dt):
        print(f"{name:10s} {dt / batch * 1e3:7.2f} ms/frame   ({batch / dt:7.1f} fps)")

    def mk(m):
        f = {"full_f2": 2, "full_f4": 4}.get(m, 1)
        return pr.PallasPreprocessor(
            np.asarray(mtx, np.float64), np.asarray(dist, np.float64), (w, h),
            interpret=not on_tpu, want_rgb=False,
            debug_mode=m if not m.startswith("full") else "full",
            frames_per_step=f,
        )

    pres = {m: mk(m) for m in ("dma_only", "no_lab", "full", "full_f2", "full_f4") if m in modes}

    if "pack" in modes:
        some = pres.get("full") or pr.PallasPreprocessor(
            np.asarray(mtx, np.float64), np.asarray(dist, np.float64), (w, h),
            interpret=not on_tpu, want_rgb=False,
        )
        dims = some._dims

        @jax.jit
        def s_pack(fr):
            # Mirrors pallas_remap._fused_preproc's weight-then-pool pack.
            byte_w = jnp.left_shift(
                jnp.int32(1),
                8 * (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, w), 3) % 4),
            )
            packed = jax.lax.reduce_window(
                fr.astype(jnp.int32) * byte_w, jnp.int32(0), jax.lax.add,
                (1, 1, 1, 4), (1, 1, 1, 4), "VALID",
            )
            padded = jnp.pad(
                packed,
                ((0, 0), (0, 0), (dims.pad_y, dims.padded_h - h - dims.pad_y),
                 (dims.pad_x // 4, (dims.padded_w - w - dims.pad_x) // 4)),
            )
            bump = (padded[:, 0, ::512, ::128].sum() & 3).astype(jnp.uint8) | jnp.uint8(1)
            return fr + bump

        report("pack", timed(s_pack, frames, iters))

    for m in ("dma_only", "no_lab", "full", "full_f2", "full_f4"):
        if m not in modes:
            continue
        pre = pres[m]

        @jax.jit
        def s_run(fr, pre=pre):
            _, gray = pre(fr)
            bump = (gray[:, ::512, ::512].sum() & jnp.uint8(3)) | jnp.uint8(1)
            return fr + bump

        report(m, timed(s_run, frames, iters))

    if "unperm" in modes:
        gray0 = jax.device_put(rng.integers(0, 255, (batch, h, w), dtype=np.uint8))
        tw = pres.get("full", list(pres.values())[0] if pres else None)
        tw = tw._dims.tw if tw is not None else 256

        @jax.jit
        def s_unperm(g):
            x = g.reshape(batch, h, w // tw, 4, tw // 4)
            x = jnp.swapaxes(x, -1, -2).reshape(batch, h, w)
            bump = (x[:, ::512, ::512].sum() & jnp.uint8(3)) | jnp.uint8(1)
            return g + bump

        report("unperm", timed(s_unperm, gray0, iters))


if __name__ == "__main__":
    main()
