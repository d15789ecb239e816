#!/usr/bin/env python
"""Benchmark CLI — prints ONE JSON line with the headline metric.

Headline: the full fused ArUco measurement pipeline — undistort+gamma+gray
(Pallas), marker detection, planar PnP pose, temporal scan — batched over 4K
frames, frames/sec on one chip.

Baseline (BASELINE.md): >= 500 4K frames/sec/chip on TPU v5e for fused
preproc+ArUco.  ``vs_baseline`` is throughput / 500.

Measurement notes: every iteration evolves the input buffer through the
computation (additive, non-cycling) and the run ends with a host read —
remote/tunneled backends memoize repeated executions and under-report
blocking, so naive timing loops lie.
"""

import json
import os
import sys
import time

import numpy as np


BASELINE_FPS = 500.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from apse_uav_tpu.aruco.pipeline import ArucoPipeline, ArucoPipelineConfig, init_carry

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        size_wh, batch, iters = (3840, 2160), 8, 16
    else:  # small shapes so the bench still runs in CI
        size_wh, batch, iters = (1280, 736), 2, 2

    w, h = size_wh
    # The real reference camera, vendored (its lens determines the tame/wild
    # tile split and thus kernel work); fallback: a mild UAV lens.
    ref = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "cam_params.json")
    if os.path.exists(ref):
        from apse_uav_tpu.core.camera import load_camera_params

        mtx, dist = load_camera_params(ref)
        mtx = mtx * np.array([[w / 3840, 1, w / 3840], [1, h / 2160, h / 2160], [1, 1, 1.0]])
    else:
        mtx = np.array([[0.77 * w, 0.0, w / 2], [0.0, 0.77 * w, h / 2], [0.0, 0.0, 1.0]])
        dist = np.array([0.11, -0.28, 1.1e-4, -2.5e-4, 0.15])

    cfg = ArucoPipelineConfig(use_pallas_preproc=on_tpu)
    pipe = ArucoPipeline(mtx, dist, size_wh, cfg)

    # Frames are RENDERED 4-marker scenes, not noise: the two-pass preproc's
    # second pass costs what the candidates demand, so the benchmark input
    # must carry the real operating distribution (markers + clutter
    # candidates), not pathological noise with near-zero proposal scores.
    from apse_uav_tpu.utils.synthetic import MarkerSpec, SceneRenderer

    r = SceneRenderer(mtx, dist, size_wh, altitude=40.0, supersample=1)
    base_np = np.empty((batch, 3, h, w), np.uint8)
    for i in range(batch):
        img = r.render([
            MarkerSpec(4, (0.5, -2.0), yaw_deg=14.0 + 7 * i, leds=0b1010),
            MarkerSpec(1, (7.5, 3.0), yaw_deg=40.0 + 5 * i),
            MarkerSpec(2, (-9.0, 2.0), yaw_deg=70.0 - 9 * i),
            MarkerSpec(3, (4.0, -6.5), yaw_deg=5.0 + 11 * i),
        ])
        # Scale to <= 200 so the evolving +0..47 brightness shift (below)
        # cannot wrap uint8; contrast is preserved (markers stay trivial).
        base_np[i] = np.transpose((img.astype(np.uint16) * 200 // 255).astype(np.uint8), (2, 0, 1))
    # Production ingest hands the pipeline the ZERO-COST host byte view of
    # the planar frame ((B, 3, H, W//4) i32 — identical bits, numpy .view):
    # the device-side pack then reduces to a pad (pallas_remap._pack_frames).
    base = jax.device_put(base_np.view(np.int32) if cfg.use_pallas_preproc else base_np)
    carry0 = init_carry(cfg)

    @jax.jit
    def step(base_, fr, k):
        # base_ is an ARGUMENT, not a closure capture: captured device
        # arrays embed as HLO constants and a 200 MB constant overflows the
        # tunnel's remote-compile request (HTTP 413).
        f = pipe.front(fr)
        firsts = jnp.zeros(fr.shape[0], bool).at[0].set(True)
        carry, out = pipe.scan(carry0, f, firsts, jnp.zeros((fr.shape[0], 17), jnp.int32))
        # Evolve the buffer THROUGH the computation (the tunneled runtime
        # memoizes repeated executions on identical inputs): a per-iteration
        # brightness shift derived from the pipeline output, non-cycling
        # within the run and wrap-free on the scaled scenes (<= 200 + 47:
        # per-byte adds on the i32 view never carry across byte lanes).
        bump = jnp.maximum(out["dist_aruco"].sum().astype(jnp.int32) % 3, 1)
        k = k + bump
        shift = k % 48
        if base_.dtype == jnp.int32:
            return base_ + shift * jnp.int32(0x01010101), k
        return base_ + shift.astype(jnp.uint8), k

    frames, k = step(base, base, jnp.int32(1))
    _ = float(frames[0, 0, 0, 0])  # force warmup completion

    t0 = time.perf_counter()
    for _ in range(iters):
        frames, k = step(base, frames, k)
    _ = float(frames[0, 0, 0, 0])  # host read: forces the whole chain
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "aruco_pipeline_4k_throughput" if on_tpu else "aruco_pipeline_throughput_cpu_small",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
