#!/usr/bin/env python
"""Benchmark CLI — prints ONE JSON line with the headline metric.

Headline: fused preproc (undistort+gamma+gray Pallas kernel) + ArUco marker
detection + planar pose, batched over 4K frames, frames/sec on one chip.

Baseline (BASELINE.md): >= 500 4K frames/sec/chip on TPU v5e for fused
preproc+ArUco.  ``vs_baseline`` is throughput / 500.
"""

import json
import os
import sys
import time

import numpy as np


BASELINE_FPS = 500.0


def main() -> None:
    import jax

    from apse_uav_tpu.aruco.pipeline import ArucoPipeline, ArucoPipelineConfig, init_carry

    on_tpu = jax.devices()[0].platform == "tpu"
    # 4K on TPU; small shapes on CPU so the bench still runs in CI.
    if on_tpu:
        size_wh, batch, iters = (3840, 2160), 8, 10
    else:
        size_wh, batch, iters = (1280, 736), 2, 2

    w, h = size_wh
    # The real reference camera when available (its lens determines the
    # tame/wild tile split and thus kernel work); otherwise a mild UAV lens.
    ref = "/root/reference/data/cam_params.json"
    if os.path.exists(ref):
        from apse_uav_tpu.core.camera import load_camera_params

        mtx, dist = load_camera_params(ref)
        mtx = mtx * np.array([[w / 3840, 1, w / 3840], [1, h / 2160, h / 2160], [1, 1, 1.0]])
    else:
        mtx = np.array([[0.77 * w, 0.0, w / 2], [0.0, 0.77 * w, h / 2], [0.0, 0.0, 1.0]])
        dist = np.array([0.11, -0.28, 1.1e-4, -2.5e-4, 0.15])
    cfg = ArucoPipelineConfig(use_pallas_preproc=on_tpu)
    pipe = ArucoPipeline(mtx, dist, size_wh, cfg)

    rng = np.random.default_rng(0)
    frames = jax.device_put(
        rng.integers(0, 255, (batch, 3, size_wh[1], size_wh[0]), dtype=np.uint8)
    )
    carry = init_carry(cfg)

    # Warmup / compile.
    carry2, out = pipe.process(frames, carry, first=True)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        carry2, out = pipe.process(frames, carry, first=True)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "preproc_aruco_4k_throughput" if on_tpu else "preproc_aruco_throughput_cpu_small",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
