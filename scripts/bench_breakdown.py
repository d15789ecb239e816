#!/usr/bin/env python
"""Per-stage throughput breakdown of the ArUco pipeline on the real TPU.

Honest-measurement rules (PERF_NOTES.md): every iteration evolves the input
buffer through the computation and ends with a host read.

Usage: python scripts/bench_breakdown.py [--json PATH] [--noise] [stage ...]
Stages: preproc proposals detect front scan full proposals_nodecim detect_nodecim cc refine
        tp_pool tp_pooledfront tp_props tp_select tp_selpass tp_cand pose
(default: preproc proposals detect front scan full)

Frames are RENDERED 4-marker scenes by default (same distribution as
bench.py: the two-pass second pass costs what candidates demand, so noise
input undercosts it); --noise restores the round-3 random input for
comparison against old tables.  --json dumps {stage: ms_per_frame} plus the
run config — commit it as BENCH_breakdown_rN.json so regressions are caught
by diffing artifacts (VERDICT r3 #8).
"""

import json
import sys
import time

import numpy as np

REPO = __file__.rsplit("/scripts/", 1)[0]
sys.path.insert(0, REPO)


def timed(step, frames, iters=16, warmup=2):
    import jax

    for _ in range(warmup):
        frames = step(frames)
    _ = float(frames[0, 0, 0, 0] if frames.ndim == 4 else frames.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        frames = step(frames)
    _ = float(frames[0, 0, 0, 0] if frames.ndim == 4 else frames.reshape(-1)[0])
    dt = time.perf_counter() - t0
    return dt / iters


def main():
    import jax
    import jax.numpy as jnp

    from apse_uav_tpu.aruco.pipeline import ArucoPipeline, ArucoPipelineConfig, init_carry
    from apse_uav_tpu.aruco import detector as det
    from apse_uav_tpu.core.camera import load_camera_params

    argv = sys.argv[1:]
    json_path = None
    use_noise = False
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if "--noise" in argv:
        use_noise = True
        argv.remove("--noise")
    stages = argv or ["preproc", "proposals", "detect", "front", "scan", "full"]
    import dataclasses as _dc
    on_tpu = jax.devices()[0].platform == "tpu"
    print("platform:", jax.devices()[0].platform)
    if on_tpu:
        w, h, batch, iters = 3840, 2160, 8, 16
    else:
        w, h, batch, iters = 1280, 736, 2, 2

    mtx, dist = load_camera_params(f"{REPO}/data/cam_params.json")
    mtx = mtx * np.array([[w / 3840, 1, w / 3840], [1, h / 2160, h / 2160], [1, 1, 1.0]])
    cfg = ArucoPipelineConfig(use_pallas_preproc=on_tpu)
    pipe = ArucoPipeline(mtx, dist, (w, h), cfg)

    rng = np.random.default_rng(0)
    if use_noise:
        frames = jax.device_put(rng.integers(0, 255, (batch, 3, h, w), dtype=np.uint8))
    else:
        from apse_uav_tpu.utils.synthetic import MarkerSpec, SceneRenderer

        r = SceneRenderer(mtx, dist, (w, h), altitude=40.0, supersample=1)
        base_np = np.empty((batch, 3, h, w), np.uint8)
        for i in range(batch):
            img = r.render([
                MarkerSpec(4, (0.5, -2.0), yaw_deg=14.0 + 7 * i, leds=0b1010),
                MarkerSpec(1, (7.5, 3.0), yaw_deg=40.0 + 5 * i),
                MarkerSpec(2, (-9.0, 2.0), yaw_deg=70.0 - 9 * i),
                MarkerSpec(3, (4.0, -6.5), yaw_deg=5.0 + 11 * i),
            ])
            base_np[i] = np.transpose(img, (2, 0, 1))
        frames = jax.device_put(base_np)
    bump_mask = None
    if cfg.use_pallas_preproc:
        # Production ingest form: host PRE-PADDED 5-D i32 (pack == identity,
        # pallas_remap.host_pack).  The evolving bump stays confined to the
        # frame interior so the padded border zeros survive.
        frames = jax.device_put(pipe.pre.host_pack(np.asarray(frames)))
        d = pipe.pre.dims
        rr = np.arange(d.padded_h)
        cc = np.arange(d.padded_w // 4)
        interior = (
            ((rr >= d.pad_y) & (rr < d.pad_y + h))[:, None]
            & ((cc >= d.pad_x // 4) & (cc < (d.pad_x + w) // 4))[None, :]
        )
        from apse_uav_tpu.preproc.pallas_remap import ALIGN_Y

        bump_mask = jnp.asarray(
            (interior.astype(np.int32) * 0x01010101).reshape(
                1, 1, d.padded_h // ALIGN_Y, ALIGN_Y, d.padded_w // 4
            )
        )

    def bump(fr, s):
        """Evolve fr by a small per-byte shift derived from the output s."""
        k = jnp.maximum(s.astype(jnp.int32) % 47, 1)
        if fr.ndim == 5:
            return fr + k * bump_mask
        if fr.dtype == jnp.int32:
            return fr + k * jnp.int32(0x01010101)
        return fr + k.astype(jnp.uint8)

    gray0 = jnp.asarray(rng.integers(0, 255, (batch, h, w), dtype=np.uint8))
    carry0 = init_carry(cfg)
    p = pipe.detector.params

    results = {}

    def report(name, dt_batch):
        ms = dt_batch / batch * 1e3
        results[name] = round(ms, 3)
        print(f"{name:12s} {ms:7.2f} ms/frame   ({batch / dt_batch:7.1f} fps)")

    if "preproc" in stages:
        @jax.jit
        def s_pre(fr):
            _, gray = pipe.pre(fr) if cfg.use_pallas_preproc else pipe.pre(jnp.transpose(fr, (0, 2, 3, 1)))
            return bump(fr, gray[:, ::512, ::512].sum())
        report("preproc", timed(s_pre, frames, iters))

    if "proposals" in stages:
        @jax.jit
        def s_prop(g):
            def one(gi):
                centers, sizes, vals, valid = det._proposals(gi.astype(jnp.float32), p)
                return centers.sum() + sizes.sum() + vals.sum()
            s = jax.vmap(one)(g).sum()
            return g + (s.astype(jnp.int32).astype(jnp.uint8) | jnp.uint8(1))
        report("proposals", timed(s_prop, gray0, iters))

    if "proposals_nodecim" in stages:
        p_nd = _dc.replace(p, decimate=False)

        @jax.jit
        def s_prop_nd(g):
            def one(gi):
                centers, sizes, vals, valid = det._proposals(gi.astype(jnp.float32), p_nd)
                return centers.sum() + sizes.sum() + vals.sum()
            s = jax.vmap(one)(g).sum()
            return g + (s.astype(jnp.int32).astype(jnp.uint8) | jnp.uint8(1))
        report("prop_nodec", timed(s_prop_nd, gray0, iters))

    if "detect_nodecim" in stages:
        det_nd = det.ArucoDetector(_dc.replace(p, decimate=False))

        @jax.jit
        def s_det_nd(g):
            corners, ids = det_nd.detect(g)
            bump = (corners.sum().astype(jnp.int32) + ids.sum()).astype(jnp.uint8) | jnp.uint8(1)
            return g + bump
        report("det_nodec", timed(s_det_nd, gray0, iters))

    if "proposals_pallas" in stages:
        from apse_uav_tpu.aruco import pallas_proposals as pprop

        @jax.jit
        def s_prop_pl(g):
            centers, sizes, vals, valid = pprop.proposals_batched(g, p, interpret=not on_tpu)
            s = centers.sum() + sizes.sum() + vals.sum()
            return g + (s.astype(jnp.int32).astype(jnp.uint8) | jnp.uint8(1))
        report("prop_pallas", timed(s_prop_pl, gray0, iters))

    if "detect_pallas" in stages:
        det_pl = det.ArucoDetector(
            _dc.replace(p, pallas_proposals=True, pallas_interpret=not on_tpu)
        )

        @jax.jit
        def s_det_pl(g):
            corners, ids = det_pl.detect(g)
            bump = (corners.sum().astype(jnp.int32) + ids.sum()).astype(jnp.uint8) | jnp.uint8(1)
            return g + bump
        report("det_pallas", timed(s_det_pl, gray0, iters))

    if "detect" in stages:
        @jax.jit
        def s_det(g):
            corners, ids = pipe.detector.detect(g)
            bump = (corners.sum().astype(jnp.int32) + ids.sum()).astype(jnp.uint8) | jnp.uint8(1)
            return g + bump
        report("detect", timed(s_det, gray0, iters))

    if "cc" in stages:
        # Largest-component label propagation inside the candidate stage:
        # fixed 3 cummin-sweep rounds + 8 radius-1 steps on (K, 64, 64)
        # windows (cost is data-independent — no while_loop).
        K = 60
        dark0 = jnp.zeros((batch, K, 64, 64), bool).at[:, :, 16:48, 16:48].set(True)

        @jax.jit
        def s_cc(d):
            m = jax.vmap(jax.vmap(lambda x: det._largest_component(x, 64)))(d)
            return jnp.logical_xor(d, (m.sum() & 1).astype(bool))
        report("cc", timed(s_cc, dark0, iters))

    if "refine" in stages:
        K = 60
        patches = jnp.zeros((batch, K, 384, 384), jnp.float32)
        corners0 = jnp.tile(jnp.asarray([[60.0, 60.0], [60.0, 300.0], [300.0, 300.0], [300.0, 60.0]]), (batch, K, 1, 1))

        @jax.jit
        def s_ref(pa):
            def one(pi, ci):
                return det._refine_edges(pi, ci, p.edge_points, jnp.float32(2.0), 0.8)[0]
            r = jax.vmap(jax.vmap(one))(pa, corners0)
            return pa + r.sum() * 1e-9 + 1.0
        report("refine384", timed(s_ref, patches, iters))

    if "pose" in stages:
        # Both-basin planar PnP on 4 marker slots per frame (the front's
        # exact pose workload) — isolates the sequential GN-latency cut from
        # refining the two ambiguity basins concurrently.
        from apse_uav_tpu.aruco.pose import estimate_pose_single_markers_two

        c0 = jnp.tile(
            jnp.asarray([[1000.0, 1000.0], [1047.0, 1002.0], [1045.0, 1049.0], [998.0, 1047.0]]),
            (batch, 4, 1, 1),
        )

        @jax.jit
        def s_pose(c):
            rv, tv, rv2, tv2, _, _, _ = estimate_pose_single_markers_two(
                c, 1.0, pipe.mtx, pipe.dist
            )
            return c + (rv.sum() + tv.sum() + rv2.sum() + tv2.sum()) * 1e-9 + 1.0
        report("pose", timed(s_pose, c0, iters))

    if "front" in stages:
        @jax.jit
        def s_front(fr):
            f = pipe.front(fr)
            return bump(fr, f["msp"].sum() + f["cx"].sum())
        report("front", timed(s_front, frames, iters))

    if "full" in stages:
        @jax.jit
        def s_full(fr):
            f = pipe.front(fr)
            firsts = jnp.zeros(fr.shape[0], bool).at[0].set(True)
            carry, out = pipe.scan(carry0, f, firsts, jnp.zeros((fr.shape[0], 17), jnp.int32))
            return bump(fr, out["dist_aruco"].sum())
        report("full", timed(s_full, frames, iters))

    # --- two-pass preproc stage attribution (cfg.two_pass) ------------------
    tp_stages = {"tp_pool", "tp_pooledfront", "tp_props", "tp_select", "tp_selpass", "tp_cand"}
    if cfg.two_pass and tp_stages & set(stages):
        from apse_uav_tpu.aruco import patch_select
        from apse_uav_tpu.aruco.detector import _patch_groups
        from apse_uav_tpu.preproc import twopass

        st = p.proposal_stride
        groups = tuple(_patch_groups(h, w, p))

        def pooled_src_of(fr):
            if cfg.use_pallas_preproc:
                return twopass.pool_packed_to_packed(pipe.pre.pack(fr), pipe.pre.dims, h, w, pipe.pre_pooled.dims)
            return twopass.pool_source_u8(fr, st, pipe._pooled_hw)

        def pooled_gray_of(fr):
            if cfg.use_pallas_preproc:
                _, pg = pipe.pre_pooled.from_packed(pooled_src_of(fr))
            else:
                _, pg = pipe.pre_pooled(jnp.transpose(pooled_src_of(fr), (0, 2, 3, 1)))
            return pg

        def props_of(fr):
            pg = pooled_gray_of(fr)
            pool = pg[:, : h // st, : w // st].astype(jnp.float32)
            from apse_uav_tpu.aruco import pallas_proposals as pprop
            return pprop.proposals_batched_from_pool(pool, h, w, p)

        def sel_of(fr):
            centers, sizes, scores, valid = props_of(fr)
            return patch_select.select_tiles_batched(
                centers, valid, h=h, w=w, th=pipe._sel_th, tw=pipe._sel_tw,
                groups=groups, t_sel=cfg.sel_tile_budget, per_scale_k=p.per_scale_k)

        if "tp_pool" in stages:
            @jax.jit
            def s_tpp(fr):
                ps = pooled_src_of(fr)
                return bump(fr, ps.sum(dtype=jnp.int32))
            report("tp_pool", timed(s_tpp, frames, iters))

        if "tp_pooledfront" in stages:
            @jax.jit
            def s_tpf(fr):
                pg = pooled_gray_of(fr)
                return bump(fr, pg.sum(dtype=jnp.int32))
            report("tp_pooledfront", timed(s_tpf, frames, iters))

        if "tp_props" in stages:
            @jax.jit
            def s_tpr(fr):
                centers, _, scores, _ = props_of(fr)
                return bump(fr, (centers.sum() + scores.sum()).astype(jnp.int32))
            report("tp_props", timed(s_tpr, frames, iters))

        if "tp_select" in stages:
            @jax.jit
            def s_tps(fr):
                sel, covered = sel_of(fr)
                return bump(fr, sel.sum() + covered.sum())
            report("tp_select", timed(s_tps, frames, iters))

        if "tp_selpass" in stages:
            @jax.jit
            def s_tpsp(fr):
                sel, covered = sel_of(fr)
                packed = pipe.pre.pack(fr)
                gray = pipe.pre.selected_packed(packed, sel)
                return bump(fr, gray[:, ::64, ::512].sum(dtype=jnp.int32))
            report("tp_selpass (cum)", timed(s_tpsp, frames, iters))

        if "tp_cand" in stages:
            @jax.jit
            def s_tpc(fr):
                gray, corners, ids = pipe._detect_two_pass(fr)
                return bump(fr, corners.sum().astype(jnp.int32) + ids.sum())
            report("tp_cand (cum)", timed(s_tpc, frames, iters))

    if json_path:
        payload = {
            "platform": jax.devices()[0].platform,
            "size": [w, h],
            "batch": batch,
            "iters": iters,
            "input": "noise" if use_noise else "rendered_scene",
            "two_pass": cfg.two_pass,
            "stages_ms_per_frame": results,
        }
        with open(json_path, "w") as f:
            f.write(json.dumps(payload, indent=1) + "\n")
        print("wrote", json_path)


if __name__ == "__main__":
    main()
