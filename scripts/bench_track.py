#!/usr/bin/env python
"""Detect+track engine breakdown on the real TPU (VERDICT r1, weak #5).

Times, per frame at the 4K tracker scale: detector inference, detection
embeddings (ROI features + association head), the association scan
(Hungarian + track-state update), and the full engine.

Usage: python scripts/bench_track.py [stage ...]
Stages: detect embed scan engine fused engine_bf16 prep backbone rpn nomask
(default: detect embed scan engine fused engine_bf16)
"""

import sys
import time

import numpy as np

REPO = __file__.rsplit("/scripts/", 1)[0]
sys.path.insert(0, REPO)


def timed(fn, arg, iters=8, warmup=2):
    # Flush with a SCALAR host read: np.asarray(arg) would drag the whole
    # chained buffer (hundreds of MB for p2 features) through the ~25 MB/s
    # tunnel inside the timed region and swamp the device time.
    def flush(a):
        return float(np.asarray(a.ravel()[:1])[0])

    for _ in range(warmup):
        arg = fn(arg)
    flush(arg)
    t0 = time.perf_counter()
    for _ in range(iters):
        arg = fn(arg)
    flush(arg)
    return (time.perf_counter() - t0) / iters


def main():
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp

    from apse_uav_tpu.dcnn import structures, tracker as T
    from apse_uav_tpu.dcnn.config import TrackerConfig, uav_tracker_config
    from apse_uav_tpu.dcnn.models.association import AssociationHead
    from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN
    from apse_uav_tpu.dcnn.engines import TrackPredictor

    stages = sys.argv[1:] or ["detect", "embed", "scan", "engine", "fused", "engine_bf16"]
    on_tpu = jax.devices()[0].platform == "tpu"
    print("platform:", jax.devices()[0].platform)
    orig_hw = (2160, 3840) if on_tpu else (432, 768)
    batch = 8 if on_tpu else 2

    cfg = uav_tracker_config(num_classes=4)
    cfg = dataclasses.replace(cfg, depth=50)
    tcfg = TrackerConfig()
    model = MaskRCNN(cfg=cfg)
    rng = np.random.default_rng(0)
    params = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 64, 64, 3)), mode="inference")["params"]
    )(jax.random.PRNGKey(0))
    predictor = TrackPredictor(cfg, params, orig_hw)
    head = AssociationHead(embedding_dim=tcfg.embedding_dim)
    assoc_params = head.init(
        jax.random.PRNGKey(1), jnp.zeros((1, cfg.fpn_channels, tcfg.roi_size, tcfg.roi_size))
    )["params"]

    frames = jnp.asarray(rng.integers(0, 255, (batch, *orig_hw, 3), dtype=np.uint8))
    dets0, feats0 = predictor(frames)
    p2 = feats0["p2"]
    state0 = structures.init_track_state(tcfg.max_tracks, tcfg.embedding_dim)

    def report(name, dt):
        print(f"{name:10s} {dt / batch * 1e3:7.2f} ms/frame")

    if "detect" in stages:
        @jax.jit
        def s_det(fr):
            d, f = predictor._infer_impl(predictor.params, fr)
            bump = (d["scores"].sum()).astype(jnp.uint8) | jnp.uint8(1)
            return fr + bump
        report("detect", timed(s_det, frames))

    # --- detect sub-stage attribution (cumulative prefixes of inference) ---
    def _prep(fr):
        x = fr.astype(jnp.float32)
        nh, nw = predictor.net_hw
        x = jax.image.resize(x, (x.shape[0], nh, nw, 3), method="linear")
        ph, pw = predictor.pad_hw
        return jnp.pad(x, ((0, 0), (0, ph - nh), (0, pw - nw), (0, 0)))

    if "prep" in stages:
        @jax.jit
        def s_prep(fr):
            x = _prep(fr)
            return fr + (x[:, ::256, ::256].sum().astype(jnp.int32).astype(jnp.uint8) | jnp.uint8(1))
        report("prep", timed(s_prep, frames))

    if "backbone" in stages:
        @jax.jit
        def s_bb(fr):
            x = _prep(fr)
            feats = model.apply(
                {"params": params}, x,
                method=lambda m, im: m.backbone(m._normalize(im)),
            )
            s = sum(v[:, ::64, ::64].sum() for v in feats.values())
            return fr + (s.astype(jnp.int32).astype(jnp.uint8) | jnp.uint8(1))
        report("backbone", timed(s_bb, frames))

    if "rpn" in stages:
        from apse_uav_tpu.dcnn.models.mask_rcnn import RPN_LEVELS
        from apse_uav_tpu.dcnn.models.rpn import select_proposals

        @jax.jit
        def s_rpn(fr):
            x = _prep(fr)

            def run(m, im):
                feats = m.backbone(m._normalize(im))
                rpn_feats = {n: feats[n] for n in RPN_LEVELS}
                logits, deltas = m.rpn_head(rpn_feats)
                level_shapes = {n: tuple(rpn_feats[n].shape[1:3]) for n in RPN_LEVELS}
                image_hw = tuple(im.shape[1:3])

                def per_image(logits_i, deltas_i):
                    return select_proposals(
                        logits_i, deltas_i, level_shapes, image_hw,
                        m.cfg.anchors, m.cfg.rpn, training=False,
                    )
                return jax.vmap(per_image)(logits, deltas)

            boxes, scores, valid = model.apply({"params": params}, x, method=run)
            return fr + ((boxes.sum() + scores.sum()).astype(jnp.int32).astype(jnp.uint8) | jnp.uint8(1))
        report("rpn (cum)", timed(s_rpn, frames))

    if "roipool" in stages or "boxhead" in stages or "boxinf" in stages:
        from apse_uav_tpu.dcnn.models.mask_rcnn import RPN_LEVELS
        from apse_uav_tpu.dcnn.models import roi_heads as RH
        from apse_uav_tpu.dcnn.models.rpn import select_proposals

        def _roi_chain(fr, stop):
            x = _prep(fr)

            def run(m, im):
                feats = m.backbone(m._normalize(im))
                rpn_feats = {n: feats[n] for n in RPN_LEVELS}
                logits, deltas = m.rpn_head(rpn_feats)
                level_shapes = {n: tuple(rpn_feats[n].shape[1:3]) for n in RPN_LEVELS}
                image_hw = tuple(im.shape[1:3])

                def per_image(logits_i, deltas_i, feats_i):
                    boxes, scores, valid = select_proposals(
                        logits_i, deltas_i, level_shapes, image_hw,
                        m.cfg.anchors, m.cfg.rpn, training=False,
                    )
                    pooled = RH.fpn_roi_align(
                        feats_i, boxes, m.cfg.roi.box_pooler_resolution,
                        m.cfg.roi.pooler_sampling_ratio,
                    )
                    if stop == "roipool":
                        return pooled.sum()
                    cls_logits, box_deltas = m.box_head(pooled)
                    if stop == "boxhead":
                        return cls_logits.sum() + box_deltas.sum()
                    det = RH.box_inference(cls_logits, box_deltas, boxes, valid, image_hw, m.cfg.roi)
                    return det["boxes"].sum() + det["scores"].sum()

                pool_feats = {n: feats[n] for n in RH.POOL_LEVELS}
                return jax.vmap(per_image)(logits, deltas, pool_feats)

            return model.apply({"params": params}, x, method=run)

        for stop in ("roipool", "boxhead", "boxinf"):
            if stop not in stages:
                continue

            @jax.jit
            def s_roi(fr, stop=stop):
                v = _roi_chain(fr, stop)
                return fr + (v.sum().astype(jnp.int32).astype(jnp.uint8) | jnp.uint8(1))
            report(f"{stop}(cum)", timed(s_roi, frames))

    if "nomask" in stages:
        cfg_nm = dataclasses.replace(cfg, mask_on=False)
        pred_nm = TrackPredictor(cfg_nm, {k: v for k, v in params.items() if k != "mask_head"}, orig_hw)

        @jax.jit
        def s_nm(fr):
            d, f = pred_nm._infer_impl(pred_nm.params, fr)
            return fr + ((d["scores"].sum()).astype(jnp.uint8) | jnp.uint8(1))
        report("nomask(cum)", timed(s_nm, frames))

    # Cap detections the way tracker_step does.
    det_c = dets0
    if det_c["valid"].shape[1] > tcfg.max_detections:
        k = tcfg.max_detections
        _, top = jax.lax.top_k(jnp.where(det_c["valid"], det_c["scores"], -jnp.inf), k)
        det_c = {key: jnp.take_along_axis(v, top.reshape(batch, k, *([1] * (v.ndim - 2))), axis=1)
                 if v.ndim > 2 else jnp.take_along_axis(v, top, axis=1)
                 for key, v in det_c.items()}

    def _prepare_batch(d, f_p2):
        return jax.vmap(
            lambda det_i, f_i: T.prepare_frame(det_i, f_i, assoc_params, tcfg, orig_hw)
        )(d, f_p2)

    def _assoc_scan(state, d, emb):
        def step(s, xs):
            det, e = xs
            return T.tracker_step_assoc(s, det, e, tcfg, orig_hw)
        return jax.lax.scan(step, state, (d, emb))

    if "embed" in stages:
        @jax.jit
        def s_emb(x):
            _, emb = _prepare_batch(dets0, x)
            return x + (emb.sum()).astype(x.dtype)
        report("embed", timed(s_emb, p2))

    if "scan" in stages:
        det_p0, emb0 = jax.jit(_prepare_batch)(dets0, p2)

        @jax.jit
        def s_scan(e):
            _, recents = _assoc_scan(state0, det_p0, e)
            return e + recents["boxes"].sum().astype(e.dtype)
        report("scan", timed(s_scan, emb0))

    if "engine" in stages:
        @jax.jit
        def s_all(fr):
            d, f = predictor._infer_impl(predictor.params, fr)
            d, emb = _prepare_batch(d, f["p2"])
            _, recents = _assoc_scan(state0, d, emb)
            return fr + (recents["boxes"].sum()).astype(jnp.uint8)
        report("engine", timed(s_all, frames))

    if "fused" in stages:
        # BASELINE.json config 5: "Full fused pipeline — DCNN detect +
        # triplet re-ID tracking + ArUco on dynamic 4K".  Both methods
        # consume the same frame batch inside ONE jit (the paper's
        # cross-validation run, both measurement systems live).
        from apse_uav_tpu.aruco.pipeline import (
            ArucoPipeline, ArucoPipelineConfig, init_carry,
        )
        from apse_uav_tpu.core.camera import load_camera_params

        mtx, dist = load_camera_params(f"{REPO}/data/cam_params.json")
        h_, w_ = orig_hw
        mtx = mtx * np.array(
            [[w_ / 3840, 1, w_ / 3840], [1, h_ / 2160, h_ / 2160], [1, 1, 1.0]]
        )
        acfg = ArucoPipelineConfig(use_pallas_preproc=on_tpu)
        apipe = ArucoPipeline(mtx, dist, (w_, h_), acfg)
        acarry0 = init_carry(acfg)

        @jax.jit
        def s_fused_impl(params_, fr):
            # fr is (B, H, W, 3) HWC u8 for the tracker; ArUco wants planar.
            # params_ is an ARGUMENT: captured params embed ~176 MB of HLO
            # constants, which together with the ArUco remap tables
            # overflow the tunnel's remote-compile request (HTTP 413).
            d, f = predictor._infer_impl(params_, fr)
            d, emb = _prepare_batch(d, f["p2"])
            _, recents = _assoc_scan(state0, d, emb)
            af = apipe.front(jnp.transpose(fr, (0, 3, 1, 2)))
            firsts = jnp.zeros(fr.shape[0], bool).at[0].set(True)
            _, aout = apipe.scan(
                acarry0, af, firsts, jnp.zeros((fr.shape[0], 17), jnp.int32)
            )
            bump = (
                recents["boxes"].sum() + aout["dist_aruco"].sum()
            ).astype(jnp.uint8) | jnp.uint8(1)
            return fr + bump

        def s_fused(fr):
            return s_fused_impl(predictor.params, fr)
        report("fused", timed(s_fused, frames))

    if "engine_bf16" in stages:
        cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
        pred16 = TrackPredictor(cfg16, params, orig_hw)

        @jax.jit
        def s_all16(fr):
            d, f = pred16._infer_impl(pred16.params, fr)
            d, emb = _prepare_batch(d, f["p2"].astype(jnp.float32))
            _, recents = _assoc_scan(state0, d, emb)
            return fr + (recents["boxes"].sum()).astype(jnp.uint8)
        report("engine_bf16", timed(s_all16, frames))


if __name__ == "__main__":
    main()
