#!/usr/bin/env python
"""Detector training-step benchmark on the real TPU (VERDICT r3 #3).

Times ``detector_train_step`` (forward + backward + SGD) for the REAL Mask
R-CNN R50-FPN fine-tune config at the reference's training scale (768x1344,
finetune_uav.py:231-246), frozen-backbone and full, and reports step time +
achieved model TFLOP/s vs the v5e roofline (~197 TFLOP/s bf16 / ~99 f32).

Usage: python scripts/bench_train.py [batch=4] [stage ...]
Stages: frozen full assoc  (default: frozen full)
"""

import sys
import time

import numpy as np

REPO = __file__.rsplit("/scripts/", 1)[0]
sys.path.insert(0, REPO)


def main():
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from apse_uav_tpu.dcnn.config import uav_tracker_config
    from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN
    from apse_uav_tpu.train.steps import detector_train_step
    from apse_uav_tpu.train.optim import build_finetune_optimizer

    args = sys.argv[1:]
    batch = int(args[0]) if args and args[0].isdigit() else 4
    stages = [a for a in args if not a.isdigit()] or ["frozen", "full", "frozen16", "full16"]

    on_tpu = jax.devices()[0].platform == "tpu"
    print("platform:", jax.devices()[0].platform)
    if on_tpu:
        h, w, iters = 768, 1344, 8
    else:
        h, w, iters, batch = 256, 448, 2, 2

    cfg = uav_tracker_config(num_classes=4)
    cfg = dataclasses.replace(cfg, depth=50)
    model = MaskRCNN(cfg=cfg)

    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((batch, h, w, 3), jnp.float32)
    nbox = 32
    gt = {
        "boxes": jnp.tile(jnp.asarray([[8.0, 8.0, 72.0, 72.0]]), (batch, nbox, 1))
        + 24.0 * jnp.arange(nbox, dtype=jnp.float32)[None, :, None],
        "classes": jnp.zeros((batch, nbox), jnp.int32),
        "valid": jnp.ones((batch, nbox), bool),
        "masks": jnp.ones((batch, nbox, h, w), jnp.float32),  # full-image GT masks
    }
    gt["boxes"] = jnp.minimum(gt["boxes"], jnp.asarray([w - 9.0, h - 9.0, w - 1.0, h - 1.0]))
    print(f"init params (batch {batch}, {h}x{w})...", flush=True)
    params = jax.jit(
        lambda r, im, g: model.init(r, im, mode="losses", gt=g, rng=r)["params"]
    )(rng, images, gt)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params / 1e6:.1f} M")

    def timed_steps(freeze: bool, label: str, use_model=None, use_params=None, use_gt=None):
        params_ = params if use_params is None else use_params
        gt_ = gt if use_gt is None else use_gt
        if freeze:
            # The reference regime (finetune_uav.py:161): train RPN+ROI only.
            tx = build_finetune_optimizer(params_, ("proposal_generator", "roi_heads"), lr=0.01)
        else:
            tx = build_finetune_optimizer(params_, ("backbone", "proposal_generator", "roi_heads"), lr=0.01)
        opt_state = jax.jit(tx.init)(params_)
        step = jax.jit(
            functools.partial(detector_train_step, use_model or model, tx, freeze_backbone=freeze),
        )
        p, s = params_, opt_state
        print(f"compiling {label}...", flush=True)
        t0 = time.perf_counter()
        p, s, losses = step(p, s, images=images, gt=gt_, rng=rng)
        _ = float(losses["loss_total"])
        print(f"  first step (compile) {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for i in range(iters):
            # params evolve through the optimizer every step — a genuine
            # training chain, no memoization possible.
            p, s, losses = step(p, s, images=images, gt=gt_, rng=jax.random.fold_in(rng, i))
        lt = float(losses["loss_total"])  # host read flushes the chain
        dt = (time.perf_counter() - t0) / iters
        # FLOP estimate: XLA cost analysis of the jitted step.
        try:
            c = step.lower(p, s, images=images, gt=gt_, rng=rng).compile().cost_analysis()
            flops = c.get("flops", 0.0) if isinstance(c, dict) else c[0].get("flops", 0.0)
        except Exception:
            flops = 0.0
        tfs = flops / dt / 1e12 if flops else float("nan")
        print(f"{label}: {dt * 1e3:8.1f} ms/step  ({dt / batch * 1e3:6.1f} ms/image)  "
              f"model flops {flops / 1e12:.2f} T -> {tfs:.1f} TFLOP/s  loss {lt:.3f}")

    if "frozen" in stages:
        timed_steps(True, "frozen-backbone")
    if "full" in stages:
        timed_steps(False, "full")
    # bf16 training compute: the SHIPPED regime (backbone bf16, heads f32,
    # f32 master params, f32 loss-boundary casts — mask_rcnn.losses;
    # all-bf16 heads missed the learning-regression AP50 bar).
    model16 = MaskRCNN(cfg=dataclasses.replace(
        cfg, compute_dtype="bfloat16", head_compute_dtype="float32"))
    if "frozen16" in stages:
        timed_steps(True, "frozen-backbone bf16", use_model=model16)
    if "full16" in stages:
        timed_steps(False, "full bf16", use_model=model16)
    # The reference's FLAGSHIP fine-tune regime is mask OFF
    # (finetune_uav.py:87-97: 4 classes, MASK_ON False) — the mask-on rows
    # above are a superset (they also pay the full-image GT-mask
    # gather+crop); this row is the apples-to-apples finetune_uav number.
    _nomask_setup = {}

    def nomask_setup():
        # Shared by the nomask and scan stages (params init is minutes of
        # compile on this host — never do it twice).
        if not _nomask_setup:
            cfg_nm = dataclasses.replace(
                cfg, mask_on=False, compute_dtype="bfloat16", head_compute_dtype="float32")
            model_nm = MaskRCNN(cfg=cfg_nm)
            gt_nm = {k: v for k, v in gt.items() if k != "masks"}
            params_nm = jax.jit(
                lambda r, im, g: model_nm.init(r, im, mode="losses", gt=g, rng=r)["params"]
            )(rng, images, gt_nm)
            _nomask_setup.update(model=model_nm, gt=gt_nm, params=params_nm)
        return _nomask_setup["model"], _nomask_setup["gt"], _nomask_setup["params"]

    if "full16_nomask" in stages or "nomask" in stages:
        model_nm, gt_nm, params_nm = nomask_setup()
        timed_steps(False, "full bf16 nomask", use_model=model_nm,
                    use_params=params_nm, use_gt=gt_nm)
        timed_steps(True, "frozen bf16 nomask", use_model=model_nm,
                    use_params=params_nm, use_gt=gt_nm)
    # K steps per jit call via lax.scan: a profiler trace of the full
    # nomask step showed ~164 ms of device time inside a ~311 ms wall —
    # the remainder is the tunnel's per-execute RPC marshalling of the
    # ~540-leaf params+opt-state trees, which a production loop amortizes
    # by scanning steps (data double-buffered per chunk).  Wall stays the
    # honest metric: the K sub-steps reuse ONE tiled batch, but params +
    # opt state evolve through every sub-step and across calls, so no two
    # executions are identical and the memoizing tunnel cannot cheat.
    if "scan" in stages:
        K = 4
        model_nm, gt_nm, params_nm = nomask_setup()
        tx = build_finetune_optimizer(
            params_nm, ("backbone", "proposal_generator", "roi_heads"), lr=0.01)
        opt_state = jax.jit(tx.init)(params_nm)
        imagesK = jnp.tile(images[None], (K, 1, 1, 1, 1))
        gtK = jax.tree_util.tree_map(lambda v: jnp.tile(v[None], (K,) + (1,) * v.ndim), gt_nm)

        @jax.jit
        def scan_steps(p, s, imsK, gK, r):
            def body(carry, xs):
                p_, s_ = carry
                im, g, rr = xs
                p_, s_, losses = detector_train_step(
                    model_nm, tx, p_, s_, images=im, gt=g, rng=rr, freeze_backbone=False)
                return (p_, s_), losses["loss_total"]
            rngs = jax.random.split(r, K)
            (p, s), lt = jax.lax.scan(body, (p, s), (imsK, gK, rngs))
            return p, s, lt

        p, s = params_nm, opt_state
        print(f"compiling scan{K} full bf16 nomask...", flush=True)
        t0 = time.perf_counter()
        p, s, lt = scan_steps(p, s, imagesK, gtK, rng)
        _ = float(lt[-1])
        print(f"  first call (compile) {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for i in range(iters):
            p, s, lt = scan_steps(p, s, imagesK, gtK, jax.random.fold_in(rng, i))
        _ = float(lt[-1])
        dt = (time.perf_counter() - t0) / (iters * K)
        print(f"scan{K} full bf16 nomask: {dt * 1e3:8.1f} ms/step  ({dt / batch * 1e3:6.1f} ms/image)")


if __name__ == "__main__":
    main()
