"""Training loops: detector fine-tune and association-head training.

Equivalents of the reference training CLIs' cores:
* :func:`finetune_detector` — finetune_uav.py:159-297 (optimizer over a
  param subset, periodic COCO evaluation, results.txt, last/bestAP/bestAR
  checkpoints, loss plotting).
* :func:`train_association_head` — train_association_head.py:59-140
  (MOTS batches, SGD 0.01/0.9, batch-hard margin 0.2, per-epoch
  checkpoints, train_info.txt).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from apse_uav_tpu.dcnn.config import ModelConfig
from apse_uav_tpu.dcnn.models.association import AssociationHead
from apse_uav_tpu.dcnn.models.c4 import build_model
from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN
from apse_uav_tpu.evaluation.coco_eval import CocoEvaluator
from apse_uav_tpu.train import checkpoint as ckpt
from apse_uav_tpu.train.optim import build_finetune_optimizer
from apse_uav_tpu.train.steps import association_train_step, detector_train_step


@functools.partial(jax.jit, static_argnames="n")
def _split_chain(rng, n: int):
    """n sequential jax.random.split steps in ONE jitted call.

    Returns (advanced rng, (n, 2) subkeys) — the exact stream the
    single-step loop's per-iteration ``rng, sub = split(rng)`` produces.
    """
    def body(r, _):
        r2 = jax.random.split(r)
        return r2[0], r2[1]

    rng, subs = jax.lax.scan(body, rng, None, length=n)
    return rng, subs


def evaluate_detector(model: MaskRCNN, params, eval_batches: Iterable, max_images: int | None = None) -> dict[str, float]:
    """COCO AP over an eval loader (finetune_uav.py do_test:111-154)."""
    infer = jax.jit(lambda p, x: model.apply({"params": p}, x, mode="inference")[0])
    ev = CocoEvaluator()
    image_id = 0
    for images, gt in eval_batches:
        dets = infer(params, jnp.asarray(images))
        dets = jax.tree_util.tree_map(np.asarray, dets)
        for b in range(images.shape[0]):
            for g in range(gt["boxes"].shape[1]):
                if not gt["valid"][b, g]:
                    continue
                x1, y1, x2, y2 = gt["boxes"][b, g]
                ev.add_ground_truth(
                    [{
                        "image_id": image_id,
                        "category_id": int(gt["classes"][b, g]),
                        "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                    }]
                )
            for d in range(dets["boxes"].shape[1]):
                if not dets["valid"][b, d]:
                    continue
                x1, y1, x2, y2 = dets["boxes"][b, d]
                ev.add_detections(
                    [{
                        "image_id": image_id,
                        "category_id": int(dets["classes"][b, d]),
                        "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                        "score": float(dets["scores"][b, d]),
                    }]
                )
            image_id += 1
            if max_images is not None and image_id >= max_images:
                return ev.summarize()
    return ev.summarize()


def finetune_detector(
    model_cfg: ModelConfig,
    train_batches: Iterable,
    eval_batches_fn: Callable[[], Iterable],
    workdir: str,
    max_iter: int = 1000,
    to_train=("proposal_generator", "roi_heads"),
    lr: float = 0.02,
    test_period: int = 50,
    init_params: Any | None = None,
    resume: bool = True,
    seed: int = 0,
    log_fn: Callable[[str], None] = print,
    steps_per_call: int = 1,
) -> Any:
    """Returns final params.  Checkpoints + results.txt land in ``workdir``.

    ``steps_per_call`` > 1 runs that many optimizer steps per jit call via
    ``lax.scan`` over stacked batches: per-call dispatch overhead (arg
    marshalling of the ~500-leaf params+opt-state trees — ~0.1 s/call
    through a remote-execution tunnel, measured round 5) amortizes across
    the chunk.  Eval/checkpoint cadence is preserved: chunks never cross a
    ``test_period`` or ``max_iter`` boundary (shorter chunks run there).
    """
    model = build_model(model_cfg)
    it = iter(train_batches)
    images0, gt0 = next(it)
    if init_params is None:
        init_params = jax.jit(
            lambda rng: model.init(rng, jnp.asarray(images0[:1]), mode="inference")["params"]
        )(jax.random.PRNGKey(seed))
    params = init_params
    # Linear LR warmup (detectron2 WarmupMultiStepLR default behavior).
    from apse_uav_tpu.train.optim import warmup_multistep_schedule

    schedule = warmup_multistep_schedule(
        lr, steps=(), warmup_iters=min(500, max(max_iter // 10, 1))
    )
    tx = build_finetune_optimizer(params, to_train, lr=schedule)
    opt_state = tx.init(params)
    manager = ckpt.CheckpointManager(workdir)
    iteration = 0
    if resume:
        state = manager.resume({"params": params, "opt_state": opt_state, "iteration": 0,
                                "best_ap": -np.inf, "best_ar": -np.inf})
        if state is not None:
            params, opt_state = state["params"], state["opt_state"]
            iteration = int(state["iteration"])
            log_fn(f"resumed at iteration {iteration}")

    step = jax.jit(functools.partial(
        detector_train_step, model, tx,
        freeze_backbone="backbone" not in to_train,
    ))

    @functools.partial(jax.jit, static_argnames=())
    def scan_steps(params_, opt_state_, imagesK, gtK, rngs):
        def body(carry, xs):
            p_, s_ = carry
            im, g, rr = xs
            p_, s_, losses = detector_train_step(
                model, tx, p_, s_, im, g, rr,
                freeze_backbone="backbone" not in to_train,
            )
            return (p_, s_), losses

        (params_, opt_state_), losses = jax.lax.scan(body, (params_, opt_state_), (imagesK, gtK, rngs))
        return params_, opt_state_, jax.tree_util.tree_map(lambda v: v[-1], losses)
    rng = jax.random.PRNGKey(seed + 1)
    results_path = os.path.join(workdir, "results.txt")
    # Double-buffered device feed: the current batch is already on device
    # when its step dispatches; the NEXT batch's host load + host->device
    # transfer overlap the in-flight step (JAX dispatch is asynchronous, so
    # device_put and next(it) below run while the device crunches).  The
    # reference hides this latency behind torch DataLoader worker processes
    # (UAV_utils.py:242-262); on a TPU host the overlap-by-async-dispatch
    # form needs no extra processes.
    t0 = time.time()

    def eval_and_checkpoint(losses):
        losses = jax.tree_util.tree_map(float, losses)
        stats = evaluate_detector(model, params, eval_batches_fn())
        stats = {**stats, **losses}
        ckpt.append_results_line(results_path, iteration, stats)
        manager.save(
            {"params": params, "opt_state": opt_state, "iteration": iteration},
            ap=stats["AP"], ar=stats["AR100"],
        )
        ckpt.plot_training_results(results_path)
        log_fn(
            f"iter {iteration}: AP={stats['AP']:.4f} AR={stats['AR100']:.4f} "
            f"loss={losses['loss_total']:.4f} ({time.time() - t0:.1f}s)"
        )

    k = max(int(steps_per_call), 1)
    if k > 1:
        pending = (np.asarray(images0), jax.tree_util.tree_map(np.asarray, gt0))
        last_eval_iter = iteration
        losses = None
        while iteration < max_iter:
            # Chunks never cross an eval/checkpoint boundary.
            boundary = min(max_iter, ((iteration // test_period) + 1) * test_period)
            ims, gts = [], []
            while len(ims) < min(k, boundary - iteration):
                if pending is not None:
                    b, pending = pending, None
                else:
                    try:
                        b = next(it)
                    except StopIteration:
                        max_iter = iteration + len(ims)
                        break
                ims.append(np.asarray(b[0]))
                gts.append(jax.tree_util.tree_map(np.asarray, b[1]))
            if not ims:
                # Iterable exhausted exactly at a chunk boundary: the
                # single-step path always checkpoints at exhaustion
                # (iteration == max_iter there); match it.
                if losses is not None and last_eval_iter != iteration:
                    eval_and_checkpoint(losses)
                break
            chunk = len(ims)
            imagesK = jax.device_put(np.stack(ims))
            gtK = jax.device_put(jax.tree_util.tree_map(lambda *vs: np.stack(vs), *gts))
            # Reproduce the single-step loop's split chain exactly (the
            # committed learning-regression trajectories are pinned to this
            # stream; equality-tested).  One jitted call per chunk — k
            # host-side splits would each pay a dispatch round-trip.
            rng, rngs = _split_chain(rng, chunk)
            if chunk == 1:
                params, opt_state, losses = step(
                    params, opt_state, imagesK[0],
                    jax.tree_util.tree_map(lambda v: v[0], gtK), rngs[0])
            else:
                params, opt_state, losses = scan_steps(params, opt_state, imagesK, gtK, rngs)
            iteration += chunk
            if iteration % test_period == 0 or iteration == max_iter:
                eval_and_checkpoint(losses)
                last_eval_iter = iteration
        return params

    dev_batch = (
        jax.device_put(jnp.asarray(images0)),
        jax.device_put(jax.tree_util.tree_map(jnp.asarray, gt0)),
    )
    while iteration < max_iter:
        images, gt = dev_batch
        rng, sub = jax.random.split(rng)
        params, opt_state, losses = step(params, opt_state, images, gt, sub)
        iteration += 1
        dev_batch = None
        if iteration < max_iter:
            try:
                nb = next(it)
            except StopIteration:
                max_iter = iteration  # finite iterable exhausted
            else:
                dev_batch = (
                    jax.device_put(jnp.asarray(nb[0])),
                    jax.device_put(jax.tree_util.tree_map(jnp.asarray, nb[1])),
                )
        if iteration % test_period == 0 or iteration == max_iter:
            eval_and_checkpoint(losses)
    return params


def train_association_head(
    batch_fn: Callable[[int], tuple[np.ndarray, np.ndarray]],
    num_batches: int,
    workdir: str,
    epochs: int = 10,
    embedding_dim: int = 128,
    roi_feature_shape: tuple[int, int, int] = (256, 8, 8),
    lr: float = 0.01,
    momentum: float = 0.9,
    margin: float = 0.2,
    seed: int = 0,
    log_fn: Callable[[str], None] = print,
) -> Any:
    """batch_fn(i) -> (ids (N,), rois (N, C, R, R)); returns trained params."""
    head = AssociationHead(embedding_dim=embedding_dim)
    c, r, _ = roi_feature_shape
    params = head.init(jax.random.PRNGKey(seed), jnp.zeros((1, c, r, r)))["params"]
    tx = optax.sgd(lr, momentum=momentum)
    opt_state = tx.init(params)
    step = jax.jit(functools.partial(association_train_step, head, tx), static_argnames=())
    os.makedirs(workdir, exist_ok=True)
    info_path = os.path.join(workdir, "train_info.txt")
    cap = 0
    for epoch in range(epochs):
        epoch_losses = []
        for i in range(num_batches):
            ids, rois = batch_fn(i)
            n = len(ids)
            if n < 2:
                continue
            cap = max(cap, 1 << (n - 1).bit_length())  # pad to power of two
            ids_p = np.zeros(cap, np.int64)
            rois_p = np.zeros((cap, *rois.shape[1:]), np.float32)
            valid = np.zeros(cap, bool)
            ids_p[:n], rois_p[:n], valid[:n] = ids, rois, True
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(rois_p), jnp.asarray(ids_p), jnp.asarray(valid), margin
            )
            epoch_losses.append(float(loss))
        mean_loss = float(np.mean(epoch_losses)) if epoch_losses else float("nan")
        ckpt.save_state(workdir, f"epoch_{epoch}", {"params": params, "epoch": epoch})
        with open(info_path, "a") as f:
            f.write(f"epoch {epoch}: mean_loss {mean_loss:.6f}\n")
        log_fn(f"association epoch {epoch}: loss {mean_loss:.4f}")
    return params
