"""Mask-head-only fine-tuning with GT proposals
(dcnn/scripts/train/finetune_segmentation.py equivalent).

The RPN is bypassed (PrecomputedProposals regime, reference :82-93), only
mask-head params train (:155), data is split into K folds (:188-199), and
the trained mask head can be grafted back into a full detector checkpoint
(merge_full_mask_rcnn, :53-61 — see --merge_into).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--coco_json", required=True, help="COCO json with RLE segmentations")
    p.add_argument("--coco_images", required=True)
    p.add_argument("--workdir", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--merge_into", default=None, help="detector checkpoint to graft the trained mask head into")
    p.add_argument("--merge_out", default=None, help="output .pkl for the merged checkpoint")
    p.add_argument("--depth", type=int, default=101, choices=(50, 101))
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--max_iter", type=int, default=500)
    p.add_argument("--test_period", type=int, default=50)
    p.add_argument("--lr", type=float, default=0.002)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--kfold", type=int, default=5)
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--train_size", type=int, nargs=2, default=(768, 1344))
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import pickle

    import jax
    import jax.numpy as jnp

    from apse_uav_tpu.data import generate_coco_dataset_dictionaries
    from apse_uav_tpu.data.loader import DetectionLoader, LoaderConfig
    from apse_uav_tpu.dcnn.config import mask_rcnn_r50_fpn, mask_rcnn_r101_fpn
    from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN
    from apse_uav_tpu.dcnn import weights as W
    from apse_uav_tpu.train.loop import finetune_detector
    from apse_uav_tpu.train.steps import detector_train_step

    dicts = generate_coco_dataset_dictionaries(args.coco_json, args.coco_images)
    fold = len(dicts) // max(args.kfold, 1)
    lo, hi = args.fold * fold, (args.fold + 1) * fold
    val_dicts = dicts[lo:hi]
    train_dicts = dicts[:lo] + dicts[hi:]

    make = mask_rcnn_r50_fpn if args.depth == 50 else mask_rcnn_r101_fpn
    cfg = make(num_classes=args.num_classes)
    model = MaskRCNN(cfg=cfg)
    init_params = jax.jit(
        lambda rng: model.init(rng, jnp.zeros((1, 64, 64, 3)), mode="inference")["params"]
    )(jax.random.PRNGKey(0))
    if args.weights:
        flat = W.map_detectron2_weights(W.load_torch_file(args.weights), args.depth, True)
        init_params, missing, _ = W.load_into_params(init_params, flat)
        print(f"loaded {args.weights}; {len(missing)} params left at init")

    lcfg = LoaderConfig(train_size=tuple(args.train_size), batch_size=args.batch_size, mask_size=28)

    # GT-proposal training: swap the loss mode inside the step.
    def gt_prop_step(model, tx, params, opt_state, images, gt, rng):
        import optax

        def loss_fn(p):
            losses = model.apply(
                {"params": p}, images, mode="losses_gt_proposals", gt=gt, rng=rng
            )
            return sum(losses.values()), losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {**losses, "loss_total": total}

    import apse_uav_tpu.train.loop as loop_mod
    import apse_uav_tpu.train.steps as steps_mod

    orig_step = steps_mod.detector_train_step
    steps_mod.detector_train_step = gt_prop_step
    loop_mod.detector_train_step = gt_prop_step
    try:
        params = finetune_detector(
            cfg,
            iter(DetectionLoader(train_dicts, lcfg, training=True)),
            lambda: DetectionLoader(val_dicts, lcfg, training=False),
            args.workdir,
            max_iter=args.max_iter,
            to_train=("mask_head",),
            lr=args.lr,
            test_period=args.test_period,
            init_params=init_params,
        )
    finally:
        steps_mod.detector_train_step = orig_step
        loop_mod.detector_train_step = orig_step

    if args.merge_into and args.merge_out:
        det_flat = W.map_detectron2_weights(
            W.load_torch_file(args.merge_into), args.depth, True
        )
        trained_flat = W.flatten(jax.tree_util.tree_map(lambda x: __import__("numpy").asarray(x), params))
        merged = W.merge_mask_head(det_flat, trained_flat)
        with open(args.merge_out, "wb") as f:
            pickle.dump({"model": merged, "__author__": "apse_uav_tpu"}, f)
        print(f"merged mask head into {args.merge_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
