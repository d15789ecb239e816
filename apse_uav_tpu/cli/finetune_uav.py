"""Detector fine-tuning on VisDrone + COCO vehicle data
(dcnn/scripts/train/finetune_uav.py equivalent).

Trains RPN + ROI heads of a 4-class Mask R-CNN (backbone frozen) starting
from a model-zoo checkpoint, with periodic COCO AP evaluation, results.txt,
loss plots, and last/bestAP/bestAR checkpoints.
"""

from __future__ import annotations

import argparse
import dataclasses


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--visdrone_train", default=None, help="VisDrone train dir (images/ + annotations/)")
    p.add_argument("--visdrone_val", default=None)
    p.add_argument("--coco_json", default=None, help="COCO json for extra vehicle data")
    p.add_argument("--coco_images", default=None)
    p.add_argument("--workdir", required=True)
    p.add_argument("--weights", default=None, help="initial checkpoint (.pkl/.pth)")
    p.add_argument("--depth", type=int, default=101, choices=(50, 101))
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--max_iter", type=int, default=1000)
    p.add_argument("--test_period", type=int, default=50)
    p.add_argument("--lr", type=float, default=0.02)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--train_size", type=int, nargs=2, default=(768, 1344))
    p.add_argument("--to_train", nargs="+", default=["proposal_generator", "roi_heads"])
    p.add_argument("--no_resume", action="store_true")
    p.add_argument("--eval_images", type=int, default=100, help="cap eval set size per test")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp

    from apse_uav_tpu.data import (
        COCO_CATEGORY_IDS_TO_UAV,
        generate_coco_dataset_dictionaries,
        generate_visdrone_dataset_dictionaries,
    )
    from apse_uav_tpu.data.loader import DetectionLoader, LoaderConfig
    from apse_uav_tpu.dcnn.config import mask_rcnn_r50_fpn, mask_rcnn_r101_fpn
    from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN
    from apse_uav_tpu.dcnn import weights as W
    from apse_uav_tpu.train.loop import finetune_detector

    train_dicts: list[dict] = []
    val_dicts: list[dict] = []
    if args.visdrone_train:
        train_dicts += generate_visdrone_dataset_dictionaries(args.visdrone_train)
    if args.coco_json:
        train_dicts += generate_coco_dataset_dictionaries(
            args.coco_json, args.coco_images, category_mapping=COCO_CATEGORY_IDS_TO_UAV
        )
    if args.visdrone_val:
        val_dicts += generate_visdrone_dataset_dictionaries(args.visdrone_val)
    if not train_dicts:
        raise SystemExit("no training data given")
    val_dicts = val_dicts or train_dicts[: args.eval_images]

    lcfg = LoaderConfig(
        train_size=tuple(args.train_size), batch_size=args.batch_size, mask_size=28
    )
    make = mask_rcnn_r50_fpn if args.depth == 50 else mask_rcnn_r101_fpn
    cfg = make(num_classes=args.num_classes)
    cfg = dataclasses.replace(cfg, mask_on=False)  # reference: MASK_ON False (finetune_uav.py:92)

    init_params = None
    if args.weights:
        model = MaskRCNN(cfg=cfg)
        init_params = jax.jit(
            lambda rng: model.init(rng, jnp.zeros((1, 64, 64, 3)), mode="inference")["params"]
        )(jax.random.PRNGKey(0))
        flat = W.map_detectron2_weights(W.load_torch_file(args.weights), args.depth, cfg.mask_on)
        init_params, missing, _ = W.load_into_params(init_params, flat)
        print(f"loaded {args.weights}; {len(missing)} params left at init")

    finetune_detector(
        cfg,
        iter(DetectionLoader(train_dicts, lcfg, training=True)),
        lambda: DetectionLoader(val_dicts[: args.eval_images], lcfg, training=False),
        args.workdir,
        max_iter=args.max_iter,
        to_train=tuple(args.to_train),
        lr=args.lr,
        test_period=args.test_period,
        init_params=init_params,
        resume=not args.no_resume,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
