"""Toy COCO-dataset fine-tune demo (dcnn/scripts/train/finetune_coco_dataset.py).

End-to-end check of the training path on any small COCO-format dataset
(the reference uses the fruits_nuts toy set)."""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--coco_json", required=True)
    p.add_argument("--coco_images", required=True)
    p.add_argument("--workdir", required=True)
    p.add_argument("--num_classes", type=int, default=3)
    p.add_argument("--max_iter", type=int, default=300)
    p.add_argument("--lr", type=float, default=0.02)
    p.add_argument("--batch_size", type=int, default=2)
    args = p.parse_args(argv)

    from apse_uav_tpu.data import generate_coco_dataset_dictionaries
    from apse_uav_tpu.data.loader import DetectionLoader, LoaderConfig
    from apse_uav_tpu.dcnn.config import mask_rcnn_r50_fpn
    from apse_uav_tpu.train.loop import finetune_detector

    dicts = generate_coco_dataset_dictionaries(args.coco_json, args.coco_images)
    cfg = mask_rcnn_r50_fpn(num_classes=args.num_classes)
    lcfg = LoaderConfig(batch_size=args.batch_size, mask_size=28)
    finetune_detector(
        cfg,
        iter(DetectionLoader(dicts, lcfg, training=True)),
        lambda: DetectionLoader(dicts, lcfg, training=False),
        args.workdir,
        max_iter=args.max_iter,
        to_train=("proposal_generator", "roi_heads"),
        lr=args.lr,
        test_period=50,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
