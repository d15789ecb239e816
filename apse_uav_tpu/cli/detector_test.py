"""Detector smoke test on an image directory
(standard_rcnn_detector_test.py / aerial_view_test.py equivalent).

Runs inference on each image and writes annotated copies next to it (or to
--output_dir)."""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", required=True)
    p.add_argument("--weights", required=True)
    p.add_argument("--depth", type=int, default=101, choices=(50, 101))
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--confidence", type=float, default=0.5)
    p.add_argument("--no_mask", action="store_true", help="Faster R-CNN weights (no mask head)")
    p.add_argument("--output_dir", default=None)
    args = p.parse_args(argv)

    import dataclasses

    import cv2
    import jax
    import jax.numpy as jnp

    from apse_uav_tpu.dcnn.config import mask_rcnn_r50_fpn, mask_rcnn_r101_fpn
    from apse_uav_tpu.dcnn.engines import TrackPredictor
    from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN
    from apse_uav_tpu.dcnn import weights as W
    from apse_uav_tpu.utils.visualizer import TrackVisualizer

    make = mask_rcnn_r50_fpn if args.depth == 50 else mask_rcnn_r101_fpn
    cfg = make(num_classes=args.num_classes)
    cfg = dataclasses.replace(cfg, roi=dataclasses.replace(cfg.roi, score_thresh_test=args.confidence))
    if args.no_mask:
        cfg = dataclasses.replace(cfg, mask_on=False)
    model = MaskRCNN(cfg=cfg)
    params = jax.jit(
        lambda rng: model.init(rng, jnp.zeros((1, 64, 64, 3)), mode="inference")["params"]
    )(jax.random.PRNGKey(0))
    flat = W.map_detectron2_weights(W.load_torch_file(args.weights), args.depth, cfg.mask_on)
    params, _, _ = W.load_into_params(params, flat)

    out_dir = args.output_dir or args.images
    os.makedirs(out_dir, exist_ok=True)
    vis = TrackVisualizer()
    predictor = None
    for name in sorted(os.listdir(args.images)):
        if not name.lower().endswith((".jpg", ".png", ".bmp")) or "_det" in name:
            continue
        frame = cv2.imread(os.path.join(args.images, name))
        if predictor is None or predictor.orig_hw != frame.shape[:2]:
            predictor = TrackPredictor(cfg, params, frame.shape[:2])
        dets, _ = predictor(frame[None])
        recent = {
            "valid": np.asarray(dets["valid"][0]),
            "ids": np.arange(dets["boxes"].shape[1]),
            "boxes": np.asarray(dets["boxes"][0]),
            "scores": np.asarray(dets["scores"][0]),
            "classes": np.asarray(dets["classes"][0]),
            "masks": np.asarray(dets["masks"][0]) if "masks" in dets else None,
        }
        if recent["masks"] is None:
            recent.pop("masks")
        drawn = vis.draw(frame, recent)
        stem, ext = os.path.splitext(name)
        cv2.imwrite(os.path.join(out_dir, f"{stem}_det{ext}"), drawn)
        print(f"{name}: {int(recent['valid'].sum())} detections")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
