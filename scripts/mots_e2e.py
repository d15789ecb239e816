#!/usr/bin/env python
"""End-to-end MOTS artifact: fine-tune -> track -> export -> evaluate.

Proves the whole SURVEY §3.5 call stack on one synthetic KITTI-MOTS-format
sequence, exactly as the reference's run_mots_evaluation.sh drives it
(/root/reference/dcnn/scripts/tests/run_mots_evaluation.sh:1-3):

  1. fine-tune a detector on synthetic scenes (the committed
     learning-regression recipe, masks ON) and save a native checkpoint;
  2. render a KITTI-MOTS-format sequence (images + uint16 GT instance
     PNGs + seqmap) with two moving class-0 objects (-> MOTS pedestrians);
  3. run ``cli.tracker_test --mots_evaluation`` (the real CLI) with the
     checkpoint -> per-frame uint16 result PNGs;
  4. ``evaluation.mots.run_eval`` on results vs GT -> MOTS_r05.json,
     asserting an sMOTSA floor.

Usage: python scripts/mots_e2e.py [--workdir DIR] [--out MOTS_r05.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

H = W = 128
N_FRAMES = 16
SMOTSA_FLOOR = 0.4


def _texture(rng, h=H, w=W):
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        128 + 14 * (np.sin(xx / 7.0) * np.cos(yy / 5.0))[:, :, None]
        + rng.normal(0, 6, (h, w, 1))
    ).astype(np.float32)
    return np.repeat(img, 3, axis=-1)


def _paint(img, x, y, s, cls):
    if cls == 0:  # bright square
        img[y : y + s, x : x + s] = 245.0
    else:  # dark ring
        img[y : y + s, x : x + s] = 25.0
        img[y + s // 4 : y + s - s // 4, x + s // 4 : x + s - s // 4] = 128.0


def train_scenes(b=2, g=4, seed=0):
    """The committed learning-regression scene distribution, masks ON."""
    rng = np.random.default_rng(seed)
    while True:
        images = np.stack([_texture(rng) for _ in range(b)])
        gt = {
            "boxes": np.zeros((b, g, 4), np.float32),
            "classes": np.zeros((b, g), np.int32),
            "valid": np.zeros((b, g), bool),
            "masks": np.zeros((b, g, H, W), np.float32),
        }
        for i in range(b):
            n = int(rng.integers(1, 3))
            for j in range(n):
                s = int(rng.integers(28, 39))
                x = int(rng.integers(2, W - s - 2))
                y = int(rng.integers(2, H - s - 2))
                cls = int(rng.integers(0, 2))
                _paint(images[i], x, y, s, cls)
                gt["boxes"][i, j] = [x, y, x + s, y + s]
                gt["classes"][i, j] = cls
                gt["valid"][i, j] = True
                gt["masks"][i, j, y : y + s, x : x + s] = 1.0
        yield images, gt


def detector_config():
    from apse_uav_tpu.dcnn.config import mask_rcnn_r50_fpn

    cfg = mask_rcnn_r50_fpn(num_classes=2)
    return dataclasses.replace(
        cfg,
        input=dataclasses.replace(
            cfg.input, pixel_mean=(128.0,) * 3, pixel_std=(64.0,) * 3,
            min_size_test=H, max_size_test=max(H, W) + 80,
        ),
        mask_on=True,
        rpn=dataclasses.replace(
            cfg.rpn, pre_nms_topk_test=64, post_nms_topk_test=64,
            pre_nms_topk_train=128, post_nms_topk_train=64, batch_size_per_image=64,
        ),
        roi=dataclasses.replace(
            cfg.roi, num_classes=2, detections_per_image=8, batch_size_per_image=32,
            score_thresh_test=0.5,
        ),
    )


def make_sequence(workdir: str):
    """Two class-0 squares on distinct linear paths + one class-1 ring
    (detected but dropped by the MOTS exporter — and absent from GT)."""
    import cv2

    img_dir = os.path.join(workdir, "images", "0000")
    gt_dir = os.path.join(workdir, "gt", "0000")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    rng = np.random.default_rng(77)
    objs = [  # (track, cls, size, x0, y0, dx, dy)
        (1, 0, 32, 6, 10, 5, 1),
        (2, 0, 36, 86, 76, -5, 1),
        (3, 1, 30, 10, 84, 5, -2),
    ]
    for k in range(N_FRAMES):
        img = _texture(rng)
        gt = np.zeros((H, W), np.uint16)
        for tid, cls, s, x0, y0, dx, dy in objs:
            x, y = x0 + dx * k, y0 + dy * k
            _paint(img, x, y, s, cls)
            if cls == 0:  # class 0 -> MOTS pedestrian (COCO_TO_MOTS: 0 -> 2)
                gt[y : y + s, x : x + s] = 2000 + tid
        cv2.imwrite(os.path.join(img_dir, f"{k:06d}.png"), img.astype(np.uint8))
        cv2.imwrite(os.path.join(gt_dir, f"{k:06d}.png"), gt)
    seqmap = os.path.join(workdir, "seqmap.txt")
    with open(seqmap, "w") as f:
        f.write(f"0000 empty 000000 {N_FRAMES - 1}\n")
    return os.path.join(workdir, "images"), os.path.join(workdir, "gt"), seqmap


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/mots_e2e")
    ap.add_argument("--out", default=os.path.join(REPO, "MOTS_r05.json"))
    ap.add_argument("--max_iter", type=int, default=120)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.workdir, exist_ok=True)
    ckpt_dir = os.path.join(args.workdir, "ckpt")

    from apse_uav_tpu.train.loop import finetune_detector

    cfg = detector_config()
    print("[mots_e2e] fine-tuning detector...", flush=True)
    eval_batches = [next(train_scenes(seed=1000 + i)) for i in range(2)]
    finetune_detector(
        cfg,
        train_scenes(seed=0),
        lambda: eval_batches,
        ckpt_dir,
        max_iter=args.max_iter,
        test_period=args.max_iter,
        lr=0.005,
        seed=0,
        log_fn=lambda s: print(f"[mots_e2e] {s}", flush=True),
    )

    print("[mots_e2e] rendering KITTI-MOTS sequence...", flush=True)
    images_root, gt_root, seqmap = make_sequence(args.workdir)

    print("[mots_e2e] running cli.tracker_test --mots_evaluation...", flush=True)
    from apse_uav_tpu.cli import tracker_test

    results_dir = os.path.join(args.workdir, "results")
    rc = tracker_test.main([
        "--mots_evaluation", seqmap,
        "--kitti_root", images_root,
        "--output_dir", results_dir,
        "--checkpoint", os.path.join(ckpt_dir, "last"),
        "--depth", "50",
        "--num_classes", "2",
        "--pixel_norm", "unit",
        "--min_size", str(H), "--max_size", str(max(H, W) + 80),
        "--proposal_topk", "64",
        "--detections", "8",
        "--confidence", "0.5",
        "--association", "bbox_center_dist",
        "--batch", "4",
        "--force_cpu",
    ])
    assert rc == 0

    print("[mots_e2e] evaluating...", flush=True)
    from apse_uav_tpu.evaluation.mots import run_eval

    metrics = run_eval(results_dir, gt_root, seqmap)
    artifact = {
        "config": {
            "frames": N_FRAMES, "size": [H, W], "objects": 2,
            "detector": "R50-FPN fine-tuned from scratch on synthetic scenes "
                        f"({args.max_iter} iters, the committed learning-regression recipe, masks on)",
            "association": "bbox_center_dist",
            "call_stack": "finetune_detector -> cli.tracker_test --mots_evaluation -> "
                          "mots_export.result_image_from_recent -> evaluation.mots.run_eval",
        },
        "metrics": metrics,
        "smotsa_floor": SMOTSA_FLOOR,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2, default=float)
        f.write("\n")
    ped = metrics["pedestrian"]
    print(json.dumps({"sMOTSA": ped.get("sMOTSA"), "MOTSA": ped.get("MOTSA"),
                      "ids": ped.get("id_switches"), "pass": ped.get("sMOTSA", -1) >= SMOTSA_FLOOR},
                     default=float))
    assert ped.get("sMOTSA", -1) >= SMOTSA_FLOOR, ped


if __name__ == "__main__":
    main()
