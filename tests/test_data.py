"""Data pipeline tests over synthetic on-disk fixtures."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from apse_uav_tpu.data import (
    DetectionLoader,
    fabricate_outputs,
    generate_coco_dataset_dictionaries,
    generate_cowc_dataset_dictionaries,
    generate_uav_dataset_dictionaries,
    generate_visdrone_dataset_dictionaries,
)
from apse_uav_tpu.data.loader import LoaderConfig


def _png(path, h, w, value=128):
    Image.fromarray(np.full((h, w, 3), value, np.uint8)).save(path)


def test_visdrone_generator(tmp_path):
    os.makedirs(tmp_path / "images")
    os.makedirs(tmp_path / "annotations")
    _png(tmp_path / "images" / "0000001.png", 40, 60)
    with open(tmp_path / "annotations" / "0000001.txt", "w") as f:
        f.write("10,10,20,15,1,4,0,0\n")  # car
        f.write("5,5,8,8,1,1,0,0\n")  # pedestrian -> class 3
        f.write("1,1,4,4,1,0,0,0\n")  # ignored region -> dropped
    d = generate_visdrone_dataset_dictionaries(str(tmp_path))
    assert len(d) == 1
    assert d[0]["height"] == 40 and d[0]["width"] == 60
    cats = [a["category_id"] for a in d[0]["annotations"]]
    assert cats == [0, 3]
    outs = fabricate_outputs(d[0])
    assert all(o["score"] == 1 for o in outs) and len(outs) == 2


def test_uavdt_generator(tmp_path):
    seq = tmp_path / "M0101"
    os.makedirs(seq)
    _png(seq / "img000001.jpg", 32, 48)
    _png(seq / "img000002.jpg", 32, 48)
    rows = [
        "1,7,2,3,10,8,0,0,1",   # frame 1, car (class 1 -> 0)
        "1,8,5,6,9,9,0,2,1",    # occlusion 2 -> dropped
        "2,7,3,3,10,8,0,0,2",   # frame 2, truck (class 2 -> 1)
    ]
    with open(tmp_path / "M0101_gt_whole.txt", "w") as f:
        f.write("\n".join(rows))
    d = generate_uav_dataset_dictionaries(str(tmp_path))
    assert len(d) == 2
    assert [a["category_id"] for a in d[0]["annotations"]] == [0]
    assert [a["category_id"] for a in d[1]["annotations"]] == [1]


def test_uavdt_ignored_sequence(tmp_path):
    seq = tmp_path / "M0601"  # globally ignored
    os.makedirs(seq)
    _png(seq / "img000001.jpg", 16, 16)
    with open(tmp_path / "M0601_gt_whole.txt", "w") as f:
        f.write("1,1,1,1,4,4,0,0,1\n")
    assert generate_uav_dataset_dictionaries(str(tmp_path)) == []


def test_coco_generator_with_mapping(tmp_path):
    _png(tmp_path / "img1.png", 30, 40)
    coco = {
        "images": [{"id": 5, "file_name": "img1.png", "height": 30, "width": 40}],
        "annotations": [
            {"id": 1, "image_id": 5, "category_id": 3, "bbox": [1, 2, 10, 8], "iscrowd": 0},
            {"id": 2, "image_id": 5, "category_id": 99, "bbox": [3, 3, 5, 5], "iscrowd": 0},
        ],
    }
    with open(tmp_path / "ann.json", "w") as f:
        json.dump(coco, f)
    from apse_uav_tpu.data import COCO_CATEGORY_IDS_TO_UAV

    d = generate_coco_dataset_dictionaries(
        str(tmp_path / "ann.json"), str(tmp_path), category_mapping=COCO_CATEGORY_IDS_TO_UAV
    )
    assert len(d) == 1
    assert [a["category_id"] for a in d[0]["annotations"]] == [0]  # coco car -> uav car


def test_cowc_generator(tmp_path):
    _png(tmp_path / "scene.png", 64, 64, value=90)
    ann = np.zeros((64, 64), np.uint8)
    ann[10, 12] = 255
    ann[40, 50] = 255
    Image.fromarray(ann).save(tmp_path / "scene_Annotated_Cars.png")
    d = generate_cowc_dataset_dictionaries(str(tmp_path), box_size=10, tile=64)
    assert len(d) == 1
    boxes = [a["bbox"] for a in d[0]["annotations"]]
    assert len(boxes) == 2
    assert boxes[0][2] == 10 and boxes[0][3] == 10


def test_lighting_augmentation(tmp_path):
    """PCA RandomLighting (UAV_utils.py:341): per-image constant RGB offset
    with covariance V diag((s*lambda)^2) V^T; never perturbs the GT."""
    from apse_uav_tpu.data.loader import (
        LIGHTING_EIGEN_VALS,
        LIGHTING_EIGEN_VECS,
        lighting_delta,
    )

    rng = np.random.default_rng(7)
    scale = 0.2
    deltas = np.stack([lighting_delta(rng, scale) for _ in range(4000)])
    assert np.abs(deltas.mean(axis=0)).max() < 0.01
    want_cov = LIGHTING_EIGEN_VECS @ np.diag((scale * LIGHTING_EIGEN_VALS) ** 2) @ LIGHTING_EIGEN_VECS.T
    got_cov = np.cov(deltas.T)
    assert np.abs(got_cov - want_cov).max() < 0.2 * np.abs(want_cov).max() + 1e-5

    # Applied to an image: a constant per-pixel offset (before clipping).
    for i in range(2):
        _png(tmp_path / f"im{i}.png", 40, 56, value=100 + i)
    dicts = [
        {
            "file_name": str(tmp_path / f"im{i}.png"),
            "image_id": i,
            "height": 40,
            "width": 56,
            "annotations": [
                {"bbox": [4, 4, 16, 12], "bbox_mode": "xywh", "category_id": 0, "is_crowd": 0}
            ],
        }
        for i in range(2)
    ]
    base = dict(train_size=(64, 96), min_size=48, max_size=96, max_gt=4, batch_size=2,
                flip_prob=0.0, aug_range=(1.0, 1.0))
    on = DetectionLoader(dicts, LoaderConfig(**base, lighting_scale=50.0), training=True, seed=3)
    off = DetectionLoader(dicts, LoaderConfig(**base, lighting_scale=0.0), training=True, seed=3)
    (img_on, gt_on), (img_off, gt_off) = next(iter(on)), next(iter(off))
    # GT invariance: lighting is pixel-only, drawn after all geometric draws.
    # (Element 0 only: its preceding rng stream is identical in both loaders;
    # later elements see a shifted stream because lighting consumed draws.)
    np.testing.assert_array_equal(gt_on["boxes"][0], gt_off["boxes"][0])
    np.testing.assert_array_equal(gt_on["valid"][0], gt_off["valid"][0])
    diff = img_on[0] - img_off[0]
    interior = diff[2:30, 2:60]  # unclipped, unpadded region
    assert np.abs(interior).max() > 0.5  # scale=10 visibly moves pixels
    per_channel_spread = interior.std(axis=(0, 1))  # constant per channel
    assert per_channel_spread.max() < 1e-3


def test_detection_loader_fixed_shapes(tmp_path):
    for i in range(4):
        _png(tmp_path / f"im{i}.png", 50, 70, value=50 + i)
    dicts = [
        {
            "file_name": str(tmp_path / f"im{i}.png"),
            "image_id": i,
            "height": 50,
            "width": 70,
            "annotations": [
                {"bbox": [5, 5, 20, 15], "bbox_mode": "xywh", "category_id": 1, "is_crowd": 0}
            ],
        }
        for i in range(4)
    ]
    cfg = LoaderConfig(train_size=(96, 128), min_size=64, max_size=128, max_gt=8, batch_size=2)
    loader = DetectionLoader(dicts, cfg, training=True, seed=0)
    images, gt = next(iter(loader))
    assert images.shape == (2, 96, 128, 3)
    assert gt["boxes"].shape == (2, 8, 4)
    assert gt["valid"].sum() == 2
    b = gt["boxes"][0][gt["valid"][0]][0]
    assert (b[2] - b[0]) > 0 and (b[3] - b[1]) > 0
    # Eval mode terminates.
    ev = DetectionLoader(dicts, cfg, training=False)
    batches = list(ev)
    assert len(batches) == 2


def test_mot_loader(tmp_path):
    import jax.numpy as jnp

    seq = tmp_path / "MOT-02"
    os.makedirs(seq / "img1")
    os.makedirs(seq / "gt")
    for f in range(1, 5):
        _png(seq / "img1" / f"{f:06d}.jpg", 32, 48)
    with open(seq / "seqinfo.ini", "w") as f:
        f.write("[Sequence]\nseqLength=4\nimWidth=48\nimHeight=32\n")
    with open(seq / "gt" / "gt.txt", "w") as f:
        for fr in range(1, 5):
            f.write(f"{fr},1,2,3,10,8,1,1,1\n")
            f.write(f"{fr},2,20,10,12,9,1,1,1\n")
            f.write(f"{fr},3,1,1,5,5,0,1,1\n")  # conf 0 -> dropped

    from apse_uav_tpu.data.mot import MOTLoader, RoiFeaturesGenerator

    def fake_backbone(images):
        h, w = images.shape[1] // 4, images.shape[2] // 4
        return {"p2": jnp.ones((1, h, w, 6))}

    gen = RoiFeaturesGenerator(fake_backbone, roi_size=4)
    loader = MOTLoader(str(seq), gen, frames_in_batch=2)
    assert loader.num_of_batches == 2
    ids, rois = loader.get_training_batch(0)
    assert ids.tolist() == [1, 2, 1, 2]
    assert rois.shape == (4, 6, 4, 4)


def test_cowc_roi_features_loader(tmp_path):
    """CowcRoiFeaturesLoader (reference cowc_utils.py:87-214): balanced
    50/50-style batches of frozen-trunk ROI features over annotated points,
    with the reference's BGR-channel conventions and box clipping."""
    from apse_uav_tpu.data.cowc import CowcRoiFeaturesLoader

    P = 32
    rgb = np.full((P * 2, P, 3), 120, np.uint8)
    Image.fromarray(rgb).save(tmp_path / "big.png")
    cars = np.zeros((P * 2, P, 3), np.uint8)
    # 3 cars in patch 0 (saturated RED), 2 in patch 1; one at the border to
    # exercise the clip.
    for r, c in ((5, 6), (20, 3), (0, 0), (P + 8, 10), (P + 30, 20)):
        cars[r, c, 0] = 255
    Image.fromarray(cars).save(tmp_path / "big_Annotated_Cars.png")
    neg = np.zeros((P * 2, P, 3), np.uint8)
    for r, c in ((12, 25), (28, 14), (P + 2, 2), (P + 16, 28)):
        neg[r, c, 2] = 255  # saturated BLUE
    Image.fromarray(neg).save(tmp_path / "big_Annotated_Negatives.png")

    import jax.numpy as jnp

    captured = []

    def fake_fn(images, boxes):
        # Record the (padded) boxes; feature = box centre coords + area.
        captured.append(np.asarray(boxes[0]))
        b = boxes[0]
        f = jnp.stack([(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2,
                       (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])], axis=-1)
        return f[None]

    loader = CowcRoiFeaturesLoader(
        fake_fn, str(tmp_path), patch_size=P, bbox_width=4, batch_size=4, chunk=8
    )
    batches = list(loader)
    # Per image: npos=5, nneg=4 across 2 patches -> min=4, batch 2+2 -> 2 batches.
    assert len(batches) == 2
    for feats, labels in batches:
        assert feats.shape == (4, 3) and labels.tolist() == [1, 1, 0, 0]
    # Border car (0,0): box clipped to [0,0,4,4] -> centre (2,2), area 16.
    first_feats = batches[0][0]
    assert any(np.allclose(f, [2, 2, 16]) for f in first_feats)


def test_mask_rcnn_roi_features_mode():
    """MaskRCNN(mode='roi_features') returns the BoxHead FC trunk (B, N, fc_dim)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from apse_uav_tpu.dcnn.config import mask_rcnn_r50_fpn
    from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN

    cfg = mask_rcnn_r50_fpn(num_classes=2)
    cfg = dataclasses.replace(cfg, fpn_channels=32,
                              roi=dataclasses.replace(cfg.roi, box_fc_dim=16, num_classes=2))
    model = MaskRCNN(cfg=cfg)
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    boxes = jnp.asarray([[[4.0, 4.0, 20.0, 20.0], [10.0, 12.0, 30.0, 28.0]]])
    params = model.init(jax.random.PRNGKey(0), images, mode="roi_features", gt={"boxes": boxes})["params"]
    feats = model.apply({"params": params}, images, mode="roi_features", gt={"boxes": boxes})
    assert feats.shape == (1, 2, 16)
    assert np.all(np.isfinite(np.asarray(feats)))
