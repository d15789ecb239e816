"""CLI smoke tests (help/parsers) + mask geometry + misc utils."""

import importlib
import json
import os

import numpy as np
import pytest

CLI_MODULES = [
    "apse_uav_tpu.cli.aruco_detect",
    "apse_uav_tpu.cli.track_uav",
    "apse_uav_tpu.cli.tracker_test",
    "apse_uav_tpu.cli.mots_eval",
    "apse_uav_tpu.cli.mots_vis",
    "apse_uav_tpu.cli.images_to_txt",
    "apse_uav_tpu.cli.create_coco_annotations",
    "apse_uav_tpu.cli.finetune_uav",
    "apse_uav_tpu.cli.finetune_segmentation",
    "apse_uav_tpu.cli.finetune_faster_rcnn_aerial",
    "apse_uav_tpu.cli.finetune_coco_dataset",
    "apse_uav_tpu.cli.train_association_head",
    "apse_uav_tpu.cli.detector_test",
    "apse_uav_tpu.cli.association_head_test",
    "apse_uav_tpu.cli.add_mask_head",
]


@pytest.mark.parametrize("module", CLI_MODULES)
def test_cli_imports(module):
    importlib.import_module(module)


@pytest.mark.parametrize(
    "module",
    [m for m in CLI_MODULES if m.rsplit(".", 1)[1] in
     ("aruco_detect", "track_uav", "tracker_test", "finetune_uav", "finetune_segmentation", "train_association_head")],
)
def test_cli_help_exits_zero(module):
    mod = importlib.import_module(module)
    with pytest.raises(SystemExit) as e:
        mod.build_parser().parse_args(["--help"])
    assert e.value.code == 0


def test_mask_geometry_reference_semantics():
    from apse_uav_tpu.utils.mask_geometry import (
        compute_closest_point,
        compute_masks_iou,
        get_mask_centroid,
        translate_and_crop_mask,
    )

    m = np.zeros((10, 12), bool)
    m[2:6, 3:9] = True  # rows 2-5, cols 3-8
    # 1-indexed centroid: x = floor(mean(cols+1)) = floor(mean(4..9)) = 6
    cx, cy = get_mask_centroid(m)
    assert (cx, cy) == (6.0, 4.0)
    # closest point to (1, 1): pixel (3,2) -> 1-indexed (4, 3)
    assert compute_closest_point(m, (1, 1)) == (4.0, 3.0)
    moved = translate_and_crop_mask(m, (2, 1))
    assert moved[3, 5] and not moved[2, 3]
    # identical shapes, translated -> aligned IoU 1.0
    assert compute_masks_iou(m, translate_and_crop_mask(m, (3, 2))) == pytest.approx(1.0)


def test_dcnn_log_roundtrip(tmp_path):
    from apse_uav_tpu.utils.mask_geometry import dcnn_log_line, write_dcnn_log
    from apse_uav_tpu.utils.csv_io import read_centroid_data

    recent = {
        "valid": np.array([True, True]),
        "ids": np.array([1, 4]),
        "boxes": np.array([[10.0, 10.0, 30.0, 30.0], [50.0, 40.0, 80.0, 70.0]]),
        "scores": np.array([0.9, 0.9]),
        "classes": np.array([0, 0]),
        "masks": np.ones((2, 28, 28), np.float32),
    }
    lines = []
    max_id = 0
    for frame in range(3):
        line, highest = dcnn_log_line(recent, host_id=4, frame_idx=frame, image_hw=(100, 120))
        lines.append(line)
        max_id = max(max_id, highest)
    path = str(tmp_path / "log.csv")
    write_dcnn_log(path, lines, host_id=4, max_obj_id=max_id)
    rows = read_centroid_data(path)
    assert rows.shape == (3, 17)
    # host (id 4) centroid present in its columns (cols 13-16); id 1 in 1-4.
    assert rows[0][13] > 0 and rows[0][1] > 0
    # absent ids 2, 3 are zero-filled
    assert rows[0][5] == 0 and rows[0][9] == 0


def test_create_coco_annotations(tmp_path):
    from apse_uav_tpu.cli.create_coco_annotations import convert

    csv = tmp_path / "labels.csv"
    csv.write_text("car,1,2,10,8,img1.png,64,48\nbus,5,6,20,10,img1.png,64,48\n")
    out = tmp_path / "ann.json"
    coco = convert(str(csv), str(out))
    assert len(coco["images"]) == 1 and len(coco["annotations"]) == 2
    data = json.loads(out.read_text())
    assert data["annotations"][1]["category_id"] == 2


def test_visualizer_draws():
    from apse_uav_tpu.utils.visualizer import TrackVisualizer

    frame = np.zeros((50, 60, 3), np.uint8)
    recent = {
        "valid": np.array([True]),
        "ids": np.array([3]),
        "boxes": np.array([[5.0, 5.0, 25.0, 30.0]]),
        "scores": np.array([0.8]),
        "classes": np.array([0]),
        "masks": np.ones((1, 28, 28), np.float32),
    }
    vis = TrackVisualizer()
    out = vis.draw(frame, recent)
    assert out.sum() > 0
    # persistent color for the same id
    c1 = vis._color(3).copy()
    vis.draw(frame, recent)
    assert (vis._color(3) == c1).all()


def test_videowriter_natural_sort(tmp_path):
    from apse_uav_tpu.utils.videowriter import natural_sort

    names = ["img10.png", "img2.png", "img1.png"]
    assert natural_sort(names) == ["img1.png", "img2.png", "img10.png"]
