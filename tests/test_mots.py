"""MOTS metrics + export tests on hand-constructed scenarios."""

import numpy as np
import pytest

from apse_uav_tpu.evaluation import rle as rletools
from apse_uav_tpu.evaluation.mots import (
    CLASS_CAR,
    IGNORE_CLASS,
    SegmentedObject,
    compute_mots_metrics,
    load_txt,
    write_sequences,
)
from apse_uav_tpu.evaluation.mots_export import (
    crop_overlapping_masks,
    file_lines_from_recent,
    paste_mask_np,
    result_image_from_recent,
)

H, W = 40, 60


def _obj(x, y, w, h, track, cls=CLASS_CAR):
    m = np.zeros((H, W), np.uint8)
    m[y : y + h, x : x + w] = 1
    return SegmentedObject(rletools.encode(m), cls, track)


def test_perfect_tracking_scores_one():
    gt = {"0000": {0: [_obj(2, 2, 8, 8, 1)], 1: [_obj(4, 2, 8, 8, 1)]}}
    res = {"0000": {0: [_obj(2, 2, 8, 8, 7)], 1: [_obj(4, 2, 8, 8, 7)]}}
    _, total = compute_mots_metrics(gt, res, {"0000": 1}, CLASS_CAR)
    assert total["tp"] == 2 and total["fp"] == 0 and total["fn"] == 0
    assert total["sMOTSA"] == pytest.approx(1.0)
    assert total["MOTSA"] == pytest.approx(1.0)
    assert total["MT"] == pytest.approx(1.0)
    assert total["id_switches"] == 0


def test_id_switch_counted():
    gt = {"0000": {f: [_obj(2, 2, 8, 8, 1)] for f in range(3)}}
    res = {"0000": {0: [_obj(2, 2, 8, 8, 5)], 1: [_obj(2, 2, 8, 8, 5)], 2: [_obj(2, 2, 8, 8, 9)]}}
    _, total = compute_mots_metrics(gt, res, {"0000": 2}, CLASS_CAR)
    assert total["id_switches"] == 1
    assert total["MOTSA"] == pytest.approx(1 - 1 / 3)


def test_fp_fn_and_ignore_region():
    gt = {
        "0000": {
            0: [_obj(2, 2, 8, 8, 1), _obj(30, 20, 10, 10, IGNORE_CLASS, cls=IGNORE_CLASS)]
        }
    }
    # One matched det, one unmatched inside the ignore region, one real FP.
    res = {
        "0000": {
            0: [_obj(2, 2, 8, 8, 4), _obj(31, 21, 8, 8, 5), _obj(50, 2, 6, 6, 6)]
        }
    }
    _, total = compute_mots_metrics(gt, res, {"0000": 0}, CLASS_CAR)
    assert total["tp"] == 1
    assert total["n_itr"] == 1  # ignored tracker det
    assert total["fp"] == 1
    assert total["fn"] == 0


def test_missed_gt_is_fn_and_ml():
    gt = {"0000": {f: [_obj(2, 2, 8, 8, 1)] for f in range(2)}}
    res = {"0000": {}}
    _, total = compute_mots_metrics(gt, res, {"0000": 1}, CLASS_CAR)
    assert total["fn"] == 2 and total["tp"] == 0
    assert total["ML"] == pytest.approx(1.0)


def test_txt_roundtrip(tmp_path):
    gt = {"0000": {0: [_obj(2, 2, 8, 8, 1001)], 3: [_obj(12, 4, 6, 6, 1002)]}}
    write_sequences(gt, str(tmp_path))
    loaded = load_txt(str(tmp_path / "0000.txt"))
    assert set(loaded.keys()) == {0, 3}
    np.testing.assert_array_equal(
        rletools.decode(loaded[0][0].mask), rletools.decode(gt["0000"][0][0].mask)
    )
    assert loaded[3][0].track_id == 1002


def test_overlap_assertion(tmp_path):
    a, b = _obj(2, 2, 8, 8, 1), _obj(4, 4, 8, 8, 2)
    write_sequences({"0000": {0: [a, b]}}, str(tmp_path))
    with pytest.raises(AssertionError):
        load_txt(str(tmp_path / "0000.txt"))


def test_paste_and_crop_overlaps():
    m = np.ones((28, 28), np.float32)
    full = paste_mask_np(m, np.array([10.0, 5.0, 20.0, 15.0]), (H, W))
    ys, xs = np.nonzero(full)
    assert ys.min() == 5 and ys.max() == 14 and xs.min() == 10 and xs.max() == 19
    a = np.zeros((H, W), bool)
    a[:10, :10] = True
    b = np.zeros((H, W), bool)
    b[5:15, 5:15] = True
    out = crop_overlapping_masks([a, b], [0.9, 0.5])
    assert (out[0] & out[1]).sum() == 0
    assert out[0].sum() == 100  # winner intact


def test_export_lines_and_image():
    d = 4
    recent = {
        "valid": np.array([True, True, False, False]),
        "ids": np.array([3, 5, 0, 0]),
        "boxes": np.array([[2.0, 2.0, 10.0, 10.0], [20.0, 8.0, 30.0, 18.0], [0, 0, 0, 0], [0, 0, 0, 0]]),
        "scores": np.array([0.9, 0.8, 0.0, 0.0]),
        "classes": np.array([2, 0, 0, 0]),  # car, person
        "masks": np.ones((d, 28, 28), np.float32),
    }
    lines = file_lines_from_recent(recent, 7, (H, W))
    assert len(lines) == 2
    assert lines[0].startswith("7 1003 1 40 60 ")  # car: 1*1000+3
    assert lines[1].startswith("7 2005 2 40 60 ")  # pedestrian: 2*1000+5
    img = result_image_from_recent(recent, (H, W))
    assert set(np.unique(img)) == {0, 1003, 2005}
