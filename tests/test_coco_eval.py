"""COCO evaluator tests on analytically-known scenarios."""

import numpy as np
import pytest

from apse_uav_tpu.evaluation.coco_eval import CocoEvaluator


def _gt(img, cat, box, **kw):
    return {"image_id": img, "category_id": cat, "bbox": list(box), **kw}


def _dt(img, cat, box, score):
    return {"image_id": img, "category_id": cat, "bbox": list(box), "score": score}


def test_perfect_detection_ap_one():
    ev = CocoEvaluator()
    ev.add_ground_truth([_gt(0, 1, [10, 10, 40, 40]), _gt(1, 1, [5, 5, 50, 60])])
    ev.add_detections([_dt(0, 1, [10, 10, 40, 40], 0.9), _dt(1, 1, [5, 5, 50, 60], 0.8)])
    s = ev.summarize()
    assert s["AP"] == pytest.approx(1.0)
    assert s["AP50"] == pytest.approx(1.0)
    assert s["AR100"] == pytest.approx(1.0)


def test_miss_halves_recall():
    ev = CocoEvaluator()
    ev.add_ground_truth([_gt(0, 1, [10, 10, 40, 40]), _gt(0, 1, [100, 100, 40, 40])])
    ev.add_detections([_dt(0, 1, [10, 10, 40, 40], 0.9)])
    s = ev.summarize()
    assert s["AR100"] == pytest.approx(0.5)
    # Precision is perfect up to recall 0.5: 101-pt AP ≈ 51/101.
    assert s["AP"] == pytest.approx(51 / 101, abs=1e-6)


def test_false_positive_lowers_ap():
    ev = CocoEvaluator()
    ev.add_ground_truth([_gt(0, 1, [10, 10, 40, 40])])
    # FP scored above the TP.
    ev.add_detections([_dt(0, 1, [200, 200, 40, 40], 0.95), _dt(0, 1, [10, 10, 40, 40], 0.9)])
    s = ev.summarize()
    assert s["AP50"] == pytest.approx(0.5, abs=0.01)


def test_localization_quality_affects_high_thresholds():
    ev = CocoEvaluator()
    ev.add_ground_truth([_gt(0, 1, [0, 0, 100, 100])])
    # IoU ≈ 0.6: match at thr .5/.55/.6, not above.
    ev.add_detections([_dt(0, 1, [0, 0, 100, 60], 0.9)])
    iou = 60 * 100 / (100 * 100)
    assert iou == pytest.approx(0.6)
    s = ev.summarize()
    assert s["AP50"] == pytest.approx(1.0)
    assert s["AP75"] == pytest.approx(0.0)
    assert s["AP"] == pytest.approx(3 / 10, abs=0.01)  # 3 of 10 thresholds


def test_crowd_gt_does_not_penalize():
    ev = CocoEvaluator()
    ev.add_ground_truth(
        [_gt(0, 1, [10, 10, 40, 40]), _gt(0, 1, [100, 100, 200, 200], iscrowd=1)]
    )
    # Second det falls inside the crowd -> ignored, not FP.
    ev.add_detections(
        [_dt(0, 1, [10, 10, 40, 40], 0.9), _dt(0, 1, [120, 120, 60, 60], 0.8)]
    )
    s = ev.summarize()
    assert s["AP"] == pytest.approx(1.0)


def test_area_ranges():
    ev = CocoEvaluator()
    ev.add_ground_truth([_gt(0, 1, [0, 0, 16, 16]), _gt(0, 1, [50, 50, 200, 200])])
    ev.add_detections([_dt(0, 1, [0, 0, 16, 16], 0.9), _dt(0, 1, [50, 50, 200, 200], 0.8)])
    s = ev.summarize()
    assert s["APs"] == pytest.approx(1.0)  # 16x16 = small
    assert s["APl"] == pytest.approx(1.0)
    assert s["APm"] == -1.0  # no medium gt


def test_segm_iou_type():
    from apse_uav_tpu.evaluation import rle

    m1 = np.zeros((50, 50), np.uint8)
    m1[10:30, 10:30] = 1
    ev = CocoEvaluator(iou_type="segm")
    ev.add_ground_truth(
        [{**_gt(0, 1, [10, 10, 20, 20]), "segmentation": rle.encode(m1), "area": 400}]
    )
    ev.add_detections(
        [{**_dt(0, 1, [10, 10, 20, 20], 0.9), "segmentation": rle.encode(m1)}]
    )
    s = ev.summarize()
    assert s["AP"] == pytest.approx(1.0)
