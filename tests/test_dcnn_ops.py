"""Golden tests for dcnn ops vs straightforward numpy oracles.

The oracles are direct loop transcriptions of the published op definitions
(torchvision roi_align/roi_pool/nms docs; greedy NMS), independent of the
vectorized XLA implementations under test.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from apse_uav_tpu.dcnn.ops import (
    apply_deltas,
    batched_nms,
    box_iou,
    get_deltas,
    nms_mask,
    roi_align,
    roi_pool,
)


def _rand_boxes(rng, n, h, w):
    x1 = rng.uniform(0, w - 2, n)
    y1 = rng.uniform(0, h - 2, n)
    x2 = x1 + rng.uniform(1, w / 2, n)
    y2 = y1 + rng.uniform(1, h / 2, n)
    return np.stack([x1, y1, np.minimum(x2, w - 1), np.minimum(y2, h - 1)], axis=1).astype(
        np.float32
    )


def _iou_np(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area = lambda x: (x[:, 2] - x[:, 0]) * (x[:, 3] - x[:, 1])
    union = area(a)[:, None] + area(b)[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-9), 0.0)


def _nms_np(boxes, scores, thr):
    order = np.argsort(-scores)
    iou = _iou_np(boxes, boxes)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thr
        suppressed[i] = True
    return set(keep)


def _bilinear_np(feat, y, x):
    c, h, w = feat.shape
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(c, feat.dtype)
    y = min(max(y, 0.0), h - 1.0)
    x = min(max(x, 0.0), w - 1.0)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    return (
        feat[:, y0, x0] * (1 - ly) * (1 - lx)
        + feat[:, y0, x1] * (1 - ly) * lx
        + feat[:, y1, x0] * ly * (1 - lx)
        + feat[:, y1, x1] * ly * lx
    )


def _roi_align_np(feat, boxes, out, scale, ratio, aligned):
    n = len(boxes)
    c = feat.shape[0]
    res = np.zeros((n, c, out, out), np.float32)
    off = 0.5 if aligned else 0.0
    for r, box in enumerate(boxes):
        x1, y1, x2, y2 = box * scale - off
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / out, rh / out
        for i in range(out):
            for j in range(out):
                acc = np.zeros(c, np.float32)
                for a in range(ratio):
                    for b in range(ratio):
                        y = y1 + (i + (a + 0.5) / ratio) * bh
                        x = x1 + (j + (b + 0.5) / ratio) * bw
                        acc += _bilinear_np(feat, y, x)
                res[r, :, i, j] = acc / (ratio * ratio)
    return res


def _roi_pool_np(feat, boxes, out, scale):
    n = len(boxes)
    c, h, w = feat.shape
    res = np.zeros((n, c, out, out), np.float32)
    for r, box in enumerate(boxes):
        x1 = int(round(box[0] * scale))
        y1 = int(round(box[1] * scale))
        x2 = int(round(box[2] * scale))
        y2 = int(round(box[3] * scale))
        rw, rh = max(x2 - x1 + 1, 1), max(y2 - y1 + 1, 1)
        bw, bh = rw / out, rh / out
        eps = 1e-4  # same edge stabilization as the op
        for i in range(out):
            for j in range(out):
                hs = min(max(int(np.floor(i * bh + eps)) + y1, 0), h)
                he = min(max(int(np.ceil((i + 1) * bh - eps)) + y1, 0), h)
                ws = min(max(int(np.floor(j * bw + eps)) + x1, 0), w)
                we = min(max(int(np.ceil((j + 1) * bw - eps)) + x1, 0), w)
                if he <= hs or we <= ws:
                    res[r, :, i, j] = 0.0
                else:
                    res[r, :, i, j] = feat[:, hs:he, ws:we].max(axis=(1, 2))
    return res


def test_box_iou_matches_numpy():
    rng = np.random.default_rng(0)
    a = _rand_boxes(rng, 13, 100, 120)
    b = _rand_boxes(rng, 7, 100, 120)
    got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _iou_np(a, b), atol=1e-5)


def test_deltas_roundtrip():
    rng = np.random.default_rng(1)
    src = _rand_boxes(rng, 20, 200, 200)
    tgt = _rand_boxes(rng, 20, 200, 200)
    d = get_deltas(jnp.asarray(src), jnp.asarray(tgt))
    rec = apply_deltas(d, jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(rec), tgt, atol=1e-3)


@pytest.mark.parametrize("n,thr", [(50, 0.5), (200, 0.3), (64, 0.7)])
def test_nms_matches_greedy(n, thr):
    rng = np.random.default_rng(n)
    boxes = _rand_boxes(rng, n, 80, 80)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), thr))
    assert set(np.nonzero(keep)[0]) == _nms_np(boxes, scores, thr)


def test_batched_nms_classes_dont_interact():
    rng = np.random.default_rng(7)
    boxes = np.tile(_rand_boxes(rng, 10, 60, 60), (2, 1))
    scores = rng.uniform(0.1, 1.0, 20).astype(np.float32)
    idxs = np.repeat(np.arange(2), 10)
    keep = np.asarray(
        batched_nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs), 0.5)
    )
    want = _nms_np(boxes[:10], scores[:10], 0.5) | {
        10 + k for k in _nms_np(boxes[10:], scores[10:], 0.5)
    }
    assert set(np.nonzero(keep)[0]) == want


def test_nms_respects_valid_mask():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    valid = jnp.asarray([False, True, True])
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5, valid))
    # Box 0 is invalid: it neither survives nor suppresses box 1.
    assert keep.tolist() == [False, True, True]


@pytest.mark.parametrize("aligned,ratio", [(False, 2), (True, 2), (True, 1)])
def test_roi_align_matches_oracle(aligned, ratio):
    rng = np.random.default_rng(3)
    feat = rng.normal(size=(8, 24, 32)).astype(np.float32)
    boxes = _rand_boxes(rng, 12, 24 * 4, 32 * 4)  # image coords, scale 0.25
    got = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(boxes), 7, 0.25, ratio, aligned)
    )
    want = _roi_align_np(feat, boxes, 7, 0.25, ratio, aligned)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_roi_pool_matches_oracle():
    rng = np.random.default_rng(5)
    feat = rng.normal(size=(4, 20, 28)).astype(np.float32)
    boxes = _rand_boxes(rng, 9, 20 * 8, 28 * 8)
    got = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(boxes), 7, 0.125))
    want = _roi_pool_np(feat, boxes, 7, 0.125)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fpn_roi_align_flat_matches_dense():
    """Single-pass (flat-buffer) multi-level ROIAlign == pool-everywhere +
    select, over boxes spanning all four FPN levels."""
    import jax.numpy as jnp

    from apse_uav_tpu.dcnn.models.roi_heads import fpn_roi_align, fpn_roi_align_dense

    rng = np.random.default_rng(11)
    c = 16
    feats = {}
    h0, w0 = 64, 96
    for i, name in enumerate(("p2", "p3", "p4", "p5")):
        feats[name] = jnp.asarray(
            rng.normal(size=(h0 >> i, w0 >> i, c)), jnp.float32
        )
    # Box sqrt-areas ~ 20 / 90 / 250 / 500 px -> levels p2..p5; plus a
    # degenerate box and one clipping past the image edge.
    boxes = jnp.asarray(
        [
            [10.0, 12.0, 30.0, 32.0],
            [5.0, 5.0, 95.0, 90.0],
            [0.0, 0.0, 250.0, 250.0],
            [-20.0, -20.0, 500.0, 480.0],
            [40.0, 40.0, 40.0, 40.0],
            [350.0, 200.0, 420.0, 260.0],
        ],
        jnp.float32,
    )
    for res, ratio in ((7, 1), (14, 2)):
        got = fpn_roi_align(feats, boxes, res, ratio)
        want = fpn_roi_align_dense(feats, boxes, res, ratio)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)
