"""Box math (XYXY, pixel coords) — the device-side core under RPN/ROI heads.

Replaces detectron2's ``Boxes`` / ``Box2BoxTransform`` functionality (used via
GeneralizedRCNN in the reference, e.g. dcnn/networks/track_rcnn.py:42-54 and
dcnn/structures/set_boxes.py) with pure static-shape jnp functions, batched
with ``vmap`` at call sites.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

# detectron2 Box2BoxTransform defaults: no weights, clamp on dw/dh.
_SCALE_CLAMP = 4.135166556742356  # log(1000/16)


def box_area(boxes: Array) -> Array:
    """(N, 4) xyxy -> (N,) areas (0 for degenerate boxes)."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def box_iou(a: Array, b: Array) -> Array:
    """Pairwise IoU: a (N, 4), b (M, 4) -> (N, M)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def clip_boxes(boxes: Array, size_hw: tuple[int, int] | Array) -> Array:
    """Clip xyxy boxes to [0, W] x [0, H]."""
    h, w = size_hw[0], size_hw[1]
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty(boxes: Array, threshold: float = 0.0) -> Array:
    """(N, 4) -> (N,) bool: width and height strictly above threshold."""
    return ((boxes[..., 2] - boxes[..., 0]) > threshold) & (
        (boxes[..., 3] - boxes[..., 1]) > threshold
    )


def get_deltas(src: Array, target: Array, weights=(1.0, 1.0, 1.0, 1.0)) -> Array:
    """Box regression targets (dx, dy, dw, dh) from src anchors to targets."""
    sw = src[..., 2] - src[..., 0]
    sh = src[..., 3] - src[..., 1]
    sx = src[..., 0] + 0.5 * sw
    sy = src[..., 1] + 0.5 * sh
    tw = target[..., 2] - target[..., 0]
    th = target[..., 3] - target[..., 1]
    tx = target[..., 0] + 0.5 * tw
    ty = target[..., 1] + 0.5 * th
    wx, wy, ww, wh = weights
    dx = wx * (tx - sx) / jnp.maximum(sw, 1e-6)
    dy = wy * (ty - sy) / jnp.maximum(sh, 1e-6)
    dw = ww * jnp.log(jnp.maximum(tw, 1e-6) / jnp.maximum(sw, 1e-6))
    dh = wh * jnp.log(jnp.maximum(th, 1e-6) / jnp.maximum(sh, 1e-6))
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def apply_deltas(deltas: Array, boxes: Array, weights=(1.0, 1.0, 1.0, 1.0)) -> Array:
    """Apply (…, 4) regression deltas to (…, 4) xyxy boxes."""
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights
    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, _SCALE_CLAMP)
    dh = jnp.minimum(deltas[..., 3] / wh, _SCALE_CLAMP)
    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights
    return jnp.stack(
        [
            pred_ctr_x - 0.5 * pred_w,
            pred_ctr_y - 0.5 * pred_h,
            pred_ctr_x + 0.5 * pred_w,
            pred_ctr_y + 0.5 * pred_h,
        ],
        axis=-1,
    )
