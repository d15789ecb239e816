"""Fixed-shape NMS for TPU — greedy-exact, no dynamic shapes, no host sync.

Replaces the CUDA NMS inside detectron2's ``find_top_rpn_proposals``
(reference: dcnn/networks/selective_rpn.py:74-83) and the per-class NMS in ROI
head inference.  Greedy NMS is a per-prefix fixpoint, so instead of a
sequential O(N) scan we iterate the vectorized fixpoint map

    keep[i] <- valid[i] and not OR_{j<i} (keep[j] and iou[j, i] > thr)

which converges in O(longest suppression chain) iterations (typically < 10)
with each iteration a dense (N, N) masked reduction — MXU/VPU-friendly work
instead of pointer-chasing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from apse_uav_tpu.dcnn.ops.boxes import box_iou

Array = jnp.ndarray


def nms_mask(boxes: Array, scores: Array, iou_threshold: float, valid: Array | None = None) -> Array:
    """Exact greedy NMS keep-mask.

    boxes (N, 4) xyxy, scores (N,).  Boxes need NOT be pre-sorted; suppression
    order follows descending score (ties broken by index).  Returns (N,) bool.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones(n, dtype=bool)
    # rank[i] = position of box i in descending-score order.
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    rank = jnp.argsort(order)
    iou = box_iou(boxes, boxes)
    # suppress[j, i]: an alive j would suppress i (higher rank, overlapping).
    suppress = (iou > iou_threshold) & (rank[:, None] < rank[None, :]) & valid[:, None]

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < n)

    def body(state):
        keep, _, it = state
        new = valid & ~jnp.any(suppress & keep[:, None], axis=0)
        return new, keep, it + 1

    keep0 = valid
    keep, _, _ = jax.lax.while_loop(cond, body, (keep0, ~keep0, jnp.int32(0)))
    return keep


def batched_nms(boxes: Array, scores: Array, idxs: Array, iou_threshold: float, valid: Array | None = None) -> Array:
    """Class-aware NMS: boxes of different ``idxs`` never suppress each other.

    Implemented by offsetting each class onto a disjoint coordinate island
    (torchvision's trick) so a single dense NMS suffices.
    """
    if boxes.shape[0] == 0:
        return jnp.zeros(0, dtype=bool)
    max_coord = jnp.max(jnp.abs(boxes)) + 1.0
    offsets = idxs.astype(boxes.dtype) * (2.0 * max_coord)
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, iou_threshold, valid)
