"""Region Proposal Network: anchors, head, fixed-shape proposal selection.

Functional equivalent of detectron2's RPN (reference uses it via
GeneralizedRCNN, and subclasses it in dcnn/networks/selective_rpn.py).
Everything is static-shape: "number of proposals" is a fixed budget plus a
validity mask; NMS is the fixpoint-iteration greedy kernel from
apse_uav_tpu.dcnn.ops.nms.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from apse_uav_tpu.dcnn.config import AnchorConfig, RPNConfig
from apse_uav_tpu.dcnn.ops import apply_deltas, box_iou, clip_boxes, get_deltas
from apse_uav_tpu.dcnn.ops.nms import nms_mask

Array = jax.Array

LEVEL_STRIDES = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64,
                 # C4 backbone: the RPN runs on the single res4 map
                 # (Base-RCNN-C4.yaml; detectron2 ResNet feature stride 16).
                 "res4": 16}


def cell_anchors(size, aspect_ratios: Sequence[float]):
    """(A, 4) base anchors centered at the origin (detectron2 ordering:
    sizes outer, aspect ratios inner — generate_cell_anchors).

    ``size`` is one float (FPN: one size per level) or a tuple of floats
    (C4: all sizes on the single level).  Pure numpy so anchor tables are
    host constants, never traced values."""
    import numpy as np

    sizes = size if isinstance(size, (tuple, list)) else (size,)
    out = []
    for s in sizes:
        area = s * s
        for r in aspect_ratios:
            w = (area / r) ** 0.5
            h = w * r
            out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(out, np.float32)


@functools.lru_cache(maxsize=64)
def _grid_anchors_np(
    hw: tuple[int, int], stride: int, size: float, aspect_ratios: tuple[float, ...], offset: float = 0.0
):
    import numpy as np

    h, w = hw
    base = cell_anchors(size, aspect_ratios)  # (A, 4)
    xs = (np.arange(w, dtype=np.float32) + offset) * stride
    ys = (np.arange(h, dtype=np.float32) + offset) * stride
    sx, sy = np.meshgrid(xs, ys)  # (H, W)
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)  # (H*W, 1, 4)
    return (shifts + base[None]).reshape(-1, 4).astype(np.float32)


def grid_anchors(
    hw: tuple[int, int], stride: int, size: float, aspect_ratios: tuple[float, ...], offset: float = 0.0
) -> jax.Array:
    """All anchors for one level: (H*W*A, 4), shift-major / anchor-minor.

    Computed (and cached) in numpy so the cache never captures tracers."""
    return jnp.asarray(_grid_anchors_np(hw, stride, size, aspect_ratios, offset))


class RPNHead(nn.Module):
    """Shared 3x3 conv + objectness / delta 1x1 convs (all levels share weights)."""

    num_anchors: int
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: dict[str, Array]) -> tuple[dict[str, Array], dict[str, Array]]:
        # detectron2 StandardRPNHead init (modeling/proposal_generator/rpn.py):
        # normal(std=0.01), zero bias, for all three convs.  Large inits put
        # the initial logits deep in BCE saturation, and one saturated epoch
        # can collapse the shared conv's ReLU to identically zero — after
        # which no gradient ever reaches it again (observed with the flax
        # default on unit-free features; the head never recovered).
        init = nn.initializers.normal(0.01)
        conv = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv", kernel_init=init)
        obj_conv = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="objectness", kernel_init=init)
        delta_conv = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="deltas", kernel_init=init)
        logits, deltas = {}, {}
        for name, x in feats.items():
            t = nn.relu(conv(x))
            b, h, w, _ = t.shape
            logits[name] = obj_conv(t).reshape(b, h * w * self.num_anchors)
            deltas[name] = delta_conv(t).reshape(b, h * w * self.num_anchors, 4)
        return logits, deltas


def select_proposals(
    logits: dict[str, Array],
    deltas: dict[str, Array],
    level_shapes: dict[str, tuple[int, int]],
    image_hw: tuple[int, int],
    anchor_cfg: AnchorConfig,
    rpn_cfg: RPNConfig,
    training: bool = False,
    levels: tuple[str, ...] | None = None,
) -> tuple[Array, Array, Array]:
    """Fixed-shape find_top_rpn_proposals for ONE image.

    logits[level] (N_l,), deltas[level] (N_l, 4).  Returns
    (boxes (P, 4), scores (P,), valid (P,)) with
    P = post_nms_topk, ordered by descending score.

    ``levels`` restricts proposal generation to a subset of FPN levels while
    anchors stay consistent with the full pyramid — SelectiveRPN's
    gen_partial_proposals keeps ONLY the coarsest level (reference:
    dcnn/networks/selective_rpn.py:47-48).
    """
    pre_k = rpn_cfg.pre_nms_topk_train if training else rpn_cfg.pre_nms_topk_test
    post_k = rpn_cfg.post_nms_topk_train if training else rpn_cfg.post_nms_topk_test

    all_names = sorted(logits.keys())
    level_names = [n for n in all_names if levels is None or n in levels]
    level_index = {n: i for i, n in enumerate(all_names)}
    all_boxes, all_scores = [], []
    for name in level_names:
        anchors = grid_anchors(
            tuple(level_shapes[name]),
            LEVEL_STRIDES[name],
            anchor_cfg.sizes[level_index[name]],
            tuple(anchor_cfg.aspect_ratios),
            anchor_cfg.offset,
        )
        n = logits[name].shape[0]
        k = min(pre_k, n)
        scores, idx = jax.lax.top_k(logits[name], k)
        boxes = apply_deltas(deltas[name][idx], anchors[idx])
        boxes = clip_boxes(boxes, image_hw)
        wh_ok = ((boxes[:, 2] - boxes[:, 0]) > rpn_cfg.min_size) & (
            (boxes[:, 3] - boxes[:, 1]) > rpn_cfg.min_size
        )
        finite = jnp.all(jnp.isfinite(boxes), axis=-1) & jnp.isfinite(scores)
        valid = wh_ok & finite
        keep = nms_mask(boxes, scores, rpn_cfg.nms_thresh, valid)
        all_boxes.append(boxes)
        all_scores.append(jnp.where(keep, scores, -jnp.inf))
    boxes = jnp.concatenate(all_boxes, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)
    k = min(post_k, boxes.shape[0])
    top_scores, idx = jax.lax.top_k(scores, k)
    return boxes[idx], top_scores, jnp.isfinite(top_scores)


def label_anchors(
    anchors: Array,
    gt_boxes: Array,
    gt_valid: Array,
    fg_thresh: float,
    bg_thresh: float,
) -> tuple[Array, Array]:
    """detectron2 Matcher with allow_low_quality_matches=True.

    Returns (labels (N,): 1 fg / 0 bg / -1 ignore, matched_idx (N,)).
    """
    iou = box_iou(gt_boxes, anchors)  # (G, N)
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    matched_iou = jnp.max(iou, axis=0)
    matched_idx = jnp.argmax(iou, axis=0)
    labels = jnp.where(
        matched_iou >= fg_thresh, 1, jnp.where(matched_iou < bg_thresh, 0, -1)
    )
    # Low-quality matches: for each gt, anchors achieving its best IoU are fg.
    best_per_gt = jnp.max(iou, axis=1, keepdims=True)  # (G, 1)
    is_best = (iou == best_per_gt) & gt_valid[:, None] & (best_per_gt > 0)
    labels = jnp.where(jnp.any(is_best, axis=0), 1, labels)
    return labels, matched_idx


def subsample_labels(
    rng: Array, labels: Array, num_samples: int, positive_fraction: float
) -> Array:
    """Random balanced subsample (detectron2 subsample_labels) as a mask.

    Picks min(num_pos, num_samples*frac) positives and fills the rest with
    negatives, uniformly at random, fully vectorized (random top-k).
    """
    rng_pos, rng_neg = jax.random.split(rng)
    pos = labels == 1
    neg = labels == 0
    num_pos_target = int(num_samples * positive_fraction)
    # Random priority per element; invalid get -inf so never chosen.
    pos_pri = jnp.where(pos, jax.random.uniform(rng_pos, labels.shape), -jnp.inf)
    pos_rank = jnp.argsort(jnp.argsort(-pos_pri))  # rank 0 = highest priority
    n_pos = jnp.minimum(jnp.sum(pos), num_pos_target)
    pos_sel = pos & (pos_rank < n_pos)
    n_neg = jnp.minimum(jnp.sum(neg), num_samples - n_pos)
    neg_pri = jnp.where(neg, jax.random.uniform(rng_neg, labels.shape), -jnp.inf)
    neg_rank = jnp.argsort(jnp.argsort(-neg_pri))
    neg_sel = neg & (neg_rank < n_neg)
    return pos_sel | neg_sel


def smooth_l1(pred: Array, target: Array, beta: float) -> Array:
    diff = jnp.abs(pred - target)
    if beta <= 1e-8:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def rpn_losses(
    rng: Array,
    logits: dict[str, Array],
    deltas: dict[str, Array],
    level_shapes: dict[str, tuple[int, int]],
    gt_boxes: Array,
    gt_valid: Array,
    anchor_cfg: AnchorConfig,
    rpn_cfg: RPNConfig,
) -> dict[str, Array]:
    """RPN objectness + box regression losses for ONE image (vmap over batch)."""
    level_names = sorted(logits.keys())
    anchors = jnp.concatenate(
        [
            grid_anchors(
                tuple(level_shapes[n]),
                LEVEL_STRIDES[n],
                anchor_cfg.sizes[i],
                tuple(anchor_cfg.aspect_ratios),
                anchor_cfg.offset,
            )
            for i, n in enumerate(level_names)
        ]
    )
    logit_cat = jnp.concatenate([logits[n] for n in level_names])
    delta_cat = jnp.concatenate([deltas[n] for n in level_names])
    labels, matched = label_anchors(
        anchors, gt_boxes, gt_valid, rpn_cfg.iou_fg_thresh, rpn_cfg.iou_bg_thresh
    )
    sel = subsample_labels(rng, labels, rpn_cfg.batch_size_per_image, rpn_cfg.positive_fraction)
    pos = sel & (labels == 1)
    gt_deltas = get_deltas(anchors, gt_boxes[matched])
    normalizer = float(rpn_cfg.batch_size_per_image)
    loc = jnp.sum(
        jnp.where(pos[:, None], smooth_l1(delta_cat, gt_deltas, rpn_cfg.smooth_l1_beta), 0.0)
    )
    obj = jnp.sum(
        jnp.where(
            sel,
            # BCE with logits against the 0/1 label.
            jnp.maximum(logit_cat, 0)
            - logit_cat * labels.astype(logit_cat.dtype)
            + jnp.log1p(jnp.exp(-jnp.abs(logit_cat))),
            0.0,
        )
    )
    return {
        "loss_rpn_loc": loc / normalizer,
        "loss_rpn_cls": obj / normalizer,
    }
