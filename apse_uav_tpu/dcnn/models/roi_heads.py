"""StandardROIHeads: FPN pooling, box head, mask head, fixed-shape inference.

Functional equivalent of detectron2's StandardROIHeads + FastRCNNConvFCHead +
MaskRCNNConvUpsampleHead (reference: dcnn/configs/Base-RCNN-FPN.yaml:22-31),
with TPU-first shapes: proposals/detections are fixed-capacity tensors with
validity masks; per-class NMS uses the fixpoint greedy kernel.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from apse_uav_tpu.dcnn.config import ROIConfig
from apse_uav_tpu.dcnn.ops import apply_deltas, box_iou, clip_boxes, get_deltas
from apse_uav_tpu.dcnn.ops.nms import batched_nms
from apse_uav_tpu.dcnn.ops.roi_align import roi_align_hwc
from apse_uav_tpu.dcnn.models.rpn import smooth_l1, subsample_labels

Array = jax.Array

POOL_LEVELS = ("p2", "p3", "p4", "p5")
CANONICAL_LEVEL = 4
CANONICAL_SIZE = 224.0


def assign_boxes_to_levels(boxes: Array) -> Array:
    """FPN level per box (detectron2 assign_boxes_to_levels): (N,) in [0, 3]."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0.0
    )
    scale = jnp.sqrt(area)
    lvl = jnp.floor(CANONICAL_LEVEL + jnp.log2(scale / CANONICAL_SIZE + 1e-8))
    return (jnp.clip(lvl, 2, 5) - 2).astype(jnp.int32)


def fpn_roi_align_dense(
    feats: dict[str, Array],
    boxes: Array,
    resolution: int,
    sampling_ratio: int,
) -> Array:
    """Reference formulation (kept as the parity oracle for
    :func:`fpn_roi_align`): pool every box on every level, select by the
    level assignment."""
    lvl = assign_boxes_to_levels(boxes)
    pooled = []
    for i, name in enumerate(POOL_LEVELS):
        scale = 1.0 / (4 * 2**i)
        pooled.append(
            roi_align_hwc(
                feats[name].astype(jnp.bfloat16), boxes, resolution, scale, sampling_ratio, aligned=True
            ).astype(jnp.float32)
        )
    stacked = jnp.stack(pooled, axis=0)  # (4, N, C, R, R)
    return jnp.take_along_axis(stacked, lvl[None, :, None, None, None], axis=0)[0]


def fpn_roi_align(
    feats: dict[str, Array],
    boxes: Array,
    resolution: int,
    sampling_ratio: int,
) -> Array:
    """Multi-level ROIAlign (ROIAlignV2/aligned) for ONE image, single pass.

    feats[p*] (H, W, C); boxes (N, 4) -> (N, C, R, R).  The levels are
    concatenated into ONE flat (sum HW, C) bf16 row buffer and each box
    gathers only from its ASSIGNED level via a per-box base offset — the
    same per-level arithmetic as detectron2's pooler, at 1/4 the gather
    volume of pool-on-every-level-and-select (and without the (4, N, C,
    R, R) stack + cross-level select).  bf16 rows halve the dominant
    gather traffic; the weighted combine accumulates in f32.
    """
    import numpy as np

    lvl = assign_boxes_to_levels(boxes)
    c = feats[POOL_LEVELS[0]].shape[-1]
    level_hw = [feats[n].shape[:2] for n in POOL_LEVELS]
    sizes = [h * w for h, w in level_hw]
    flat = jnp.concatenate(
        [feats[n].astype(jnp.bfloat16).reshape(-1, c) for n in POOL_LEVELS], axis=0
    )
    hs = jnp.asarray([h for h, _ in level_hw], jnp.float32)
    ws = jnp.asarray([w for _, w in level_hw], jnp.float32)
    wis = jnp.asarray([w for _, w in level_hw], jnp.int32)
    bases = jnp.asarray(np.cumsum([0] + sizes[:-1]), jnp.int32)
    scales = jnp.asarray([1.0 / (4 * 2**i) for i in range(len(POOL_LEVELS))], jnp.float32)
    s = max(int(sampling_ratio), 1)
    r = resolution
    offset = 0.5  # ROIAlignV2 / aligned=True

    def one(box, li):
        h = hs[li]
        w = ws[li]
        wi = wis[li]
        base = bases[li]
        sc = scales[li]
        x1 = box[0] * sc - offset
        y1 = box[1] * sc - offset
        rw = (box[2] - box[0]) * sc
        rh = (box[3] - box[1]) * sc
        grid = (jnp.arange(r)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)
        ys = y1 + grid * (rh / r)  # (r*s,)
        xs = x1 + grid * (rw / r)
        yy = jnp.repeat(ys, r * s)
        xx = jnp.tile(xs, r * s)
        oor = (yy < -1.0) | (yy > h) | (xx < -1.0) | (xx > w)
        y = jnp.clip(yy, 0.0, h - 1.0)
        x = jnp.clip(xx, 0.0, w - 1.0)
        y0 = jnp.floor(y)
        x0 = jnp.floor(x)
        y1f = jnp.minimum(y0 + 1, h - 1.0)
        x1f = jnp.minimum(x0 + 1, w - 1.0)
        ly = y - y0
        lx = x - x0
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        y1i = y1f.astype(jnp.int32)
        x1i = x1f.astype(jnp.int32)
        p00 = jnp.take(flat, base + y0i * wi + x0i, axis=0)
        p01 = jnp.take(flat, base + y0i * wi + x1i, axis=0)
        p10 = jnp.take(flat, base + y1i * wi + x0i, axis=0)
        p11 = jnp.take(flat, base + y1i * wi + x1i, axis=0)
        w00 = (1 - ly) * (1 - lx)
        w01 = (1 - ly) * lx
        w10 = ly * (1 - lx)
        w11 = ly * lx
        val = p00 * w00[:, None] + p01 * w01[:, None] + p10 * w10[:, None] + p11 * w11[:, None]
        val = jnp.where(oor[:, None], 0.0, val)
        vals = val.reshape(r, s, r, s, c).mean(axis=(1, 3))
        return jnp.transpose(vals, (2, 0, 1))

    return jax.vmap(one)(boxes, lvl).astype(jnp.float32)


class BoxHead(nn.Module):
    """FastRCNNConvFCHead (2 FC) + linear predictors."""

    num_classes: int
    fc_dim: int = 1024
    num_fc: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, features_only: bool = False):
        """x (N, C, R, R) -> (scores (N, K+1), deltas (N, K, 4)).

        features_only=True returns the FC-trunk activations (N, fc_dim)
        instead — detectron2's ``box_head`` output, which the COWC
        ROI-feature precompute caches (reference dcnn/utils/cowc_utils.py:
        187-189, box_pooler -> box_head without the predictors).
        """
        n = x.shape[0]
        x = x.reshape(n, -1).astype(self.dtype)
        for i in range(self.num_fc):
            x = nn.relu(nn.Dense(self.fc_dim, name=f"fc{i + 1}")(x))
        if features_only:
            return x.astype(jnp.float32)
        # detectron2 FastRCNNOutputLayers init: cls normal(0.01), box
        # normal(0.001) (modeling/roi_heads/fast_rcnn.py) — near-uniform
        # class prior and near-identity box regression at step 0.
        scores = nn.Dense(self.num_classes + 1, name="cls_score",
                          kernel_init=nn.initializers.normal(0.01))(x)
        deltas = nn.Dense(self.num_classes * 4, name="bbox_pred",
                          kernel_init=nn.initializers.normal(0.001))(x)
        return scores, deltas.reshape(n, self.num_classes, 4)


class MaskHead(nn.Module):
    """MaskRCNNConvUpsampleHead: 4 convs + deconv + 1x1 predictor."""

    num_classes: int
    conv_dim: int = 256
    num_conv: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """x (N, C, R, R) -> mask logits (N, K, 2R, 2R)."""
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)  # NHWC
        for i in range(self.num_conv):
            x = nn.relu(
                nn.Conv(self.conv_dim, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name=f"mask_fcn{i + 1}")(x)
            )
        x = nn.relu(
            nn.ConvTranspose(self.conv_dim, (2, 2), strides=(2, 2), dtype=self.dtype, name="deconv")(x)
        )
        # detectron2 predictor init: normal(std=0.001) (mask_head.py).
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="predictor",
                    kernel_init=nn.initializers.normal(0.001))(x)
        return jnp.transpose(x, (0, 3, 1, 2))  # (N, K, 2R, 2R)


def box_inference(
    scores_logits: Array,
    deltas: Array,
    proposals: Array,
    proposal_valid: Array,
    image_hw: tuple[int, int],
    cfg: ROIConfig,
) -> dict[str, Array]:
    """fast_rcnn_inference for ONE image, fixed output capacity.

    Returns dict with boxes (D, 4), scores (D,), classes (D,), valid (D,)
    where D = cfg.detections_per_image.
    """
    k = cfg.num_classes
    probs = jax.nn.softmax(scores_logits, axis=-1)[:, :k]  # drop background
    boxes = apply_deltas(
        deltas, proposals[:, None, :].repeat(k, axis=1), cfg.bbox_reg_weights
    )  # (N, K, 4)
    boxes = clip_boxes(boxes, image_hw)
    n = probs.shape[0]
    flat_scores = probs.reshape(-1)  # (N*K,)
    flat_boxes = boxes.reshape(-1, 4)
    flat_cls = jnp.tile(jnp.arange(k), n)
    valid = (flat_scores > cfg.score_thresh_test) & jnp.repeat(proposal_valid, k)
    # Keep the NMS problem small: pre-select top candidates by score.
    cap = min(4 * cfg.detections_per_image, flat_scores.shape[0])
    cand_scores, idx = jax.lax.top_k(jnp.where(valid, flat_scores, -jnp.inf), cap)
    cand_boxes = flat_boxes[idx]
    cand_cls = flat_cls[idx]
    cand_valid = jnp.isfinite(cand_scores)
    keep = batched_nms(cand_boxes, cand_scores, cand_cls, cfg.nms_thresh_test, cand_valid)
    kept_scores = jnp.where(keep, cand_scores, -jnp.inf)
    d = min(cfg.detections_per_image, cap)
    final_scores, fidx = jax.lax.top_k(kept_scores, d)
    return {
        "boxes": cand_boxes[fidx],
        "scores": jnp.where(jnp.isfinite(final_scores), final_scores, 0.0),
        "classes": cand_cls[fidx],
        "valid": jnp.isfinite(final_scores),
    }


def match_proposals_to_gt(
    proposals: Array,
    proposal_valid: Array,
    gt_boxes: Array,
    gt_classes: Array,
    gt_valid: Array,
    cfg: ROIConfig,
    rng: Array,
) -> dict[str, Array]:
    """label_and_sample_proposals for ONE image (training).

    GT boxes are appended to the proposal set (detectron2 behavior), labels
    are matched at iou_thresh, and a balanced subsample of
    cfg.batch_size_per_image is selected.  Returns fixed-size sample set of
    size cfg.batch_size_per_image (mask ``sampled``).
    """
    all_boxes = jnp.concatenate([proposals, gt_boxes], axis=0)
    all_valid = jnp.concatenate([proposal_valid, gt_valid], axis=0)
    iou = box_iou(gt_boxes, all_boxes)
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    matched_iou = jnp.max(iou, axis=0)
    matched_idx = jnp.argmax(iou, axis=0)
    fg = (matched_iou >= cfg.iou_thresh) & all_valid
    bg = (matched_iou < cfg.iou_thresh) & all_valid
    labels = jnp.where(fg, 1, jnp.where(bg, 0, -1))
    sel = subsample_labels(rng, labels, cfg.batch_size_per_image, cfg.positive_fraction)
    # Deterministic fixed-size gather of the selected rows.
    order = jnp.argsort(~sel)  # selected rows first (stable)
    take = order[: cfg.batch_size_per_image]
    is_real = sel[take]
    return {
        "boxes": all_boxes[take],
        "matched_gt": matched_idx[take],
        "fg": fg[take] & is_real,
        "sampled": is_real,
        "gt_class": jnp.where(
            fg[take] & is_real, gt_classes[matched_idx[take]], cfg.num_classes
        ),
    }


def box_head_losses(
    scores_logits: Array,
    deltas: Array,
    sample: dict[str, Array],
    gt_boxes: Array,
    cfg: ROIConfig,
) -> dict[str, Array]:
    """Softmax CE + class-specific smooth-L1 on foreground samples."""
    n = scores_logits.shape[0]
    valid = sample["sampled"]
    log_probs = jax.nn.log_softmax(scores_logits, axis=-1)
    ce = -jnp.take_along_axis(log_probs, sample["gt_class"][:, None], axis=1)[:, 0]
    loss_cls = jnp.sum(jnp.where(valid, ce, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
    fg = sample["fg"]
    fg_class = jnp.clip(sample["gt_class"], 0, cfg.num_classes - 1)
    pred_deltas = jnp.take_along_axis(deltas, fg_class[:, None, None].repeat(4, 2), axis=1)[:, 0]
    target = get_deltas(sample["boxes"], gt_boxes[sample["matched_gt"]], cfg.bbox_reg_weights)
    l1 = jnp.sum(smooth_l1(pred_deltas, target, cfg.smooth_l1_beta), axis=-1)
    loss_box = jnp.sum(jnp.where(fg, l1, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
    return {"loss_cls": loss_cls, "loss_box_reg": loss_box}


def mask_head_loss(
    mask_logits: Array,
    sample: dict[str, Array],
    gt_masks_28: Array,
    cfg: ROIConfig,
) -> Array:
    """BCE over the matched class channel of each fg sample.

    gt_masks_28 (N, 2R, 2R) are GT masks pre-cropped+resized to the predicted
    box (host-side or via crop_and_resize in the caller).
    """
    fg = sample["fg"]
    cls = jnp.clip(sample["gt_class"], 0, cfg.num_classes - 1)
    logits = jnp.take_along_axis(
        mask_logits, cls[:, None, None, None].repeat(mask_logits.shape[2], 2).repeat(mask_logits.shape[3], 3), axis=1
    )[:, 0]
    labels = gt_masks_28.astype(logits.dtype)
    bce = (
        jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    ).mean(axis=(1, 2))
    return jnp.sum(jnp.where(fg, bce, 0.0)) / jnp.maximum(jnp.sum(fg), 1)


def paste_masks(
    mask_probs: Array, boxes: Array, image_hw: tuple[int, int], threshold: float = 0.5
) -> Array:
    """Paste (N, R, R) mask probabilities into full-image boolean masks.

    detectron2 paste_masks_in_image semantics (inverse ROIAlign-style grid
    sample with aligned corners offset), vectorized over detections.
    """
    h, w = image_hw
    n, r = mask_probs.shape[0], mask_probs.shape[1]

    def one(prob, box):
        x1, y1, x2, y2 = box
        # Map image pixel centers into mask coordinates.
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5 - x1) / jnp.maximum(x2 - x1, 1e-4) * r - 0.5
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5 - y1) / jnp.maximum(y2 - y1, 1e-4) * r - 0.5
        x0 = jnp.floor(xs)
        y0 = jnp.floor(ys)
        lx = xs - x0
        ly = ys - y0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, r - 1)
        x1i = jnp.clip(x0i + 1, 0, r - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, r - 1)
        y1i = jnp.clip(y0i + 1, 0, r - 1)
        inx = (xs > -1.0) & (xs < r)
        iny = (ys > -1.0) & (ys < r)
        # Clamp weights at borders (grid_sample zero-pad approximated by
        # clamping then masking fully-outside pixels).
        p00 = prob[y0i][:, x0i]
        p01 = prob[y0i][:, x1i]
        p10 = prob[y1i][:, x0i]
        p11 = prob[y1i][:, x1i]
        lx_ = lx[None, :]
        ly_ = ly[:, None]
        val = (p00 * (1 - lx_) + p01 * lx_) * (1 - ly_) + (p10 * (1 - lx_) + p11 * lx_) * ly_
        val = jnp.where(iny[:, None] & inx[None, :], val, 0.0)
        return val >= threshold

    return jax.vmap(one)(mask_probs, boxes)
