"""Full Mask R-CNN (GeneralizedRCNN-equivalent) with TrackRCNN semantics.

TPU-native re-design of the reference meta-architecture
(dcnn/networks/track_rcnn.py — a GeneralizedRCNN whose ``inference`` also
returns raw backbone features for the association head, track_rcnn.py:57):
batched NHWC images, fixed-capacity proposals/detections with validity
masks, and a pure-function training step.
"""

from __future__ import annotations

import functools
import flax.linen as nn
import jax
import jax.numpy as jnp

from apse_uav_tpu.dcnn.config import ModelConfig
from apse_uav_tpu.dcnn.models.resnet import ResNetFPN
from apse_uav_tpu.dcnn.models.rpn import RPNHead, rpn_losses, select_proposals
from apse_uav_tpu.dcnn.models import roi_heads as rh
from apse_uav_tpu.dcnn.models.roi_heads import (
    BoxHead,
    MaskHead,
    box_head_losses,
    box_inference,
    fpn_roi_align,
    match_proposals_to_gt,
    mask_head_loss,
)

Array = jax.Array

RPN_LEVELS = ("p2", "p3", "p4", "p5", "p6")


class MaskRCNN(nn.Module):
    """Flax module with three entry points selected by ``mode``:

    * ``backbone``: images -> feature dict (res* + p*)
    * ``inference``: images -> (detections, features)
    * ``losses``: (images, gt) -> loss dict
    """

    cfg: ModelConfig

    def setup(self):
        dtype = jnp.dtype(self.cfg.compute_dtype)
        head_dtype = jnp.dtype(self.cfg.head_compute_dtype or self.cfg.compute_dtype)
        self.backbone = ResNetFPN(
            depth=self.cfg.depth,
            channels=self.cfg.fpn_channels,
            stride_in_1x1=self.cfg.stride_in_1x1,
            dtype=dtype,
        )
        num_anchors = len(self.cfg.anchors.aspect_ratios)
        self.rpn_head = RPNHead(num_anchors=num_anchors, channels=self.cfg.fpn_channels, dtype=head_dtype)
        self.box_head = BoxHead(
            num_classes=self.cfg.roi.num_classes,
            fc_dim=self.cfg.roi.box_fc_dim,
            num_fc=self.cfg.roi.num_box_fc,
            dtype=head_dtype,
        )
        if self.cfg.mask_on:
            self.mask_head = MaskHead(
                num_classes=self.cfg.roi.num_classes,
                conv_dim=self.cfg.roi.mask_conv_dim,
                num_conv=self.cfg.roi.num_mask_conv,
                dtype=head_dtype,
            )

    def _normalize(self, images: Array) -> Array:
        """images (B, H, W, 3) float in the configured channel format."""
        mean = jnp.asarray(self.cfg.input.pixel_mean)
        std = jnp.asarray(self.cfg.input.pixel_std)
        return (images - mean) / std

    def __call__(self, images: Array, mode: str = "inference", gt: dict | None = None, rng: Array | None = None,
                 freeze_backbone: bool = False):
        if mode == "backbone":
            return self.backbone(self._normalize(images))
        if mode == "inference":
            return self.inference(images)
        if mode == "losses":
            return self.losses(images, gt, rng, freeze_backbone=freeze_backbone)
        if mode == "losses_gt_proposals":
            # PrecomputedProposals regime (finetune_segmentation.py:82-93):
            # the RPN is bypassed and GT boxes feed the ROI heads directly.
            return self.losses(images, gt, rng, gt_proposals=True, freeze_backbone=freeze_backbone)
        if mode == "roi_features":
            # COWC ROI-feature precompute (cowc_utils.py:182-193): backbone
            # -> box_pooler -> box_head FC trunk on PROVIDED boxes, no RPN,
            # no predictors.  gt = {"boxes": (B, N, 4) xyxy}.
            feats = self.backbone(self._normalize(images))
            cfg = self.cfg

            def per_image(feats_i, boxes_i):
                pooled = fpn_roi_align(feats_i, boxes_i, cfg.roi.box_pooler_resolution, cfg.roi.pooler_sampling_ratio)
                return self.box_head(pooled, features_only=True)

            return jax.vmap(per_image)(feats, gt["boxes"])
        raise ValueError(mode)

    def inference(self, images: Array, rpn_levels: tuple[str, ...] | None = None) -> tuple[dict[str, Array], dict[str, Array]]:
        """images (B, H, W, 3) -> (detections, backbone features).

        detections: boxes (B, D, 4), scores (B, D), classes (B, D),
        valid (B, D), and (if mask_on) masks (B, D, 2R, 2R) probabilities
        (paste to full image with roi_heads.paste_masks).

        ``rpn_levels`` restricts proposal generation (SelectiveMaskRCNN.scan
        uses only the coarsest level — selective_rcnn.py:27-84).
        """
        cfg = self.cfg
        feats = self.backbone(self._normalize(images))
        rpn_feats = {n: feats[n] for n in RPN_LEVELS}
        logits, deltas = self.rpn_head(rpn_feats)
        level_shapes = {n: tuple(rpn_feats[n].shape[1:3]) for n in RPN_LEVELS}
        image_hw = tuple(images.shape[1:3])

        def per_image(logits_i, deltas_i, feats_i):
            boxes, scores, valid = select_proposals(
                logits_i, deltas_i, level_shapes, image_hw, cfg.anchors, cfg.rpn,
                training=False, levels=rpn_levels,
            )
            pooled = fpn_roi_align(
                feats_i, boxes, cfg.roi.box_pooler_resolution, cfg.roi.pooler_sampling_ratio
            )
            cls_logits, box_deltas = self.box_head(pooled)
            det = box_inference(cls_logits, box_deltas, boxes, valid, image_hw, cfg.roi)
            if cfg.mask_on:
                mask_pooled = fpn_roi_align(
                    feats_i, det["boxes"], cfg.roi.mask_pooler_resolution, cfg.roi.pooler_sampling_ratio
                )
                mask_logits = self.mask_head(mask_pooled)  # (D, K, 2R, 2R)
                cls = jnp.clip(det["classes"], 0, cfg.roi.num_classes - 1)
                sel = jnp.take_along_axis(
                    mask_logits,
                    cls[:, None, None, None].repeat(mask_logits.shape[2], 2).repeat(mask_logits.shape[3], 3),
                    axis=1,
                )[:, 0]
                det["masks"] = jax.nn.sigmoid(sel)
            return det

        pool_feats = {n: feats[n] for n in rh.POOL_LEVELS}
        dets = jax.vmap(per_image)(logits, deltas, pool_feats)
        return dets, feats

    def losses(self, images: Array, gt: dict[str, Array], rng: Array, gt_proposals: bool = False,
               freeze_backbone: bool = False) -> dict[str, Array]:
        """Training losses.

        gt: boxes (B, G, 4), classes (B, G), valid (B, G), and (if mask_on)
        masks_28 (B, G, 2R, 2R) — GT masks rasterized per matched box are
        approximated by per-GT-box masks resampled to the sampled box inside
        the loss (crop_and_resize on device).

        ``freeze_backbone`` stop-gradients the feature maps — matching the
        reference fine-tune regime (finetune_uav.py:161: only RPN + ROI
        heads train) and, crucially for performance, eliminating the entire
        conv backward + the ROIAlign-gather transpose (a giant scatter-add
        into the FPN maps, the slowest op on both TPU and CPU).
        """
        cfg = self.cfg
        feats = self.backbone(self._normalize(images))
        if freeze_backbone:
            feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)
        rpn_feats = {n: feats[n] for n in RPN_LEVELS}
        logits, deltas = self.rpn_head(rpn_feats)
        # bf16 training: heads compute in cfg.compute_dtype, but everything
        # the LOSSES consume is cast to f32 here so anchor matching, box
        # decoding, and loss reductions stay full-precision (f32 master
        # params + f32 loss reductions; no-op when compute_dtype is f32).
        to_f32 = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), t
        )
        logits, deltas = to_f32(logits), to_f32(deltas)
        level_shapes = {n: tuple(rpn_feats[n].shape[1:3]) for n in RPN_LEVELS}
        image_hw = tuple(images.shape[1:3])
        b = images.shape[0]
        rngs = jax.random.split(rng, 3 * b)
        rpn_rngs, roi_rngs = rngs[:b], rngs[b : 2 * b]

        def per_image(rng_rpn, rng_roi, logits_i, deltas_i, feats_i, gt_i):
            if gt_proposals:
                losses = {}
                boxes = gt_i["boxes"]
                valid = gt_i["valid"]
            else:
                losses = rpn_losses(
                    rng_rpn, logits_i, deltas_i, level_shapes, gt_i["boxes"], gt_i["valid"], cfg.anchors, cfg.rpn
                )
                boxes, scores, valid = select_proposals(
                    logits_i, deltas_i, level_shapes, image_hw, cfg.anchors, cfg.rpn, training=True
                )
                boxes = jax.lax.stop_gradient(boxes)
            sample = match_proposals_to_gt(
                boxes, valid, gt_i["boxes"], gt_i["classes"], gt_i["valid"], cfg.roi, rng_roi
            )
            pooled = fpn_roi_align(
                feats_i, sample["boxes"], cfg.roi.box_pooler_resolution, cfg.roi.pooler_sampling_ratio
            )
            cls_logits, box_deltas = self.box_head(pooled)
            cls_logits = cls_logits.astype(jnp.float32)
            box_deltas = box_deltas.astype(jnp.float32)
            losses.update(box_head_losses(cls_logits, box_deltas, sample, gt_i["boxes"], cfg.roi))
            if cfg.mask_on and "masks" in gt_i:
                r2 = 2 * cfg.roi.mask_pooler_resolution
                mask_pooled = fpn_roi_align(
                    feats_i, sample["boxes"], cfg.roi.mask_pooler_resolution, cfg.roi.pooler_sampling_ratio
                )
                mask_logits = self.mask_head(mask_pooled).astype(jnp.float32)
                # GT mask for each sample: crop the matched GT's full-image
                # mask to the sampled box, resampled to 2R x 2R.  Gather +
                # crop run CHUNKED over the samples: the naive per-sample
                # gather materializes (S, Hm, Wm) f32 — 8.25 GB at the real
                # fine-tune scale (batch 4, 768x1344, S=512), found OOM on
                # the v5e by scripts/bench_train.py.
                target = _gather_crop_resize_masks(
                    gt_i["masks"] > 0.5, sample["matched_gt"], sample["boxes"], image_hw, r2
                )
                losses["loss_mask"] = mask_head_loss(mask_logits, sample, target, cfg.roi)
            return losses

        pool_feats = {n: feats[n] for n in rh.POOL_LEVELS}
        per = jax.vmap(per_image)(rpn_rngs, roi_rngs, logits, deltas, pool_feats, gt)
        return {k: jnp.mean(v) for k, v in per.items()}


def _gather_crop_resize_masks(gt_masks: Array, matched: Array, boxes: Array,
                              image_hw, out_size: int, chunk: int = 32) -> Array:
    """Per-sample GT-mask targets with a BOUNDED gather footprint.

    gt_masks (G, Hm, Wm) bool; matched (S,) gt index per sampled proposal;
    boxes (S, 4).  lax.map over chunks keeps the gathered full-image masks
    at (chunk, Hm, Wm) bool — 32 MB instead of the 8.25 GB f32 tensor the
    flat (S, Hm, Wm) gather allocates at the real fine-tune scale.
    """
    s = matched.shape[0]
    pad = (-s) % chunk
    matched_p = jnp.pad(matched, (0, pad))
    boxes_p = jnp.pad(boxes, ((0, pad), (0, 0)))

    def one_chunk(args):
        mi, bi = args
        return _crop_resize_masks(gt_masks[mi], bi, image_hw, out_size)

    outs = jax.lax.map(
        one_chunk, (matched_p.reshape(-1, chunk), boxes_p.reshape(-1, chunk, 4))
    )
    return outs.reshape(-1, out_size, out_size)[:s]


def _crop_resize_masks(masks: Array, boxes: Array, image_hw, out_size: int) -> Array:
    """Bilinear crop+resize of full-image binary masks to each box.

    masks (N, H, W) in image resolution (possibly downsampled — coords scale),
    boxes (N, 4) in image coords.  Output (N, out, out) in {0, 1}.
    """
    h, w = masks.shape[1:]
    sy = h / image_hw[0]
    sx = w / image_hw[1]

    def one(m, box):
        x1, y1, x2, y2 = box[0] * sx, box[1] * sy, box[2] * sx, box[3] * sy
        xs = x1 + (jnp.arange(out_size) + 0.5) / out_size * jnp.maximum(x2 - x1, 1e-4)
        ys = y1 + (jnp.arange(out_size) + 0.5) / out_size * jnp.maximum(y2 - y1, 1e-4)
        xi = jnp.clip(xs.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(ys.astype(jnp.int32), 0, h - 1)
        return m[yi][:, xi] > 0.5

    return jax.vmap(one)(masks, boxes)


def build_mask_rcnn(cfg: ModelConfig) -> MaskRCNN:
    return MaskRCNN(cfg=cfg)


@functools.partial(jax.jit, static_argnums=(0,))
def run_inference(model: MaskRCNN, params, images: Array):
    """Jitted inference entry: returns (detections, features)."""
    return model.apply({"params": params}, images, mode="inference")
