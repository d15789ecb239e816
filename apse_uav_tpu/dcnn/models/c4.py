"""Mask R-CNN C4: res4 backbone, single-level RPN, res5 ROI head.

TPU-native equivalent of the reference's C4 model family
(/root/reference/dcnn/configs/Base-RCNN-C4.yaml:1-18 and
mask_rcnn_R_{50,101}_C4_3x.yaml): detectron2 ``Res5ROIHeads`` semantics —
ROIAlign(14x14, stride 16) on res4, the res5 stage (stride-2 first block)
as the shared ROI transform, mean-pooled 2048-d box features with linear
predictors, and a deconv+1x1 mask head on the SAME res5 features (14x14
masks; at inference the res5 transform reruns on the final detection
boxes, as detectron2 does).

Interface-compatible with :class:`~.mask_rcnn.MaskRCNN` (``mode`` dispatch,
(detections, features) inference tuple) so engines and training loops work
unchanged; ``build_model`` in this package picks the class from
``cfg.architecture``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from apse_uav_tpu.dcnn.config import ModelConfig
from apse_uav_tpu.dcnn.models.resnet import ResNet, Res5Stage
from apse_uav_tpu.dcnn.models.rpn import RPNHead, rpn_losses, select_proposals
from apse_uav_tpu.dcnn.models.roi_heads import (
    MaskHead,
    box_head_losses,
    box_inference,
    mask_head_loss,
    match_proposals_to_gt,
)
from apse_uav_tpu.dcnn.models.mask_rcnn import _gather_crop_resize_masks
from apse_uav_tpu.dcnn.ops.roi_align import roi_align_hwc

Array = jax.Array

RPN_LEVELS_C4 = ("res4",)
C4_STRIDE = 16


class C4BoxPredictor(nn.Module):
    """FastRCNNOutputLayers over mean-pooled res5 features (no FC trunk)."""

    num_classes: int

    @nn.compact
    def __call__(self, x: Array):
        n = x.shape[0]
        scores = nn.Dense(self.num_classes + 1, name="cls_score",
                          kernel_init=nn.initializers.normal(0.01))(x)
        deltas = nn.Dense(self.num_classes * 4, name="bbox_pred",
                          kernel_init=nn.initializers.normal(0.001))(x)
        return scores, deltas.reshape(n, self.num_classes, 4)


class MaskRCNNC4(nn.Module):
    """See module docstring.  ``mode`` mirrors MaskRCNN's entry points."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        head_dtype = jnp.dtype(cfg.head_compute_dtype or cfg.compute_dtype)
        self.backbone = ResNet(
            depth=cfg.depth, stride_in_1x1=cfg.stride_in_1x1, dtype=dtype, max_stage=4
        )
        self.rpn_head = RPNHead(
            num_anchors=cfg.anchors.num_cell_anchors, channels=1024, dtype=head_dtype
        )
        # res5 is the backbone's last stage living in the ROI head: it
        # follows the BACKBONE dtype.
        self.res5 = Res5Stage(depth=cfg.depth, stride_in_1x1=cfg.stride_in_1x1, dtype=dtype)
        self.box_predictor = C4BoxPredictor(num_classes=cfg.roi.num_classes)
        if cfg.mask_on:
            # detectron2 C4 mask head == MaskRCNNConvUpsampleHead with zero
            # 3x3 convs: deconv(2048 -> 256) + relu + 1x1 predictor.
            self.mask_head = MaskHead(
                num_classes=cfg.roi.num_classes,
                conv_dim=cfg.roi.mask_conv_dim,
                num_conv=0,
                dtype=head_dtype,
            )

    def _normalize(self, images: Array) -> Array:
        mean = jnp.asarray(self.cfg.input.pixel_mean)
        std = jnp.asarray(self.cfg.input.pixel_std)
        return (images - mean) / std

    def _roi_transform(self, res4_i: Array, boxes: Array) -> Array:
        """ROIAlign(14, 1/16) + res5 -> (N, 7, 7, 2048) NHWC."""
        cfg = self.cfg
        pooled = roi_align_hwc(
            res4_i, boxes, cfg.roi.box_pooler_resolution, 1.0 / C4_STRIDE,
            cfg.roi.pooler_sampling_ratio, aligned=False,
        )  # (N, C, 14, 14)
        return self.res5(jnp.transpose(pooled, (0, 2, 3, 1)))

    def __call__(self, images: Array, mode: str = "inference", gt: dict | None = None,
                 rng: Array | None = None, freeze_backbone: bool = False):
        if mode == "backbone":
            return self.backbone(self._normalize(images))
        if mode == "inference":
            return self.inference(images)
        if mode == "losses":
            return self.losses(images, gt, rng, freeze_backbone=freeze_backbone)
        if mode == "losses_gt_proposals":
            return self.losses(images, gt, rng, gt_proposals=True, freeze_backbone=freeze_backbone)
        raise ValueError(mode)

    def inference(self, images: Array, rpn_levels: tuple[str, ...] | None = None):
        cfg = self.cfg
        feats = self.backbone(self._normalize(images))
        rpn_feats = {"res4": feats["res4"]}
        logits, deltas = self.rpn_head(rpn_feats)
        logits = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), logits)
        deltas = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), deltas)
        level_shapes = {"res4": tuple(feats["res4"].shape[1:3])}
        image_hw = tuple(images.shape[1:3])

        def per_image(logits_i, deltas_i, res4_i):
            boxes, scores, valid = select_proposals(
                logits_i, deltas_i, level_shapes, image_hw, cfg.anchors, cfg.rpn,
                training=False, levels=rpn_levels,
            )
            box_feats = self._roi_transform(res4_i, boxes).mean(axis=(1, 2))
            cls_logits, box_deltas = self.box_predictor(box_feats.astype(jnp.float32))
            det = box_inference(cls_logits, box_deltas, boxes, valid, image_hw, cfg.roi)
            if cfg.mask_on:
                # detectron2 Res5ROIHeads.forward_with_given_boxes: rerun
                # the shared transform on the FINAL detection boxes.
                mask_feats = self._roi_transform(res4_i, det["boxes"])
                mask_logits = self.mask_head(
                    jnp.transpose(mask_feats, (0, 3, 1, 2))
                ).astype(jnp.float32)  # (D, K, 14, 14)
                cls = jnp.clip(det["classes"], 0, cfg.roi.num_classes - 1)
                sel = jnp.take_along_axis(
                    mask_logits,
                    cls[:, None, None, None]
                    .repeat(mask_logits.shape[2], 2)
                    .repeat(mask_logits.shape[3], 3),
                    axis=1,
                )[:, 0]
                det["masks"] = jax.nn.sigmoid(sel)
            return det

        dets = jax.vmap(per_image)(logits, deltas, feats["res4"])
        return dets, feats

    def losses(self, images: Array, gt: dict[str, Array], rng: Array,
               gt_proposals: bool = False, freeze_backbone: bool = False) -> dict[str, Array]:
        cfg = self.cfg
        feats = self.backbone(self._normalize(images))
        if freeze_backbone:
            feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)
        rpn_feats = {"res4": feats["res4"]}
        logits, deltas = self.rpn_head(rpn_feats)
        to_f32 = lambda t: jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), t)
        logits, deltas = to_f32(logits), to_f32(deltas)
        level_shapes = {"res4": tuple(feats["res4"].shape[1:3])}
        image_hw = tuple(images.shape[1:3])
        b = images.shape[0]
        rngs = jax.random.split(rng, 2 * b)
        rpn_rngs, roi_rngs = rngs[:b], rngs[b:]

        def per_image(rng_rpn, rng_roi, logits_i, deltas_i, res4_i, gt_i):
            if gt_proposals:
                losses = {}
                boxes = gt_i["boxes"]
                valid = gt_i["valid"]
            else:
                losses = rpn_losses(
                    rng_rpn, logits_i, deltas_i, level_shapes, gt_i["boxes"],
                    gt_i["valid"], cfg.anchors, cfg.rpn,
                )
                boxes, scores, valid = select_proposals(
                    logits_i, deltas_i, level_shapes, image_hw, cfg.anchors, cfg.rpn,
                    training=True,
                )
                boxes = jax.lax.stop_gradient(boxes)
            sample = match_proposals_to_gt(
                boxes, valid, gt_i["boxes"], gt_i["classes"], gt_i["valid"], cfg.roi, rng_roi
            )
            x5 = self._roi_transform(res4_i, sample["boxes"])  # (S, 7, 7, 2048)
            cls_logits, box_deltas = self.box_predictor(
                x5.mean(axis=(1, 2)).astype(jnp.float32)
            )
            cls_logits = cls_logits.astype(jnp.float32)
            box_deltas = box_deltas.astype(jnp.float32)
            losses.update(box_head_losses(cls_logits, box_deltas, sample, gt_i["boxes"], cfg.roi))
            if cfg.mask_on and "masks" in gt_i:
                # detectron2 Res5ROIHeads training: the mask head consumes
                # the SAME res5 features as the box predictor.
                r2 = 2 * cfg.roi.mask_pooler_resolution
                mask_logits = self.mask_head(
                    jnp.transpose(x5, (0, 3, 1, 2))
                ).astype(jnp.float32)
                target = _gather_crop_resize_masks(
                    gt_i["masks"] > 0.5, sample["matched_gt"], sample["boxes"], image_hw, r2
                )
                losses["loss_mask"] = mask_head_loss(mask_logits, sample, target, cfg.roi)
            return losses

        per = jax.vmap(per_image)(rpn_rngs, roi_rngs, logits, deltas, feats["res4"], gt)
        return {k: jnp.mean(v) for k, v in per.items()}


def build_model(cfg: ModelConfig):
    """Architecture dispatch: cfg.architecture 'fpn' -> MaskRCNN, 'c4' ->
    MaskRCNNC4."""
    if cfg.architecture == "c4":
        return MaskRCNNC4(cfg=cfg)
    from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN

    return MaskRCNN(cfg=cfg)
