"""Jitted training steps: full Mask R-CNN fine-tune and association head.

Pure functions designed for ``pjit`` over a data-parallel mesh: the batch
axis is sharded, params/optimizer state replicated, gradients reduced by the
compiler-inserted collectives (no hand-written NCCL analogue — SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any

import jax
import optax

from apse_uav_tpu.dcnn.losses import batch_hard_triplet_loss
from apse_uav_tpu.dcnn.models.association import AssociationHead
from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN

Array = jax.Array


def detector_train_step(
    model: MaskRCNN,
    tx: optax.GradientTransformation,
    params: Any,
    opt_state: Any,
    images: Array,
    gt: dict[str, Array],
    rng: Array,
    freeze_backbone: bool = False,
) -> tuple[Any, Any, dict[str, Array]]:
    """One SGD step on the full detector loss (finetune_uav.py:231-246).

    Pass ``freeze_backbone=True`` when the optimizer masks out backbone
    params (the reference regime): it stop-gradients the FPN features,
    skipping the conv backward and the ROIAlign scatter-add transpose.
    """

    def loss_fn(p):
        losses = model.apply(
            {"params": p}, images, mode="losses", gt=gt, rng=rng,
            freeze_backbone=freeze_backbone,
        )
        total = sum(losses.values())
        return total, losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, {**losses, "loss_total": total}


def association_train_step(
    head: AssociationHead,
    tx: optax.GradientTransformation,
    params: Any,
    opt_state: Any,
    rois: Array,
    labels: Array,
    valid: Array,
    margin: float = 0.2,
) -> tuple[Any, Any, Array]:
    """One SGD step of batch-hard triplet training
    (train_association_head.py:102-113)."""

    def loss_fn(p):
        emb = head.apply({"params": p}, rois)
        return batch_hard_triplet_loss(labels, emb, margin, valid=valid)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
