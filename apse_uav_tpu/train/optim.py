"""Fine-tuning optimizer: SGD+momentum over a param subset.

Equivalent of ``build_finetune_optimizer`` (reference: dcnn/utils/utils.py:8-90):
select which submodules train (``backbone`` / ``proposal_generator`` /
``roi_heads``), zero out everything else, and apply the reference's
weight-decay override for norm layers (utils.py:43-44) — FrozenBN stats and
affines never receive weight decay (they are frozen entirely here, matching
what freezing the backbone achieves in the reference runs).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import optax

# Reference-to-tree mapping of the detectron2 submodule names used by
# build_finetune_optimizer(to_train=[...]) (finetune_uav.py:161).
_SUBMODULE_PREFIXES = {
    "backbone": ("backbone",),
    "proposal_generator": ("rpn_head",),
    "roi_heads": ("box_head", "mask_head"),
    # Granular selections (finetune_segmentation.py:155 trains only the mask
    # head; finetune_faster_rcnn_aerial.py:65-68 trains RPN + box regression).
    "mask_head": ("mask_head",),
    "box_head": ("box_head",),
}


def param_labels(params: Any, to_train: Sequence[str]) -> Any:
    """Label each param 'train' or 'frozen' by top-level submodule.

    FrozenBN statistics (mean/var) are always frozen.
    """
    prefixes: tuple[str, ...] = ()
    for name in to_train:
        prefixes += _SUBMODULE_PREFIXES[name]

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_from_path(path) -> str:
        keys = [getattr(p, "key", str(p)) for p in path]
        if keys and keys[0] in prefixes:
            if keys[-1] in ("mean", "var"):
                return "frozen"
            return "train"
        return "frozen"

    labels = jax.tree_util.tree_map_with_path(lambda p, _: label_from_path(p), params)
    return labels


def build_finetune_optimizer(
    params: Any,
    to_train: Sequence[str] = ("proposal_generator", "roi_heads"),
    lr: float | optax.Schedule = 0.02,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    """SGD + momentum + weight decay on the selected submodules only
    (reference defaults: finetune_uav.py:161, utils.py:82-88)."""
    labels = param_labels(params, to_train)
    sgd = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=lr, momentum=momentum),
    )
    # Skip (don't apply) non-finite updates instead of corrupting the params —
    # detection losses can spike on degenerate proposal batches.
    sgd = optax.apply_if_finite(sgd, max_consecutive_errors=1000)
    return optax.multi_transform(
        {"train": sgd, "frozen": optax.set_to_zero()}, labels
    )


def warmup_multistep_schedule(
    base_lr: float, steps: Sequence[int], warmup_iters: int = 1000, warmup_factor: float = 1e-3, gamma: float = 0.1
) -> optax.Schedule:
    """detectron2 WarmupMultiStepLR equivalent."""

    def schedule(count):
        import jax.numpy as jnp

        warm = warmup_factor + (1.0 - warmup_factor) * jnp.minimum(count / max(warmup_iters, 1), 1.0)
        decay = jnp.ones_like(warm)
        for s in steps:
            decay = decay * jnp.where(count >= s, gamma, 1.0)
        return base_lr * warm * decay

    return schedule
