"""Fixed-capacity track store — the TPU equivalent of ObjectInstances.

The reference keeps a mutable, variable-length ``ObjectInstances``
(dcnn/structures/object_instances.py) updated per frame.  Here the store is a
pytree of fixed-capacity arrays + an ``active`` mask, so the whole
tracker update is a pure function usable inside ``jit`` / ``lax.scan``.

Masks are stored compactly as (R, R) probabilities in box coordinates (the
model's native mask head output); full-image masks are pasted on demand
(roi_heads.paste_masks) for export/visualization.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def init_track_state(max_tracks: int, embedding_dim: int = 128, mask_res: int = 28) -> dict[str, Array]:
    """Empty track store with capacity ``max_tracks``."""
    t = max_tracks
    return {
        "active": jnp.zeros(t, bool),
        "ids": jnp.zeros(t, jnp.int32),
        "detected_this_frame": jnp.zeros(t, bool),
        "frames_since_detected": jnp.zeros(t, jnp.int32),
        "boxes": jnp.zeros((t, 4), jnp.float32),
        "scores": jnp.zeros(t, jnp.float32),
        "classes": jnp.zeros(t, jnp.int32),
        "masks": jnp.zeros((t, mask_res, mask_res), jnp.float32),
        "embeddings": jnp.zeros((t, embedding_dim), jnp.float32),
        "next_id": jnp.int32(1),  # reference ids start at 1 (get_new_id)
    }


def delete_undetected(state: dict[str, Array], frames_threshold: int) -> dict[str, Array]:
    """Deactivate tracks unseen for more than ``frames_threshold`` frames
    (reference: delete_undetected_objects, object_instances.py:105-125)."""
    drop = state["active"] & (state["frames_since_detected"] > frames_threshold)
    return {**state, "active": state["active"] & ~drop}


def finish_association(state: dict[str, Array]) -> dict[str, Array]:
    """Age counters at end of frame (object_instances.py:155-162)."""
    fsd = jnp.where(
        state["detected_this_frame"], 0, state["frames_since_detected"] + 1
    )
    return {
        **state,
        "frames_since_detected": jnp.where(state["active"], fsd, state["frames_since_detected"]),
        "detected_this_frame": jnp.zeros_like(state["detected_this_frame"]),
    }


def recent_objects(state: dict[str, Array]) -> dict[str, Array]:
    """Snapshot of tracks detected this frame (object_instances.py:165-177):
    same capacity, with a ``valid`` mask instead of a shorter list."""
    valid = state["active"] & state["detected_this_frame"]
    return {
        "valid": valid,
        "ids": state["ids"],
        "boxes": state["boxes"],
        "scores": state["scores"],
        "classes": state["classes"],
        "masks": state["masks"],
        "embeddings": state["embeddings"],
    }
