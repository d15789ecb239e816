"""Online-mined triplet losses (reference: dcnn/online_triplet_loss/losses.py).

``batch_hard``: hardest positive / hardest negative per anchor
(losses.py:102-146).  ``batch_all``: mean over all valid positive-loss
triplets (losses.py:149-197).  Distances use the Gram-matrix trick
(losses.py:7-41) with the same zero-clamp + masked-sqrt handling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def pairwise_distances(embeddings: Array, squared: bool = False) -> Array:
    """(N, D) -> (N, N) pairwise euclidean distances (Gram-matrix trick)."""
    dot = embeddings @ embeddings.T
    sq = jnp.diag(dot)
    d2 = sq[:, None] - 2.0 * dot + sq[None, :]
    d2 = jnp.maximum(d2, 0.0)
    if squared:
        return d2
    # Masked sqrt: avoid inf gradient at exactly 0 (reference losses.py:33-40).
    zero = d2 == 0.0
    d = jnp.sqrt(d2 + jnp.where(zero, 1e-16, 0.0))
    return jnp.where(zero, 0.0, d)


def _positive_mask(labels: Array) -> Array:
    same = labels[:, None] == labels[None, :]
    not_self = ~jnp.eye(labels.shape[0], dtype=bool)
    return same & not_self


def _negative_mask(labels: Array) -> Array:
    return labels[:, None] != labels[None, :]


def batch_hard_triplet_loss(
    labels: Array, embeddings: Array, margin: float, squared: bool = False,
    valid: Array | None = None,
) -> Array:
    """max(hardest_pos - hardest_neg + margin, 0), mean over anchors."""
    d = pairwise_distances(embeddings, squared)
    pos_mask = _positive_mask(labels)
    neg_mask = _negative_mask(labels)
    if valid is not None:
        pos_mask &= valid[:, None] & valid[None, :]
        neg_mask &= valid[:, None] & valid[None, :]
    hardest_pos = jnp.max(jnp.where(pos_mask, d, 0.0), axis=1)
    max_d = jnp.max(d, axis=1, keepdims=True)
    hardest_neg = jnp.min(jnp.where(neg_mask, d, max_d + 1.0), axis=1)
    loss = jnp.maximum(hardest_pos - hardest_neg + margin, 0.0)
    if valid is None:
        return jnp.mean(loss)
    return jnp.sum(jnp.where(valid, loss, 0.0)) / jnp.maximum(jnp.sum(valid), 1)


def batch_all_triplet_loss(
    labels: Array, embeddings: Array, margin: float, squared: bool = False,
    valid: Array | None = None,
) -> tuple[Array, Array]:
    """Mean over positive-loss triplets; also returns that fraction."""
    d = pairwise_distances(embeddings, squared)
    anchor_pos = d[:, :, None]  # d(a, p)
    anchor_neg = d[:, None, :]  # d(a, n)
    loss = anchor_pos - anchor_neg + margin  # (A, P, N)
    i = labels[:, None] == labels[None, :]
    not_self = ~jnp.eye(labels.shape[0], dtype=bool)
    valid_triplet = (i & not_self)[:, :, None] & (~i)[:, None, :]
    if valid is not None:
        vv = valid[:, None] & valid[None, :]
        valid_triplet &= vv[:, :, None] & valid[None, None, :]
    loss = jnp.where(valid_triplet, jnp.maximum(loss, 0.0), 0.0)
    num_positive = jnp.sum(loss > 1e-16)
    num_valid = jnp.maximum(jnp.sum(valid_triplet), 1)
    mean_loss = jnp.sum(loss) / jnp.maximum(num_positive, 1)
    return mean_loss, num_positive / num_valid
