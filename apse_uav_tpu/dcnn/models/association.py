"""Re-ID embedding head (reference: dcnn/networks/association_head.py:13-25).

A single linear map from flattened ROI features to an L2-normalized
128-d embedding, trained with online-mined triplet loss.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class AssociationHead(nn.Module):
    embedding_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_features: Array) -> Array:
        """roi_features (N, C, R, R) or (N, D) -> (N, embedding_dim), unit-norm."""
        x = roi_features.reshape(roi_features.shape[0], -1).astype(self.dtype)
        x = nn.Dense(self.embedding_dim, name="fc")(x)
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(norm, 1e-12)
