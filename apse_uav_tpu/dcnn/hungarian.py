"""Fixed-size linear assignment (Hungarian) on device.

Replaces ``scipy.optimize.linear_sum_assignment`` in the tracker association
step (reference: dcnn/engines/rcnn_tracker.py:132), keeping the whole
associate-detections-to-tracks computation on the TPU instead of a
device->host->device round trip.

Implementation: the classical O(n^3) shortest-augmenting-path form of the
Hungarian algorithm with dual potentials (Jonker-Volgenant style).  The
per-row Dijkstra scan is a ``lax.while_loop`` whose body is dense O(n)
vector work — XLA-friendly, no host sync, exact optimum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

# Pad value for masked entries.  Must dominate any real cost but stay small
# enough that f32 keeps resolution when padded rows join augmenting paths:
# ULP(1e4) ~ 1e-3, far below meaningful cost differences (embedding
# distances are < 4 with threshold 0.6); ULP(1e7) would be 1.0 and silently
# absorb sub-unit dual-potential updates.
_BIG = 1e4


@functools.partial(jax.jit, static_argnames=("maximize",))
def linear_sum_assignment(cost: Array, maximize: bool = False) -> tuple[Array, Array]:
    """Optimal assignment for a square (N, N) cost matrix.

    Returns (row_ind, col_ind) like scipy: row_ind = arange(N) and col_ind[i]
    is the column assigned to row i.  Pad rectangular problems to square
    (see :func:`pad_cost`).
    """
    cost = cost.astype(jnp.float32)
    if maximize:
        cost = -cost
    n = cost.shape[0]
    inf = jnp.float32(jnp.inf)
    # Index n is the virtual source column.
    u0 = jnp.zeros(n, jnp.float32)
    v0 = jnp.zeros(n + 1, jnp.float32)
    p0 = jnp.full(n + 1, -1, jnp.int32)  # p[j] = row owning column j

    def add_row(i, state):
        u, v, p = state
        p = p.at[n].set(i)
        minv = jnp.full(n + 1, inf)
        way = jnp.full(n + 1, n, jnp.int32)
        used = jnp.zeros(n + 1, bool)

        def cond(s):
            return s[2][s[6]] != -1

        def body(s):
            u, v, p, minv, way, used, j0 = s
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = cost[i0] - u[i0] - v[:n]  # (n,)
            better = (~used[:n]) & (cur < minv[:n])
            minv = minv.at[:n].set(jnp.where(better, cur, minv[:n]))
            way = way.at[:n].set(jnp.where(better, j0, way[:n]))
            masked = jnp.where(used[:n], inf, minv[:n])
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # Dual updates over scanned columns.
            add = jnp.where(used, delta, 0.0)
            u = u.at[jnp.where(used, p, 0)].add(jnp.where(used, delta, 0.0), mode="drop")
            v = v - add
            minv = jnp.where(used, minv, minv - delta)
            return u, v, p, minv, way, used, j1

        u, v, p, minv, way, used, j0 = jax.lax.while_loop(
            cond, body, (u, v, p, minv, way, used, jnp.int32(n))
        )

        # Augment along the alternating path back to the virtual column.
        def aug_cond(s):
            j0, _ = s
            return j0 != n

        def aug_body(s):
            j0, p = s
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return j1, p

        _, p = jax.lax.while_loop(aug_cond, aug_body, (j0, p))
        return u, v, p

    u, v, p = jax.lax.fori_loop(0, n, add_row, (u0, v0, p0))
    row_of_col = p[:n]
    col_of_row = jnp.zeros(n, jnp.int32).at[row_of_col].set(jnp.arange(n, dtype=jnp.int32))
    return jnp.arange(n, dtype=jnp.int32), col_of_row


def pad_cost(cost: Array, row_valid: Array, col_valid: Array, pad_value: float = _BIG) -> Array:
    """Mask invalid rows/cols of a square-padded cost matrix with a large
    finite constant so real pairs are always preferred and the padded
    problem stays feasible."""
    c = jnp.where(row_valid[:, None] & col_valid[None, :], cost, pad_value)
    return jnp.where(jnp.isfinite(c), c, pad_value)
