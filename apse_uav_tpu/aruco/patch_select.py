"""Candidate-driven tile selection for the two-pass preprocessing.

The full-resolution undistort+gamma+gray is only ever consumed inside the
candidate patches (detector._extract_patch) and the LED sample points that
lie within them (reference chain: aruco_detect.py:250-259 preproc feeding
:261-269 detectMarkers and :338-373 LED reads) — less than ~25% of the 8.3
Mpx frame.  The two-pass preproc therefore scores proposals on a pooled
remap and recomputes exact full-res gray only under the tiles covering the
valid candidates' patches (preproc.pallas_remap selected-tile mode).

This module picks those tiles on device, with a FIXED budget (static
shapes): every valid candidate demands the (th, tw)-tile rectangle covering
its patch (the exact `_extract_patch` clamp arithmetic); tiles are ranked
by the best per-scale rank of any candidate demanding them, so each scale's
strongest responses are covered first, and the budget cuts the weakest.
Candidates whose demand was not fully selected are reported uncovered and
invalidated before decoding — deterministic degradation instead of garbage
reads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("h", "w", "th", "tw", "groups", "t_sel", "per_scale_k"))
def select_tiles(centers: Array, valid: Array, *, h: int, w: int, th: int, tw: int,
                 groups: tuple, t_sel: int, per_scale_k: int):
    """Pick up to t_sel (th, tw) tiles covering the valid candidates' patches.

    centers: (K, 2) f32 yx proposal centres; valid: (K,) bool.
    groups: detector._patch_groups output ((start, stop, psize), ...).
    Returns (sel (t_sel,) i32 tile ids  [tile id = ty * ntx + tx; entries
    beyond the demanded set are -1 padding, skipped by the kernel],
    covered (K,) bool — True iff every tile of the candidate's patch was
    selected).
    """
    nty, ntx = h // th, w // tw
    n_tiles = nty * ntx
    t_sel = min(t_sel, n_tiles)  # small frames: the budget can exceed the grid
    k = centers.shape[0]

    psize = np.zeros(k, np.int32)
    for a, b, ps in groups:
        psize[a:b] = ps
    psize = jnp.asarray(psize)
    # Priority: rank within scale (slots are per-scale contiguous, rank =
    # slot % per_scale_k) — every scale's strongest candidates first.
    prio = jnp.arange(k, dtype=jnp.int32) % per_scale_k

    # EXACT _extract_patch clamp arithmetic (detector.py): the selected
    # tiles must cover precisely what dynamic_slice will read.
    cy = jnp.round(centers[:, 0]).astype(jnp.int32)
    cx = jnp.round(centers[:, 1]).astype(jnp.int32)
    oy = jnp.clip(cy - psize // 2, 0, h - psize)
    ox = jnp.clip(cx - psize // 2, 0, w - psize)
    ty0, ty1 = oy // th, (oy + psize - 1) // th
    tx0, tx1 = ox // tw, (ox + psize - 1) // tw

    tty = jnp.arange(nty, dtype=jnp.int32)
    ttx = jnp.arange(ntx, dtype=jnp.int32)
    in_y = (tty[None, :] >= ty0[:, None]) & (tty[None, :] <= ty1[:, None])  # (K, nty)
    in_x = (ttx[None, :] >= tx0[:, None]) & (ttx[None, :] <= tx1[:, None])  # (K, ntx)
    demand = in_y[:, :, None] & in_x[:, None, :] & valid[:, None, None]  # (K, nty, ntx)

    big = jnp.int32(per_scale_k)
    prio_t = jnp.min(
        jnp.where(demand, prio[:, None, None], big), axis=0
    )  # (nty, ntx), big where undemanded
    demanded = prio_t < big
    tid = jnp.arange(n_tiles, dtype=jnp.int32)
    # Unique integer score, higher = keep: better (lower) priority first,
    # tile id breaks ties deterministically.
    score = jnp.where(
        demanded.reshape(-1), (big - prio_t.reshape(-1)) * n_tiles + (n_tiles - 1 - tid), -1
    )
    top_v, top_i = jax.lax.top_k(score, t_sel)
    # Padding entries get -1: the selected-tile kernel skips them entirely
    # (no DMA, no compute), so second-pass cost tracks the TRUE demand.
    sel = jnp.where(top_v >= 0, top_i.astype(jnp.int32), -1)
    # Selected set = scores >= the t_sel-th (scores are unique), demanded only.
    kth = jnp.maximum(top_v[-1], 0)
    tile_sel = (score >= kth) & (score >= 0)  # (n_tiles,)
    missing = demand.reshape(k, n_tiles) & ~tile_sel[None, :]
    covered = valid & ~jnp.any(missing, axis=1)
    return sel, covered


def select_tiles_batched(centers: Array, valid: Array, **kw):
    """vmap over the batch: centers (B, K, 2), valid (B, K)."""
    return jax.vmap(functools.partial(select_tiles, **kw))(centers, valid)
