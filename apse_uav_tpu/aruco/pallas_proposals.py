"""Fused Pallas proposals kernel: the full multi-scale dark-square scoring
stage of the ArUco detector in ONE pass over VMEM-resident windows.

The XLA ``detector._proposals`` path (reference semantics:
``cv2.aruco.detectMarkers``'s candidate stage, /root/reference/
aruco_detect.py:261-269) materializes ~30 full score/dilation maps per
frame through HBM: 10 scales x (3 box-sum maps + contrast + threshold +
O(log r) dilation passes + cross-scale max) on the 4x-pooled grid — ~3.5
ms/frame measured on the v5e.  Here each (128, 256)-core window (plus
halos for the largest surround ring and dilation radius) is DMA'd to VMEM
once and EVERYTHING — integral image, all scales' box sums, contrast
scores, validity masking, square dilation, adjacent-scale non-max
suppression, and per-tile top-k — happens on-chip; only (16, 128)
result blocks leave the kernel.

Exactness vs the XLA path: scores are masked to each scale's valid
position extents BEFORE dilation (identical dilation inputs), windows
overlap by the full halo (cross-tile dilation sees the same neighbours),
and per-tile top-k with k_tile == k makes the XLA-side global top-k
provably equal to a full-map top-k: any global top-k element is within
its own tile's top-k.  The in-window integral image is mean-centred
upstream like the XLA path (cancellation control) and spans only a
248-row window, so its partial sums are strictly smaller than the
global integral's.

Layout rules honoured (PERF_NOTES.md): the manual window DMA has a
single fixed shape, an f32 source (no byte-typed ANY-space sources), and
lane offsets that are multiples of 128.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile core size: bigger cores amortize the (pad_left + right)-lane and
# (pad_top + ring)-row halos whose compute is pure waste — at (128, 256)
# halo lanes were 50% of tw and the 4K pooled grid took 20 steps/frame.
# (128, 512) cuts halo lanes to 33% and steps to 10; (256, 512) was
# better still on paper but blew the 16 MB scoped-VMEM stack (20.3 MB
# at 4K, round 4).
CORE_H = 128
CORE_W = 512
OUT_ROWS = 16
OUT_LANES = 128
POS_LANE0 = 8  # positions live in lanes [POS_LANE0, POS_LANE0 + k)


@dataclasses.dataclass(frozen=True)
class _ScalePlan:
    size: int  # marker side, px
    sc_in: int
    sc_mid: int
    sc_ring: int
    off_in: int
    off_mid: int
    n_y: int
    n_x: int
    r_d: int
    off_px: float  # candidate-centre offset added to pos * stride


@dataclasses.dataclass(frozen=True)
class _PropPlan:
    h4: int
    w4: int
    st: int
    k: int
    score_threshold: float
    min_diff: float
    scales: tuple  # of _ScalePlan
    r_max: int
    pad_top: int
    pad_left: int
    th: int  # window rows
    tw: int  # window lanes
    n_ty: int
    n_tx: int
    hp: int
    wp: int
    sr_h: int  # score-region rows  (CORE_H + 2 * r_max)
    sr_w: int  # score-region lanes (CORE_W + 2 * r_max)


def make_plan(h: int, w: int, p) -> _PropPlan:
    """Static geometry; box extents mirror detector._proposals exactly."""
    from . import detector as det  # local import: detector imports us too

    st = p.proposal_stride
    h4, w4 = h // st, w // st
    sqrt2 = 1.41421356
    scales = []
    for s in det._kept_scales(h, w, p):
        ring = int(round(s * 1.8))
        sc_in = max(s // st, 1)
        sc_mid = max(int(round(s * sqrt2 / st)), sc_in + 1)
        sc_ring = max(int(round(ring / st)), sc_mid + 1)
        off_in = (sc_ring - sc_in) // 2
        off_mid = (sc_ring - sc_mid) // 2
        n_y_i, n_x_i = h4 - sc_in + 1, w4 - sc_in + 1
        n_y_m, n_x_m = h4 - sc_mid + 1, w4 - sc_mid + 1
        n_y_r, n_x_r = h4 - sc_ring + 1, w4 - sc_ring + 1
        n_y = min(n_y_r, n_y_i - 2 * off_in if off_in else n_y_i,
                  n_y_m - 2 * off_mid if off_mid else n_y_m)
        n_x = min(n_x_r, n_x_i - 2 * off_in if off_in else n_x_i,
                  n_x_m - 2 * off_mid if off_mid else n_x_m)
        r_d = max(-(-s // (2 * st)), 1)
        scales.append(_ScalePlan(
            size=s, sc_in=sc_in, sc_mid=sc_mid, sc_ring=sc_ring,
            off_in=off_in, off_mid=off_mid, n_y=n_y, n_x=n_x, r_d=r_d,
            off_px=off_in * st + sc_in * st / 2.0,
        ))
    r_max = max(e.r_d for e in scales)
    ring_max = max(e.sc_ring for e in scales)
    # Window rows: score positions span [core - r_max, core_end + r_max);
    # their ring boxes read ii rows up to position + sc_ring - 1, and the
    # corner subtraction reads position - 1.
    pad_top = -(-(r_max + 1) // 8) * 8
    th = -(-(pad_top + CORE_H + r_max + ring_max) // 8) * 8
    # Lane halo must be a multiple of 128 (DMA lane-offset alignment).
    pad_left = 128
    right = -(-(r_max + ring_max) // 128) * 128
    tw = pad_left + CORE_W + right
    n_ty = -(-h4 // CORE_H)
    n_tx = -(-w4 // CORE_W)
    hp = (n_ty - 1) * CORE_H + th
    wp = pad_left + n_tx * CORE_W + right
    assert pad_top > r_max and pad_left > r_max + 1
    return _PropPlan(
        h4=h4, w4=w4, st=st, k=p.per_scale_k,
        score_threshold=p.score_threshold, min_diff=p.min_white_black_diff,
        scales=tuple(scales), r_max=r_max, pad_top=pad_top, pad_left=pad_left,
        th=th, tw=tw, n_ty=n_ty, n_tx=n_tx, hp=hp, wp=wp,
        sr_h=CORE_H + 2 * r_max, sr_w=CORE_W + 2 * r_max,
    )


def _cumsum_doubling(x, axis):
    """Inclusive cumsum via log-depth doubling shifts (VMEM-resident)."""
    n = x.shape[axis]
    d = 1
    while d < n:
        pad = [(0, 0), (0, 0)]
        pad[axis] = (d, 0)
        shifted = jnp.pad(x, pad)[: x.shape[0], : x.shape[1]]
        x = x + shifted
        d *= 2
    return x


def _shift_max(a, d, axis):
    """max(a shifted by -d, a, a shifted by +d) on a fixed shape."""
    pad = [(0, 0), (0, 0)]
    pad[axis] = (d, d)
    a_p = jnp.pad(a, pad, constant_values=-1.0)
    n = a.shape[axis]
    sl = lambda o: tuple(
        slice(d + o, d + o + n) if ax == axis else slice(None) for ax in range(2)
    )
    return jnp.maximum(jnp.maximum(a_p[sl(-d)], a_p[sl(0)]), a_p[sl(d)])


def _dilate_sq(a, r):
    done = 0
    while done < r:
        d = min(done + 1, r - done)
        a = _shift_max(_shift_max(a, d, 0), d, 1)
        done += d
    return a


def _make_kernel(plan: _PropPlan, debug_mode: str = "full"):
    """debug_mode isolates kernel stages for on-chip cost attribution:
    dma_only | ii_only | score_only | no_topk | full."""
    r = plan.r_max
    sr_h, sr_w = plan.sr_h, plan.sr_w
    ns = len(plan.scales)
    k = plan.k

    def kernel(src_ref, out_ref, win, sem):
        b = pl.program_id(0)
        ty = pl.program_id(1)
        tx = pl.program_id(2)
        n_ty, n_tx = pl.num_programs(1), pl.num_programs(2)
        total = pl.num_programs(0) * n_ty * n_tx
        sid = (b * n_ty + ty) * n_tx + tx
        slot = jax.lax.rem(sid, 2)

        def window_copy(step_id, slot_):
            bb = step_id // (n_ty * n_tx)
            tt = jax.lax.rem(step_id, n_ty * n_tx)
            oy = pl.multiple_of((tt // n_tx) * CORE_H, 8)
            txi = jax.lax.rem(tt, n_tx)
            # The source is pre-panelized per tile column (B, n_tx, hp, tw):
            # a window is a full-width row slice of its panel — ONE
            # contiguous th*tw block instead of th row-strided descriptors
            # (the strided form measured 0.54 ms/frame at 4K; the panels
            # cost one fused XLA slice-concat upstream).
            return pltpu.make_async_copy(
                src_ref.at[bb, txi, pl.ds(oy, plan.th), :],
                win.at[slot_],
                sem.at[slot_],
            )

        # Double-buffered window DMA: each step starts the NEXT window's
        # copy before computing on its own — a blocking start();wait() per
        # step exposed the full strided-copy latency (measured 2.08 of 2.91
        # ms/frame at 4K, 20 latency-bound row-strided copies per frame).
        @pl.when(sid == 0)
        def _first():
            window_copy(sid, slot).start()

        @pl.when(sid + 1 < total)
        def _prefetch():
            window_copy(sid + 1, 1 - slot).start()

        window_copy(sid, slot).wait()

        if debug_mode == "dma_only":
            out_ref[0, 0, 0, :, :] = jnp.full(
                (OUT_ROWS, OUT_LANES), jnp.sum(win[slot, :8, :128]), jnp.float32
            )
            return

        ii = _cumsum_doubling(_cumsum_doubling(win[slot], 0), 1)
        if debug_mode == "ii_only":
            out_ref[0, 0, 0, :, :] = jnp.full(
                (OUT_ROWS, OUT_LANES), jnp.sum(ii[:8, :128]), jnp.float32
            )
            return

        # Global score-grid coordinates of each score-region position.
        gy = jax.lax.broadcasted_iota(jnp.int32, (sr_h, sr_w), 0) + (ty * CORE_H - r)
        gx = jax.lax.broadcasted_iota(jnp.int32, (sr_h, sr_w), 1) + (tx * CORE_W - r)

        def box_region(off, sz):
            """Centred box sums for every score-region position."""
            # Window coords of the score position (ring-box top-left):
            # row = region_row - r + pad_top, col = region_col - r + pad_left.
            ay = plan.pad_top - r + off - 1
            ax = plan.pad_left - r + off - 1
            by, bx = ay + sz, ax + sz
            return (
                ii[by : by + sr_h, bx : bx + sr_w]
                - ii[ay : ay + sr_h, bx : bx + sr_w]
                - ii[by : by + sr_h, ax : ax + sr_w]
                + ii[ay : ay + sr_h, ax : ax + sr_w]
            )

        masked = []
        for e in plan.scales:
            inner = box_region(e.off_in, e.sc_in) / float(e.sc_in * e.sc_in)
            mid = box_region(e.off_mid, e.sc_mid)
            ring = box_region(0, e.sc_ring)
            outer = (ring - mid) / float(e.sc_ring * e.sc_ring - e.sc_mid * e.sc_mid)
            contrast = jnp.maximum(outer - inner, 0.0)
            sc = jnp.where(contrast >= plan.min_diff, contrast / 255.0, 0.0)
            ok = (gy >= 0) & (gy < e.n_y) & (gx >= 0) & (gx < e.n_x)
            masked.append(jnp.where(ok, sc, 0.0))
        if debug_mode == "score_only":
            acc = masked[0]
            for m in masked[1:]:
                acc = acc + m
            out_ref[0, 0, 0, :, :] = jnp.full(
                (OUT_ROWS, OUT_LANES), jnp.sum(acc), jnp.float32
            )
            return
        dil = [_dilate_sq(m, e.r_d) for m, e in zip(masked, plan.scales)]
        if debug_mode == "no_topk":
            acc = dil[0]
            for m in dil[1:]:
                acc = acc + m
            out_ref[0, 0, 0, :, :] = jnp.full(
                (OUT_ROWS, OUT_LANES), jnp.sum(acc), jnp.float32
            )
            return

        enc = (
            jax.lax.broadcasted_iota(jnp.int32, (CORE_H, CORE_W), 0) * CORE_W
            + jax.lax.broadcasted_iota(jnp.int32, (CORE_H, CORE_W), 1)
        )
        out_r = jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, OUT_LANES), 0)
        out_c = jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, OUT_LANES), 1)
        out = jnp.zeros((OUT_ROWS, OUT_LANES), jnp.float32)
        for si, e in enumerate(plan.scales):
            cross = dil[si]
            if si > 0:
                cross = jnp.maximum(cross, dil[si - 1])
            if si + 1 < ns:
                cross = jnp.maximum(cross, dil[si + 1])
            is_max = (masked[si] >= cross) & (masked[si] > plan.score_threshold)
            m = jnp.where(is_max, masked[si], 0.0)[r : r + CORE_H, r : r + CORE_W]
            for t in range(k):
                v = jnp.max(m)
                pos = jnp.min(jnp.where(m == v, enc, jnp.int32(1 << 30)))
                m = jnp.where(enc == pos, 0.0, m)
                cell_v = (out_r == si) & (out_c == t)
                cell_p = (out_r == si) & (out_c == POS_LANE0 + t)
                out = out + jnp.where(cell_v, v, 0.0)
                out = out + jnp.where(cell_p, pos.astype(jnp.float32), 0.0)
        out_ref[0, 0, 0, :, :] = out

    return kernel


@functools.partial(jax.jit, static_argnames=("plan", "interpret", "debug_mode"))
def _run(panels, *, plan: _PropPlan, interpret: bool, debug_mode: str = "full"):
    bsz = panels.shape[0]
    grid_spec = pl.GridSpec(
        grid=(bsz, plan.n_ty, plan.n_tx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 1, 1, OUT_ROWS, OUT_LANES), lambda b, i, j: (b, i, j, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, plan.th, plan.tw), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _make_kernel(plan, debug_mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (bsz, plan.n_ty, plan.n_tx, OUT_ROWS, OUT_LANES), jnp.float32
        ),
        interpret=interpret,
    )(panels)


def proposals_batched(gray: jax.Array, p, interpret: bool = False, debug_mode: str = "full"):
    """Batched drop-in for detector._proposals (decimate=False semantics).

    gray: (B, H, W) u8/f32.  Returns (centers (B,K,2) yx, sizes (B,K),
    scores (B,K), valid (B,K)) with K = len(scales) * per_scale_k, slots
    laid out per-scale in ladder order (the candidate stage's patch
    grouping relies on this).
    """
    bsz, h, w = gray.shape
    plan = make_plan(h, w, p)
    st = plan.st
    g = gray[:, : plan.h4 * st, : plan.w4 * st].astype(jnp.float32)
    # Pooling as reduce_window, NOT a reshape-mean: splitting the lane dim
    # (w -> (w4, st)) relayouts the whole 4K frame (~2 ms/frame measured —
    # it dominated the kernel's own cost).
    pool = jax.lax.reduce_window(
        g, 0.0, jax.lax.add, (1, st, st), (1, st, st), "VALID"
    ) / float(st * st)
    return proposals_batched_from_pool(pool, h, w, p, interpret=interpret, debug_mode=debug_mode)


def proposals_batched_from_pool(pool: jax.Array, h: int, w: int, p,
                                interpret: bool = False, debug_mode: str = "full"):
    """proposals_batched on a precomputed stride-pooled gray (B, h4, w4) f32.

    In the two-pass preproc the pool comes straight from the pooled-source
    remap kernel — the full-resolution gray is never materialized for
    proposal scoring.
    """
    bsz = pool.shape[0]
    plan = make_plan(h, w, p)
    st = plan.st
    pool = pool[:, : plan.h4, : plan.w4]
    pool = pool - jnp.mean(pool, axis=(1, 2), keepdims=True)
    pooled_padded = jnp.pad(
        pool,
        (
            (0, 0),
            (plan.pad_top, plan.hp - plan.h4 - plan.pad_top),
            (plan.pad_left, plan.wp - plan.w4 - plan.pad_left),
        ),
    )
    # Panelize per tile column: each kernel window becomes one CONTIGUOUS
    # (th, tw) block of its panel (see window_copy).  The panels duplicate
    # only the horizontal halos (~2x of 2 MB) — one fused XLA pass.
    panels = jnp.stack(
        [
            pooled_padded[:, :, tx * CORE_W : tx * CORE_W + plan.tw]
            for tx in range(plan.n_tx)
        ],
        axis=1,
    )  # (B, n_tx, hp, tw)
    res = _run(panels, plan=plan, interpret=interpret, debug_mode=debug_mode)  # (B,ty,tx,16,128)

    k = plan.k
    ns = len(plan.scales)
    vals = res[..., :ns, :k]  # (B, ty, tx, ns, k)
    pos = res[..., :ns, POS_LANE0 : POS_LANE0 + k].astype(jnp.int32)
    # Tile-local encoded position -> global score-grid coords.
    ty = jnp.arange(plan.n_ty, dtype=jnp.int32)[None, :, None, None, None]
    tx = jnp.arange(plan.n_tx, dtype=jnp.int32)[None, None, :, None, None]
    gy = ty * CORE_H + pos // CORE_W
    gx = tx * CORE_W + pos % CORE_W
    # Global top-k per scale over all tiles' top-k (exact: see module doc).
    vflat = jnp.moveaxis(vals, 3, 1).reshape(bsz, ns, -1)
    yflat = jnp.moveaxis(gy, 3, 1).reshape(bsz, ns, -1)
    xflat = jnp.moveaxis(gx, 3, 1).reshape(bsz, ns, -1)
    top_v, top_i = jax.lax.top_k(vflat, k)  # (B, ns, k)
    top_y = jnp.take_along_axis(yflat, top_i, axis=2).astype(jnp.float32)
    top_x = jnp.take_along_axis(xflat, top_i, axis=2).astype(jnp.float32)
    offs = jnp.asarray([e.off_px for e in plan.scales], jnp.float32)[None, :, None]
    sizes1 = jnp.asarray([float(e.size) for e in plan.scales], jnp.float32)
    cy = (top_y * st + offs).reshape(bsz, -1)
    cx = (top_x * st + offs).reshape(bsz, -1)
    vals_out = top_v.reshape(bsz, -1)
    sizes = jnp.broadcast_to(sizes1[None, :, None], (bsz, ns, k)).reshape(bsz, -1)
    valid = vals_out > plan.score_threshold
    return jnp.stack([cy, cx], axis=-1), sizes, vals_out, valid
