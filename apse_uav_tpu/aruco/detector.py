"""TPU-native ArUco detector: fixed-shape, vmap-friendly, gather-light.

Replaces cv2.aruco.detectMarkers with CORNER_REFINE_APRILTAG (reference
aruco_detect.py:261-269 with tuned params :194-202).  The C++ implementation
is pointer-chasing (union-find clustering, contour tracing); this is a
re-derivation for dense hardware:

1. **Proposals** — dark-square blob scores from integral-image box sums at a
   fixed scale pyramid, evaluated on a stride-4 grid (pure slicing, no
   gathers), local-max + top-K -> K fixed candidate slots.
2. **Quad extraction** — per candidate (vmapped): a fixed 64x64 resampled
   window, 2-means binarization, radial 90-degree-periodic corner finding
   (segment max over angular sectors), then subpixel refinement by fitting
   each edge line to gradient-weighted edge crossings sampled in native
   image coordinates (the AprilTag idea, as dense math), corners = line
   intersections.
3. **Decode** — perspective bit sampling on a 6x6 cell grid with the
   reference's margin semantics (perspectiveRemovePixelPerCell=8,
   IgnoredMarginPerCell=0.33), Otsu-split threshold over cell means, border
   validation, DICT_4X4_50 match with errorCorrectionRate=2.0, canonical
   corner rotation, and score-based dedup of overlapping candidates.

Everything is static-shape: ``detect`` returns K candidate slots with a
validity mask, batched over frames with vmap.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from apse_uav_tpu.aruco import dictionary as dict_mod

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DetectorParams:
    """Tuned to mirror the reference's detector configuration."""

    # Candidate budget is PER SCALE (top `per_scale_k` local maxima of each
    # scale's score map), not one global top-K: every marker competes only
    # against same-size blobs, so the flood of 8-16 px sub-pattern responses
    # that markers' own interiors generate cannot crowd a genuine 40 px quad
    # out of the candidate set (the round-2 veh2 recall flap).
    per_scale_k: int = 6
    # cv2's quad-size floor (reference aruco_detect.py:194): candidate
    # perimeter >= rate * max(W, H), i.e. min side ~9.6 px at 4K.  Scales
    # well under the floor are skipped (their quads could never pass), and
    # decoded quads below the floor are rejected, matching cv2's behavior
    # at every frame size.
    min_marker_perimeter_rate: float = 0.01
    max_line_fit_mse: float = 1.5  # aprilTagMaxLineFitMse spirit (px^2)
    # Marker side in px; multiples of proposal_stride so the pooled-grid box
    # sums are exact (non-multiples get quantized by the pooling).
    scales: tuple = (8, 12, 16, 20, 28, 40, 56, 80, 112, 160)
    proposal_stride: int = 4
    adaptive_const: float = 7.0  # adaptiveThreshConstant
    score_threshold: float = 0.20  # min dark-square blob score (rotated markers score low in axis-aligned boxes)
    min_white_black_diff: float = 30.0  # contrast gate (apriltagMinWhiteBlackDiff spirit)
    window: int = 64  # resampled candidate window size
    edge_points: int = 24  # samples per edge for line fitting
    error_correction_rate: float = 2.0
    max_border_errors: float = 0.35  # maxErroneousBitsInBorderRate semantics
    # Scale-proportional score-map decimation (see _decimation).  True
    # trades a few small resample ops for quadratically less box-sum +
    # dilation traffic — a win on paper (XLA cost analysis: ~1 GB/frame
    # less), but MEASURED SLOWER on the v5e (proposals 4.72 vs 3.35
    # ms/frame, detect 7.09 vs 5.97 — round 3 session 4): the cross-level
    # resamples and small-grid passes relayout more than the saved traffic.
    # Default False; kept as the A/B lever.
    decimate: bool = False
    # Fused Pallas proposals (pallas_proposals.py): the whole multi-scale
    # scoring stage on VMEM-resident windows instead of ~30 HBM score-map
    # passes.  Same semantics as the XLA path with decimate=False (tested
    # equal); use on TPU.  ``pallas_interpret`` runs the kernel in
    # interpreter mode (CPU tests only — slow).
    pallas_proposals: bool = False
    pallas_interpret: bool = False
    # VMEM-resident component labeling (pallas_labeling.py): the identical
    # fixed sweep schedule as _largest_component but with every scan a
    # masked doubling over pltpu.roll — the XLA cummin sweeps cost ~log(n)
    # HBM passes each (0.62 ms/frame at 4K, round 4).  None = follow
    # pallas_proposals.
    pallas_labeling: bool | None = None

    @property
    def use_pallas_labeling(self) -> bool:
        return self.pallas_proposals if self.pallas_labeling is None else self.pallas_labeling


# ---------------------------------------------------------------------------
# Stage 1: proposals
# ---------------------------------------------------------------------------


def _integral(img: Array) -> Array:
    """Zero-padded 2D integral image: ii[y, x] = sum img[:y, :x]."""
    ii = jnp.cumsum(jnp.cumsum(img, axis=0), axis=1)
    return jnp.pad(ii, ((1, 0), (1, 0)))


def _box_sum_unit(ii: Array, ny: int, nx: int, size_y: int, size_x: int) -> Array:
    """Box sums at ALL unit-stride origins of a (small) integral image.

    Pure unit-stride static slices — strided slicing and fancy indexing both
    lower to gather-like TPU ops that are orders of magnitude slower."""
    return (
        ii[size_y : size_y + ny, size_x : size_x + nx]
        - ii[size_y : size_y + ny, 0:nx]
        - ii[0:ny, size_x : size_x + nx]
        + ii[0:ny, 0:nx]
    )


def _decimation(s: int, st: int, enable: bool = True) -> int:
    """Largest power-of-2 grid decimation keeping origin stride <= s/8 px.

    Score-map resolution is made proportional to the scale: a marker of side
    s needs its candidate centre located only to ~s/4 (the quad-extraction
    window spans 2.4*s), so evaluating large scales at unit stride on the
    pooled grid wastes both box-sum and dilation traffic quadratically.
    The stride bound is s/8, not s/4: box-origin misalignment of half a
    grid cell bleeds white margin into the inner box and dark marker corners
    into the ring, degrading the score by up to ~2x the slack fraction —
    at s/8 the slack is s/16 (~6%), harmless; at s/4 it suppressed genuine
    47 px markers at high yaw (the round-2 veh2 flap regime) below their
    own sub-pattern responses.
    """
    if not enable:
        return 1
    q = 1
    while q * 2 * 8 * st <= s:
        q *= 2
    return q


def _kept_scales(h: int, w: int, p: DetectorParams) -> tuple:
    """The static per-frame-size scale ladder (shared by _proposals and the
    candidate-stage patch grouping, so slot -> scale stays consistent).

    cv2's perimeter floor (min side = rate*max(W,H)/4): scales whose
    markers could never pass it are skipped (a marker at the floor still
    best-responds one scale down, so keep scales within 1.5x below it);
    scales whose surround ring exceeds the frame are skipped too.
    """
    min_side = p.min_marker_perimeter_rate * max(h, w) / 4.0
    scales = tuple(int(s) for s in p.scales if s >= min_side / 1.5) or (
        int(p.scales[-1]),
    )
    scales = tuple(s for s in scales if int(round(s * 1.8)) < min(h, w))

    def level_shape(q: int) -> tuple:
        sh = (h // p.proposal_stride, w // p.proposal_stride)
        lq = 1
        while lq < q:
            sh = (-(-sh[0] // 2), -(-sh[1] // 2))
            lq *= 2
        return sh

    kept = []
    for s in scales:
        lq = _decimation(s, p.proposal_stride, p.decimate)
        unit = p.proposal_stride * lq
        ring = int(round(s * 1.8))
        sc_in = max(s // unit, 1)
        sc_mid = max(int(round(s * 1.41421356 / unit)), sc_in + 1)
        sc_ring = max(int(round(ring / unit)), sc_mid + 1)
        if sc_ring < min(level_shape(lq)):
            kept.append(s)
    return tuple(kept)


def _pool_gray(gray: Array, st: int) -> Array:
    """Mean-pool gray by the proposal stride -> (h//st, w//st) f32.

    reduce_window, not reshape-mean: the (w -> (w4, st)) lane split
    relayouts the whole frame (~2 ms at 4K, measured round 3 session 4).
    """
    h, w = gray.shape
    h4, w4 = h // st, w // st
    g = gray.astype(jnp.float32)
    return jax.lax.reduce_window(
        g[: h4 * st, : w4 * st], 0.0, jax.lax.add, (st, st), (st, st), "VALID"
    ) / float(st * st)


def _proposals(gray: Array, p: DetectorParams):
    """Top-K dark-square candidates from a full-resolution gray frame."""
    return _proposals_from_pool(
        _pool_gray(gray, p.proposal_stride), gray.shape[0], gray.shape[1], p
    )


def _proposals_from_pool(pool: Array, h: int, w: int, p: DetectorParams):
    """Top-K dark-square candidates: centers (K,2) yx, sizes (K,), scores (K,).

    ``pool`` is the stride-pooled gray (h//st, w//st) f32 (un-centred); in
    the two-pass preproc it comes straight from the pooled-source remap
    kernel instead of pooling a full-resolution gray.

    TPU layout: the pooled image feeds a power-of-2 mean pyramid; each scale
    s is scored on the pyramid level whose origin stride is <= s/8 px (exact
    inner-box extents — the scale ladder is made of multiples of the level
    strides), so all box sums are unit-stride static slices on grids that
    SHRINK with the scale, and the decimated scales' dilation radii
    collapse to a few coarse cells.  Cross-scale non-max suppression
    resamples adjacent scales' dilated maps between neighbouring pyramid
    levels (ratio <= 2).
    """
    st = p.proposal_stride
    # Mean-centre before the integral image: a raw f32 cumsum over the
    # pooled 4K grid reaches ~1.3e8, so corner-difference box sums near the
    # frame's bottom-right carry +-16 absolute cancellation error (+-4 gray
    # levels on a 2x2 inner box, ~0.016 score wobble vs the 0.2 threshold).
    # Centred values wander ~sqrt(N)*std instead, ~100x less error, and the
    # shift cancels EXACTLY in the outer-inner contrast (both means shift by
    # the same constant).
    pool = pool - jnp.mean(pool)

    scales = _kept_scales(h, w, p)

    # Mean pyramid over the pooled image (edge-padded to even sizes so every
    # level fully covers the frame).
    max_q = max(_decimation(s, st, p.decimate) for s in scales)
    pools = {1: pool}
    q = 1
    while q < max_q:
        prev = pools[q]
        ph, pw = prev.shape
        ph2, pw2 = -(-ph // 2) * 2, -(-pw // 2) * 2
        pp = jnp.pad(prev, ((0, ph2 - ph), (0, pw2 - pw)), mode="edge")
        pools[q * 2] = pp.reshape(ph2 // 2, 2, pw2 // 2, 2).mean(axis=(1, 3))
        q *= 2
    integrals = {lq: _integral(im) for lq, im in pools.items()}

    # Dark-fraction maps need a binary image; approximate the adaptive
    # threshold by comparing *box means* directly: for a marker of side s
    # centred in the box, inner mean is much darker than the surrounding
    # ring mean.  This is contrast-normalized below.
    per_scale = []  # dicts: score, dil, q, size, off_px
    sqrt2 = 1.41421356
    for s in scales:
        ring = int(round(s * 1.8))
        lq = _decimation(s, st, p.decimate)
        unit = st * lq  # px per grid cell at this level
        pimg = pools[lq]
        ii = integrals[lq]
        nyq, nxq = pimg.shape
        # ROTATION-ROBUST boxes: inner box of side s (captures the marker's
        # black border at any yaw — the inscribed square would miss it for
        # white-heavy codes); the outer ring starts at the CIRCUMSCRIBED
        # square (s*sqrt2), outside the marker at ANY yaw.  (Starting the
        # ring at s leaked the rotated marker's dark corners into the
        # "bright surround", shifting the best-scoring scale to a
        # sub-pattern size and breaking quad extraction downstream.)
        sc_in = max(s // unit, 1)
        sc_mid = max(int(round(s * sqrt2 / unit)), sc_in + 1)
        sc_ring = max(int(round(ring / unit)), sc_mid + 1)
        n_y_i, n_x_i = nyq - sc_in + 1, nxq - sc_in + 1
        n_y_m, n_x_m = nyq - sc_mid + 1, nxq - sc_mid + 1
        n_y_r, n_x_r = nyq - sc_ring + 1, nxq - sc_ring + 1
        inner_m = _box_sum_unit(ii, n_y_i, n_x_i, sc_in, sc_in) / float(sc_in * sc_in)
        mid_sum = _box_sum_unit(ii, n_y_m, n_x_m, sc_mid, sc_mid)
        ring_sum = _box_sum_unit(ii, n_y_r, n_x_r, sc_ring, sc_ring)
        # Centre-align all three boxes on the ring-box grid.
        off_in = (sc_ring - sc_in) // 2
        off_mid = (sc_ring - sc_mid) // 2
        n_y = min(n_y_r, n_y_i - 2 * off_in if off_in else n_y_i, n_y_m - 2 * off_mid if off_mid else n_y_m)
        n_x = min(n_x_r, n_x_i - 2 * off_in if off_in else n_x_i, n_x_m - 2 * off_mid if off_mid else n_x_m)
        inner_c = inner_m[off_in : off_in + n_y, off_in : off_in + n_x]
        mid_c = mid_sum[off_mid : off_mid + n_y, off_mid : off_mid + n_x]
        ring_c = ring_sum[:n_y, :n_x]
        ring_area = float(sc_ring * sc_ring)
        mid_area = float(sc_mid * sc_mid)
        outer_mean = (ring_c - mid_c) / (ring_area - mid_area)
        contrast = jnp.maximum(outer_mean - inner_c, 0.0)
        # Score: dark inner vs bright surround, contrast-gated.
        sc = jnp.where(contrast >= p.min_white_black_diff, contrast / 255.0, 0.0)
        # Pad to this level's fixed grid.
        sc_full = jnp.zeros((nyq, nxq), jnp.float32)
        sc_full = jax.lax.dynamic_update_slice(sc_full, sc, (0, 0))
        per_scale.append(
            dict(
                score=sc_full,
                q=lq,
                size=float(s),
                off=off_in * unit + sc_in * unit / 2.0,
                unit=unit,
            )
        )

    # Scale-proportional non-max suppression: dilate each scale's score map
    # by ~half its marker size, then keep positions that win against every
    # scale's dilated map — one candidate per marker, at its best-responding
    # scale (sub-pattern responses at smaller scales are suppressed by the
    # larger winner instead of flooding the top-K).
    def shift_max(a, d, axis):
        pad = [(0, 0), (0, 0)]
        pad[axis] = (d, d)
        a_p = jnp.pad(a, pad, constant_values=-jnp.inf)
        n = a.shape[axis]
        sl = lambda o: tuple(
            slice(d + o, d + o + n) if ax == axis else slice(None) for ax in range(2)
        )
        return jnp.maximum(jnp.maximum(a_p[sl(-d)], a_p[sl(0)]), a_p[sl(d)])

    def dilate_sq(a, r):
        """Separable square max-dilation, radius exactly r, O(log r) passes.

        After reaching cumulative radius c, a +-d shift-max with d <= c + 1
        extends coverage contiguously to c + d — so doubling offsets give the
        same result as r radius-1 passes at a fraction of the memory traffic.
        """
        done = 0
        while done < r:
            d = min(done + 1, r - done)
            a = shift_max(shift_max(a, d, 0), d, 1)
            done += d
        return a

    for e in per_scale:
        # ceil(s / (2 * unit)): coverage >= s/2 px at every level.
        r_d = max(-(-int(e["size"]) // (2 * e["unit"])), 1)
        e["dil"] = dilate_sq(e["score"], r_d)

    def to_level(src, src_q, dst_q, dst_shape):
        """Resample a dilated map between adjacent pyramid levels.

        Finer -> coarser: max-pool (the coarse cell's test sees the max over
        its block — those positions are within the dilation radius anyway).
        Coarser -> finer: nearest upsample (bounded over-suppression, < one
        coarse cell — far below the physical inter-marker distance)."""
        if src_q < dst_q:
            r = dst_q // src_q
            sh, sw = src.shape
            ph, pw = -(-sh // r) * r, -(-sw // r) * r
            mp = jnp.pad(src, ((0, ph - sh), (0, pw - sw)), constant_values=-jnp.inf)
            m = mp.reshape(ph // r, r, pw // r, r).max(axis=(1, 3))
        elif src_q > dst_q:
            r = src_q // dst_q
            m = jnp.repeat(jnp.repeat(src, r, axis=0), r, axis=1)
        else:
            m = src
        dh, dw = dst_shape
        m = m[:dh, :dw]
        if m.shape != (dh, dw):
            m = jnp.pad(
                m,
                ((0, dh - m.shape[0]), (0, dw - m.shape[1])),
                constant_values=-jnp.inf,
            )
        return m

    # Adjacent-scale suppression only: a genuine marker responding best at a
    # far-away scale (sub-pattern vs whole marker) keeps both candidates and
    # the post-decode dedup picks the real quad.
    ns = len(per_scale)
    for si, e in enumerate(per_scale):
        shape = e["score"].shape
        cross = e["dil"]
        for sj in (si - 1, si + 1):
            if 0 <= sj < ns:
                n = per_scale[sj]
                cross = jnp.maximum(cross, to_level(n["dil"], n["q"], e["q"], shape))
        is_max = (e["score"] >= cross) & (e["score"] > p.score_threshold)
        e["masked"] = jnp.where(is_max, e["score"], 0.0).reshape(-1)

    # Top-k per scale, batched per pyramid LEVEL: the scale ladder is
    # monotone in q, so same-level scales are contiguous and can stack into
    # one (S_l, n) hierarchical top-k (group-max -> top-k groups -> top-k
    # within; exact: any group holding a true top-k element has
    # group-max >= it, and k higher-ranked groups would each contribute a
    # larger element).  Small decimated levels sort flat.
    k = p.per_scale_k
    gsz = 2048
    all_cy, all_cx, all_vals, all_sizes = [], [], [], []
    si = 0
    while si < ns:
        sj = si
        while sj < ns and per_scale[sj]["q"] == per_scale[si]["q"]:
            sj += 1
        group = per_scale[si:sj]
        flat_s = jnp.stack([e["masked"] for e in group])  # (S_l, n)
        n_flat = flat_s.shape[1]
        if n_flat >= 8 * gsz:
            padn = (-n_flat) % gsz
            groups = jnp.pad(flat_s, ((0, 0), (0, padn)), constant_values=-1.0).reshape(
                len(group), -1, gsz
            )
            _, gidx = jax.lax.top_k(jnp.max(groups, axis=2), k)  # (S_l, k)
            sub = jnp.take_along_axis(groups, gidx[:, :, None], axis=1)  # (S_l, k, gsz)
            vals, sidx = jax.lax.top_k(sub.reshape(len(group), -1), k)
            idx = jnp.take_along_axis(gidx, sidx // gsz, axis=1) * gsz + sidx % gsz
        else:
            vals, idx = jax.lax.top_k(flat_s, k)  # (S_l, k)
        nxq = group[0]["score"].shape[1]
        unit = group[0]["unit"]
        iy = (idx // nxq).astype(jnp.float32)
        ix = (idx % nxq).astype(jnp.float32)
        offs = jnp.asarray([e["off"] for e in group], jnp.float32)[:, None]
        # Candidate centre in image coords: grid origin + centred-box offset.
        all_cy.append((iy * unit + offs).reshape(-1))
        all_cx.append((ix * unit + offs).reshape(-1))
        all_vals.append(vals.reshape(-1))
        all_sizes.append(
            jnp.repeat(jnp.asarray([e["size"] for e in group], jnp.float32), k)
        )
        si = sj
    cy = jnp.concatenate(all_cy)
    cx = jnp.concatenate(all_cx)
    vals = jnp.concatenate(all_vals)
    sizes = jnp.concatenate(all_sizes)
    valid = vals > p.score_threshold
    return jnp.stack([cy, cx], axis=-1), sizes, vals, valid


# ---------------------------------------------------------------------------
# Stage 2: quad extraction
# ---------------------------------------------------------------------------


def _bilinear(gray: Array, yx: Array) -> Array:
    """Gather-based bilinear sampling (host-friendly; avoid on the 4K image
    inside hot paths — see :func:`_sample_img` for the TPU-native form)."""
    h, w = gray.shape
    y = jnp.clip(yx[..., 0], 0.0, h - 1.001)
    x = jnp.clip(yx[..., 1], 0.0, w - 1.001)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = y - y0
    wx = x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    flat = gray.reshape(-1)
    i00 = y0i * w + x0i
    p00 = jnp.take(flat, i00)
    p01 = jnp.take(flat, i00 + 1)
    p10 = jnp.take(flat, i00 + w)
    p11 = jnp.take(flat, i00 + w + 1)
    return (p00 * (1 - wx) + p01 * wx) * (1 - wy) + (p10 * (1 - wx) + p11 * wx) * wy


def _patch_size(h: int, w: int) -> int:
    """Per-candidate patch side: 384 covers 2.4x the largest marker scale."""
    return min(384, (min(h, w) // 128) * 128) or min(h, w)


def _patch_groups(h: int, w: int, p: DetectorParams) -> list:
    """Contiguous per-scale slot groups sharing one patch size.

    Returns [(start_slot, stop_slot, psize)] in slot-ladder order.  The
    candidate stage sizes its sampling matmuls and patch DMA O(psize^2), so
    small-scale candidates get small patches; the two-pass preproc's tile
    selection uses the same groups so selected tiles exactly cover each
    candidate's patch.
    """
    cap = _patch_size(h, w)
    scales = _kept_scales(h, w, p)
    k = p.per_scale_k
    groups = []
    for si, s in enumerate(scales):
        ps = cap
        for cand_ps in (128, 256):
            if cand_ps >= 2.4 * s and cand_ps <= cap:
                ps = cand_ps
                break
        if groups and groups[-1][2] == ps:
            groups[-1] = (groups[-1][0], (si + 1) * k, ps)
        else:
            groups.append((si * k, (si + 1) * k, ps))
    return groups


def _extract_patch(gray: Array, center_yx: Array, psize: int):
    """Fixed-size patch around a candidate via ONE dynamic_slice.

    All subsequent sampling (window resample, edge refinement, bit decode)
    happens inside this VMEM-sized patch with interpolation matmuls —
    per-pixel gathers from the HBM-resident 4K frame are the single most
    expensive operation on TPU and are avoided entirely.
    Returns (patch (psize, psize) f32, origin (2,) f32).
    """
    h, w = gray.shape
    oy = jnp.clip(jnp.round(center_yx[0]) - psize // 2, 0, h - psize).astype(jnp.int32)
    ox = jnp.clip(jnp.round(center_yx[1]) - psize // 2, 0, w - psize).astype(jnp.int32)
    patch = jax.lax.dynamic_slice(gray, (oy, ox), (psize, psize))
    return patch, jnp.stack([oy, ox]).astype(jnp.float32)


def _sample_img(img: Array, yx: Array) -> Array:
    """Bilinear sampling as two interpolation matmuls (gather-free).

    img (H, W); yx (..., 2) coords in img space.  Each point's row/column
    interpolation weights are dense hat functions (two nonzeros), so the
    sample is  sum_c (W_y @ img)[p, c] * W_x[p, c]  — MXU work instead of
    scattered memory access.
    """
    h, w = img.shape
    shape = yx.shape[:-1]
    pts = yx.reshape(-1, 2)
    y = jnp.clip(pts[:, 0], 0.0, h - 1.001)
    x = jnp.clip(pts[:, 1], 0.0, w - 1.001)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - jnp.arange(h, dtype=jnp.float32)[None, :]))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - jnp.arange(w, dtype=jnp.float32)[None, :]))
    rows = jax.lax.dot_general(
        wy, img, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (P, W)
    vals = jnp.sum(rows * wx, axis=-1)
    return vals.reshape(shape)


def _extract_window(patch: Array, center_rel: Array, size: Array, win: int):
    """Resample a win x win window covering 2.4*size around the centre.

    Separable: window = W_y @ patch @ W_x^T with per-axis hat-function
    interpolation matrices — regular-grid resampling as two matmuls.
    center_rel is in patch coords.  Returns (window (win, win) f32, scale
    px-per-window-px, origin yx in patch coords).
    """
    psize = patch.shape[0]
    span = jnp.minimum(2.4 * size, float(psize))
    scale = span / win
    r = jnp.arange(win, dtype=jnp.float32)
    oy = center_rel[0] - span / 2.0
    ox = center_rel[1] - span / 2.0
    ys = jnp.clip(oy + (r + 0.5) * scale, 0.0, psize - 1.001)
    xs = jnp.clip(ox + (r + 0.5) * scale, 0.0, psize - 1.001)
    grid = jnp.arange(psize, dtype=jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys[:, None] - grid[None, :]))  # (win, P)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs[:, None] - grid[None, :]))
    win_img = jax.lax.dot_general(
        jax.lax.dot_general(wy, patch, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32),
        wx,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return win_img, scale, jnp.stack([oy, ox])


def _binarize(winimg: Array):
    """2-means (Ridler-Calvard) threshold; returns (dark mask, lo, hi)."""
    t = (jnp.min(winimg) + jnp.max(winimg)) / 2.0

    def body(_, t):
        lo_m = jnp.sum(jnp.where(winimg < t, winimg, 0.0)) / jnp.maximum(jnp.sum(winimg < t), 1)
        hi_m = jnp.sum(jnp.where(winimg >= t, winimg, 0.0)) / jnp.maximum(jnp.sum(winimg >= t), 1)
        return (lo_m + hi_m) / 2.0

    t = jax.lax.fori_loop(0, 4, body, t)
    lo = jnp.sum(jnp.where(winimg < t, winimg, 0.0)) / jnp.maximum(jnp.sum(winimg < t), 1)
    hi = jnp.sum(jnp.where(winimg >= t, winimg, 0.0)) / jnp.maximum(jnp.sum(winimg >= t), 1)
    return winimg < t, lo, hi


def _largest_component(dark: Array, win: int, rounds: int = 3, mop: int = 8) -> Array:
    """Largest 4-connected component of the dark mask.

    Isolates the marker blob from nearby dark clutter (LED panels, asphalt
    at the window edge) before corner extraction.  The marker is separated
    from such clutter by the white roof margin, so components are distinct.

    Min-labels propagate by SEGMENTED row/column min-scans (segments reset
    at non-dark cells): one scan carries a label across an entire dark run.
    Each directed scan is a single-i32 ``lax.cummin`` over keys
    ``(R - runid)*K + label`` — within a dark run the runid is constant and
    strictly beyond every run nearer the scan origin, so the prefix cummin
    IS the segmented prefix min (runid counted from the scan origin, one
    cumsum per direction, hoisted out of the round loop).  A FIXED
    ``rounds`` of row+col sweeps plus ``mop`` fused radius-1 steps replaces
    the previous while_loop-to-fixpoint: marker-class shapes (quad ring +
    attached bit cells, broken C-rings) converge in <= 3 sweep rounds, and
    a data-dependent while_loop gated on the slowest of B*K vmapped lanes
    ran to its round cap on percolating noise masks — 54 ms/frame on TPU
    vs ~1 ms for this fixed schedule (PERF_NOTES round 3).  Non-converged
    clutter only ever SPLITS (labels refine toward scipy's components and
    never merge separate ones), which shrinks clutter counts and cannot
    displace an exactly-labeled marker blob.
    """
    n = win * win
    idx = jnp.arange(n, dtype=jnp.int32).reshape(win, win)
    sentinel = jnp.int32(n)
    labels = jnp.where(dark, idx, sentinel)
    kk = jnp.int32(n + 1)
    rr = jnp.int32(win + 1)
    bi = (~dark).astype(jnp.int32)
    terms = []  # per axis: (fwd run term, bwd run term)
    for axis in (1, 0):
        rf = jnp.cumsum(bi, axis=axis)
        rb = jnp.flip(jnp.cumsum(jnp.flip(bi, axis), axis=axis), axis)
        terms.append(((rr - rf) * kk, (rr - rb) * kk))

    def sweep(lab, axis, tf, tb):
        lf = jax.lax.cummin(tf + lab, axis=axis) - tf
        lb = jax.lax.cummin(tb + lab, axis=axis, reverse=True) - tb
        return jnp.where(dark, jnp.minimum(lab, jnp.minimum(lf, lb)), sentinel)

    for _ in range(rounds):
        labels = sweep(labels, 1, *terms[0])
        labels = sweep(labels, 0, *terms[1])

    def r1_step(_, lab):
        p = jnp.pad(lab, 1, constant_values=sentinel)
        neigh = jnp.minimum(
            jnp.minimum(p[:-2, 1:-1], p[2:, 1:-1]),
            jnp.minimum(p[1:-1, :-2], p[1:-1, 2:]),
        )
        return jnp.where(dark, jnp.minimum(lab, neigh), sentinel)

    if mop:
        labels = jax.lax.fori_loop(0, mop, r1_step, labels)
    return _largest_from_labels(labels, win)


def _largest_from_labels(labels: Array, win: int) -> Array:
    """Mask of the most populous label (the histogram tail).

    Component sizes as an MXU matmul, not a scatter: a root index
    r in [0, n) factors as (r // win, r % win), so the full n-bin
    histogram is onehotY^T @ onehotX — counts[ry, rx] =
    sum_c [lab_c//win==ry][lab_c%win==rx].  TPU scatter (segment_sum
    over n+1 bins) serialized at ~2.4 ms/frame here; the factored
    matmul is two (n, win) bf16 one-hots + one (win, n)@(n, win)
    f32-accumulated product (exact: 0/1 inputs, counts <= n < 2^24).
    Sentinel cells (lab == n) match no one-hot column and drop out;
    row-major argmax over (win, win) picks the smallest root on ties,
    matching segment_sum + argmax semantics.
    """
    flat = labels.reshape(-1)
    bins = jnp.arange(win, dtype=jnp.int32)
    oh_y = (flat[:, None] // win == bins[None, :]).astype(jnp.bfloat16)
    oh_x = (flat[:, None] % win == bins[None, :]).astype(jnp.bfloat16)
    counts = jax.lax.dot_general(
        oh_y, oh_x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (win, win): counts[ry, rx]
    biggest = jnp.argmax(counts.reshape(-1)).astype(jnp.int32)
    return labels == biggest


def _coarse_corners(dark: Array, win_img: Array, win: int):
    """Quad corners of the dark blob via support-line fitting.

    1. Quad orientation from the gradient-angle distribution (quadruple-angle
       circular mean — a square's four edge normals coincide mod 90 deg).
    2. For each of the four oriented directions, the outer edge line is the
       support plane of the blob: robustly, the mean projection over the
       1.5-px strip at the support maximum.
    3. Corners = intersections of adjacent support lines.

    Uses every border pixel, so eroded corner tips and interior cell
    patterns don't bias the estimate (unlike radial-extreme methods).
    Returns (4, 2) yx window coords and a quality flag.
    """
    r = jnp.arange(win, dtype=jnp.float32)
    yy = jnp.broadcast_to(r[:, None], (win, win))
    xx = jnp.broadcast_to(r[None, :], (win, win))

    # Gradient orientation, weighted by squared magnitude, near the blob only.
    gy = jnp.zeros_like(win_img).at[1:-1, :].set((win_img[2:, :] - win_img[:-2, :]) * 0.5)
    gx = jnp.zeros_like(win_img).at[:, 1:-1].set((win_img[:, 2:] - win_img[:, :-2]) * 0.5)
    near = dark
    for _ in range(2):  # dilate by 1 twice: gradients live on the blob rim
        p = jnp.pad(near, 1)
        near = p[1:-1, 1:-1] | p[:-2, 1:-1] | p[2:, 1:-1] | p[1:-1, :-2] | p[1:-1, 2:]
    wgt = jnp.where(near, gx * gx + gy * gy, 0.0)
    phi = jnp.arctan2(gy, gx)
    zr = jnp.sum(wgt * jnp.cos(4.0 * phi))
    zi = jnp.sum(wgt * jnp.sin(4.0 * phi))
    theta = jnp.arctan2(zi, zr) / 4.0  # edge-normal direction mod 90 deg

    def support_line(k):
        a = theta + k * (jnp.pi / 2.0)
        ny_, nx_ = jnp.sin(a), jnp.cos(a)
        proj = jnp.where(dark, ny_ * yy + nx_ * xx, -jnp.inf)
        pmax = jnp.max(proj)
        strip = dark & (proj > pmax - 1.5)
        wsum = jnp.maximum(jnp.sum(strip), 1)
        c = jnp.sum(jnp.where(strip, proj, 0.0)) / wsum
        return jnp.stack([ny_, nx_, c]), pmax

    lines, pmaxs = jax.vmap(support_line)(jnp.arange(4, dtype=jnp.float32))

    def corner(i):
        l1, l2 = lines[i], lines[(i + 1) % 4]
        det = l1[0] * l2[1] - l2[0] * l1[1]
        det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
        y = (l1[2] * l2[1] - l2[2] * l1[1]) / det
        x = (l1[0] * l2[2] - l2[0] * l1[2]) / det
        return jnp.stack([y, x])

    corners = jax.vmap(corner)(jnp.arange(4))
    # Quality: blob must actually be extended in all four directions.
    extent = pmaxs[0] + pmaxs[2]  # width along theta + along theta+180
    ok = jnp.isfinite(extent) & (jnp.sum(dark) > 30) & jnp.all(jnp.isfinite(corners))
    return corners, ok


def _order_clockwise(corners_yx: Array) -> Array:
    """Order 4 corners clockwise in image coords (y down) by angle."""
    c = jnp.mean(corners_yx, axis=0)
    ang = jnp.arctan2(corners_yx[:, 0] - c[0], corners_yx[:, 1] - c[1])
    order = jnp.argsort(ang)  # increasing angle = clockwise when y is down
    return corners_yx[order]


def _refine_edges(
    gray: Array,
    corners_img: Array,
    n_pts: int,
    spacing: Array,
    step_scale: float = 1.0,
    n_taps: int = 7,
):
    """Subpixel edge-line fit by gradient-weighted crossings + TLS.

    For each edge, sample perpendicular gradient profiles at n_pts points,
    find the gradient-weighted crossing, and total-least-squares fit a line.
    Corners = intersections of adjacent lines.  corners_img: (4, 2) yx,
    clockwise.  spacing: approx px per sample step (scalar).  The
    perpendicular reach (n_taps * step) must stay below the marker border
    width or the profile sees both border edges.
    """
    half_t = n_taps // 2
    taps = jnp.arange(-half_t, half_t + 1, dtype=jnp.float32)

    def edge_line(a, b):
        t = (jnp.arange(n_pts, dtype=jnp.float32) + 0.5) / n_pts
        # Trim ends so corner regions don't pollute the fit.
        t = 0.12 + t * 0.76
        pts = a[None, :] * (1 - t[:, None]) + b[None, :] * t[:, None]  # (P, 2)
        d = b - a
        norm = jnp.maximum(jnp.linalg.norm(d), 1e-6)
        nvec = jnp.stack([-d[1], d[0]]) / norm  # perpendicular (yx)
        step = jnp.maximum(spacing * 0.6, 0.35) * step_scale
        samp = pts[:, None, :] + nvec[None, None, :] * (taps[None, :, None] * step)
        vals = _sample_img(gray, samp)  # (P, n_taps)
        grad = vals[:, 1:] - vals[:, :-1]  # (P, 6) directional derivative
        gmag = jnp.abs(grad)
        pos = (taps[:-1] + 0.5)  # tap midpoints
        # Points whose gradient peak sits at the profile extremes have the
        # edge out of reach — exclude them from the fit entirely.
        peak = jnp.argmax(gmag, axis=1)
        reliable = (peak > 0) & (peak < gmag.shape[1] - 1)
        wsum = jnp.maximum(jnp.sum(gmag, axis=1), 1e-6)
        # Localize the crossing around the gradient PEAK, not the whole
        # profile: at small markers (border ~5 px < tap reach) the interior
        # bit cells put gradient mass on the inner side, and a full-profile
        # centroid drags the line ~0.1 px inward — a 0.5% marker-size bias
        # that propagates to altitude (tz ∝ f·L/size) and every
        # meters-per-pixel distance column.  Parabolic interpolation of the
        # magnitude peak over its ±1 neighbours is immune to that mass.
        nseg = gmag.shape[1]
        pc = jnp.clip(peak, 1, nseg - 2)
        idx = jnp.arange(nseg)[None, :]
        g_m1 = jnp.sum(jnp.where(idx == (pc - 1)[:, None], gmag, 0.0), axis=1)
        g_0 = jnp.sum(jnp.where(idx == pc[:, None], gmag, 0.0), axis=1)
        g_p1 = jnp.sum(jnp.where(idx == (pc + 1)[:, None], gmag, 0.0), axis=1)
        denom = g_m1 - 2.0 * g_0 + g_p1
        delta = jnp.where(jnp.abs(denom) > 1e-6,
                          0.5 * (g_m1 - g_p1) / jnp.where(jnp.abs(denom) > 1e-6, denom, 1.0),
                          0.0)
        delta = jnp.clip(delta, -0.75, 0.75)
        off = (pos[0] + pc.astype(jnp.float32) + delta) * step  # (P,)
        edge_pts = pts + nvec[None, :] * off[:, None]
        wts = jnp.where(reliable, wsum, 0.0)
        wts = jnp.where(jnp.sum(wts) > 1e-6, wts, wsum)  # fallback: keep all
        # TLS line fit: normal = eigvec of smallest eigenvalue of covariance.
        wsumt = jnp.sum(wts)
        mean = jnp.sum(edge_pts * wts[:, None], axis=0) / wsumt
        d0 = edge_pts - mean
        sxx = jnp.sum(wts * d0[:, 1] * d0[:, 1])
        syy = jnp.sum(wts * d0[:, 0] * d0[:, 0])
        sxy = jnp.sum(wts * d0[:, 1] * d0[:, 0])
        # Normal direction (a, b) with a*y + b*x + c = 0: smallest-eigvec of
        # [[syy, sxy], [sxy, sxx]].
        tr = syy + sxx
        det = syy * sxx - sxy * sxy
        lam = tr / 2.0 - jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
        # (syy - lam) a + sxy b = 0
        a_n = jnp.where(jnp.abs(sxy) > 1e-9, sxy, 0.0)
        b_n = jnp.where(jnp.abs(sxy) > 1e-9, lam - syy, 1.0)
        a_n, b_n = jnp.where(jnp.abs(sxy) > 1e-9, a_n, jnp.where(syy <= sxx, 1.0, 0.0)), jnp.where(
            jnp.abs(sxy) > 1e-9, b_n, jnp.where(syy <= sxx, 0.0, 1.0)
        )
        nrm = jnp.maximum(jnp.sqrt(a_n * a_n + b_n * b_n), 1e-9)
        a_n, b_n = a_n / nrm, b_n / nrm
        c_n = -(a_n * mean[0] + b_n * mean[1])
        # Weighted mean squared residual (px^2) — the AprilTag line-fit MSE.
        resid = a_n * edge_pts[:, 0] + b_n * edge_pts[:, 1] + c_n
        mse = jnp.sum(wts * resid * resid) / jnp.maximum(wsumt, 1e-6)
        return jnp.stack([a_n, b_n, c_n]), mse

    fits = [edge_line(corners_img[i], corners_img[(i + 1) % 4]) for i in range(4)]
    lines = jnp.stack([f[0] for f in fits])
    max_mse = jnp.max(jnp.stack([f[1] for f in fits]))

    def intersect(l1, l2):
        # a1 y + b1 x + c1 = 0; a2 y + b2 x + c2 = 0
        det = l1[0] * l2[1] - l2[0] * l1[1]
        det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
        y = (-l1[2] * l2[1] + l2[2] * l1[1]) / det
        x = (-l1[0] * l2[2] + l2[0] * l1[2]) / det
        return jnp.stack([y, x])

    refined = jnp.stack([intersect(lines[(i - 1) % 4], lines[i]) for i in range(4)])
    return refined, max_mse


# ---------------------------------------------------------------------------
# Stage 3: decoding
# ---------------------------------------------------------------------------


def _homography_unit_square(corners_xy: Array) -> Array:
    """Exact homography mapping the unit square (0,0),(1,0),(1,1),(0,1) to 4
    corners (x, y) order. Returns 3x3 H."""
    x0, y0 = corners_xy[0, 0], corners_xy[0, 1]
    x1, y1 = corners_xy[1, 0], corners_xy[1, 1]
    x2, y2 = corners_xy[2, 0], corners_xy[2, 1]
    x3, y3 = corners_xy[3, 0], corners_xy[3, 1]
    dx1 = x1 - x2
    dx2 = x3 - x2
    dy1 = y1 - y2
    dy2 = y3 - y2
    sx = x0 - x1 + x2 - x3
    sy = y0 - y1 + y2 - y3
    den = dx1 * dy2 - dx2 * dy1
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    g = (sx * dy2 - sy * dx2) / den
    hh = (dx1 * sy - dy1 * sx) / den
    a = x1 - x0 + g * x1
    b = x3 - x0 + hh * x3
    c = x0
    d = y1 - y0 + g * y1
    e = y3 - y0 + hh * y3
    f = y0
    return jnp.array([[a, b, c], [d, e, f], [g, hh, 1.0]])


def _sample_cells(gray: Array, corners_yx: Array, samples_per_cell: int = 3):
    """Mean intensity of each of the 6x6 marker cells (margin 0.33)."""
    xy = jnp.stack([corners_yx[:, 1], corners_yx[:, 0]], axis=-1)
    h_mat = _homography_unit_square(xy)
    n = 6 * samples_per_cell
    # Sample positions: per cell, an inner grid avoiding 0.33 margin each side.
    margin = 0.33
    inner = (jnp.arange(samples_per_cell, dtype=jnp.float32) + 0.5) / samples_per_cell
    inner = margin + inner * (1.0 - 2 * margin)
    cell = jnp.arange(6, dtype=jnp.float32)
    u = (cell[:, None] + inner[None, :]).reshape(-1) / 6.0  # (n,)
    uu, vv = jnp.meshgrid(u, u)  # (n, n) x, y in unit square
    ones = jnp.ones_like(uu)
    p = jnp.stack([uu, vv, ones], axis=-1) @ h_mat.T
    xy_img = p[..., :2] / p[..., 2:3]
    vals = _sample_img(gray, jnp.stack([xy_img[..., 1], xy_img[..., 0]], axis=-1))
    # (6, spc, 6, spc) -> cell means
    vals = vals.reshape(6, samples_per_cell, 6, samples_per_cell)
    return vals.mean(axis=(1, 3))  # (6, 6) row-major (v=row, u=col)


def _otsu_split(vals36: Array):
    """Optimal 2-class split threshold over 36 cell means (sort-based)."""
    v = jnp.sort(vals36.reshape(-1))
    n = v.shape[0]
    csum = jnp.cumsum(v)
    total = csum[-1]
    k = jnp.arange(1, n)
    mean_lo = csum[:-1] / k
    mean_hi = (total - csum[:-1]) / (n - k)
    between = k * (n - k) * (mean_hi - mean_lo) ** 2
    i = jnp.argmax(between)
    return (v[i] + v[i + 1]) / 2.0


def _decode_candidate(gray: Array, corners_yx: Array, p: DetectorParams):
    """Decode one quad: returns (id, rotation, bits_ok)."""
    cells = _sample_cells(gray, corners_yx)
    thr = _otsu_split(cells)
    bits = (cells > thr).astype(jnp.uint32)  # 1 = white
    # Border must be (mostly) black.
    border = jnp.concatenate([bits[0, :], bits[5, :], bits[1:5, 0], bits[1:5, 5]])
    border_errs = jnp.sum(border)
    border_ok = border_errs <= jnp.floor(20 * p.max_border_errors)
    inner = bits[1:5, 1:5]
    packed = jnp.sum(inner.reshape(-1) * (2 ** jnp.arange(15, -1, -1, dtype=jnp.uint32)))
    ids, rot, dist = dict_mod.match_dictionary(packed[None], p.error_correction_rate)
    marker_id = jnp.where(border_ok, ids[0], -1)
    return marker_id, rot[0], border_ok, dist[0]


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


class ArucoDetector:
    """Fixed-shape ArUco detector. ``detect`` handles (H, W) or (B, H, W)."""

    def __init__(self, params: DetectorParams | None = None):
        self.params = params or DetectorParams()

    @functools.partial(jax.jit, static_argnums=(0,))
    def detect(self, gray: Array):
        p = self.params
        squeeze = gray.ndim == 2
        g3 = gray[None] if squeeze else gray
        if p.pallas_proposals:
            from apse_uav_tpu.aruco import pallas_proposals as pprop

            props = pprop.proposals_batched(g3, p, interpret=p.pallas_interpret)
        else:
            props = jax.vmap(
                lambda gi: _proposals(gi.astype(jnp.float32), p)
            )(g3)
        corners, ids = jax.vmap(self._candidates_one)(g3, *props)
        return (corners[0], ids[0]) if squeeze else (corners, ids)

    def _detect_one(self, gray: Array):
        p = self.params
        g = gray.astype(jnp.float32)
        centers, sizes, scores, valid = _proposals(g, p)
        return self._candidates_one(gray, centers, sizes, scores, valid)

    def _candidates_one(self, gray: Array, centers, sizes, scores, valid,
                        covered: Array | None = None):
        """covered: optional (K,) bool — two-pass preproc coverage mask.

        Candidates whose patch tiles were not recomputed at full resolution
        (tile-budget overflow) read garbage gray and MUST be invalidated
        BEFORE the overlap dedup (their garbage rank could otherwise
        suppress a genuine neighbour).
        """
        p = self.params
        g = gray.astype(jnp.float32)
        if covered is not None:
            valid = valid & covered

        def stage_binarize(center, size, psize):
            # ONE dynamic_slice per candidate; every later sampling step is
            # gather-free math inside this patch.
            patch, p_origin = _extract_patch(g, center, psize)
            center_rel = center - p_origin
            win, scale, origin = _extract_window(patch, center_rel, size, p.window)
            dark, lo, hi = _binarize(win)
            return patch, p_origin, win, scale, origin, dark, hi - lo

        def one_candidate(pre, ok):
            patch, p_origin, win, scale, origin, dark, diff = pre
            contrast_ok = diff >= p.min_white_black_diff
            coarse, quad_ok = _coarse_corners(dark, win, p.window)
            # Pass 1: refine in *window space*, where the coarse radial error
            # is a few pixels and the marker border is ~4.4 px wide: 11 taps
            # at 0.62 px reach +-3.4 px without crossing both border edges.
            coarse_w = _order_clockwise(coarse)
            rough_w, _ = _refine_edges(
                win, coarse_w, p.edge_points, jnp.float32(1.0), step_scale=1.04, n_taps=11
            )
            drift0 = jnp.max(jnp.linalg.norm(rough_w - coarse_w, axis=-1))
            rough_w = jnp.where(drift0 < 6.0, rough_w, coarse_w)
            rough = origin[None, :] + (rough_w + 0.5) * scale  # patch coords
            # Pass 2: subpixel pass at native resolution, inside the patch.
            refined, mse = _refine_edges(patch, rough, p.edge_points, scale, step_scale=0.8)
            drift = jnp.max(jnp.linalg.norm(refined - rough, axis=-1))
            good_refine = drift < 6.0
            corners = jnp.where(good_refine, refined, rough)
            mse_ok = (mse < p.max_line_fit_mse) & good_refine
            marker_id, rot, bits_ok, ham = _decode_candidate(patch, corners, p)
            corners = corners + p_origin[None, :]  # back to image coords
            # Canonicalize corner order per dictionary rotation: OpenCV
            # returns corners starting at the canonical top-left, clockwise.
            corners = jnp.roll(corners, -rot, axis=0)
            side = jnp.mean(jnp.linalg.norm(corners - jnp.roll(corners, 1, axis=0), axis=-1))
            # cv2's perimeter floor (minMarkerPerimeterRate * max(W, H)):
            # quads under it are not detections — also kills degenerate
            # near-point quads whose error-corrected decode would otherwise
            # steal an id slot.
            floor_ok = side >= p.min_marker_perimeter_rate * max(g.shape) / 4.0
            is_valid = ok & quad_ok & contrast_ok & bits_ok & mse_ok & floor_ok & (marker_id >= 0)
            return corners, jnp.where(is_valid, marker_id, -1), side, ham

        # Candidate patches sized to each slot's (static) scale: the
        # hat-function sampling matmuls in refinement/decoding cost
        # O(psize^2) and patch DMA O(psize^2), so small-scale candidates get
        # small patches.  Slots are laid out per-scale in ladder order, so
        # same-psize groups are contiguous static slices of the slot arrays.
        # The candidate windows are all (window, window) regardless of patch
        # size, so component labeling runs ONCE over the stacked windows —
        # on the VMEM-resident Pallas kernel when enabled — between the
        # per-group binarize and corner stages.
        groups = _patch_groups(*g.shape, p)
        pres = []
        for a, b, ps in groups:
            f = functools.partial(stage_binarize, psize=ps)
            pres.append(jax.vmap(f)(centers[a:b], sizes[a:b]))
        darks = jnp.concatenate([pr[5] for pr in pres])
        if p.use_pallas_labeling:
            from apse_uav_tpu.aruco import pallas_labeling

            labels = pallas_labeling.labels_batched(
                darks, interpret=p.pallas_interpret
            )
            masks = jax.vmap(lambda lab: _largest_from_labels(lab, p.window))(labels)
        else:
            masks = jax.vmap(lambda d: _largest_component(d, p.window))(darks)
        outs = []
        for (a, b, ps), pr in zip(groups, pres):
            pre_masked = (pr[0], pr[1], pr[2], pr[3], pr[4], masks[a:b], pr[6])
            outs.append(jax.vmap(one_candidate)(pre_masked, valid[a:b]))
        corners = jnp.concatenate([o[0] for o in outs])
        ids = jnp.concatenate([o[1] for o in outs])
        sides = jnp.concatenate([o[2] for o in outs])
        hams = jnp.concatenate([o[3] for o in outs])

        # Dedup overlapping candidates.  Sub-patterns inside a marker can
        # decode (with corrections) at small scales, so prefer the larger
        # quad, then the cleaner dictionary match, then the proposal score.
        k = int(corners.shape[0])
        cen = jnp.mean(corners, axis=1)  # (K, 2)
        d2 = jnp.sum((cen[:, None, :] - cen[None, :, :]) ** 2, axis=-1)
        radius2 = (jnp.maximum(sides[:, None], sides[None, :]) * 0.55) ** 2
        overlap = d2 < radius2
        rank = (
            -hams.astype(jnp.float32) * 1e6
            + sides * 1e2
            + scores
            - jnp.arange(k, dtype=jnp.float32) * 1e-3  # deterministic tie-break
        )
        rank = jnp.where(ids >= 0, rank, -jnp.inf)
        better = rank[None, :] > rank[:, None]
        suppressed = jnp.any(overlap & better & (ids[None, :] >= 0), axis=1)
        ids = jnp.where(suppressed, -1, ids)

        # Convert to x, y corner order (OpenCV convention).
        corners_xy = jnp.stack([corners[..., 1], corners[..., 0]], axis=-1)
        return corners_xy, ids
