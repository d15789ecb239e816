"""Fused undistort + gamma + grayscale as a single Pallas TPU kernel.

This is the framework's north-star kernel (BASELINE.md: >=500 4K frames/s/chip
for fused preproc).  It replaces the reference's per-frame OpenCV CPU chain
(aruco_detect.py:250-259,568,592) with one pass over batched planar frames.

Design (TPU-first, not a remap translation)
-------------------------------------------
cv2.remap is a random-gather — hostile to the TPU's vector memory.  But the
undistortion map is a *smooth* diffeomorphism, so per output tile the source
footprint is a small window and the within-tile coordinate variation is tiny
(median ~4 px horizontally / ~2 px vertically for the reference lens).  We
exploit that:

1. **Host plan (exact, float64)**: compute the OpenCV-equivalent map once;
   per tile derive a tile-aligned source window offset (DMA alignment: 8
   rows — the source is i32-packed so the sublane tile is 8 — and 128
   packed lanes), a dynamic roll that removes the alignment slack, and two
   small residual-coordinate fields:
     * ``yres[r, s]``: vertical sample position for *source column s* at
       output row r, relative to ``r`` after the roll.  Because the vertical
       pass runs before the horizontal one, column ``s`` must be sampled at
       ``y(r, u*(s))`` where ``u*`` is the exact preimage of ``s`` under the
       x-map — solved by Newton in f64 on the host, which makes the two-pass
       decomposition exact for bilinear.
     * ``lxres[r, c]``: horizontal sample position relative to ``c``.

2. **Span buckets, one kernel**: tiles are classified by their within-tile
   coordinate spans into several buckets (default: calm / mid / edge /
   wild — ~82 / 15 / 2 / 1 % of 4K tiles for the reference lens), each with
   its own static shift-multiply-accumulate chain lengths, so the median
   tile pays a ~8-tap chain instead of the worst tile's ~80.  Per-tile
   window offsets, rolls, and bucket ranks live in a scalar-prefetched
   table; non-calm residual fields are compacted and fetched via
   prefetch-indexed block specs.  The two bilinear taps appear as the two
   adjacent ``d`` terms of ``max(0, 1-|res-d|)`` — pure VPU work, no
   gathers, no scatter patch pass.

3. **Chunked window DMA**: Mosaic (jax 0.9) rejects two differently-shaped
   manual DMAs from one ANY-space source, which would force every tile to
   copy the WILD bucket's window height.  Instead the window is copied in
   1..MAX_CHUNKS chunks of one fixed (CHUNK_ROWS, rw/4) shape — tame tiles
   issue one chunk, tall-window tiles two — so the copy stays
   shape-uniform while the bytes track each bucket's true need.

4. **Kernel body**: double-buffered chunked DMA of the 3-channel i32-packed
   window (next tile's window prefetched while the current one computes),
   dynamic-roll away the alignment slack (rows, then whole-i32-word lanes;
   the byte residue is folded into the horizontal residuals on the host),
   unpack to byte planes, resample, then the LAB gamma roundtrip (closed
   form, with cv2's uint8 quantization points — all pow's rewritten as
   division-free bit-hack inverse roots + Newton) and BGR2GRAY on the same
   VMEM tile.

Borders: the input is zero-padded so every map sample lands inside the
padded array — out-of-image taps read 0, matching cv2's BORDER_CONSTANT.
Samples with a fully out-of-image footprint are exactly 0 under
BORDER_CONSTANT, so the map is clamped to just outside the image first
(without that, the diverging polynomial would dominate every span bound).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Window DMA alignment: sublane offsets multiple of 8 (i32-packed source:
# the (8, 128) int32 tile), lane offsets of 512 bytes = 128 int32 lanes
# (Mosaic requires the lane offset of an HBM slice to be provably divisible
# by the 128-lane tile).
ALIGN_Y = 8
ALIGN_X = 512
# Window DMA chunk height (rows).  Every window copy is 1..MAX_CHUNKS
# chunks of exactly this height — one shape for every bucket.
CHUNK_ROWS = 64

# Default span-bucket caps (span_x, span_y): tiles whose within-tile
# residual spans fit a cap take that bucket's short MAC chains; the last
# implicit bucket (wild) takes whatever remains.
BUCKET_SPANS = ((8.0, 6.0), (18.0, 13.0), (40.0, 24.0))

_REC_FIXED = 5  # oy, ox, shifty, qx_shift, nchunks; + one rank per non-calm bucket


def _pick_tiles(width: int, height: int) -> tuple[int, int]:
    """Output tile (TH, TW) for a frame size: biggest supported tile that
    divides the frame (fewer grid steps = less per-step overhead).
    APSE_PREPROC_TH overrides the tile height for hardware A/B sweeps."""
    import os as _os

    th_env = int(_os.environ.get("APSE_PREPROC_TH", "0"))
    ths = (th_env,) if th_env else (40, 48, 32, 24, 16, 8)
    for th in ths:
        if height % th == 0:
            break
    else:
        raise ValueError(f"height {height} not divisible by any supported tile height")
    for tw in (256, 192, 128, 64):
        if width % tw == 0:
            break
    else:
        raise ValueError(f"width {width} not divisible by any supported tile width")
    return th, tw


def _distort_map_f64(mtx: np.ndarray, dist: np.ndarray, width: int, height: int):
    """Exact (f64) undistort map: output pixel -> source pixel (cv2 semantics)."""
    d = np.zeros(14)
    d[: np.asarray(dist).size] = np.asarray(dist, dtype=np.float64).reshape(-1)
    if d[12] != 0.0 or d[13] != 0.0:
        raise NotImplementedError("tilted-sensor (tau) coefficients not supported in the fused kernel")
    k1, k2, p1, p2, k3, k4, k5, k6, s1, s2, s3, s4 = d[:12]
    fx, fy, cx, cy = mtx[0, 0], mtx[1, 1], mtx[0, 2], mtx[1, 2]

    def fwd(u, v):
        x = (u - cx) / fx
        y = (v - cy) / fy
        r2 = x * x + y * y
        r4 = r2 * r2
        r6 = r4 * r2
        rad = (1 + k1 * r2 + k2 * r4 + k3 * r6) / (1 + k4 * r2 + k5 * r4 + k6 * r6)
        xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x) + s1 * r2 + s2 * r4
        yd = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y + s3 * r2 + s4 * r4
        return xd * fx + cx, yd * fy + cy

    return fwd


@dataclasses.dataclass(frozen=True)
class _Bucket:
    """Window geometry + residual fields for one tile bucket."""

    dy: int
    dx: int
    rh: int
    rw: int
    nat: int  # post-roll compute width for this bucket
    offsets: np.ndarray  # (nty, ntx, 4) int32: oy, ox, shifty, shiftx
    yres: np.ndarray  # (nty, ntx, TH, nat) float32 (post-narrow)
    lxres: np.ndarray  # (nty, ntx, TH, TW) float32 (-2 sentinel off-bucket)
    max_oy_end: int
    max_ox_end: int
    # Raw roll amounts (shifty/shiftx are these mod rh/rw; kept so window
    # unification can recompute the shifts for the widened geometry).
    rolly: np.ndarray = None  # (nty, ntx) int64
    rollx: np.ndarray = None


@dataclasses.dataclass(frozen=True)
class RemapPlan:
    """Host-precomputed tile plan for the fused kernel (camera-specific)."""

    width: int
    height: int
    th: int
    tw: int
    pad_x: int
    pad_y: int
    padded_w: int
    padded_h: int
    rh: int  # unified window height (rows; multiple of CHUNK_ROWS)
    rw: int  # unified window width (bytes; multiple of ALIGN_X)
    # Per bucket b: MAC chain lengths, compute width, compacted fields.
    # Bucket 0 fields are dense (nty, ntx, ...); buckets 1.. are compacted
    # to their member tiles with a rank column in the table.
    bucket_dy: tuple  # (B,)
    bucket_dx: tuple
    bucket_nat: tuple
    bucket_used: tuple  # (B,) bool — empty buckets get no kernel body
    yres0: np.ndarray  # (nty, ntx, TH, nat0) f32
    lxres0: np.ndarray  # (nty, ntx, TH, TW) f32
    sub_yres: tuple  # per bucket 1..: (max(nw,1), TH, nat_b) f32
    sub_lxres: tuple  # per bucket 1..: (max(nw,1), TH, TW) f32
    table: np.ndarray  # flat (nty*ntx*REC,) int32

    @property
    def nty(self) -> int:
        return self.height // self.th

    @property
    def ntx(self) -> int:
        return self.width // self.tw

    @property
    def n_buckets(self) -> int:
        return len(self.bucket_dy)

    @property
    def rec(self) -> int:
        return _REC_FIXED + self.n_buckets - 1


def build_remap_plan(
    mtx, dist, size_wh: tuple[int, int], bucket_spans=BUCKET_SPANS,
    cache: bool = True, valid_wh: tuple[int, int] | None = None,
) -> RemapPlan:
    """Build the per-tile plan from camera parameters (runs once, numpy f64).

    ``bucket_spans`` are (span_x, span_y) caps for the non-wild buckets;
    tiles beyond every cap form the final wild bucket whose chain lengths
    come from the actual spans.  Plans are cached on disk (keyed by camera +
    geometry) since the exact Newton solve takes ~30 s at 4K.
    """
    if cache:
        import hashlib
        import os
        key = hashlib.sha256(
            np.ascontiguousarray(np.asarray(mtx, np.float64)).tobytes()
            + np.ascontiguousarray(np.asarray(dist, np.float64)).tobytes()
            + f"{size_wh}-{bucket_spans}-{ALIGN_Y}-{CHUNK_ROWS}-{_pick_tiles(*size_wh)}-{valid_wh}-v9".encode()
        ).hexdigest()[:16]
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "apse_uav_tpu")
        path = os.path.join(cache_dir, f"remap_plan_{key}.npz")
        if os.path.exists(path):
            z = np.load(path)
            nb = int(z["n_buckets"])
            return RemapPlan(
                **{k: int(z[k]) for k in (
                    "width height th tw pad_x pad_y padded_w padded_h rh rw".split()
                )},
                bucket_dy=tuple(int(v) for v in z["bucket_dy"]),
                bucket_dx=tuple(int(v) for v in z["bucket_dx"]),
                bucket_nat=tuple(int(v) for v in z["bucket_nat"]),
                bucket_used=tuple(bool(v) for v in z["bucket_used"]),
                yres0=z["yres0"], lxres0=z["lxres0"],
                sub_yres=tuple(z[f"sub_yres{b}"] for b in range(1, nb)),
                sub_lxres=tuple(z[f"sub_lxres{b}"] for b in range(1, nb)),
                table=z["table"],
            )
        plan = build_remap_plan(mtx, dist, size_wh, bucket_spans, cache=False, valid_wh=valid_wh)
        os.makedirs(cache_dir, exist_ok=True)
        arrs = dict(
            width=plan.width, height=plan.height, th=plan.th, tw=plan.tw,
            pad_x=plan.pad_x, pad_y=plan.pad_y, padded_w=plan.padded_w,
            padded_h=plan.padded_h, rh=plan.rh, rw=plan.rw,
            n_buckets=plan.n_buckets,
            bucket_dy=np.asarray(plan.bucket_dy), bucket_dx=np.asarray(plan.bucket_dx),
            bucket_nat=np.asarray(plan.bucket_nat),
            bucket_used=np.asarray(plan.bucket_used),
            yres0=plan.yres0, lxres0=plan.lxres0, table=plan.table,
        )
        for b in range(1, plan.n_buckets):
            arrs[f"sub_yres{b}"] = plan.sub_yres[b - 1]
            arrs[f"sub_lxres{b}"] = plan.sub_lxres[b - 1]
        np.savez_compressed(path + ".tmp.npz", **arrs)
        os.replace(path + ".tmp.npz", path)
        return plan

    width, height = size_wh
    th, tw = _pick_tiles(width, height)
    mtx = np.asarray(mtx, dtype=np.float64)
    fwd_raw = _distort_map_f64(mtx, np.asarray(dist, dtype=np.float64), width, height)

    # Any sample whose bilinear footprint is fully outside the source image
    # yields exactly 0 under cv2's BORDER_CONSTANT — so the map can be
    # clamped to just outside the image without changing a single output
    # pixel.
    def fwd(u, v):
        x, y = fwd_raw(u, v)
        return np.clip(x, -2.0, width + 1.0), np.clip(y, -2.0, height + 1.0)

    uu, vv = np.meshgrid(np.arange(width, dtype=np.float64), np.arange(height, dtype=np.float64))
    mx, my = fwd(uu, vv)
    if valid_wh is not None:
        # Output pixels beyond the caller's valid region (alignment padding
        # of a pooled frame) are never consumed — but the distortion
        # polynomial evaluated that far outside the calibration can FOLD
        # BACK into the image, poisoning tile spans with wild "live"
        # samples.  Dead them to the clamp box: they resample to exact 0.
        vw, vh = valid_wh
        dead = (uu >= vw) | (vv >= vh)
        mx = np.where(dead, -2.0, mx)
        my = np.where(dead, -2.0, my)
    live = (mx > -1.0) & (mx < width) & (my > -1.0) & (my < height)

    pad_x = ALIGN_X  # clamp box is [-2, W+1] so one alignment unit suffices
    pad_y = max(ALIGN_Y, 8)
    mx = mx + pad_x
    my = my + pad_y

    nty, ntx = height // th, width // tw
    mxt = mx.reshape(nty, th, ntx, tw).transpose(0, 2, 1, 3)
    myt = my.reshape(nty, th, ntx, tw).transpose(0, 2, 1, 3)
    livet = live.reshape(nty, th, ntx, tw).transpose(0, 2, 1, 3)
    tile_live = livet.any(axis=(2, 3))

    c_idx = np.arange(tw, dtype=np.float64)[None, None, None, :]
    r_idx = np.arange(th, dtype=np.float64)[None, None, :, None]

    # Within-tile residual spans (live pixels only) decide the bucket.
    def span(vals, mask):
        lo = np.where(mask, vals, np.inf).min(axis=(2, 3))
        hi = np.where(mask, vals, -np.inf).max(axis=(2, 3))
        s = hi - lo
        return np.where(mask.any(axis=(2, 3)), s, 0.0)

    span_x = span(mxt - c_idx, livet)
    span_y = span(myt - r_idx, livet)

    # Bucket assignment: first cap that fits, else wild (last bucket).
    nb = len(bucket_spans) + 1
    bucket_id = np.full((nty, ntx), nb - 1, np.int32)
    taken = np.zeros((nty, ntx), bool)
    for b, (bx, by) in enumerate(bucket_spans):
        fits = tile_live & ~taken & (span_x <= bx) & (span_y <= by)
        bucket_id[fits] = b
        taken |= fits
    bucket_id[~tile_live] = 0  # dead tiles: cheapest chains, sentinel fields
    masks = [tile_live & (bucket_id == b) for b in range(nb)]
    masks[0] = masks[0] | ~tile_live

    def bucket_fields(mask: np.ndarray, eps: float = 1e-3) -> _Bucket:
        """Windows, rolls and residual fields for the masked tile set."""
        stat_mask = livet & mask[:, :, None, None]
        any_stat = stat_mask.any(axis=(2, 3))
        x_min = np.floor(np.where(any_stat, np.where(stat_mask, mxt, np.inf).min(axis=(2, 3)), 0.0)).astype(np.int64)
        x_max = np.floor(np.where(any_stat, np.where(stat_mask, mxt, -np.inf).max(axis=(2, 3)), 1.0)).astype(np.int64) + 1
        ox = (x_min // ALIGN_X) * ALIGN_X

        # Horizontal residuals first: the window must cover both the source
        # extent and the chain's read range (tw + dx - 1).
        lx_local = mxt - ox[:, :, None, None]
        relx = np.where(stat_mask, lx_local - c_idx, np.inf)
        rollx = np.where(any_stat, np.floor(np.where(any_stat[:, :, None, None], relx, 0.0).min(axis=(2, 3))), 0.0).astype(np.int64)
        lxres_all = lx_local - c_idx - rollx[:, :, None, None]
        dx = int(np.floor(np.where(stat_mask, lxres_all, -np.inf).max(initial=0.0))) + 2
        dx = max(dx, 2)
        # Sentinel -2: all horizontal weights vanish -> exact 0 (dead px).
        lxres = np.where(stat_mask, lxres_all.clip(0.0, dx - 1.0), -2.0).astype(np.float32)

        rw = -(-max(int((x_max - ox).max()) + 2, tw + dx) // ALIGN_X) * ALIGN_X

        # Exact vertical sample positions per source column (Newton for the
        # x-preimage, f64).
        s_local = np.arange(rw, dtype=np.float64)
        y_at = np.empty((nty, ntx, th, rw), dtype=np.float64)
        for i in range(nty):
            s_glob = np.broadcast_to(ox[i][:, None, None] + s_local[None, None, :], (ntx, th, rw))
            v_glob = np.broadcast_to(
                np.arange(i * th, (i + 1) * th, dtype=np.float64)[None, :, None], (ntx, th, rw)
            )
            u = np.clip(s_glob - pad_x, 0.0, width - 1.0)
            for _ in range(4):
                fu, _ = fwd(u, v_glob)
                fup, _ = fwd(u + eps, v_glob)
                dfu = (fup - fu) / eps
                u = u - (fu + pad_x - s_glob) / np.maximum(dfu, 1e-6)
                u = np.clip(u, 0.0, width - 1.0)
            _, yi = fwd(u, v_glob)
            y_at[i] = yi + pad_y

        # Columns consumed by the horizontal pass, per output row.
        row_x_min = np.where(stat_mask, mxt, np.inf).min(axis=3)
        row_x_max = np.where(stat_mask, mxt, -np.inf).max(axis=3)
        row_live = stat_mask.any(axis=3)
        row_x_min = np.where(row_live, row_x_min, 0.0)
        row_x_max = np.where(row_live, row_x_max, 1.0)
        s_cols = ox[:, :, None, None] + s_local[None, None, None, :]
        consumed = (
            (s_cols >= np.floor(row_x_min)[..., None])
            & (s_cols <= np.floor(row_x_max)[..., None] + 1)
            & row_live[..., None]
        )

        any_cons = consumed.any(axis=(2, 3))
        y_used_min = np.where(any_cons, np.where(consumed, y_at, np.inf).min(axis=(2, 3)), 0.0)
        y_used_max = np.where(any_cons, np.where(consumed, y_at, -np.inf).max(axis=(2, 3)), 1.0)
        y_min = np.floor(y_used_min).astype(np.int64)
        y_max = np.floor(y_used_max).astype(np.int64) + 1
        oy = (y_min // ALIGN_Y) * ALIGN_Y
        rh = -(-int((y_max - oy).max() + 2) // ALIGN_Y) * ALIGN_Y

        # Roll + residual decomposition.  Rolls may be NEGATIVE (alignment
        # slack smaller than within-tile variation): the roll is cyclic, and
        # every tap with nonzero weight addresses an un-wrapped source
        # element (wrapped positions only ever see zero weights).
        y_local = y_at - oy[:, :, None, None]
        rel = np.where(consumed, y_local - r_idx, np.inf)
        rolly = np.where(any_cons, np.floor(np.where(any_cons[:, :, None, None], rel, 0.0).min(axis=(2, 3))), 0.0).astype(np.int64)
        yres_all = y_local - r_idx - rolly[:, :, None, None]
        dy = int(np.floor(np.where(consumed, yres_all, -np.inf).max(initial=0.0))) + 2
        dy = max(dy, 2)
        yres = np.where(consumed, yres_all, 0.0).clip(0.0, dy - 1.0).astype(np.float32)

        assert float(yres.min()) >= 0.0
        assert int((y_max - oy).max()) <= rh - 1, "vertical window overflow"
        assert int((x_max - ox).max()) <= rw - 1, "horizontal window overflow"
        assert (oy >= 0).all() and (ox >= 0).all()

        shifty = ((-rolly) % rh).astype(np.int32)
        shiftx = ((-rollx) % rw).astype(np.int32)
        offsets = np.stack([oy, ox, shifty, shiftx], axis=-1).astype(np.int32)
        return _Bucket(
            dy=dy, dx=dx, rh=int(rh), rw=int(rw), nat=0, offsets=offsets,
            yres=yres, lxres=lxres,
            max_oy_end=int((oy + rh).max()), max_ox_end=int((ox + rw).max()),
            rolly=rolly, rollx=rollx,
        )

    buckets = [bucket_fields(m) for m in masks]
    # Guard against degenerate lenses: chains beyond this are a config
    # error, not a remap problem.
    assert buckets[-1].dy <= 160 and buckets[-1].dx <= 320, (buckets[-1].dy, buckets[-1].dx)

    # Unified window geometry (one DMA chunk shape for every bucket).
    # Roll-early narrowing: the kernel aligns the PACKED window with cyclic
    # rolls (rows by shifty; lanes by whole i32 words qx = floor(rollx/4)),
    # then computes only over the first `nat_b` post-roll columns — the
    # consumed span tw + dx_b plus slack.  The byte residue m = rollx - 4*qx
    # is absorbed into the HORIZONTAL residuals (lxres + m, up to 3 extra
    # taps), so the unpack is a pure plane split with no per-tile reorder.
    nats = []
    for b in buckets:
        dx_eff = b.dx + 3
        nats.append(-(-(tw + dx_eff + 8) // 512) * 512)
    nat_max = max(nats)
    rh_u = max(b.rh for b in buckets)
    rh_u = -(-rh_u // CHUNK_ROWS) * CHUNK_ROWS
    rw_u = max(max(b.rw for b in buckets), nat_max + ALIGN_X)

    def narrow(b: _Bucket, nat: int) -> _Bucket:
        yres = b.yres
        if yres.shape[-1] < rw_u:
            yres = np.pad(yres, [(0, 0)] * (yres.ndim - 1) + [(0, rw_u - yres.shape[-1])])
        qx = np.floor_divide(b.rollx, 4)
        m = (b.rollx - 4 * qx).astype(np.int32)  # byte residue 0..3
        # Post-roll column c reads window column c + 4*qx (clipped reads
        # land on columns whose horizontal weights are zero — harmless).
        idx = np.clip(
            np.arange(nat)[None, None, None, :] + 4 * qx[:, :, None, None], 0, rw_u - 1
        )
        yres_nat = np.take_along_axis(yres, np.broadcast_to(idx, yres.shape[:-1] + (nat,)), axis=-1)
        # Horizontal residuals shift by the byte residue (sentinel stays).
        lxres = np.where(b.lxres <= -2.0, b.lxres, b.lxres + m[:, :, None, None]).astype(np.float32)
        offsets = b.offsets.copy()
        offsets[..., 2] = ((-b.rolly) % rh_u).astype(np.int32)
        offsets[..., 3] = ((-qx) % (rw_u // 4)).astype(np.int32)  # packed-lane shift
        return dataclasses.replace(
            b, rh=rh_u, rw=rw_u, nat=nat, dx=b.dx + 3, yres=yres_nat.astype(np.float32),
            lxres=lxres, offsets=offsets,
            max_oy_end=int((offsets[..., 0] + rh_u).max()),
            max_ox_end=int((offsets[..., 1] + rw_u).max()),
        )

    buckets = [narrow(b, nat) for b, nat in zip(buckets, nats)]

    used = [bool(m.any()) for m in masks]
    used[0] = True
    padded_w = max(
        -(-(width + 2 * pad_x) // ALIGN_X) * ALIGN_X,
        max(b.max_ox_end for b, u in zip(buckets, used) if u),
    )
    padded_h = max(
        -(-(height + 2 * pad_y) // ALIGN_Y) * ALIGN_Y,
        max(b.max_oy_end for b, u in zip(buckets, used) if u),
    )

    # Combined scalar table: every tile carries its own bucket's offsets,
    # chunk count, and (for non-calm buckets) its compacted field rank.
    rec = _REC_FIXED + nb - 1
    table = np.zeros((nty, ntx, rec), np.int32)
    table[:, :, :4] = buckets[0].offsets
    sub_yres, sub_lxres = [], []
    for b in range(1, nb):
        bi, bj = np.nonzero(masks[b])
        rank = np.full((nty, ntx), -1, np.int32)
        rank[bi, bj] = np.arange(len(bi))
        for i, j in zip(bi, bj):
            table[i, j, :4] = buckets[b].offsets[i, j]
        table[:, :, _REC_FIXED + b - 1] = rank
        if len(bi):
            sub_yres.append(np.ascontiguousarray(buckets[b].yres[bi, bj]))
            sub_lxres.append(np.ascontiguousarray(buckets[b].lxres[bi, bj]))
        else:
            sub_yres.append(np.zeros((1, th, buckets[b].nat), np.float32))
            sub_lxres.append(np.full((1, th, tw), -2.0, np.float32))
    # Chunk count per tile: how many CHUNK_ROWS chunks the window copy
    # needs.  The kernel's vertical MAC consumes post-roll rows [0, rows_b)
    # where rows_b = align8(th + dy_b); post-roll row i reads pre-roll
    # window row (i + rolly) mod rh.  For rolly >= 0 (the common case:
    # alignment slack removed by the roll) the reads are the contiguous
    # prefix-offset range [rolly, rolly + rows_b); for rolly < 0 the first
    # -rolly post-roll rows would wrap to the window tail, but every tap
    # that lands there has zero weight by construction, so the copy only
    # needs [0, rows_b + rolly) subset of [0, rows_b).  Copy height =
    # rows_b + max(rolly, 0), clamped to rh.
    nchunks = np.ones((nty, ntx), np.int64)
    for b in range(nb):
        m = masks[b]
        if not m.any():
            continue
        rows_b = min(-(-(th + buckets[b].dy) // 8) * 8, rh_u)
        ext = np.minimum(rows_b + np.maximum(buckets[b].rolly[m], 0), rh_u)
        nchunks[m] = -(-ext // CHUNK_ROWS)
    table[:, :, 4] = nchunks.astype(np.int32)

    return RemapPlan(
        width=width, height=height, th=th, tw=tw, pad_x=pad_x, pad_y=pad_y,
        padded_w=int(padded_w), padded_h=int(padded_h), rh=int(rh_u), rw=int(rw_u),
        bucket_dy=tuple(b.dy for b in buckets),
        bucket_dx=tuple(b.dx for b in buckets),
        bucket_nat=tuple(b.nat for b in buckets),
        bucket_used=tuple(used),
        yres0=buckets[0].yres, lxres0=buckets[0].lxres,
        sub_yres=tuple(sub_yres), sub_lxres=tuple(sub_lxres),
        table=table.reshape(-1),
    )


# ---------------------------------------------------------------------------
# Kernel-side math (VPU-friendly; division-free bit-hack roots + Newton).
# ---------------------------------------------------------------------------


def _pow(x, p):
    return jnp.exp(p * jnp.log(jnp.maximum(x, 1e-12)))


def _cbrt(x):
    """Fast x^(1/3) for x >= 0 via the inverse root r = x^(-1/3).

    Division-free: bit-hack seed + 3 Newton steps r <- r(4 - x r^3)/3, then
    cbrt = x * r^2.  Transcendentals cost ~30 cycles each on the VPU and
    divisions ~10; this is all multiplies.  ~1e-6 relative accuracy.
    """
    x = jnp.maximum(x, 1e-20)
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    # exponent(r) = -exponent(x)/3: i_r ~ K - i/3 with K tuned for the seed.
    seed = (1419970954.0 - jnp.floor(i.astype(jnp.float32) * (1.0 / 3.0))).astype(jnp.int32)
    r = jax.lax.bitcast_convert_type(seed, jnp.float32)
    for _ in range(3):
        r = r * (4.0 - x * (r * r) * r) * (1.0 / 3.0)
    return x * r * r


def _fifth_root(x):
    """Fast x^(1/5) for x > 0 via r = x^(-1/5): seed + 3 Newton steps
    r <- r(6 - x r^5)/5, then x^(1/5) = x * r^4.  Division-free."""
    x = jnp.maximum(x, 1e-20)
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    seed = (1277923859.0 - jnp.floor(i.astype(jnp.float32) * 0.2)).astype(jnp.int32)
    r = jax.lax.bitcast_convert_type(seed, jnp.float32)
    for _ in range(3):
        r2 = r * r
        r = r * (6.0 - x * r2 * r2 * r) * 0.2
    r2 = r * r
    return x * r2 * r2


def _srgb_to_linear(u):
    # pow(v, 2.4) = v^2 * (v^(1/5))^2
    v = (u + 0.055) * (1.0 / 1.055)
    r5 = _fifth_root(v)
    return jnp.where(u <= 0.04045, u * (1.0 / 12.92), v * v * r5 * r5)


def _linear_to_srgb(u):
    # pow(u, 1/2.4) = u^(5/12) = sqrt(u) * rsqrt(sqrt(cbrt(u)))
    u = jnp.maximum(u, 1e-12)
    p = jnp.sqrt(u) * jax.lax.rsqrt(jnp.sqrt(_cbrt(u)))
    return jnp.where(u <= 0.0031308, u * 12.92, 1.055 * p - 0.055)


def _f_cbrt(t):
    return jnp.where(t > 0.008856, _cbrt(t), 7.787 * t + 16.0 / 116.0)


def _f_inv(ft):
    return jnp.where(ft > 0.2068966, ft * ft * ft, (ft - 16.0 / 116.0) / 7.787)


_RGB2XYZ = (
    (0.412453, 0.357580, 0.180423),
    (0.212671, 0.715160, 0.072169),
    (0.019334, 0.119193, 0.950227),
)
_XYZ2RGB = tuple(tuple(float(x) for x in row) for row in np.linalg.inv(np.array(_RGB2XYZ)))
_XN = 0.950456
_ZN = 1.088754


def lab_gamma_gray_f32(c0, c1, c2, gamma: float):
    """cv2-parity LAB gamma roundtrip + BGR2GRAY on f32 planes in [0, 255].

    Channels are in *stored* order — the reference feeds BGR data through
    COLOR_RGB2LAB (aruco_detect.py:255), and we reproduce that bit of
    behavior faithfully.  Shared by the Pallas kernel and any XLA fallback
    so both produce identical values.
    """
    rl = _srgb_to_linear(c0 * (1.0 / 255.0))
    gl = _srgb_to_linear(c1 * (1.0 / 255.0))
    bl = _srgb_to_linear(c2 * (1.0 / 255.0))
    m = _RGB2XYZ
    x = m[0][0] * rl + m[0][1] * gl + m[0][2] * bl
    y = m[1][0] * rl + m[1][1] * gl + m[1][2] * bl
    z = m[2][0] * rl + m[2][1] * gl + m[2][2] * bl
    fx = _f_cbrt(x * (1.0 / _XN))
    fy = _f_cbrt(y)
    fz = _f_cbrt(z * (1.0 / _ZN))
    big_l = jnp.where(y > 0.008856, 116.0 * fy - 16.0, 903.3 * y)
    # cv2 quantizes L/a/b to uint8 before the LUT is applied.
    l_u8 = jnp.clip(jnp.round(big_l * (255.0 / 100.0)), 0.0, 255.0)
    a_u8 = jnp.clip(jnp.round(500.0 * (fx - fy) + 128.0), 0.0, 255.0)
    b_u8 = jnp.clip(jnp.round(200.0 * (fy - fz) + 128.0), 0.0, 255.0)
    # Reference LUT truncates: uint8 cast of (i/255)^gamma * 255.
    if gamma == 2.0:
        # Exact in f32: l^2 and /255 stay within the 24-bit integer range.
        l2 = jnp.floor(l_u8 * l_u8 * (1.0 / 255.0))
    else:
        l2 = jnp.floor(jnp.clip(_pow(l_u8 * (1.0 / 255.0), gamma) * 255.0, 0.0, 255.0))
    ll = l2 * (100.0 / 255.0)
    aa = a_u8 - 128.0
    bb = b_u8 - 128.0
    fy2 = (ll + 16.0) / 116.0
    fx2 = fy2 + aa * (1.0 / 500.0)
    fz2 = fy2 - bb * (1.0 / 200.0)
    x2 = _f_inv(fx2) * _XN
    y2 = jnp.where(ll > 8.0, fy2 * fy2 * fy2, ll * (1.0 / 903.3))
    z2 = _f_inv(fz2) * _ZN
    mi = _XYZ2RGB
    r2 = _linear_to_srgb(mi[0][0] * x2 + mi[0][1] * y2 + mi[0][2] * z2)
    g2 = _linear_to_srgb(mi[1][0] * x2 + mi[1][1] * y2 + mi[1][2] * z2)
    b2 = _linear_to_srgb(mi[2][0] * x2 + mi[2][1] * y2 + mi[2][2] * z2)
    r8 = jnp.clip(jnp.round(r2 * 255.0), 0.0, 255.0)
    g8 = jnp.clip(jnp.round(g2 * 255.0), 0.0, 255.0)
    b8 = jnp.clip(jnp.round(b2 * 255.0), 0.0, 255.0)
    # BGR2GRAY on stored order (c0=B, c1=G, c2=R): cv2 fixed-point weights.
    gray = jnp.floor((4899.0 * b8 + 9617.0 * g8 + 1868.0 * r8 + 8192.0) * (1.0 / 16384.0))
    return r8, g8, b8, jnp.clip(gray, 0.0, 255.0)


def _make_kernel(dims: "_PlanDims", gamma: float, want_rgb: bool = True,
                 debug_mode: str = "full", fsteps: int = 1, t_sel: int = 0):
    """debug_mode isolates kernel cost components for profiling ablations
    (scripts/bench_preproc_ablate.py); outputs are WRONG except in "full":

    - "full": production kernel.
    - "no_lab": resample runs, LAB gamma roundtrip replaced by a channel mean.
    - "dma_only": window DMA + unpack only (timing floor: DMA + grid overhead).

    fsteps: frames per grid step (the batch grid axis covers bsz // fsteps
    blocks).  Amortizes the fixed per-step cost (grid bookkeeping, bucket
    branch dispatch) over several frames of the SAME tile; window DMA and
    compute scale with fsteps, so the win is exactly the per-step overhead.

    t_sel > 0: SELECTED-TILE mode (the two-pass preproc's second pass).
    The grid becomes (t_sel, batch) and a second scalar-prefetch array
    ``sel (B, t_sel) i32`` names which tile each step computes (tile id =
    ty * ntx + tx, per frame — candidate-driven, see aruco.patch_select).
    All per-tile machinery (window table, residual-field blocks, bucket
    ranks) is keyed by the selected id, so the output tiles are
    bit-identical to the full kernel's; unselected output tiles are never
    written (garbage — the caller masks candidates accordingly).
    fsteps must be 1 (selection differs per frame).
    """
    th, tw = dims.th, dims.tw
    rh, rw = dims.rh, dims.rw
    nty, ntx = dims.height // th, dims.width // tw
    tiles = nty * ntx
    nb = len(dims.bucket_dy)
    rec = _REC_FIXED + nb - 1
    max_chunks = rh // CHUNK_ROWS

    def kernel(tab_ref, *args):
        if t_sel:
            sel_ref, yres0_ref, lxres0_ref, *rest = args
        else:
            sel_ref = None
            yres0_ref, lxres0_ref, *rest = args
        sub_refs = rest[: 2 * (nb - 1)]
        src_ref = rest[2 * (nb - 1)]
        out_refs = rest[2 * (nb - 1) + 1:]
        if want_rgb:
            out_ref, gray_ref, s_u8, sem = out_refs
        else:
            gray_ref, s_u8, sem = out_refs
            out_ref = None
        if t_sel:
            # Selected-tile grid: (slot-in-selection, batch).  Negative ids
            # are padding: no DMA, no compute, output to the garbage row.
            t = pl.program_id(0)
            b = pl.program_id(1)
            nb_batch = pl.num_programs(1)
            step = t * nb_batch + b
            tile_raw = sel_ref[b, t]
            active = tile_raw >= 0
            tile_id = jnp.maximum(tile_raw, 0)
            ti = tile_id // ntx
            tj = jax.lax.rem(tile_id, ntx)
            n_steps = t_sel * nb_batch
        else:
            # Grid order: (tile_y, tile_x, batch) with batch INNERMOST — the
            # residual-field blocks depend only on the tile, so consecutive
            # batch steps reuse them instead of re-fetching per frame.
            ti = pl.program_id(0)
            tj = pl.program_id(1)
            b = pl.program_id(2)
            nb_batch = pl.num_programs(2)
            step = ((ti * ntx + tj) * nb_batch) + b
            n_steps = nb_batch * tiles
        slot = jax.lax.rem(step, 2)

        # The source is i32-packed (4 bytes/lane): offsets and widths are in
        # i32 units; the kernel unpacks bytes after the copy.  The window is
        # copied in 1..max_chunks chunks of ONE fixed shape (Mosaic rejects
        # differently-shaped manual DMAs from one ANY-space source).
        rw4 = rw // 4

        def dmas(slot_, bb, tti, ttj, k):
            base = (tti * ntx + ttj) * rec
            # Channel-MAJOR window copy: ONE 4-D box DMA per chunk spans
            # all 3 channels (the channel axis is just another strided box
            # dim, same issue count as the old row-group-interleaved
            # layout; per-channel copies measured ~+0.15 ms/frame on the
            # demand-bound selected pass — round 4).
            cg = CHUNK_ROWS // ALIGN_Y
            # Row-group index: no alignment guarantee beyond 1 (the sublane
            # offset is handled by ALIGN_Y packing, not by Mosaic hints).
            oy8 = tab_ref[base + 0] // ALIGN_Y
            ox4 = pl.multiple_of(tab_ref[base + 1] // 4, ALIGN_X // 4)
            return [
                pltpu.make_async_copy(
                    src_ref.at[bb * fsteps + f, :, pl.ds(oy8 + k * cg, cg), :, pl.ds(ox4, rw4)],
                    s_u8.at[slot_, f, :, pl.ds(k * cg, cg), :, pl.ds(0, rw4)],
                    sem.at[slot_, f, k],
                )
                for f in range(fsteps)
            ]

        def _chunked(slot_, sstep, op):
            if t_sel:
                tt = sstep // nb_batch
                bb = jax.lax.rem(sstep, nb_batch)
                stile_raw = sel_ref[bb, tt]
                stile = jnp.maximum(stile_raw, 0)
                ni = stile // ntx
                nj = jax.lax.rem(stile, ntx)
                # Padding entries (-1): zero chunks — no window DMA at all.
                nch = jnp.where(stile_raw >= 0, tab_ref[(ni * ntx + nj) * rec + 4], 0)
            else:
                ni = sstep // (ntx * nb_batch)
                rem_ = jax.lax.rem(sstep, ntx * nb_batch)
                nj = rem_ // nb_batch
                bb = jax.lax.rem(rem_, nb_batch)
                nch = tab_ref[(ni * ntx + nj) * rec + 4]
            for k in range(max_chunks):
                @pl.when(k < nch)
                def _():
                    for d in dmas(slot_, bb, ni, nj, k):
                        getattr(d, op)()

        def start_for(slot_, sstep):
            _chunked(slot_, sstep, "start")

        def wait_for(slot_, sstep):
            _chunked(slot_, sstep, "wait")

        # Double buffering: first step primes its own slot; every step then
        # prefetches the next tile's window into the other slot.
        @pl.when(step == 0)
        def _():
            start_for(slot, step)

        @pl.when(step + 1 < n_steps)
        def _():
            start_for(1 - slot, step + 1)

        base = (ti * ntx + tj) * rec
        shifty = tab_ref[base + 2]
        qx_shift = tab_ref[base + 3]  # packed-lane roll (i32 words)

        # 0/1 permutation matrix: perm column r = p*tw/4 + a maps to
        # natural column 4a + p (see resample docstring).
        _pr = jax.lax.broadcasted_iota(jnp.int32, (tw, tw), 0)
        _pc = jax.lax.broadcasted_iota(jnp.int32, (tw, tw), 1)
        # bf16 matrix + bf16 integer inputs = ONE MXU pass (f32 matmuls are
        # multi-pass and measured ~0.6 ms/frame here); the permutation is a
        # 0/1 selection of integers <= 255, all exact in bf16.
        unperm_mat = (
            ((_pc % 4) == (_pr // (tw // 4))) & ((_pc // 4) == (_pr % (tw // 4)))
        ).astype(jnp.bfloat16)

        def unperm_store(x):
            """Truncate like the old u8 store, then permute exactly."""
            xi = x.astype(jnp.int32).astype(jnp.bfloat16)
            nat = jnp.dot(xi, unperm_mat, preferred_element_type=jnp.float32)
            return nat.astype(jnp.int32).astype(jnp.uint8)

        def resample(src_rows, yres_p, lxres_p, dy_, dx_, nat_, rows_, fi=0):
            """Two-pass shift-MAC resample + LAB gamma + writes.

            Roll-early, deinterleaved: the PACKED window is aligned with
            cyclic rolls (rows, then whole-i32-word lanes), sliced to the
            consumed span, and unpacked into 4 byte-planes concatenated
            along lanes (perm column p*nat/4 + a <-> post-roll natural
            column 4a + p; the byte residue of the roll is folded into the
            plane reorder).  Residual fields arrive host-permuted and
            re-indexed to post-roll columns, so both MAC passes use static
            slices only.  Outputs stay perm-ordered; the XLA wrapper
            reinterleaves the full frames once at the end.
            """
            tw4 = tw // 4
            nat4 = nat_ // 4
            # Tap loops OUTERMOST, channels innermost: each per-tap weight
            # plane ((th, nat_) f32) is shared by the 3 channels and must
            # DIE right after its tap — with channels outermost the
            # compiler CSEs the channel-independent weights and keeps all
            # dy_ (or dx_*4) of them live at once, blowing the 16 MB
            # scoped-VMEM stack for the wild bucket's long chains.
            ss = [src_rows(fi, ch, nat_, rows_) for ch in range(3)]
            # Tap d reads source rows [d, d + th); for large tiles the
            # aligned window (rh) can be shorter than th + dy - 1.  Rows
            # beyond the window are provably unconsumed (plan assert), so
            # their residuals are 0 and every tap d >= 1 has zero weight
            # there — zero-padding is exact.
            if rows_ < th + dy_ - 1:
                ss = [jnp.pad(s, ((0, th + dy_ - 1 - rows_), (0, 0))) for s in ss]
            vs = [jnp.zeros((th, nat_), jnp.float32) for _ in range(3)]
            for d in range(dy_):
                w_d = jnp.maximum(0.0, 1.0 - jnp.abs(yres_p - float(d)))
                vs = [v + w_d * s[d : d + th, :] for v, s in zip(vs, ss)]
            # Horizontal MAC per output residue b: post-roll natural
            # column c = 4a + b, tap e reads natural c + e = plane
            # (b+e)%4 at a + (b+e)//4 — static slices of v.
            outs = [[] for _ in range(3)]
            for bres in range(4):
                lx_b = lxres_p[:, bres * tw4 : (bres + 1) * tw4]
                o_b = [jnp.zeros((th, tw4), jnp.float32) for _ in range(3)]
                for e in range(dx_):
                    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(lx_b - float(e)))
                    t = bres + e
                    pbase = (t % 4) * nat4 + (t // 4)
                    o_b = [o + wgt * v[:, pbase : pbase + tw4] for o, v in zip(o_b, vs)]
                for ch in range(3):
                    outs[ch].append(o_b[ch])
            planes_out = [
                jnp.clip(jnp.round(jnp.concatenate(outs[ch], axis=1)), 0.0, 255.0)
                for ch in range(3)
            ]
            if debug_mode == "no_lab":
                gray = (planes_out[0] + planes_out[1] + planes_out[2]) * (1.0 / 3.0)
                c0, c1, c2 = planes_out
            else:
                c0, c1, c2, gray = lab_gamma_gray_f32(planes_out[0], planes_out[1], planes_out[2], gamma)
            # Reinterleave byte planes to NATURAL column order in-kernel as
            # one 0/1 permutation matmul per output (perm col p*tw/4 + a ->
            # natural 4a + p).  The MXU is idle in this kernel and the
            # matmuls cost ~0.04 ms/frame; the XLA-side full-frame unperm
            # they replace measured 0.62 ms/frame (round 3 session 4).
            if want_rgb:
                out_ref[fi, 0] = unperm_store(c0)
                out_ref[fi, 1] = unperm_store(c1)
                out_ref[fi, 2] = unperm_store(c2)
            gray_ref[fi] = unperm_store(gray)

        wait_for(slot, step)

        def rows(fi, ch, nat_, rows_):
            # Align the PACKED window with cyclic rolls (4 bytes/lane ==
            # cheap), slice to the consumed span, then unpack into
            # deinterleaved byte planes: post-roll natural column 4a + p is
            # byte p (little-endian) of packed lane a.  (The roll's byte
            # residue is absorbed into the horizontal residuals on the
            # host, so no per-tile plane reorder is needed.)
            # (rh/8, 8, rw4) per-channel window view; the row-group merge
            # is a sublane regroup in VMEM (cheap next to the HBM copies
            # it replaces).
            p32 = s_u8[slot, fi, ch, :, :, :].reshape(rh, rw4)
            p32 = pltpu.roll(p32, shift=shifty, axis=0)
            p32 = p32[0:rows_, :]
            p32 = pltpu.roll(p32, shift=qx_shift, axis=1)
            p32 = p32[:, 0 : nat_ // 4]
            return jnp.concatenate(
                [((p32 >> (8 * k)) & 255).astype(jnp.float32) for k in range(4)],
                axis=1,
            )  # (rows_, nat_)

        if debug_mode == "dma_only":
            for f in range(fsteps):
                w32 = s_u8[slot, f, 0, :, :, :].reshape(rh, rw4)[0:th, 0 : tw // 4]
                g = jnp.concatenate([((w32 >> (8 * k)) & 255) for k in range(4)], axis=1)
                gu = unperm_store(g.astype(jnp.float32))
                if want_rgb:
                    for ch in range(3):
                        out_ref[f, ch] = gu
                gray_ref[f] = gu
            return

        # Per-bucket bodies.  Exactly one branch runs per tile: bucket 0
        # (calm) when no rank column matches, else the ranked bucket.
        ranks = [tab_ref[base + _REC_FIXED + bi - 1] for bi in range(1, nb)]

        def body_for(bi):
            dy_ = dims.bucket_dy[bi]
            dx_ = dims.bucket_dx[bi]
            nat_ = dims.bucket_nat[bi]
            rows_ = min(-(-(th + dy_) // 8) * 8, rh)
            for f in range(fsteps):
                if bi == 0:
                    resample(rows, yres0_ref[0, 0], lxres0_ref[0, 0], dy_, dx_, nat_, rows_, fi=f)
                else:
                    yr = sub_refs[2 * (bi - 1)][0]
                    lr = sub_refs[2 * (bi - 1) + 1][0]
                    resample(rows, yr, lr, dy_, dx_, nat_, rows_, fi=f)

        def run_body():
            live_rest = [bi for bi in range(1, nb) if dims.bucket_used[bi]]
            if not live_rest:
                body_for(0)
                return
            in_calm = ranks[live_rest[0] - 1] < 0
            for bi in live_rest[1:]:
                in_calm = in_calm & (ranks[bi - 1] < 0)

            @pl.when(in_calm)
            def _():
                body_for(0)

            for bi in live_rest:
                @pl.when(ranks[bi - 1] >= 0)
                def _(bi=bi):
                    body_for(bi)

        if t_sel:
            # Padding steps compute nothing (their out block is the garbage
            # row; its stale VMEM content lands there, never in the frame).
            @pl.when(active)
            def _():
                run_body()
        else:
            run_body()

    return kernel


def _perm_lanes(field: np.ndarray) -> np.ndarray:
    """Deinterleave the last axis: out[..., p*L/4 + a] = field[..., 4a + p]."""
    L = field.shape[-1]
    idx = np.arange(L).reshape(L // 4, 4).T.reshape(-1)
    return np.ascontiguousarray(field[..., idx])


@dataclasses.dataclass(frozen=True)
class _PlanDims:
    """Hashable static geometry of a RemapPlan (jit static arg)."""

    width: int
    height: int
    th: int
    tw: int
    pad_x: int
    pad_y: int
    padded_w: int
    padded_h: int
    rh: int
    rw: int
    bucket_dy: tuple
    bucket_dx: tuple
    bucket_nat: tuple
    bucket_used: tuple


class PallasPreprocessor:
    """Fused TPU preprocessing: planar uint8 frames -> (undistorted+gamma, gray).

    Usage:
        pre = PallasPreprocessor(mtx, dist, (3840, 2160))
        out, gray = pre(frames)   # frames: (B, 3, H, W) uint8 planar
    """

    def __init__(self, mtx, dist, size_wh: tuple[int, int], gamma: float = 2.0, interpret: bool = False,
                 want_rgb: bool = True, plan: RemapPlan | None = None, debug_mode: str = "full",
                 frames_per_step: int = 1, valid_wh: tuple[int, int] | None = None):
        self.plan = plan if plan is not None else build_remap_plan(mtx, dist, size_wh, valid_wh=valid_wh)
        self.gamma = float(gamma)
        self.interpret = interpret
        # want_rgb=False skips the 3-channel gamma-corrected output entirely
        # (the detection pipeline consumes only gray) — one less full-frame
        # HBM write per frame.
        self.want_rgb = want_rgb
        self.debug_mode = debug_mode  # see _make_kernel — profiling ablations
        self.frames_per_step = int(frames_per_step)
        p = self.plan
        self._table = jnp.asarray(p.table)
        # The kernel runs in deinterleaved lane space (4-byte unpack of the
        # i32-packed window): permute the per-source-column / per-output-
        # column residual fields to match (perm col p*L/4 + a <-> natural
        # 4a + p).
        self._yres0 = jnp.asarray(_perm_lanes(p.yres0))
        self._lxres0 = jnp.asarray(_perm_lanes(p.lxres0))
        self._subs = tuple(
            (jnp.asarray(_perm_lanes(y)), jnp.asarray(_perm_lanes(l)))
            for y, l in zip(p.sub_yres, p.sub_lxres)
        )
        self._dims = _PlanDims(
            width=p.width, height=p.height, th=p.th, tw=p.tw,
            pad_x=p.pad_x, pad_y=p.pad_y,
            padded_w=p.padded_w, padded_h=p.padded_h, rh=p.rh, rw=p.rw,
            bucket_dy=tuple(p.bucket_dy), bucket_dx=tuple(p.bucket_dx),
            bucket_nat=tuple(p.bucket_nat), bucket_used=tuple(p.bucket_used),
        )

    def __call__(self, frames: jax.Array):
        subs_flat = tuple(x for pair in self._subs for x in pair)
        return _fused_preproc(
            frames, self._table, self._yres0, self._lxres0, subs_flat,
            dims=self._dims, gamma=self.gamma, interpret=self.interpret,
            want_rgb=self.want_rgb, debug_mode=self.debug_mode,
            frames_per_step=self.frames_per_step,
        )

    def from_packed(self, packed: jax.Array):
        """__call__ on a pre-packed source (see pack()).

        Lets the two-pass front feed the POOLED plan a pooled-PACKED array
        derived arithmetically from the full-res pack
        (twopass.pool_packed_to_packed) without materializing a planar u8
        pooled frame and re-packing it.
        """
        subs_flat = tuple(x for pair in self._subs for x in pair)
        return _fused_preproc_packed(
            packed, self._table, self._yres0, self._lxres0, subs_flat,
            dims=self._dims, gamma=self.gamma, interpret=self.interpret,
            want_rgb=self.want_rgb, debug_mode=self.debug_mode,
            frames_per_step=self.frames_per_step,
        )

    @property
    def dims(self) -> "_PlanDims":
        return self._dims

    def pack(self, frames: jax.Array) -> jax.Array:
        """The kernel's i32-packed, channel-interleaved source form.

        Exposed so the two-pass front can pack ONCE and share the array
        between the selected-tile pass and the pooled-source derivation
        (twopass.pool_packed_to_packed).

        ``frames`` is planar (B, 3, H, W) uint8, the zero-cost host view
        form (B, 3, H, W//4) int32 (``frames.view(np.int32)`` — identical
        bits, so the device-side pack reduces to a pad), or the PRE-PADDED
        5-D form from host_pack() (device-side pack is the identity).
        """
        return _pack_frames(frames, self._dims)

    def host_pack(self, frames: "np.ndarray") -> "np.ndarray":
        """Pack planar u8 frames into the kernel source form ON THE HOST.

        The padded plan geometry in natural row order is bit-identical to
        the packed 5-D i32 array, so ingest that writes decoded frames into
        a zeroed padded buffer (the one memcpy any batch assembly performs)
        produces the kernel's DMA source outright — pack() on the result is
        the identity, saving the 0.46 ms/frame device pad+reshape at 4K.

        frames: (B, 3, H, W) uint8 (numpy).  Returns (B, 3, Hp/8, 8, Wp/4)
        int32 (numpy), little-endian bytes per lane like _pack_frames.
        """
        import numpy as np

        d = self._dims
        b = frames.shape[0]
        assert frames.dtype == np.uint8 and frames.shape[1:] == (3, d.height, d.width)
        buf = np.zeros((b, 3, d.padded_h, d.padded_w), np.uint8)
        buf[:, :, d.pad_y : d.pad_y + d.height, d.pad_x : d.pad_x + d.width] = frames
        return buf.view(np.int32).reshape(b, 3, d.padded_h // ALIGN_Y, ALIGN_Y, d.padded_w // 4)

    def selected(self, frames: jax.Array, sel: jax.Array) -> jax.Array:
        """Second-pass gray: recompute ONLY the tiles named by sel.

        frames (B, 3, H, W) u8; sel (B, T_sel) i32 tile ids (ty*ntx+tx, see
        aruco.patch_select; -1 entries are skipped).  Returns gray (B, H, W)
        u8 whose selected tiles are bit-identical to the full kernel's
        output; unselected tiles are UNWRITTEN (garbage) — candidates
        outside the selection must be masked by the caller.
        """
        return self.selected_packed(self.pack(frames), sel)

    def selected_packed(self, packed: jax.Array, sel: jax.Array) -> jax.Array:
        """selected() on a pre-packed source (see pack())."""
        subs_flat = tuple(x for pair in self._subs for x in pair)
        return _fused_preproc_selected(
            packed, sel, self._table, self._yres0, self._lxres0, subs_flat,
            dims=self._dims, gamma=self.gamma, interpret=self.interpret,
        )


def _pack_frames(frames: jax.Array, dims: "_PlanDims") -> jax.Array:
    """Pack planar u8 frames into the kernel's channel-interleaved i32 form.

    Mosaic (jax 0.9) models u8/i8 HBM arrays with a byte-packed tiled
    layout whenever XLA chooses one (any nontrivial consumer graph), and
    the manual-DMA verifier then rejects the window copy ("shape
    mismatch", memref ...x4xi8).  Pack every 4 adjacent columns into one
    int32 lane ARITHMETICALLY (a bitcast would keep the old buffer and its
    layout): the result is a genuine 32-bit array with an unambiguous
    layout, well-typed as a DMA source in every calling context; the
    kernel unpacks the bytes in VMEM.
    Weight-then-pool, NOT reshape-then-sum: splitting the lane dim
    (w -> (w//4, 4)) relayouts the whole 4K frame (~1 ms/frame measured
    round 3 session 4).  Multiplying by the per-position byte weight
    256^(x%4) is elementwise on the natural layout, and the stride-4
    window sum is a native pooling op.  i32 wraparound is the intended
    bit pattern (packing IS mod 2^32), little-endian as before.
    The frame padding rides the reduce_window's INPUT padding (zero init
    value) so pack is a single fused pass — a separate i32 pad pass plus
    the old channel-interleave transpose measured ~0.45 ms/frame on the
    v5e (round 4): the layout stays CHANNEL-MAJOR (B, 3, Hp/8, 8, Wp/4)
    and the kernels issue one window DMA per channel instead.
    """
    assert dims.pad_x % 4 == 0  # byte positions survive the left pad
    if frames.ndim == 5:
        # Host-side PRE-PADDED form: the padded plan geometry in natural
        # row order is bit-identical to the packed 5-D array ((B, 3, Hp, Wp)
        # u8 row-major == (B, 3, Hp/8, 8, Wp/4) i32), so a host that writes
        # decoded frames into a zeroed padded buffer (see
        # PallasPreprocessor.host_pack — the same memcpy batch assembly
        # does anyway) hands the kernel its DMA source with ZERO device-side
        # work.  The jnp.pad of the view form below measured 0.46 ms/frame
        # at 4K (the pad pass + a non-free 4-D->5-D reshape relayout).
        assert frames.dtype == jnp.int32
        assert frames.shape[1:] == (
            3, dims.padded_h // ALIGN_Y, ALIGN_Y, dims.padded_w // 4
        ), (frames.shape, dims)
        return frames
    if frames.dtype == jnp.int32:
        # Host-side VIEW form: (B, 3, H, W//4) i32, the little-endian byte
        # reinterpret of the planar u8 frame (numpy ``frames.view(np.int32)``
        # — zero-cost on host).  The arithmetic pack below produces the
        # exact same bit pattern, so this branch only pads (one fused
        # ~50 MB/frame pass) instead of weight+pool over the full frame
        # (~0.9 ms/frame measured round 4).
        bsz, _, h, w4 = frames.shape
        assert (h, w4) == (dims.height, dims.width // 4), (frames.shape, dims)
        packed = jnp.pad(
            frames,
            ((0, 0), (0, 0), (dims.pad_y, dims.padded_h - h - dims.pad_y),
             (dims.pad_x // 4, (dims.padded_w - dims.pad_x) // 4 - w4)),
        )
        return packed.reshape(
            bsz, 3, dims.padded_h // ALIGN_Y, ALIGN_Y, dims.padded_w // 4
        )
    bsz, _, h, w = frames.shape
    byte_w = jnp.left_shift(
        jnp.int32(1), 8 * (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, w), 3) % 4)
    )
    weighted = frames.astype(jnp.int32) * byte_w
    packed = jax.lax.reduce_window(
        weighted, jnp.int32(0), jax.lax.add, (1, 1, 1, 4), (1, 1, 1, 4),
        padding=((0, 0), (0, 0), (dims.pad_y, dims.padded_h - h - dims.pad_y),
                 (dims.pad_x, dims.padded_w - w - dims.pad_x)),
    )
    return packed.reshape(
        bsz, 3, dims.padded_h // ALIGN_Y, ALIGN_Y, dims.padded_w // 4
    )


@functools.partial(jax.jit, static_argnames=("dims", "gamma", "interpret", "want_rgb", "debug_mode",
                                              "frames_per_step"))
def _fused_preproc(frames, table, yres0, lxres0, subs_flat,
                   *, dims: _PlanDims, gamma: float, interpret: bool, want_rgb: bool = True,
                   debug_mode: str = "full", frames_per_step: int = 1):
    if frames.ndim not in (4, 5) or frames.shape[1] != 3:
        raise ValueError(
            "expected planar (B, 3, H, W) uint8 frames, an (B, 3, H, W//4) int32 "
            f"byte view, or the pre-padded 5-D int32 form from host_pack; got {frames.shape}"
        )
    if frames.ndim == 4:
        want_w = dims.width // 4 if frames.dtype == jnp.int32 else dims.width
        assert frames.shape[2:] == (dims.height, want_w), (frames.shape, dims.height, want_w)
    padded = _pack_frames(frames, dims)
    return _fused_preproc_packed_impl(
        padded, table, yres0, lxres0, subs_flat, dims=dims, gamma=gamma,
        interpret=interpret, want_rgb=want_rgb, debug_mode=debug_mode,
        frames_per_step=frames_per_step,
    )


@functools.partial(jax.jit, static_argnames=("dims", "gamma", "interpret", "want_rgb", "debug_mode",
                                              "frames_per_step"))
def _fused_preproc_packed(padded, table, yres0, lxres0, subs_flat,
                          *, dims: _PlanDims, gamma: float, interpret: bool, want_rgb: bool = True,
                          debug_mode: str = "full", frames_per_step: int = 1):
    """_fused_preproc on an already-packed source (see _pack_frames)."""
    return _fused_preproc_packed_impl(
        padded, table, yres0, lxres0, subs_flat, dims=dims, gamma=gamma,
        interpret=interpret, want_rgb=want_rgb, debug_mode=debug_mode,
        frames_per_step=frames_per_step,
    )


def _fused_preproc_packed_impl(padded, table, yres0, lxres0, subs_flat,
                               *, dims: _PlanDims, gamma: float, interpret: bool, want_rgb: bool,
                               debug_mode: str, frames_per_step: int):
    assert padded.shape[1:] == (3, dims.padded_h // ALIGN_Y, ALIGN_Y, dims.padded_w // 4), padded.shape
    bsz = padded.shape[0]
    h, w = dims.height, dims.width
    th, tw = dims.th, dims.tw
    nty, ntx = h // th, w // tw
    # Frames per grid step: falls back to 1 when the batch does not divide.
    fsteps = frames_per_step if frames_per_step > 0 and bsz % frames_per_step == 0 else 1
    kernel = _make_kernel(dims, gamma, want_rgb, debug_mode, fsteps)
    nb = len(dims.bucket_dy)
    rec = _REC_FIXED + nb - 1
    max_chunks = dims.rh // CHUNK_ROWS

    def sub_idx(bi):
        def f(i, j, b, tab):
            return (jnp.maximum(tab[(i * ntx + j) * rec + _REC_FIXED + bi - 1], 0), 0, 0)
        return f

    sub_specs = []
    for bi in range(1, nb):
        sub_specs.append(pl.BlockSpec((1, th, dims.bucket_nat[bi]), sub_idx(bi)))
        sub_specs.append(pl.BlockSpec((1, th, tw), sub_idx(bi)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        # batch innermost: tile-keyed blocks (residual fields, rank tables)
        # stay resident across the batch instead of re-streaming per frame.
        grid=(nty, ntx, bsz // fsteps),
        in_specs=[
            pl.BlockSpec((1, 1, th, dims.bucket_nat[0]), lambda i, j, b, tab: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, th, tw), lambda i, j, b, tab: (i, j, 0, 0)),
            *sub_specs,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            (
                pl.BlockSpec((fsteps, 3, th, tw), lambda i, j, b, tab: (b, 0, i, j)),
                pl.BlockSpec((fsteps, th, tw), lambda i, j, b, tab: (b, i, j)),
            )
            if want_rgb
            else (pl.BlockSpec((fsteps, th, tw), lambda i, j, b, tab: (b, i, j)),)
        ),
        scratch_shapes=[
            pltpu.VMEM(
                # i32-packed window (4 source bytes per lane), channel-major
                # to mirror the source layout (one box DMA per channel).
                (2, fsteps, 3, dims.rh // ALIGN_Y, ALIGN_Y, dims.rw // 4),
                jnp.int32,
            ),
            pltpu.SemaphoreType.DMA((2, fsteps, max_chunks)),
        ],
    )
    out_shape = (
        (
            jax.ShapeDtypeStruct((bsz, 3, h, w), jnp.uint8),
            jax.ShapeDtypeStruct((bsz, h, w), jnp.uint8),
        )
        if want_rgb
        else (jax.ShapeDtypeStruct((bsz, h, w), jnp.uint8),)
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(table, yres0, lxres0, *subs_flat, padded)

    # Outputs are already in natural column order: the kernel reinterleaves
    # byte planes with a 0/1 permutation matmul before each store (the old
    # XLA-side full-frame unperm relayout measured 0.62 ms/frame).
    if want_rgb:
        return res[0], res[1]
    return None, res[0]


@functools.partial(jax.jit, static_argnames=("dims", "gamma", "interpret"))
def _fused_preproc_selected(packed, sel, table, yres0, lxres0, subs_flat,
                            *, dims: _PlanDims, gamma: float, interpret: bool):
    """Selected-tile second pass: gray for the tiles in ``sel`` only.

    packed: _pack_frames output (B, 3, Hp/8, 8, Wp/4) i32.  sel (B, T_sel)
    i32 tile ids; duplicates recompute the same tile (harmless — identical
    content); -1 entries are skipped.  See _make_kernel's t_sel docs.
    """
    h, w = dims.height, dims.width
    bsz = packed.shape[0]
    assert packed.shape[1:] == (3, dims.padded_h // ALIGN_Y, ALIGN_Y, dims.padded_w // 4), packed.shape
    assert sel.shape[0] == bsz, (sel.shape, bsz)
    t_sel = int(sel.shape[1])
    th, tw = dims.th, dims.tw
    padded = packed
    nty, ntx = h // th, w // tw
    kernel = _make_kernel(dims, gamma, want_rgb=False, fsteps=1, t_sel=t_sel)
    nb = len(dims.bucket_dy)
    rec = _REC_FIXED + nb - 1
    max_chunks = dims.rh // CHUNK_ROWS

    def tid(t, b, sel_r):
        return jnp.maximum(sel_r[b, t], 0)  # clamp padding (-1) for index math

    def sub_idx(bi):
        def f(t, b, tab, sel_r):
            return (jnp.maximum(tab[tid(t, b, sel_r) * rec + _REC_FIXED + bi - 1], 0), 0, 0)
        return f

    sub_specs = []
    for bi in range(1, nb):
        sub_specs.append(pl.BlockSpec((1, th, dims.bucket_nat[bi]), sub_idx(bi)))
        sub_specs.append(pl.BlockSpec((1, th, tw), sub_idx(bi)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_sel, bsz),
        in_specs=[
            pl.BlockSpec((1, 1, th, dims.bucket_nat[0]),
                         lambda t, b, tab, sel_r: (tid(t, b, sel_r) // ntx, jax.lax.rem(tid(t, b, sel_r), ntx), 0, 0)),
            pl.BlockSpec((1, 1, th, tw),
                         lambda t, b, tab, sel_r: (tid(t, b, sel_r) // ntx, jax.lax.rem(tid(t, b, sel_r), ntx), 0, 0)),
            *sub_specs,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            # Padding entries (sel < 0) write their (stale) out block to a
            # dedicated garbage tile row appended below the frame.
            pl.BlockSpec((1, th, tw),
                         lambda t, b, tab, sel_r: (
                             b,
                             jnp.where(sel_r[b, t] >= 0, tid(t, b, sel_r) // ntx, nty),
                             jnp.maximum(jax.lax.rem(tid(t, b, sel_r), ntx), 0),
                         )),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 1, 3, dims.rh // ALIGN_Y, ALIGN_Y, dims.rw // 4), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 1, max_chunks)),
        ],
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((bsz, h + th, w), jnp.uint8),),
        interpret=interpret,
    )(table, sel.astype(jnp.int32), yres0, lxres0, *subs_flat, padded)
    return res[0][:, :h]
