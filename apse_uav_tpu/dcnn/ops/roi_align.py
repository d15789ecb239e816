"""ROIAlign / ROIPool as vmapped bilinear gathers — static shapes, no CUDA.

Replaces ``torchvision.ops.roi_align`` / ``roi_pool`` (reference:
dcnn/engines/rcnn_tracker.py:180-182, roi_features_generator.py:111-113) and
detectron2's ROIPooler inside the ROI heads.  Semantics follow torchvision:

* ``roi_align``: each output bin averages ``sampling_ratio**2`` bilinear
  samples on a regular grid inside the bin.  ``aligned=True`` shifts by half a
  pixel (detectron2 "ROIAlignV2").  torchvision's adaptive
  ``sampling_ratio<=0`` (ceil of bin size) is data-dependent and cannot be a
  static shape — callers pass an explicit ratio (2 matches the FPN regime
  where roi/output ratios are in [1, 2]).
* ``roi_pool``: quantized max-pool, exact torchvision semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _bilinear_gather_hwc(feat_hwc: Array, ys: Array, xs: Array, plane: Array | None = None) -> Array:
    """feat (H, W, C); ys/xs (S,) sample coords -> (S, C).

    Channels-last row gathers: each sampled index fetches one CONTIGUOUS
    C-vector — the channels-first layout would stride across the whole map
    per channel and is an order of magnitude slower on TPU.

    torchvision border behavior: samples with y or x in [-1, H/W] are clamped
    to the border; samples outside that band return 0.

    ``plane`` (H, W), if given, modulates the features texel-wise: the result
    equals sampling ``feat * plane[..., None]`` — bilinear interpolation is
    linear per-texel, so gathering the 1-channel plane at the same indices
    and multiplying before the weighted combine is exact, without ever
    materializing the (H, W, C) product.  This is how mask-cropped ROI
    features (rcnn_tracker.py:156-189) avoid a per-detection full-map copy.
    """
    h, w, c = feat_hwc.shape
    out_of_range = (ys < -1.0) | (ys > h * 1.0) | (xs < -1.0) | (xs > w * 1.0)
    y = jnp.clip(ys, 0.0, h - 1.0)
    x = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, h - 1.0)
    x1 = jnp.minimum(x0 + 1, w - 1.0)
    ly = y - y0
    lx = x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)
    x1i = x1.astype(jnp.int32)
    flat = feat_hwc.reshape(h * w, c)
    i00 = y0i * w + x0i
    i01 = y0i * w + x1i
    i10 = y1i * w + x0i
    i11 = y1i * w + x1i
    p00 = jnp.take(flat, i00, axis=0)
    p01 = jnp.take(flat, i01, axis=0)
    p10 = jnp.take(flat, i10, axis=0)
    p11 = jnp.take(flat, i11, axis=0)
    w00 = (1 - ly) * (1 - lx)
    w01 = (1 - ly) * lx
    w10 = ly * (1 - lx)
    w11 = ly * lx
    if plane is not None:
        pf = plane.reshape(-1)
        w00 = w00 * jnp.take(pf, i00)
        w01 = w01 * jnp.take(pf, i01)
        w10 = w10 * jnp.take(pf, i10)
        w11 = w11 * jnp.take(pf, i11)
    val = p00 * w00[:, None] + p01 * w01[:, None] + p10 * w10[:, None] + p11 * w11[:, None]
    return jnp.where(out_of_range[:, None], 0.0, val)


@functools.partial(
    jax.jit, static_argnames=("output_size", "spatial_scale", "sampling_ratio", "aligned")
)
def roi_align_hwc(
    feat_hwc: Array,
    boxes: Array,
    output_size: int | tuple[int, int],
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = False,
    plane: Array | None = None,
) -> Array:
    """feat (H, W, C), boxes (N, 4) xyxy in image coords -> (N, C, oh, ow).

    ``plane`` (H, W) optionally modulates the features texel-wise (exactly
    ``roi_align(feat * plane[..., None])`` — see :func:`_bilinear_gather_hwc`).
    """
    if isinstance(output_size, int):
        oh = ow = output_size
    else:
        oh, ow = output_size
    s = max(int(sampling_ratio), 1)
    offset = 0.5 if aligned else 0.0
    c = feat_hwc.shape[-1]

    def one(box):
        x1 = box[0] * spatial_scale - offset
        y1 = box[1] * spatial_scale - offset
        x2 = box[2] * spatial_scale - offset
        y2 = box[3] * spatial_scale - offset
        rw = x2 - x1
        rh = y2 - y1
        if not aligned:  # torchvision legacy: rois have min size 1
            rw = jnp.maximum(rw, 1.0)
            rh = jnp.maximum(rh, 1.0)
        bin_h = rh / oh
        bin_w = rw / ow
        # Sample grid: bin (i, j), sample (a, b) at
        #   y = y1 + (i + (a + .5)/s) * bin_h
        iy = jnp.arange(oh)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s  # (oh, s)
        ix = jnp.arange(ow)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s
        ys = (y1 + iy * bin_h).reshape(-1)  # (oh*s,)
        xs = (x1 + ix * bin_w).reshape(-1)  # (ow*s,)
        yy = jnp.repeat(ys, ow * s)  # (oh*s*ow*s,)
        xx = jnp.tile(xs, oh * s)
        vals = _bilinear_gather_hwc(feat_hwc, yy, xx, plane)  # (S, C)
        vals = vals.reshape(oh, s, ow, s, c).mean(axis=(1, 3))  # (oh, ow, C)
        return jnp.transpose(vals, (2, 0, 1))  # (C, oh, ow)

    return jax.vmap(one)(boxes)


@functools.partial(
    jax.jit, static_argnames=("output_size", "spatial_scale", "sampling_ratio", "aligned")
)
def roi_align(
    feat: Array,
    boxes: Array,
    output_size: int | tuple[int, int],
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = False,
) -> Array:
    """feat (C, H, W), boxes (N, 4) xyxy in image coords -> (N, C, oh, ow).

    torchvision-layout wrapper over :func:`roi_align_hwc` (one transpose)."""
    return roi_align_hwc(
        jnp.transpose(feat, (1, 2, 0)), boxes, output_size, spatial_scale, sampling_ratio, aligned
    )


@functools.partial(jax.jit, static_argnames=("output_size", "spatial_scale"))
def roi_pool(
    feat: Array,
    boxes: Array,
    output_size: int | tuple[int, int],
    spatial_scale: float = 1.0,
) -> Array:
    """Quantized max ROI pooling (torchvision roi_pool semantics).

    feat (C, H, W), boxes (N, 4) -> (N, C, oh, ow).  Implemented with a
    fixed per-bin sample budget: bins are snapped to integer grids like
    torchvision, then each bin max-reduces over a static KxK lattice of
    nearest-neighbor taps covering the bin (K chosen from feature size).
    """
    if isinstance(output_size, int):
        oh = ow = output_size
    else:
        oh, ow = output_size
    c, h, w = feat.shape
    # Static per-bin tap budget: a bin spans at most ceil(max_roi/oh)+1 cells;
    # cap by the feature map itself.
    kh = min(h, 16)
    kw = min(w, 16)

    def one(box):
        x1 = jnp.round(box[0] * spatial_scale)
        y1 = jnp.round(box[1] * spatial_scale)
        x2 = jnp.round(box[2] * spatial_scale)
        y2 = jnp.round(box[3] * spatial_scale)
        rw = jnp.maximum(x2 - x1 + 1, 1.0)
        rh = jnp.maximum(y2 - y1 + 1, 1.0)
        bin_h = rh / oh
        bin_w = rw / ow

        def bin_val(i, j):
            # Epsilon-stabilized quantization: f32 products like 7 * (11/7)
            # straddle exact integers depending on how the compiler
            # reassociates them, which would move a whole tap column in or
            # out of the bin.  Snap to the mathematically exact edge (may
            # differ from torchvision by one boundary tap in such ties).
            eps = 1e-4
            hstart = jnp.floor(i * bin_h + eps) + y1
            hend = jnp.ceil((i + 1) * bin_h - eps) + y1
            wstart = jnp.floor(j * bin_w + eps) + x1
            wend = jnp.ceil((j + 1) * bin_w - eps) + x1
            hstart = jnp.clip(hstart, 0, h)
            hend = jnp.clip(hend, 0, h)
            wstart = jnp.clip(wstart, 0, w)
            wend = jnp.clip(wend, 0, w)
            ys = hstart + jnp.arange(kh)
            xs = wstart + jnp.arange(kw)
            vy = ys < hend
            vx = xs < wend
            ysc = jnp.clip(ys, 0, h - 1).astype(jnp.int32)
            xsc = jnp.clip(xs, 0, w - 1).astype(jnp.int32)
            sub = feat[:, ysc][:, :, xsc]  # (C, kh, kw)
            mask = (vy[:, None] & vx[None, :])[None]
            empty = (hend <= hstart) | (wend <= wstart)
            val = jnp.max(jnp.where(mask, sub, -jnp.inf), axis=(1, 2))
            return jnp.where(empty, 0.0, val)

        ii, jj = jnp.meshgrid(jnp.arange(oh), jnp.arange(ow), indexing="ij")
        vals = jax.vmap(jax.vmap(bin_val))(ii.astype(jnp.float32), jj.astype(jnp.float32))
        return jnp.transpose(vals, (2, 0, 1))  # (C, oh, ow)

    return jax.vmap(one)(boxes)
