"""Batched undistort (bilinear remap) + LAB-gamma preprocessing in XLA.

The reference preprocesses every 4K frame on the CPU via OpenCV
(aruco_detect.py:250-259):

    frame = cv2.remap(frame, mapx, mapy, INTER_LINEAR)      # undistort
    lab   = cv2.cvtColor(frame, COLOR_RGB2LAB)
    lab[..., 0] = cv2.LUT(lab[..., 0], gamma_lut)           # gamma = 2
    frame = cv2.cvtColor(lab, COLOR_LAB2RGB)

Here the whole chain is one jitted, batched function over (B, H, W, 3)
uint8 frames.  The undistortion map is *computed on the fly* from the
camera parameters (pure per-pixel math, ~60 flops) instead of read from a
precomputed 66 MB float32 map — on TPU the HBM bandwidth saved far exceeds
the VPU flops spent, and XLA fuses the map math into the gather's index
computation.

Border semantics match cv2.remap's default BORDER_CONSTANT(0): samples
whose bilinear footprint falls outside the source get 0 contributions from
the out-of-bounds taps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from apse_uav_tpu.core import camera, colorspace

Array = jax.Array


def _gather_pixels(img: Array, yi: Array, xi: Array) -> Array:
    """Gather img[yi, xi] with zero padding for out-of-bounds indices.

    img: (H, W, C); yi/xi: (h, w) int32.  Returns (h, w, C) float32.
    """
    h_src, w_src = img.shape[0], img.shape[1]
    valid = (yi >= 0) & (yi < h_src) & (xi >= 0) & (xi < w_src)
    yc = jnp.clip(yi, 0, h_src - 1)
    xc = jnp.clip(xi, 0, w_src - 1)
    flat = img.reshape(h_src * w_src, -1)
    out = jnp.take(flat, yc * w_src + xc, axis=0)
    return jnp.where(valid[..., None], out.astype(jnp.float32), 0.0)


def bilinear_remap_u8(img: Array, map_xy: Array) -> Array:
    """cv2.remap(img, mapx, mapy, INTER_LINEAR) equivalent for uint8 images.

    Args:
      img: (H, W, C) or (H, W) uint8 source.
      map_xy: (Ho, Wo, 2) float32 source coordinates per output pixel.

    Returns:
      (Ho, Wo, C) / (Ho, Wo) uint8.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    x = map_xy[..., 0]
    y = map_xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    p00 = _gather_pixels(img, y0i, x0i)
    p01 = _gather_pixels(img, y0i, x0i + 1)
    p10 = _gather_pixels(img, y0i + 1, x0i)
    p11 = _gather_pixels(img, y0i + 1, x0i + 1)
    top = p00 * (1.0 - wx) + p01 * wx
    bot = p10 * (1.0 - wx) + p11 * wx
    out = top * (1.0 - wy) + bot * wy
    out = jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)
    return out[..., 0] if squeeze else out


@functools.partial(jax.jit, static_argnames=("gamma", "with_gray", "size_wh"))
def preprocess_frames(
    frames: Array,
    mtx: Array,
    dist: Array,
    size_wh: tuple[int, int],
    gamma: float = 2.0,
    with_gray: bool = True,
) -> tuple[Array, Array | None]:
    """Undistort + gamma-correct a batch of frames; optionally emit grayscale.

    Args:
      frames: (B, H, W, 3) uint8 in the reference's stored order (BGR from
        imread — the gamma chain applies COLOR_RGB2LAB semantics to the
        stored channels exactly like the reference does).
      mtx, dist: camera intrinsics / distortion.
      size_wh: (W, H) static frame size.
      gamma: gamma exponent for the L channel.
      with_gray: also return the COLOR_BGR2GRAY image used for detection.

    Returns:
      (frames_out, gray_or_None): (B, H, W, 3) uint8 and (B, H, W) uint8.
    """
    map_xy = camera.undistort_rectify_map(mtx, dist, size_wh)

    def one(frame):
        und = bilinear_remap_u8(frame, map_xy)
        out = colorspace.gamma_correct_u8(und, gamma=gamma)
        return out

    out = jax.vmap(one)(frames)
    gray = jax.vmap(colorspace.bgr_to_gray_u8)(out) if with_gray else None
    return out, gray


class Preprocessor:
    """Convenience wrapper binding camera params, mirroring preprocessFrame.

    Example:
        pre = Preprocessor.from_json("data/cam_params.json", (3840, 2160))
        frames_out, gray = pre(frames_u8)   # (B,H,W,3), (B,H,W)
    """

    def __init__(self, mtx, dist, size_wh: tuple[int, int], gamma: float = 2.0):
        self.mtx = jnp.asarray(mtx, dtype=jnp.float32)
        self.dist = jnp.asarray(dist, dtype=jnp.float32).reshape(-1)
        self.size_wh = tuple(size_wh)
        self.gamma = float(gamma)

    @classmethod
    def from_json(cls, path: str, size_wh: tuple[int, int], gamma: float = 2.0):
        mtx, dist = camera.load_camera_params(path)
        return cls(mtx, dist, size_wh, gamma)

    def __call__(self, frames: Array, with_gray: bool = True):
        if frames.ndim == 3:
            out, gray = preprocess_frames(
                frames[None], self.mtx, self.dist, self.size_wh, self.gamma, with_gray
            )
            return out[0], (None if gray is None else gray[0])
        return preprocess_frames(frames, self.mtx, self.dist, self.size_wh, self.gamma, with_gray)
