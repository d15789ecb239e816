"""Pinhole camera model with OpenCV's 14-coefficient distortion, in pure JAX.

Replaces the OpenCV C++ calls the reference pipeline bottoms out in
(reference: aruco_detect.py:92-103 reads ``cam_params.json``;
cv2.projectPoints at aruco_detect.py:344,377,424,468; cv2.initUndistortRectifyMap
at aruco_detect.py:568; cv2.undistort in dcnn/scripts/tests/visualize_uav.py:62).

The distortion vector follows OpenCV ordering::

    (k1, k2, p1, p2, k3, k4, k5, k6, s1, s2, s3, s4, tau_x, tau_y)

with the rational radial model (k1..k6), tangential (p1, p2), thin-prism
(s1..s4) and tilt (tau_x, tau_y) terms.  Shorter vectors are zero-padded.

Everything here is pure, static-shape JAX math: ``jit``/``vmap`` friendly and
differentiable (the PnP solver in ``apse_uav_tpu.aruco.pose`` uses
``jax.jacfwd`` through :func:`project_points`).
"""

from __future__ import annotations

import json
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from apse_uav_tpu.core import rotation as rot

Array = jax.Array

_N_DIST = 14


def pad_dist_coeffs(dist: Any) -> jnp.ndarray:
    """Flatten + zero-pad a distortion coefficient vector to 14 entries."""
    d = jnp.asarray(dist, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32).reshape(-1)
    if d.shape[0] > _N_DIST:
        raise ValueError(f"at most {_N_DIST} distortion coefficients supported, got {d.shape[0]}")
    return jnp.concatenate([d, jnp.zeros(_N_DIST - d.shape[0], d.dtype)])


def load_camera_params(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read ``{"mtx": 3x3, "dist": Nx1}`` JSON (reference cam_params.json format)."""
    with open(path, "r") as f:
        params = json.load(f)
    mtx = np.asarray(params["mtx"], dtype=np.float64)
    dist = np.asarray(params["dist"], dtype=np.float64).reshape(-1)
    return mtx, dist


def _tilt_matrix(tau_x: Array, tau_y: Array) -> Array:
    """OpenCV tilted-sensor (Scheimpflug) projection matrix.

    Identity when tau_x == tau_y == 0 (true for the reference camera).
    """
    cx, sx = jnp.cos(tau_x), jnp.sin(tau_x)
    cy, sy = jnp.cos(tau_y), jnp.sin(tau_y)
    # R = Ry(tau_y) @ Rx(tau_x) per OpenCV computeTiltProjectionMatrix.
    r = jnp.array(
        [
            [cy, sy * sx, -sy * cx],
            [jnp.zeros_like(cx), cx, sx],
            [sy, -cy * sx, cy * cx],
        ]
    )
    # Projective scaling so the principal ray stays fixed.
    proj = jnp.array(
        [
            [r[2, 2], jnp.zeros_like(cx), -r[0, 2]],
            [jnp.zeros_like(cx), r[2, 2], -r[1, 2]],
            [jnp.zeros_like(cx), jnp.zeros_like(cx), jnp.ones_like(cx)],
        ]
    )
    return proj @ r.T


def distort_normalized(xy: Array, dist: Array) -> Array:
    """Apply the full 14-coefficient distortion to normalized coords.

    Args:
      xy: (..., 2) ideal (undistorted) normalized image coordinates.
      dist: (14,) distortion coefficients.

    Returns:
      (..., 2) distorted normalized coordinates.
    """
    k1, k2, p1, p2, k3, k4, k5, k6, s1, s2, s3, s4, tx, ty = [dist[i] for i in range(_N_DIST)]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    num = 1.0 + k1 * r2 + k2 * r4 + k3 * r6
    den = 1.0 + k4 * r2 + k5 * r4 + k6 * r6
    radial = num / den
    xy2 = 2.0 * x * y
    xd = x * radial + p1 * xy2 + p2 * (r2 + 2.0 * x * x) + s1 * r2 + s2 * r4
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + p2 * xy2 + s3 * r2 + s4 * r4

    def with_tilt(args):
        xd_, yd_ = args
        m = _tilt_matrix(tx, ty)
        w = m[2, 0] * xd_ + m[2, 1] * yd_ + m[2, 2]
        xt = (m[0, 0] * xd_ + m[0, 1] * yd_ + m[0, 2]) / w
        yt = (m[1, 0] * xd_ + m[1, 1] * yd_ + m[1, 2]) / w
        return xt, yt

    # Tilt is rare; skip the matrix math entirely when both taus are zero so
    # the common path stays cheap inside fused kernels.
    xd, yd = jax.lax.cond(
        jnp.logical_or(tx != 0.0, ty != 0.0), with_tilt, lambda a: a, (xd, yd)
    )
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(xy_dist: Array, dist: Array, num_iters: int = 5) -> Array:
    """Invert :func:`distort_normalized` by fixed-point iteration.

    Mirrors cv::undistortPoints' compensation loop. OpenCV runs exactly 5
    iterations by default and we default to the same: for points outside the
    lens model's invertible domain the iteration diverges, so "more" is not
    "better" — parity requires the same stopping point.
    """
    k1, k2, p1, p2, k3, k4, k5, k6, s1, s2, s3, s4, tx, ty = [dist[i] for i in range(_N_DIST)]

    def inv_tilt(xyd):
        def apply(args):
            m = jnp.linalg.inv(_tilt_matrix(tx, ty))
            x, y = args[..., 0], args[..., 1]
            w = m[2, 0] * x + m[2, 1] * y + m[2, 2]
            return jnp.stack(
                [
                    (m[0, 0] * x + m[0, 1] * y + m[0, 2]) / w,
                    (m[1, 0] * x + m[1, 1] * y + m[1, 2]) / w,
                ],
                axis=-1,
            )

        return jax.lax.cond(jnp.logical_or(tx != 0.0, ty != 0.0), apply, lambda a: a, xyd)

    xy0 = inv_tilt(xy_dist)

    def body(_, xy):
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        r4 = r2 * r2
        r6 = r4 * r2
        # icdist = inverse radial factor evaluated at the current estimate.
        icdist = (1.0 + k4 * r2 + k5 * r4 + k6 * r6) / (1.0 + k1 * r2 + k2 * r4 + k3 * r6)
        xy2 = 2.0 * x * y
        dx = p1 * xy2 + p2 * (r2 + 2.0 * x * x) + s1 * r2 + s2 * r4
        dy = p1 * (r2 + 2.0 * y * y) + p2 * xy2 + s3 * r2 + s4 * r4
        x_new = (xy0[..., 0] - dx) * icdist
        y_new = (xy0[..., 1] - dy) * icdist
        return jnp.stack([x_new, y_new], axis=-1)

    # Unrolled: num_iters is always a small static constant (cv2 runs 5) and
    # a rolled fori_loop lowers to a serial while chain of tiny kernels —
    # pure dispatch latency inside the vmapped pose solver.  Unrolling lets
    # XLA fuse the whole fixed-point chain into one elementwise kernel.
    xy = xy0
    for i in range(num_iters):
        xy = body(i, xy)
    return xy


def pixels_to_normalized(uv: Array, mtx: Array) -> Array:
    """Pixel coords -> ideal normalized coords (no distortion handling)."""
    fx, fy = mtx[0, 0], mtx[1, 1]
    cx, cy = mtx[0, 2], mtx[1, 2]
    return jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)


def normalized_to_pixels(xy: Array, mtx: Array) -> Array:
    fx, fy = mtx[0, 0], mtx[1, 1]
    cx, cy = mtx[0, 2], mtx[1, 2]
    return jnp.stack([xy[..., 0] * fx + cx, xy[..., 1] * fy + cy], axis=-1)


def undistort_points(uv: Array, mtx: Array, dist: Array, num_iters: int = 5) -> Array:
    """cv2.undistortPoints equivalent: distorted pixels -> ideal normalized."""
    return undistort_normalized(pixels_to_normalized(uv, mtx), pad_dist_coeffs(dist), num_iters)


def project_points(obj_pts: Array, rvec: Array, tvec: Array, mtx: Array, dist: Array) -> Array:
    """cv2.projectPoints equivalent (reference aruco_detect.py:344,377,424,468).

    Args:
      obj_pts: (N, 3) object-space points.
      rvec: (3,) Rodrigues rotation vector.
      tvec: (3,) translation.
      mtx: (3, 3) intrinsics.
      dist: distortion coefficients (any length <= 14).

    Returns:
      (N, 2) pixel coordinates.
    """
    r_mat = rot.rodrigues_to_matrix(rvec)
    # HIGHEST precision: geometry matmuls must not go through bf16 MXU passes.
    cam = jnp.matmul(obj_pts, r_mat.T, precision=jax.lax.Precision.HIGHEST) + tvec
    xy = cam[..., :2] / cam[..., 2:3]
    xyd = distort_normalized(xy, pad_dist_coeffs(dist))
    return normalized_to_pixels(xyd, mtx)


def undistort_rectify_map(
    mtx: Array,
    dist: Array,
    size_wh: tuple[int, int],
    new_mtx: Array | None = None,
) -> Array:
    """cv2.initUndistortRectifyMap equivalent (reference aruco_detect.py:568).

    For every *destination* (undistorted) pixel, computes the *source*
    (distorted) pixel it should sample from.

    Returns:
      (H, W, 2) float32 map of source (x, y) pixel coordinates.
    """
    w, h = size_wh
    if new_mtx is None:
        new_mtx = mtx
    u = jnp.arange(w, dtype=jnp.float32)
    v = jnp.arange(h, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)  # (H, W)
    xy = pixels_to_normalized(jnp.stack([uu, vv], axis=-1), new_mtx)
    xyd = distort_normalized(xy, pad_dist_coeffs(dist))
    return normalized_to_pixels(xyd, mtx).astype(jnp.float32)
