"""Marker measurement math from the reference algorithm, in pure JAX.

Every function cites the aruco_detect.py lines it reproduces.  Quantization
quirks of the original (int() truncations before divisions, np.int32 casts of
projected points) are preserved deliberately — distances scale by
marker-size-in-pixels, so parity requires bit-level faithfulness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from apse_uav_tpu.core import camera, rotation

Array = jax.Array

# Algorithm constants (aruco_detect.py:519-549).
MARKER_LENGTH_ORG = 0.55
MARKER_DIV = 1.2
DIV = 1.013
FRAME_W, FRAME_H = 3840, 2160

# Host vehicle's Lidar wrt marker (aruco_detect.py:543).
VEH4_LIDAR = jnp.array([[-0.05, -0.80, 0.0]])
# Vehicle centroids wrt markers (:546-549); order veh1, veh2, veh3, veh4.
VEH_COORDS = jnp.array([[0.0, 0.42, 0.0], [0.0, 0.59, 0.0], [0.0, 0.58, 0.0], [0.0, 0.07, 0.0]])
# Vehicle dims [back, front, left, right] (:583-586); order veh1..veh3, veh4.
VEH_DIMS = jnp.array(
    [
        [-1.95, 2.8, -0.9, 0.9],
        [-1.68, 2.86, -0.87, 0.87],
        [-1.32, 2.48, -0.86, 0.86],
        [-2.35, 2.49, -0.86, 0.86],
    ]
)

# LED panel points wrt host marker (aruco_detect.py:340-344).
LED_POINTS = jnp.array(
    [
        [-0.419, -0.42, 0.0], [-0.414, -0.305, 0.0], [-0.409, -0.19, 0.0],
        [-0.404, -0.07, 0.0], [-0.399, 0.065, 0.0], [-0.393, 0.19, 0.0],
        [-0.388, 0.315, 0.0], [-0.382, 0.435, 0.0],
    ]
)


def _trunc(x: Array) -> Array:
    """C-style int() truncation toward zero."""
    return jnp.trunc(x)


def marker_center_and_size(corners: Array):
    """getMarkerData's centre/size math (aruco_detect.py:271-288).

    corners: (4, 2) x,y.  Returns (cx, cy, msp).  The reference computes
    cx = int(sum of 4 x-coords) / 4 — truncation of the SUM, then float
    division (quantizing centres to 1/4 px); abs() applied afterwards.
    """
    sx = jnp.sum(corners[:, 0])
    sy = jnp.sum(corners[:, 1])
    cx = jnp.abs(_trunc(sx) / 4.0)
    cy = jnp.abs(_trunc(sy) / 4.0)
    sides = jnp.linalg.norm(corners - jnp.roll(corners, -1, axis=0), axis=1)
    msp = jnp.mean(sides)
    return cx, cy, msp


def displacement_metres(cx, cy, cx_prev, cy_prev, marker_length, msp):
    """Inter-frame displacement in metres (aruco_detect.py:282-286)."""
    return jnp.sqrt((cx_prev - cx) ** 2 + (cy_prev - cy) ** 2) * marker_length / msp


def marker_length_correction(altitude: Array) -> Array:
    """aruco_detect.py:306-308."""
    return MARKER_LENGTH_ORG * (1.0 - 0.00057 * altitude / MARKER_DIV) / DIV


def average_marker_size(msp_ring: Array, msp: Array):
    """calculateAverageMarkerSize (aruco_detect.py:290-304) on a ring buffer.

    msp_ring: (N_avg,) previous sizes; returns (new_ring, size_corr, msp_avg).
    """
    new_ring = jnp.concatenate([msp_ring[1:], msp[None]])
    nonzero = jnp.maximum(jnp.sum(new_ring != 0.0), 1)
    size_corr = jnp.sum(new_ring) / (msp * nonzero)
    return new_ring, size_corr, msp * size_corr


def project_int(points: Array, rvec: Array, tvec: Array, mtx: Array, dist: Array,
                bias_xy: tuple[float, float] = (0.0, 0.0)) -> Array:
    """projectPoints + np.maximum(0, np.int32(...)) (aruco_detect.py:344-345
    and 375-404): truncation toward zero then clamping at 0.

    ``bias_xy`` is added to the float projection before truncation (cv2
    corner-bias compatibility — see pipeline._led_value)."""
    proj = camera.project_points(points, rvec, tvec, mtx, dist)
    if bias_xy != (0.0, 0.0):
        proj = proj + jnp.asarray(bias_xy, proj.dtype)
    return jnp.maximum(0.0, _trunc(proj))


def bbox_dims_update(tvec: Array, rvec: Array, veh_dim: Array):
    """drawBoundingBox's perspective dim modification (aruco_detect.py:406-428).

    Returns the modified veh_dim (the reference mutates and returns it; the
    drawn contour itself is presentation-only).
    """
    alpha_h = jnp.arctan(tvec[0] / tvec[2])
    alpha_v = jnp.arctan(tvec[1] / tvec[2])
    yaw_deg = rotation.rotvec_to_euler_zxy(rvec, degrees=True)[0]
    # round(yaw, 2) then sign test — rounding can't flip the sign test except
    # exactly at 0, where round(0., 2) == 0 is not < 0 either way.
    yaw = jnp.round(yaw_deg * 100.0) / 100.0
    alpha_h = jnp.where(yaw < 0, alpha_h, -alpha_h)
    alpha_v = jnp.where(yaw < 0, alpha_v, -alpha_v)
    return veh_dim * jnp.array([1.0, 1.0, 1.0, 1.0]) * jnp.stack(
        [1 - alpha_h / 2.0, 1 + alpha_h / 2.0, 1 - alpha_v / 2.0, 1 + alpha_v / 2.0]
    )


def bbox_perimeter_points(veh_dim: Array) -> Array:
    """generatePointsBoundingBox (aruco_detect.py:433-464): (56, 3) object pts.

    Output columns follow the reference's swap: [:,0] = width coord,
    [:,1] = length coord, [:,2] = 0.
    """
    points_l, points_w = 20, 8
    o1 = jnp.linspace(veh_dim[0], veh_dim[1], points_l)
    o2 = jnp.linspace(veh_dim[2], veh_dim[3], points_w)
    obj1 = jnp.stack([o1, jnp.full((points_l,), veh_dim[2])], axis=1)
    obj2 = jnp.stack([o1, jnp.full((points_l,), veh_dim[3])], axis=1)
    obj3 = jnp.stack([jnp.full((points_w,), veh_dim[0]), o2], axis=1)
    obj4 = jnp.stack([jnp.full((points_w,), veh_dim[1]), o2], axis=1)
    obj = jnp.concatenate([obj1, obj2, obj3, obj4])  # (56, 2) [len, wid]
    return jnp.stack([obj[:, 1], obj[:, 0], jnp.zeros(56)], axis=1)


def min_distance_bbox_point(source_xy: Array, bbox_pts: Array, rvec, tvec, mtx, dist):
    """findMinimumDistanceBoundingBox (aruco_detect.py:466-481): the projected
    (int-truncated) bbox point closest to source (x, y)."""
    imgpts = project_int(bbox_pts, rvec, tvec, mtx, dist)  # (56, 2)
    d = jnp.sqrt(jnp.sum((imgpts - source_xy[None, :]) ** 2, axis=1))
    i = jnp.argmin(d)
    return imgpts[i]


def pixel_distance_to_metres(src_xy, dst_xy, marker_length, msp4, msp):
    """calculateDistance (aruco_detect.py:483-492)."""
    d = jnp.sqrt(jnp.sum((src_xy - dst_xy) ** 2))
    return d * marker_length / ((msp4 + msp) / 2.0)
