"""Rotation math in pure JAX: Rodrigues vectors, matrices, zxy Euler angles.

Replaces ``scipy.spatial.transform.Rotation`` as used by the reference
(aruco_detect.py:7,312,412 — ``R.from_rotvec(...).as_euler('zxy', degrees=True)``)
and cv2.Rodrigues inside projectPoints/solvePnP.

Conventions match scipy: lowercase ``'zxy'`` = extrinsic rotations about the
fixed z, then x, then y axes, i.e. ``R = Ry(c) @ Rx(b) @ Rz(a)`` for angles
``(a, b, c)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rodrigues_to_matrix(rvec: Array) -> Array:
    """Rotation vector (3,) -> rotation matrix (3, 3).

    Uses the Taylor-safe form so it is differentiable at ||rvec|| -> 0.
    """
    rvec = jnp.asarray(rvec).reshape(3)
    theta2 = jnp.dot(rvec, rvec)
    theta = jnp.sqrt(theta2 + 1e-30)
    # sin(t)/t and (1-cos(t))/t^2 with series fallbacks near zero.
    small = theta2 < 1e-12
    sinc = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    cosc = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    x, y, z = rvec
    k = jnp.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]], dtype=rvec.dtype)
    # HIGHEST precision: geometry matmuls must not go through bf16 MXU passes.
    kk = jnp.matmul(k, k, precision=jax.lax.Precision.HIGHEST)
    return jnp.eye(3, dtype=rvec.dtype) + sinc * k + cosc * kk


def matrix_to_rodrigues(r_mat: Array) -> Array:
    """Rotation matrix (3, 3) -> rotation vector (3,). cv2.Rodrigues inverse."""
    r_mat = jnp.asarray(r_mat)
    trace = jnp.clip(jnp.trace(r_mat), -1.0, 3.0)
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # Antisymmetric part encodes axis * sin(theta).
    axis_sin = 0.5 * jnp.array(
        [r_mat[2, 1] - r_mat[1, 2], r_mat[0, 2] - r_mat[2, 0], r_mat[1, 0] - r_mat[0, 1]]
    )
    sin_t = jnp.sin(theta)

    def generic():
        return axis_sin * (theta / jnp.where(jnp.abs(sin_t) < 1e-12, 1.0, sin_t))

    def near_pi():
        # theta ~ pi: axis from diagonal of (R + I)/2 = aa^T.
        diag = jnp.clip((jnp.diag(r_mat) + 1.0) * 0.5, 0.0, None)
        axis = jnp.sqrt(diag)
        # Fix signs from off-diagonal terms, anchored on the largest component.
        i = jnp.argmax(axis)
        signs_by_anchor = jnp.stack(
            [
                jnp.array([1.0, jnp.sign(r_mat[0, 1]), jnp.sign(r_mat[0, 2])]),
                jnp.array([jnp.sign(r_mat[0, 1]), 1.0, jnp.sign(r_mat[1, 2])]),
                jnp.array([jnp.sign(r_mat[0, 2]), jnp.sign(r_mat[1, 2]), 1.0]),
            ]
        )
        signs = signs_by_anchor[i]
        signs = jnp.where(signs == 0.0, 1.0, signs)
        return axis * signs * theta

    small = theta < 1e-7
    return jax.lax.cond(
        small,
        lambda: axis_sin,  # theta/sin(theta) -> 1
        lambda: jax.lax.cond(jnp.abs(sin_t) < 1e-6, near_pi, generic),
    )


def matrix_to_euler_zxy(r_mat: Array, degrees: bool = True) -> Array:
    """scipy ``Rotation.as_euler('zxy')`` equivalent (extrinsic z-x-y).

    With R = Ry(c) @ Rx(b) @ Rz(a):
        R[2,1] =  sin(b)
        R[0,1] = -cos(b) sin(a),  R[1,1] = cos(b) cos(a)
        R[2,0] = -cos(b) sin(c)?  -- derived below; gimbal lock at |b| = pi/2.
    """
    r_mat = jnp.asarray(r_mat)
    # R = Ry(c) Rx(b) Rz(a):
    #   R[2,1] = sin(b) * ... — derive: Rx(b)Rz(a) =
    #     [ ca      -sa      0  ]
    #     [ cb sa    cb ca  -sb ]
    #     [ sb sa    sb ca   cb ]
    #   Ry(c) @ that:
    #     row2 = [-sc*ca + cc*sb*sa, sc*sa + cc*sb*ca, cc*cb]
    #     R[1,:] = [cb sa, cb ca, -sb]
    sb = -r_mat[1, 2]
    b = jnp.arcsin(jnp.clip(sb, -1.0, 1.0))
    gimbal = jnp.abs(sb) > 1.0 - 1e-9

    def regular():
        a = jnp.arctan2(r_mat[1, 0], r_mat[1, 1])
        c = jnp.arctan2(r_mat[0, 2], r_mat[2, 2])
        return a, c

    def locked():
        # Only a +/- c observable; scipy sets the first angle and zeroes the third.
        a = jnp.arctan2(-r_mat[0, 1], r_mat[0, 0])
        return a, jnp.zeros_like(a)

    a, c = jax.lax.cond(gimbal, locked, regular)
    angles = jnp.stack([a, b, c])
    return jnp.degrees(angles) if degrees else angles


def rotvec_to_euler_zxy(rvec: Array, degrees: bool = True) -> Array:
    return matrix_to_euler_zxy(rodrigues_to_matrix(rvec), degrees=degrees)
