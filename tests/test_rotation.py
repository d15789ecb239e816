"""Golden tests: rotation math vs scipy / OpenCV Rodrigues."""

import cv2
import numpy as np
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from apse_uav_tpu.core import rotation as rot

RNG = np.random.default_rng(1)


def test_rodrigues_to_matrix_matches_cv2():
    for _ in range(20):
        rvec = RNG.uniform(-np.pi, np.pi, size=3)
        ref, _ = cv2.Rodrigues(rvec)
        got = np.asarray(rot.rodrigues_to_matrix(jnp.asarray(rvec)))
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_rodrigues_small_angle():
    rvec = np.array([1e-9, -2e-9, 3e-10])
    got = np.asarray(rot.rodrigues_to_matrix(jnp.asarray(rvec)))
    ref, _ = cv2.Rodrigues(rvec)
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_matrix_to_rodrigues_roundtrip():
    for _ in range(20):
        # Keep ||rvec|| < pi so the canonical representative is the input.
        axis = RNG.normal(size=3)
        axis /= np.linalg.norm(axis)
        rvec = axis * RNG.uniform(1e-3, np.pi * 0.98)
        m = rot.rodrigues_to_matrix(jnp.asarray(rvec))
        back = np.asarray(rot.matrix_to_rodrigues(m))
        np.testing.assert_allclose(back, rvec, atol=1e-5)


def test_matrix_to_rodrigues_near_pi():
    axis = np.array([0.6, -0.8, 0.0])
    rvec = axis * (np.pi - 1e-8)
    m, _ = cv2.Rodrigues(rvec)
    back = np.asarray(rot.matrix_to_rodrigues(jnp.asarray(m)))
    # Near pi the sign of the axis can flip; compare rotations, not vectors.
    m2, _ = cv2.Rodrigues(back)
    np.testing.assert_allclose(m2, m, atol=1e-5)


def test_euler_zxy_matches_scipy():
    for _ in range(50):
        rvec = RNG.uniform(-2.5, 2.5, size=3)
        ref = R.from_rotvec(rvec).as_euler("zxy", degrees=True)
        got = np.asarray(rot.rotvec_to_euler_zxy(jnp.asarray(rvec), degrees=True))
        np.testing.assert_allclose(got, ref, atol=1e-4)
