"""Golden tests: camera model vs OpenCV (projectPoints, undistort maps)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apse_uav_tpu.core import camera

RNG = np.random.default_rng(0)


def _reference_cam():
    # The real camera from the reference data/cam_params.json: strong rational
    # radial distortion (k1..k6 large), zero thin-prism/tilt.
    mtx = np.array(
        [
            [3403.052978515625, 0.0, 2101.3043063061195],
            [0.0, 3434.074462890625, 1154.6619175555534],
            [0.0, 0.0, 1.0],
        ]
    )
    dist = np.array(
        [
            -19.87555590728448, 371.4590701497369, -0.0020731696495147724,
            0.003183112087364842, -650.7296802910304, -19.590551549245838,
            364.5247650929335, -636.3009697764724, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
        ]
    )
    return mtx, dist


def _simple_cam():
    mtx = np.array([[1000.0, 0.0, 960.0], [0.0, 1010.0, 540.0], [0.0, 0.0, 1.0]])
    dist = np.array([-0.2, 0.05, 0.001, -0.002, 0.01])
    return mtx, dist


@pytest.mark.parametrize("cam", [_reference_cam, _simple_cam])
def test_project_points_matches_cv2(cam):
    mtx, dist = cam()
    obj = RNG.uniform(-2, 2, size=(40, 3)).astype(np.float64)
    obj[:, 2] = 0.0
    rvec = np.array([0.05, -0.1, 0.8])
    tvec = np.array([0.3, -0.2, 30.0])
    ref, _ = cv2.projectPoints(obj, rvec, tvec, mtx, dist.reshape(-1, 1))
    ref = ref.reshape(-1, 2)
    got = np.asarray(camera.project_points(jnp.asarray(obj), jnp.asarray(rvec), jnp.asarray(tvec), jnp.asarray(mtx), jnp.asarray(dist)))
    np.testing.assert_allclose(got, ref, atol=5e-3)


@pytest.mark.parametrize("cam", [_reference_cam, _simple_cam])
def test_undistort_points_matches_cv2(cam):
    mtx, dist = cam()
    # Points inside the usable image area (cv2 runs exactly 5 compensation
    # iterations; we match that, so agreement holds even where the lens
    # model is only approximately invertible).
    uv = RNG.uniform([400, 300], [3400, 1900], size=(64, 2))
    ref = cv2.undistortPoints(uv.reshape(-1, 1, 2), mtx, dist.reshape(-1, 1), None, None).reshape(-1, 2)
    got = np.asarray(camera.undistort_points(jnp.asarray(uv), jnp.asarray(mtx), jnp.asarray(dist), num_iters=5))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_undistort_rectify_map_matches_cv2():
    mtx, dist = _reference_cam()
    w, h = 512, 288  # scaled-down grid; the math is resolution-independent
    mtx_s = mtx.copy()
    mtx_s[0] *= w / 3840.0
    mtx_s[1] *= h / 2160.0
    mapx, mapy = cv2.initUndistortRectifyMap(mtx_s, dist.reshape(-1, 1), None, mtx_s, (w, h), cv2.CV_32FC1)
    got = np.asarray(camera.undistort_rectify_map(jnp.asarray(mtx_s), jnp.asarray(dist), (w, h)))
    np.testing.assert_allclose(got[..., 0], mapx, atol=2e-2)
    np.testing.assert_allclose(got[..., 1], mapy, atol=2e-2)


def test_distort_undistort_roundtrip():
    mtx, dist = _reference_cam()
    xy = RNG.uniform(-0.25, 0.25, size=(128, 2))
    d = camera.pad_dist_coeffs(jnp.asarray(dist))
    xyd = camera.distort_normalized(jnp.asarray(xy), d)
    back = camera.undistort_normalized(xyd, d, num_iters=25)
    np.testing.assert_allclose(np.asarray(back), xy, atol=1e-5)


def test_project_points_jit_vmap():
    mtx, dist = _simple_cam()
    obj = jnp.asarray(RNG.uniform(-1, 1, size=(8, 4, 3)))
    rvecs = jnp.asarray(RNG.uniform(-1, 1, size=(8, 3)))
    tvecs = jnp.asarray(RNG.uniform(-1, 1, size=(8, 3)) + np.array([0, 0, 10.0]))
    fn = jax.jit(jax.vmap(lambda o, r, t: camera.project_points(o, r, t, jnp.asarray(mtx), jnp.asarray(dist))))
    out = fn(obj, rvecs, tvecs)
    assert out.shape == (8, 4, 2)
    assert bool(jnp.all(jnp.isfinite(out)))
