"""Golden tests: remap + full preprocessing vs OpenCV."""

import os
import cv2
import numpy as np
import jax.numpy as jnp

from apse_uav_tpu.core import camera
from apse_uav_tpu.preproc import Preprocessor, bilinear_remap_u8

RNG = np.random.default_rng(3)


def _cam_scaled(w, h):
    mtx, dist = camera.load_camera_params(os.path.join(os.path.dirname(__file__), "..", "data", "cam_params.json"))
    mtx = mtx.copy()
    mtx[0] *= w / 3840.0
    mtx[1] *= h / 2160.0
    return mtx, dist


def test_bilinear_remap_matches_cv2():
    h, w = 144, 256
    mtx, dist = _cam_scaled(w, h)
    img = RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    mapx, mapy = cv2.initUndistortRectifyMap(mtx, dist.reshape(-1, 1), None, mtx, (w, h), cv2.CV_32FC1)
    ref = cv2.remap(img, mapx, mapy, cv2.INTER_LINEAR).astype(np.int32)
    got = np.asarray(
        bilinear_remap_u8(jnp.asarray(img), jnp.asarray(np.stack([mapx, mapy], axis=-1)))
    ).astype(np.int32)
    diff = np.abs(got - ref)
    # cv2.remap uses 5-bit fixed-point interpolation weights; tiny drift ok.
    assert diff.max() <= 4, diff.max()
    assert (diff > 1).mean() < 0.01


def test_bilinear_remap_border_zero():
    img = np.full((16, 16), 200, dtype=np.uint8)
    # Map everything to (-10, -10): outside -> 0 like BORDER_CONSTANT.
    m = np.full((4, 4, 2), -10.0, dtype=np.float32)
    out = np.asarray(bilinear_remap_u8(jnp.asarray(img), jnp.asarray(m)))
    assert (out == 0).all()


def test_full_preprocess_matches_reference_chain():
    """End-to-end parity with aruco_detect.py preprocessFrame + gray."""
    h, w = 270, 480
    mtx, dist = _cam_scaled(w, h)
    # Smooth-ish synthetic image (real frames are smooth; avoids worst-case
    # quantization amplification at random-noise edges).
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            128 + 100 * np.sin(xx / 17.0) * np.cos(yy / 23.0),
            128 + 90 * np.cos(xx / 29.0 + 1.0),
            128 + 80 * np.sin(yy / 13.0 + 2.0),
        ],
        axis=-1,
    ).clip(0, 255).astype(np.uint8)

    # Reference chain with cv2:
    mapx, mapy = cv2.initUndistortRectifyMap(mtx, dist.reshape(-1, 1), None, mtx, (w, h), cv2.CV_32FC1)
    ref = cv2.remap(img, mapx, mapy, cv2.INTER_LINEAR)
    lut = np.clip((np.arange(256) / 255.0) ** 2 * 255.0, 0, 255).astype(np.uint8)
    lab = cv2.cvtColor(ref, cv2.COLOR_RGB2LAB)
    lab[..., 0] = cv2.LUT(lab[..., 0], lut)
    ref = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
    ref_gray = cv2.cvtColor(ref, cv2.COLOR_BGR2GRAY)

    pre = Preprocessor(mtx, dist, (w, h))
    got, got_gray = pre(jnp.asarray(img))
    got = np.asarray(got).astype(np.int32)
    got_gray = np.asarray(got_gray).astype(np.int32)

    diff = np.abs(got - ref.astype(np.int32))
    gdiff = np.abs(got_gray - ref_gray.astype(np.int32))
    assert (diff > 3).mean() < 0.01, ((diff > 3).mean(), diff.max())
    assert (gdiff > 3).mean() < 0.01, ((gdiff > 3).mean(), gdiff.max())


def test_preprocess_batched_shapes():
    h, w = 64, 128
    mtx, dist = _cam_scaled(w, h)
    pre = Preprocessor(mtx, dist, (w, h))
    frames = RNG.integers(0, 256, size=(4, h, w, 3), dtype=np.uint8)
    out, gray = pre(jnp.asarray(frames))
    assert out.shape == (4, h, w, 3) and out.dtype == jnp.uint8
    assert gray.shape == (4, h, w) and gray.dtype == jnp.uint8
