"""Golden tests: colorspace math vs OpenCV uint8 conversions."""

import cv2
import numpy as np

import jax.numpy as jnp

from apse_uav_tpu.core import colorspace as cs

RNG = np.random.default_rng(2)


def _rand_img(h=64, w=96):
    return RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_rgb_to_lab_close_to_cv2():
    img = _rand_img()
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2LAB).astype(np.int32)
    got = np.asarray(cs.rgb_to_lab_u8(jnp.asarray(img))).astype(np.int32)
    # OpenCV uses fixed-point tables; allow small LSB drift.
    assert np.abs(got - ref).max() <= 2, np.abs(got - ref).max()
    assert (np.abs(got - ref) > 1).mean() < 0.01


def test_lab_to_rgb_close_to_cv2():
    img = _rand_img()
    lab = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
    ref = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB).astype(np.int32)
    got = np.asarray(cs.lab_to_rgb_u8(jnp.asarray(lab))).astype(np.int32)
    assert np.abs(got - ref).max() <= 3, np.abs(got - ref).max()
    assert (np.abs(got - ref) > 1).mean() < 0.02


def test_gamma_matches_reference_lut():
    # The reference builds lut[i] = clip(pow(i/255, 2) * 255) (aruco_detect.py:537-540).
    lut = np.empty(256, np.uint8)
    for i in range(256):
        lut[i] = np.clip(pow(i / 255.0, 2) * 255.0, 0, 255)
    vals = np.arange(256, dtype=np.uint8)
    got = np.asarray(cs.gamma_l_channel(jnp.asarray(vals), gamma=2.0))
    # Exact match: both truncate.
    assert (got == lut).all()


def test_full_gamma_pipeline_close_to_cv2():
    img = _rand_img(48, 48)
    lut = np.clip((np.arange(256) / 255.0) ** 2 * 255.0, 0, 255).astype(np.uint8)
    lab = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
    lab[..., 0] = cv2.LUT(lab[..., 0], lut)
    ref = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB).astype(np.int32)
    got = np.asarray(cs.gamma_correct_u8(jnp.asarray(img), gamma=2.0)).astype(np.int32)
    # A 1-LSB difference in the quantized L channel can amplify through the
    # gamma curve + Lab->RGB; what matters for detection is that big
    # deviations are rare.
    diff = np.abs(got - ref)
    assert diff.max() <= 16, diff.max()
    assert (diff > 2).mean() < 0.02, (diff > 2).mean()
    assert (diff > 8).mean() < 0.001, (diff > 8).mean()


def test_bgr_to_gray_matches_cv2():
    img = _rand_img()
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype(np.int32)
    got = np.asarray(cs.bgr_to_gray_u8(jnp.asarray(img))).astype(np.int32)
    assert np.abs(got - ref).max() <= 1
