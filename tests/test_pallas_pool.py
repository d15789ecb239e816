"""Pallas packed-pool kernel: bit-equality vs the XLA pool chain."""

import numpy as np
import pytest
import jax

from apse_uav_tpu.core.camera import load_camera_params
from apse_uav_tpu.preproc import twopass
from apse_uav_tpu.preproc.pallas_pool import pool_packed_to_packed_pallas
from apse_uav_tpu.preproc.pallas_remap import PallasPreprocessor

pytestmark = pytest.mark.slow

REPO = __file__.rsplit("/tests/", 1)[0]


def test_pallas_pool_matches_xla_chain():
    w, h = 1280, 736
    mtx, dist = load_camera_params(f"{REPO}/data/cam_params.json")
    mtx = np.asarray(mtx) * np.array([[w / 3840, 1, w / 3840], [1, h / 2160, h / 2160], [1, 1, 1.0]])
    pre = PallasPreprocessor(mtx, np.asarray(dist), (w, h), interpret=True, want_rgb=False)
    wp, hp = twopass.pooled_frame_size(w, h, 4)
    mtx_p = twopass.pooled_camera(np.asarray(mtx, np.float64), 4)
    pre_p = PallasPreprocessor(mtx_p, np.asarray(dist), (wp, hp), interpret=True,
                               want_rgb=False, valid_wh=(w // 4, h // 4))

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (2, 3, h, w), np.uint8)
    packed = jax.device_put(pre.host_pack(frames))

    want = jax.jit(
        lambda pk: twopass.pool_packed_to_packed(pk, pre.dims, h, w, pre_p.dims)
    )(packed)
    got = pool_packed_to_packed_pallas(packed, pre.dims, h, w, pre_p.dims, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
