"""ArUco detector parity tests vs cv2.aruco on synthetic scenes."""

import os
import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from apse_uav_tpu.core import camera
from apse_uav_tpu.aruco.detector import ArucoDetector
from apse_uav_tpu.aruco.dictionary import DICT_4X4_50, match_dictionary, marker_image
from apse_uav_tpu.utils.synthetic import MarkerSpec, render_scene

W, H = 960, 544


@pytest.fixture(scope="module")
def cam():
    mtx, dist = camera.load_camera_params(os.path.join(os.path.dirname(__file__), "..", "data", "cam_params.json"))
    ms = mtx.copy()
    ms[0] *= W / 3840.0
    ms[1] *= H / 2160.0
    return ms, dist


@pytest.fixture(scope="module")
def scene(cam):
    ms, dist = cam
    specs = [
        MarkerSpec(4, (0.0, 0.5), 5, leds=0b10110010),
        MarkerSpec(1, (-4.0, -2.0), 30),
        MarkerSpec(2, (4.0, 1.5), -20),
        MarkerSpec(3, (1.5, -2.5), 90),
    ]
    img = render_scene(ms, dist, (W, H), specs, altitude=12.0)
    # Reference preprocessing chain.
    mapx, mapy = cv2.initUndistortRectifyMap(ms, dist.reshape(-1, 1), None, ms, (W, H), cv2.CV_32FC1)
    und = cv2.remap(img, mapx, mapy, cv2.INTER_LINEAR)
    lut = np.clip((np.arange(256) / 255.0) ** 2 * 255.0, 0, 255).astype(np.uint8)
    lab = cv2.cvtColor(und, cv2.COLOR_RGB2LAB)
    lab[..., 0] = cv2.LUT(lab[..., 0], lut)
    und = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
    gray = cv2.cvtColor(und, cv2.COLOR_BGR2GRAY)
    return specs, gray


def test_dictionary_codes_match_cv2():
    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)
    for i in [0, 1, 7, 23, 49]:
        ref = d.generateImageMarker(i, 6)
        got = marker_image(i)
        assert (got == ref).all(), i


def test_match_dictionary_exact_and_corrected():
    ids, rot, dist = match_dictionary(jnp.asarray([DICT_4X4_50[13]], jnp.uint32))
    assert int(ids[0]) == 13 and int(rot[0]) == 0 and int(dist[0]) == 0
    # Flip two bits: still within the errorCorrectionRate=2.0 budget...
    corrupted = int(DICT_4X4_50[13]) ^ 0b101
    ids, rot, dist = match_dictionary(jnp.asarray([corrupted], jnp.uint32))
    assert int(ids[0]) == 13 and int(dist[0]) == 2
    # ...but 2-bit correction can also hit other codes; with rate 0 (exact
    # matching only), the corrupted code must be rejected.
    ids0, _, _ = match_dictionary(jnp.asarray([corrupted], jnp.uint32), error_correction_rate=0.0)
    assert int(ids0[0]) == -1


def test_match_dictionary_rotations():
    g = np.array([[(int(DICT_4X4_50[7]) >> (15 - (r * 4 + c))) & 1 for c in range(4)] for r in range(4)])
    for k in range(4):
        rot_grid = np.rot90(g, -k)
        bits = 0
        for b in rot_grid.reshape(-1):
            bits = (bits << 1) | int(b)
        ids, rot, _ = match_dictionary(jnp.asarray([bits], jnp.uint32))
        assert int(ids[0]) == 7 and int(rot[0]) == k


def test_detects_all_markers_matching_cv2(scene, cam):
    specs, gray = scene
    ms, dist = cam
    det = ArucoDetector()
    corners, ids = det.detect(jnp.asarray(gray))
    corners, ids = np.asarray(corners), np.asarray(ids)
    ourmap = {int(ids[i]): corners[i] for i in range(len(ids)) if ids[i] >= 0}

    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)
    p = cv2.aruco.DetectorParameters()
    p.minMarkerPerimeterRate = 0.01
    p.errorCorrectionRate = 2.0
    p.cornerRefinementMethod = cv2.aruco.CORNER_REFINE_APRILTAG
    cvc, cvids, _ = cv2.aruco.ArucoDetector(d, p).detectMarkers(gray)
    assert cvids is not None
    cvmap = {int(i): c.reshape(4, 2) for c, i in zip(cvc, cvids.ravel())}
    assert sorted(cvmap) == [1, 2, 3, 4]
    for i, cv_corners in cvmap.items():
        assert i in ourmap, f"marker {i} missed"
        err = np.abs(ourmap[i] - cv_corners).max()
        # Same corner ORDER as cv2 (canonical rotation) and subpixel parity.
        assert err < 1.5, (i, err)


def test_detect_decimated_path(scene):
    """decimate=True (scale-proportional score-map pyramid — the non-default
    side of the A/B lever; measured slower on the v5e, see DetectorParams)
    must find the same markers as the default full-grid path."""
    from apse_uav_tpu.aruco.detector import DetectorParams

    _, gray = scene
    det = ArucoDetector(DetectorParams(decimate=True))
    _, ids = det.detect(jnp.asarray(gray))
    ids = np.asarray(ids)
    assert set(ids[ids >= 0].tolist()) >= {1, 2, 3, 4}


def test_detect_batched(scene):
    _, gray = scene
    det = ArucoDetector()
    batch = jnp.asarray(np.stack([gray, gray]))
    corners, ids = det.detect(batch)
    assert corners.shape[0] == 2 and ids.shape[0] == 2
    assert set(np.asarray(ids[0])[np.asarray(ids[0]) >= 0].tolist()) >= {1, 2, 3, 4}


def test_largest_component_matches_scipy_label():
    """Fixed-round segmented-sweep labeling == scipy.ndimage largest component
    (4-connectivity) on every marker-class shape, including the worst case
    the old radius-1 propagation could NOT converge on: a bare border ring
    (geodesic diameter ~ half the perimeter) plus separate clutter blobs.

    The schedule is FIXED (3 sweep rounds + 8 radius-1 steps, no while_loop
    — a data-dependent fixpoint cost 54 ms/frame on TPU noise input), so on
    arbitrary percolating masks exactness is not guaranteed; what IS
    guaranteed — and asserted on noise below — is that labeling only ever
    refines (never merges separate scipy components), so non-converged
    clutter splits into smaller pieces and cannot displace an exactly
    labeled marker blob."""
    import scipy.ndimage as ndi

    from apse_uav_tpu.aruco.detector import _largest_component

    win = 64
    struct = [[0, 1, 0], [1, 1, 1], [0, 1, 0]]
    masks = []
    # Bare ring spanning nearly the whole window (worst geodesic diameter).
    ring = np.zeros((win, win), bool)
    ring[2:62, 2:62] = True
    ring[5:59, 5:59] = False
    clutter = np.zeros_like(ring)
    clutter[30:40, 30:40] = True
    masks.append(ring | clutter)
    # C-shape (open ring) with the gap forcing one-way propagation.
    c = ring.copy()
    c[2:5, 28:36] = False
    masks.append(c | clutter)
    # Quad with attached interior bit cells (a realistic decoded marker).
    quad = np.zeros((win, win), bool)
    quad[8:56, 8:56] = True
    quad[14:50, 14:50] = False
    for by in range(3):
        for bx in range(3):
            if (by + bx) % 2 == 0:
                quad[16 + by * 11 : 24 + by * 11, 16 + bx * 11 : 24 + bx * 11] = True
    quad[50:56, 20:28] = False  # notch the border: still one component
    masks.append(quad | clutter)
    for m in masks:
        labels, n = ndi.label(m, structure=struct)
        assert n >= 1
        sizes = ndi.sum_labels(np.ones_like(labels), labels, range(1, n + 1))
        want = labels == (1 + int(np.argmax(sizes)))
        got = np.asarray(_largest_component(jnp.asarray(m), win))
        np.testing.assert_array_equal(got, want)
    # Refinement invariant on arbitrary masks (smoothed + percolating noise):
    # the selected mask is non-empty and lives inside ONE scipy component.
    import scipy.ndimage as ndi

    for seed in range(4):
        noise = np.random.default_rng(seed).random((win, win))
        for m in (ndi.uniform_filter(noise, 7) < 0.47, noise < 0.5):
            labels, n = ndi.label(m, structure=struct)
            got = np.asarray(_largest_component(jnp.asarray(m), win))
            assert got.any() and got[~m].sum() == 0
            assert len(set(labels[got].tolist())) == 1


def test_pallas_labeling_matches_xla_sweeps():
    """pallas_labeling.labels_batched (interpret) must reproduce the XLA
    cummin-sweep labels BIT-FOR-BIT on marker shapes and arbitrary noise
    (same fixed schedule, same keys — only the scan machinery differs)."""
    import scipy.ndimage as ndi

    from apse_uav_tpu.aruco import pallas_labeling
    from apse_uav_tpu.aruco.detector import _largest_component, _largest_from_labels

    win = 64
    rng = np.random.default_rng(3)
    masks = []
    ring = np.zeros((win, win), bool)
    ring[2:62, 2:62] = True
    ring[5:59, 5:59] = False
    masks.append(ring)
    c = ring.copy()
    c[2:5, 28:36] = False
    masks.append(c)
    for seed in range(3):
        noise = np.random.default_rng(seed).random((win, win))
        masks.append(ndi.uniform_filter(noise, 7) < 0.47)
        masks.append(noise < 0.5)
    masks.append(np.zeros((win, win), bool))
    darks = jnp.asarray(np.stack(masks))
    labels = pallas_labeling.labels_batched(darks, interpret=True)
    got = jax.vmap(lambda lab: _largest_from_labels(lab, win))(labels)
    want = jax.vmap(lambda d: _largest_component(d, win))(darks)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # And under an extra vmap (the per-frame batching the detector uses).
    db = jnp.stack([darks[:4], darks[3:7]])
    lb = jax.vmap(lambda d: pallas_labeling.labels_batched(d, interpret=True))(db)
    wb = jax.vmap(jax.vmap(lambda d: _largest_component(d, win)))(db)
    gb = jax.vmap(jax.vmap(lambda lab: _largest_from_labels(lab, win)))(lb)
    np.testing.assert_array_equal(np.asarray(gb), np.asarray(wb))


def test_pallas_proposals_matches_xla(scene):
    """Fused Pallas proposals kernel (interpret mode) == the XLA
    _proposals path with decimate=False: same candidate set per scale
    (centers, sizes, validity) and scores to f32 tolerance.  Slot ORDER
    within a scale may differ only between equal scores; compare as
    score-sorted sets per scale."""
    from apse_uav_tpu.aruco import pallas_proposals as pprop
    from apse_uav_tpu.aruco.detector import DetectorParams, _proposals

    _, gray = scene
    p = DetectorParams()
    g = jnp.asarray(gray)
    cx, sx, vx, okx = _proposals(g.astype(jnp.float32), p)
    cp_, sp_, vp_, okp = pprop.proposals_batched(g[None], p, interpret=True)
    cp_, sp_, vp_, okp = cp_[0], sp_[0], vp_[0], okp[0]
    k = p.per_scale_k
    n = int(sx.shape[0])
    assert sp_.shape == sx.shape
    for a in range(0, n, k):
        ours = {
            (float(c[0]), float(c[1])): float(v)
            for c, v, ok in zip(np.asarray(cp_[a : a + k]), np.asarray(vp_[a : a + k]), np.asarray(okp[a : a + k]))
            if ok
        }
        want = {
            (float(c[0]), float(c[1])): float(v)
            for c, v, ok in zip(np.asarray(cx[a : a + k]), np.asarray(vx[a : a + k]), np.asarray(okx[a : a + k]))
            if ok
        }
        # Same candidate positions; scores equal to f32 summation-order
        # tolerance (per-window vs global integral image).
        assert set(ours) == set(want), (a // k, ours, want)
        for pos_key in ours:
            assert abs(ours[pos_key] - want[pos_key]) < 5e-4, (a // k, pos_key)


def test_pallas_proposals_full_detect(scene):
    """End-to-end detect with the Pallas proposals path finds the same ids."""
    from apse_uav_tpu.aruco.detector import DetectorParams

    _, gray = scene
    det = ArucoDetector(DetectorParams(pallas_proposals=True, pallas_interpret=True))
    _, ids = det.detect(jnp.asarray(gray))
    ids = np.asarray(ids)
    assert set(ids[ids >= 0].tolist()) >= {1, 2, 3, 4}
