"""Detector recall + accuracy at the 4K operating point (~47 px markers).

Round-2 post-mortem: all cv2-parity scenes lived at 960x544 / 12 m where
markers are huge, while the end-to-end recall hole was at 4K / 40 m
(reference regime: 3840x2160 input, aruco_detect.py:519; flight altitude
~40 m) with ~47 px markers.  These tests render full-4K scenes through the
real camera model and sweep marker yaw 0..90 deg, asserting recall parity
with cv2.aruco under the reference's tuned parameters
(/root/reference/aruco_detect.py:194-202) plus corner agreement.
"""

import os

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from apse_uav_tpu.core import camera
from apse_uav_tpu.aruco.detector import ArucoDetector
from apse_uav_tpu.utils.synthetic import MarkerSpec, SceneRenderer

pytestmark = pytest.mark.slow

W, H = 3840, 2160
ALTITUDE = 40.0  # marker side ~47 px


@pytest.fixture(scope="module")
def cam():
    mtx, dist = camera.load_camera_params(
        os.path.join(os.path.dirname(__file__), "..", "data", "cam_params.json")
    )
    return mtx, dist


def _cv2_detector():
    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)
    p = cv2.aruco.DetectorParameters()
    p.minMarkerPerimeterRate = 0.01
    p.perspectiveRemovePixelPerCell = 8
    p.perspectiveRemoveIgnoredMarginPerCell = 0.33
    p.errorCorrectionRate = 2.0
    p.cornerRefinementMethod = cv2.aruco.CORNER_REFINE_APRILTAG
    return cv2.aruco.ArucoDetector(d, p)


def _preprocess_reference(img, mtx, dist):
    """The reference's preprocessing chain (aruco_detect.py:250-259,592)."""
    mapx, mapy = cv2.initUndistortRectifyMap(
        mtx, dist.reshape(-1, 1), None, mtx, (W, H), cv2.CV_32FC1
    )
    und = cv2.remap(img, mapx, mapy, cv2.INTER_LINEAR)
    lut = np.clip((np.arange(256) / 255.0) ** 2 * 255.0, 0, 255).astype(np.uint8)
    lab = cv2.cvtColor(und, cv2.COLOR_RGB2LAB)
    lab[..., 0] = cv2.LUT(lab[..., 0], lut)
    und = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
    return cv2.cvtColor(und, cv2.COLOR_BGR2GRAY)


def test_small_marker_recall_yaw_sweep(cam):
    """Every marker cv2 finds at 4K/40 m across yaw 0..90 must be found by
    our detector too, with corners within 1.5 px (cv2 basis includes its own
    ~0.45 px convention offset)."""
    mtx, dist = cam
    r = SceneRenderer(mtx, dist, (W, H), altitude=ALTITUDE, supersample=2)
    det = ArucoDetector()
    cvdet = _cv2_detector()

    missed = []
    worst_err = 0.0
    for yaw in (0, 15, 30, 45, 60, 75, 90):
        specs = [
            MarkerSpec(4, (0.5, -2.0), yaw_deg=yaw + 4.0, leds=0b10110010),
            MarkerSpec(1, (7.5, 3.0), yaw_deg=yaw - 12.0),
            MarkerSpec(2, (-9.0, 2.0), yaw_deg=yaw + 30.0),
            MarkerSpec(3, (4.0, -6.5), yaw_deg=yaw + 75.0),
        ]
        img = r.render(specs)
        gray = _preprocess_reference(img, mtx, dist)

        cvc, cvids, _ = cvdet.detectMarkers(gray)
        assert cvids is not None, f"yaw {yaw}: cv2 found nothing (scene bug)"
        cvmap = {int(i): c.reshape(4, 2) for c, i in zip(cvc, np.asarray(cvids).ravel())}

        corners, ids = det.detect(jnp.asarray(gray))
        ids = np.asarray(ids)
        corners = np.asarray(corners)
        ourmap = {int(ids[i]): corners[i] for i in range(len(ids)) if ids[i] >= 0}

        for mid, cv_corners in cvmap.items():
            if mid not in ourmap:
                missed.append((yaw, mid))
                continue
            err = float(np.abs(ourmap[mid] - cv_corners).max())
            worst_err = max(worst_err, err)
    assert not missed, f"markers cv2 found but we missed (yaw, id): {missed}"
    assert worst_err < 1.5, f"worst corner deviation vs cv2: {worst_err:.2f} px"


def test_marker_size_unbiased_vs_cv2(cam):
    """Marker-SIZE accuracy vs cv2's APRILTAG refine, as a perimeter ratio.

    A systematic sub-pixel inward corner bias sails under the 1.5 px absolute
    corner gate above, but scales altitude (tz = f*L/size_px) and every
    meters-per-pixel distance column with it: the round-3 centroid-mode
    parity failure (0.103 m vs the 0.1 m bar) was a -0.5% size bias from
    full-profile gradient centroids seeing the interior bit cells.  The
    perimeter ratio is translation-invariant, so cv2's ~0.45 px convention
    offset cancels and the tolerance can be tight.
    """
    mtx, dist = cam
    r = SceneRenderer(mtx, dist, (W, H), altitude=ALTITUDE, supersample=2)
    det = ArucoDetector()
    cvdet = _cv2_detector()

    def perimeter(q):
        return float(sum(np.linalg.norm(q[(i + 1) % 4] - q[i]) for i in range(4)))

    worst = 0.0
    for yaw in (4.0, 34.0, 79.0):
        img = r.render([MarkerSpec(4, (0.5, -2.0), yaw_deg=yaw, leds=0b10110010)])
        gray = _preprocess_reference(img, mtx, dist)
        cvc, cvids, _ = cvdet.detectMarkers(gray)
        assert cvids is not None and 4 in np.asarray(cvids).ravel(), f"yaw {yaw}"
        cv_q = {int(i): c.reshape(4, 2) for c, i in zip(cvc, np.asarray(cvids).ravel())}[4]
        corners, ids = det.detect(jnp.asarray(gray))
        ids = np.asarray(ids)
        ours = {int(ids[i]): np.asarray(corners)[i] for i in range(len(ids)) if ids[i] >= 0}
        assert 4 in ours, f"yaw {yaw}: host marker not detected"
        rel = perimeter(ours[4]) / perimeter(cv_q) - 1.0
        worst = max(worst, abs(rel))
    assert worst < 3e-3, f"marker-size relative error vs cv2: {worst:.4%}"


def test_marker_sizes_are_operating_point(cam):
    """Sanity: the rendered markers really are ~47 px (the regime that used
    to flap), not the easy 100+ px of the 960x544 scenes."""
    mtx, _ = cam
    side_px = mtx[0, 0] * 0.55 / ALTITUDE
    assert 40.0 < side_px < 55.0, side_px


def test_recall_across_altitudes(cam):
    """Recall parity with cv2 beyond the 40 m operating point: 25/50/65 m
    (75/37/29 px markers) at a historically-bad yaw.  Full 7-yaw sweeps at
    all three altitudes were probed session-side with zero misses either
    way; this pins one representative slice per altitude."""
    mtx, dist = cam
    det = ArucoDetector()
    cvdet = _cv2_detector()
    yaw = 30
    for alt in (25.0, 50.0, 65.0):
        r = SceneRenderer(mtx, dist, (W, H), altitude=alt, supersample=2)
        specs = [
            MarkerSpec(4, (0.5, -2.0), yaw_deg=yaw + 4.0, leds=0b10110010),
            MarkerSpec(1, (7.5, 3.0), yaw_deg=yaw - 12.0),
            MarkerSpec(2, (-9.0, 2.0), yaw_deg=yaw + 30.0),
            MarkerSpec(3, (4.0, -6.5), yaw_deg=yaw + 75.0),
        ]
        gray = _preprocess_reference(r.render(specs), mtx, dist)
        cvc, cvids, _ = cvdet.detectMarkers(gray)
        cvset = (set(np.asarray(cvids).ravel().tolist()) if cvids is not None else set()) & {1, 2, 3, 4}
        _, ids = det.detect(jnp.asarray(gray))
        ids = np.asarray(ids)
        ourset = set(ids[ids >= 0].tolist()) & {1, 2, 3, 4}
        assert cvset <= ourset, (alt, cvset - ourset)


def test_two_pass_recall_yaw_sweep(cam):
    """Two-pass preproc recall gate (pipeline semantics, CPU backend).

    The two-pass front scores proposals on a POOLED-SOURCE remap instead of
    pooling the full-res gray (apse_uav_tpu/preproc/twopass.py) — proposal
    scores shift, so detection recall must be re-proven from the RAW
    distorted frame: every marker cv2.aruco finds on the reference
    preprocessing chain must be found by the two-pass pipeline front, with
    corners within 1.5 px.  Also pins the tile-budget behavior: all
    cv2-found markers must be COVERED by the 256-tile selection.
    """
    from apse_uav_tpu.aruco.pipeline import ArucoPipeline, ArucoPipelineConfig

    mtx, dist = cam
    cfg = ArucoPipelineConfig(use_pallas_preproc=False, two_pass=True)
    pipe = ArucoPipeline(mtx, dist, (W, H), cfg)
    cvdet = _cv2_detector()

    missed = []
    worst_err = 0.0
    for yaw, alt in ((0, ALTITUDE), (30, ALTITUDE), (75, ALTITUDE), (30, 25.0), (30, 65.0)):
        r = SceneRenderer(mtx, dist, (W, H), altitude=alt, supersample=2)
        specs = [
            MarkerSpec(4, (0.5, -2.0), yaw_deg=yaw + 4.0, leds=0b10110010),
            MarkerSpec(1, (7.5, 3.0), yaw_deg=yaw - 12.0),
            MarkerSpec(2, (-9.0, 2.0), yaw_deg=yaw + 30.0),
            MarkerSpec(3, (4.0, -6.5), yaw_deg=yaw + 75.0),
        ]
        img = r.render(specs)
        gray_ref = _preprocess_reference(img, mtx, dist)
        cvc, cvids, _ = cvdet.detectMarkers(gray_ref)
        assert cvids is not None, f"yaw {yaw} alt {alt}: cv2 found nothing (scene bug)"
        cvmap = {int(i): c.reshape(4, 2) for c, i in zip(cvc, np.asarray(cvids).ravel())}

        frames = jnp.asarray(np.transpose(img, (2, 0, 1))[None])  # (1,3,H,W)
        gray, corners, ids = pipe._detect_two_pass(frames)
        ids = np.asarray(ids[0])
        corners = np.asarray(corners[0])
        ourmap = {int(ids[i]): corners[i] for i in range(len(ids)) if ids[i] >= 0}

        for mid, cv_corners in cvmap.items():
            if mid not in ourmap:
                missed.append((yaw, alt, mid))
                continue
            err = float(np.abs(ourmap[mid] - cv_corners).max())
            worst_err = max(worst_err, err)
    assert not missed, f"markers cv2 found but two-pass missed (yaw, alt, id): {missed}"
    assert worst_err < 1.5, f"worst corner deviation vs cv2: {worst_err:.2f} px"


def test_adversarial_recall_blur_noise_clutter(cam):
    """Recall parity with cv2 on DEGRADED frames (VERDICT r3 #6): the
    synthetic parity scenes are clean renders, so the renderer and detector
    could share blind spots.  This applies motion blur, sensor noise, and
    high-frequency roof clutter to the rendered 40 m scene and asserts
    every marker cv2.aruco still finds is found by our detector too."""
    mtx, dist = cam
    r = SceneRenderer(mtx, dist, (W, H), altitude=ALTITUDE, supersample=2)
    det = ArucoDetector()
    cvdet = _cv2_detector()
    rng = np.random.default_rng(11)

    specs = [
        MarkerSpec(4, (0.5, -2.0), yaw_deg=17.0, leds=0b10110010),
        MarkerSpec(1, (7.5, 3.0), yaw_deg=43.0),
        MarkerSpec(2, (-9.0, 2.0), yaw_deg=61.0),
        MarkerSpec(3, (4.0, -6.5), yaw_deg=82.0),
    ]
    img = r.render(specs).astype(np.float32)

    # High-frequency clutter: checkerboard-ish roof texture patches away
    # from the markers (top band of the frame).
    yy, xx = np.mgrid[0:300, 0:W]
    clutter = 127 + 90 * np.sign(np.sin(xx / 3.0) * np.sin(yy / 4.0))
    img[200:500] = 0.5 * img[200:500] + 0.5 * clutter[..., None]

    missed_total = []
    for blur_px, noise_std in ((3, 4.0), (5, 8.0)):
        g = img.copy()
        # Horizontal motion blur (vehicle/UAV relative motion).
        k = np.zeros((1, blur_px), np.float32)
        k[0, :] = 1.0 / blur_px
        g = cv2.filter2D(g, -1, k)
        g = g + rng.normal(0.0, noise_std, g.shape).astype(np.float32)
        frame = np.clip(g, 0, 255).astype(np.uint8)
        gray = _preprocess_reference(frame, mtx, dist)

        cvc, cvids, _ = cvdet.detectMarkers(gray)
        cvset = (set(np.asarray(cvids).ravel().tolist()) if cvids is not None else set()) & {1, 2, 3, 4}
        _, ids = det.detect(jnp.asarray(gray))
        ids = np.asarray(ids)
        ourset = set(ids[ids >= 0].tolist()) & {1, 2, 3, 4}
        missed_total.extend((blur_px, noise_std, m) for m in (cvset - ourset))
        # sanity: the degradation should not blind cv2 completely at the
        # mild setting (otherwise the test is vacuous)
        if blur_px == 3:
            assert len(cvset) >= 3, f"scene too hard even for cv2: {cvset}"
    assert not missed_total, f"markers cv2 found on degraded frames but we missed: {missed_total}"
