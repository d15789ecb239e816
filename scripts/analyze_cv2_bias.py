#!/usr/bin/env python
"""Calibrate cv2's corner-refiner bias vs ours, per marker orientation.

VERDICT r3 #4: the off-nominal altitude parity residuals (PARITY_alt25
bbox columns) were ATTRIBUTED to cv2's CORNER_REFINE_APRILTAG having a
different (larger, orientation-dependent) corner noise signature than our
refiner, flipping the planar-PnP ambiguity basin on ill-conditioned frames
— but the attribution was asserted, not tested.  This experiment measures
both refiners' corner errors against rendered GROUND TRUTH across a yaw
sweep, expressed in the MARKER frame (so a systematic per-corner bias
aligns across orientations):

    python scripts/analyze_cv2_bias.py [altitude=25] [yaw_step=10]

If cv2's error is a stable function of orientation (std << mean), a bias
injection (DetectorParams.cv2_bias_px) could reproduce its basin picks;
if it is noise-dominated (std ~ mean, or magnitude below the oracle's own
basin-flip sensitivity — see analyze_pose_basins.py cv2noise), bias
injection CANNOT track the oracle and the negative result stands.
"""

import sys

import numpy as np

REPO = __file__.rsplit("/scripts/", 1)[0]
sys.path.insert(0, REPO)


def main(altitude: float = 25.0, yaw_step: int = 10) -> None:
    import cv2
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from apse_uav_tpu.core.camera import load_camera_params
    from apse_uav_tpu.aruco.detector import ArucoDetector
    from apse_uav_tpu.utils.synthetic import (
        MarkerSpec, SceneRenderer, marker_world_corners, project_world_to_undistorted,
    )

    W, H = 3840, 2160
    mtx, dist = load_camera_params(f"{REPO}/data/cam_params.json")
    r = SceneRenderer(mtx, dist, (W, H), altitude=altitude, supersample=2)

    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)
    pp = cv2.aruco.DetectorParameters()
    pp.minMarkerPerimeterRate = 0.01
    pp.perspectiveRemovePixelPerCell = 8
    pp.perspectiveRemoveIgnoredMarginPerCell = 0.33
    pp.errorCorrectionRate = 2.0
    pp.cornerRefinementMethod = cv2.aruco.CORNER_REFINE_APRILTAG
    cvdet = cv2.aruco.ArucoDetector(d, pp)
    ours = ArucoDetector()

    mapx, mapy = cv2.initUndistortRectifyMap(mtx, dist.reshape(-1, 1), None, mtx, (W, H), cv2.CV_32FC1)
    lut = np.clip((np.arange(256) / 255.0) ** 2 * 255.0, 0, 255).astype(np.uint8)

    def prep(img):
        und = cv2.remap(img, mapx, mapy, cv2.INTER_LINEAR)
        lab = cv2.cvtColor(und, cv2.COLOR_RGB2LAB)
        lab[..., 0] = cv2.LUT(lab[..., 0], lut)
        und = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
        return cv2.cvtColor(und, cv2.COLOR_BGR2GRAY)

    # err[(yaw_bin)][corner] lists of (dx, dy) in MARKER frame
    rows = []
    positions = [(0.5, -2.0), (6.0, 3.0), (-6.0, 1.0)]
    for yaw in range(0, 91, yaw_step):
        for pi, pos in enumerate(positions):
            spec = MarkerSpec(1 + pi, pos, yaw_deg=float(yaw))
            img = r.render([spec])
            gray = prep(img)
            truth = project_world_to_undistorted(
                marker_world_corners(spec), mtx, altitude
            )  # (4, 2) x, y

            cvc, cvids, _ = cvdet.detectMarkers(gray)
            cvmap = {}
            if cvids is not None:
                cvmap = {int(i): c.reshape(4, 2) for c, i in zip(cvc, np.asarray(cvids).ravel())}
            oc, oids = ours.detect(jnp.asarray(gray))
            oids = np.asarray(oids)
            omap = {int(oids[i]): np.asarray(oc[i]) for i in range(len(oids)) if oids[i] >= 0}
            mid = 1 + pi
            if mid not in cvmap or mid not in omap:
                print(f"yaw {yaw} pos {pi}: miss (cv2={mid in cvmap} ours={mid in omap})")
                continue
            th = np.deg2rad(yaw)
            rot = np.array([[np.cos(th), np.sin(th)], [-np.sin(th), np.cos(th)]])
            for k in range(4):
                e_cv = (cvmap[mid][k] - truth[k]) @ rot.T
                e_us = (omap[mid][k] - truth[k]) @ rot.T
                rows.append((yaw, pi, k, *e_cv, *e_us))

    rows = np.asarray(rows)
    np.save(f"/tmp/cv2bias_rows_alt{int(altitude)}.npy", rows)
    print("\nper-corner error in MARKER frame (px), mean +- std over yaw sweep:")
    print(f"{'corner':>6} {'cv2 dx':>14} {'cv2 dy':>14} {'ours dx':>14} {'ours dy':>14}")
    for k in range(4):
        m = rows[rows[:, 2] == k]
        s = lambda j: f"{m[:, j].mean():+.3f}+-{m[:, j].std():.3f}"
        print(f"{k:>6} {s(3):>14} {s(4):>14} {s(5):>14} {s(6):>14}")
    print("\nper-yaw means (corner-averaged |error|):")
    for yaw in sorted(set(rows[:, 0])):
        m = rows[rows[:, 0] == yaw]
        cvmag = np.hypot(m[:, 3], m[:, 4])
        usmag = np.hypot(m[:, 5], m[:, 6])
        # bias stability: per-(yaw,corner) std of cv2 error across positions
        stds = []
        for k in range(4):
            mk = m[m[:, 2] == k]
            if len(mk) >= 2:
                stds.append(np.std(mk[:, 3:5], axis=0).mean())
        print(f"  yaw {int(yaw):3d}: cv2 |e| {cvmag.mean():.3f}  ours |e| {usmag.mean():.3f}"
              f"  cv2 bias-std across positions {np.mean(stds) if stds else float('nan'):.3f}")




def basinpick(altitude: float = 25.0, yaw_step: int = 10) -> None:
    """Direct test: does bias injection make OUR corners reproduce cv2's
    planar-PnP basin pick?  For each sweep frame, solvePnP(ITERATIVE — the
    reference's estimatePoseSingleMarkers path) runs on (a) cv2's corners,
    (b) ours raw, (c) ours + the calibrated per-(yaw,corner) bias table, and
    the out-of-plane tilt direction (marker normal's xy) is compared.
    Agreement(c) ~ agreement(b) ==> the deterministic bias does not carry
    cv2's pick (negative result for VERDICT r3 #4)."""
    import cv2
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from apse_uav_tpu.core.camera import load_camera_params
    from apse_uav_tpu.aruco.detector import ArucoDetector
    from apse_uav_tpu.utils.synthetic import MarkerSpec, SceneRenderer

    W, H = 3840, 2160
    mtx, dist = load_camera_params(f"{REPO}/data/cam_params.json")
    r = SceneRenderer(mtx, dist, (W, H), altitude=altitude, supersample=2)
    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)
    pp = cv2.aruco.DetectorParameters()
    pp.minMarkerPerimeterRate = 0.01
    pp.errorCorrectionRate = 2.0
    pp.cornerRefinementMethod = cv2.aruco.CORNER_REFINE_APRILTAG
    cvdet = cv2.aruco.ArucoDetector(d, pp)
    ours = ArucoDetector()
    mapx, mapy = cv2.initUndistortRectifyMap(mtx, dist.reshape(-1, 1), None, mtx, (W, H), cv2.CV_32FC1)
    lut = np.clip((np.arange(256) / 255.0) ** 2 * 255.0, 0, 255).astype(np.uint8)

    z = np.load("/tmp/cv2bias_tab.npz")
    yaws_tab, tab = z["yaws"], z["tab"]  # (NY,), (NY, 4, 2) marker frame

    L = 0.55
    obj = np.array([[-L / 2, L / 2, 0], [L / 2, L / 2, 0], [L / 2, -L / 2, 0], [-L / 2, -L / 2, 0]])

    def tilt(corners_xy):
        okf, rvec, tvec = cv2.solvePnP(obj, corners_xy.reshape(4, 1, 2).astype(np.float64),
                                       mtx, dist.reshape(-1, 1), flags=cv2.SOLVEPNP_ITERATIVE)
        R, _ = cv2.Rodrigues(rvec)
        n = R[:, 2]
        return n[:2] / (np.linalg.norm(n[:2]) + 1e-12)

    agree_raw, agree_inj, n_frames = 0, 0, 0
    for yaw in range(0, 91, yaw_step):
        for pi, pos in enumerate([(0.5, -2.0), (6.0, 3.0), (-6.0, 1.0)]):
            spec = MarkerSpec(1 + pi, pos, yaw_deg=float(yaw))
            img = r.render([spec])
            und = cv2.remap(img, mapx, mapy, cv2.INTER_LINEAR)
            lab = cv2.cvtColor(und, cv2.COLOR_RGB2LAB)
            lab[..., 0] = cv2.LUT(lab[..., 0], lut)
            gray = cv2.cvtColor(cv2.cvtColor(lab, cv2.COLOR_LAB2RGB), cv2.COLOR_BGR2GRAY)
            cvc, cvids, _ = cvdet.detectMarkers(gray)
            if cvids is None or (1 + pi) not in np.asarray(cvids).ravel():
                continue
            cvcor = {int(i): c.reshape(4, 2) for c, i in zip(cvc, np.asarray(cvids).ravel())}[1 + pi]
            oc, oids = ours.detect(jnp.asarray(gray))
            oids = np.asarray(oids)
            om = {int(oids[i]): np.asarray(oc[i]) for i in range(len(oids)) if oids[i] >= 0}
            if (1 + pi) not in om:
                continue
            ocor = om[1 + pi]
            # inject: e_img = R(theta)^T e_marker with the nearest yaw bin
            yb = int(np.argmin(np.abs(yaws_tab - yaw)))
            th = np.deg2rad(yaw)
            RT = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
            inj = ocor + tab[yb] @ RT.T
            t_cv, t_raw, t_inj = tilt(cvcor), tilt(ocor), tilt(inj)
            agree_raw += float(np.dot(t_cv, t_raw) > 0)
            agree_inj += float(np.dot(t_cv, t_inj) > 0)
            n_frames += 1
    print(f"frames: {n_frames}")
    print(f"basin (tilt-direction) agreement with cv2:  raw {agree_raw / n_frames:.2%}  "
          f"bias-injected {agree_inj / n_frames:.2%}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "basinpick":
        basinpick(float(sys.argv[2]) if len(sys.argv) > 2 else 25.0,
                  int(sys.argv[3]) if len(sys.argv) > 3 else 10)
    else:
        main(float(sys.argv[1]) if len(sys.argv) > 1 else 25.0,
             int(sys.argv[2]) if len(sys.argv) > 2 else 10)
