"""End-to-end ArUco pipeline tests on synthetic sequences.

Includes an independent "oracle" implementation of the reference algorithm
built from cv2 primitives (detection, solvePnP) and numpy formulas following
aruco_detect.py's equations — the strongest parity check available without
the original footage.
"""

import os

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from apse_uav_tpu.core import camera
from apse_uav_tpu.aruco.pipeline import ArucoPipeline, ArucoPipelineConfig, init_carry
from apse_uav_tpu.utils.synthetic import MarkerSpec, render_scene

W, H = 960, 544
ALT = 12.0
LEDS = 0b10110010


@pytest.fixture(scope="module")
def cam():
    mtx, dist = camera.load_camera_params(os.path.join(os.path.dirname(__file__), "..", "data", "cam_params.json"))
    ms = mtx.copy()
    ms[0] *= W / 3840.0
    ms[1] *= H / 2160.0
    return ms, dist


@pytest.fixture(scope="module")
def sequence(cam):
    ms, dist = cam
    frames, specs_t = [], []
    for t in range(5):
        specs = [
            MarkerSpec(4, (0.0 + 0.05 * t, 0.5), 5, leds=LEDS),
            MarkerSpec(1, (-4.0 + 0.1 * t, -2.0), 30),
            MarkerSpec(2, (4.0, 1.5 - 0.1 * t), -20),
            MarkerSpec(3, (1.5, -2.5), 90),
        ]
        frames.append(render_scene(ms, dist, (W, H), specs, altitude=ALT))
        specs_t.append(specs)
    return np.stack(frames), specs_t


def _gray_frames(frames, ms, dist):
    mapx, mapy = cv2.initUndistortRectifyMap(ms, dist.reshape(-1, 1), None, ms, (W, H), cv2.CV_32FC1)
    lut = np.clip((np.arange(256) / 255.0) ** 2 * 255.0, 0, 255).astype(np.uint8)
    grays = []
    for f in frames:
        und = cv2.remap(f, mapx, mapy, cv2.INTER_LINEAR)
        lab = cv2.cvtColor(und, cv2.COLOR_RGB2LAB)
        lab[..., 0] = cv2.LUT(lab[..., 0], lut)
        und = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
        grays.append(cv2.cvtColor(und, cv2.COLOR_BGR2GRAY))
    return grays


def _oracle(grays, ms, dist):
    """Reference-algorithm oracle from cv2 primitives (host id processed
    first, then 1..3, matching the pipeline's documented order)."""
    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)
    p = cv2.aruco.DetectorParameters()
    p.minMarkerPerimeterRate = 0.01
    p.errorCorrectionRate = 2.0
    p.cornerRefinementMethod = cv2.aruco.CORNER_REFINE_APRILTAG
    det = cv2.aruco.ArucoDetector(d, p)

    marker_len = 0.55
    diff_max = 2 / 3 * 1 * 2
    detected_prev = [0, 0, 0, 0]
    cx_prev = np.zeros(4)
    cy_prev = np.zeros(4)
    rows = []
    for k, gray in enumerate(grays):
        corners_l, ids, _ = det.detectMarkers(gray)
        idmap = {}
        if ids is not None:
            for c, i in zip(corners_l, ids.ravel()):
                if 1 <= i <= 4 and i not in idmap:
                    idmap[int(i)] = c.reshape(4, 2)
        poses = {}
        half = marker_len / 2
        obj = np.array([[-half, half, 0], [half, half, 0], [half, -half, 0], [-half, -half, 0]])
        for i, c in idmap.items():
            _, rv, tv = cv2.solvePnP(obj, c, ms, dist.reshape(-1, 1), flags=cv2.SOLVEPNP_ITERATIVE)
            poses[i] = (rv.ravel(), tv.ravel())
        cxy = {}
        msp = {}
        for i, c in idmap.items():
            cx = abs(int(c[:, 0].sum()) / 4)
            cy = abs(int(c[:, 1].sum()) / 4)
            s = np.mean([np.linalg.norm(c[j] - c[(j + 1) % 4]) for j in range(4)])
            cxy[i] = (cx, cy)
            msp[i] = s
        detected = [0, 0, 0, 0]
        measured = {}
        # Host (id 4) first, then 1..3.
        row = {"k": k}
        for i in [4, 1, 2, 3]:
            v = i - 1
            if i not in idmap:
                continue
            cx, cy = cxy[i]
            if k == 0:
                diff = 0.0
            else:
                diff = np.hypot(cx_prev[v] - cx, cy_prev[v] - cy) * marker_len / msp[i]
            if detected_prev[v] == 0:
                detected[v] = 1
                cx_prev[v], cy_prev[v] = cx, cy
            if (detected_prev[v] == 1 and diff < diff_max) or k == 0:
                detected[v] = 1
                measured[i] = True
                cx_prev[v], cy_prev[v] = cx, cy
                if i == 4:
                    altitude = poses[4][1][2]
                    marker_len = 0.55 * (1 - 0.00057 * altitude / 1.2) / 1.013
                    row["altitude"] = altitude / 1.2
        row["marker_length"] = marker_len
        if 4 in measured:
            for i in [1, 2, 3]:
                if i in measured:
                    d_px = np.hypot(cxy[4][0] - cxy[i][0], cxy[4][1] - cxy[i][1])
                    row[f"dist{i}"] = d_px * marker_len / ((msp[4] + msp[i]) / 2)
        row["detected"] = detected
        detected_prev = detected
        rows.append(row)
    return rows


def test_pipeline_end_to_end_vs_oracle(cam, sequence):
    ms, dist = cam
    frames, _ = sequence
    cfg = ArucoPipelineConfig(use_pallas_preproc=False)
    pipe = ArucoPipeline(ms, dist, (W, H), cfg)
    carry, out = pipe.process(jnp.asarray(frames.transpose(0, 3, 1, 2)), init_carry(cfg), first=True)
    out = {k: np.asarray(v) for k, v in out.items()}

    oracle_rows = _oracle(_gray_frames(frames, ms, dist), ms, dist)

    for t, row in enumerate(oracle_rows):
        assert out["detected"][t].tolist() == row["detected"], t
        assert abs(out["marker_length"][t] - row["marker_length"]) < 2e-4
        if "altitude" in row:
            assert abs(out["altitude"][t] - row["altitude"]) < 0.12
        for i in [1, 2, 3]:
            if f"dist{i}" in row:
                got = out["dist_aruco"][t][i - 1]
                assert abs(got - row[f"dist{i}"]) < 0.05, (t, i, got, row[f"dist{i}"])


def test_pipeline_led_decoding(cam, sequence):
    ms, dist = cam
    frames, _ = sequence
    cfg = ArucoPipelineConfig(use_pallas_preproc=False)
    pipe = ArucoPipeline(ms, dist, (W, H), cfg)
    _, out = pipe.process(jnp.asarray(frames.transpose(0, 3, 1, 2)), init_carry(cfg), first=True)
    leds = np.asarray(out["leds"])
    assert (leds == LEDS).all(), leds


def test_cli_smoke(cam, sequence, tmp_path):
    ms, dist = cam
    frames, _ = sequence
    img_dir = tmp_path / "frames"
    img_dir.mkdir()
    for t, f in enumerate(frames):
        cv2.imwrite(str(img_dir / ("image_%04d.png" % (t + 1))), f)
    import json

    cam_path = tmp_path / "cam.json"
    cam_path.write_text(json.dumps({"mtx": ms.tolist(), "dist": dist.reshape(-1, 1).tolist()}))
    out_csv = tmp_path / "out.csv"

    from apse_uav_tpu.cli.aruco_detect import main

    rc = main([
        "--path_camera_params", str(cam_path),
        "--use_images", "--path_input_images", str(img_dir),
        "--save_results", "--path_output_results", str(out_csv),
        "--width", str(W), "--height", str(H),
        "--xla_preproc", "--batch", "3",
    ])
    assert rc == 0
    lines = out_csv.read_text().strip().split("\n")
    assert lines[0].startswith("frame_ID ,ID_4_detected ,markerLength")
    assert len(lines) == 1 + len(frames)
    first = lines[1].split(",")
    assert first[0] == "1" and first[1] == "1"  # host detected on frame 1
    assert len(first) == 16


def test_pipeline_centroid_data_comparison(cam, sequence):
    """useCentroidData path (aruco_detect.py:31,105-123,756-781): DCNN
    centroid/closest-point distances computed from the 17-col CSV rows."""
    from apse_uav_tpu.aruco import geometry as geo

    ms, dist = cam
    frames, _ = sequence
    cfg = ArucoPipelineConfig(use_pallas_preproc=False, use_centroid_data=True)
    pipe = ArucoPipeline(ms, dist, (W, H), cfg)
    t = frames.shape[0]
    # Synthetic DCNN rows: centroids/closest-points at fixed pixel positions
    # (group layout: cols 5-8 veh1, 9-12 veh2, 13-16 veh3).
    rows = np.zeros((t, 17), np.int64)
    rows[:, 0] = np.arange(t)
    cents = {1: (420, 300), 2: (700, 180), 3: (520, 420)}
    for v, (cx, cy) in cents.items():
        base = 1 + v * 4
        rows[:, base] = cx
        rows[:, base + 1] = cy
        rows[:, base + 2] = cx + 6
        rows[:, base + 3] = cy + 4
    carry, out = pipe.process(
        jnp.asarray(frames.transpose(0, 3, 1, 2)), init_carry(cfg), first=True,
        centroid_rows=jnp.asarray(rows, jnp.int32),
    )
    out = {k: np.asarray(v) for k, v in out.items()}

    # Oracle for the last frame: distance from the host lidar point to the
    # given pixel positions, scaled by marker geometry (aruco_detect.py:483-492).
    tlast = t - 1
    assert out["detected"][tlast].tolist() == [1, 1, 1, 1]
    ml = out["marker_length"][tlast]
    msp = out["msp_avg"][tlast]
    # lidar point: recompute from the host pose like the pipeline does.
    lidar_xy = np.asarray(
        geo.project_int(
            geo.VEH4_LIDAR,
            jnp.asarray(out["rvec"][tlast][3]),
            jnp.asarray(out["tvec"][tlast][3]),
            jnp.asarray(ms, jnp.float32),
            jnp.asarray(np.asarray(dist).reshape(-1), jnp.float32),
        )
    )[0]
    for v in (1, 2, 3):
        cx, cy = cents[v]
        d_px = np.hypot(lidar_xy[0] - cx, lidar_xy[1] - cy)
        want = d_px * ml / ((msp[3] + msp[v - 1]) / 2)
        got = out["dist_dcnn"][tlast][v - 1]
        assert abs(got - want) < 0.05, (v, got, want)
        # closest-point column feeds dist_dcnn_bbox
        d_px_b = np.hypot(lidar_xy[0] - (cx + 6), lidar_xy[1] - (cy + 4))
        want_b = d_px_b * ml / ((msp[3] + msp[v - 1]) / 2)
        assert abs(out["dist_dcnn_bbox"][tlast][v - 1] - want_b) < 0.05


def test_altitude_fallback_on_host_gate_failure(cam):
    """The reference's altitude fallback (`[4] not in ids`,
    aruco_detect.py:639-642) is checked AFTER the FP gate mutates a failed
    host id to -1 — so a host that jumps past DIFF_MAX still triggers the
    fallback, and altitude/markerLength update from another marker's pose
    that frame.  Drive pipe.scan with a synthetic front to pin that."""
    ms, dist = cam
    cfg = ArucoPipelineConfig(use_pallas_preproc=False)
    pipe = ArucoPipeline(ms, dist, (W, H), cfg)

    T = 3
    from apse_uav_tpu.aruco import geometry as geo

    def front_fields():
        present = np.zeros((T, 4), bool)
        cx = np.zeros((T, 4), np.float32)
        cy = np.zeros((T, 4), np.float32)
        msp = np.full((T, 4), 50.0, np.float32)
        utv = np.zeros((T, 4, 3), np.float32)
        # Frame 0: host only, unit-depth 20 (altitude ~ 20 * L).
        present[0, 3] = True
        cx[0, 3] = cy[0, 3] = 100.0
        utv[0, 3, 2] = 20.0
        # Frame 1: host jumps 500 px (diff >> DIFF_MAX -> gate fails), veh1
        # present with a DIFFERENT unit depth -> altitude must follow veh1.
        present[1, 3] = True
        cx[1, 3] = cy[1, 3] = 600.0
        utv[1, 3, 2] = 20.0
        present[1, 0] = True
        cx[1, 0] = cy[1, 0] = 300.0
        utv[1, 0, 2] = 30.0
        # Frame 2: nothing detected -> altitude holds.
        rv = np.zeros((T, 4, 3), np.float32)
        rv[..., 0] = 1e-3
        return {
            "present": jnp.asarray(present),
            "corners": jnp.zeros((T, 4, 4, 2), jnp.float32),
            "rvec": jnp.asarray(rv),
            "utvec": jnp.asarray(utv),
            "rvec2": jnp.asarray(rv),
            "utvec2": jnp.asarray(utv),
            "perr": jnp.ones((T, 4), jnp.float32),
            "perr2": jnp.ones((T, 4), jnp.float32),
            "pswap": jnp.zeros((T, 4), bool),
            "cx": jnp.asarray(cx),
            "cy": jnp.asarray(cy),
            "msp": jnp.asarray(msp),
            "gray": jnp.zeros((T, H, W), jnp.uint8),
        }

    carry = init_carry(cfg)
    firsts = jnp.zeros(T, bool).at[0].set(True)
    _, out = pipe.scan(carry, front_fields(), firsts, jnp.zeros((T, 17), jnp.int32))
    alt = np.asarray(out["altitude"])
    ml = np.asarray(out["marker_length"])

    l0 = float(geo.MARKER_LENGTH_ORG)
    alt0_exp = 20.0 * l0 / geo.MARKER_DIV
    assert abs(alt[0] - alt0_exp) < 1e-3, alt[0]
    l1 = float(geo.marker_length_correction(20.0 * l0))
    alt1_exp = 30.0 * l1 / geo.MARKER_DIV
    assert abs(alt[1] - alt1_exp) < 1e-3, (alt[1], alt1_exp)
    # markerLength updated from veh1's altitude on the fallback frame.
    l2 = float(geo.marker_length_correction(30.0 * l1))
    assert abs(ml[1] - l2) < 1e-6
    # Frame 2: stale hold.
    assert abs(alt[2] - alt1_exp) < 1e-6 and abs(ml[2] - l2) < 1e-9
