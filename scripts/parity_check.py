#!/usr/bin/env python
"""End-to-end parity check: run the ACTUAL reference aruco_detect.py as an
oracle on synthetic 4K frames and diff its result CSV against ours.

The reference script (read-only at /root/reference/aruco_detect.py) is
executed with its user-constant block patched for headless batch use, plus a
small cv2-5.x compatibility shim for the legacy aruco API it was written
against (cv2 4.2).  Nothing from the reference is copied into this repo —
it is invoked as an external oracle, exactly like running it by hand.

Target (BASELINE.md): inter-vehicle distance columns agree within 0.1 m.

Usage:  python scripts/parity_check.py [--frames 30] [--altitude 40]
Writes: <workdir>/{frames/,ref.csv,ours.csv} and prints a JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = "/root/reference/aruco_detect.py"

# cv2 5.x shim for the 4.x-era aruco module API the reference uses.
_CV2_SHIM = '''
import cv2 as _cv2
from cv2 import aruco as _aruco
import numpy as _np

if not hasattr(_aruco, "DetectorParameters_create"):
    _aruco.DetectorParameters_create = _aruco.DetectorParameters
if not hasattr(_aruco, "Dictionary_get"):
    _aruco.Dictionary_get = _aruco.getPredefinedDictionary
if not hasattr(_aruco, "detectMarkers"):
    def _detect_markers(image, dictionary, parameters=None, cameraMatrix=None, distCoeff=None):
        det = _aruco.ArucoDetector(dictionary, parameters or _aruco.DetectorParameters())
        corners, ids, rej = det.detectMarkers(image)
        if ids is not None:
            ids = _np.asarray(ids).reshape(-1, 1)  # 4.x shape (N, 1)
        return corners, ids, rej
    _aruco.detectMarkers = _detect_markers
if not hasattr(_aruco, "estimatePoseSingleMarkers"):
    def _estimate_pose(corners, marker_length, mtx, dist):
        half = marker_length / 2.0
        obj = _np.array(
            [[-half, half, 0.0], [half, half, 0.0], [half, -half, 0.0], [-half, -half, 0.0]],
            _np.float64,
        )
        rvecs, tvecs = [], []
        for c in corners:
            _ok, rv, tv = _cv2.solvePnP(obj, c.reshape(4, 1, 2).astype(_np.float64), mtx, dist,
                                        flags=_cv2.SOLVEPNP_ITERATIVE)
            rvecs.append(rv.reshape(1, 3))
            tvecs.append(tv.reshape(1, 3))
        return _np.array(rvecs), _np.array(tvecs), None
    _aruco.estimatePoseSingleMarkers = _estimate_pose
'''


def render_frames(workdir: str, n_frames: int, altitude: float) -> str:
    """Render a dynamic 4-vehicle scene through the real reference camera."""
    import cv2

    from apse_uav_tpu.core.camera import load_camera_params
    from apse_uav_tpu.utils.synthetic import MarkerSpec, SceneRenderer

    frames_dir = os.path.join(workdir, "frames")
    os.makedirs(frames_dir, exist_ok=True)
    mtx, dist = load_camera_params(os.path.join(REPO, "data", "cam_params.json"))
    print(f"[parity] building renderer (lens inversion, one-time)...", flush=True)
    r = SceneRenderer(mtx, dist, (3840, 2160), altitude=altitude, supersample=2)

    # Vehicles move gently (well under the DIFF_MAX gate of 1.33 m/frame).
    for k in range(1, n_frames + 1):
        t = k - 1
        markers = [
            MarkerSpec(4, (0.5 + 0.12 * t, -2.0 + 0.05 * t), yaw_deg=4.0, leds=0b10110010),
            MarkerSpec(1, (7.5 - 0.10 * t, 3.0), yaw_deg=-12.0),
            MarkerSpec(2, (-9.0 + 0.08 * t, 2.0 + 0.06 * t), yaw_deg=30.0),
            MarkerSpec(3, (4.0, -6.5 + 0.09 * t), yaw_deg=75.0),
        ]
        img = r.render(markers)
        cv2.imwrite(os.path.join(frames_dir, f"image_{k:04d}.png"), img)
        if k % 10 == 0:
            print(f"[parity] rendered {k}/{n_frames}", flush=True)
    return frames_dir


def run_reference(workdir: str, frames_dir: str, n_frames: int,
                  use_centroid_data: bool = False, dcnn_csv: str | None = None,
                  source_lidar: bool = False) -> str:
    """Patch the reference's constant block and execute it headless."""
    src = open(REFERENCE).read()
    out_csv = os.path.join(workdir, "ref.csv")
    subs = [
        (r"^start_frame = .*$", "start_frame = 1"),
        (r"^stop_frame = .*$", f"stop_frame = {n_frames}"),
        (r"^step_frame = .*$", "step_frame = 1"),
        (r"^showImage = .*$", "showImage = False"),
        (r"^saveResults = .*$", "saveResults = True"),
        (r"^saveImages = .*$", "saveImages = False"),
        (r"^useCentroidData = .*$", f"useCentroidData = {use_centroid_data}"),
        (r"^N_avg = .*$", "N_avg = 1"),
        (r"^drawMarkers = .*$", "drawMarkers = False"),
        (r"^drawMarkersAxes = .*$", "drawMarkersAxes = False"),
        (r"^showDataOnImage = .*$", "showDataOnImage = False"),
        (r"^showDistancesOnImage = .*$", "showDistancesOnImage = False"),
        (r"^drawLeds = .*$", "drawLeds = False"),
        (r"^sourceLidar = .*$", f"sourceLidar = {source_lidar}"),
        (r"^drawLines = .*$", "drawLines = False"),
        (r"^drawPoints = .*$", "drawPoints = False"),
        (r"^useImages = .*$", "useImages = True"),
        (r"^useVideo = .*$", "useVideo = False"),
        (
            r'^path_camera_params = .*$',
            f'path_camera_params = {os.path.join(REPO, "data", "cam_params.json")!r}',
        ),
        (r'^    path_input_images = .*$', f'    path_input_images = {frames_dir + os.sep!r}'),
        (r'^    path_output_results = .*$', f'    path_output_results = {out_csv!r}'),
    ]
    if use_centroid_data:
        subs.append((r'^    path_dcnn_data = .*$', f'    path_dcnn_data = {dcnn_csv!r}'))
    for pat, rep in subs:
        src, n = re.subn(pat, rep, src, flags=re.M)
        assert n >= 1, f"reference patch failed: {pat}"
    patched = os.path.join(workdir, "reference_patched.py")
    open(patched, "w").write(_CV2_SHIM + "\n" + src)
    print("[parity] running reference oracle...", flush=True)
    res = subprocess.run(
        [sys.executable, patched], cwd=workdir, capture_output=True, text=True, timeout=3600
    )
    if res.returncode != 0:
        print(res.stdout[-2000:])
        print(res.stderr[-4000:])
        raise RuntimeError("reference oracle failed")
    return out_csv


def run_ours(workdir: str, frames_dir: str, n_frames: int, xla_preproc: bool,
             force_cpu: bool = False, dcnn_csv: str | None = None,
             source_lidar: bool = False, led_bias: tuple | None = None) -> str:
    out_csv = os.path.join(workdir, "ours.csv")
    cmd = [
        sys.executable, "-m", "apse_uav_tpu.cli.aruco_detect",
        "--path_camera_params", os.path.join(REPO, "data", "cam_params.json"),
        "--use_images", "--path_input_images", frames_dir,
        "--save_results", "--path_output_results", out_csv,
        "--stop_frame", str(n_frames),
    ]
    if dcnn_csv is not None:
        cmd += ["--use_centroid_data", "--path_dcnn_data", dcnn_csv]
    if source_lidar:
        cmd.append("--source_lidar")
    if led_bias is not None:
        cmd += ["--led_bias", str(led_bias[0]), str(led_bias[1])]
    if xla_preproc:
        cmd.append("--xla_preproc")
    if force_cpu:
        cmd.append("--force_cpu")
    print("[parity] running TPU pipeline CLI...", flush=True)
    res = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True, timeout=3600)
    if res.returncode != 0:
        print(res.stdout[-2000:])
        print(res.stderr[-4000:])
        raise RuntimeError("our CLI failed")
    return out_csv


def read_results(path: str, ncols: int = 16) -> np.ndarray:
    rows = []
    with open(path) as f:
        next(f)  # header
        for line in f:
            parts = [p.strip() for p in line.strip().split(",")]
            if len(parts) < ncols or parts[0] == "":
                continue
            rows.append([float(p) if p not in ("", "nan") else np.nan for p in parts[:ncols]])
    return np.asarray(rows)


def compare(ref_csv: str, ours_csv: str, use_centroid_data: bool = False) -> dict:
    # 16-col schema: 0 frame, 1 id4_det, 2 markerLength, 3 leds, 4 altitude,
    # 5 fov_w, 6 fov_h, then per vehicle v in 1..3: det, d_aruco, d_bbox
    # (+ d_dcnn, d_dcnn_bbox in the 22-col useCentroidData schema —
    # reference aruco_detect.py:131-139).
    ncols = 22 if use_centroid_data else 16
    step = 5 if use_centroid_data else 3
    ref = read_results(ref_csv, ncols)
    ours = read_results(ours_csv, ncols)
    n = min(len(ref), len(ours))
    ref, ours = ref[:n], ours[:n]
    out = {"frames": int(n)}
    det_cols = {"host": 1}
    vcols = {}
    for v in range(1, 4):
        dc = 7 + (v - 1) * step
        det_cols[f"veh{v}"] = dc
        vcols[f"veh{v}"] = (dc, tuple(range(dc + 1, dc + step)))
    out["detection_agreement"] = {
        k: float((ref[:, c] == ours[:, c]).mean()) for k, c in det_cols.items()
    }
    col_names = ["aruco", "bbox", "dcnn", "dcnn_bbox"]
    deltas = []
    for name, (dc, cols) in vcols.items():
        both = (ref[:, 1] > 0) & (ours[:, 1] > 0) & (ref[:, dc] > 0) & (ours[:, dc] > 0)
        for ci, c in enumerate(cols):
            d = np.abs(ref[both, c] - ours[both, c])
            d = d[~np.isnan(d)]
            if len(d):
                deltas.append(d)
                out[f"delta_{name}_{col_names[ci]}"] = {
                    "max": float(d.max()), "mean": float(d.mean()), "n": int(len(d)),
                }
    alld = np.concatenate(deltas) if deltas else np.array([np.inf])
    both_alt = (ref[:, 1] > 0) & (ours[:, 1] > 0)
    out["delta_altitude_max"] = float(np.nanmax(np.abs(ref[both_alt, 4] - ours[both_alt, 4]))) if both_alt.any() else None
    # Host-state columns beyond distances: LED panel id (col 3, exact
    # integer agreement) and corrected marker length (col 2).
    if both_alt.any():
        out["leds_agreement"] = float(
            (ref[both_alt, 3] == ours[both_alt, 3]).mean()
        )
        out["delta_marker_length_max"] = float(
            np.nanmax(np.abs(ref[both_alt, 2] - ours[both_alt, 2]))
        )
    out["distance_delta_max"] = float(alld.max())
    out["distance_delta_mean"] = float(alld.mean())
    out["pass_0p1m"] = bool(alld.max() <= 0.1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--altitude", type=float, default=40.0)
    ap.add_argument("--workdir", default="/tmp/aruco_parity")
    ap.add_argument("--xla_preproc", action="store_true",
                    help="force the XLA preprocessing path (e.g. on CPU)")
    ap.add_argument("--force_cpu", action="store_true",
                    help="run our pipeline on the host CPU backend")
    ap.add_argument("--source_lidar", action="store_true",
                    help="measure from the projected Lidar point instead of "
                         "the host marker centre (reference sourceLidar)")
    ap.add_argument("--use_centroid_data", action="store_true",
                    help="also feed the vendored DCNN CSV to both sides and "
                         "diff the 22-col schema (reference :105-123,131-139)")
    ap.add_argument("--dcnn_csv",
                    default=os.path.join(REPO, "data", "static_dcnn_data.csv"))
    ap.add_argument("--out", default=None,
                    help="also write the JSON summary to this path")
    ap.add_argument("--led_bias", type=float, nargs=2, default=None,
                    help="pass --led_bias to our CLI (cv2 corner-bias compat)")
    ap.add_argument("--skip_render", action="store_true",
                    help="reuse frames already in workdir")
    args = ap.parse_args()

    if args.force_cpu:
        # The renderer also runs JAX (utils.synthetic jitted scene grids);
        # force CPU in THIS process too, or a dead TPU tunnel hangs the
        # render step before the flag ever reaches the CLI subprocess.
        import jax
        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.workdir, exist_ok=True)
    frames_dir = os.path.join(args.workdir, "frames")
    if not args.skip_render:
        frames_dir = render_frames(args.workdir, args.frames, args.altitude)
    dcnn_csv = args.dcnn_csv if args.use_centroid_data else None
    ref_csv = run_reference(args.workdir, frames_dir, args.frames,
                            args.use_centroid_data, dcnn_csv, args.source_lidar)
    ours_csv = run_ours(args.workdir, frames_dir, args.frames, args.xla_preproc,
                        args.force_cpu, dcnn_csv, args.source_lidar)
    summary = compare(ref_csv, ours_csv, args.use_centroid_data)
    summary["config"] = {
        "frames": args.frames, "altitude": args.altitude,
        "use_centroid_data": args.use_centroid_data,
        "xla_preproc": args.xla_preproc, "force_cpu": args.force_cpu,
        "source_lidar": args.source_lidar, "led_bias": args.led_bias,
    }
    print(json.dumps(summary, indent=2))
    print(json.dumps({"parity_pass": summary["pass_0p1m"],
                      "distance_delta_max_m": summary["distance_delta_max"]}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
