#!/usr/bin/env python
"""Attribute the 65 m LED-decode divergence: pose vs gray vs sampling.

Replicates BOTH implementations' detectAndDrawLEDs chain
(/root/reference/aruco_detect.py:338-373) transparently on the same rendered
frames, then cross-evaluates the four (pose, gray) combinations:

  bits(pose_cv,  gray_cv)   == the reference oracle's LED value
  bits(pose_ours, gray_ours) == our pipeline's LED value
  bits(pose_cv,  gray_ours), bits(pose_ours, gray_cv)  -> attribution

If swapping the GRAY flips bits, the divergence is preprocessing-value noise
at the disc edges; if swapping the POSE flips them, it is projected-point
shifts from pose differences.  Prints per-frame, per-LED sampled window
means against the threshold so near-threshold chaos is visible directly.

Usage: python scripts/analyze_leds.py --altitude 65 --frames 12
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

AXIS_LEDS = np.float32([
    [-0.419, -0.42, 0], [-0.414, -0.305, 0], [-0.409, -0.19, 0],
    [-0.404, -0.07, 0], [-0.399, 0.065, 0], [-0.393, 0.19, 0],
    [-0.388, 0.315, 0], [-0.382, 0.435, 0],
])
MARKER_DIV = 1.2
DIV = 1.013
MARKER_LENGTH_ORG = 0.55


def marker_length_correction(altitude: float) -> float:
    return MARKER_LENGTH_ORG * (1 - 0.00057 * altitude / MARKER_DIV) / DIV


def sample_5x5(gray: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """gray[y-2:y+3, x-2:x+3] mean with the reference's Python-slice
    semantics (empty when y<2 or x<2; clipped at the far edges)."""
    vals = np.zeros(len(pts))
    for j, (x, y) in enumerate(pts):
        x, y = int(x), int(y)
        win = gray[max(y - 2, 0) if y >= 2 else 0: y + 3, max(x - 2, 0) if x >= 2 else 0: x + 3]
        if y < 2 or x < 2:
            win = gray[0:0, 0:0]  # reference: negative start wraps -> empty
        vals[j] = win.sum() / 25.0 if win.size else 0.0
    return vals


def bits_of(vals: np.ndarray, thr: float) -> int:
    return int(sum(int(v > thr) << (7 - j) for j, v in enumerate(vals)))


def main():
    import cv2

    ap = argparse.ArgumentParser()
    ap.add_argument("--altitude", type=float, default=65.0)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()
    workdir = args.workdir or f"/tmp/led_diag_{int(args.altitude)}"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from scripts.parity_check import render_frames

    frames_dir = os.path.join(workdir, "frames")
    if not os.path.isdir(frames_dir) or len(os.listdir(frames_dir)) < args.frames:
        os.makedirs(workdir, exist_ok=True)
        render_frames(workdir, args.frames, args.altitude)

    from apse_uav_tpu.core.camera import load_camera_params

    mtx, dist = load_camera_params(os.path.join(REPO, "data", "cam_params.json"))

    # --- cv2 side: preprocess + detect + solvePnP, reference scalar chain ---
    lut = np.empty((1, 256), np.uint8)
    for i in range(256):
        lut[0, i] = np.clip(pow(i / 255.0, 2) * 255.0, 0, 255)
    mapx, mapy = cv2.initUndistortRectifyMap(mtx, dist, None, mtx, (3840, 2160), 5)
    aruco = cv2.aruco
    det = aruco.ArucoDetector(aruco.getPredefinedDictionary(aruco.DICT_4X4_50))
    p = det.getDetectorParameters()
    p.cornerRefinementMethod = aruco.CORNER_REFINE_APRILTAG
    det.setDetectorParameters(p)

    half_obj = lambda L: np.array(
        [[-L / 2, L / 2, 0], [L / 2, L / 2, 0], [L / 2, -L / 2, 0], [-L / 2, -L / 2, 0]],
        np.float64,
    )

    cv_rows = []
    marker_length = MARKER_LENGTH_ORG
    for k in range(1, args.frames + 1):
        frame = cv2.imread(os.path.join(frames_dir, f"image_{k:04d}.png"))
        frame = cv2.remap(frame, mapx, mapy, cv2.INTER_LINEAR)
        lab = cv2.cvtColor(frame, cv2.COLOR_RGB2LAB)
        lab[..., 0] = cv2.LUT(lab[..., 0], lut)
        frame = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        corners, ids, _ = det.detectMarkers(gray)
        row = None
        if ids is not None:
            for c, i in zip(corners, np.asarray(ids).reshape(-1)):
                if i == 4:
                    ok, rv, tv = cv2.solvePnP(
                        half_obj(marker_length), c.reshape(4, 1, 2).astype(np.float64),
                        mtx, dist, flags=cv2.SOLVEPNP_ITERATIVE,
                    )
                    tv = tv.reshape(3)
                    pts, _ = cv2.projectPoints(AXIS_LEDS, rv, tv, mtx, dist)
                    pts = np.maximum(0, np.int32(pts).reshape(-1, 2))
                    thr = max(190 + int(tv[2] / MARKER_DIV), 240)
                    vals = sample_5x5(gray, pts)
                    fpts, _ = cv2.projectPoints(AXIS_LEDS, rv, tv, mtx, dist)
                    row = {"k": k, "pts": pts, "thr": thr, "vals": vals,
                           "bits": bits_of(vals, thr), "gray": gray,
                           "alt": tv[2], "rv": rv.reshape(3), "tv": tv,
                           "fpts": fpts.reshape(-1, 2),
                           "corners": c.reshape(4, 2)}
                    marker_length = marker_length_correction(tv[2])
        cv_rows.append(row)

    # --- our side: pipeline front + scan on CPU, then transparent re-sample -
    import jax.numpy as jnp

    from apse_uav_tpu.aruco.pipeline import ArucoPipeline, ArucoPipelineConfig, init_carry

    cfg = ArucoPipelineConfig(use_pallas_preproc=False)
    pipe = ArucoPipeline(mtx, dist, (3840, 2160), cfg)
    carry = init_carry(cfg)
    our_rows = []
    for k in range(1, args.frames + 1):
        img = cv2.imread(os.path.join(frames_dir, f"image_{k:04d}.png"))
        fr = jnp.asarray(np.transpose(img, (2, 0, 1))[None])
        carry_prev_len = float(carry["marker_length"])
        carry, out = pipe.scan(carry, pipe.front(fr),
                               jnp.array([k == 1]), jnp.zeros((1, 17), jnp.int32))
        f = pipe.front(fr)
        gray = np.asarray(f["gray"][0])
        rv = np.asarray(f["rvec"][0, 3], np.float64)
        utv = np.asarray(f["utvec"][0, 3], np.float64)
        tv = utv * carry_prev_len
        fpts, _ = cv2.projectPoints(AXIS_LEDS, rv, tv, mtx, dist)
        pts = np.maximum(0, np.int32(fpts).reshape(-1, 2))
        thr = max(190 + int(tv[2] / MARKER_DIV), 240)
        vals = sample_5x5(gray, pts)
        our_rows.append({"k": k, "pts": pts, "thr": thr, "vals": vals,
                         "bits": bits_of(vals, thr),
                         "pipe_leds": int(out["leds"][0]), "gray": gray,
                         "alt": float(tv[2]), "rv": rv, "tv": tv,
                         "fpts": fpts.reshape(-1, 2),
                         "corners": np.asarray(f["corners"][0, 3])})

    # --- cross-evaluation ----------------------------------------------------
    agree = {"ref_vs_ours": 0, "swap_gray": 0, "swap_pose": 0, "n": 0}
    for cvr, our in zip(cv_rows, our_rows):
        if cvr is None:
            continue
        agree["n"] += 1
        ref_bits = cvr["bits"]
        our_bits = our["bits"]
        # our pose + cv gray
        v_pg = sample_5x5(cvr["gray"], our["pts"])
        b_pose_swapped = bits_of(v_pg, cvr["thr"])
        # cv pose + our gray
        v_gp = sample_5x5(our["gray"], cvr["pts"])
        b_gray_swapped = bits_of(v_gp, cvr["thr"])
        agree["ref_vs_ours"] += ref_bits == our_bits
        agree["swap_pose"] += ref_bits == b_pose_swapped
        agree["swap_gray"] += ref_bits == b_gray_swapped
        print(f"frame {cvr['k']:3d}: thr ref {cvr['thr']} ours {our['thr']} | "
              f"bits ref {ref_bits:08b} ours {our_bits:08b} "
              f"(pipe {our['pipe_leds']:08b}) | ourpose+cvgray {b_pose_swapped:08b} "
              f"cvpose+ourgray {b_gray_swapped:08b}")
        dpts = our["pts"] - cvr["pts"]
        print(f"   pt deltas {dpts.tolist()}")
        with np.printoptions(precision=2, suppress=True):
            print(f"   float pt deltas {(our['fpts'] - cvr['fpts']).T}")
            dcorn = our["corners"] - cvr["corners"]
            print(f"   corner deltas (ours-cv) {dcorn.ravel()}  mean {dcorn.mean(axis=0)}")
        with np.printoptions(precision=1, suppress=True):
            print(f"   vals ref  {cvr['vals']}")
            print(f"   vals ours {our['vals']}")
    print(json.dumps(agree))


if __name__ == "__main__":
    main()
