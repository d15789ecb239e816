#!/usr/bin/env python
"""Planar-pose ambiguity analysis against the executed reference oracle.

A square marker seen near-nadir admits two pose solutions ("basins") with
near-identical reprojection error; the bbox-distance column depends on which
one a solver lands in.  This tool quantifies, on a rendered parity scene:

1. ``track``: per frame, which of OUR two refined basins the oracle's
   d_bbox value matches, alongside our residual gap and basin swap flag —
   the measurement behind pipeline.veh_distance's minimax 50/50 average
   (the oracle's pick is NOT predictable from our side: neither our
   best-residual basin nor our homography-init basin tracks it).
2. ``cv2noise``: the oracle's OWN stability — re-run cv2.solvePnP
   (SOLVEPNP_ITERATIVE, the reference's estimatePoseSingleMarkers path,
   /root/reference/aruco_detect.py:601) on one frame's cv2-detected corners
   under +-eps px uniform corner noise, N trials, and report how often the
   solution lands in each basin.  A 50/50-ish split demonstrates the
   oracle's bbox column is noise-unstable at that operating point, which
   caps achievable per-frame parity at half the basin separation.

Usage:
    python scripts/analyze_pose_basins.py track <workdir> <n_frames>
    python scripts/analyze_pose_basins.py cv2noise <frame.png> [eps_px=0.05] [trials=50]
"""

import sys

import numpy as np

REPO = __file__.rsplit("/scripts/", 1)[0]
sys.path.insert(0, REPO)


def track(workdir: str, n: int) -> None:
    import importlib.util

    import cv2
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    spec = importlib.util.spec_from_file_location("pc", f"{REPO}/scripts/parity_check.py")
    pc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pc)

    from apse_uav_tpu.aruco.pipeline import ArucoPipeline, ArucoPipelineConfig, init_carry
    from apse_uav_tpu.core.camera import load_camera_params

    mtx, dist = load_camera_params(f"{REPO}/data/cam_params.json")
    pipe = ArucoPipeline(mtx, dist, (3840, 2160), ArucoPipelineConfig(use_pallas_preproc=False))
    carry = init_carry(pipe.cfg)
    frames_all = [
        cv2.imread(f"{workdir}/frames/image_{k:04d}.png").transpose(2, 0, 1)
        for k in range(1, n + 1)
    ]
    res = {k: [] for k in ("a", "b", "gap", "swap", "aflat")}
    first = True
    B = 6
    for s in range(0, n, B):
        batch = jnp.asarray(np.stack(frames_all[s : s + B]))
        carry, out = pipe.process(batch, carry, first=first)
        first = False
        res["a"].append(np.asarray(out["dist_bbox_basin_a"]))
        res["b"].append(np.asarray(out["dist_bbox_basin_b"]))
        res["gap"].append(np.asarray(out["pose_gap"]))
        res["swap"].append(np.asarray(out["pose_swapped"]))
        res["aflat"].append(np.asarray(out["basin_a_is_flat"]))
    a, b, gap, swap, aflat = (np.concatenate(res[k]) for k in ("a", "b", "gap", "swap", "aflat"))
    ref = pc.read_results(f"{workdir}/ref.csv", 16)[:n]
    stats = {v: [0, 0] for v in (1, 2, 3)}
    flat_stats = {v: [0, 0] for v in (1, 2, 3)}
    init_stats = {v: [0, 0] for v in (1, 2, 3)}
    flat_stats = {v: [0, 0] for v in (1, 2, 3)}
    print("frame veh  ref    dA     dB     gap    |ref-dA| |ref-dB| oracle_on")
    for v in range(3):
        dc = 7 + v * 3
        for k in range(min(n, len(ref))):
            if abs(a[k, v] - b[k, v]) <= 0.02:
                continue  # basins agree; nothing to attribute
            r = ref[k, dc + 2]
            ea, eb = abs(r - round(a[k, v], 3)), abs(r - round(b[k, v], 3))
            on_a = ea <= eb
            stats[v + 1][0 if on_a else 1] += 1
            init_stats[v + 1][0 if on_a != bool(swap[k, v]) else 1] += 1
            on_flat = on_a == bool(aflat[k, v])
            flat_stats[v + 1][0 if on_flat else 1] += 1
            print(
                f"{k + 1:3d} veh{v + 1} {r:6.3f} {a[k, v]:6.3f} {b[k, v]:6.3f}"
                f" {gap[k, v]:7.4f} {ea:6.3f} {eb:6.3f} {'A' if on_a else 'B'}"
            )
    print("oracle on [best-residual, other] basin (frames where basins differ):", stats)
    print("oracle on [init, mirrored] basin:", init_stats)
    print("oracle on [flat, tilted] basin:", flat_stats)


def cv2noise(frame_path: str, eps: float = 0.05, trials: int = 50) -> None:
    import cv2

    from apse_uav_tpu.core.camera import load_camera_params

    mtx, dist = load_camera_params(f"{REPO}/data/cam_params.json")
    img = cv2.imread(frame_path)
    gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_50)
    p = cv2.aruco.DetectorParameters()
    p.minMarkerPerimeterRate = 0.01
    p.errorCorrectionRate = 2.0
    p.cornerRefinementMethod = cv2.aruco.CORNER_REFINE_APRILTAG
    corners, ids, _ = cv2.aruco.ArucoDetector(d, p).detectMarkers(gray)
    assert ids is not None
    half = 0.55 / 2.0
    obj = np.array(
        [[-half, half, 0], [half, half, 0], [half, -half, 0], [-half, -half, 0]], np.float64
    )
    rng = np.random.default_rng(0)
    for c, i in sorted(zip(corners, ids.ravel()), key=lambda t: t[1]):
        c = c.reshape(4, 2).astype(np.float64)
        normals = []
        for _ in range(trials):
            cn = c + rng.uniform(-eps, eps, c.shape)
            ok, rv, _tv = cv2.solvePnP(
                obj, cn.reshape(4, 1, 2), mtx, np.asarray(dist), flags=cv2.SOLVEPNP_ITERATIVE
            )
            r_mat, _ = cv2.Rodrigues(rv)
            normals.append(r_mat[:, 2])
        normals = np.asarray(normals)
        # Cluster the plane normals into the two basins by sign against the
        # first trial's normal component orthogonal to the mean.
        mean = normals.mean(axis=0)
        mean /= np.linalg.norm(mean)
        dev = normals - normals @ mean[:, None] * mean
        axis = dev[np.argmax(np.linalg.norm(dev, axis=1))]
        s = dev @ axis
        frac = float((s > 0).mean())
        spread = np.degrees(
            np.arccos(np.clip(normals @ mean, -1, 1))
        ).max()
        print(
            f"id {int(i)}: basin split {frac:.2f}/{1 - frac:.2f} over {trials} trials "
            f"(+-{eps} px corner noise), normal spread {spread:.2f} deg "
            f"{'UNSTABLE' if 0.1 < frac < 0.9 and spread > 1.0 else 'stable'}"
        )


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "track":
        track(sys.argv[2], int(sys.argv[3]))
    elif mode == "cv2noise":
        cv2noise(
            sys.argv[2],
            float(sys.argv[3]) if len(sys.argv) > 3 else 0.05,
            int(sys.argv[4]) if len(sys.argv) > 4 else 50,
        )
    else:
        raise SystemExit(__doc__)
