"""ArUco measurement CLI — the reference aruco_detect.py re-hosted on TPU.

Flags mirror the reference's user-constant block (aruco_detect.py:13-87);
input/output conventions are preserved: images named ``image_%04d.png``, the
cam_params.json format, the DCNN centroid CSV, and both result CSV schemas.

Frames are read on the host (cv2), batched, and processed by the jitted
TPU pipeline (preproc -> detection -> pose -> temporal scan); rows stream to
the CSV writer.

Usage:
    python -m apse_uav_tpu.cli.aruco_detect \
        --path_camera_params data/cam_params.json \
        --use_images --path_input_images frames/ \
        --save_results --path_output_results out.csv
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--start_frame", type=int, default=1)
    p.add_argument("--stop_frame", type=int, default=None)
    p.add_argument("--step_frame", type=int, default=1)
    p.add_argument("--save_results", action="store_true")
    p.add_argument("--save_images", action="store_true")
    p.add_argument("--use_centroid_data", action="store_true")
    p.add_argument("--N_avg", type=int, default=1)
    p.add_argument("--LEDs_threshold", type=float, default=None)
    p.add_argument("--led_bias", type=float, nargs=2, default=(0.0, 0.0),
                   metavar=("DX", "DY"),
                   help="cv2-compat shift (px) of projected LED sample points "
                        "(the oracle's measured corner bias; scripts/analyze_leds.py)")
    p.add_argument("--source_lidar", dest="sourceLidar", action="store_true")
    p.add_argument("--path_camera_params", required=True)
    p.add_argument("--use_images", action="store_true")
    p.add_argument("--path_input_images", default=None)
    p.add_argument("--use_video", action="store_true")
    p.add_argument("--path_input_video", default=None)
    p.add_argument("--path_dcnn_data", default=None)
    p.add_argument("--path_output_results", default=None)
    p.add_argument("--path_output_images", default=None)
    p.add_argument("--batch", type=int, default=8, help="frames per device batch")
    p.add_argument("--width", type=int, default=3840)
    p.add_argument("--height", type=int, default=2160)
    p.add_argument("--display", action="store_true",
                   help="live annotated view (reference aruco_detect.py:787-800 imshow loop; 'q' quits)")
    p.add_argument("--xla_preproc", action="store_true", help="use the XLA (non-Pallas) preprocessing path")
    p.add_argument("--force_cpu", action="store_true",
                   help="run on the host CPU backend (the JAX_PLATFORMS env "
                        "var is ignored when a site override pre-registers an "
                        "accelerator; this flips the platform in-process)")
    return p


def _frame_reader(args):
    """Yield (k, frame_bgr_u8) respecting start/stop/step semantics."""
    import cv2

    if args.use_images:
        stop = args.stop_frame
        if stop is None:
            stop = len(os.listdir(args.path_input_images))
        k = args.start_frame
        while k <= stop:
            path = os.path.join(args.path_input_images, "image_%04d.png" % k)
            frame = cv2.imread(path)
            if frame is None:
                break
            yield k, frame
            k += args.step_frame
    else:
        video = cv2.VideoCapture(args.path_input_video)
        k = args.start_frame
        for _ in range(args.start_frame - 1):
            ret, _ = video.read()
            if not ret:
                return
        stop = args.stop_frame if args.stop_frame is not None else np.inf
        while k <= stop and video.isOpened():
            ret, frame = video.read()
            if not ret:
                break
            yield k, frame
            k += args.step_frame
            for _ in range(args.step_frame - 1):
                ret, _ = video.read()
                if not ret:
                    break
        video.release()


def _annotate(frame: np.ndarray, row: dict) -> np.ndarray:
    """Draw detections + measurements onto the frame (reference
    printDataOnImage :310-333 / drawLinesOnImage :494-514 in spirit)."""
    import cv2

    img = frame.copy()
    font = cv2.FONT_HERSHEY_SIMPLEX
    corners = row["corners"]  # (4 slots, 4, 2) xy
    detected = row["detected"]
    centers = []
    for v in range(4):
        if not detected[v]:
            centers.append(None)
            continue
        quad = corners[v].astype(np.int32)
        cv2.polylines(img, [quad.reshape(-1, 1, 2)], True, (0, 255, 0), 2)
        c = quad.mean(axis=0).astype(int)
        centers.append(c)
        cv2.putText(img, f"id {v + 1}", tuple(c + np.array([6, -6])), font, 0.9, (0, 255, 255), 2)
    host = centers[3]
    if host is not None:
        for v in range(3):
            if centers[v] is None:
                continue
            cv2.line(img, tuple(host), tuple(centers[v]), (255, 128, 0), 2)
            mid = ((host + centers[v]) // 2).astype(int)
            cv2.putText(img, f"{row['dist_aruco'][v]:.2f} m", tuple(mid), font, 0.9, (255, 128, 0), 2)
        cv2.putText(
            img,
            f"alt {row['altitude']:.1f} m  L {row['marker_length']:.3f}  LEDs {int(row['leds'])}",
            (20, 40), font, 1.0, (255, 255, 255), 2,
        )
    return img


def _save_annotated(out_dir: str, k: int, frame: np.ndarray, row: dict) -> None:
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    cv2.imwrite(os.path.join(out_dir, f"image_{k:04d}.png"), _annotate(frame, row))


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not args.use_images and not args.use_video:
        print("error: choose --use_images or --use_video", file=sys.stderr)
        return 2

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from apse_uav_tpu.aruco.pipeline import ArucoPipeline, ArucoPipelineConfig, init_carry
    from apse_uav_tpu.core import camera
    from apse_uav_tpu.utils import csv_io

    mtx, dist = camera.load_camera_params(args.path_camera_params)
    cfg = ArucoPipelineConfig(
        n_avg=args.N_avg,
        step_frame=args.step_frame,
        use_centroid_data=args.use_centroid_data,
        source_lidar=args.sourceLidar,
        leds_threshold=args.LEDs_threshold,
        led_bias_px=tuple(args.led_bias),
        use_pallas_preproc=not args.xla_preproc,
    )
    pipe = ArucoPipeline(mtx, dist, (args.width, args.height), cfg)
    carry = init_carry(cfg)

    centroid_data = None
    if args.use_centroid_data:
        centroid_data = csv_io.read_centroid_data(args.path_dcnn_data)

    writer = None
    if args.save_results:
        writer = csv_io.ResultsWriter(args.path_output_results, args.use_centroid_data)

    batch_ks: list[int] = []
    batch_frames: list[np.ndarray] = []
    n_frames = 0
    t_start = time.perf_counter()
    first_batch = True

    def dispatch():
        """Enqueue one batch; the temporal carry threads through ON DEVICE,
        so the next batch can dispatch before this one's host read."""
        nonlocal carry, first_batch
        frames = jnp.asarray(np.stack(batch_frames).transpose(0, 3, 1, 2))
        crows = None
        if centroid_data is not None:
            idx = np.clip(np.asarray(batch_ks) - 1, 0, len(centroid_data) - 1)
            crows = jnp.asarray(centroid_data[idx], jnp.int32)
        carry, out = pipe.process(frames, carry, first=first_batch, centroid_rows=crows)
        first_batch = False
        pending = (out, list(batch_ks), list(batch_frames))
        batch_ks.clear()
        batch_frames.clear()
        return pending

    def consume(pending):
        nonlocal n_frames
        out, ks, frames_list = pending
        out = {k: np.asarray(v) for k, v in out.items()}
        for i, k in enumerate(ks):
            if writer is not None:
                writer.write_frame(k, {key: out[key][i] for key in out})
            if args.save_images and args.path_output_images:
                _save_annotated(
                    args.path_output_images, k, frames_list[i],
                    {key: out[key][i] for key in out},
                )
        n_frames += len(ks)

    # One-batch-deep software pipeline: batch N+1's device work (preproc +
    # detect + pose + scan) overlaps batch N's host-side CSV/image writes
    # and the NEXT batch's frame decode.
    pending = None
    for k, frame in _frame_reader(args):
        if frame.shape[:2] != (args.height, args.width):
            raise SystemExit(f"frame {k} has shape {frame.shape}, expected {(args.height, args.width)}")
        batch_ks.append(k)
        batch_frames.append(frame)
        if len(batch_ks) == args.batch:
            nxt = dispatch()
            if pending is not None:
                consume(pending)
            pending = nxt
    if batch_ks:
        nxt = dispatch()
        if pending is not None:
            consume(pending)
        pending = nxt
    if pending is not None:
        consume(pending)

    if writer is not None:
        writer.close()
    dt = time.perf_counter() - t_start
    if n_frames:
        print(f"processed {n_frames} frames in {dt:.2f}s ({n_frames / dt:.1f} fps)")
    else:
        print("no frames processed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
