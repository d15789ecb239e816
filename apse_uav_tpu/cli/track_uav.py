"""Vehicle tracking over a UAV sequence -> DCNN comparison CSV.

Equivalent of dcnn/scripts/tests/visualize_uav.py: runs the Mask R-CNN
tracker over a 4K video (or image directory), logs per-frame mask centroids
and closest-points-to-host into the 17-column CSV consumed by the ArUco
pipeline (aruco_detect.py:105-123), and optionally writes visualized frames.

Usage:
    python -m apse_uav_tpu.cli.track_uav --video seq.mp4 \
        --weights model_final.pkl --num_classes 4 --host_id 4 \
        --log_file dcnn_data.csv [--write_images out/ --preprocess cam.json]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--video", help="input video path")
    src.add_argument("--images", help="input image directory")
    p.add_argument("--weights", required=True, help="detector checkpoint (.pkl/.pth)")
    p.add_argument("--assoc_weights", default=None, help="association head checkpoint (orbax dir)")
    p.add_argument("--depth", type=int, default=101, choices=(50, 101))
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--confidence", type=float, default=0.5)
    p.add_argument("--host_id", type=int, default=4, help="host (Ford) track id for closest points")
    p.add_argument("--log_file", default=None, help="write the 17-col DCNN CSV here")
    p.add_argument("--write_images", default=None, help="directory for visualized frames")
    p.add_argument("--start_frame", type=int, default=0)
    p.add_argument("--stop_frame", type=int, default=None)
    p.add_argument("--batch", type=int, default=4, help="frames per detector batch")
    p.add_argument("--bf16", action="store_true", help="bf16 backbone/head compute (f32 params; ~2x MXU throughput)")
    p.add_argument("--preprocess", default=None, help="cam_params.json: undistort+gamma frames first (visualize_uav.py preprocess_img)")
    return p


def _frames(args):
    import cv2

    if args.video:
        video = cv2.VideoCapture(args.video)
        idx = 0
        while True:
            ret, frame = video.read()
            if not ret:
                return
            if idx >= args.start_frame and (args.stop_frame is None or idx <= args.stop_frame):
                yield idx, frame
            idx += 1
            if args.stop_frame is not None and idx > args.stop_frame:
                return
    else:
        names = sorted(os.listdir(args.images))
        for idx, name in enumerate(names):
            if idx < args.start_frame:
                continue
            if args.stop_frame is not None and idx > args.stop_frame:
                return
            yield idx, cv2.imread(os.path.join(args.images, name))


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import dataclasses

    import jax

    from apse_uav_tpu.dcnn.config import TrackerConfig, mask_rcnn_r50_fpn, mask_rcnn_r101_fpn
    from apse_uav_tpu.dcnn.engines import RcnnTracker
    from apse_uav_tpu.dcnn.models.association import AssociationHead
    from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN
    from apse_uav_tpu.dcnn import weights as W
    from apse_uav_tpu.utils.mask_geometry import dcnn_log_line, write_dcnn_log
    from apse_uav_tpu.utils.visualizer import TrackVisualizer

    make = mask_rcnn_r50_fpn if args.depth == 50 else mask_rcnn_r101_fpn
    cfg = make(num_classes=args.num_classes)
    cfg = dataclasses.replace(cfg, roi=dataclasses.replace(cfg.roi, score_thresh_test=args.confidence))
    if args.bf16:
        cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")

    frames = _frames(args)
    first_idx, first = next(frames)
    orig_hw = first.shape[:2]

    pre = None
    if args.preprocess:
        from apse_uav_tpu.core.camera import load_camera_params
        from apse_uav_tpu.preproc.remap import Preprocessor

        mtx, dist = load_camera_params(args.preprocess)
        pre = Preprocessor(mtx, dist, (orig_hw[1], orig_hw[0]))

    model = MaskRCNN(cfg=cfg)
    import jax.numpy as jnp

    params = jax.jit(
        lambda rng: model.init(rng, jnp.zeros((1, 64, 64, 3)), mode="inference")["params"]
    )(jax.random.PRNGKey(0))
    flat = W.map_detectron2_weights(W.load_torch_file(args.weights), args.depth, cfg.mask_on)
    params, missing, unused = W.load_into_params(params, flat)
    if missing:
        print(f"warning: {len(missing)} params not found in checkpoint (left at init)")

    tcfg = TrackerConfig()
    head = AssociationHead(embedding_dim=tcfg.embedding_dim)
    assoc_params = head.init(
        jax.random.PRNGKey(1), jnp.zeros((1, cfg.fpn_channels, tcfg.roi_size, tcfg.roi_size))
    )["params"]
    if args.assoc_weights:
        from apse_uav_tpu.train.checkpoint import load_state

        state = load_state(os.path.dirname(args.assoc_weights) or ".", os.path.basename(args.assoc_weights))
        if state is not None:
            assoc_params = state["params"]

    tracker = RcnnTracker(cfg, tcfg, params, assoc_params, orig_hw)
    vis = TrackVisualizer() if args.write_images else None
    if args.write_images:
        os.makedirs(args.write_images, exist_ok=True)

    log_lines: list[str] = []
    max_obj_id = 0
    batch_frames, batch_idxs = [first], [first_idx]
    t_start = time.time()
    n_done = 0

    def dispatch(batch_frames, batch_idxs):
        """Enqueue detect+associate for a batch; no host sync."""
        arr = np.stack(batch_frames)
        if pre is not None:
            import jax.numpy as jnp

            # Stay on device: materializing the preprocessed 4K RGB on the
            # host would round-trip hundreds of MB per batch and stall the
            # pipeline; the predictor consumes device arrays directly.
            arr, _ = pre(jnp.asarray(arr))
        return tracker.process_frames_async(arr), batch_frames, batch_idxs

    def consume(pending):
        nonlocal max_obj_id, n_done
        handle, batch_frames, batch_idxs = pending
        recents = tracker.materialize(handle)
        for b, idx in enumerate(batch_idxs):
            recent = {k: v[b] for k, v in recents.items()}
            if args.log_file:
                line, highest = dcnn_log_line(recent, args.host_id, idx, orig_hw)
                log_lines.append(line)
                max_obj_id = max(max_obj_id, highest)
            if vis is not None:
                import cv2

                drawn = vis.draw(batch_frames[b], recent)
                cv2.imwrite(os.path.join(args.write_images, f"image_{idx:04d}.png"), drawn)
        n_done += len(batch_idxs)
        fps = n_done / (time.time() - t_start)
        print(f"frame {batch_idxs[-1]}: {fps:.2f} fps", end="\r")

    # One-batch-deep software pipeline: batch N+1's detection runs on device
    # while the host writes batch N's CSV rows / visualizations.
    pending = None
    for idx, frame in frames:
        batch_frames.append(frame)
        batch_idxs.append(idx)
        if len(batch_frames) == args.batch:
            nxt = dispatch(batch_frames, batch_idxs)
            if pending is not None:
                consume(pending)
            pending = nxt
            batch_frames, batch_idxs = [], []
    if batch_frames:
        nxt = dispatch(batch_frames, batch_idxs)
        if pending is not None:
            consume(pending)
        pending = nxt
    if pending is not None:
        consume(pending)
    print()

    if args.log_file:
        write_dcnn_log(args.log_file, log_lines, args.host_id, max_obj_id)
        print(f"wrote {args.log_file} ({len(log_lines)} rows, {max_obj_id} ids)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
