"""Tracker test harnesses (standard_rcnn_tracker_test.py equivalent).

Modes:
* ``--sequence DIR``  — run over an image directory with FPS timing
  (reference :98-135).
* ``--mots_evaluation SEQMAP --kitti_root DIR`` — write uint16 id PNG
  results per KITTI-MOTS sequence for mots_eval (reference :164-200).
* ``--webcam`` — live camera loop (reference :74-95).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    mode = p.add_mutually_exclusive_group(required=True)
    mode.add_argument("--sequence", help="image directory")
    mode.add_argument("--mots_evaluation", help="seqmap file")
    mode.add_argument("--webcam", action="store_true")
    mode.add_argument("--video", help="video file path or stream URL (reference --youtube "
                      "harness: pafy is dead, so resolve page URLs to stream URLs with "
                      "yt-dlp -g first; direct files/RTSP/HTTP streams work as-is)")
    p.add_argument("--kitti_root", default=None, help="KITTI-MOTS images root (one dir per sequence)")
    p.add_argument("--output_dir", default="mots_results")
    p.add_argument("--weights", default=None, help="detectron2-format .pkl/.pth weights")
    p.add_argument("--checkpoint", default=None,
                   help="native checkpoint saved by the training loops "
                        "(path to the named orbax dir, e.g. workdir/bestAP)")
    p.add_argument("--assoc_weights", default=None)
    p.add_argument("--depth", type=int, default=101, choices=(26, 50, 101))
    p.add_argument("--num_classes", type=int, default=80)
    p.add_argument("--bf16", action="store_true", help="bf16 backbone/head compute (f32 params)")
    p.add_argument("--confidence", type=float, default=0.5)
    p.add_argument("--association", default=None,
                   choices=("embeddings", "bbox_center_dist", "mask_iou"),
                   help="association metric (rcnn_tracker.py:79-147)")
    p.add_argument("--batch", type=int, default=4)
    # Scale knobs for small-scale runs (synthetic MOTS e2e, CPU hosts).
    p.add_argument("--min_size", type=int, default=None, help="override INPUT min_size_test")
    p.add_argument("--max_size", type=int, default=None, help="override INPUT max_size_test")
    p.add_argument("--proposal_topk", type=int, default=None,
                   help="override RPN pre/post-NMS test top-k")
    p.add_argument("--detections", type=int, default=None, help="override detections per image")
    p.add_argument("--pixel_norm", choices=("caffe", "unit"), default="caffe",
                   help="'unit' = mean 128 / std 64 (scratch-trained models)")
    p.add_argument("--force_cpu", action="store_true")
    return p


def _build_tracker(args, orig_hw):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from apse_uav_tpu.dcnn.config import TrackerConfig, mask_rcnn_r50_fpn, mask_rcnn_r101_fpn
    from apse_uav_tpu.dcnn.engines import RcnnTracker
    from apse_uav_tpu.dcnn.models.association import AssociationHead
    from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN
    from apse_uav_tpu.dcnn import weights as W

    make = mask_rcnn_r50_fpn if args.depth != 101 else mask_rcnn_r101_fpn
    cfg = make(num_classes=args.num_classes)
    if args.depth == 26:
        cfg = dataclasses.replace(cfg, depth=26)
    cfg = dataclasses.replace(cfg, roi=dataclasses.replace(cfg.roi, score_thresh_test=args.confidence))
    if args.bf16:
        cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    inp = cfg.input
    if args.min_size:
        inp = dataclasses.replace(inp, min_size_test=args.min_size)
    if args.max_size:
        inp = dataclasses.replace(inp, max_size_test=args.max_size)
    if args.pixel_norm == "unit":
        inp = dataclasses.replace(inp, pixel_mean=(128.0,) * 3, pixel_std=(64.0,) * 3)
    cfg = dataclasses.replace(cfg, input=inp)
    if args.proposal_topk:
        cfg = dataclasses.replace(cfg, rpn=dataclasses.replace(
            cfg.rpn, pre_nms_topk_test=args.proposal_topk, post_nms_topk_test=args.proposal_topk))
    if args.detections:
        cfg = dataclasses.replace(cfg, roi=dataclasses.replace(
            cfg.roi, detections_per_image=args.detections))
    model = MaskRCNN(cfg=cfg)
    params = jax.jit(
        lambda rng: model.init(rng, jnp.zeros((1, 64, 64, 3)), mode="inference")["params"]
    )(jax.random.PRNGKey(0))
    if args.checkpoint:
        from apse_uav_tpu.train.checkpoint import load_state

        state = load_state(os.path.dirname(args.checkpoint) or ".", os.path.basename(args.checkpoint))
        if state is None:
            raise SystemExit(f"checkpoint not found: {args.checkpoint}")
        loaded = state["params"] if "params" in state else state
        params, missing, _ = W.load_into_params(params, W.flatten(loaded))
        if missing:
            print(f"warning: {len(missing)} params left at init")
    elif args.weights:
        flat = W.map_detectron2_weights(W.load_torch_file(args.weights), args.depth, cfg.mask_on)
        params, missing, _ = W.load_into_params(params, flat)
        if missing:
            print(f"warning: {len(missing)} params left at init")
    else:
        raise SystemExit("one of --weights / --checkpoint is required")
    tcfg = TrackerConfig()
    if args.association:
        tcfg = dataclasses.replace(tcfg, association_metric=args.association)
    head = AssociationHead(embedding_dim=tcfg.embedding_dim)
    assoc_params = head.init(
        jax.random.PRNGKey(1), jnp.zeros((1, cfg.fpn_channels, tcfg.roi_size, tcfg.roi_size))
    )["params"]
    if args.assoc_weights:
        from apse_uav_tpu.train.checkpoint import load_state

        state = load_state(os.path.dirname(args.assoc_weights) or ".", os.path.basename(args.assoc_weights))
        if state is not None:
            assoc_params = state["params"]
    return RcnnTracker(cfg, tcfg, params, assoc_params, orig_hw)


def run_sequence(args) -> int:
    import cv2

    names = sorted(os.listdir(args.sequence))
    first = cv2.imread(os.path.join(args.sequence, names[0]))
    tracker = _build_tracker(args, first.shape[:2])
    times = []
    for start in range(0, len(names), args.batch):
        chunk = names[start : start + args.batch]
        frames = np.stack([cv2.imread(os.path.join(args.sequence, n)) for n in chunk])
        t0 = time.perf_counter()
        tracker.process_frames(frames)
        dt = time.perf_counter() - t0
        times.append(dt / len(chunk))
        print(f"frame {start + len(chunk)}/{len(names)}: {len(chunk) / dt:.2f} fps", end="\r")
    print(f"\naverage fps: {1.0 / np.mean(times[1:] or times):.2f}")
    return 0


def run_mots(args) -> int:
    from PIL import Image

    from apse_uav_tpu.evaluation.mots import load_seqmap
    from apse_uav_tpu.evaluation.mots_export import result_image_from_recent

    seq_names, max_frames = load_seqmap(args.mots_evaluation)
    for seq in seq_names:
        seq_dir = os.path.join(args.kitti_root, seq)
        out_dir = os.path.join(args.output_dir, seq)
        os.makedirs(out_dir, exist_ok=True)
        names = sorted(os.listdir(seq_dir))[: max_frames[seq] + 1]
        import cv2

        first = cv2.imread(os.path.join(seq_dir, names[0]))
        tracker = _build_tracker(args, first.shape[:2])
        for start in range(0, len(names), args.batch):
            chunk = names[start : start + args.batch]
            frames = np.stack([cv2.imread(os.path.join(seq_dir, n)) for n in chunk])
            recents = tracker.process_frames(frames)
            for b, name in enumerate(chunk):
                recent = {k: v[b] for k, v in recents.items()}
                img = result_image_from_recent(recent, first.shape[:2])
                Image.fromarray(img).save(os.path.join(out_dir, f"{start + b:06d}.png"))
        print(f"sequence {seq}: wrote {len(names)} result images")
    return 0


def run_webcam(args) -> int:
    return _run_capture(args, 0, "no webcam available")


def run_video(args) -> int:
    """Stream/video harness (standard_rcnn_tracker_test.py:138-161).

    The reference resolved YouTube page URLs with pafy; that library is
    unmaintained, so this takes anything cv2.VideoCapture opens (files,
    RTSP/HTTP streams, or a stream URL from ``yt-dlp -g``).
    """
    return _run_capture(args, args.video, f"cannot open {args.video}")


def _run_capture(args, source, err) -> int:
    import cv2

    from apse_uav_tpu.utils.visualizer import TrackVisualizer

    cam = cv2.VideoCapture(source)
    ret, frame = cam.read()
    if not ret:
        print(err)
        return 1
    tracker = _build_tracker(args, frame.shape[:2])
    vis = TrackVisualizer()
    while True:
        ret, frame = cam.read()
        if not ret:
            break
        recent = tracker.next_frame(frame)
        cv2.imshow("tracking", vis.draw(frame, recent))
        if cv2.waitKey(1) == ord("q"):
            break
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.sequence:
        return run_sequence(args)
    if args.mots_evaluation:
        if not args.kitti_root:
            raise SystemExit("--mots_evaluation requires --kitti_root")
        return run_mots(args)
    if args.video:
        return run_video(args)
    return run_webcam(args)


if __name__ == "__main__":
    raise SystemExit(main())
