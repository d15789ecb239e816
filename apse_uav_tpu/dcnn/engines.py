"""Runtime engines: detector wrapper, tracking engine, selective/timed scans.

TPU-native equivalents of the reference engine layer (dcnn/engines/):

* :class:`TrackPredictor` — resize + Mask R-CNN inference returning
  (detections, backbone features) (track_predictor.py:31-52).
* :class:`RcnnTracker` — per-frame detect/associate/update loop
  (rcnn_tracker.py:63-76), with a batched ``process_frames`` fast path that
  runs the detector over many frames at once and the association as a
  ``lax.scan`` — the throughput-oriented TPU layout.
* :class:`SelectivePredictor` — inference restricted to the coarsest RPN
  level with per-stage wall-clock timing (selective_rcnn.py ``scan``
  instrumentation, selective_rpn.py:47-48 last-level proposals).
"""

from __future__ import annotations

import time
import jax
import jax.numpy as jnp
import numpy as np

from apse_uav_tpu.dcnn.config import ModelConfig, TrackerConfig
from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN
from apse_uav_tpu.dcnn.models.c4 import build_model
from apse_uav_tpu.dcnn import structures, tracker as tracker_mod

Array = jax.Array


def linear_resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """The (n_in, n_out) operator of jax.image.resize linear along one axis.

    jax.image.resize(method="linear") is linear in the input, so the 1-D
    resize is a matrix: out = in @ M.  Replicates its antialiased triangle
    kernel analytically (kernel stretched by the downsample factor, weights
    normalized per output sample) — asserted equal to the real op in
    tests/test_engines.py.
    """
    scale = n_out / n_in
    j = np.arange(n_in, dtype=np.float64)[:, None]
    centers = (np.arange(n_out, dtype=np.float64)[None, :] + 0.5) / scale - 0.5
    stretch = min(scale, 1.0)
    w = np.maximum(0.0, 1.0 - np.abs(j - centers) * stretch)
    return (w / w.sum(axis=0, keepdims=True)).astype(np.float32)


def resize_frames_matmul(frames: Array, a_h: Array, a_w: Array) -> Array:
    """Bilinear-resize (B, H, W, C) frames via two separable MXU dots.

    Replaces u8->f32 cast + gather-based ``jax.image.resize`` on the 4K
    detect path (2.83 ms/frame of the engine's prep: a 100 MB f32
    materialization + per-pixel gathers).  bf16 operands are exact for u8
    values and the MXU accumulates in f32, so the only error is the bf16
    rounding of the interpolation weights (|err| <~ 1.5 LSB of u8, far
    below the detector's noise floor).  Returns f32 (B, H', W', C).
    """
    xb = frames.astype(jnp.bfloat16)
    # (B, H, W, C) x (H, H') -> (B, W, C, H')
    y = jax.lax.dot_general(
        xb, a_h.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    # (B, W, C, H') x (W, W') -> (B, C, H', W')
    z = jax.lax.dot_general(
        y, a_w.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.transpose(z, (0, 2, 3, 1))


def resize_target(orig_hw: tuple[int, int], min_size: int, max_size: int, div: int = 32) -> tuple[int, int]:
    """ResizeShortestEdge target (detectron2 semantics) padded to ``div``."""
    h, w = orig_hw
    scale = min_size / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    pad = lambda v: -(-v // div) * div
    return (pad(nh), pad(nw)), (nh, nw)


class TrackPredictor:
    """Resize + jitted inference; detections mapped back to original coords."""

    def __init__(self, cfg: ModelConfig, params, orig_hw: tuple[int, int]):
        self.cfg = cfg
        self.params = params
        self.orig_hw = tuple(orig_hw)
        (self.pad_hw, self.net_hw) = resize_target(
            self.orig_hw, cfg.input.min_size_test, cfg.input.max_size_test, cfg.input.pad_divisibility
        )
        self.model = build_model(cfg)
        nh, nw = self.net_hw
        self._resize_mats = (
            jnp.asarray(linear_resize_matrix(self.orig_hw[0], nh)),
            jnp.asarray(linear_resize_matrix(self.orig_hw[1], nw)),
        )
        self._infer = jax.jit(self._infer_impl)

    def _infer_impl(self, params, frames_u8: Array):
        """frames (B, H, W, 3) uint8 in the configured channel order."""
        nh, nw = self.net_hw
        x = resize_frames_matmul(frames_u8, *self._resize_mats)
        ph, pw = self.pad_hw
        x = jnp.pad(x, ((0, 0), (0, ph - nh), (0, pw - nw), (0, 0)))
        dets, feats = self.model.apply({"params": params}, x, mode="inference")
        # Rescale boxes to original resolution (d2 detector_postprocess);
        # the model clipped to the PADDED extent, so re-clip to the image.
        sy = self.orig_hw[0] / nh
        sx = self.orig_hw[1] / nw
        boxes = dets["boxes"] * jnp.asarray([sx, sy, sx, sy])
        oh, ow = self.orig_hw
        boxes = jnp.stack(
            [
                jnp.clip(boxes[..., 0], 0, ow),
                jnp.clip(boxes[..., 1], 0, oh),
                jnp.clip(boxes[..., 2], 0, ow),
                jnp.clip(boxes[..., 3], 0, oh),
            ],
            axis=-1,
        )
        dets = {**dets, "boxes": boxes}
        return dets, feats

    def __call__(self, frames_u8) -> tuple[dict[str, Array], dict[str, Array]]:
        return self._infer(self.params, jnp.asarray(frames_u8))


class RcnnTracker:
    """Detect -> associate -> track, mirroring rcnn_tracker.py:39-76.

    ``next_frame`` processes one frame (reference API); ``process_frames``
    batches the stateless detector over T frames then scans the association.
    """

    def __init__(
        self,
        model_cfg: ModelConfig,
        tracker_cfg: TrackerConfig,
        params,
        assoc_params,
        orig_hw: tuple[int, int],
        display_info: tuple[str, ...] = (),
    ):
        self.predictor = TrackPredictor(model_cfg, params, orig_hw)
        self.cfg = tracker_cfg
        self.assoc_params = assoc_params
        self.orig_hw = tuple(orig_hw)
        # Named debug-trace categories (reference DISPLAY_INFO,
        # rcnn_tracker.py:41-43): 'frame_count', 'detections', 'objects'.
        self.display_info = tuple(display_info)
        self.state = structures.init_track_state(
            tracker_cfg.max_tracks, tracker_cfg.embedding_dim
        )
        self.frame_count = 0
        self._scan = jax.jit(self._scan_impl)

    def _scan_impl(self, state, dets, feats_p2):
        # The stateless half (top-k cap + re-ID embeddings) batches over all
        # T frames at once; only the state-carrying association scans.
        dets, emb = jax.vmap(
            lambda det, f: tracker_mod.prepare_frame(
                det, f, self.assoc_params, self.cfg, self.orig_hw
            )
        )(dets, feats_p2)

        def step(s, xs):
            det, e = xs
            return tracker_mod.tracker_step_assoc(s, det, e, self.cfg, self.orig_hw)

        return jax.lax.scan(step, state, (dets, emb))

    def reset(self):
        self.state = structures.init_track_state(self.cfg.max_tracks, self.cfg.embedding_dim)
        self.frame_count = 0

    def process_frames(self, frames_u8) -> dict[str, np.ndarray]:
        """frames (T, H, W, 3) uint8 -> recent-object snapshots (T, ...)."""
        return self.materialize(self.process_frames_async(frames_u8))

    def process_frames_async(self, frames_u8):
        """Dispatch detect+associate for a batch WITHOUT a host sync.

        Returns an opaque pending handle (device trees).  Callers that
        pipeline batches dispatch batch N+1 before materializing batch N —
        the asynchronous runtime then overlaps N+1's detection with the
        host-side consumption (CSV/visualization) of N, hiding the host
        gap that a sync-per-batch loop leaves between device dispatches.
        """
        dets, feats = self.predictor(frames_u8)
        self.frame_count += int(frames_u8.shape[0])
        self.state, recents = self._scan(self.state, dets, feats["p2"])
        return dets, recents

    def materialize(self, pending) -> dict[str, np.ndarray]:
        """Host-sync a pending handle from :meth:`process_frames_async`."""
        dets, recents = pending
        recents = jax.tree_util.tree_map(np.asarray, recents)
        if self.display_info:
            self._debug_print(dets, recents)
        return recents

    def _debug_print(self, dets, recents) -> None:
        """Host-side named traces (reference rcnn_tracker.py DISPLAY_INFO)."""
        t = recents["valid"].shape[0]
        for b in range(t):
            frame = self.frame_count - t + b + 1
            if "frame_count" in self.display_info:
                print(f"\nFRAME: {frame}")
            if "detections" in self.display_info:
                v = np.asarray(dets["valid"][b])
                cls = np.asarray(dets["classes"][b])
                print(f"{int(v.sum())} detections:")
                for d in np.nonzero(v)[0]:
                    print(f"detection_id: {d} class: {int(cls[d])}")
            if "objects" in self.display_info:
                v = recents["valid"][b]
                for k in np.nonzero(v)[0]:
                    print(
                        f"object id {int(recents['ids'][b][k])} class {int(recents['classes'][b][k])} "
                        f"score {float(recents['scores'][b][k]):.2f}"
                    )

    def next_frame(self, frame_u8) -> dict[str, np.ndarray]:
        """Single-frame API (rcnn_tracker.py:63); returns the recent snapshot."""
        out = self.process_frames(np.asarray(frame_u8)[None])
        return {k: v[0] for k, v in out.items()}


class SelectivePredictor:
    """Coarsest-level-only proposals + per-stage timing.

    The reference's SelectiveMaskRCNN.scan instruments backbone / RPN / ROI
    stages with perf_counter+synchronize brackets (selective_rcnn.py:46-76)
    and SelectiveRPN keeps only the last FPN level's proposals
    (selective_rpn.py:47-48).  Here the full scan runs with
    ``rpn_levels=("p6",)`` and each stage is a separate jitted function
    timed with device-synchronized wall clock.
    """

    def __init__(self, cfg: ModelConfig, params, orig_hw: tuple[int, int], rpn_levels: tuple[str, ...] = ("p6",)):
        self.base = TrackPredictor(cfg, params, orig_hw)
        self.cfg = cfg
        self.params = params
        self.rpn_levels = tuple(rpn_levels)
        self.timings: dict[str, float] = {}
        model = self.base.model
        self._backbone = jax.jit(
            lambda p, x: model.apply({"params": p}, x, mode="backbone")
        )
        self._scan = jax.jit(
            lambda p, x: model.apply(
                {"params": p}, x, method=lambda m, im: m.inference(im, rpn_levels=self.rpn_levels)
            )
        )

    def _prep(self, frames_u8):
        nh, nw = self.base.net_hw
        x = resize_frames_matmul(jnp.asarray(frames_u8), *self.base._resize_mats)
        ph, pw = self.base.pad_hw
        return jnp.pad(x, ((0, 0), (0, ph - nh), (0, pw - nw), (0, 0)))

    def __call__(self, frames_u8):
        """Run the partial-proposal scan; per-stage timings in ``timings``."""
        x = self._prep(frames_u8)
        t0 = time.perf_counter()
        feats = jax.block_until_ready(self._backbone(self.params, x))
        self.timings["backbone"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        dets, _ = jax.block_until_ready(self._scan(self.params, x))
        self.timings["selective_scan"] = time.perf_counter() - t0
        # Rescale boxes to the original resolution like TrackPredictor.
        sy = self.base.orig_hw[0] / self.base.net_hw[0]
        sx = self.base.orig_hw[1] / self.base.net_hw[1]
        dets = {**dets, "boxes": dets["boxes"] * jnp.asarray([sx, sy, sx, sy])}
        return dets
