"""MOT17/20 and KITTI-MOTS loaders for association-head training.

Equivalents of MOTloader / MOTSloader (dcnn/utils/MOT_utils.py) and
RoiFeaturesGenerator (dcnn/engines/roi_features_generator.py): parse
sequence ground truth, run frames through the frozen backbone, pool per-GT
ROI features, and pack (ids, rois) batches of consecutive frames for the
triplet loss.  The reference recomputes features through the backbone every
epoch (MOT_utils.py note in SURVEY §3.4); here features can additionally be
cached host-side by the caller.
"""

from __future__ import annotations

import configparser
import math
import os
from os.path import join

import jax
import jax.numpy as jnp
import numpy as np

from apse_uav_tpu.dcnn.ops.roi_align import roi_align, roi_pool


class RoiFeaturesGenerator:
    """Backbone-only ROI feature extractor (roi_features_generator.py:24-130).

    ``backbone_fn(images_f32_bgr (1,H,W,3)) -> {"p2": (1,h,w,C), ...}`` is a
    jitted closure over frozen backbone params (PartialCheckpointer-loaded).
    """

    def __init__(self, backbone_fn, roi_size: int = 8, feature_key: str = "p2"):
        self.backbone_fn = backbone_fn
        self.roi_size = roi_size
        self.feature_key = feature_key

    def get_rois_features(self, frame: np.ndarray, objects: np.ndarray, masks: list | None = None):
        """frame (H, W, 3); objects rows ``frame,id,x,y,w,h,...`` (MOT gt).

        With ``masks`` (full-image binary, MOTS), features are mask-cropped
        then roi_align'ed; otherwise roi_pool on the GT boxes
        (roi_features_generator.py:94-113).
        """
        feats = self.backbone_fn(jnp.asarray(frame[None], jnp.float32))
        feat = feats[self.feature_key][0]  # (h, w, C)
        h, w = frame.shape[:2]
        fh, fw = feat.shape[:2]
        scale = fw / w
        ids = objects[:, 1].astype(np.int64)
        boxes = objects[:, 2:6].astype(np.float32).copy()
        boxes[:, 2:] += boxes[:, :2]  # xywh -> xyxy
        cfeat = jnp.transpose(feat, (2, 0, 1))  # (C, h, w)
        if masks is not None:
            lowres = jnp.stack(
                [
                    jnp.asarray(
                        np.array(
                            _resize_mask(m, (fh, fw)), np.float32
                        )
                    )
                    for m in masks
                ]
            )  # (N, h, w)
            cropped = cfeat[None] * lowres[:, None]
            rois = jax.vmap(
                lambda f, b: roi_align(f, b[None], self.roi_size, scale, 4, False)[0]
            )(cropped, jnp.asarray(boxes))
        else:
            rois = roi_pool(cfeat, jnp.asarray(boxes), self.roi_size, scale)
        return ids, np.asarray(rois)


def _resize_mask(mask: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    from PIL import Image

    return (
        np.asarray(
            Image.fromarray((mask * 255).astype(np.uint8)).resize((hw[1], hw[0]), Image.BILINEAR),
            np.float32,
        )
        / 255.0
    )


class MOTLoader:
    """MOT17/20 sequence loader (MOT_utils.py:25-119)."""

    def __init__(self, sequence_path: str, roi_generator: RoiFeaturesGenerator, frames_in_batch: int = 8):
        self.sequence_path = sequence_path
        self.frames_in_batch = frames_in_batch
        self.roi_generator = roi_generator
        self.sequence_info = self._read_seqinfo()
        self.frames_in_sequence = int(self.sequence_info["seqLength"])
        self.num_of_batches = math.floor(self.frames_in_sequence / frames_in_batch)
        self.sequence_objects = self._gt_instances()

    def _read_seqinfo(self) -> dict:
        cp = configparser.ConfigParser()
        cp.read(join(self.sequence_path, "seqinfo.ini"))
        return dict(cp["Sequence"]) | {"seqLength": cp["Sequence"]["seqlength"]}

    def _gt_instances(self) -> np.ndarray:
        rows = []
        with open(join(self.sequence_path, "gt", "gt.txt")) as f:
            for line in f:
                vals = [int(float(v)) for v in line.strip().split(",")[:7]]
                rows.append(vals)
        inst = np.asarray(rows)
        return inst[inst[:, 6] == 1]  # confident GT only (MOT_utils.py:71)

    def frame_image(self, frame_number: int) -> np.ndarray:
        from PIL import Image

        p = join(self.sequence_path, "img1", f"{frame_number:06d}.jpg")
        return np.asarray(Image.open(p).convert("RGB"))[..., ::-1].astype(np.float32)

    def get_training_batch(self, batch_idx: int):
        assert batch_idx < self.num_of_batches
        all_ids, all_rois = [], []
        for k in range(self.frames_in_batch):
            frame_number = (k + 1) + batch_idx * self.frames_in_batch
            frame = self.frame_image(frame_number)
            objs = self.sequence_objects[self.sequence_objects[:, 0] == frame_number]
            if len(objs) == 0:
                continue
            ids, rois = self.roi_generator.get_rois_features(frame, objs)
            all_ids.append(ids)
            all_rois.append(rois)
        if not all_ids:
            return np.zeros(0, np.int64), np.zeros((0,), np.float32)
        return np.concatenate(all_ids), np.concatenate(all_rois)


class MOTSLoader:
    """KITTI-MOTS loader: RLE instance txt per sequence (MOT_utils.py:123-264)."""

    def __init__(
        self,
        instances_txt_folder: str,
        image_folder: str,
        seq_names: list[str],
        roi_generator: RoiFeaturesGenerator,
        frames_in_batch: int = 4,
    ):
        from apse_uav_tpu.evaluation.mots import load_txt

        self.image_folder = image_folder
        self.roi_generator = roi_generator
        self.frames_in_batch = frames_in_batch
        self.sequences = {
            seq: load_txt(join(instances_txt_folder, seq + ".txt")) for seq in seq_names
        }
        # Frames that actually carry annotations, per sequence.
        self.annotated_frames = {
            seq: sorted(f for f, objs in frames.items() if objs)
            for seq, frames in self.sequences.items()
        }

    def num_batches(self, seq: str) -> int:
        return math.floor(len(self.annotated_frames[seq]) / self.frames_in_batch)

    def frame_image(self, seq: str, frame: int) -> np.ndarray:
        from PIL import Image

        p = join(self.image_folder, seq, f"{frame:06d}.png")
        if not os.path.exists(p):
            p = join(self.image_folder, seq, f"{frame:06d}.jpg")
        return np.asarray(Image.open(p).convert("RGB"))[..., ::-1].astype(np.float32)

    def get_training_batch(self, seq: str, batch_idx: int):
        """Consecutive annotated frames -> (ids, rois) (MOT_utils.py:238-264)."""
        from apse_uav_tpu.evaluation import rle as rletools

        frames = self.annotated_frames[seq][
            batch_idx * self.frames_in_batch : (batch_idx + 1) * self.frames_in_batch
        ]
        all_ids, all_rois = [], []
        for f in frames:
            objs = [o for o in self.sequences[seq][f] if o.class_id in (1, 2)]
            if not objs:
                continue
            img = self.frame_image(seq, f)
            masks = [rletools.decode(o.mask) for o in objs]
            rows = []
            for o, m in zip(objs, masks):
                x, y, w, h = rletools.toBbox(o.mask)
                rows.append([f, o.track_id, x, y, w, h, 1])
            ids, rois = self.roi_generator.get_rois_features(
                img, np.asarray(rows), masks=masks
            )
            all_ids.append(ids)
            all_rois.append(rois)
        if not all_ids:
            return np.zeros(0, np.int64), np.zeros((0,), np.float32)
        return np.concatenate(all_ids), np.concatenate(all_rois)
