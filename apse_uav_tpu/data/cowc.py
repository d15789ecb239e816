"""COWC ROI-feature precompute loader (reference dcnn/utils/cowc_utils.py).

The reference's CowcDataloaderOld (cowc_utils.py:87-214) pushes every
annotated car/negative point of the large COWC aerial frames through the
frozen detector trunk ONCE (backbone -> box_pooler -> box_head) and caches
the resulting FC features, then serves balanced 50-pos/50-neg feature
batches for head-only training.

TPU-native differences:
* feature extraction is a single jitted function with FIXED shapes — boxes
  are processed in padded chunks with a validity mask instead of the
  reference's ragged per-patch tensors (one compile, MXU-friendly);
* the model hook is ``MaskRCNN(mode="roi_features")`` (no detectron2
  DefaultPredictor); the reference's ResizeShortestEdge is the identity for
  its square MIN_SIZE_TEST patches (cowc_utils.py:113-116) and is omitted.

Annotation conventions preserved from the reference (cowc_utils.py:130-141,
loaded there with cv2 in BGR order): car points are saturated-RED pixels of
``*_Annotated_Cars.png`` (cars_img[:, :, 2] == 255 in BGR), negatives are
saturated-BLUE pixels of ``*_Annotated_Negatives.png`` (neg_img[:, :, 0] ==
255 in BGR); every point becomes a (2*bbox_width) square clipped to the
patch (:146-158); per image, batches = floor(min(npos, nneg) / 50)
(:196-200).
"""

from __future__ import annotations

import math
import os

import numpy as np

from apse_uav_tpu.data.datasets import _images_in  # natural-sorted image list


def _points_from_annotation(path: str, rgb_channel: int) -> tuple[np.ndarray, np.ndarray]:
    """(rows, cols) of pixels whose ``rgb_channel`` is saturated (== 255)."""
    from PIL import Image

    ann = np.array(Image.open(path))
    if ann.ndim == 2:
        plane = ann
    else:
        plane = ann[..., rgb_channel]
    return np.nonzero(plane == 255)


def _patch_instances(cars_rc, neg_rc, patch_yx, patch_size: int, bbox_width: int):
    """Boxes (N, 4) xyxy in patch coords + classes (N,) {1 car, 0 negative}.

    Mirrors cowc_utils.get_instances:130-158: point +- bbox_width, each
    coordinate clipped to [0, patch_size - 1].
    """
    y0, x0 = patch_yx
    boxes, classes = [], []
    for (rr, cc), cls in ((cars_rc, 1), (neg_rc, 0)):
        sel = (rr >= y0) & (rr < y0 + patch_size) & (cc >= x0) & (cc < x0 + patch_size)
        for r, c in zip(rr[sel] - y0, cc[sel] - x0):
            b = np.clip(
                [c - bbox_width, r - bbox_width, c + bbox_width, r + bbox_width],
                0, patch_size - 1,
            )
            boxes.append(b)
            classes.append(cls)
    if not boxes:
        return np.zeros((0, 4), np.float32), np.zeros((0,), np.int64)
    return np.asarray(boxes, np.float32), np.asarray(classes, np.int64)


class CowcRoiFeaturesLoader:
    """Precomputed (roi-features, class) batches over a COWC directory.

    roi_feature_fn(image (1, P, P, 3) f32, boxes (1, M, 4) f32) -> (1, M, D)
    — typically ``build_roi_feature_fn`` below (frozen trunk, jitted once).
    """

    def __init__(self, roi_feature_fn, dataset_dir: str, patch_size: int = 1024,
                 bbox_width: int = 18, batch_size: int = 100, chunk: int = 128,
                 cars_suffix: str = "_Annotated_Cars.png",
                 neg_suffix: str = "_Annotated_Negatives.png"):
        self.batch_size = batch_size
        self.batches_per_img: list[list[tuple[np.ndarray, np.ndarray]]] = []
        from PIL import Image

        for fname in _images_in(dataset_dir):
            if "Annotated" in fname:
                continue
            stem = fname.rsplit(".", 1)[0]
            cars_path = os.path.join(dataset_dir, stem + cars_suffix)
            neg_path = os.path.join(dataset_dir, stem + neg_suffix)
            if not (os.path.exists(cars_path) and os.path.exists(neg_path)):
                continue
            img = np.array(Image.open(os.path.join(dataset_dir, fname)))[..., :3]
            # Saturated-RED cars / saturated-BLUE negatives (see module doc).
            cars_rc = _points_from_annotation(cars_path, 0)
            neg_rc = _points_from_annotation(neg_path, 2)
            feats, classes = [], []
            h, w = img.shape[:2]
            for y0 in range(0, h - patch_size + 1, patch_size):
                for x0 in range(0, w - patch_size + 1, patch_size):
                    boxes, cls = _patch_instances(cars_rc, neg_rc, (y0, x0), patch_size, bbox_width)
                    if len(cls) == 0:
                        continue
                    patch = img[y0 : y0 + patch_size, x0 : x0 + patch_size].astype(np.float32)
                    feats.append(self._features_chunked(roi_feature_fn, patch, boxes, chunk))
                    classes.append(cls)
            if not feats:
                self.batches_per_img.append([])
                continue
            feats = np.concatenate(feats)
            classes = np.concatenate(classes)
            self.batches_per_img.append(self._balanced_batches(feats, classes))

    @staticmethod
    def _features_chunked(roi_feature_fn, patch: np.ndarray, boxes: np.ndarray, chunk: int) -> np.ndarray:
        """Fixed-shape chunks: pad boxes to ``chunk``, drop padded rows."""
        import jax.numpy as jnp

        out = []
        for a in range(0, len(boxes), chunk):
            b = boxes[a : a + chunk]
            n = len(b)
            bp = np.zeros((chunk, 4), np.float32)
            bp[:n] = b
            f = roi_feature_fn(jnp.asarray(patch[None]), jnp.asarray(bp[None]))
            out.append(np.asarray(f[0][:n]))
        return np.concatenate(out)

    def _balanced_batches(self, feats: np.ndarray, classes: np.ndarray):
        """floor(min(npos, nneg) / (batch/2)) balanced batches (:196-208)."""
        pos = np.nonzero(classes == 1)[0]
        neg = np.nonzero(classes == 0)[0]
        ns = self.batch_size // 2
        nb = math.floor(min(len(pos), len(neg)) / ns)
        batches = []
        for bi in range(nb):
            idx = np.concatenate([pos[bi * ns : (bi + 1) * ns], neg[bi * ns : (bi + 1) * ns]])
            labels = np.asarray([1] * ns + [0] * ns, np.int64)
            batches.append((feats[idx], labels))
        return batches

    def __iter__(self):
        for img_batches in self.batches_per_img:
            yield from img_batches


def build_roi_feature_fn(model, params):
    """Jitted frozen-trunk ROI feature closure for CowcRoiFeaturesLoader."""
    import jax

    @jax.jit
    def fn(images, boxes):
        return model.apply({"params": params}, images, mode="roi_features", gt={"boxes": boxes})

    return fn
