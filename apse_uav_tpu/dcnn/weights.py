"""Checkpoint import + weight surgery: detectron2/torch -> Flax param trees.

Covers the reference's checkpoint machinery (SURVEY.md §5):

* model-zoo ``.pkl`` (pickled dict of numpy arrays) and torch ``.pth``
  readers — numpy-first, torch used only if importable and needed;
* name mapping detectron2 GeneralizedRCNN -> our MaskRCNN param tree;
* :func:`strip_backbone_prefix` — PartialCheckpointer semantics
  (dcnn/utils/partial_checkpointer.py:11-20);
* :func:`merge_mask_head` — mask-head grafting into a detector checkpoint
  (finetune_segmentation.py:53-61);
* :func:`slice_predictor_classes` — per-class row slicing when converting an
  80-class COCO head to a K-class vehicle head
  (scripts/add_mask_head_to_frcnn.py:62-73).
"""

from __future__ import annotations

import pickle
from typing import Any

import numpy as np

Tree = dict[str, Any]


def load_torch_file(path: str) -> dict[str, np.ndarray]:
    """Load a detectron2 .pkl or torch .pth checkpoint as {name: ndarray}."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        blobs = data.get("model", data)
        return {k: np.asarray(v) for k, v in blobs.items() if isinstance(v, np.ndarray)}
    import torch  # .pth: use torch's zip reader (CPU)

    data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "model" in data:
        data = data["model"]
    if isinstance(data, dict) and "state_dict" in data:
        data = data["state_dict"]
    return {k: v.numpy() for k, v in data.items() if hasattr(v, "numpy")}


def _conv(w: np.ndarray) -> np.ndarray:
    """torch conv (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def _deconv(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kh, kw) -> flax ConvTranspose (kh, kw, I, O).

    flax ConvTranspose (lax.conv_transpose, transpose_kernel=False) applies
    the kernel un-mirrored, while torch's deconv is the conv gradient
    (mirrored) — so the spatial dims flip.
    """
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def _fc(w: np.ndarray) -> np.ndarray:
    """torch Linear (O, I) -> flax Dense (I, O)."""
    return w.T


_STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def _bn(dst: Tree, prefix: str, src: dict, name: str) -> None:
    dst[f"{prefix}/scale"] = src[f"{name}.weight"]
    dst[f"{prefix}/bias"] = src[f"{name}.bias"]
    dst[f"{prefix}/mean"] = src[f"{name}.running_mean"]
    dst[f"{prefix}/var"] = src[f"{name}.running_var"]


def map_detectron2_weights(src: dict[str, np.ndarray], depth: int, mask_on: bool = True) -> Tree:
    """Map detectron2 GeneralizedRCNN weights to a flat {path: array} dict
    keyed by '/'-joined flax param paths (use :func:`unflatten` for the tree)."""
    out: Tree = {}
    bb = "backbone.bottom_up"
    # Some zoo pickles name the resnet without the FPN wrapper.
    if f"{bb}.stem.conv1.weight" not in src and "stem.conv1.weight" in src:
        bb = ""

    def b(name):
        return f"{bb}.{name}" if bb else name

    r = "backbone/resnet"
    out[f"{r}/stem_conv/kernel"] = _conv(src[b("stem.conv1.weight")])
    _bn(out, f"{r}/stem_bn", src, b("stem.conv1.norm"))
    for stage, n_blocks in enumerate(_STAGE_BLOCKS[depth]):
        for i in range(n_blocks):
            sp = b(f"res{stage + 2}.{i}")
            dp = f"{r}/res{stage + 2}_{i}"
            for c in (1, 2, 3):
                out[f"{dp}/conv{c}/kernel"] = _conv(src[f"{sp}.conv{c}.weight"])
                _bn(out, f"{dp}/bn{c}", src, f"{sp}.conv{c}.norm")
            if f"{sp}.shortcut.weight" in src:
                out[f"{dp}/shortcut/kernel"] = _conv(src[f"{sp}.shortcut.weight"])
                _bn(out, f"{dp}/shortcut_bn", src, f"{sp}.shortcut.norm")
    # FPN
    for i in range(2, 6):
        if f"backbone.fpn_lateral{i}.weight" not in src:
            continue
        out[f"backbone/fpn/lateral{i}/kernel"] = _conv(src[f"backbone.fpn_lateral{i}.weight"])
        out[f"backbone/fpn/lateral{i}/bias"] = src[f"backbone.fpn_lateral{i}.bias"]
        out[f"backbone/fpn/output{i}/kernel"] = _conv(src[f"backbone.fpn_output{i}.weight"])
        out[f"backbone/fpn/output{i}/bias"] = src[f"backbone.fpn_output{i}.bias"]
    # RPN
    rpn_map = {
        "conv": "proposal_generator.rpn_head.conv",
        "objectness": "proposal_generator.rpn_head.objectness_logits",
        "deltas": "proposal_generator.rpn_head.anchor_deltas",
    }
    for dst_name, src_name in rpn_map.items():
        if f"{src_name}.weight" in src:
            out[f"rpn_head/{dst_name}/kernel"] = _conv(src[f"{src_name}.weight"])
            out[f"rpn_head/{dst_name}/bias"] = src[f"{src_name}.bias"]
    # Box head
    for i in (1, 2):
        if f"roi_heads.box_head.fc{i}.weight" in src:
            out[f"box_head/fc{i}/kernel"] = _fc(src[f"roi_heads.box_head.fc{i}.weight"])
            out[f"box_head/fc{i}/bias"] = src[f"roi_heads.box_head.fc{i}.bias"]
    for flax_name, d2_name in (("cls_score", "cls_score"), ("bbox_pred", "bbox_pred")):
        key = f"roi_heads.box_predictor.{d2_name}"
        if f"{key}.weight" in src:
            out[f"box_head/{flax_name}/kernel"] = _fc(src[f"{key}.weight"])
            out[f"box_head/{flax_name}/bias"] = src[f"{key}.bias"]
    # Mask head
    if mask_on:
        for i in range(1, 5):
            key = f"roi_heads.mask_head.mask_fcn{i}"
            if f"{key}.weight" in src:
                out[f"mask_head/mask_fcn{i}/kernel"] = _conv(src[f"{key}.weight"])
                out[f"mask_head/mask_fcn{i}/bias"] = src[f"{key}.bias"]
        if "roi_heads.mask_head.deconv.weight" in src:
            out["mask_head/deconv/kernel"] = _deconv(src["roi_heads.mask_head.deconv.weight"])
            out["mask_head/deconv/bias"] = src["roi_heads.mask_head.deconv.bias"]
            out["mask_head/predictor/kernel"] = _conv(src["roi_heads.mask_head.predictor.weight"])
            out["mask_head/predictor/bias"] = src["roi_heads.mask_head.predictor.bias"]
    return out


def map_detectron2_weights_c4(src: dict[str, np.ndarray], depth: int, mask_on: bool = True) -> Tree:
    """Map detectron2 C4 GeneralizedRCNN weights (Base-RCNN-C4.yaml models:
    res4 backbone + Res5ROIHeads) to flat flax paths for
    :class:`~apse_uav_tpu.dcnn.models.c4.MaskRCNNC4`."""
    out: Tree = {}
    bb = "backbone"
    if f"{bb}.stem.conv1.weight" not in src and "stem.conv1.weight" in src:
        bb = ""

    def b(name):
        return f"{bb}.{name}" if bb else name

    out["backbone/stem_conv/kernel"] = _conv(src[b("stem.conv1.weight")])
    _bn(out, "backbone/stem_bn", src, b("stem.conv1.norm"))
    for stage, n_blocks in enumerate(_STAGE_BLOCKS[depth][:3]):  # res2..res4
        for i in range(n_blocks):
            sp = b(f"res{stage + 2}.{i}")
            dp = f"backbone/res{stage + 2}_{i}"
            for c in (1, 2, 3):
                out[f"{dp}/conv{c}/kernel"] = _conv(src[f"{sp}.conv{c}.weight"])
                _bn(out, f"{dp}/bn{c}", src, f"{sp}.conv{c}.norm")
            if f"{sp}.shortcut.weight" in src:
                out[f"{dp}/shortcut/kernel"] = _conv(src[f"{sp}.shortcut.weight"])
                _bn(out, f"{dp}/shortcut_bn", src, f"{sp}.shortcut.norm")
    # res5 lives in the ROI heads (Res5ROIHeads).
    for i in range(_STAGE_BLOCKS[depth][3]):
        sp = f"roi_heads.res5.{i}"
        dp = f"res5/res5_{i}"
        for c in (1, 2, 3):
            out[f"{dp}/conv{c}/kernel"] = _conv(src[f"{sp}.conv{c}.weight"])
            _bn(out, f"{dp}/bn{c}", src, f"{sp}.conv{c}.norm")
        if f"{sp}.shortcut.weight" in src:
            out[f"{dp}/shortcut/kernel"] = _conv(src[f"{sp}.shortcut.weight"])
            _bn(out, f"{dp}/shortcut_bn", src, f"{sp}.shortcut.norm")
    rpn_map = {
        "conv": "proposal_generator.rpn_head.conv",
        "objectness": "proposal_generator.rpn_head.objectness_logits",
        "deltas": "proposal_generator.rpn_head.anchor_deltas",
    }
    for dst_name, src_name in rpn_map.items():
        if f"{src_name}.weight" in src:
            out[f"rpn_head/{dst_name}/kernel"] = _conv(src[f"{src_name}.weight"])
            out[f"rpn_head/{dst_name}/bias"] = src[f"{src_name}.bias"]
    for name in ("cls_score", "bbox_pred"):
        key = f"roi_heads.box_predictor.{name}"
        if f"{key}.weight" in src:
            out[f"box_predictor/{name}/kernel"] = _fc(src[f"{key}.weight"])
            out[f"box_predictor/{name}/bias"] = src[f"{key}.bias"]
    if mask_on and "roi_heads.mask_head.deconv.weight" in src:
        out["mask_head/deconv/kernel"] = _deconv(src["roi_heads.mask_head.deconv.weight"])
        out["mask_head/deconv/bias"] = src["roi_heads.mask_head.deconv.bias"]
        out["mask_head/predictor/kernel"] = _conv(src["roi_heads.mask_head.predictor.weight"])
        out["mask_head/predictor/bias"] = src["roi_heads.mask_head.predictor.bias"]
    return out


def unflatten(flat: Tree) -> Tree:
    """{'a/b/c': x} -> nested {'a': {'b': {'c': x}}}."""
    tree: Tree = {}
    for path, val in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def flatten(tree: Tree, prefix: str = "") -> Tree:
    flat: Tree = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(flatten(v, path))
        else:
            flat[path] = v
    return flat


def load_into_params(params: Tree, flat_src: Tree, strict: bool = False) -> tuple[Tree, list[str], list[str]]:
    """Graft a flat {path: array} dict onto an existing flax param tree.

    Returns (new_params, missing_in_src, unused_src_keys).  Shape mismatches
    raise (they indicate a wrong config, e.g. class count).
    """
    import jax.numpy as jnp

    flat_params = flatten(params)
    missing = [k for k in flat_params if k not in flat_src]
    unused = [k for k in flat_src if k not in flat_params]
    if strict and (missing or unused):
        raise ValueError(f"missing={missing[:5]}... unused={unused[:5]}...")
    merged = dict(flat_params)
    for k, v in flat_src.items():
        if k in flat_params:
            if tuple(flat_params[k].shape) != tuple(np.shape(v)):
                raise ValueError(f"shape mismatch at {k}: {flat_params[k].shape} vs {np.shape(v)}")
            merged[k] = jnp.asarray(v, dtype=flat_params[k].dtype)
    return unflatten(merged), missing, unused


def strip_backbone_prefix(flat: Tree) -> Tree:
    """PartialCheckpointer: load a full-model tree into a bare backbone by
    dropping the leading component (partial_checkpointer.py:11-20)."""
    out = {}
    for k, v in flat.items():
        if k.startswith("backbone/"):
            out[k[len("backbone/"):]] = v
    return out


def merge_mask_head(detector_flat: Tree, mask_source_flat: Tree) -> Tree:
    """Graft mask-head weights from one checkpoint into another
    (finetune_segmentation.py merge_full_mask_rcnn:53-61)."""
    out = dict(detector_flat)
    for k, v in mask_source_flat.items():
        if k.startswith("mask_head/"):
            out[k] = v
    return out


def slice_predictor_classes(
    flat: Tree, class_rows: list[int], num_src_classes: int
) -> Tree:
    """Convert class-specific predictor weights to a smaller class set by
    row selection (add_mask_head_to_frcnn.py:62-73).

    cls_score has K+1 rows (background last in detectron2), bbox_pred has
    4K rows, mask predictor has K channels.
    """
    out = dict(flat)
    k_new = len(class_rows)
    if "box_head/cls_score/kernel" in flat:
        w = flat["box_head/cls_score/kernel"]  # (D, K+1)
        b = flat["box_head/cls_score/bias"]
        rows = list(class_rows) + [num_src_classes]  # keep background
        out["box_head/cls_score/kernel"] = w[:, rows]
        out["box_head/cls_score/bias"] = b[rows]
    if "box_head/bbox_pred/kernel" in flat:
        w = flat["box_head/bbox_pred/kernel"]  # (D, 4K)
        b = flat["box_head/bbox_pred/bias"]
        cols = np.concatenate([[4 * c + j for j in range(4)] for c in class_rows])
        out["box_head/bbox_pred/kernel"] = w[:, cols]
        out["box_head/bbox_pred/bias"] = b[cols]
    if "mask_head/predictor/kernel" in flat:
        w = flat["mask_head/predictor/kernel"]  # (1, 1, C, K)
        b = flat["mask_head/predictor/bias"]
        out["mask_head/predictor/kernel"] = w[..., list(class_rows)]
        out["mask_head/predictor/bias"] = b[list(class_rows)]
    return out
