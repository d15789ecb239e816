"""Checkpoint surgery tests: prefix stripping, mask grafting, class slicing."""

import pickle

import numpy as np
import pytest

from apse_uav_tpu.dcnn import weights as W


def test_strip_backbone_prefix():
    flat = {
        "backbone/resnet/stem_conv/kernel": np.ones((7, 7, 3, 64)),
        "backbone/fpn/lateral2/kernel": np.ones((1, 1, 256, 256)),
        "box_head/fc1/kernel": np.ones((4, 4)),
    }
    out = W.strip_backbone_prefix(flat)
    assert set(out) == {"resnet/stem_conv/kernel", "fpn/lateral2/kernel"}


def test_merge_mask_head_grafts_only_mask():
    det = {"box_head/fc1/kernel": np.zeros(3), "mask_head/mask_fcn1/kernel": np.zeros(3)}
    src = {"mask_head/mask_fcn1/kernel": np.ones(3), "box_head/fc1/kernel": np.full(3, 9.0)}
    merged = W.merge_mask_head(det, src)
    np.testing.assert_array_equal(merged["mask_head/mask_fcn1/kernel"], 1.0)
    np.testing.assert_array_equal(merged["box_head/fc1/kernel"], 0.0)


def test_slice_predictor_classes():
    k_src, d = 80, 16
    rng = np.random.default_rng(0)
    flat = {
        "box_head/cls_score/kernel": rng.normal(size=(d, k_src + 1)),
        "box_head/cls_score/bias": rng.normal(size=k_src + 1),
        "box_head/bbox_pred/kernel": rng.normal(size=(d, 4 * k_src)),
        "box_head/bbox_pred/bias": rng.normal(size=4 * k_src),
        "mask_head/predictor/kernel": rng.normal(size=(1, 1, 8, k_src)),
        "mask_head/predictor/bias": rng.normal(size=k_src),
    }
    rows = [2, 7, 5]  # coco car/truck/bus
    out = W.slice_predictor_classes(flat, rows, k_src)
    assert out["box_head/cls_score/kernel"].shape == (d, 4)  # 3 classes + bg
    # Background row preserved as the last.
    np.testing.assert_array_equal(
        out["box_head/cls_score/bias"][-1], flat["box_head/cls_score/bias"][k_src]
    )
    np.testing.assert_array_equal(
        out["box_head/cls_score/kernel"][:, 0], flat["box_head/cls_score/kernel"][:, 2]
    )
    assert out["box_head/bbox_pred/kernel"].shape == (d, 12)
    np.testing.assert_array_equal(
        out["box_head/bbox_pred/kernel"][:, 0:4], flat["box_head/bbox_pred/kernel"][:, 8:12]
    )
    assert out["mask_head/predictor/kernel"].shape == (1, 1, 8, 3)
    np.testing.assert_array_equal(
        out["mask_head/predictor/kernel"][..., 1], flat["mask_head/predictor/kernel"][..., 7]
    )


def test_load_torch_pkl_roundtrip(tmp_path):
    blobs = {"stem.conv1.weight": np.ones((64, 3, 7, 7), np.float32)}
    p = tmp_path / "ckpt.pkl"
    with open(p, "wb") as f:
        pickle.dump({"model": blobs, "__author__": "test"}, f)
    loaded = W.load_torch_file(str(p))
    np.testing.assert_array_equal(loaded["stem.conv1.weight"], blobs["stem.conv1.weight"])


def test_map_detectron2_weights_covers_model():
    """A synthetic d2-style state dict maps onto the full flax param tree."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from apse_uav_tpu.dcnn.config import mask_rcnn_r50_fpn
    from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN

    cfg = mask_rcnn_r50_fpn(num_classes=3)
    model = MaskRCNN(cfg=cfg)
    params = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 64, 64, 3)), mode="inference")["params"]
    )(jax.random.PRNGKey(0))
    flat_params = W.flatten(jax.tree_util.tree_map(np.asarray, params))

    # Build a fake torch checkpoint with the right shapes by inverting the
    # name mapping: start from an empty src and check the mapper's coverage.
    rng = np.random.default_rng(0)
    src = {}
    # stem + res blocks + fpn + rpn + heads, generated from the flax shapes.
    inv_conv = lambda k: np.transpose(k, (3, 2, 0, 1))
    inv_fc = lambda k: k.T
    def put_bn(name, prefix):
        for suf, d2 in (("scale", "weight"), ("bias", "bias"), ("mean", "running_mean"), ("var", "running_var")):
            src[f"{name}.{d2}"] = flat_params[f"{prefix}/{suf}"] + 0.01
    src["backbone.bottom_up.stem.conv1.weight"] = inv_conv(flat_params["backbone/resnet/stem_conv/kernel"])
    put_bn("backbone.bottom_up.stem.conv1.norm", "backbone/resnet/stem_bn")
    from apse_uav_tpu.dcnn.weights import _STAGE_BLOCKS
    for stage, n in enumerate(_STAGE_BLOCKS[50]):
        for i in range(n):
            dp = f"backbone/resnet/res{stage+2}_{i}"
            sp = f"backbone.bottom_up.res{stage+2}.{i}"
            for c in (1, 2, 3):
                src[f"{sp}.conv{c}.weight"] = inv_conv(flat_params[f"{dp}/conv{c}/kernel"])
                put_bn(f"{sp}.conv{c}.norm", f"{dp}/bn{c}")
            if f"{dp}/shortcut/kernel" in flat_params:
                src[f"{sp}.shortcut.weight"] = inv_conv(flat_params[f"{dp}/shortcut/kernel"])
                put_bn(f"{sp}.shortcut.norm", f"{dp}/shortcut_bn")
    for i in range(2, 6):
        src[f"backbone.fpn_lateral{i}.weight"] = inv_conv(flat_params[f"backbone/fpn/lateral{i}/kernel"])
        src[f"backbone.fpn_lateral{i}.bias"] = flat_params[f"backbone/fpn/lateral{i}/bias"]
        src[f"backbone.fpn_output{i}.weight"] = inv_conv(flat_params[f"backbone/fpn/output{i}/kernel"])
        src[f"backbone.fpn_output{i}.bias"] = flat_params[f"backbone/fpn/output{i}/bias"]
    for dst, s in (("conv", "conv"), ("objectness", "objectness_logits"), ("deltas", "anchor_deltas")):
        src[f"proposal_generator.rpn_head.{s}.weight"] = inv_conv(flat_params[f"rpn_head/{dst}/kernel"])
        src[f"proposal_generator.rpn_head.{s}.bias"] = flat_params[f"rpn_head/{dst}/bias"]
    for i in (1, 2):
        src[f"roi_heads.box_head.fc{i}.weight"] = inv_fc(flat_params[f"box_head/fc{i}/kernel"])
        src[f"roi_heads.box_head.fc{i}.bias"] = flat_params[f"box_head/fc{i}/bias"]
    for name in ("cls_score", "bbox_pred"):
        src[f"roi_heads.box_predictor.{name}.weight"] = inv_fc(flat_params[f"box_head/{name}/kernel"])
        src[f"roi_heads.box_predictor.{name}.bias"] = flat_params[f"box_head/{name}/bias"]
    for i in range(1, 5):
        src[f"roi_heads.mask_head.mask_fcn{i}.weight"] = inv_conv(flat_params[f"mask_head/mask_fcn{i}/kernel"])
        src[f"roi_heads.mask_head.mask_fcn{i}.bias"] = flat_params[f"mask_head/mask_fcn{i}/bias"]
    src["roi_heads.mask_head.deconv.weight"] = np.transpose(
        flat_params["mask_head/deconv/kernel"], (2, 3, 0, 1)
    )[:, :, ::-1, ::-1]
    src["roi_heads.mask_head.deconv.bias"] = flat_params["mask_head/deconv/bias"]
    src["roi_heads.mask_head.predictor.weight"] = inv_conv(flat_params["mask_head/predictor/kernel"])
    src["roi_heads.mask_head.predictor.bias"] = flat_params["mask_head/predictor/bias"]

    mapped = W.map_detectron2_weights(src, depth=50, mask_on=True)
    new_params, missing, unused = W.load_into_params(params, mapped)
    assert missing == [], missing[:5]
    assert unused == [], unused[:5]
    # BN stats round-trip (offset by the +0.01 marker).
    got = W.flatten(jax.tree_util.tree_map(np.asarray, new_params))
    np.testing.assert_allclose(
        got["backbone/resnet/stem_bn/mean"],
        flat_params["backbone/resnet/stem_bn/mean"] + 0.01,
        rtol=1e-6,
    )
