"""C4 model family: anchors, res5 head torch parity, zoo import + inference.

Covers the reference's Base-RCNN-C4.yaml models
(mask_rcnn_R_{50,101}_C4_3x.yaml) end to end: multi-size single-level
anchor generation, Res5ROIHeads numerics vs a torch replica, and the
checkpoint import path on a synthetic zoo-format state dict.
"""

import dataclasses
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from apse_uav_tpu.dcnn.config import mask_rcnn_r50_c4
from apse_uav_tpu.dcnn.models.c4 import MaskRCNNC4, build_model
from apse_uav_tpu.dcnn.models.rpn import cell_anchors

STAGES50 = (3, 4, 6, 3)


def test_c4_cell_anchors_order():
    """All five sizes on one level, detectron2 generate_cell_anchors order
    (sizes outer, ratios inner)."""
    sizes = (32.0, 64.0, 128.0, 256.0, 512.0)
    ratios = (0.5, 1.0, 2.0)
    got = cell_anchors(sizes, ratios)
    assert got.shape == (15, 4)
    k = 0
    for s in sizes:
        for r in ratios:
            w = (s * s / r) ** 0.5
            h = w * r
            np.testing.assert_allclose(got[k], [-w / 2, -h / 2, w / 2, h / 2], rtol=1e-6)
            k += 1
    cfg = mask_rcnn_r50_c4()
    assert cfg.anchors.num_cell_anchors == 15


def _synth_c4_state(depth=50, num_classes=80, seed=0):
    """Every tensor of a detectron2 C4 GeneralizedRCNN with zoo names."""
    rng = np.random.default_rng(seed)
    d = {}

    def conv(name, o, i, k):
        d[f"{name}.weight"] = rng.normal(0, 0.03, (o, i, k, k)).astype(np.float32)

    def bn(name, c):
        d[f"{name}.norm.weight"] = np.abs(rng.normal(1, 0.05, (c,))).astype(np.float32)
        d[f"{name}.norm.bias"] = rng.normal(0, 0.05, (c,)).astype(np.float32)
        d[f"{name}.norm.running_mean"] = rng.normal(0, 0.1, (c,)).astype(np.float32)
        d[f"{name}.norm.running_var"] = np.abs(rng.normal(1, 0.1, (c,))).astype(np.float32)

    def fc(name, o, i):
        d[f"{name}.weight"] = rng.normal(0, 0.02, (o, i)).astype(np.float32)
        d[f"{name}.bias"] = rng.normal(0, 0.01, (o,)).astype(np.float32)

    conv("backbone.stem.conv1", 64, 3, 7)
    bn("backbone.stem.conv1", 64)
    in_ch = 64
    for stage, n_blocks in enumerate(STAGES50[:3]):
        out_ch, mid = 256 * 2**stage, 64 * 2**stage
        for i in range(n_blocks):
            p = f"backbone.res{stage + 2}.{i}"
            conv(f"{p}.conv1", mid, in_ch if i == 0 else out_ch, 1)
            bn(f"{p}.conv1", mid)
            conv(f"{p}.conv2", mid, mid, 3)
            bn(f"{p}.conv2", mid)
            conv(f"{p}.conv3", out_ch, mid, 1)
            bn(f"{p}.conv3", out_ch)
            if i == 0:
                conv(f"{p}.shortcut", out_ch, in_ch, 1)
                bn(f"{p}.shortcut", out_ch)
        in_ch = out_ch
    for i in range(STAGES50[3]):
        p = f"roi_heads.res5.{i}"
        conv(f"{p}.conv1", 512, 1024 if i == 0 else 2048, 1)
        bn(f"{p}.conv1", 512)
        conv(f"{p}.conv2", 512, 512, 3)
        bn(f"{p}.conv2", 512)
        conv(f"{p}.conv3", 2048, 512, 1)
        bn(f"{p}.conv3", 2048)
        if i == 0:
            conv(f"{p}.shortcut", 2048, 1024, 1)
            bn(f"{p}.shortcut", 2048)
    conv("proposal_generator.rpn_head.conv", 1024, 1024, 3)
    d["proposal_generator.rpn_head.conv.bias"] = np.zeros(1024, np.float32)
    conv("proposal_generator.rpn_head.objectness_logits", 15, 1024, 1)
    d["proposal_generator.rpn_head.objectness_logits.bias"] = np.zeros(15, np.float32)
    conv("proposal_generator.rpn_head.anchor_deltas", 60, 1024, 1)
    d["proposal_generator.rpn_head.anchor_deltas.bias"] = np.zeros(60, np.float32)
    fc("roi_heads.box_predictor.cls_score", num_classes + 1, 2048)
    fc("roi_heads.box_predictor.bbox_pred", num_classes * 4, 2048)
    d["roi_heads.mask_head.deconv.weight"] = np.random.default_rng(1).normal(
        0, 0.02, (2048, 256, 2, 2)
    ).astype(np.float32)
    d["roi_heads.mask_head.deconv.bias"] = np.zeros(256, np.float32)
    conv("roi_heads.mask_head.predictor", num_classes, 256, 1)
    d["roi_heads.mask_head.predictor.bias"] = np.zeros(num_classes, np.float32)
    return d


@pytest.mark.slow
def test_res5_head_torch_parity():
    """pooled ROI -> res5 -> mean -> linear predictors vs a torch replica."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from apse_uav_tpu.dcnn.models.resnet import Res5Stage
    from apse_uav_tpu.dcnn.weights import map_detectron2_weights_c4, unflatten

    src = _synth_c4_state(num_classes=5)
    flat = map_detectron2_weights_c4(src, 50, mask_on=True)
    res5_params = unflatten({k[len("res5/"):]: v for k, v in flat.items() if k.startswith("res5/")})

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 14, 14, 1024)).astype(np.float32)

    got = Res5Stage(depth=50).apply({"params": jax.tree_util.tree_map(jnp.asarray, res5_params)}, jnp.asarray(x))
    got_pool = np.asarray(got).mean(axis=(1, 2))  # (2, 2048)

    def t_bn(y, name):
        w = torch.from_numpy(src[f"{name}.norm.weight"])
        b = torch.from_numpy(src[f"{name}.norm.bias"])
        m = torch.from_numpy(src[f"{name}.norm.running_mean"])
        v = torch.from_numpy(src[f"{name}.norm.running_var"])
        return (y - m[None, :, None, None]) * (
            w[None, :, None, None] / torch.sqrt(v[None, :, None, None] + 1e-5)
        ) + b[None, :, None, None]

    y = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    for i in range(3):
        p = f"roi_heads.res5.{i}"
        stride = 2 if i == 0 else 1
        # caffe-style: stride on conv1
        out = F.conv2d(y, torch.from_numpy(src[f"{p}.conv1.weight"]), stride=stride)
        out = F.relu(t_bn(out, f"{p}.conv1"))
        out = F.conv2d(out, torch.from_numpy(src[f"{p}.conv2.weight"]), stride=1, padding=1)
        out = F.relu(t_bn(out, f"{p}.conv2"))
        out = F.conv2d(out, torch.from_numpy(src[f"{p}.conv3.weight"]))
        out = t_bn(out, f"{p}.conv3")
        if i == 0:
            sc = F.conv2d(y, torch.from_numpy(src[f"{p}.shortcut.weight"]), stride=stride)
            sc = t_bn(sc, f"{p}.shortcut")
        else:
            sc = y
        y = F.relu(out + sc)
    want_pool = y.mean(dim=[2, 3]).numpy()
    np.testing.assert_allclose(got_pool, want_pool, atol=2e-4)

    # Linear predictors on the pooled features.
    from apse_uav_tpu.dcnn.models.c4 import C4BoxPredictor
    from apse_uav_tpu.dcnn.weights import unflatten as unf

    bp = unf({k[len("box_predictor/"):]: v for k, v in flat.items() if k.startswith("box_predictor/")})
    scores, deltas = C4BoxPredictor(num_classes=5).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, bp)}, jnp.asarray(got_pool)
    )
    want_scores = got_pool @ src["roi_heads.box_predictor.cls_score.weight"].T + src["roi_heads.box_predictor.cls_score.bias"]
    np.testing.assert_allclose(np.asarray(scores), want_scores, atol=2e-4)
    assert deltas.shape == (2, 5, 4)


@pytest.mark.slow
def test_c4_zoo_import_and_inference(tmp_path):
    """Synthetic C4 zoo pickle -> map -> load -> jitted inference."""
    from apse_uav_tpu.dcnn.weights import (
        load_torch_file,
        load_into_params,
        map_detectron2_weights_c4,
    )

    src = _synth_c4_state(num_classes=7)
    path = tmp_path / "c4.pkl"
    with open(path, "wb") as f:
        pickle.dump({"model": src, "__author__": "synthetic"}, f)

    cfg = mask_rcnn_r50_c4(num_classes=7)
    # Keep the ROI problem tiny on the 1-core CPU host: res5 reruns per
    # proposal at 14x14x1024.
    cfg = dataclasses.replace(
        cfg,
        rpn=dataclasses.replace(cfg.rpn, pre_nms_topk_test=64, post_nms_topk_test=16),
        roi=dataclasses.replace(cfg.roi, detections_per_image=4),
    )
    model = build_model(cfg)
    assert isinstance(model, MaskRCNNC4)
    images = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (1, 128, 128, 3)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), images, mode="inference")["params"]
    flat = map_detectron2_weights_c4(load_torch_file(str(path)), 50, mask_on=True)
    params, missing, unused = load_into_params(params, flat)
    assert not missing, f"missing: {missing[:8]}"
    assert not unused, f"unused: {unused[:8]}"

    dets, feats = jax.jit(
        lambda p, x: model.apply({"params": p}, x, mode="inference")
    )(params, images)
    assert dets["boxes"].shape == (1, 4, 4)
    assert dets["masks"].shape == (1, 4, 14, 14)
    assert set(feats) == {"res2", "res3", "res4"}
    assert np.isfinite(np.asarray(dets["boxes"])).all()


@pytest.mark.slow
def test_c4_losses_smoke():
    """C4 training losses: finite, all expected keys, grads flow to res5."""
    cfg = mask_rcnn_r50_c4(num_classes=3)
    cfg = dataclasses.replace(
        cfg,
        depth=50,
        rpn=dataclasses.replace(
            cfg.rpn, pre_nms_topk_train=64, post_nms_topk_train=16, batch_size_per_image=16
        ),
        roi=dataclasses.replace(cfg.roi, batch_size_per_image=8),
    )
    model = build_model(cfg)
    images = jnp.asarray(
        np.random.default_rng(1).integers(0, 255, (1, 128, 128, 3)).astype(np.float32)
    )
    gt = {
        "boxes": jnp.asarray([[[8.0, 8.0, 72.0, 72.0], [30.0, 40.0, 90.0, 100.0]]]),
        "classes": jnp.zeros((1, 2), jnp.int32),
        "valid": jnp.ones((1, 2), bool),
        "masks": jnp.ones((1, 2, 128, 128), jnp.float32),
    }
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, images, mode="losses", gt=gt, rng=rng)["params"]

    def total(p):
        losses = model.apply({"params": p}, images, mode="losses", gt=gt, rng=rng)
        return sum(losses.values()), losses

    (tot, losses), grads = jax.value_and_grad(total, has_aux=True)(params)
    assert set(losses) == {"loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg", "loss_mask"}
    assert np.isfinite(float(tot))
    g5 = jax.tree_util.tree_leaves(grads["res5"])
    assert any(float(jnp.abs(g).sum()) > 0 for g in g5)
