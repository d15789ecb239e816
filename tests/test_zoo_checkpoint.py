"""End-to-end model-zoo checkpoint import.

The environment has no network, so instead of downloading the real R50-FPN
Mask R-CNN pickle (scripts/get_pretrained.sh) these tests construct a
FULL model state dict with the exact detectron2 zoo key set / tensor
shapes / serialization formats, then exercise the complete import path:
zoo ``.pkl`` (and torch ``.pth``) -> ``load_torch_file`` ->
``map_detectron2_weights`` -> ``load_into_params`` -> jitted inference —
the TrackPredictor bring-up path (reference track_predictor.py:20-21).
"""

import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow

STAGES = {50: (3, 4, 6, 3)}


def _full_d2_state(depth=50, num_classes=80, seed=0):
    """Every tensor of a detectron2 GeneralizedRCNN R{depth}-FPN Mask R-CNN,
    with the zoo's exact names and shapes."""
    rng = np.random.default_rng(seed)
    d = {}

    def conv(name, o, i, k):
        d[f"{name}.weight"] = rng.normal(0, 0.03, (o, i, k, k)).astype(np.float32)

    def bias(name, o):
        d[f"{name}.bias"] = rng.normal(0, 0.01, (o,)).astype(np.float32)

    def bn(name, c):
        d[f"{name}.norm.weight"] = np.abs(rng.normal(1, 0.05, (c,))).astype(np.float32)
        d[f"{name}.norm.bias"] = rng.normal(0, 0.05, (c,)).astype(np.float32)
        d[f"{name}.norm.running_mean"] = rng.normal(0, 0.1, (c,)).astype(np.float32)
        d[f"{name}.norm.running_var"] = np.abs(rng.normal(1, 0.1, (c,))).astype(np.float32)

    bb = "backbone.bottom_up"
    conv(f"{bb}.stem.conv1", 64, 3, 7)
    bn(f"{bb}.stem.conv1", 64)
    in_ch = 64
    for stage, n_blocks in enumerate(STAGES[depth]):
        out_ch, mid = 256 * 2**stage, 64 * 2**stage
        for i in range(n_blocks):
            p = f"{bb}.res{stage + 2}.{i}"
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
    for lvl, c in zip(range(2, 6), (256, 512, 1024, 2048)):
        conv(f"backbone.fpn_lateral{lvl}", 256, c, 1)
        bias(f"backbone.fpn_lateral{lvl}", 256)
        conv(f"backbone.fpn_output{lvl}", 256, 256, 3)
        bias(f"backbone.fpn_output{lvl}", 256)
    conv("proposal_generator.rpn_head.conv", 256, 256, 3)
    bias("proposal_generator.rpn_head.conv", 256)
    conv("proposal_generator.rpn_head.objectness_logits", 3, 256, 1)
    bias("proposal_generator.rpn_head.objectness_logits", 3)
    conv("proposal_generator.rpn_head.anchor_deltas", 12, 256, 1)
    bias("proposal_generator.rpn_head.anchor_deltas", 12)
    d["roi_heads.box_head.fc1.weight"] = rng.normal(0, 0.01, (1024, 256 * 7 * 7)).astype(np.float32)
    d["roi_heads.box_head.fc1.bias"] = np.zeros(1024, np.float32)
    d["roi_heads.box_head.fc2.weight"] = rng.normal(0, 0.01, (1024, 1024)).astype(np.float32)
    d["roi_heads.box_head.fc2.bias"] = np.zeros(1024, np.float32)
    d["roi_heads.box_predictor.cls_score.weight"] = rng.normal(0, 0.01, (num_classes + 1, 1024)).astype(np.float32)
    d["roi_heads.box_predictor.cls_score.bias"] = np.zeros(num_classes + 1, np.float32)
    d["roi_heads.box_predictor.bbox_pred.weight"] = rng.normal(0, 0.001, (4 * num_classes, 1024)).astype(np.float32)
    d["roi_heads.box_predictor.bbox_pred.bias"] = np.zeros(4 * num_classes, np.float32)
    for i in range(1, 5):
        conv(f"roi_heads.mask_head.mask_fcn{i}", 256, 256, 3)
        bias(f"roi_heads.mask_head.mask_fcn{i}", 256)
    conv("roi_heads.mask_head.deconv", 256, 256, 2)  # (in, out, 2, 2) torch deconv
    bias("roi_heads.mask_head.deconv", 256)
    conv("roi_heads.mask_head.predictor", num_classes, 256, 1)
    bias("roi_heads.mask_head.predictor", num_classes)
    d["pixel_mean"] = np.array([103.53, 116.28, 123.675], np.float32)  # extra zoo blob
    return d


def _import_and_run(path, tmp_path):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from apse_uav_tpu.dcnn import weights as W
    from apse_uav_tpu.dcnn.config import mask_rcnn_r50_fpn
    from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN

    cfg = mask_rcnn_r50_fpn(num_classes=80)
    cfg = dataclasses.replace(
        cfg,
        rpn=dataclasses.replace(cfg.rpn, pre_nms_topk_test=128, post_nms_topk_test=64),
        roi=dataclasses.replace(cfg.roi, detections_per_image=16),
    )
    model = MaskRCNN(cfg=cfg)
    images = jnp.asarray(
        np.random.default_rng(1).normal(120, 40, (1, 128, 160, 3)).astype(np.float32)
    )
    params = jax.jit(lambda r: model.init(r, images, mode="inference")["params"])(
        jax.random.PRNGKey(0)
    )
    flat = W.map_detectron2_weights(W.load_torch_file(path), 50, True)
    loaded, missing, unused = W.load_into_params(params, flat)
    # EVERY model param must come from the checkpoint, and every mapped
    # tensor must land somewhere.
    assert missing == [], missing[:8]
    assert unused == [], unused[:8]
    dets, feats = jax.jit(lambda p: model.apply({"params": p}, images, mode="inference"))(loaded)
    assert np.isfinite(np.asarray(dets["boxes"])).all()
    assert np.isfinite(np.asarray(dets["scores"])).all()
    assert set(feats) >= {"p2", "p3", "p4", "p5", "p6"}
    return loaded


def test_zoo_pkl_roundtrip(tmp_path):
    """Zoo-format .pkl (pickle of {'model': {name: ndarray}}) end-to-end."""
    state = _full_d2_state()
    path = str(tmp_path / "model_final_f10217.pkl")
    with open(path, "wb") as f:
        pickle.dump({"model": state, "__author__": "Detectron2 Model Zoo"}, f)
    _import_and_run(path, tmp_path)


def test_torch_pth_roundtrip(tmp_path):
    """The same full state dict saved through torch (.pth) loads identically."""
    torch = pytest.importorskip("torch")
    state = _full_d2_state()
    path_pth = str(tmp_path / "model.pth")
    torch.save({"model": {k: torch.from_numpy(v) for k, v in state.items()}}, path_pth)

    from apse_uav_tpu.dcnn import weights as W

    a = W.load_torch_file(path_pth)
    assert set(a) == set(state)
    for k in state:
        np.testing.assert_array_equal(a[k], state[k])
    _import_and_run(path_pth, tmp_path)


def test_zoo_to_uav_tracker_config(tmp_path):
    """The uav_tracker_config bring-up: slice the 80-class zoo predictor
    rows down to the 4 UAV classes (add_mask_head_to_frcnn.py:62-73)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from apse_uav_tpu.dcnn import weights as W
    from apse_uav_tpu.dcnn.config import uav_tracker_config
    from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN

    state = _full_d2_state()
    path = str(tmp_path / "zoo.pkl")
    with open(path, "wb") as f:
        pickle.dump({"model": state}, f)

    flat = W.map_detectron2_weights(W.load_torch_file(path), 50, True)
    # COCO classes for (car, truck, bus, person)-style subset.
    flat = W.slice_predictor_classes(flat, [2, 7, 5, 0], num_src_classes=80)

    cfg = uav_tracker_config(num_classes=4)
    cfg = dataclasses.replace(
        cfg,
        rpn=dataclasses.replace(cfg.rpn, pre_nms_topk_test=128, post_nms_topk_test=64),
        roi=dataclasses.replace(cfg.roi, detections_per_image=16),
    )
    if cfg.depth != 50:
        cfg = dataclasses.replace(cfg, depth=50)
    model = MaskRCNN(cfg=cfg)
    images = jnp.zeros((1, 128, 160, 3), jnp.float32)
    params = jax.jit(lambda r: model.init(r, images, mode="inference")["params"])(
        jax.random.PRNGKey(0)
    )
    loaded, missing, unused = W.load_into_params(params, flat)
    assert missing == [], missing[:8]
    dets, _ = jax.jit(lambda p: model.apply({"params": p}, images, mode="inference"))(loaded)
    assert int(np.asarray(dets["classes"]).max()) <= 3
