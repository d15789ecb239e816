"""Smoke + shape tests for the Flax Mask R-CNN on tiny inputs (CPU mesh)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apse_uav_tpu.dcnn.config import ModelConfig, ROIConfig, RPNConfig, mask_rcnn_r50_fpn
from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN

import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = mask_rcnn_r50_fpn(num_classes=4)
    return dataclasses.replace(
        cfg,
        rpn=dataclasses.replace(
            cfg.rpn, pre_nms_topk_test=64, post_nms_topk_test=32,
            pre_nms_topk_train=64, post_nms_topk_train=32, batch_size_per_image=32,
        ),
        roi=dataclasses.replace(
            cfg.roi, num_classes=4, detections_per_image=8, batch_size_per_image=16
        ),
    )


@pytest.fixture(scope="module")
def model_and_params(tiny_cfg):
    model = MaskRCNN(cfg=tiny_cfg)
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(lambda rng: model.init(rng, images, mode="inference")["params"])(
        jax.random.PRNGKey(0)
    )
    return model, params


def test_backbone_shapes(model_and_params):
    model, params = model_and_params
    images = jnp.zeros((2, 64, 64, 3), jnp.float32)
    feats = model.apply({"params": params}, images, mode="backbone")
    assert feats["res2"].shape == (2, 16, 16, 256)
    assert feats["res5"].shape == (2, 2, 2, 2048)
    assert feats["p2"].shape == (2, 16, 16, 256)
    assert feats["p6"].shape == (2, 1, 1, 256)


def test_inference_shapes_and_masks(model_and_params, tiny_cfg):
    model, params = model_and_params
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
    dets, feats = model.apply({"params": params}, images, mode="inference")
    d = tiny_cfg.roi.detections_per_image
    assert dets["boxes"].shape == (1, d, 4)
    assert dets["scores"].shape == (1, d)
    assert dets["classes"].shape == (1, d)
    assert dets["valid"].shape == (1, d)
    assert dets["masks"].shape == (1, d, 28, 28)
    assert np.isfinite(np.asarray(dets["boxes"])).all()
    assert ((np.asarray(dets["masks"]) >= 0) & (np.asarray(dets["masks"]) <= 1)).all()


def test_losses_finite_and_complete(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
    gt = {
        "boxes": jnp.asarray([[[8.0, 8.0, 30.0, 28.0], [40.0, 40.0, 60.0, 62.0]]]),
        "classes": jnp.asarray([[1, 2]]),
        "valid": jnp.asarray([[True, True]]),
        "masks": jnp.ones((1, 2, 64, 64), jnp.float32),
    }
    losses = model.apply(
        {"params": params}, images, mode="losses", gt=gt, rng=jax.random.PRNGKey(3)
    )
    expected = {"loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg", "loss_mask"}
    assert expected == set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_losses_differentiable(model_and_params):
    model, params = model_and_params
    images = jnp.full((1, 64, 64, 3), 128.0)
    gt = {
        "boxes": jnp.asarray([[[8.0, 8.0, 30.0, 28.0]]]),
        "classes": jnp.asarray([[0]]),
        "valid": jnp.asarray([[True]]),
        "masks": jnp.ones((1, 1, 64, 64), jnp.float32),
    }

    def total(p):
        losses = model.apply({"params": p}, images, mode="losses", gt=gt, rng=jax.random.PRNGKey(0))
        return sum(losses.values())

    grads = jax.grad(total)(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x)), grads, jnp.float32(0)
    )
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_selective_rpn_levels(model_and_params, tiny_cfg):
    """SelectiveRPN semantics: proposals from the coarsest level only."""
    model, params = model_and_params
    images = jnp.full((1, 64, 64, 3), 127.0)
    dets, _ = model.apply(
        {"params": params}, images,
        method=lambda m, im: m.inference(im, rpn_levels=("p6",)),
    )
    d = tiny_cfg.roi.detections_per_image
    assert dets["boxes"].shape == (1, d, 4)
    assert np.isfinite(np.asarray(dets["boxes"])).all()
