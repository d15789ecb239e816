"""Layer-level parity vs torch for the checkpoint import path.

Verifies that torch weights mapped through apse_uav_tpu.dcnn.weights produce
numerically identical outputs in the Flax modules (conv padding, FrozenBN,
stride_in_1x1 bottlenecks, maxpool, ConvTranspose, FC flatten order).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from apse_uav_tpu.dcnn.models.resnet import Bottleneck, FrozenBN
from apse_uav_tpu.dcnn.models.roi_heads import BoxHead, MaskHead
from apse_uav_tpu.dcnn.weights import _conv, _deconv, _fc, unflatten


def _frozen_bn_torch(x, w, b, m, v, eps=1e-5):
    return (x - m[None, :, None, None]) * (
        w[None, :, None, None] / torch.sqrt(v[None, :, None, None] + eps)
    ) + b[None, :, None, None]


def test_stem_conv_bn_maxpool_parity():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    w = rng.normal(size=(64, 3, 7, 7)).astype(np.float32) * 0.1
    bn = [rng.normal(size=64).astype(np.float32) * 0.1 + 1,
          rng.normal(size=64).astype(np.float32) * 0.1,
          rng.normal(size=64).astype(np.float32) * 0.1,
          np.abs(rng.normal(size=64)).astype(np.float32) + 0.5]
    xt = torch.from_numpy(x)
    out_t = F.conv2d(xt, torch.from_numpy(w), stride=2, padding=3)
    out_t = _frozen_bn_torch(out_t, *[torch.from_numpy(a) for a in bn])
    out_t = F.relu(out_t)
    out_t = F.max_pool2d(out_t, 3, 2, 1).numpy()

    import flax.linen as nn

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False, name="conv")(x)
            h = FrozenBN(64, name="bn")(h)
            h = nn.relu(h)
            return nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

    params = unflatten({
        "conv/kernel": jnp.asarray(_conv(w)),
        "bn/scale": jnp.asarray(bn[0]),
        "bn/bias": jnp.asarray(bn[1]),
        "bn/mean": jnp.asarray(bn[2]),
        "bn/var": jnp.asarray(bn[3]),
    })
    got = Stem().apply({"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, out_t, atol=2e-4)


def test_bottleneck_stride_in_1x1_parity():
    rng = np.random.default_rng(1)
    cin, cmid, cout = 16, 8, 32
    x = rng.normal(size=(1, cin, 14, 14)).astype(np.float32)

    def mk_conv(o, i, k):
        return rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.2

    def mk_bn(c):
        return [
            rng.normal(size=c).astype(np.float32) * 0.1 + 1,
            rng.normal(size=c).astype(np.float32) * 0.1,
            rng.normal(size=c).astype(np.float32) * 0.1,
            np.abs(rng.normal(size=c)).astype(np.float32) + 0.5,
        ]

    w1, w2, w3, ws = mk_conv(cmid, cin, 1), mk_conv(cmid, cmid, 3), mk_conv(cout, cmid, 1), mk_conv(cout, cin, 1)
    bn1, bn2, bn3, bns = mk_bn(cmid), mk_bn(cmid), mk_bn(cout), mk_bn(cout)

    xt = torch.from_numpy(x)
    t = lambda a: torch.from_numpy(a)
    # caffe-style: stride 2 on the 1x1.
    h = F.relu(_frozen_bn_torch(F.conv2d(xt, t(w1), stride=2), *[t(a) for a in bn1]))
    h = F.relu(_frozen_bn_torch(F.conv2d(h, t(w2), stride=1, padding=1), *[t(a) for a in bn2]))
    h = _frozen_bn_torch(F.conv2d(h, t(w3)), *[t(a) for a in bn3])
    sc = _frozen_bn_torch(F.conv2d(xt, t(ws), stride=2), *[t(a) for a in bns])
    want = F.relu(h + sc).numpy()

    flat = {"conv1/kernel": _conv(w1), "conv2/kernel": _conv(w2), "conv3/kernel": _conv(w3), "shortcut/kernel": _conv(ws)}
    for name, bn in (("bn1", bn1), ("bn2", bn2), ("bn3", bn3), ("shortcut_bn", bns)):
        flat[f"{name}/scale"], flat[f"{name}/bias"], flat[f"{name}/mean"], flat[f"{name}/var"] = bn
    params = unflatten({k: jnp.asarray(v) for k, v in flat.items()})
    block = Bottleneck(out_channels=cout, bottleneck_channels=cmid, stride=2, stride_in_1x1=True, has_shortcut=True)
    got = block.apply({"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_box_head_flatten_order_parity():
    rng = np.random.default_rng(2)
    n, c, r = 3, 12, 7
    x = rng.normal(size=(n, c, r, r)).astype(np.float32)
    w1 = rng.normal(size=(32, c * r * r)).astype(np.float32) * 0.05
    b1 = rng.normal(size=32).astype(np.float32)
    w2 = rng.normal(size=(32, 32)).astype(np.float32) * 0.05
    b2 = rng.normal(size=32).astype(np.float32)
    wc = rng.normal(size=(5, 32)).astype(np.float32) * 0.05
    bc = rng.normal(size=5).astype(np.float32)
    wb = rng.normal(size=(16, 32)).astype(np.float32) * 0.05
    bb = rng.normal(size=16).astype(np.float32)

    xt = torch.from_numpy(x).flatten(1)
    h = F.relu(F.linear(xt, torch.from_numpy(w1), torch.from_numpy(b1)))
    h = F.relu(F.linear(h, torch.from_numpy(w2), torch.from_numpy(b2)))
    want_scores = F.linear(h, torch.from_numpy(wc), torch.from_numpy(bc)).numpy()
    want_deltas = F.linear(h, torch.from_numpy(wb), torch.from_numpy(bb)).numpy().reshape(n, 4, 4)

    flat = {
        "fc1/kernel": _fc(w1), "fc1/bias": b1, "fc2/kernel": _fc(w2), "fc2/bias": b2,
        "cls_score/kernel": _fc(wc), "cls_score/bias": bc,
        "bbox_pred/kernel": _fc(wb), "bbox_pred/bias": bb,
    }
    head = BoxHead(num_classes=4, fc_dim=32, num_fc=2)
    scores, deltas = head.apply({"params": unflatten({k: jnp.asarray(v) for k, v in flat.items()})}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(scores), want_scores, atol=1e-4)
    np.testing.assert_allclose(np.asarray(deltas), want_deltas, atol=1e-4)


def test_mask_head_deconv_parity():
    rng = np.random.default_rng(3)
    n, c, r = 2, 6, 7
    k = 3  # classes
    x = rng.normal(size=(n, c, r, r)).astype(np.float32)
    convs = [rng.normal(size=(c, c, 3, 3)).astype(np.float32) * 0.2 for _ in range(4)]
    conv_b = [rng.normal(size=c).astype(np.float32) for _ in range(4)]
    wd = rng.normal(size=(c, c, 2, 2)).astype(np.float32) * 0.3  # torch deconv (I, O, kh, kw)
    bd = rng.normal(size=c).astype(np.float32)
    wp = rng.normal(size=(k, c, 1, 1)).astype(np.float32) * 0.3
    bp = rng.normal(size=k).astype(np.float32)

    h = torch.from_numpy(x)
    for w, b in zip(convs, conv_b):
        h = F.relu(F.conv2d(h, torch.from_numpy(w), torch.from_numpy(b), padding=1))
    h = F.relu(F.conv_transpose2d(h, torch.from_numpy(wd), torch.from_numpy(bd), stride=2))
    want = F.conv2d(h, torch.from_numpy(wp), torch.from_numpy(bp)).numpy()

    flat = {}
    for i, (w, b) in enumerate(zip(convs, conv_b), start=1):
        flat[f"mask_fcn{i}/kernel"] = _conv(w)
        flat[f"mask_fcn{i}/bias"] = b
    flat["deconv/kernel"] = _deconv(wd)
    flat["deconv/bias"] = bd
    flat["predictor/kernel"] = _conv(wp)
    flat["predictor/bias"] = bp
    head = MaskHead(num_classes=k, conv_dim=c, num_conv=4)
    got = head.apply({"params": unflatten({k2: jnp.asarray(v) for k2, v in flat.items()})}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)
