"""ResNet-50/101 + FPN backbone in Flax (NHWC, TPU-native).

Functional equivalent of detectron2's ``build_resnet_fpn_backbone`` (used by
every model in the reference: dcnn/configs/Base-RCNN-FPN.yaml:3-8), designed
for XLA:TPU:

* NHWC layout end-to-end (TPU conv layout; torch import transposes weights).
* Frozen BatchNorm as explicit affine params (model-zoo checkpoints train
  with FrozenBN; running stats are loaded, never updated).
* Caffe-style bottlenecks (stride on the 1x1 conv) matching the MSRA weights
  the model zoo ships, switchable via config.
* Optional bf16 compute with f32 params.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

_STAGE_BLOCKS = {
    # depth 26 = one bottleneck per stage: smallest config with the same
    # topology (used by compile-time-sensitive dryruns/tests).
    26: (1, 1, 1, 1),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class FrozenBN(nn.Module):
    """BatchNorm with frozen statistics: y = (x - mean) * scale / sqrt(var+eps) + bias.

    Stats live as ordinary params so checkpoint surgery can see them; the
    training loops exclude them (and all backbone params the reference
    freezes) via optimizer masks.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        mult = (scale * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        add = (bias - mean * scale * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        return x * mult + add


def _conv(features: int, kernel: int, stride: int = 1, dtype=jnp.float32, name=None):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        dtype=dtype,
        name=name,
    )


class Bottleneck(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    has_shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        out = _conv(self.bottleneck_channels, 1, s1, self.dtype, "conv1")(x)
        out = FrozenBN(self.bottleneck_channels, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.bottleneck_channels, 3, s3, self.dtype, "conv2")(out)
        out = FrozenBN(self.bottleneck_channels, name="bn2")(out)
        out = nn.relu(out)
        out = _conv(self.out_channels, 1, 1, self.dtype, "conv3")(out)
        out = FrozenBN(self.out_channels, name="bn3")(out)
        if self.has_shortcut:
            sc = _conv(self.out_channels, 1, self.stride, self.dtype, "shortcut")(x)
            sc = FrozenBN(self.out_channels, name="shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNet(nn.Module):
    """Returns {"res2": (B,H/4,W/4,256), ..., "res5": (B,H/32,W/32,2048)}.

    ``max_stage`` truncates the trunk: the C4 backbone
    (Base-RCNN-C4.yaml) ends at res4 and runs res5 inside the ROI head
    (:class:`Res5Stage`)."""

    depth: int = 50
    stride_in_1x1: bool = True
    dtype: Any = jnp.float32
    max_stage: int = 5

    @nn.compact
    def __call__(self, x: Array) -> dict[str, Array]:
        blocks = _STAGE_BLOCKS[self.depth][: self.max_stage - 1]
        x = x.astype(self.dtype)
        # Stem: 7x7/2 + 3x3/2 maxpool (torch pads maxpool by 1).
        x = _conv(64, 7, 2, self.dtype, "stem_conv")(x)
        x = FrozenBN(64, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        outs: dict[str, Array] = {}
        in_ch = 64
        for stage, n_blocks in enumerate(blocks):
            out_ch = 256 * (2**stage)
            mid_ch = 64 * (2**stage)
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                x = Bottleneck(
                    out_channels=out_ch,
                    bottleneck_channels=mid_ch,
                    stride=stride if b == 0 else 1,
                    stride_in_1x1=self.stride_in_1x1,
                    has_shortcut=(b == 0),
                    dtype=self.dtype,
                    name=f"res{stage + 2}_{b}",
                )(x)
            in_ch = out_ch
            outs[f"res{stage + 2}"] = x
        del in_ch
        return outs


class Res5Stage(nn.Module):
    """The res5 bottleneck stage as a standalone module — the C4 ROI head's
    shared transform (detectron2 Res5ROIHeads._shared_roi_transform): pooled
    (N, 14, 14, 1024) ROI features -> (N, 7, 7, 2048) via the stride-2 first
    block.  Param names match ResNet's res5_{i} blocks so weight mapping is
    uniform."""

    depth: int = 50
    stride_in_1x1: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n_blocks = _STAGE_BLOCKS[self.depth][3]
        for b in range(n_blocks):
            x = Bottleneck(
                out_channels=2048,
                bottleneck_channels=512,
                stride=2 if b == 0 else 1,
                stride_in_1x1=self.stride_in_1x1,
                has_shortcut=(b == 0),
                dtype=self.dtype,
                name=f"res5_{b}",
            )(x)
        return x


class FPN(nn.Module):
    """P2..P6 feature pyramid over res2..res5 (detectron2 semantics).

    Top-down pathway with nearest-neighbor x2 upsampling, 1x1 laterals,
    3x3 output convs; P6 = stride-2 maxpool of P5.
    """

    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: dict[str, Array]) -> dict[str, Array]:
        names = ["res2", "res3", "res4", "res5"]
        laterals = [
            nn.Conv(self.channels, (1, 1), use_bias=True, dtype=self.dtype, name=f"lateral{i + 2}")(
                feats[n]
            )
            for i, n in enumerate(names)
        ]
        # Top-down: start at res5.
        td = [None] * 4
        td[3] = laterals[3]
        for i in (2, 1, 0):
            up = td[i + 1]
            b, h, w, c = up.shape
            up = jnp.broadcast_to(up[:, :, None, :, None, :], (b, h, 2, w, 2, c)).reshape(
                b, h * 2, w * 2, c
            )
            # Handle odd lateral sizes (crop the upsampled map).
            lh, lw = laterals[i].shape[1:3]
            td[i] = laterals[i] + up[:, :lh, :lw, :]
        outs = {}
        for i in range(4):
            outs[f"p{i + 2}"] = nn.Conv(
                self.channels,
                (3, 3),
                padding=[(1, 1), (1, 1)],
                use_bias=True,
                dtype=self.dtype,
                name=f"output{i + 2}",
            )(td[i])
        outs["p6"] = nn.max_pool(outs["p5"], (1, 1), strides=(2, 2), padding="VALID")
        return outs


class ResNetFPN(nn.Module):
    """Backbone producing both the res* and p* maps (TrackRCNN returns raw
    backbone features for the association head — track_rcnn.py:57)."""

    depth: int = 50
    channels: int = 256
    stride_in_1x1: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> dict[str, Array]:
        res = ResNet(self.depth, self.stride_in_1x1, self.dtype, name="resnet")(x)
        p = FPN(self.channels, self.dtype, name="fpn")(res)
        return {**res, **p}
