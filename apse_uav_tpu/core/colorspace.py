"""Colorspace math in pure JAX matching OpenCV 8-bit semantics.

The reference preprocessing (aruco_detect.py:250-259) does, per 4K frame:

    frame = cv2.remap(frame, mapx, mapy, INTER_LINEAR)
    lab   = cv2.cvtColor(frame, COLOR_RGB2LAB)
    lab[..., 0] = cv2.LUT(lab[..., 0], gamma_lut)      # gamma = 2 on L
    frame = cv2.cvtColor(lab, COLOR_LAB2RGB)
    ...
    gray  = cv2.cvtColor(frame, COLOR_BGR2GRAY)         # aruco_detect.py:592

Here those become closed-form per-pixel float math, so the whole chain can be
fused into a single TPU kernel (no 256-entry LUT gathers: the LUT is just
``round(255 * (L/255)^gamma)`` evaluated directly).

OpenCV's 8-bit Lab conversion applies sRGB companding and uses D65
normalization; we follow the same formulas in float32.  Agreement with
OpenCV's fixed-point tables is within ~1 LSB, verified by tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# D65 whitepoint-normalized RGB->XYZ (OpenCV color_lab.cpp constants).
_RGB2XYZ = jnp.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ]
)
_XN = 0.950456
_ZN = 1.088754


def _srgb_to_linear(u: Array) -> Array:
    return jnp.where(u <= 0.04045, u / 12.92, ((u + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(u: Array) -> Array:
    u = jnp.maximum(u, 0.0)
    return jnp.where(u <= 0.0031308, u * 12.92, 1.055 * u ** (1.0 / 2.4) - 0.055)


def _f_cbrt(t: Array) -> Array:
    """CIE Lab forward nonlinearity."""
    return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)


def _f_inv(ft: Array) -> Array:
    return jnp.where(ft > 0.2068966, ft**3, (ft - 16.0 / 116.0) / 7.787)


def rgb_to_lab_u8(rgb: Array) -> Array:
    """COLOR_RGB2LAB on uint8 data -> uint8 (L*255/100, a+128, b+128).

    Channel semantics follow whatever order the caller stores; the reference
    feeds BGR-ordered data through COLOR_RGB2LAB (aruco_detect.py:255) and we
    reproduce that by simply applying the same math to the stored channels.
    """
    x = rgb.astype(jnp.float32) / 255.0
    lin = _srgb_to_linear(x)
    # Explicit linear combination (VPU-friendly; avoids MXU bf16 rounding).
    m = _RGB2XYZ
    xyz = jnp.stack(
        [
            m[0, 0] * lin[..., 0] + m[0, 1] * lin[..., 1] + m[0, 2] * lin[..., 2],
            m[1, 0] * lin[..., 0] + m[1, 1] * lin[..., 1] + m[1, 2] * lin[..., 2],
            m[2, 0] * lin[..., 0] + m[2, 1] * lin[..., 1] + m[2, 2] * lin[..., 2],
        ],
        axis=-1,
    )
    fx = _f_cbrt(xyz[..., 0] / _XN)
    fy = _f_cbrt(xyz[..., 1])
    fz = _f_cbrt(xyz[..., 2] / _ZN)
    big_l = jnp.where(xyz[..., 1] > 0.008856, 116.0 * fy - 16.0, 903.3 * xyz[..., 1])
    a = 500.0 * (fx - fy) + 128.0
    b = 200.0 * (fy - fz) + 128.0
    lab = jnp.stack([big_l * (255.0 / 100.0), a, b], axis=-1)
    return jnp.clip(jnp.round(lab), 0.0, 255.0).astype(jnp.uint8)


def lab_to_rgb_u8(lab: Array) -> Array:
    """COLOR_LAB2RGB on uint8 data -> uint8."""
    lab_f = lab.astype(jnp.float32)
    big_l = lab_f[..., 0] * (100.0 / 255.0)
    a = lab_f[..., 1] - 128.0
    b = lab_f[..., 2] - 128.0
    fy = (big_l + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    x = _f_inv(fx) * _XN
    y = jnp.where(big_l > 8.0, fy**3, big_l / 903.3)
    z = _f_inv(fz) * _ZN
    mi = jnp.linalg.inv(_RGB2XYZ)
    lin = jnp.stack(
        [
            mi[0, 0] * x + mi[0, 1] * y + mi[0, 2] * z,
            mi[1, 0] * x + mi[1, 1] * y + mi[1, 2] * z,
            mi[2, 0] * x + mi[2, 1] * y + mi[2, 2] * z,
        ],
        axis=-1,
    )
    srgb = _linear_to_srgb(lin)
    return jnp.clip(jnp.round(srgb * 255.0), 0.0, 255.0).astype(jnp.uint8)


def gamma_l_channel(lab_l: Array, gamma: float = 2.0) -> Array:
    """The reference's gamma LUT (aruco_detect.py:537-540) as closed form.

    lut[i] = clip((i/255)^gamma * 255) truncated to uint8 (the reference
    assigns the float into a uint8 array -> C-style truncation).
    """
    lf = lab_l.astype(jnp.float32) / 255.0
    out = jnp.floor(jnp.clip(lf**gamma * 255.0, 0.0, 255.0))
    return out.astype(jnp.uint8)


def gamma_correct_u8(frame: Array, gamma: float = 2.0) -> Array:
    """Full LAB-roundtrip gamma correction of an HxWx3 uint8 frame."""
    lab = rgb_to_lab_u8(frame)
    lab = lab.at[..., 0].set(gamma_l_channel(lab[..., 0], gamma))
    return lab_to_rgb_u8(lab)


def bgr_to_gray_u8(frame: Array) -> Array:
    """COLOR_BGR2GRAY on uint8 (stored order B, G, R) -> uint8 gray.

    Matches OpenCV's fixed-point rounding: coefficients scaled by 2^14.
    """
    f = frame.astype(jnp.int32)
    # OpenCV: R2Y=4899, G2Y=9617, B2Y=1868 at shift=14, round-half-up.
    y = (4899 * f[..., 2] + 9617 * f[..., 1] + 1868 * f[..., 0] + (1 << 13)) >> 14
    return jnp.clip(y, 0, 255).astype(jnp.uint8)
