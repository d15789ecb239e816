"""Fused Pallas 4x4 pool of the packed kernel source.

``twopass.pool_packed_to_packed`` as ONE pass over the packed array: the
XLA chain (byte-extract -> sublane reduce_window -> lane repack -> pad)
materializes several full-frame intermediates through HBM and costs
~0.5-0.75 ms/frame at 4K on the v5e, though its minimum traffic is one
25 MB read + one 1.6 MB write (~35 us).  Here each grid step reads one
(RB, 8, W4) i32 row-block to VMEM, computes the pooled PACKED lanes
in-register (byte sums, sublane 4-sums, and the lane repack as two exact
MXU dots — integers <= 65535 in f32), and writes only the (RB, 2, W4/4)
result.

The kernel pools the FULL padded array (padding rows/lanes produce
garbage that the caller's core-slice + re-pad discards), keeping every
block offset trivially aligned.  Bit-identical to the XLA path
(tests/test_pallas_pool.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, o_ref):
    x = x_ref[0, 0]  # (RB, 8, W4) i32: 4 little-endian bytes per lane
    s4 = ((x >> 0) & 255) + ((x >> 8) & 255) + ((x >> 16) & 255) + ((x >> 24) & 255)
    va = s4[:, 0:4, :].sum(axis=1)  # (RB, W4)
    vb = s4[:, 4:8, :].sum(axis=1)
    rb, w4 = va.shape
    byte = (jnp.stack([va, vb], axis=1) + 8) >> 4  # (RB, 2, W4) pooled bytes
    bf = byte.reshape(rb * 2, w4).astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (w4, w4 // 4), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (w4, w4 // 4), 1)
    grp = (rows // 4) == cols
    mod = rows % 4
    p_lo = jnp.where(grp & (mod < 2), jnp.where(mod == 0, 1.0, 256.0), 0.0)
    p_hi = jnp.where(grp & (mod >= 2), jnp.where(mod == 2, 1.0, 256.0), 0.0)
    lo = jnp.dot(bf, p_lo, preferred_element_type=jnp.float32)
    hi = jnp.dot(bf, p_hi, preferred_element_type=jnp.float32)
    out = lo.astype(jnp.int32) + (hi.astype(jnp.int32) << 16)
    o_ref[0, 0] = out.reshape(rb, 2, w4 // 4)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pool_packed_rows(packed: jax.Array, interpret: bool = False) -> jax.Array:
    """(B, 3, HP8, 8, W4) i32 packed -> (B, 3, HP8, 2, W4/4) i32 pooled
    packed rows (every padded row-group pooled; caller slices the core)."""
    b, c, hp8, _, w4 = packed.shape
    assert w4 % 4 == 0
    rb = next(r for r in range(min(40, hp8), 0, -1) if hp8 % r == 0)
    grid = (b, c, hp8 // rb)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1, rb, 8, w4), lambda i, j, k: (i, j, k, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, rb, 2, w4 // 4), lambda i, j, k: (i, j, k, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, c, hp8, 2, w4 // 4), jnp.int32),
        interpret=interpret,
    )(packed)


def pool_packed_to_packed_pallas(packed: jax.Array, dims, h: int, w: int, pooled_dims,
                                 interpret: bool = False) -> jax.Array:
    """Drop-in for twopass.pool_packed_to_packed via the Pallas kernel."""
    b = packed.shape[0]
    pad_y, pad_x = dims.pad_y, dims.pad_x
    assert pad_y % 8 == 0 and pad_x % 16 == 0
    assert pooled_dims.pad_x % 16 == 0
    pooled = pool_packed_rows(packed, interpret=interpret)  # (B,3,HP8,2,W4/4)
    hp8 = pooled.shape[2]
    pp = pooled.reshape(b, 3, hp8 * 2, -1)  # pooled rows at source/4
    # Core slice: pooled row r covers source rows 4r..4r+3; the core starts
    # at pad_y (a multiple of 8 -> divisible by 4) and pooled lane k covers
    # source lanes 4k.. (pad_x/4 divisible by 4 via pad_x % 16 == 0).
    pp = pp[:, :, pad_y // 4 : (pad_y + h) // 4, pad_x // 16 : (pad_x + w) // 16]
    hpool, wpool = h // 4, w // 4
    hp2, wp2 = pooled_dims.padded_h, pooled_dims.padded_w
    pp = jnp.pad(
        pp,
        ((0, 0), (0, 0), (pooled_dims.pad_y, hp2 - hpool - pooled_dims.pad_y),
         (pooled_dims.pad_x // 4, (wp2 - pooled_dims.pad_x - wpool) // 4)),
    )
    return pp.reshape(b, 3, hp2 // 8, 8, wp2 // 4)
