"""Two-pass preprocessing: pooled proposals front + patch-level full-res pass.

The reference preprocessing chain (aruco_detect.py:250-259) LABs and
resamples every pixel of the 4K frame, but the detection pipeline consumes
full-resolution gray only inside the candidate patches (<25% of the frame);
proposal scoring runs on a stride-4 pooled grid anyway.  The two-pass
structure exploits that:

  pass 1 (always): pool the DISTORTED source by the proposal stride, remap
      the pooled source on the pooled grid (same camera model, intrinsics
      scaled — distortion acts on normalized coordinates, so only the
      pixel<->normalized affine changes), LAB+gray at 1/st^2 cost.  Feeds
      proposal scoring only.
  pass 2 (candidate-driven): exact full-resolution undistort+LAB+gray under
      the tiles covering the valid candidates' patches (pallas_remap
      selected-tile mode / the XLA full remap on CPU).

Pass 1 is an approximation of pool(remap(LAB(src))) — pooling commutes with
neither the resample nor the LAB nonlinearity — so proposal scores shift
slightly; candidate-level values are EXACT (same plan, same arithmetic),
which the operating-point recall tests and the oracle parity harness gate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def pooled_camera(mtx: np.ndarray, st: int) -> np.ndarray:
    """Camera matrix for remapping the st-pooled source on the pooled grid.

    Pooled pixel p covers source pixels [st*p, st*p + st) — centre
    st*p + (st-1)/2.  Substituting u = st*u' + (st-1)/2 into the normalized
    coordinates (and the same affine on the output side) gives the identical
    distortion model with fx' = fx/st, cx' = (cx - (st-1)/2)/st.
    """
    c = (st - 1) / 2.0
    m = np.array(mtx, dtype=np.float64)
    m[0, 0] /= st
    m[1, 1] /= st
    m[0, 2] = (m[0, 2] - c) / st
    m[1, 2] = (m[1, 2] - c) / st
    return m


def pooled_frame_size(width: int, height: int, st: int) -> tuple[int, int]:
    """Pooled (W', H') padded so the remap plan's tile grid divides it.

    Heights are padded to a multiple of 32 (a supported tile height divides
    it); widths to a multiple of 128 (the Pallas TPU lowering needs the tile
    width divisible by 128 lanes).  Padded rows/cols map outside the source
    and come back 0.
    """
    w, h = width // st, height // st
    return (-(-w // 128) * 128, -(-h // 32) * 32)


def pool_source_u8(frames: Array, st: int, out_hw: tuple[int, int]) -> Array:
    """Mean-pool planar u8 frames (B, 3, H, W) by st, round to u8, pad.

    out_hw: (H', W') from pooled_frame_size (zero rows/cols appended).
    """
    b, c, h, w = frames.shape
    s = jax.lax.reduce_window(
        frames.astype(jnp.int32), jnp.int32(0), jax.lax.add,
        (1, 1, st, st), (1, 1, st, st), "VALID",
    )
    area = st * st
    pooled = ((s + area // 2) // area).astype(jnp.uint8)
    hp, wp = out_hw
    return jnp.pad(pooled, ((0, 0), (0, 0), (0, hp - h // st), (0, wp - w // st)))


def pool_packed_to_packed(packed: Array, dims, h: int, w: int, pooled_dims,
                          repack: str = "matmul") -> Array:
    """4x4-mean-pool the PACKED kernel source straight into the POOLED
    plan's packed form — no planar u8 intermediate, no re-pack.

    ``packed`` is pallas_remap._pack_frames output: (B, 3, Hp/8, 8, Wp/4)
    int32, 4 little-endian bytes per lane, zero-padded by (pad_y, pad_x).
    The two-pass front needs BOTH this array (selected-tile second pass)
    and a 4x-pooled source (pooled-remap proposals front).  Deriving the
    pooled PACKED array from it:

      per lane, sum the 4 bytes (horizontal 4-sum for free);
      reduce_window(4) over the sublane axis (vertical 4-sum, native);
      round to the pooled byte, re-weight by 256^(lane%4) and window-sum
      groups of 4 lanes (the pooled re-pack, still on i32);
      pad into the pooled plan's geometry.

    Bit-identical to pool_source_u8 -> PallasPreprocessor.pack on the
    pooled plan (test_pallas_remap coverage).  Only st=4 is supported —
    the byte packing IS the horizontal pooling window.
    """
    b = packed.shape[0]
    pad_y, pad_x = dims.pad_y, dims.pad_x
    assert pad_y % 8 == 0 and pad_x % 16 == 0
    assert pooled_dims.pad_x % 16 == 0  # byte positions survive the re-pad
    # Merge the 8-row groups first (sublane-merge reshape, layout-trivial)
    # and pool rows on the resulting row axis: bit-identical to slicing and
    # pooling the 5-D form, but ~0.2 ms/frame faster on the v5e
    # (scripts/bench_pool_variants.py: flat4d 0.490 vs 5-D chain 0.715 —
    # the 5-D stride-4 window over the middle sublane axis costs an extra
    # relayout pass that the flat form avoids).
    flat = packed.reshape(b, 3, dims.padded_h, dims.padded_w // 4)
    core = flat[:, :, pad_y : pad_y + h, pad_x // 4 : (pad_x + w) // 4]
    # Horizontal 4-sum: the lane's 4 bytes.  (Bytes are unsigned; >> on the
    # weighted i32 is arithmetic, so mask AFTER each shift.)
    s4 = ((core >> 0) & 255) + ((core >> 8) & 255) + ((core >> 16) & 255) + ((core >> 24) & 255)
    # Vertical 4-sum over the row axis: native pooling.
    v = jax.lax.reduce_window(s4, jnp.int32(0), jax.lax.add, (1, 1, 4, 1), (1, 1, 4, 1), "VALID")
    byte = (v + 8) >> 4  # pooled u8 value, kept i32: (B, 3, H/4, W/4)
    nl = w // 4  # pooled bytes per row (source lanes)
    if repack == "matmul":
        # Lane repack out[k] = sum_j byte[4k+j] << 8j as two MXU dots: the
        # stride-4 lane-window reduce_window costs ~0.5 ms/frame on the
        # v5e while the MXU sits idle.  Each dot's accumuland is bounded by
        # 255 * (1 + 256) = 65535 < 2^24, so f32 accumulation is EXACT.
        lane = np.arange(nl)
        p_lo = np.zeros((nl, nl // 4), np.float32)
        p_hi = np.zeros((nl, nl // 4), np.float32)
        sel_lo = (lane % 4) < 2
        p_lo[lane[sel_lo], lane[sel_lo] // 4] = (256 ** (lane[sel_lo] % 4)).astype(np.float32)
        p_hi[lane[~sel_lo], lane[~sel_lo] // 4] = (256 ** (lane[~sel_lo] % 4 - 2)).astype(np.float32)
        bf = byte.astype(jnp.float32)
        lo = jax.lax.dot_general(
            bf, jnp.asarray(p_lo), (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
        hi = jax.lax.dot_general(
            bf, jnp.asarray(p_hi), (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
        pp = lo.astype(jnp.int32) + (hi.astype(jnp.int32) << 16)
    else:
        lane_w = jnp.left_shift(
            jnp.int32(1), 8 * (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, nl), 3) % 4)
        )
        pp = jax.lax.reduce_window(
            byte * lane_w, jnp.int32(0), jax.lax.add, (1, 1, 1, 4), (1, 1, 1, 4), "VALID"
        )  # (B, 3, H/4, W/16)
    pp = pp.reshape(b, 3, h // 4, w // 16)
    hpool, wpool = h // 4, w // 4
    hp2, wp2 = pooled_dims.padded_h, pooled_dims.padded_w
    pp = jnp.pad(
        pp,
        ((0, 0), (0, 0), (pooled_dims.pad_y, hp2 - hpool - pooled_dims.pad_y),
         (pooled_dims.pad_x // 4, (wp2 - pooled_dims.pad_x - wpool) // 4)),
    )
    return pp.reshape(b, 3, hp2 // 8, 8, wp2 // 4)
