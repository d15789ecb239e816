"""ArUco DICT_4X4_50 dictionary and batched decoding.

The 50 4x4-bit codes below are the standard OpenCV predefined dictionary
(data, extracted from cv2.aruco.getPredefinedDictionary(DICT_4X4_50) marker
renderings; each integer packs the 16 inner bits row-major, MSB first).
``maxCorrectionBits`` for this dictionary is 1; the reference sets
``errorCorrectionRate = 2.0`` (aruco_detect.py:197), giving an effective
correction budget of int(1 * 2.0) = 2 bits — we reproduce that semantics.

Matching is a fixed-shape XLA computation: popcount-based Hamming distance of
a candidate's 16 bits against all 50 codes in all 4 rotations at once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# fmt: off
DICT_4X4_50 = np.array([
    46386, 3994, 13101, 39238, 21662, 31181, 40494, 50418, 65242, 53078,
    63889, 4519, 3767, 10767, 9393, 9790, 18021, 26112, 27742, 30383,
    34443, 45099, 52437, 56706, 65095, 38001, 44260, 42324, 8483, 13423,
    17429, 22450, 40655, 61643, 2222, 2345, 6261, 1279, 3574, 7258,
    5912, 10792, 12940, 14514, 9448, 12011, 11583, 19300, 20526, 20499,
], dtype=np.uint32)
# fmt: on

MARKER_SIZE = 4
MAX_CORRECTION_BITS = 1  # property of DICT_4X4_50


def _bits_to_grid(code: int) -> np.ndarray:
    """16-bit packed code -> (4, 4) bit grid (1 = white cell)."""
    return np.array([[(code >> (15 - (r * 4 + c))) & 1 for c in range(4)] for r in range(4)], dtype=np.uint8)


def _grid_to_bits(grid: np.ndarray) -> int:
    out = 0
    for b in grid.reshape(-1):
        out = (out << 1) | int(b)
    return out


def _rotations(code: int) -> list[int]:
    """The 4 rotations of a code (90 deg steps, as OpenCV stores them)."""
    g = _bits_to_grid(code)
    return [_grid_to_bits(np.rot90(g, -k)) for k in range(4)]


# (50, 4) uint32: all rotations of all codes, precomputed host-side.
_ALL_ROTATIONS = np.array([_rotations(int(c)) for c in DICT_4X4_50], dtype=np.uint32)


def _popcount16(x: jax.Array) -> jax.Array:
    x = x - ((x >> 1) & 0x5555)
    x = (x & 0x3333) + ((x >> 2) & 0x3333)
    x = (x + (x >> 4)) & 0x0F0F
    return (x + (x >> 8)) & 0x1F


@functools.partial(jax.jit, static_argnames=("error_correction_rate",))
def match_dictionary(bits: jax.Array, error_correction_rate: float = 2.0):
    """Match packed 16-bit candidate codes against DICT_4X4_50.

    Args:
      bits: (...,) uint32 packed candidate bit patterns (row-major, MSB first,
        in the candidate's own orientation).
      error_correction_rate: OpenCV semantics; budget =
        int(maxCorrectionBits * rate).

    Returns:
      (ids, rotations, distances): each (...,) int32.  id == -1 when no code
      is within the correction budget.  ``rotation`` k means the candidate's
      corner list must be rolled by k to match the canonical marker
      orientation (OpenCV convention).
    """
    budget = int(MAX_CORRECTION_BITS * error_correction_rate)
    table = jnp.asarray(_ALL_ROTATIONS)  # (50, 4)
    x = bits.astype(jnp.uint32)[..., None, None]
    dist = _popcount16(jnp.bitwise_xor(x, table[None, ...]) if bits.ndim else jnp.bitwise_xor(x, table))
    # dist: (..., 50, 4)
    flat = dist.reshape(*dist.shape[:-2], 200)
    best = jnp.argmin(flat, axis=-1)
    best_dist = jnp.take_along_axis(flat, best[..., None], axis=-1)[..., 0].astype(jnp.int32)
    ids = jnp.where(best_dist <= budget, (best // 4).astype(jnp.int32), -1)
    rot = (best % 4).astype(jnp.int32)
    return ids, rot, best_dist


def marker_image(marker_id: int, cell_px: int = 1) -> np.ndarray:
    """Render a canonical marker (6x6 cells incl. 1-cell black border).

    Returns a (6*cell_px, 6*cell_px) uint8 image, 0 = black, 255 = white.
    Matches cv2.aruco's generateImageMarker output.
    """
    grid = np.zeros((6, 6), dtype=np.uint8)
    grid[1:5, 1:5] = _bits_to_grid(int(DICT_4X4_50[marker_id]))
    img = (grid * 255).astype(np.uint8)
    return np.kron(img, np.ones((cell_px, cell_px), dtype=np.uint8))
