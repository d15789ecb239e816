"""RLE codec tests: roundtrips, native-vs-numpy agreement, geometry."""

import numpy as np
import pytest

from apse_uav_tpu.evaluation import rle


def _rand_mask(rng, h, w, blobs=3):
    m = np.zeros((h, w), np.uint8)
    for _ in range(blobs):
        y, x = rng.integers(0, h), rng.integers(0, w)
        rh, rw = rng.integers(1, h // 2 + 1), rng.integers(1, w // 2 + 1)
        m[y : y + rh, x : x + rw] = 1
    return m


@pytest.mark.parametrize("seed", range(5))
def test_encode_decode_roundtrip(seed):
    rng = np.random.default_rng(seed)
    m = _rand_mask(rng, rng.integers(5, 60), rng.integers(5, 60))
    r = rle.encode(m)
    np.testing.assert_array_equal(rle.decode(r), m)


def test_empty_and_full():
    z = np.zeros((7, 9), np.uint8)
    f = np.ones((7, 9), np.uint8)
    assert rle.area(rle.encode(z)) == 0
    assert rle.area(rle.encode(f)) == 63
    np.testing.assert_array_equal(rle.decode(rle.encode(z)), z)
    np.testing.assert_array_equal(rle.decode(rle.encode(f)), f)


def test_area_matches_mask_sum():
    rng = np.random.default_rng(7)
    m = _rand_mask(rng, 40, 30)
    assert rle.area(rle.encode(m)) == int(m.sum())


def test_iou_matches_dense():
    rng = np.random.default_rng(3)
    a = _rand_mask(rng, 32, 32)
    b = _rand_mask(rng, 32, 32)
    got = rle.iou([rle.encode(a)], [rle.encode(b)])[0, 0]
    inter = int((a & b).sum())
    union = int((a | b).sum())
    want = inter / union if union else 0.0
    assert abs(got - want) < 1e-9


def test_iou_iscrowd_is_ioa():
    a = np.zeros((10, 10), np.uint8)
    a[2:6, 2:6] = 1  # 16 px
    b = np.zeros((10, 10), np.uint8)
    b[4:8, 4:8] = 1  # 16 px, overlap 4
    got = rle.iou([rle.encode(a)], [rle.encode(b)], iscrowd=[1])[0, 0]
    assert abs(got - 4 / 16) < 1e-9


def test_merge_union_and_intersect():
    rng = np.random.default_rng(5)
    a = _rand_mask(rng, 20, 25)
    b = _rand_mask(rng, 20, 25)
    ra, rb = rle.encode(a), rle.encode(b)
    np.testing.assert_array_equal(rle.decode(rle.merge([ra, rb])), a | b)
    np.testing.assert_array_equal(rle.decode(rle.merge([ra, rb], intersect=True)), a & b)


def test_tobbox():
    m = np.zeros((12, 15), np.uint8)
    m[3:7, 4:10] = 1
    np.testing.assert_array_equal(rle.toBbox(rle.encode(m)), [4, 3, 6, 4])


def test_string_counts_compatible_with_numpy_fallback():
    """Native and numpy paths must produce byte-identical compressed RLE."""
    rng = np.random.default_rng(11)
    m = _rand_mask(rng, 37, 23)
    flat = np.asfortranarray(m).ravel(order="F")
    counts = rle._counts_encode_np(flat)
    s_np = rle._string_encode_np(counts)
    r = rle.encode(m)
    assert bytes(r["counts"]) == s_np
    # Decode via the numpy string decoder too.
    np.testing.assert_array_equal(rle._string_decode_np(s_np), counts)


def test_native_library_builds():
    """The C++ core should actually be in use in this environment."""
    assert rle._load() is not None
