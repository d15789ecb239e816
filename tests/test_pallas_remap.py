"""Fused Pallas preproc kernel vs the OpenCV reference chain (interpret mode).

Runs the kernel in Pallas interpret mode on CPU; the same kernel is compiled
for TPU at runtime (verified on hardware via bench.py / the verify recipe).
"""

import os

import cv2
import numpy as np
import jax.numpy as jnp

from apse_uav_tpu.core import camera
from apse_uav_tpu.preproc.pallas_remap import PallasPreprocessor

import pytest

pytestmark = pytest.mark.slow


def _scaled_cam(w, h):
    mtx, dist = camera.load_camera_params(os.path.join(os.path.dirname(__file__), "..", "data", "cam_params.json"))
    mtx = mtx.copy()
    mtx[0] *= w / 3840.0
    mtx[1] *= h / 2160.0
    return mtx, dist


def _reference_chain(img, mtx, dist, w, h):
    mapx, mapy = cv2.initUndistortRectifyMap(mtx, dist.reshape(-1, 1), None, mtx, (w, h), cv2.CV_32FC1)
    out = cv2.remap(img, mapx, mapy, cv2.INTER_LINEAR)
    lut = np.clip((np.arange(256) / 255.0) ** 2 * 255.0, 0, 255).astype(np.uint8)
    lab = cv2.cvtColor(out, cv2.COLOR_RGB2LAB)
    lab[..., 0] = cv2.LUT(lab[..., 0], lut)
    out = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
    return out, cv2.cvtColor(out, cv2.COLOR_BGR2GRAY)


def test_fused_kernel_matches_cv2_chain():
    h, w = 16 * 8, 256 * 2
    mtx, dist = _scaled_cam(w, h)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            128 + 100 * np.sin(xx / 17.0) * np.cos(yy / 23.0),
            128 + 90 * np.cos(xx / 29.0 + 1.0),
            128 + 80 * np.sin(yy / 13.0 + 2.0),
        ],
        -1,
    ).clip(0, 255).astype(np.uint8)
    ref, ref_gray = _reference_chain(img, mtx, dist, w, h)

    pre = PallasPreprocessor(mtx, dist, (w, h), interpret=True)
    out, gray = pre(jnp.asarray(img.transpose(2, 0, 1)[None]))
    out = np.asarray(out)[0].transpose(1, 2, 0).astype(np.int32)
    gray = np.asarray(gray)[0].astype(np.int32)

    d = np.abs(out - ref.astype(np.int32))
    dg = np.abs(gray - ref_gray.astype(np.int32))
    # cv2 uses 5-bit fixed-point remap weights and fixed-point Lab tables;
    # small LSB drift amplifies through the gamma curve.  What matters for
    # detection parity is the gray channel and that big deviations are rare.
    assert (d > 2).mean() < 0.02, ((d > 2).mean(), d.max())
    assert (dg > 2).mean() < 0.01, ((dg > 2).mean(), dg.max())
    assert (dg > 1).mean() < 0.05


def test_fused_kernel_batched_and_shapes():
    h, w = 16 * 4, 256 * 2
    mtx, dist = _scaled_cam(w, h)
    pre = PallasPreprocessor(mtx, dist, (w, h), interpret=True)
    frames = np.random.default_rng(0).integers(0, 256, (3, 3, h, w), dtype=np.uint8)
    out, gray = pre(jnp.asarray(frames))
    assert out.shape == (3, 3, h, w) and out.dtype == jnp.uint8
    assert gray.shape == (3, h, w) and gray.dtype == jnp.uint8


def test_plan_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path))
    h, w = 16 * 2, 256
    mtx, dist = _scaled_cam(w, h)
    from apse_uav_tpu.preproc.pallas_remap import build_remap_plan

    p1 = build_remap_plan(mtx, dist, (w, h))
    p2 = build_remap_plan(mtx, dist, (w, h))  # from cache
    assert p1.bucket_dy == p2.bucket_dy and p1.bucket_dx == p2.bucket_dx
    assert p1.bucket_used == p2.bucket_used
    np.testing.assert_array_equal(p1.table, p2.table)
    np.testing.assert_array_equal(p1.yres0, p2.yres0)
    for a, b in zip(p1.sub_yres, p2.sub_yres):
        np.testing.assert_array_equal(a, b)


def test_wild_bucket_matches_cv2_chain():
    """Force tiles into the non-calm buckets (tiny calm caps) and check
    parity."""
    from apse_uav_tpu.preproc import pallas_remap as pr

    h, w = 16 * 6, 256 * 2
    mtx, dist = _scaled_cam(w, h)
    plan = pr.build_remap_plan(mtx, dist, (w, h), bucket_spans=((3.0, 3.0),), cache=False)
    assert plan.bucket_used[-1], "test setup: expected wild tiles"

    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            128 + 100 * np.sin(xx / 11.0),
            128 + 90 * np.cos(yy / 7.0),
            128 + 80 * np.sin((xx + yy) / 19.0),
        ],
        -1,
    ).clip(0, 255).astype(np.uint8)
    ref, ref_gray = _reference_chain(img, mtx, dist, w, h)

    pre = PallasPreprocessor(mtx, dist, (w, h), interpret=True, plan=plan)
    out, gray = pre(jnp.asarray(img.transpose(2, 0, 1)[None]))
    out = np.asarray(out)[0].transpose(1, 2, 0).astype(np.int32)
    gray = np.asarray(gray)[0].astype(np.int32)
    d = np.abs(out - ref.astype(np.int32))
    dg = np.abs(gray - ref_gray.astype(np.int32))
    assert (d > 2).mean() < 0.02, ((d > 2).mean(), d.max())
    assert (dg > 2).mean() < 0.01, ((dg > 2).mean(), dg.max())


def test_multi_frame_steps_bit_identical():
    """frames_per_step=2/4 (per-step overhead amortization) must produce
    byte-identical output to the single-frame grid, and non-dividing
    batches must fall back to F=1."""
    h, w = 16 * 8, 256 * 2
    mtx, dist = _scaled_cam(w, h)
    fr = np.random.default_rng(3).integers(0, 255, (4, 3, h, w), dtype=np.uint8)
    base = PallasPreprocessor(mtx, dist, (w, h), interpret=True, want_rgb=False)
    _, g1 = base(jnp.asarray(fr))
    for f in (2, 4):
        pre = PallasPreprocessor(mtx, dist, (w, h), interpret=True, want_rgb=False, frames_per_step=f)
        _, gf = pre(jnp.asarray(fr))
        assert (np.asarray(gf) == np.asarray(g1)).all(), f
    pre2 = PallasPreprocessor(mtx, dist, (w, h), interpret=True, want_rgb=False, frames_per_step=2)
    _, g3 = pre2(jnp.asarray(fr[:3]))
    assert (np.asarray(g3) == np.asarray(g1[:3])).all()


def test_selected_tile_kernel_bit_identical():
    """Selected-tile mode (two-pass second pass): every selected tile must be
    BIT-identical to the full kernel's output — same plan, same arithmetic,
    only the grid changes (pallas_remap._fused_preproc_selected)."""
    h, w = 720, 1280
    mtx, dist = _scaled_cam(w, h)
    pre = PallasPreprocessor(mtx, dist, (w, h), interpret=True, want_rgb=False)
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.integers(0, 255, (2, 3, h, w), dtype=np.uint8))
    _, gray_full = pre(frames)
    gray_full = np.asarray(gray_full)
    th, tw = pre.plan.th, pre.plan.tw
    nty, ntx = h // th, w // tw
    # Random selections incl. a duplicate entry (dedup is the caller's
    # problem; duplicates must still produce identical content) and -1
    # padding entries (skipped: no DMA, no compute, garbage-row output).
    sel = np.stack([rng.permutation(nty * ntx)[:9] for _ in range(2)]).astype(np.int32)
    sel = np.concatenate([sel, sel[:, :1], np.full((2, 3), -1, np.int32)], axis=1)
    gray_sel = np.asarray(pre.selected(frames, jnp.asarray(sel)))
    for b in range(2):
        for t in np.unique(sel[b]):
            ty, tx = divmod(int(t), ntx)
            got = gray_sel[b, ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw]
            want = gray_full[b, ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw]
            np.testing.assert_array_equal(got, want, err_msg=f"tile {t} frame {b}")


def test_pooled_camera_remap_matches_scaled_chain():
    """preproc.twopass.pooled_camera: remapping the pooled source with the
    scaled intrinsics must agree with cv2's remap of the pooled image under
    the SAME scaled model (exactness of the affine substitution — the
    approximation vs pool-of-full-remap is gated by the recall tests)."""
    from apse_uav_tpu.preproc import twopass
    from apse_uav_tpu.preproc.remap import Preprocessor

    h, w = 736, 1280
    st = 4
    mtx, dist = _scaled_cam(w, h)
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    frames = jnp.asarray(np.transpose(img, (2, 0, 1))[None])
    wp, hp = twopass.pooled_frame_size(w, h, st)
    mtx_p = twopass.pooled_camera(mtx, st)
    pooled = np.asarray(twopass.pool_source_u8(frames, st, (hp, wp)))[0]
    pooled_hwc = np.transpose(pooled, (1, 2, 0))
    _, ours = Preprocessor(mtx_p, dist, (wp, hp))(jnp.asarray(pooled_hwc))
    _, ref = _reference_chain(pooled_hwc, mtx_p, np.asarray(dist), wp, hp)
    d = np.abs(np.asarray(ours).astype(int) - ref.astype(int))
    # Interior agreement within 1 gray level for >=99% of pixels (cv2's
    # fixed-point LAB tables vs our float math).
    inner = d[4 : h // st - 4, 4 : w // st - 4]
    assert np.mean(inner <= 1) > 0.99, np.mean(inner <= 1)


def test_select_tiles_covers_patches():
    """patch_select: selected tiles exactly cover each covered candidate's
    _extract_patch read; brute-force check of the budget/priority rules."""
    import jax

    from apse_uav_tpu.aruco.patch_select import select_tiles

    h, w, th, tw = 2160, 3840, 40, 256
    groups = ((0, 6, 128), (6, 10, 256))
    k, per_k = 10, 5
    rng = np.random.default_rng(5)
    centers = jnp.asarray(rng.uniform(0, [h, w], (k, 2)).astype(np.float32))
    valid = jnp.asarray(np.array([1, 1, 0, 1, 1, 1, 1, 1, 1, 0], bool))
    for t_sel in (16, 64, 512):
        sel, covered = jax.jit(
            lambda c, v: select_tiles(c, v, h=h, w=w, th=th, tw=tw, groups=groups,
                                      t_sel=t_sel, per_scale_k=per_k)
        )(centers, valid)
        sel, covered = np.asarray(sel), np.asarray(covered)
        ntx = w // tw
        sel_set = set(sel.tolist())
        psz = np.where(np.arange(k) < 6, 128, 256)
        for c in range(k):
            if not covered[c]:
                continue
            cy, cx = np.round(np.asarray(centers[c]))
            oy = int(np.clip(cy - psz[c] // 2, 0, h - psz[c]))
            ox = int(np.clip(cx - psz[c] // 2, 0, w - psz[c]))
            need = {
                int(ty * ntx + tx)
                for ty in range(oy // th, (oy + psz[c] - 1) // th + 1)
                for tx in range(ox // tw, (ox + psz[c] - 1) // tw + 1)
            }
            assert need <= sel_set, (c, need - sel_set)
        assert not covered[2] and not covered[9]  # invalid candidates
        if t_sel == 512:
            assert covered.sum() == valid.sum()  # big budget covers all valid


def test_pool_packed_to_packed_matches_planar():
    """twopass.pool_packed_to_packed (byte-sums + re-pack on the packed
    layout) must equal the planar route — pool_source_u8 then the pooled
    plan's pack — bit-exactly."""
    from apse_uav_tpu.preproc import twopass
    from apse_uav_tpu.preproc.pallas_remap import PallasPreprocessor

    h, w = 720, 1280
    st = 4
    mtx, dist = _scaled_cam(w, h)
    pre = PallasPreprocessor(mtx, dist, (w, h), interpret=True, want_rgb=False)
    wp, hp = twopass.pooled_frame_size(w, h, st)
    mtx_p = twopass.pooled_camera(np.asarray(mtx, np.float64), st)
    pre_pooled = PallasPreprocessor(
        mtx_p, np.asarray(dist, np.float64).reshape(-1), (wp, hp),
        interpret=True, want_rgb=False, valid_wh=(w // st, h // st),
    )
    rng = np.random.default_rng(6)
    frames = jnp.asarray(rng.integers(0, 255, (2, 3, h, w), dtype=np.uint8))
    planar = twopass.pool_source_u8(frames, st, (hp, wp))
    a = np.asarray(pre_pooled.pack(planar))
    b = np.asarray(
        twopass.pool_packed_to_packed(pre.pack(frames), pre.dims, h, w, pre_pooled.dims)
    )
    np.testing.assert_array_equal(a, b)


def test_pack_view_form_bit_identical():
    """pack() on the zero-cost host byte view ((B,3,H,W//4) i32,
    frames.view(np.int32)) must equal the arithmetic u8 pack bit-for-bit —
    the view branch only pads (pallas_remap._pack_frames)."""
    h, w = 720, 1280
    mtx, dist = _scaled_cam(w, h)
    pre = PallasPreprocessor(mtx, dist, (w, h), interpret=True, want_rgb=False)
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 255, (2, 3, h, w), dtype=np.uint8)
    a = np.asarray(pre.pack(jnp.asarray(frames)))
    b = np.asarray(pre.pack(jnp.asarray(frames.view(np.int32))))
    np.testing.assert_array_equal(a, b)


def test_host_pack_bit_identical_and_identity():
    """host_pack (frames memcpy'd into the zeroed padded host buffer,
    viewed as the 5-D i32 source) must equal the arithmetic u8 pack
    bit-for-bit, and pack() on it must be the identity (no device work)."""
    h, w = 720, 1280
    mtx, dist = _scaled_cam(w, h)
    pre = PallasPreprocessor(mtx, dist, (w, h), interpret=True, want_rgb=False)
    rng = np.random.default_rng(12)
    frames = rng.integers(0, 255, (2, 3, h, w), dtype=np.uint8)
    hp = pre.host_pack(frames)
    np.testing.assert_array_equal(np.asarray(pre.pack(jnp.asarray(frames))), hp)
    dev = jnp.asarray(hp)
    assert pre.pack(dev) is dev
    # And the full front consumes it: gray equals the planar-input gray.
    _, g_u8 = pre(jnp.asarray(frames))
    _, g_5d = pre(dev)
    np.testing.assert_array_equal(np.asarray(g_u8), np.asarray(g_5d))
