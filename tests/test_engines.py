"""Engine-layer integration: TrackPredictor + RcnnTracker on a tiny model."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apse_uav_tpu.dcnn.config import TrackerConfig, mask_rcnn_r50_fpn
from apse_uav_tpu.dcnn.engines import RcnnTracker, SelectivePredictor, TrackPredictor, resize_target
from apse_uav_tpu.dcnn.models.association import AssociationHead
from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN

import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    cfg = mask_rcnn_r50_fpn(num_classes=2)
    cfg = dataclasses.replace(
        cfg,
        rpn=dataclasses.replace(
            cfg.rpn, pre_nms_topk_test=32, post_nms_topk_test=16, batch_size_per_image=16
        ),
        roi=dataclasses.replace(
            cfg.roi, num_classes=2, detections_per_image=4, score_thresh_test=0.0
        ),
        input=dataclasses.replace(cfg.input, min_size_test=64, max_size_test=128),
    )
    model = MaskRCNN(cfg=cfg)
    params = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 64, 64, 3)), mode="inference")["params"]
    )(jax.random.PRNGKey(0))
    tcfg = TrackerConfig(max_tracks=8, max_detections=4, embedding_dim=8, roi_size=4)
    head = AssociationHead(embedding_dim=tcfg.embedding_dim)
    assoc = head.init(
        jax.random.PRNGKey(1), jnp.zeros((1, cfg.fpn_channels, tcfg.roi_size, tcfg.roi_size))
    )["params"]
    return cfg, tcfg, params, assoc


def test_resize_target_semantics():
    # 4K with d2 defaults: shortest 800 capped by max 1333.
    (ph, pw), (nh, nw) = resize_target((2160, 3840), 800, 1333, 32)
    assert (nh, nw) == (750, 1333)
    assert ph % 32 == 0 and pw % 32 == 0 and ph >= nh and pw >= nw


def test_track_predictor_returns_original_coords(setup):
    cfg, _, params, _ = setup
    pred = TrackPredictor(cfg, params, orig_hw=(100, 160))
    frames = np.random.default_rng(0).integers(0, 255, (2, 100, 160, 3), np.uint8)
    dets, feats = pred(frames)
    assert dets["boxes"].shape[0] == 2
    b = np.asarray(dets["boxes"])
    assert np.isfinite(b).all()
    assert (b[..., [0, 2]] <= 160.5).all() and (b[..., [1, 3]] <= 100.5).all()
    assert "p2" in feats


def test_rcnn_tracker_engine_runs(setup):
    cfg, tcfg, params, assoc = setup
    tracker = RcnnTracker(cfg, tcfg, params, assoc, orig_hw=(100, 160))
    frames = np.random.default_rng(1).integers(0, 255, (3, 100, 160, 3), np.uint8)
    recents = tracker.process_frames(frames)
    assert recents["valid"].shape == (3, tcfg.max_tracks)
    assert tracker.frame_count == 3
    one = tracker.next_frame(frames[0])
    assert one["valid"].shape == (tcfg.max_tracks,)
    tracker.reset()
    assert tracker.frame_count == 0
    assert not np.asarray(tracker.state["active"]).any()


def test_pipelined_dispatch_matches_sequential(setup):
    """Async dispatch of batch N+1 before materializing batch N (the CLI's
    one-deep software pipeline) must be bit-identical to sequential
    process_frames calls: the track-state carry threads through dispatches
    on device, independent of when the host reads the snapshots."""
    cfg, tcfg, params, assoc = setup
    frames = np.random.default_rng(3).integers(0, 255, (4, 100, 160, 3), np.uint8)

    seq = RcnnTracker(cfg, tcfg, params, assoc, orig_hw=(100, 160))
    want = [seq.process_frames(frames[:2]), seq.process_frames(frames[2:])]

    pip = RcnnTracker(cfg, tcfg, params, assoc, orig_hw=(100, 160))
    p1 = pip.process_frames_async(frames[:2])
    p2 = pip.process_frames_async(frames[2:])  # dispatched before reading p1
    got = [pip.materialize(p1), pip.materialize(p2)]

    for w, g in zip(want, got):
        for k in w:
            np.testing.assert_array_equal(w[k], g[k], err_msg=k)


def test_selective_predictor_times_stages(setup):
    cfg, _, params, _ = setup
    sel = SelectivePredictor(cfg, params, orig_hw=(100, 160))
    frames = np.random.default_rng(2).integers(0, 255, (1, 100, 160, 3), np.uint8)
    dets = sel(frames)
    assert "backbone" in sel.timings and "selective_scan" in sel.timings
    assert np.isfinite(np.asarray(dets["boxes"])).all()


def test_linear_resize_matrix_matches_jax_image_resize():
    """The analytic 1-D operator equals jax.image.resize(method='linear')
    (antialiased triangle kernel), and the separable bf16 matmul resize
    tracks the reference op to ~1 u8 LSB."""
    import jax
    import jax.numpy as jnp
    from apse_uav_tpu.dcnn.engines import linear_resize_matrix, resize_frames_matmul

    rng = np.random.default_rng(7)
    for n_in, n_out in [(45, 16), (64, 64), (30, 83), (2160, 768)]:
        m = linear_resize_matrix(n_in, n_out)
        x = rng.standard_normal((3, n_in)).astype(np.float32)
        want = jax.image.resize(jnp.asarray(x), (3, n_out), method="linear")
        np.testing.assert_allclose(x @ m, np.asarray(want), rtol=0, atol=1e-4)

    frames = rng.integers(0, 256, (2, 45, 64, 3), np.uint8)
    a_h = jnp.asarray(linear_resize_matrix(45, 16))
    a_w = jnp.asarray(linear_resize_matrix(64, 83))
    got = np.asarray(resize_frames_matmul(jnp.asarray(frames), a_h, a_w))
    want = np.asarray(
        jax.image.resize(jnp.asarray(frames).astype(jnp.float32), (2, 16, 83, 3), method="linear")
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1.6)
