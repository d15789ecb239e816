"""Tracker behavior tests: stable ids, new tracks, deletion, scan-ability."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apse_uav_tpu.dcnn.config import TrackerConfig
from apse_uav_tpu.dcnn.models.association import AssociationHead
from apse_uav_tpu.dcnn.structures import init_track_state
from apse_uav_tpu.dcnn.tracker import tracker_step

import pytest

pytestmark = pytest.mark.slow

H, W = 128, 160
C = 8
D = 6  # detection capacity
CFG = TrackerConfig(max_tracks=16, max_detections=D, embedding_dim=16, roi_size=4)


@pytest.fixture(scope="module")
def assoc_params():
    head = AssociationHead(embedding_dim=CFG.embedding_dim)
    rois = jnp.zeros((1, C, CFG.roi_size, CFG.roi_size))
    return head.init(jax.random.PRNGKey(0), rois)["params"]


def _det(boxes, classes=None):
    """Build a fixed-capacity detection dict from a list of boxes."""
    n = len(boxes)
    out = {
        "boxes": np.zeros((D, 4), np.float32),
        "scores": np.zeros(D, np.float32),
        "classes": np.zeros(D, np.int32),
        "masks": np.zeros((D, 28, 28), np.float32),
        "valid": np.zeros(D, bool),
    }
    for i, b in enumerate(boxes):
        out["boxes"][i] = b
        out["scores"][i] = 0.9
        out["classes"][i] = 0 if classes is None else classes[i]
        out["masks"][i] = 1.0  # full-box mask
        out["valid"][i] = True
    return {k: jnp.asarray(v) for k, v in out.items()}


def _feats(rng):
    return jnp.asarray(rng.normal(size=(H // 4, W // 4, C)), jnp.float32)


def _step(state, det, feats, assoc_params, cfg=CFG):
    return tracker_step(state, det, feats, assoc_params, cfg, (H, W))


def test_new_tracks_get_monotonic_ids(assoc_params):
    rng = np.random.default_rng(0)
    state = init_track_state(CFG.max_tracks, CFG.embedding_dim)
    det = _det([[10, 10, 40, 40], [80, 20, 120, 60]])
    state, recent = _step(state, det, _feats(rng), assoc_params)
    ids = np.asarray(recent["ids"])[np.asarray(recent["valid"])]
    assert sorted(ids.tolist()) == [1, 2]


def test_track_id_stability_across_frames(assoc_params):
    rng = np.random.default_rng(1)
    feats = _feats(rng)  # same features both frames -> same embeddings
    state = init_track_state(CFG.max_tracks, CFG.embedding_dim)
    det1 = _det([[10, 10, 40, 40], [80, 20, 120, 60]])
    state, r1 = _step(state, det1, feats, assoc_params)
    # Slightly moved boxes, same appearance.
    det2 = _det([[12, 11, 42, 41], [82, 21, 122, 61]])
    state, r2 = _step(state, det2, feats, assoc_params)
    v1, v2 = np.asarray(r1["valid"]), np.asarray(r2["valid"])
    assert v2.sum() == 2
    # ids preserved (embeddings nearly identical -> matched, not new)
    assert set(np.asarray(r2["ids"])[v2]) == set(np.asarray(r1["ids"])[v1])
    assert int(np.asarray(state["next_id"])) == 3  # no extra ids allocated


def test_unmatched_detection_becomes_new_track(assoc_params):
    rng = np.random.default_rng(2)
    feats = _feats(rng)
    state = init_track_state(CFG.max_tracks, CFG.embedding_dim)
    state, _ = _step(state, _det([[10, 10, 40, 40]]), feats, assoc_params)
    state, r2 = _step(state, _det([[10, 10, 40, 40], [100, 80, 140, 110]]), feats, assoc_params)
    assert np.asarray(r2["valid"]).sum() == 2
    assert int(np.asarray(state["next_id"])) == 3


def test_track_deleted_after_threshold(assoc_params):
    rng = np.random.default_rng(3)
    feats = _feats(rng)
    cfg = dataclasses.replace(CFG, delete_after_undetected=2)
    state = init_track_state(cfg.max_tracks, cfg.embedding_dim)
    state, _ = _step(state, _det([[10, 10, 40, 40]]), feats, assoc_params, cfg)
    empty = _det([])
    for _ in range(4):
        state, recent = _step(state, empty, feats, assoc_params, cfg)
    assert not np.asarray(state["active"]).any()
    # A reappearing object gets a fresh id.
    state, r = _step(state, _det([[10, 10, 40, 40]]), feats, assoc_params, cfg)
    assert np.asarray(r["ids"])[np.asarray(r["valid"])].tolist() == [2]


def test_tracker_scans(assoc_params):
    rng = np.random.default_rng(4)
    feats = _feats(rng)
    n_frames = 5
    boxes = np.zeros((n_frames, D, 4), np.float32)
    valid = np.zeros((n_frames, D), bool)
    for t in range(n_frames):
        boxes[t, 0] = [10 + 2 * t, 10, 40 + 2 * t, 40]
        valid[t, 0] = True
    dets = {
        "boxes": jnp.asarray(boxes),
        "scores": jnp.full((n_frames, D), 0.9),
        "classes": jnp.zeros((n_frames, D), jnp.int32),
        "masks": jnp.ones((n_frames, D, 28, 28), jnp.float32),
        "valid": jnp.asarray(valid),
    }
    state = init_track_state(CFG.max_tracks, CFG.embedding_dim)

    @jax.jit
    def run(state, dets):
        def step(s, d):
            return tracker_step(s, d, feats, assoc_params, CFG, (H, W))
        return jax.lax.scan(step, state, dets)

    state, recents = run(state, dets)
    v = np.asarray(recents["valid"])
    ids = np.asarray(recents["ids"])
    assert v.sum() == n_frames  # one object per frame
    assert set(ids[v]) == {1}  # the same track throughout


def test_center_dist_metric(assoc_params):
    rng = np.random.default_rng(5)
    feats = _feats(rng)
    cfg = dataclasses.replace(CFG, association_metric="bbox_center_dist", center_dist_threshold=100.0)
    state = init_track_state(cfg.max_tracks, cfg.embedding_dim)
    state, _ = _step(state, _det([[10, 10, 40, 40]]), feats, assoc_params, cfg)
    state, r = _step(state, _det([[13, 12, 43, 42]]), feats, assoc_params, cfg)
    assert np.asarray(r["ids"])[np.asarray(r["valid"])].tolist() == [1]
    # Far detection -> new id.
    state, r = _step(state, _det([[100, 90, 130, 120]]), feats, assoc_params, cfg)
    assert np.asarray(r["ids"])[np.asarray(r["valid"])].tolist() == [2]


def test_mask_iou_metric(assoc_params):
    rng = np.random.default_rng(6)
    feats = _feats(rng)
    cfg = dataclasses.replace(CFG, association_metric="mask_iou", mask_iou_threshold=0.7)
    state = init_track_state(cfg.max_tracks, cfg.embedding_dim)
    state, _ = _step(state, _det([[10, 10, 50, 50]]), feats, assoc_params, cfg)
    # Same shape translated: centroid-aligned IoU = 1 -> associated.
    state, r = _step(state, _det([[20, 18, 60, 58]]), feats, assoc_params, cfg)
    assert np.asarray(r["ids"])[np.asarray(r["valid"])].tolist() == [1]


def test_patch_roi_matches_gather_roi_align():
    """The patch/interp-matmul ROI extraction inside detection_embeddings is
    numerically the gather-based roi_align with a mask-modulation plane
    (rcnn_tracker.py:156-189 semantics) for boxes inside the patch span."""
    from apse_uav_tpu.dcnn.ops.roi_align import roi_align_hwc
    from apse_uav_tpu.dcnn.tracker import detection_embeddings, paste_mask_lowres

    rng = np.random.default_rng(7)
    h4, w4, c = 40, 52, 12
    image_hw = (h4 * 4, w4 * 4)
    feats = jnp.asarray(rng.normal(size=(h4, w4, c)), jnp.float32)
    boxes = jnp.asarray(
        [[8, 12, 70, 90], [0, 0, 30, 26], [150, 100, 200, 150], [40, 40, 44, 43]],
        jnp.float32,
    )
    masks = jnp.asarray(rng.uniform(size=(4, 28, 28)), jnp.float32)
    det = {
        "boxes": boxes,
        "masks": masks,
        "scores": jnp.ones(4),
        "classes": jnp.zeros(4, jnp.int32),
        "valid": jnp.ones(4, bool),
    }

    # Identity association head: expose the raw pooled ROI values.
    roi_size = 5
    n_flat = c * roi_size * roi_size
    assoc_params = {"fc": {"kernel": jnp.eye(n_flat), "bias": jnp.zeros(n_flat)}}
    emb = detection_embeddings(
        assoc_params, feats, det, image_hw, roi_size=roi_size,
        embedding_dim=n_flat, sampling_ratio=4, patch=32,
    )
    # AssociationHead L2-normalizes; undo per-row to recover pooled ROIs.
    spatial_scale = w4 / image_hw[1]
    want = []
    for i in range(4):
        plane = paste_mask_lowres(masks[i], boxes[i], (h4, w4), image_hw)
        want.append(
            roi_align_hwc(feats, boxes[i][None], roi_size, spatial_scale, 4, False, plane=plane)[0]
        )
    want = jnp.stack(want).reshape(4, -1)
    want = want / jnp.maximum(jnp.linalg.norm(want, axis=-1, keepdims=True), 1e-12)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(want), atol=2e-5)
