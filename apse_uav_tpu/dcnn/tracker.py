"""RcnnTracker: detect -> embed -> Hungarian-associate -> update, on device.

TPU-native re-design of the reference tracking engine
(dcnn/engines/rcnn_tracker.py): the per-frame update is a pure function over
the fixed-capacity track state (structures.py), so whole sequences can run
as ``lax.scan`` with the detector batched up front.

Association metrics (rcnn_tracker.py:79-147):

* ``embeddings`` (default): mask-cropped p2 features -> roi_align(10x10,
  sampling_ratio=4) -> AssociationHead -> squared-L2 distance matrix ->
  Hungarian -> threshold gate (0.6); unmatched detections become new tracks.
* ``bbox_center_dist``: nearest active track with squared center distance
  below threshold (the reference associates to *every* track under the
  threshold in storage order, which keeps only the last; nearest is the
  deterministic equivalent).
* ``mask_iou``: argmax centroid-aligned mask IoU >= 0.7, computed on a
  common low-resolution pasted grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from apse_uav_tpu.dcnn.config import TrackerConfig
from apse_uav_tpu.dcnn import hungarian as hungarian_mod
from apse_uav_tpu.dcnn.hungarian import linear_sum_assignment, pad_cost
from apse_uav_tpu.dcnn.models.association import AssociationHead
from apse_uav_tpu.dcnn.ops.roi_align import roi_align_hwc
from apse_uav_tpu.dcnn import structures

Array = jax.Array

# Gating pad for argmin masks.  Deliberately distinct from the Hungarian
# solver's pad (hungarian_mod._BIG = 1e4): the solver needs a pad small
# enough that f32 ULP stays below sub-unit cost differences on augmenting
# paths, while the argmin mask just needs "farther than anything real".
_FAR_SQ = 1e7


def paste_mask_lowres(mask_rr: Array, box: Array, grid_hw: tuple[int, int], image_hw: tuple[int, int]) -> Array:
    """Paste one (R, R) box-space mask onto a (gh, gw) full-image grid."""
    gh, gw = grid_hw
    r = mask_rr.shape[0]
    sy = image_hw[0] / gh
    sx = image_hw[1] / gw
    x1, y1, x2, y2 = box
    xs = ((jnp.arange(gw) + 0.5) * sx - x1) / jnp.maximum(x2 - x1, 1e-4) * r - 0.5
    ys = ((jnp.arange(gh) + 0.5) * sy - y1) / jnp.maximum(y2 - y1, 1e-4) * r - 0.5
    xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, r - 1)
    yi = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, r - 1)
    inside = ((xs > -1) & (xs < r))[None, :] & ((ys > -1) & (ys < r))[:, None]
    return jnp.where(inside, mask_rr[yi][:, xi], 0.0)


def _mask_plane_patch(
    mask_rr: Array, box: Array, anchor_yx: tuple[Array, Array],
    patch_hw: tuple[int, int], image_hw: tuple[int, int], feat_hw: tuple[int, int],
) -> Array:
    """Paste one (R, R) box-space mask onto a feature-resolution PATCH.

    Same arithmetic as :func:`paste_mask_lowres` for the (gh, gw) =
    ``feat_hw`` full grid, restricted to the ``patch_hw`` window at
    ``anchor_yx`` — the patch rows/cols are the global texels
    anchor + arange(P)."""
    ph, pw = patch_hw
    sy = image_hw[0] / feat_hw[0]
    sx = image_hw[1] / feat_hw[1]
    x1, y1, x2, y2 = box
    r = mask_rr.shape[0]
    gx = anchor_yx[1] + jnp.arange(pw)
    gy = anchor_yx[0] + jnp.arange(ph)
    xs = ((gx + 0.5) * sx - x1) / jnp.maximum(x2 - x1, 1e-4) * r - 0.5
    ys = ((gy + 0.5) * sy - y1) / jnp.maximum(y2 - y1, 1e-4) * r - 0.5
    xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, r - 1)
    yi = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, r - 1)
    inside = ((xs > -1) & (xs < r))[None, :] & ((ys > -1) & (ys < r))[:, None]
    return jnp.where(inside, mask_rr[yi][:, xi], 0.0)


def detection_embeddings(
    assoc_params,
    feats_p2: Array,
    det: dict[str, Array],
    image_hw: tuple[int, int],
    roi_size: int = 10,
    crop_features: bool = True,
    embedding_dim: int = 128,
    sampling_ratio: int = 4,
    patch: int = 48,
) -> Array:
    """Re-ID embeddings for one frame's detections (get_features_rois +
    AssociationHead; rcnn_tracker.py:122-125,156-189).

    feats_p2: (H4, W4, C) p2 feature map of this image.

    TPU formulation: per-sample bilinear gathers from the HBM-resident
    feature map (plus SCALAR gathers for the mask-modulation plane) dominate
    the old roi_align path — per PERF_NOTES.md, extract one
    ``dynamic_slice`` patch per detection and express the whole
    mask-crop + ROIAlign as hat-function interpolation MATMULS instead:

        out[s, t, c] = sum_pq Wy[s, p] * (plane * patch)[p, q, c] * Wx[t, q]

    which is numerically the same linear combination roi_align computes
    (bilinear weights are hat functions of the clipped sample coords; the
    plane modulation is texel-wise either way).  EXACT for boxes spanning
    <= patch-2 texels at feature resolution (~2,100 px at 4K with p2
    stride 4 and ``patch=48``); larger boxes clamp their sample grid to the
    patch window, shrinking the effective ROI — far beyond the UAV vehicle
    regime this tracker targets.
    """
    h4, w4, c = feats_p2.shape
    spatial_scale = w4 / image_hw[1]
    s = max(int(sampling_ratio), 1)
    n = roi_size * s
    py = min(patch, h4)
    px = min(patch, w4)

    def one(box, mask_rr):
        x1 = box[0] * spatial_scale
        y1 = box[1] * spatial_scale
        x2 = box[2] * spatial_scale
        y2 = box[3] * spatial_scale
        rw = jnp.maximum(x2 - x1, 1.0)  # aligned=False legacy min size
        rh = jnp.maximum(y2 - y1, 1.0)
        grid = (jnp.arange(roi_size)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)
        ys = y1 + grid * (rh / roi_size)  # (n,)
        xs = x1 + grid * (rw / roi_size)
        oor_y = (ys < -1.0) | (ys > h4 * 1.0)  # torchvision border band
        oor_x = (xs < -1.0) | (xs > w4 * 1.0)
        ysc = jnp.clip(ys, 0.0, h4 - 1.0)
        xsc = jnp.clip(xs, 0.0, w4 - 1.0)
        ay = jnp.clip(jnp.floor(ysc[0]).astype(jnp.int32), 0, h4 - py)
        ax = jnp.clip(jnp.floor(xsc[0]).astype(jnp.int32), 0, w4 - px)
        yloc = jnp.clip(ysc - ay, 0.0, py - 1.0)
        xloc = jnp.clip(xsc - ax, 0.0, px - 1.0)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(yloc[:, None] - jnp.arange(py)[None, :]))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(xloc[:, None] - jnp.arange(px)[None, :]))
        wy = jnp.where(oor_y[:, None], 0.0, wy)  # (n, py)
        wx = jnp.where(oor_x[:, None], 0.0, wx)  # (n, px)
        pt = jax.lax.dynamic_slice(feats_p2, (ay, ax, 0), (py, px, c))
        if crop_features:
            plane = _mask_plane_patch(mask_rr, box, (ay, ax), (py, px), image_hw, (h4, w4))
            pt = pt * plane[..., None]
        sampled = jnp.einsum(
            "sp,pqc->sqc", wy, pt, precision=jax.lax.Precision.HIGHEST
        )
        sampled = jnp.einsum(
            "sqc,tq->stc", sampled, wx, precision=jax.lax.Precision.HIGHEST
        )  # (n ys, n xs, C)
        vals = sampled.reshape(roi_size, s, roi_size, s, c).mean(axis=(1, 3))
        return jnp.transpose(vals, (2, 0, 1))  # (C, oh, ow)

    rois = jax.vmap(one)(det["boxes"], det["masks"])  # (D, C, R, R)
    head = AssociationHead(embedding_dim=embedding_dim)
    return head.apply({"params": assoc_params}, rois)


def _allocate_new_tracks(state, det, embeddings, is_new):
    """Assign unmatched detections to free slots with fresh monotonic ids."""
    free = ~state["active"]
    # k-th new detection (in index order) takes the k-th free slot.
    new_rank = jnp.cumsum(is_new) - 1  # rank among new detections
    free_slots = jnp.cumsum(free) - 1  # rank among free slots
    # slot_for_det[d] = index of the free slot with rank new_rank[d]
    cap = state["active"].shape[0]
    slot_of_rank = jnp.full(cap, cap, jnp.int32).at[
        jnp.where(free, free_slots, cap)
    ].set(jnp.arange(cap, dtype=jnp.int32), mode="drop")
    n_free = jnp.sum(free)
    can_place = is_new & (new_rank < n_free)
    slot_for_det = jnp.where(can_place, slot_of_rank[jnp.clip(new_rank, 0, cap - 1)], cap)

    def scatter(field, values):
        return field.at[slot_for_det].set(values, mode="drop")

    new_ids = state["next_id"] + new_rank.astype(jnp.int32)
    state = {
        **state,
        "active": scatter(state["active"], jnp.ones_like(can_place)),
        "ids": scatter(state["ids"], new_ids),
        "detected_this_frame": scatter(state["detected_this_frame"], jnp.ones_like(can_place)),
        "frames_since_detected": scatter(state["frames_since_detected"], jnp.zeros_like(new_ids)),
        "boxes": state["boxes"].at[slot_for_det].set(det["boxes"], mode="drop"),
        "scores": scatter(state["scores"], det["scores"]),
        "classes": scatter(state["classes"], det["classes"]),
        "masks": state["masks"].at[slot_for_det].set(det["masks"], mode="drop"),
        "embeddings": state["embeddings"].at[slot_for_det].set(embeddings, mode="drop"),
        "next_id": state["next_id"] + jnp.sum(can_place).astype(jnp.int32),
    }
    return state


def _apply_matches(state, det, embeddings, matched_track_for_det, is_matched):
    """Overwrite matched tracks with their detections (associate_detection)."""
    cap = state["active"].shape[0]
    idx = jnp.where(is_matched, matched_track_for_det, cap)

    def scatter(field, values):
        return field.at[idx].set(values, mode="drop")

    return {
        **state,
        "detected_this_frame": scatter(state["detected_this_frame"], jnp.ones_like(is_matched)),
        "frames_since_detected": scatter(state["frames_since_detected"], jnp.zeros(idx.shape, jnp.int32)),
        "boxes": state["boxes"].at[idx].set(det["boxes"], mode="drop"),
        "scores": scatter(state["scores"], det["scores"]),
        "classes": scatter(state["classes"], det["classes"]),
        "masks": state["masks"].at[idx].set(det["masks"], mode="drop"),
        "embeddings": state["embeddings"].at[idx].set(embeddings, mode="drop"),
    }


def associate_embeddings(
    state: dict[str, Array],
    det: dict[str, Array],
    embeddings: Array,
    threshold: float,
    exact: bool = False,
) -> dict[str, Array]:
    """Optimal-assignment association on squared-L2 embedding distances
    (rcnn_tracker.py:122-147).

    Default solver: threshold-gated auction matching (see
    hungarian.gated_auction_match) — dense Jacobi sweeps instead of the
    Jonker-Volgenant solve's O(n^2) sequential Dijkstra steps, which are
    pure loop latency on TPU.  ``exact=True`` switches to the exact
    pad-to-square JV solve + threshold gate (the reference's literal scipy
    shape; same matching except when global assignment optimality routes a
    track through an above-threshold pair).
    """
    cap = state["active"].shape[0]
    d_cap = embeddings.shape[0]
    diffs = state["embeddings"][:, None, :] - embeddings[None, :, :]
    dist = jnp.sum(diffs * diffs, axis=-1)  # (T, D)
    if exact:
        n = max(cap, d_cap)
        # Pad with the JV solver's finite pad value (NOT _FAR_SQ=1e7: f32
        # ULP there is 1.0, erasing sub-unit cost differences in augmenting
        # paths).
        cost = jnp.full((n, n), hungarian_mod._BIG, jnp.float32)
        cost = cost.at[:cap, :d_cap].set(
            pad_cost(dist, state["active"], det["valid"])
        )
        _, col = linear_sum_assignment(cost)  # col[track] = det
        det_for_track = col[:cap]
    else:
        det_for_track = hungarian_mod.gated_auction_match(
            dist, state["active"], det["valid"], threshold
        )
        det_for_track = jnp.where(det_for_track < 0, d_cap, det_for_track)
    track_match_ok = (
        state["active"]
        & (det_for_track < d_cap)
        & (jnp.take(det["valid"], jnp.clip(det_for_track, 0, d_cap - 1)))
    )
    pair_dist = jnp.take_along_axis(
        dist, jnp.clip(det_for_track, 0, d_cap - 1)[:, None], axis=1
    )[:, 0]
    track_match_ok &= pair_dist < threshold
    # Invert: matched track per detection.
    track_for_det = jnp.full(d_cap, cap, jnp.int32).at[
        jnp.where(track_match_ok, jnp.clip(det_for_track, 0, d_cap - 1), d_cap)
    ].set(jnp.arange(cap, dtype=jnp.int32), mode="drop")
    is_matched = det["valid"] & (track_for_det < cap)
    state = _apply_matches(state, det, embeddings, track_for_det, is_matched)
    is_new = det["valid"] & ~is_matched
    return _allocate_new_tracks(state, det, embeddings, is_new)


def associate_center_dist(state, det, embeddings, threshold_sq):
    """Nearest-active-track gating on squared bbox-center distance
    (rcnn_tracker.py:91-106)."""
    det_c = (det["boxes"][:, :2] + det["boxes"][:, 2:]) / 2.0
    trk_c = (state["boxes"][:, :2] + state["boxes"][:, 2:]) / 2.0
    d2 = jnp.sum((trk_c[:, None] - det_c[None]) ** 2, axis=-1)  # (T, D)
    d2 = jnp.where(state["active"][:, None], d2, _FAR_SQ)
    nearest = jnp.argmin(d2, axis=0)  # per detection
    ok = jnp.take_along_axis(d2, nearest[None], axis=0)[0] < threshold_sq
    is_matched = det["valid"] & ok
    track_for_det = jnp.where(is_matched, nearest.astype(jnp.int32), state["active"].shape[0])
    state = _apply_matches(state, det, embeddings, track_for_det, is_matched)
    return _allocate_new_tracks(state, det, embeddings, det["valid"] & ~is_matched)


def associate_mask_iou(state, det, embeddings, threshold, image_hw, grid: int = 64):
    """Centroid-aligned mask IoU association (rcnn_tracker.py:108-120,
    mask_utils.compute_masks_iou) on a common pasted low-res grid."""
    def low(m, b):
        return paste_mask_lowres(m, b, (grid, grid), image_hw) > 0.5

    det_m = jax.vmap(low)(det["masks"], det["boxes"])  # (D, g, g)
    trk_m = jax.vmap(low)(state["masks"], state["boxes"])  # (T, g, g)

    def centroid(m):
        tot = jnp.maximum(jnp.sum(m), 1)
        ys = jnp.sum(jnp.sum(m, axis=1) * jnp.arange(grid)) / tot
        xs = jnp.sum(jnp.sum(m, axis=0) * jnp.arange(grid)) / tot
        return jnp.stack([ys, xs])

    det_c = jax.vmap(centroid)(det_m)
    trk_c = jax.vmap(centroid)(trk_m)

    def pair_iou(dm, dc, tm, tc):
        # Translate the detection mask so centroids align, then IoU.
        shift = jnp.round(tc - dc).astype(jnp.int32)
        dm_t = jnp.roll(dm, (shift[0], shift[1]), axis=(0, 1))
        inter = jnp.sum(dm_t & tm)
        union = jnp.maximum(jnp.sum(dm_t | tm), 1)
        return inter / union

    iou = jax.vmap(
        lambda tm, tc: jax.vmap(lambda dm, dc: pair_iou(dm, dc, tm, tc))(det_m, det_c)
    )(trk_m, trk_c)  # (T, D)
    iou = jnp.where(state["active"][:, None], iou, -1.0)
    best = jnp.argmax(iou, axis=0)
    ok = jnp.take_along_axis(iou, best[None], axis=0)[0] >= threshold
    is_matched = det["valid"] & ok
    track_for_det = jnp.where(is_matched, best.astype(jnp.int32), state["active"].shape[0])
    state = _apply_matches(state, det, embeddings, track_for_det, is_matched)
    return _allocate_new_tracks(state, det, embeddings, det["valid"] & ~is_matched)


def prepare_frame(
    det: dict[str, Array],
    feats_p2: Array,
    assoc_params,
    cfg: TrackerConfig,
    image_hw: tuple[int, int],
) -> tuple[dict[str, Array], Array]:
    """The STATELESS per-frame half of a tracker step: top-k detection cap +
    re-ID embeddings.  Independent of the track state, so engines vmap it
    over whole frame batches instead of paying it sequentially inside the
    association scan (the round-4 layout cost 7.16 ms/frame there)."""
    d_cap = det["valid"].shape[0]
    if d_cap > cfg.max_detections:
        # Cap the association problem: the assignment solvers' sequential
        # sweeps are latency-bound device steps, so keep only the
        # top-scoring detections (far above any real per-frame count).
        k = cfg.max_detections
        _, top = jax.lax.top_k(jnp.where(det["valid"], det["scores"], -jnp.inf), k)
        det = {key: v[top] for key, v in det.items()}
    emb = detection_embeddings(
        assoc_params, feats_p2, det, image_hw, cfg.roi_size,
        embedding_dim=cfg.embedding_dim,
    )
    return det, emb


def tracker_step(
    state: dict[str, Array],
    det: dict[str, Array],
    feats_p2: Array,
    assoc_params,
    cfg: TrackerConfig,
    image_hw: tuple[int, int],
) -> tuple[dict[str, Array], dict[str, Array]]:
    """One frame: associate, prune, snapshot, age (RcnnTracker.next_frame).

    det: boxes (D, 4), scores (D,), classes (D,), masks (D, R, R), valid (D,).
    Returns (new_state, recent_objects).
    """
    det, emb = prepare_frame(det, feats_p2, assoc_params, cfg, image_hw)
    return tracker_step_assoc(state, det, emb, cfg, image_hw)


def tracker_step_assoc(
    state: dict[str, Array],
    det: dict[str, Array],
    emb: Array,
    cfg: TrackerConfig,
    image_hw: tuple[int, int],
) -> tuple[dict[str, Array], dict[str, Array]]:
    """The STATE-CARRYING half of a tracker step (see :func:`prepare_frame`):
    associate, prune, snapshot, age."""
    if cfg.association_metric == "embeddings":
        state = associate_embeddings(state, det, emb, cfg.embedding_dist_threshold)
    elif cfg.association_metric == "bbox_center_dist":
        state = associate_center_dist(state, det, emb, cfg.center_dist_threshold)
    elif cfg.association_metric == "mask_iou":
        state = associate_mask_iou(state, det, emb, cfg.mask_iou_threshold, image_hw)
    else:
        raise ValueError(cfg.association_metric)
    state = structures.delete_undetected(state, cfg.delete_after_undetected)
    recent = structures.recent_objects(state)
    state = structures.finish_association(state)
    return state, recent
