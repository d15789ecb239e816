"""End-to-end ArUco measurement pipeline: batched front + temporal scan.

Reproduces the reference main loop (aruco_detect.py:571-810) as a TPU-native
two-part program:

* **Stateless front** (wide, batched over frames): preprocessing
  (undistort + gamma + gray), marker detection, per-id slot extraction, and
  unit-length planar pose for all frames at once.
* **Temporal scan** (lax.scan, cheap per step): the reference's per-frame
  state machine — temporal false-positive gating (DIFF_MAX, :613,651,678,705),
  marker-size averaging (:290-304), altitude-dependent marker-length
  correction (:306-308, stateful across frames), LED panel decoding
  (:338-373), and inter-vehicle distance measurement (:728-781) — including
  its stale-value semantics (globals persisting across frames in the
  original are carry fields here).

Vehicle slots are fixed: index v in 0..3 corresponds to marker id v+1; the
host car is id 4 (slot 3).
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp
import numpy as np

from apse_uav_tpu.aruco import geometry as geo
from apse_uav_tpu.aruco.detector import ArucoDetector, DetectorParams
from apse_uav_tpu.aruco.pose import estimate_pose_single_markers_two
from apse_uav_tpu.core import rotation

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ArucoPipelineConfig:
    """User flags mirroring the reference constants (aruco_detect.py:13-87)."""

    n_avg: int = 1  # frames for marker-size averaging
    step_frame: int = 1
    use_centroid_data: bool = False
    source_lidar: bool = False
    leds_threshold: float | None = None
    # cv2-compat shift (px) of the projected LED sample points before the
    # int() truncation, matching the oracle's measured systematic corner
    # bias (~+0.45 px both axes; scripts/analyze_leds.py).  (0, 0) = off.
    led_bias_px: tuple[float, float] = (0.0, 0.0)
    use_pallas_preproc: bool = True
    # Frames remapped per Pallas grid step (amortizes the fixed per-step
    # overhead across the batch; falls back to 1 when the batch size is
    # not a multiple).  A/B on the v5e (round 3 session 4): f=1 4.06,
    # f=2 3.93, f=4 9.85 ms/frame (VMEM pressure kills f=4) -> default 2.
    preproc_frames_per_step: int = 2
    # Two-pass preprocessing (preproc.twopass): proposals score on a
    # pooled-source remap (1/16 the resample+LAB cost) and full-res gray is
    # recomputed EXACTLY only under the tiles covering valid candidates'
    # patches.  Semantics shift only in proposal scores (pooling commutes
    # with neither LAB nor the resample) and in the fixed tile budget;
    # candidate-level gray is bit-identical.  Applies to both backends so
    # the CPU oracle-parity harness gates the TPU path.
    two_pass: bool = True
    # Fixed tile budget for the full-res second pass (static shapes).  With
    # (40, 256) tiles at 4K a budget of 256 covers ~2 full priority tiers
    # of candidates (see aruco.patch_select); candidates beyond it are
    # deterministically invalidated.
    sel_tile_budget: int = 256
    # Source pooling backend for the two-pass front: the fused Pallas
    # kernel (preproc/pallas_pool.py, one read + one small write,
    # bit-identical) or the XLA op chain.  Pallas requires the Pallas
    # preprocessor's packed form.
    pallas_pool: bool = False
    # lax.scan unroll for the temporal state machine: the per-step body is
    # ~100 tiny 4-vehicle vector ops, pure dispatch latency on TPU;
    # unrolling lets XLA fuse across steps.  1 = rolled.
    scan_unroll: int = 1

    @property
    def diff_max(self) -> float:
        # aruco_detect.py:524 — max displacement at 20 m/s.
        return 2.0 / 3.0 * self.step_frame * 2.0


def init_carry(cfg: ArucoPipelineConfig) -> dict[str, Array]:
    """The temporal state (the reference's cross-frame globals)."""
    return {
        "detected_prev": jnp.zeros(4, jnp.int32),
        "cx_prev": jnp.zeros(4, jnp.float32),
        "cy_prev": jnp.zeros(4, jnp.float32),
        "msp_rings": jnp.zeros((4, cfg.n_avg), jnp.float32),
        "marker_length": jnp.float32(geo.MARKER_LENGTH_ORG),
        # Stale-able measurement values (the original keeps these as globals
        # and the CSV can emit them on frames where they weren't recomputed).
        "altitude_real": jnp.float32(0.0),
        "leds": jnp.int32(0),
        "msp_avg": jnp.ones(4, jnp.float32),
        "size_corr": jnp.ones(4, jnp.float32),
        "lidar_xy": jnp.zeros(2, jnp.float32),
        "dist_aruco": jnp.zeros(3, jnp.float32),
        "dist_aruco_bbox": jnp.zeros(3, jnp.float32),
        "dist_dcnn": jnp.zeros(3, jnp.float32),
        "dist_dcnn_bbox": jnp.zeros(3, jnp.float32),
    }


def _slot_by_id(ids: Array, corners: Array):
    """Fixed per-id slots: ids (K,), corners (K, 4, 2) -> (4,) bool, (4,4,2).

    When an id decodes on several candidates (a genuine marker plus an
    error-corrected false positive elsewhere — the reference notes FPs
    happen at errorCorrectionRate=2.0 and filters them with its temporal
    gate over ALL candidates, aruco_detect.py:197,604-723), take the
    largest quad: FP decodes come from small sub-pattern or clutter quads.
    """
    side = jnp.sum(
        jnp.linalg.norm(corners - jnp.roll(corners, 1, axis=1), axis=-1), axis=-1
    )

    def one(vid):
        mask = ids == vid
        present = jnp.any(mask)
        idx = jnp.argmax(jnp.where(mask, side, -1.0))
        return present, corners[idx]

    present, slot_corners = jax.vmap(one)(jnp.arange(1, 5))
    return present, slot_corners


def _led_value(gray: Array, rvec: Array, tvec: Array, size_corr: Array, altitude_real: Array, mtx, dist, threshold,
               bias_xy: tuple[float, float] = (0.0, 0.0)):
    """detectAndDrawLEDs (aruco_detect.py:338-373).

    ``bias_xy`` shifts the projected points before the int() truncation —
    the cv2-compat knob for the oracle's systematic corner bias (cv2's
    CORNER_REFINE_APRILTAG places corners ~+0.45 px of ground truth in both
    axes on rendered scenes while ours sit at truth to ~0.03 px, measured by
    scripts/analyze_leds.py; the common-mode shift cancels in every distance
    column but moves the 5x5 LED windows, which matters once the LED discs
    shrink to window size at 65 m)."""
    pts = geo.project_int(geo.LED_POINTS, rvec, tvec / size_corr, mtx, dist,
                          bias_xy=bias_xy)  # (8,2) x,y
    if threshold is None:
        thr = jnp.maximum(190.0 + jnp.trunc(altitude_real), 240.0)
    else:
        thr = jnp.float32(threshold)
    h, w = gray.shape

    def sample(xy):
        x = xy[0].astype(jnp.int32)
        y = xy[1].astype(jnp.int32)
        # Python slicing semantics: gray[y-2:y+3, x-2:x+3] is EMPTY when
        # y < 2 or x < 2 (negative start wraps past stop); rows/cols beyond
        # the image are clipped.  Sum over the window / 25 either way.
        dy = jnp.arange(5)
        ys = y - 2 + dy
        xs = x - 2 + dy
        vy = (ys >= 0) & (ys < h)
        vx = (xs >= 0) & (xs < w)
        ysc = jnp.clip(ys, 0, h - 1)
        xsc = jnp.clip(xs, 0, w - 1)
        vals = gray[ysc][:, xsc].astype(jnp.float32)
        vals = vals * vy[:, None] * vx[None, :]
        empty = (y < 2) | (x < 2)
        return jnp.where(empty, 0.0, jnp.sum(vals) / 25.0)

    vals = jax.vmap(sample)(pts)  # (8,)
    bits = (vals > thr).astype(jnp.int32)
    weights = 2 ** jnp.arange(7, -1, -1)
    return jnp.sum(bits * weights)


class ArucoPipeline:
    """Batched, jitted ArUco measurement pipeline.

    Usage:
        pipe = ArucoPipeline(mtx, dist, (3840, 2160), cfg)
        carry = init_carry(cfg)
        carry, out = pipe.process(frames_u8_planar, carry, first=True[, centroid_rows])
    """

    def __init__(self, mtx, dist, size_wh, cfg: ArucoPipelineConfig | None = None,
                 detector_params: DetectorParams | None = None, interpret: bool = False):
        self.cfg = cfg or ArucoPipelineConfig()
        self.mtx = jnp.asarray(mtx, jnp.float32)
        self.dist = jnp.asarray(np.asarray(dist).reshape(-1), jnp.float32)
        self.size_wh = tuple(size_wh)
        if detector_params is None:
            # Fused Pallas proposals ride with the Pallas preproc (TPU);
            # the XLA path stays for CPU/tests and explicit params.
            detector_params = DetectorParams(
                pallas_proposals=self.cfg.use_pallas_preproc,
                pallas_interpret=interpret,
            )
        self.detector = ArucoDetector(detector_params)
        if self.cfg.use_pallas_preproc:
            from apse_uav_tpu.preproc.pallas_remap import PallasPreprocessor

            # The detection pipeline consumes only gray — skip the RGB output.
            self.pre = PallasPreprocessor(
                np.asarray(mtx, np.float64), np.asarray(dist, np.float64), size_wh,
                interpret=interpret, want_rgb=False,
                frames_per_step=self.cfg.preproc_frames_per_step,
            )
        else:
            from apse_uav_tpu.preproc.remap import Preprocessor

            self.pre = Preprocessor(mtx, dist, size_wh)
        if self.cfg.two_pass:
            from apse_uav_tpu.preproc import twopass
            from apse_uav_tpu.preproc.pallas_remap import _pick_tiles

            st = self.detector.params.proposal_stride
            w, h = self.size_wh
            wp, hp = twopass.pooled_frame_size(w, h, st)
            self._pooled_hw = (hp, wp)
            mtx_p = twopass.pooled_camera(np.asarray(mtx, np.float64), st)
            # The coverage bookkeeping uses the Pallas tile grid on BOTH
            # backends so CPU (oracle parity) and TPU drop the same
            # candidates when the tile budget overflows.
            self._sel_th, self._sel_tw = _pick_tiles(w, h)
            if self.cfg.use_pallas_preproc:
                from apse_uav_tpu.preproc.pallas_remap import PallasPreprocessor

                self.pre_pooled = PallasPreprocessor(
                    mtx_p, np.asarray(dist, np.float64), (wp, hp),
                    interpret=interpret, want_rgb=False,
                    frames_per_step=self.cfg.preproc_frames_per_step,
                    valid_wh=(w // st, h // st),
                )
            else:
                from apse_uav_tpu.preproc.remap import Preprocessor

                self.pre_pooled = Preprocessor(mtx_p, dist, (wp, hp))

    # -- stateless front ----------------------------------------------------

    def _detect_two_pass(self, frames: Array):
        """Two-pass front: pooled-remap proposals, selected-tile full gray."""
        from apse_uav_tpu.aruco import patch_select
        from apse_uav_tpu.aruco.detector import _patch_groups, _proposals_from_pool
        from apse_uav_tpu.preproc import twopass

        p = self.detector.params
        w, h = self.size_wh
        st = p.proposal_stride
        packed = None
        if self.cfg.use_pallas_preproc:
            # Pack ONCE; the pooled-source front derives the pooled PACKED
            # array arithmetically (byte-sums + re-pack on the native
            # layout, no planar intermediate) and the selected-tile second
            # pass reuses the full-res pack.
            packed = self.pre.pack(frames)
            if self.cfg.pallas_pool:
                from apse_uav_tpu.preproc.pallas_pool import pool_packed_to_packed_pallas

                pooled_packed = pool_packed_to_packed_pallas(
                    packed, self.pre.dims, h, w, self.pre_pooled.dims,
                    interpret=self.detector.params.pallas_interpret,
                )
            else:
                pooled_packed = twopass.pool_packed_to_packed(
                    packed, self.pre.dims, h, w, self.pre_pooled.dims
                )
            _, pooled_gray = self.pre_pooled.from_packed(pooled_packed)
        else:
            pooled_src = twopass.pool_source_u8(frames, st, self._pooled_hw)
            _, pooled_gray = self.pre_pooled(jnp.transpose(pooled_src, (0, 2, 3, 1)))
        pool = pooled_gray[:, : h // st, : w // st].astype(jnp.float32)
        if p.pallas_proposals:
            from apse_uav_tpu.aruco import pallas_proposals as pprop

            props = pprop.proposals_batched_from_pool(pool, h, w, p, interpret=p.pallas_interpret)
        else:
            props = jax.vmap(lambda pi: _proposals_from_pool(pi, h, w, p))(pool)
        centers, sizes, scores, valid = props
        sel, covered = patch_select.select_tiles_batched(
            centers, valid, h=h, w=w, th=self._sel_th, tw=self._sel_tw,
            groups=tuple(_patch_groups(h, w, p)), t_sel=self.cfg.sel_tile_budget,
            per_scale_k=p.per_scale_k,
        )
        if self.cfg.use_pallas_preproc:
            gray = self.pre.selected_packed(packed, sel)
        else:
            _, gray = self.pre(jnp.transpose(frames, (0, 2, 3, 1)))
        corners, ids = jax.vmap(self.detector._candidates_one)(
            gray, centers, sizes, scores, valid, covered
        )
        return gray, corners, ids

    @functools.partial(jax.jit, static_argnums=(0,))
    def front(self, frames: Array):
        """frames -> per-frame slot data + gray.

        frames: planar (T, 3, H, W) u8, or — on the Pallas path — the
        zero-cost host byte view (T, 3, H, W//4) i32
        (``frames.view(np.int32)``), which skips the device-side
        arithmetic pack (~0.9 ms/frame at 4K), or the PRE-PADDED 5-D form
        from ``pre.host_pack`` ((T, 3, Hp/8, 8, Wp/4) i32), for which the
        device-side pack is the identity (a further ~0.46 ms/frame: the
        pad pass and the 4-D->5-D reshape relayout both disappear).
        """
        if frames.dtype == jnp.int32 and not self.cfg.use_pallas_preproc:
            raise ValueError("i32 view input requires use_pallas_preproc")
        if self.cfg.two_pass:
            gray, corners, ids = self._detect_two_pass(frames)
            return self._front_from_detections(gray, corners, ids)
        if self.cfg.use_pallas_preproc:
            _, gray = self.pre(frames)
        else:
            hwc = jnp.transpose(frames, (0, 2, 3, 1))
            _, gray = self.pre(hwc)
        corners, ids = self.detector.detect(gray)
        return self._front_from_detections(gray, corners, ids)

    def _front_from_detections(self, gray: Array, corners: Array, ids: Array):
        present, slot_corners = jax.vmap(_slot_by_id)(ids, corners)
        # Unit-length pose for every slot (invalid slots produce garbage that
        # is masked downstream).  Both planar-ambiguity basins are carried:
        # the bbox-distance column averages over them (see pose.py).
        rvecs, utvecs, rvecs2, utvecs2, perr, perr2, pswap = estimate_pose_single_markers_two(
            slot_corners, 1.0, self.mtx, self.dist
        )
        cx, cy, msp = jax.vmap(jax.vmap(geo.marker_center_and_size))(slot_corners)
        return {
            "present": present,
            "corners": slot_corners,
            "rvec": rvecs,
            "utvec": utvecs,
            "rvec2": rvecs2,
            "utvec2": utvecs2,
            "perr": perr,
            "perr2": perr2,
            "pswap": pswap,
            "cx": cx,
            "cy": cy,
            "msp": jnp.maximum(msp, 1e-6),
            "gray": gray,
        }

    # -- temporal scan -------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0,))
    def scan(self, carry: dict, front: dict, first_frame: Array, centroid_rows: Array):
        """Run the state machine over T frames.

        first_frame: (T,) bool — True only for the sequence's first frame
        (k == start_frame semantics).  centroid_rows: (T, 17) int32 DCNN CSV
        rows (zeros when unused).
        """
        cfg = self.cfg
        mtx, dist = self.mtx, self.dist

        def step(carry, xs):
            f, first, crow = xs
            present = f["present"]
            rvec = f["rvec"]
            tvec = f["utvec"] * carry["marker_length"]  # pose at L_prev
            rvec2 = f["rvec2"]
            tvec2 = f["utvec2"] * carry["marker_length"]
            cx, cy, msp = f["cx"], f["cy"], f["msp"]

            # --- temporal gate (all vehicles, using L_prev) -----------------
            diff = geo.displacement_metres(cx, cy, carry["cx_prev"], carry["cy_prev"], carry["marker_length"], msp)
            prev = carry["detected_prev"].astype(bool)
            measured = present & ((prev & (diff < cfg.diff_max)) | first)
            newly = present & ~prev
            detected = (measured | newly).astype(jnp.int32)
            cx_new = jnp.where(measured | newly, cx, carry["cx_prev"])
            cy_new = jnp.where(measured | newly, cy, carry["cy_prev"])

            host = measured[3]

            # --- host branch: altitude, marker length, size avg, LEDs -------
            altitude_raw = tvec[3, 2]
            # Fallback (aruco_detect.py:639-642): `[4] not in ids` is checked
            # AFTER the FP gate mutates a failed host id to -1, so it fires
            # whenever the host is not MEASURED (absent, newly acquired, or
            # gate-failed), and the altitude comes from the last marker still
            # in cv2's detection-order list — which can be the FP'd host
            # entry itself.  Order is cv2-internal; we approximate with the
            # highest present vehicle id, else the host's own pose.
            any_veh = jnp.any(present[:3])
            fb_idx = jnp.where(any_veh, 2 - jnp.argmax(jnp.flip(present[:3])), 3)
            alt_fb = tvec[fb_idx, 2]
            use_fb = ~host & (any_veh | present[3])
            altitude_eff = jnp.where(host, altitude_raw, jnp.where(use_fb, alt_fb, carry["altitude_real"] * geo.MARKER_DIV))
            update_len = host | use_fb
            marker_length = jnp.where(update_len, geo.marker_length_correction(altitude_eff), carry["marker_length"])
            altitude_real = jnp.where(update_len, altitude_eff / geo.MARKER_DIV, carry["altitude_real"])

            # Marker size averaging for every measured vehicle.
            def upd_ring(ring, m, meas):
                new_ring, corr, avg = geo.average_marker_size(ring, m)
                return (
                    jnp.where(meas, new_ring, ring),
                    jnp.where(meas, corr, jnp.float32(1.0)),
                    avg,
                )

            rings, size_corr, msp_avg_new = jax.vmap(upd_ring)(carry["msp_rings"], msp, measured)
            msp_avg = jnp.where(measured, msp_avg_new, carry["msp_avg"])
            size_corr = jnp.where(measured, size_corr, carry["size_corr"])

            leds = jnp.where(
                host,
                _led_value(f["gray"], rvec[3], tvec[3], size_corr[3], altitude_real, mtx, dist, cfg.leds_threshold,
                           bias_xy=cfg.led_bias_px),
                carry["leds"],
            )

            lidar_pt = geo.project_int(geo.VEH4_LIDAR, rvec[3], tvec[3] / size_corr[3], mtx, dist)[0]
            lidar_xy = jnp.where(host, lidar_pt, carry["lidar_xy"])

            # Perspective-modified bbox dims, fresh from constants each
            # frame (the reference re-initializes vehN_dim INSIDE the frame
            # loop, aruco_detect.py:583-586, then modifies once), under
            # both pose-ambiguity basins.
            def flatness(rv):
                return jnp.abs(rotation.rodrigues_to_matrix(rv)[2, 2])

            flat_a4 = jax.vmap(flatness)(rvec)
            flat_b4 = jax.vmap(flatness)(rvec2)
            a_is_flat4 = flat_a4 >= flat_b4
            veh_dims = jax.vmap(geo.bbox_dims_update)(tvec, rvec, geo.VEH_DIMS)
            veh_dims2 = jax.vmap(geo.bbox_dims_update)(tvec2, rvec2, geo.VEH_DIMS)

            # --- distance pass (aruco_detect.py:728-781) --------------------
            source_xy = jnp.where(
                cfg.source_lidar, lidar_xy, jnp.stack([cx_new[3], cy_new[3]])
            ).astype(jnp.float32)

            def veh_distance(v):
                d_aruco = geo.pixel_distance_to_metres(source_xy, jnp.stack([cx_new[v], cy_new[v]]), marker_length, msp_avg[3], msp_avg[v])
                # The bbox distance depends on the vehicle's rvec, whose
                # planar-ambiguity basin must match the oracle's.  Measured
                # against the EXECUTED reference (scripts/
                # analyze_pose_basins.py): cv2's per-frame pose is the
                # WORLD-FLAT basin — marker plane normal along the camera
                # axis, the physically true pose for roof-mounted markers
                # under a nadir UAV camera (normal jitter < 0.3 deg across
                # a 25 m scene) — with occasional tilted-basin flips only
                # where the basins' residuals tie within cv2's own corner
                # noise (~47 px markers; e.g. 40 m frames 9/61 show 20-24
                # deg tilt).  Neither our best-residual nor our
                # homography-init basin predicts it (17/30 resp. 18/27 at
                # 25 m: the labels flip under OUR corner noise while the
                # oracle stays flat).  The basins are mirror images about
                # the VIEW RAY, so angle-to-view-ray cannot separate them;
                # |R[2,2]| (angle to the camera axis) can.  Anchor on the
                # flatter basin, committing by residual separation: ties
                # stay ~50/50 (minimax, half the flip impact when the
                # oracle's own pick degenerates to a coin), decisive
                # separations converge to the oracle's flat pose.
                def one_basin(dims, rv, tv):
                    bbox_pts = geo.bbox_perimeter_points(dims)
                    point = geo.min_distance_bbox_point(source_xy, bbox_pts, rv, tv / size_corr[v], mtx, dist)
                    return geo.pixel_distance_to_metres(source_xy, point.astype(jnp.float32), marker_length, msp_avg[3], msp_avg[v])

                e1, e2 = f["perr"][v], f["perr2"][v]
                both_fin = jnp.isfinite(e1) & jnp.isfinite(e2)
                gap = jnp.where(both_fin, jnp.abs(e2 - e1), 0.0)
                d_a = one_basin(veh_dims[v], rvec[v], tvec[v])
                d_b = one_basin(veh_dims2[v], rvec2[v], tvec2[v])
                d_flat = jnp.where(a_is_flat4[v], d_a, d_b)
                d_tilt = jnp.where(a_is_flat4[v], d_b, d_a)
                # NOISE_FLOOR 0.05 px^2: the residual shift a ~0.08 px/corner
                # cross-implementation corner difference produces.
                w_flat = 0.5 + 0.5 * gap / (gap + 0.05)
                d_bbox = w_flat * d_flat + (1.0 - w_flat) * d_tilt
                return d_aruco, d_bbox, d_a, d_b, gap

            d_aruco_new, d_bbox_new, d_bbox_a, d_bbox_b, pose_gap = jax.vmap(veh_distance)(jnp.arange(3))
            do_dist = host & measured[:3]
            dist_aruco = jnp.where(do_dist, d_aruco_new, carry["dist_aruco"])
            dist_aruco_bbox = jnp.where(do_dist, d_bbox_new, carry["dist_aruco_bbox"])

            # --- DCNN comparison distances (useCentroidData) ----------------
            if cfg.use_centroid_data:
                crow_f = crow.astype(jnp.float32)
                cent = jnp.stack([crow_f[jnp.array([5, 9, 13])], crow_f[jnp.array([6, 10, 14])]], axis=1)
                bbox = jnp.stack([crow_f[jnp.array([7, 11, 15])], crow_f[jnp.array([8, 12, 16])]], axis=1)
                cent = jnp.maximum(cent, 0.0)
                bbox = jnp.maximum(bbox, 0.0)

                def dcnn_dist(v):
                    dc = geo.pixel_distance_to_metres(lidar_xy.astype(jnp.float32), cent[v], marker_length, msp_avg[3], msp_avg[v])
                    db = geo.pixel_distance_to_metres(lidar_xy.astype(jnp.float32), bbox[v], marker_length, msp_avg[3], msp_avg[v])
                    return dc, db

                dc_new, db_new = jax.vmap(dcnn_dist)(jnp.arange(3))
                dist_dcnn = jnp.where(do_dist, dc_new, carry["dist_dcnn"])
                dist_dcnn_bbox = jnp.where(do_dist, db_new, carry["dist_dcnn_bbox"])
            else:
                dist_dcnn = carry["dist_dcnn"]
                dist_dcnn_bbox = carry["dist_dcnn_bbox"]

            new_carry = {
                "detected_prev": detected,
                "cx_prev": cx_new,
                "cy_prev": cy_new,
                "msp_rings": rings,
                "marker_length": marker_length,
                "altitude_real": altitude_real,
                "leds": leds,
                "msp_avg": msp_avg,
                "size_corr": size_corr,
                "lidar_xy": lidar_xy,
                "dist_aruco": dist_aruco,
                "dist_aruco_bbox": dist_aruco_bbox,
                "dist_dcnn": dist_dcnn,
                "dist_dcnn_bbox": dist_dcnn_bbox,
            }
            out = {
                "detected": detected,
                "measured": measured,
                "marker_length": marker_length,
                "leds": leds,
                "altitude": altitude_real,
                "fov_w": geo.FRAME_W * marker_length / msp_avg[3],
                "fov_h": geo.FRAME_H * marker_length / msp_avg[3],
                "dist_aruco": dist_aruco,
                "dist_aruco_bbox": dist_aruco_bbox,
                "dist_dcnn": dist_dcnn,
                "dist_dcnn_bbox": dist_dcnn_bbox,
                "corners": f["corners"],
                "rvec": rvec,
                "tvec": tvec,
                "msp_avg": msp_avg,
                # Per-basin debug channel (ungated fresh values) for parity
                # analysis of the pose-ambiguity blend.
                "dist_bbox_basin_a": d_bbox_a,
                "basin_a_is_flat": a_is_flat4[:3],
                "flat_margin": jnp.abs(flat_a4 - flat_b4)[:3],
                "dist_bbox_basin_b": d_bbox_b,
                "pose_gap": pose_gap,
                "pose_swapped": f["pswap"][:3],
            }
            return new_carry, out

        return jax.lax.scan(step, carry, (front, first_frame, centroid_rows),
                            unroll=cfg.scan_unroll)

    def process(self, frames: Array, carry: dict, first: bool = False, centroid_rows: Array | None = None):
        """Convenience: front + scan for a batch of frames."""
        t = frames.shape[0]
        f = self.front(frames)
        firsts = jnp.zeros(t, bool).at[0].set(bool(first))
        if centroid_rows is None:
            centroid_rows = jnp.zeros((t, 17), jnp.int32)
        return self.scan(carry, f, firsts, centroid_rows)
