"""Planar PnP pose estimation in pure JAX (solvePnP ITERATIVE equivalent).

Replaces cv2.aruco.estimatePoseSingleMarkers (reference aruco_detect.py:601):
object points are the marker square corners

    (-L/2, +L/2, 0), (+L/2, +L/2, 0), (+L/2, -L/2, 0), (-L/2, -L/2, 0)

matched to detected corners (top-left first, clockwise).  Like OpenCV's
ITERATIVE solver: initialize from the object-plane homography decomposition,
then refine all 6 pose parameters with damped Gauss-Newton on the *pixel*
reprojection residual (including the distortion model — the reference feeds
the distortion coefficients even though its corners come from undistorted
frames, and parity requires reproducing exactly that).

The Jacobian comes from jax.jacfwd through the projection function, so the
solver is fully batched/vmapped over markers and frames.

Linearity note: with fixed corners, the solution satisfies
rvec(L) = rvec(1), tvec(L) = L * tvec(1) — the pipeline exploits this to run
pose once with unit marker length and apply the sequentially-updated
markerLength as a scale inside the temporal scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from apse_uav_tpu.core import camera, rotation

Array = jax.Array


def marker_object_points(marker_length) -> Array:
    """OpenCV estimatePoseSingleMarkers object points (y up)."""
    half = marker_length / 2.0
    return jnp.array(
        [[-half, half, 0.0], [half, half, 0.0], [half, -half, 0.0], [-half, -half, 0.0]]
    )


def _homography_dlt(src_xy: Array, dst_xy: Array) -> Array:
    """Exact 4-point homography src -> dst via the projective square map."""

    def unit_to_quad(q):
        x0, y0 = q[0, 0], q[0, 1]
        x1, y1 = q[1, 0], q[1, 1]
        x2, y2 = q[2, 0], q[2, 1]
        x3, y3 = q[3, 0], q[3, 1]
        dx1 = x1 - x2
        dx2 = x3 - x2
        dy1 = y1 - y2
        dy2 = y3 - y2
        sx = x0 - x1 + x2 - x3
        sy = y0 - y1 + y2 - y3
        den = dx1 * dy2 - dx2 * dy1
        den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        g = (sx * dy2 - sy * dx2) / den
        hh = (dx1 * sy - dy1 * sx) / den
        return jnp.array(
            [
                [x1 - x0 + g * x1, x3 - x0 + hh * x3, x0],
                [y1 - y0 + g * y1, y3 - y0 + hh * y3, y0],
                [g, hh, 1.0],
            ]
        )

    h_src = unit_to_quad(src_xy)
    h_dst = unit_to_quad(dst_xy)
    return h_dst @ jnp.linalg.inv(h_src)


def _init_pose_planar(obj_xy: Array, xy_norm: Array):
    """Initial (rvec, tvec) from the homography obj plane -> normalized image."""
    h_mat = _homography_dlt(obj_xy, xy_norm)
    h_mat = h_mat / jnp.linalg.norm(h_mat[:, 0])
    r1 = h_mat[:, 0]
    r2 = h_mat[:, 1]
    # Scale so ||r1|| = ||r2|| = 1 on average (OpenCV uses both norms).
    lam = 2.0 / (jnp.linalg.norm(r1) + jnp.linalg.norm(r2))
    r1 = r1 * lam
    r2 = r2 * lam
    t = h_mat[:, 2] * lam
    # Orthonormalize by Gram-Schmidt — the Gauss-Newton refinement corrects
    # any residual init error, and this avoids a tiny-SVD (latency-bound on
    # TPU, where small-matrix iterative linalg dominates the whole solver).
    q1 = r1 / jnp.maximum(jnp.linalg.norm(r1), 1e-12)
    r2o = r2 - jnp.dot(q1, r2) * q1
    q2 = r2o / jnp.maximum(jnp.linalg.norm(r2o), 1e-12)
    r_mat = jnp.stack([q1, q2, jnp.cross(q1, q2)], axis=1)
    # The camera must look at the front of the plane: t_z > 0.
    flip = t[2] < 0
    t = jnp.where(flip, -t, t)
    r_mat = jnp.where(
        flip, r_mat @ jnp.diag(jnp.array([-1.0, -1.0, 1.0])), r_mat
    )
    return rotation.matrix_to_rodrigues(r_mat), t


@functools.partial(jax.jit, static_argnames=("num_iters",))
def solve_pnp_planar(
    obj_pts: Array,
    img_pts: Array,
    mtx: Array,
    dist: Array,
    num_iters: int = 6,
):
    """Solve planar PnP for one marker.  obj_pts (4,3), img_pts (4,2) pixels.

    Returns (rvec (3,), tvec (3,)) of the minimum-reprojection-error basin.
    """
    best, _, _, _, _ = _solve_pnp_planar_two(obj_pts, img_pts, mtx, dist, num_iters)
    return best[:3], best[3:]


@functools.partial(jax.jit, static_argnames=("num_iters",))
def _solve_pnp_planar_two(
    obj_pts: Array,
    img_pts: Array,
    mtx: Array,
    dist: Array,
    num_iters: int = 6,
):
    """Both refined planar-ambiguity poses, packed (6,) each, best first."""
    # EVERY matmul in the solver (homography init, Gauss-Newton normal
    # equations, basin mirror) must run at full f32: the default TPU dot is
    # a single bf16 MXU pass, and the ill-conditioned 6x6 normal equations
    # amplify that into diverging GN steps (a 100-frame parity run produced
    # altitude +162 km from one frame's host pose on TPU while the same
    # corners solved cleanly on CPU).
    with jax.default_matmul_precision("highest"):
        return _solve_pnp_planar_two_impl(obj_pts, img_pts, mtx, dist, num_iters)


def _solve_spd6(a: Array, b: Array) -> Array:
    """Solve the 6x6 SPD system ``a @ x = b`` by fully unrolled Cholesky.

    ``jnp.linalg.solve`` lowers to a pivoted LU custom call whose internal
    while-loops are pure latency for a 6x6 system inside a vmapped GN step;
    the damped normal matrix is SPD by construction, so an unrolled
    Cholesky + two unrolled triangular substitutions compile to one fused
    chain of elementwise/vector ops instead.
    """
    n = 6
    # Cholesky factor rows as a list of scalars (static indexing -> no
    # gathers; everything stays fusible elementwise math under vmap).
    low = [[None] * n for _ in range(n)]
    for j in range(n):
        d = a[j, j]
        for k in range(j):
            d = d - low[j][k] * low[j][k]
        # NO clamp: a rank-deficient system (degenerate quad) must produce
        # NaN/inf here so the caller's isfinite guard freezes the params —
        # clamping would turn the singular case into huge finite garbage
        # steps that slip past the guard.
        dj = jnp.sqrt(d)
        low[j][j] = dj
        for i in range(j + 1, n):
            s = a[i, j]
            for k in range(j):
                s = s - low[i][k] * low[j][k]
            low[i][j] = s / dj
    # Forward substitution: L y = b.
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - low[i][k] * y[k]
        y[i] = s / low[i][i]
    # Back substitution: L^T x = y.
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - low[k][i] * x[k]
        x[i] = s / low[i][i]
    return jnp.stack(x)


def _solve_pnp_planar_two_impl(obj_pts, img_pts, mtx, dist, num_iters):
    dist14 = camera.pad_dist_coeffs(dist)
    xy_norm = camera.undistort_points(img_pts, mtx, dist, num_iters=5)
    rvec0, tvec0 = _init_pose_planar(obj_pts[:, :2], xy_norm)

    def residual(params):
        proj = camera.project_points(obj_pts, params[:3], params[3:], mtx, dist14)
        return (proj - img_pts).reshape(-1)

    def gn_step(_, params):
        r = residual(params)
        jac = jax.jacfwd(residual)(params)  # (8, 6)
        jtj = jac.T @ jac
        jtr = jac.T @ r
        damped = jtj + 1e-6 * jnp.eye(6) * jnp.maximum(jnp.trace(jtj) / 6.0, 1e-6)
        step = _solve_spd6(damped, jtr)
        # Guard against non-finite steps (degenerate quads).
        step = jnp.where(jnp.all(jnp.isfinite(step)), step, jnp.zeros(6))
        return params - step

    # Planar-pose two-fold ambiguity: a square seen at a small tilt admits a
    # second pose whose plane normal is the FIRST solution's normal reflected
    # about the line of sight, with near-identical reprojection.  Sub-pixel
    # corner noise decides which basin a single-init solver lands in — the
    # reference's cv2 chain flips basins from ITS corner noise, unpredictably
    # to any reimplementation (the round-2 parity run's 0.112 m d_bbox
    # outlier was exactly such a disagreement).  Build the mirrored init from
    # the HOMOGRAPHY init (not the refined A pose — the basin geometry is the
    # same to first order, and deriving it pre-refinement lets both basins
    # refine CONCURRENTLY in one batched GN loop: 6 sequential stages instead
    # of 12; the tiny 6-param solves are pure latency on TPU).  Return BOTH
    # refined poses (best-residual first); ambiguity-sensitive consumers (the
    # bbox-distance column) average over the pair, bounding the worst-case
    # deviation from either basin choice at half the flip impact.
    r_a0 = rotation.rodrigues_to_matrix(rvec0)
    n = r_a0[:, 2]
    v = tvec0 / jnp.maximum(jnp.linalg.norm(tvec0), 1e-9)
    n_ref = 2.0 * jnp.dot(n, v) * v - n
    axis = jnp.cross(n, n_ref)
    s = jnp.linalg.norm(axis)
    c = jnp.clip(jnp.dot(n, n_ref), -1.0, 1.0)
    angle = jnp.arctan2(s, c)
    axis = axis / jnp.maximum(s, 1e-12)
    # Degenerate (zero tilt): mirrored init collapses onto A — harmless tie.
    q = rotation.rodrigues_to_matrix(jnp.where(s > 1e-9, axis * angle, jnp.zeros(3)))
    rvec_b0 = rotation.matrix_to_rodrigues(q @ r_a0)

    both0 = jnp.stack(
        [jnp.concatenate([rvec0, tvec0]), jnp.concatenate([rvec_b0, tvec0])]
    )
    # Unrolled: num_iters is a small static constant and the rolled
    # fori_loop is a serial chain of tiny dispatches (each GN step's whole
    # working set is a handful of 8x6 matrices under vmap) — unrolling lets
    # XLA fuse across steps.
    both = both0
    for i in range(num_iters):
        both = jax.vmap(lambda pp, _i=i: gn_step(_i, pp))(both)
    params_a, params_b = both[0], both[1]

    err_a = jnp.sum(residual(params_a) ** 2)
    err_b = jnp.sum(residual(params_b) ** 2)

    # Physical sanity: the refined pose must be finite and in FRONT of the
    # camera.  GN from the mirrored init can occasionally diverge to the
    # projective twin (-R, -t) or a far-away degenerate fit whose residual
    # is accidentally low — selecting or averaging those poisons everything
    # downstream (a 100-frame parity run produced altitude -311 m from one
    # such frame).
    # Depth envelope: a marker of unit side at depth z projects with side
    # ~ fx/z; beyond z = 2*fx it would be sub-half-pixel (undetectable), so
    # any larger depth is a diverged solve, not a pose.
    z_max = 2.0 * mtx[0, 0]

    def sane(params, err):
        return (
            jnp.all(jnp.isfinite(params))
            & jnp.isfinite(err)
            & (params[5] > 0)
            & (params[5] < z_max)
        )

    sane_a = sane(params_a, err_a)
    sane_b = sane(params_b, err_b)
    take_b = sane_b & ((err_b < err_a) | ~sane_a)
    best = jnp.where(take_b, params_b, params_a)
    best_err = jnp.where(take_b, err_b, err_a)
    # Both diverged (degenerate quad): fall back to the homography init,
    # which is bounded by construction — garbage-but-finite beats +162 km.
    init = jnp.concatenate([rvec0, tvec0])
    best = jnp.where(sane_a | sane_b, best, init)
    other = jnp.where(take_b, params_a, params_b)
    other_err = jnp.where(take_b, err_a, err_b)
    # The genuine second basin sits at nearly the same range with a residual
    # of the same order; anything else collapses onto the best pose (the
    # consumer's two-basin average then degenerates to the single pose).
    ratio = jnp.linalg.norm(other[3:]) / jnp.maximum(jnp.linalg.norm(best[3:]), 1e-9)
    other_ok = (
        sane(other, other_err)
        & (ratio > 0.5) & (ratio < 2.0)
        & (other_err < 100.0 * best_err + 1.0)
    )
    other = jnp.where(other_ok, other, best)
    best_err_out = jnp.where(sane_a | sane_b, best_err, jnp.float32(jnp.inf))
    other_err_out = jnp.where(other_ok, other_err, best_err_out)
    # take_b: the returned BEST pose is the mirrored basin, i.e. the
    # homography-init basin (cv2 ITERATIVE's landing basin — it never
    # compares basins) is `other`.
    return best, other, best_err_out, other_err_out, take_b


@functools.partial(jax.jit, static_argnames=("num_iters",))
def estimate_pose_single_markers(
    corners: Array,
    marker_length,
    mtx: Array,
    dist: Array,
    num_iters: int = 6,
):
    """cv2.aruco.estimatePoseSingleMarkers equivalent, batched.

    Args:
      corners: (N, 4, 2) pixel corners (canonical order, clockwise from
        top-left) — extra leading batch dims allowed.
      marker_length: marker side in metres.

    Returns:
      (rvecs (N, 3), tvecs (N, 3)).
    """
    obj = marker_object_points(marker_length)
    fn = lambda c: solve_pnp_planar(obj, c, mtx, dist, num_iters=num_iters)
    for _ in range(corners.ndim - 2):
        fn = jax.vmap(fn)
    return fn(corners)


@functools.partial(jax.jit, static_argnames=("num_iters",))
def estimate_pose_single_markers_two(
    corners: Array,
    marker_length,
    mtx: Array,
    dist: Array,
    num_iters: int = 6,
):
    """Like :func:`estimate_pose_single_markers`, but returns both planar-
    ambiguity basins: (rvec, tvec, rvec_alt, tvec_alt, err, err_alt,
    swapped), best-residual first, each with its summed squared pixel
    reprojection residual, plus `swapped`: True when the best-residual
    basin is the MIRRORED one (i.e. the homography-init basin — the one
    cv2 ITERATIVE would land in — is the `_alt` pose).
    """
    obj = marker_object_points(marker_length)

    def one(c):
        best, other, err, err2, swapped = _solve_pnp_planar_two(obj, c, mtx, dist, num_iters)
        return best[:3], best[3:], other[:3], other[3:], err, err2, swapped

    fn = one
    for _ in range(corners.ndim - 2):
        fn = jax.vmap(fn)
    return fn(corners)
