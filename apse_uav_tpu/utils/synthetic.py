"""Synthetic UAV test-track scenes rendered through the real camera model.

The reference repo ships no 4K footage, so synthetic scenes are this
framework's regression fixtures: ArUco markers (DICT_4X4_50) on vehicle
roofs viewed from altitude, rendered into the *distorted* capture exactly as
the reference camera would see them (inverse of the 14-coefficient lens
model, supersampled).  Ground truth (world poses, expected distances) is
known by construction; cv2's detector on the same frames provides the
behavioral baseline for parity tests.

Scene geometry mirrors the reference setup (aruco_detect.py:519-549,583-586):
marker side 0.55 m, vehicle dims/centroid offsets per vehicle id, the host
car's 8-LED panel at the axis_leds offsets (aruco_detect.py:340-344).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from apse_uav_tpu.aruco.dictionary import marker_image

MARKER_LEN = 0.55
# LED positions wrt the host marker (aruco_detect.py:340-344).
LED_OFFSETS = np.array(
    [
        [-0.419, -0.42], [-0.414, -0.305], [-0.409, -0.19], [-0.404, -0.07],
        [-0.399, 0.065], [-0.393, 0.19], [-0.388, 0.315], [-0.382, 0.435],
    ]
)

ASPHALT = 96.0
ROOF = 235.0
MARKER_BLACK = 25.0
MARKER_WHITE = 245.0
LED_ON = 255.0
LED_OFF = 35.0


def _undistort_numpy(xd, yd, dist, num_iters=25):
    d = np.zeros(14)
    d[: np.asarray(dist).size] = np.asarray(dist, np.float64).reshape(-1)
    k1, k2, p1, p2, k3, k4, k5, k6, s1, s2, s3, s4 = d[:12]
    x, y = xd.copy(), yd.copy()
    # Bound the iterate: outside the lens' invertible domain (far corners)
    # the fixed point diverges; clamping keeps those pixels finite (they
    # render distant ground, irrelevant to the scene content).
    lim = 2.0 * max(np.abs(xd).max(), np.abs(yd).max()) + 1.0
    for _ in range(num_iters):
        r2 = x * x + y * y
        r4 = r2 * r2
        r6 = r4 * r2
        icdist = (1 + k4 * r2 + k5 * r4 + k6 * r6) / (1 + k1 * r2 + k2 * r4 + k3 * r6)
        dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x) + s1 * r2 + s2 * r4
        dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y + s3 * r2 + s4 * r4
        x = np.clip((xd - dx) * icdist, -lim, lim)
        y = np.clip((yd - dy) * icdist, -lim, lim)
    return x, y


def _scene_grids_jax(mtx, dist, w, h, ss, altitude, cam_yaw_deg, distorted):
    """World-coordinate grids + asphalt base as ONE fused jitted pass."""
    import jax
    import jax.numpy as jnp

    d = np.zeros(14)
    d[: np.asarray(dist).size] = np.asarray(dist, np.float64).reshape(-1)
    k1, k2, p1, p2, k3, k4, k5, k6, s1, s2, s3, s4 = d[:12]
    fx, fy = float(mtx[0, 0]), float(mtx[1, 1])
    cx, cy = float(mtx[0, 2]), float(mtx[1, 2])
    cy_r, sy_r = float(np.cos(np.radians(cam_yaw_deg))), float(np.sin(np.radians(cam_yaw_deg)))

    @jax.jit
    def build():
        u = (jnp.arange(w * ss, dtype=jnp.float32) + 0.5) / ss - 0.5
        v = (jnp.arange(h * ss, dtype=jnp.float32) + 0.5) / ss - 0.5
        xd = (u[None, :] - cx) / fx
        yd = (v[:, None] - cy) / fy
        xd = jnp.broadcast_to(xd, (h * ss, w * ss))
        yd = jnp.broadcast_to(yd, (h * ss, w * ss))
        if distorted:
            lim = 2.0 * jnp.maximum(jnp.max(jnp.abs(xd)), jnp.max(jnp.abs(yd))) + 1.0

            def body(_, xy):
                x, y = xy
                r2 = x * x + y * y
                r4 = r2 * r2
                r6 = r4 * r2
                icdist = (1 + k4 * r2 + k5 * r4 + k6 * r6) / (1 + k1 * r2 + k2 * r4 + k3 * r6)
                ddx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x) + s1 * r2 + s2 * r4
                ddy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y + s3 * r2 + s4 * r4
                x = jnp.clip((xd - ddx) * icdist, -lim, lim)
                y = jnp.clip((yd - ddy) * icdist, -lim, lim)
                return x, y

            x_n, y_n = jax.lax.fori_loop(0, 25, body, (xd, yd))
            # Outside the lens' invertible domain (far corners) the fixed
            # point diverges to garbage that depends on float precision;
            # verify by re-distorting and blank those pixels (plain asphalt,
            # pushed far off-world so no vehicle can land there).
            r2 = x_n * x_n + y_n * y_n
            r4 = r2 * r2
            r6 = r4 * r2
            rad = (1 + k1 * r2 + k2 * r4 + k3 * r6) / (1 + k4 * r2 + k5 * r4 + k6 * r6)
            xd2 = x_n * rad + 2 * p1 * x_n * y_n + p2 * (r2 + 2 * x_n * x_n) + s1 * r2 + s2 * r4
            yd2 = y_n * rad + p1 * (r2 + 2 * y_n * y_n) + 2 * p2 * x_n * y_n + s3 * r2 + s4 * r4
            valid = (jnp.abs(xd2 - xd) < 1e-3) & (jnp.abs(yd2 - yd) < 1e-3)
        else:
            x_n, y_n = xd, yd
            valid = jnp.ones_like(xd, dtype=bool)
        xw = altitude * (cy_r * x_n - sy_r * y_n)
        yw = altitude * (sy_r * x_n + cy_r * y_n)
        base = ASPHALT + 8.0 * jnp.sin(xw * 1.7) * jnp.cos(yw * 2.3)
        xw = jnp.where(valid, xw, 1e9)
        yw = jnp.where(valid, yw, 1e9)
        base = jnp.where(valid, base, ASPHALT)
        return xw, yw, base.astype(jnp.float32)

    xw, yw, base = build()
    return np.asarray(xw), np.asarray(yw), np.asarray(base)


@dataclasses.dataclass
class MarkerSpec:
    """One marker on the ground plane."""

    marker_id: int
    center_xy: tuple[float, float]  # world metres
    yaw_deg: float = 0.0
    roof_halfsize: tuple[float, float] = (1.1, 2.0)  # white roof region (w/2, l/2)
    leds: int | None = None  # 8-bit LED panel value (host car only)


def render_scene(
    mtx: np.ndarray,
    dist: np.ndarray,
    size_wh: tuple[int, int],
    markers: list[MarkerSpec],
    altitude: float = 40.0,
    cam_yaw_deg: float = 0.0,
    supersample: int = 2,
    distorted: bool = True,
) -> np.ndarray:
    """Render a (H, W, 3) uint8 capture of markers on the ground plane.

    The camera sits at (0, 0, altitude) looking straight down with yaw
    ``cam_yaw_deg`` about the optical axis; the world plane is z=0.
    When ``distorted`` is True the image is the raw capture (what the lens
    produces), i.e. the input the preprocessing stage undistorts.
    """
    w, h = size_wh
    ss = supersample
    fx, fy = mtx[0, 0], mtx[1, 1]
    cx, cy = mtx[0, 2], mtx[1, 2]

    u = (np.arange(w * ss) + 0.5) / ss - 0.5
    v = (np.arange(h * ss) + 0.5) / ss - 0.5
    uu, vv = np.meshgrid(u, v)

    if distorted:
        # Captured pixel -> ideal normalized coords (undo the lens), pure
        # numpy f64 fixed-point iteration (cv2.undistortPoints-style).
        x_n, y_n = _undistort_numpy((uu - cx) / fx, (vv - cy) / fy, dist, num_iters=25)
    else:
        x_n = (uu - cx) / fx
        y_n = (vv - cy) / fy

    # Ray through the pixel intersects z=0 at world (X, Y).
    cy_r, sy_r = np.cos(np.radians(cam_yaw_deg)), np.sin(np.radians(cam_yaw_deg))
    xw = altitude * (cy_r * x_n - sy_r * y_n)
    yw = altitude * (sy_r * x_n + cy_r * y_n)

    img = np.full(xw.shape, ASPHALT, dtype=np.float64)
    # Low-frequency asphalt texture (keeps adaptive thresholding honest).
    img += 8.0 * np.sin(xw * 1.7) * np.cos(yw * 2.3)

    for spec in markers:
        mx0, my0 = spec.center_xy
        yaw = np.radians(spec.yaw_deg)
        c, s = np.cos(yaw), np.sin(yaw)
        # World -> marker frame.
        lx = c * (xw - mx0) + s * (yw - my0)
        ly = -s * (xw - mx0) + c * (yw - my0)
        rw_, rl = spec.roof_halfsize
        roof = (np.abs(lx) <= rw_) & (np.abs(ly) <= rl)
        img[roof] = ROOF
        # Marker: 6x6 cells (4x4 data + 1-cell border) spanning the FULL
        # marker side L — the detected quad is the outer border edge at +-L/2.
        half = MARKER_LEN / 2.0
        inside = (np.abs(lx) <= half) & (np.abs(ly) <= half)
        with np.errstate(invalid="ignore"):
            gx = np.clip(np.nan_to_num((lx + half) / MARKER_LEN * 6).astype(np.int64), 0, 5)
            gy = np.clip(np.nan_to_num((ly + half) / MARKER_LEN * 6).astype(np.int64), 0, 5)
        pattern = marker_image(spec.marker_id)  # (6,6)*255; row 0 = top
        vals = np.where(pattern[gy, gx] > 127, MARKER_WHITE, MARKER_BLACK)
        img[inside] = vals[inside]
        if spec.leds is not None:
            for j in range(8):
                ox, oy = LED_OFFSETS[j]
                on = (spec.leds >> (7 - j)) & 1
                # LED offsets are in the pose OBJECT frame (+y up toward the
                # canonical marker top); render frame has ly pointing the
                # other way: (x_o, y_o) -> (lx, -ly).
                d2 = (lx - ox) ** 2 + (ly + oy) ** 2
                led = d2 <= 0.06**2
                img[led] = LED_ON if on else LED_OFF

    # Downsample (box filter) to the target resolution.
    img = img.reshape(h, ss, w, ss).mean(axis=(1, 3))
    img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    return np.repeat(img[..., None], 3, axis=-1)


class SceneRenderer:
    """Fast multi-frame renderer for a fixed camera: the expensive lens
    inversion and the static asphalt base render once; each frame only
    re-renders the vehicle patches (local bounding slices).

    Produces frames identical to :func:`render_scene` for the same specs.
    """

    def __init__(self, mtx, dist, size_wh, altitude=40.0, cam_yaw_deg=0.0,
                 supersample=2, distorted=True, cache=True):
        w, h = size_wh
        ss = supersample
        self.size_wh = size_wh
        self.ss = ss
        self.altitude = altitude
        # numpy on small VMs is allocation-bound (each fresh 100+ MB temp
        # costs ~1 s in page faults); the grid setup is jitted JAX on CPU —
        # one fused pass — and cached on disk per (camera, geometry).
        cache_path = None
        if cache:
            import hashlib
            import os
            key = hashlib.sha256(
                np.asarray(mtx, np.float64).tobytes() + np.asarray(dist, np.float64).tobytes()
                + f"{size_wh}-{altitude}-{cam_yaw_deg}-{ss}-{distorted}-v2".encode()
            ).hexdigest()[:16]
            cdir = os.path.join(os.path.expanduser("~"), ".cache", "apse_uav_tpu")
            cache_path = os.path.join(cdir, f"scene_{key}.npz")
            if os.path.exists(cache_path):
                z = np.load(cache_path)
                self.xw, self.yw, self.base = z["xw"], z["yw"], z["base"]
                self._finish_init()
                return
        self.xw, self.yw, self.base = _scene_grids_jax(
            np.asarray(mtx, np.float64), np.asarray(dist, np.float64), w, h, ss,
            float(altitude), float(cam_yaw_deg), bool(distorted),
        )
        if cache_path is not None:
            import os
            os.makedirs(os.path.dirname(cache_path), exist_ok=True)
            np.savez(cache_path + ".tmp.npz", xw=self.xw, yw=self.yw, base=self.base)
            os.replace(cache_path + ".tmp.npz", cache_path)
        self._finish_init()

    def _finish_init(self):
        import jax
        import jax.numpy as jnp

        # Coarse per-block world extents: locating a vehicle's pixel slice
        # is then a scan over ~2k blocks instead of the 33M-px grid.
        B = 128
        gh, gw = self.xw.shape
        ph, pw = -gh % B, -gw % B

        @jax.jit
        def blocks(xw, yw):
            # Pixels in the lens' non-invertible zone carry a 1e9 sentinel;
            # exclude them so contaminated blocks don't match every query.
            def red(a, fn, fill):
                a = jnp.where(jnp.abs(a) < 1e8, a, fill)
                ap = jnp.pad(a, ((0, ph), (0, pw)), constant_values=fill)
                ap = ap.reshape((gh + ph) // B, B, (gw + pw) // B, B)
                return fn(ap, axis=(1, 3))
            return (
                red(xw, jnp.min, jnp.inf), red(xw, jnp.max, -jnp.inf),
                red(yw, jnp.min, jnp.inf), red(yw, jnp.max, -jnp.inf),
            )

        self._B = B
        self._bx_min, self._bx_max, self._by_min, self._by_max = map(
            np.asarray, blocks(self.xw, self.yw)
        )

        @jax.jit
        def downsample_u8(img):
            o = img.reshape(self.size_wh[1], self.ss, self.size_wh[0], self.ss).mean(axis=(1, 3))
            return jnp.clip(jnp.round(o), 0, 255).astype(jnp.uint8)

        self._downsample = downsample_u8

        # Per-marker patch renderer: numpy on this class of VM runs at a few
        # Melem/s (allocation-bound), so all patch math is one fused jitted
        # pass over a FIXED patch shape (one compile for the whole scene).
        @jax.jit
        def paint_patch(img_p, xw_p, yw_p, cx_, cy_, cos_, sin_, roof_w, roof_l,
                        pattern, led_vals, led_xy):
            lx = cos_ * (xw_p - cx_) + sin_ * (yw_p - cy_)
            ly = -sin_ * (xw_p - cx_) + cos_ * (yw_p - cy_)
            out = jnp.where((jnp.abs(lx) <= roof_w) & (jnp.abs(ly) <= roof_l), ROOF, img_p)
            half = MARKER_LEN / 2.0
            inside = (jnp.abs(lx) <= half) & (jnp.abs(ly) <= half)
            gx = jnp.clip(((lx + half) / MARKER_LEN * 6).astype(jnp.int32), 0, 5)
            gy = jnp.clip(((ly + half) / MARKER_LEN * 6).astype(jnp.int32), 0, 5)
            vals = jnp.where(pattern[gy, gx] > 127, MARKER_WHITE, MARKER_BLACK)
            out = jnp.where(inside, vals, out)
            # led_vals < 0 disables a LED slot entirely.
            for j in range(8):
                d2 = (lx - led_xy[j, 0]) ** 2 + (ly + led_xy[j, 1]) ** 2
                out = jnp.where((d2 <= 0.06**2) & (led_vals[j] >= 0), led_vals[j], out)
            return out

        self._paint_patch = paint_patch
        # Fixed patch side: the largest vehicle footprint at this scale,
        # measured at the image CENTRE (distortion compresses the corners,
        # where metres-per-pixel would be underestimated).
        ch_, cw_ = gh // 2, gw // 2
        m_per_px = max(abs(float(self.xw[ch_, cw_ + 1] - self.xw[ch_, cw_])), 1e-9)
        px_per_m = 1.0 / m_per_px
        self._PS = min(int(-(-int(2 * 3.8 * px_per_m + 2 * B) // B) * B), (gh // B) * B, (gw // B) * B)

    def _world_bbox_slice(self, spec: MarkerSpec, margin: float = 1.0):
        """Supersampled-pixel slice covering the vehicle's world extent."""
        rw_, rl = spec.roof_halfsize
        r = float(np.hypot(rw_, rl)) + margin
        mx0, my0 = spec.center_xy
        hit = (
            (self._bx_min <= mx0 + r) & (self._bx_max >= mx0 - r)
            & (self._by_min <= my0 + r) & (self._by_max >= my0 - r)
        )
        ys, xs = np.nonzero(hit.any(axis=1))[0], np.nonzero(hit.any(axis=0))[0]
        if len(ys) == 0 or len(xs) == 0:
            return None
        B = self._B
        gh, gw = self.xw.shape
        return (
            slice(ys[0] * B, min((ys[-1] + 1) * B, gh)),
            slice(xs[0] * B, min((xs[-1] + 1) * B, gw)),
        )

    def render(self, markers: list[MarkerSpec]) -> np.ndarray:
        img = self.base.copy()
        gh, gw = img.shape
        PS = self._PS
        for spec in markers:
            sl = self._world_bbox_slice(spec)
            if sl is None:
                continue
            # Fixed-shape patch window (one jit compile for all markers).
            y0 = min(sl[0].start, max(gh - PS, 0))
            x0 = min(sl[1].start, max(gw - PS, 0))
            ph, pw = min(PS, gh - y0), min(PS, gw - x0)
            sy, sx = slice(y0, y0 + ph), slice(x0, x0 + pw)
            if (ph, pw) != (PS, PS):
                continue  # degenerate geometry (image smaller than a patch)
            led_vals = np.full(8, -1.0, np.float32)
            if spec.leds is not None:
                for j in range(8):
                    led_vals[j] = LED_ON if (spec.leds >> (7 - j)) & 1 else LED_OFF
            yaw = np.radians(spec.yaw_deg)
            patch = self._paint_patch(
                img[sy, sx], self.xw[sy, sx], self.yw[sy, sx],
                np.float32(spec.center_xy[0]), np.float32(spec.center_xy[1]),
                np.float32(np.cos(yaw)), np.float32(np.sin(yaw)),
                np.float32(spec.roof_halfsize[0]), np.float32(spec.roof_halfsize[1]),
                marker_image(spec.marker_id).astype(np.float32),
                led_vals, LED_OFFSETS.astype(np.float32),
            )
            img[sy, sx] = np.asarray(patch)
        out = np.asarray(self._downsample(img))
        return np.repeat(out[..., None], 3, axis=-1)


def marker_world_corners(spec: MarkerSpec) -> np.ndarray:
    """World coords of the marker's 4 corners, in OpenCV detection order
    (top-left, top-right, bottom-right, bottom-left of the canonical marker).

    The canonical marker's row 0 (top) is at negative marker-frame y.
    """
    halfm = MARKER_LEN / 2.0
    local = np.array([[-halfm, -halfm], [halfm, -halfm], [halfm, halfm], [-halfm, halfm]])
    yaw = np.radians(spec.yaw_deg)
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s], [s, c]])
    return local @ rot.T + np.asarray(spec.center_xy)


def project_world_to_undistorted(pts_xy: np.ndarray, mtx: np.ndarray, altitude: float, cam_yaw_deg: float = 0.0) -> np.ndarray:
    """Ground-truth pixel position of world points in the *undistorted* image."""
    cy_r, sy_r = np.cos(np.radians(cam_yaw_deg)), np.sin(np.radians(cam_yaw_deg))
    x_c = cy_r * pts_xy[:, 0] + sy_r * pts_xy[:, 1]
    y_c = -sy_r * pts_xy[:, 0] + cy_r * pts_xy[:, 1]
    x_n = x_c / altitude
    y_n = y_c / altitude
    return np.stack([x_n * mtx[0, 0] + mtx[0, 2], y_n * mtx[1, 1] + mtx[1, 2]], axis=-1)
