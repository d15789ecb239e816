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
                 supersample=2, distorted=True):
        w, h = size_wh
        ss = supersample
        self.size_wh = size_wh
        self.ss = ss
        self.altitude = altitude
        fx, fy = mtx[0, 0], mtx[1, 1]
        cx, cy = mtx[0, 2], mtx[1, 2]
        u = (np.arange(w * ss) + 0.5) / ss - 0.5
        v = (np.arange(h * ss) + 0.5) / ss - 0.5
        uu, vv = np.meshgrid(u, v)
        if distorted:
            x_n, y_n = _undistort_numpy((uu - cx) / fx, (vv - cy) / fy, dist, num_iters=25)
        else:
            x_n = (uu - cx) / fx
            y_n = (vv - cy) / fy
        cy_r, sy_r = np.cos(np.radians(cam_yaw_deg)), np.sin(np.radians(cam_yaw_deg))
        self.xw = (altitude * (cy_r * x_n - sy_r * y_n)).astype(np.float32)
        self.yw = (altitude * (sy_r * x_n + cy_r * y_n)).astype(np.float32)
        base = np.full(self.xw.shape, ASPHALT, dtype=np.float32)
        base += (8.0 * np.sin(self.xw * 1.7) * np.cos(self.yw * 2.3)).astype(np.float32)
        self.base = base
        # Coarse per-block world extents: locating a vehicle's pixel slice
        # is then a scan over ~2k blocks instead of the 33M-px grid.
        B = 128
        gh, gw = self.xw.shape
        ph, pw = -gh % B, -gw % B
        def blockify(a, red):
            ap = np.pad(a, ((0, ph), (0, pw)), constant_values=np.nan)
            ap = ap.reshape((gh + ph) // B, B, (gw + pw) // B, B)
            return red(ap, axis=(1, 3))
        self._B = B
        self._bx_min = blockify(self.xw, np.nanmin)
        self._bx_max = blockify(self.xw, np.nanmax)
        self._by_min = blockify(self.yw, np.nanmin)
        self._by_max = blockify(self.yw, np.nanmax)

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
        for spec in markers:
            sl = self._world_bbox_slice(spec)
            if sl is None:
                continue
            sy, sx = sl
            xw = self.xw[sy, sx]
            yw = self.yw[sy, sx]
            mx0, my0 = spec.center_xy
            yaw = np.radians(spec.yaw_deg)
            c, s = np.cos(yaw), np.sin(yaw)
            lx = c * (xw - mx0) + s * (yw - my0)
            ly = -s * (xw - mx0) + c * (yw - my0)
            patch = img[sy, sx]
            rw_, rl = spec.roof_halfsize
            roof = (np.abs(lx) <= rw_) & (np.abs(ly) <= rl)
            patch[roof] = ROOF
            half = MARKER_LEN / 2.0
            inside = (np.abs(lx) <= half) & (np.abs(ly) <= half)
            with np.errstate(invalid="ignore"):
                gx = np.clip(np.nan_to_num((lx + half) / MARKER_LEN * 6).astype(np.int64), 0, 5)
                gy = np.clip(np.nan_to_num((ly + half) / MARKER_LEN * 6).astype(np.int64), 0, 5)
            pattern = marker_image(spec.marker_id)
            vals = np.where(pattern[gy, gx] > 127, MARKER_WHITE, MARKER_BLACK)
            patch[inside] = vals[inside]
            if spec.leds is not None:
                for j in range(8):
                    ox, oy = LED_OFFSETS[j]
                    on = (spec.leds >> (7 - j)) & 1
                    d2 = (lx - ox) ** 2 + (ly + oy) ** 2
                    led = d2 <= 0.06**2
                    patch[led] = LED_ON if on else LED_OFF
            img[sy, sx] = patch
        h, w = self.size_wh[1], self.size_wh[0]
        ss = self.ss
        out = img.reshape(h, ss, w, ss).mean(axis=(1, 3))
        out = np.clip(np.round(out), 0, 255).astype(np.uint8)
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
