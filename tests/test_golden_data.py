"""Regression tests over the vendored golden reference data.

The three files under ``data/`` are byte copies of the reference's designated
regression fixtures (/root/reference/data/): the 14-coefficient camera and the
two DCNN result CSVs that aruco_detect.py consumes in useCentroidData mode
(aruco_detect.py:92-123).  These tests pin the repo to them so it stays
hermetic (no /root/reference needed at test or bench time).
"""

import os

import numpy as np

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


def test_vendored_camera_params():
    from apse_uav_tpu.core.camera import load_camera_params

    mtx, dist = load_camera_params(os.path.join(DATA, "cam_params.json"))
    assert mtx.shape == (3, 3)
    # The real UAV camera: fx/fy ~3400 px at 4K, principal point near centre.
    assert 3000 < mtx[0, 0] < 4000 and 3000 < mtx[1, 1] < 4000
    assert abs(mtx[0, 2] - 1920) < 400 and abs(mtx[1, 2] - 1080) < 400
    # 14-coefficient rational + thin-prism + tilt model, last 6 zero.
    assert dist.shape == (14,)
    assert np.all(dist[8:] == 0.0)
    # Rational model: k4..k6 nonzero (this lens needs the full model).
    assert np.any(dist[5:8] != 0.0)


def test_vendored_camera_projects_into_frame():
    """Projecting points near the optical axis lands inside the 4K frame."""
    import jax.numpy as jnp

    from apse_uav_tpu.core.camera import load_camera_params, project_points

    mtx, dist = load_camera_params(os.path.join(DATA, "cam_params.json"))
    obj = jnp.asarray([[0.0, 0.0, 50.0], [2.0, 1.0, 50.0], [-3.0, -2.0, 50.0]])
    rvec = jnp.zeros(3)
    tvec = jnp.zeros(3)
    pts = np.asarray(project_points(obj, rvec, tvec, jnp.asarray(mtx), jnp.asarray(dist)))
    assert np.all(pts[:, 0] > 0) and np.all(pts[:, 0] < 3840)
    assert np.all(pts[:, 1] > 0) and np.all(pts[:, 1] < 2160)
    # Point on the axis projects exactly to the principal point.
    np.testing.assert_allclose(pts[0], [mtx[0, 2], mtx[1, 2]], atol=1e-6)


def _check_centroid_csv(name, n_rows, host_id):
    from apse_uav_tpu.utils.csv_io import read_centroid_data

    path = os.path.join(DATA, name)
    with open(path) as f:
        first = f.readline()
    assert first.startswith(f"Host id: {host_id}")
    rows = read_centroid_data(path)
    assert rows.shape == (n_rows, 17)
    # Column 0 is the frame counter: strictly increasing.
    assert np.all(np.diff(rows[:, 0]) > 0)
    # Coordinates stay inside the 4K frame (0 = missing detection).
    xs = rows[:, 1::2]
    ys = rows[:, 2::2]
    assert xs.max() < 3840 and ys.max() < 2160
    assert xs.min() >= 0 and ys.min() >= 0
    # The host vehicle's group (positional group 1) is detected nearly always.
    host_present = (rows[:, 1] > 0).mean()
    assert host_present > 0.9
    return rows


def test_vendored_static_csv():
    # 2,736 frame rows; host id 2 (per the file's own header line).
    _check_centroid_csv("static_dcnn_data.csv", 2736 - 2, 2)


def test_vendored_dynamic_csv():
    _check_centroid_csv("dynamic_dcnn_data.csv", 1340 - 2, 2)


def test_pipeline_consumes_real_static_csv():
    """Drive the useCentroidData distance path with real golden rows."""
    import jax.numpy as jnp

    from apse_uav_tpu.utils.csv_io import read_centroid_data

    rows = read_centroid_data(os.path.join(DATA, "static_dcnn_data.csv"))
    # The DCNN distance path converts centroid pixels to metres with the
    # px->m scale; verify rows provide the 4 centroid groups the pipeline
    # indexes positionally (aruco_detect.py:634,665-666,692-693,719-720).
    crow = jnp.asarray(rows[100], jnp.int32)
    host_xy = crow[1:3]
    veh1_xy = crow[5:7]
    assert int(host_xy[0]) > 0 and int(veh1_xy[0]) > 0
    # Pixel distance between host and veh1 centroids is finite and sane.
    d_px = float(jnp.linalg.norm((host_xy - veh1_xy).astype(jnp.float32)))
    assert 0 < d_px < 4400.0
