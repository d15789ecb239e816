"""Sharding helpers on the 8-device virtual CPU mesh."""

import os
import jax
import jax.numpy as jnp
import numpy as np

from apse_uav_tpu.parallel import (
    batch_sharding,
    data_mesh,
    shard_batch,
    sharded_inference_fn,
)
from apse_uav_tpu.parallel.mesh import mean_across_devices


def test_mesh_uses_all_devices():
    mesh = data_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_places_on_mesh():
    mesh = data_mesh()
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    xs = shard_batch(mesh, {"a": x})["a"]
    assert xs.sharding == batch_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_sharded_inference_matches_local():
    mesh = data_mesh()
    params = {"w": jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)), jnp.float32)}

    def fn(p, x):
        return jnp.tanh(x @ p["w"])

    run = sharded_inference_fn(mesh, fn, params)
    x = np.random.default_rng(1).normal(size=(16, 4)).astype(np.float32)
    out = run(x)
    np.testing.assert_allclose(np.asarray(out), np.tanh(x @ np.asarray(params["w"])), atol=1e-5)


def test_mean_across_devices():
    mesh = data_mesh()
    f = mean_across_devices(mesh, lambda x: jnp.mean(x))
    x = np.arange(16, dtype=np.float32).reshape(16, 1)
    out = f(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), x.mean(), atol=1e-6)


def test_stage_timer_and_benchmark():
    from apse_uav_tpu.utils.profiling import StageTimer, benchmark

    timer = StageTimer()
    f = timer.timed("square", jax.jit(lambda x: x * x))
    f(jnp.ones((4, 4)))
    f(jnp.ones((4, 4)))
    assert timer.counts["square"] == 2
    assert "square" in timer.summary()

    g = jax.jit(lambda x, seed: (x + seed).sum()[None])
    dt = benchmark(g, jnp.ones(8), iters=3, warmup=1)
    assert dt > 0


def test_aruco_front_sharded_over_frames():
    """The ArUco stateless front (preproc+detect+pose) sharded over an
    8-device mesh matches the single-device result (SURVEY §2.3: DP over
    frames is the designed-in parallelism)."""
    from apse_uav_tpu.core import camera
    from apse_uav_tpu.aruco.pipeline import ArucoPipeline, ArucoPipelineConfig
    from apse_uav_tpu.parallel.mesh import shard_map_batch

    W, H = 256, 128
    mtx, dist = camera.load_camera_params(os.path.join(os.path.dirname(__file__), "..", "data", "cam_params.json"))
    ms = mtx.copy()
    ms[0] *= W / 3840.0
    ms[1] *= H / 2160.0
    cfg = ArucoPipelineConfig(use_pallas_preproc=False)
    pipe = ArucoPipeline(ms, dist, (W, H), cfg)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (8, 3, H, W), dtype=np.uint8))

    ref = pipe.front(frames)
    mesh = data_mesh()
    run = shard_map_batch(mesh, lambda f: pipe.front(f)["gray"])
    gray_sharded = run(frames)
    # Per-shard compilation reassociates the colorspace math differently than
    # the batched program: allow LSB-level drift only.
    d = np.abs(
        np.asarray(gray_sharded).astype(np.int32) - np.asarray(ref["gray"]).astype(np.int32)
    )
    assert d.max() <= 2 and (d > 0).mean() < 0.01, (d.max(), (d > 0).mean())
