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


def test_dp_train_step_matches_single_device():
    """The 8-device DP detector train step (grads + SGD update) is numerically
    equal to the single-device step on the same batch — the actual multi-chip
    correctness claim behind dryrun_multichip (VERDICT r4 #5).  GSPMD must
    preserve semantics: the only allowed drift is f32 reduction reassociation
    in the compiler-inserted gradient collectives."""
    import dataclasses
    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    from apse_uav_tpu.dcnn.config import mask_rcnn_r50_fpn
    from apse_uav_tpu.dcnn.models.mask_rcnn import MaskRCNN
    from apse_uav_tpu.train.optim import build_finetune_optimizer
    from apse_uav_tpu.train.steps import detector_train_step

    cfg = mask_rcnn_r50_fpn(num_classes=3)
    cfg = dataclasses.replace(
        cfg,
        depth=26,
        fpn_channels=32,
        rpn=dataclasses.replace(
            cfg.rpn,
            pre_nms_topk_train=64, post_nms_topk_train=32,
            pre_nms_topk_test=64, post_nms_topk_test=32,
            batch_size_per_image=16,
        ),
        roi=dataclasses.replace(
            cfg.roi, num_classes=3, detections_per_image=8,
            batch_size_per_image=16, box_fc_dim=64, mask_conv_dim=16,
        ),
    )
    model = MaskRCNN(cfg=cfg)

    b, h, w, g = 8, 32, 32, 2
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)), jnp.float32)
    gt = {
        "boxes": jnp.asarray(
            np.stack([[[4.0 + i, 5.0, 20.0 + i % 3, 24.0], [10.0, 2.0 + i, 28.0, 18.0]]
                      for i in range(b)]), jnp.float32),
        "classes": jnp.asarray(rng.integers(0, 3, (b, g)), jnp.int32),
        "valid": jnp.ones((b, g), bool),
        "masks": jnp.asarray(rng.uniform(size=(b, g, h, w)) > 0.5, jnp.float32),
    }
    params = jax.jit(lambda r: model.init(r, images[:1], mode="inference")["params"])(
        jax.random.PRNGKey(0)
    )
    tx = build_finetune_optimizer(params, ("proposal_generator", "roi_heads"), lr=0.01)
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(1)

    step = functools.partial(detector_train_step, model, tx, freeze_backbone=True)

    # Single device (explicit placement on device 0).
    dev0 = jax.devices()[0]
    one = jax.jit(step)
    p1, o1, l1 = one(
        jax.device_put(params, dev0), jax.device_put(opt_state, dev0),
        jax.device_put(images, dev0), jax.device_put(gt, dev0), key,
    )

    # 8-device DP: batch sharded, params/opt replicated.
    mesh = data_mesh()
    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P("data"))
    sharded = jax.jit(
        step,
        in_shardings=(repl, repl, batched, {k: batched for k in gt}, repl),
        out_shardings=(repl, repl, repl),
    )
    p8, o8, l8 = sharded(
        jax.device_put(params, repl), jax.device_put(opt_state, repl),
        jax.device_put(images, batched),
        jax.device_put(gt, {k: batched for k in gt}), key,
    )

    for k in l1:
        np.testing.assert_allclose(float(l8[k]), float(l1[k]), rtol=2e-5, atol=1e-6, err_msg=k)

    # Tolerance: losses match to ~1e-5 (forward semantics identical); the
    # gradient reductions reassociate across the 8-way split, so per-param
    # updates drift up to ~2e-4 relative (measured) — pure f32 summation
    # order, scaled into params by lr.
    flat1 = jax.tree_util.tree_flatten_with_path(p1)[0]
    flat8 = jax.tree_util.tree_flatten_with_path(p8)[0]
    assert len(flat1) == len(flat8)
    for (k1, v1), (k8, v8) in zip(flat1, flat8):
        assert k1 == k8
        np.testing.assert_allclose(
            np.asarray(v8), np.asarray(v1), rtol=5e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(k1),
        )
    # Optimizer state (momentum buffers) must match too.
    for (k1, v1), (k8, v8) in zip(
        jax.tree_util.tree_flatten_with_path(o1)[0],
        jax.tree_util.tree_flatten_with_path(o8)[0],
    ):
        assert k1 == k8
        np.testing.assert_allclose(
            np.asarray(v8), np.asarray(v1), rtol=5e-4, atol=1e-5,
            err_msg="opt_state" + jax.tree_util.keystr(k1),
        )


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
