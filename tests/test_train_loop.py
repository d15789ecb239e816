"""End-to-end training machinery tests at tiny scale (CPU)."""

import dataclasses
import os

import numpy as np
import pytest

from apse_uav_tpu.dcnn.config import mask_rcnn_r50_fpn

import pytest

pytestmark = pytest.mark.slow


def _tiny_cfg():
    cfg = mask_rcnn_r50_fpn(num_classes=2)
    return dataclasses.replace(
        cfg,
        rpn=dataclasses.replace(
            cfg.rpn, pre_nms_topk_test=64, post_nms_topk_test=32,
            pre_nms_topk_train=64, post_nms_topk_train=32, batch_size_per_image=32,
        ),
        roi=dataclasses.replace(
            cfg.roi, num_classes=2, detections_per_image=8, batch_size_per_image=16,
            score_thresh_test=0.0,
        ),
    )


def _batches(n=10000, b=2, hw=(64, 64), g=4, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        images = rng.uniform(0, 255, (b, *hw, 3)).astype(np.float32)
        gt = {
            "boxes": np.zeros((b, g, 4), np.float32),
            "classes": np.zeros((b, g), np.int32),
            "valid": np.zeros((b, g), bool),
            "masks": np.ones((b, g, *hw), np.float32),
        }
        for i in range(b):
            x, y = rng.integers(4, 30, 2)
            w, h = rng.integers(12, 24, 2)
            gt["boxes"][i, 0] = [x, y, x + w, y + h]
            gt["valid"][i, 0] = True
            images[i, y : y + h, x : x + w] = 250.0
        yield images, gt


def test_finetune_detector_machinery(tmp_path):
    from apse_uav_tpu.train.loop import finetune_detector

    logs = []
    params = finetune_detector(
        _tiny_cfg(),
        _batches(),
        lambda: [next(_batches(seed=9))],
        str(tmp_path),
        max_iter=4,
        test_period=2,
        log_fn=logs.append,
    )
    assert params is not None
    assert os.path.exists(tmp_path / "results.txt")
    assert os.path.exists(tmp_path / "results.png")
    assert os.path.exists(tmp_path / "last")
    assert os.path.exists(tmp_path / "bestAP")
    assert len(logs) == 2
    with open(tmp_path / "results.txt") as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 3  # header + 2 eval rows

    # Resume continues from the stored iteration (no crash, fresh run id).
    params2 = finetune_detector(
        _tiny_cfg(),
        _batches(),
        lambda: [next(_batches(seed=9))],
        str(tmp_path),
        max_iter=5,
        test_period=5,
        log_fn=logs.append,
    )
    assert params2 is not None


def test_train_association_head(tmp_path):
    from apse_uav_tpu.train.loop import train_association_head

    rng = np.random.default_rng(0)
    c, r = 6, 4

    def batch_fn(i):
        # Two identities with distinct feature statistics.
        ids = np.array([1, 1, 2, 2], np.int64)
        base = np.stack(
            [np.full((c, r, r), 1.0), np.full((c, r, r), 1.1),
             np.full((c, r, r), -1.0), np.full((c, r, r), -1.1)]
        ).astype(np.float32)
        return ids, base + rng.normal(0, 0.05, base.shape).astype(np.float32)

    params = train_association_head(
        batch_fn, num_batches=3, workdir=str(tmp_path), epochs=2,
        embedding_dim=8, roi_feature_shape=(c, r, r), log_fn=lambda s: None,
    )
    assert params is not None
    assert os.path.exists(tmp_path / "epoch_1")
    with open(tmp_path / "train_info.txt") as f:
        assert len(f.read().strip().splitlines()) == 2

    # The two identities should be separable after training.
    import jax, jax.numpy as jnp
    from apse_uav_tpu.dcnn.models.association import AssociationHead

    head = AssociationHead(embedding_dim=8)
    ids, rois = batch_fn(0)
    emb = np.asarray(head.apply({"params": params}, jnp.asarray(rois)))
    same = np.linalg.norm(emb[0] - emb[1])
    diff = np.linalg.norm(emb[0] - emb[2])
    assert same < diff


def test_finetune_detector_chunked_equals_single(tmp_path):
    """steps_per_call > 1 (lax.scan over stacked batches) matches the
    single-step loop: same batches, same fold_in(iteration) rng stream,
    chunks never crossing the eval boundary.  Tolerance is tight-but-not-
    bitwise: the scan body and the standalone step are separate XLA
    compilations whose conv fusions round differently at f32; a
    wrong-batch or wrong-rng bug diverges at O(1) and still fails."""
    import jax
    import numpy as np

    from apse_uav_tpu.train.loop import finetune_detector

    def run(workdir, k):
        return finetune_detector(
            _tiny_cfg(),
            _batches(),
            lambda: [next(_batches(seed=9))],
            workdir,
            max_iter=3,
            test_period=3,
            steps_per_call=k,
            resume=False,
            log_fn=lambda s: None,
        )

    p1 = run(str(tmp_path / "a"), 1)
    p2 = run(str(tmp_path / "b"), 2)  # chunks: 2 then 1 (boundary at 3)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat2 = jax.tree_util.tree_leaves(p2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_finetune_detector_chunked_checkpoints_on_exhaustion(tmp_path):
    """A finite iterable that exhausts exactly at a chunk boundary still
    gets the final eval/checkpoint (parity with the single-step path)."""
    import itertools
    import os

    from apse_uav_tpu.train.loop import finetune_detector

    finite = itertools.islice(_batches(), 3)
    params = finetune_detector(
        _tiny_cfg(),
        finite,
        lambda: [next(_batches(seed=9))],
        str(tmp_path),
        max_iter=1000,   # iterable exhausts long before this
        test_period=50,  # ...and before any periodic eval
        steps_per_call=3,
        resume=False,
        log_fn=lambda s: None,
    )
    assert params is not None
    assert os.path.exists(tmp_path / "results.txt")
    assert os.path.exists(tmp_path / "last")
    with open(tmp_path / "results.txt") as f:
        assert len(f.read().strip().splitlines()) == 2  # header + final row
