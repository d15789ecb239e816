"""Hungarian solver vs scipy; triplet losses vs the reference torch code's math."""

import numpy as np
import jax.numpy as jnp
import pytest

from apse_uav_tpu.dcnn.hungarian import linear_sum_assignment, pad_cost
from apse_uav_tpu.dcnn.losses import (
    batch_all_triplet_loss,
    batch_hard_triplet_loss,
    pairwise_distances,
)

scipy_opt = pytest.importorskip("scipy.optimize")


@pytest.mark.parametrize("n,seed", [(3, 0), (8, 1), (16, 2), (32, 3), (64, 4)])
def test_assignment_matches_scipy(n, seed):
    rng = np.random.default_rng(seed)
    cost = rng.uniform(0, 10, (n, n)).astype(np.float32)
    _, col = linear_sum_assignment(jnp.asarray(cost))
    ri, ci = scipy_opt.linear_sum_assignment(cost)
    got = cost[np.arange(n), np.asarray(col)].sum()
    want = cost[ri, ci].sum()
    assert abs(got - want) < 1e-3
    assert sorted(np.asarray(col).tolist()) == list(range(n))  # a permutation


def test_assignment_maximize():
    cost = np.array([[1.0, 5.0], [5.0, 1.0]], np.float32)
    _, col = linear_sum_assignment(jnp.asarray(cost), maximize=True)
    assert np.asarray(col).tolist() == [1, 0]


def test_padded_rectangular():
    rng = np.random.default_rng(9)
    # 3 real rows, 5 real cols inside an 8x8 padded problem.
    cost = rng.uniform(0, 1, (8, 8)).astype(np.float32)
    rv = np.arange(8) < 3
    cv = np.arange(8) < 5
    padded = pad_cost(jnp.asarray(cost), jnp.asarray(rv), jnp.asarray(cv))
    _, col = linear_sum_assignment(padded)
    col = np.asarray(col)
    # Real rows must take real columns, optimally for the 3x5 subproblem.
    sub = cost[:3, :5]
    ri, ci = scipy_opt.linear_sum_assignment(sub)
    assert all(col[i] < 5 for i in range(3))
    got = sub[np.arange(3), col[:3]].sum()
    assert abs(got - sub[ri, ci].sum()) < 1e-3


def _np_pairwise(e):
    return np.sqrt(np.maximum(((e[:, None] - e[None, :]) ** 2).sum(-1), 0))


def test_pairwise_distances():
    rng = np.random.default_rng(0)
    e = rng.normal(size=(10, 16)).astype(np.float32)
    got = np.asarray(pairwise_distances(jnp.asarray(e)))
    np.testing.assert_allclose(got, _np_pairwise(e), atol=1e-4)


def test_batch_hard_reference_math():
    rng = np.random.default_rng(1)
    e = rng.normal(size=(12, 8)).astype(np.float32)
    labels = np.array([0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3])
    d = _np_pairwise(e)
    margin = 0.2
    losses = []
    for a in range(12):
        pos = [j for j in range(12) if labels[j] == labels[a] and j != a]
        neg = [j for j in range(12) if labels[j] != labels[a]]
        losses.append(max(max(d[a, pos]) - min(d[a, neg]) + margin, 0.0))
    want = float(np.mean(losses))
    got = float(batch_hard_triplet_loss(jnp.asarray(labels), jnp.asarray(e), margin))
    assert abs(got - want) < 1e-4


def test_batch_all_reference_math():
    rng = np.random.default_rng(2)
    e = rng.normal(size=(9, 8)).astype(np.float32)
    labels = np.array([0, 0, 0, 1, 1, 1, 2, 2, 2])
    d = _np_pairwise(e)
    margin = 0.5
    vals = []
    for a in range(9):
        for p in range(9):
            for n in range(9):
                if labels[a] == labels[p] and a != p and labels[a] != labels[n]:
                    vals.append(max(d[a, p] - d[a, n] + margin, 0.0))
    vals = np.array(vals)
    want = vals[vals > 1e-16].mean()
    got, frac = batch_all_triplet_loss(jnp.asarray(labels), jnp.asarray(e), margin)
    assert abs(float(got) - want) < 1e-4
    assert abs(float(frac) - (vals > 1e-16).mean()) < 1e-4


def test_batch_hard_with_validity_mask():
    rng = np.random.default_rng(3)
    e = rng.normal(size=(8, 4)).astype(np.float32)
    labels = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 3])
    valid = jnp.asarray([True] * 6 + [False] * 2)
    full = batch_hard_triplet_loss(labels[:6], jnp.asarray(e[:6]), 0.2)
    masked = batch_hard_triplet_loss(labels, jnp.asarray(e), 0.2, valid=valid)
    assert abs(float(full) - float(masked)) < 1e-5
