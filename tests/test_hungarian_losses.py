"""Hungarian solver vs scipy; triplet losses vs the reference torch code's math."""

import numpy as np
import jax.numpy as jnp
import pytest

from apse_uav_tpu.dcnn.hungarian import (
    auction_assignment,
    linear_sum_assignment,
    pad_cost,
)
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


@pytest.mark.parametrize("n,seed", [(8, 1), (16, 2), (32, 3)])
def test_auction_matches_scipy_cost(n, seed):
    """The eps-scaled auction reaches the optimal total cost within n*eps
    and always returns a permutation."""
    rng = np.random.default_rng(seed)
    cost = rng.uniform(0, 10, (n, n)).astype(np.float32)
    _, col = auction_assignment(jnp.asarray(cost))
    col = np.asarray(col)
    ri, ci = scipy_opt.linear_sum_assignment(cost)
    got = cost[np.arange(n), col].sum()
    want = cost[ri, ci].sum()
    assert sorted(col.tolist()) == list(range(n))
    assert got - want <= n * 10.0 / 4096.0 + 1e-4, (got, want)


def _gated_oracle(cost, rv, cv, thr):
    """Brute-force optimal threshold-gated matching value (small sizes)."""
    import itertools

    rows = [i for i in range(cost.shape[0]) if rv[i]]
    cols = [j for j in range(cost.shape[1]) if cv[j]]
    best = 0.0
    # Penalize unmatched pairs at 0; objective = sum over matched of
    # (cost - thr) for cost < thr pairs (matching a pair only helps when
    # below threshold) -> minimize sum(cost - thr) over allowed pairs.
    allowed = [(r, c) for r in rows for c in cols if cost[r, c] < thr]
    n = len(cols)
    best = 0.0
    for k in range(1, min(len(rows), n) + 1):
        for combo_r in itertools.permutations(rows, k):
            for combo_c in itertools.combinations(cols, k):
                val = 0.0
                ok = True
                for r, c in zip(combo_r, combo_c):
                    if cost[r, c] >= thr:
                        ok = False
                        break
                    val += cost[r, c] - thr
                if ok:
                    best = min(best, val)
    return best


def test_gated_auction_matches_bruteforce():
    """The gated auction reaches the optimal gated-matching objective on
    exhaustively-checkable instances."""
    from apse_uav_tpu.dcnn.hungarian import gated_auction_match

    rng = np.random.default_rng(3)
    thr = 0.6
    for _ in range(15):
        t, d = 5, 4
        cost = rng.uniform(0, 1.2, (8, 8)).astype(np.float32)
        rv = np.arange(8) < t
        cv = np.arange(8) < d
        col = np.asarray(gated_auction_match(
            jnp.asarray(cost), jnp.asarray(rv), jnp.asarray(cv), thr
        ))
        # valid matching: only valid pairs below threshold, no column reuse
        used = [c for c in col if c >= 0]
        assert len(used) == len(set(used))
        val = 0.0
        for r in range(8):
            if col[r] >= 0:
                assert rv[r] and cv[col[r]]
                assert cost[r, col[r]] < thr
                val += cost[r, col[r]] - thr
        want = _gated_oracle(cost, rv, cv, thr)
        assert val <= want + 8 * 1.2 / 2048.0 + 1e-4, (val, want)


def test_gated_auction_agrees_with_reference_gate_on_separated_costs():
    """On well-separated tracking costs (clear matches far below threshold,
    clutter far above) the gated matcher reproduces the reference's
    assign-then-gate matching exactly."""
    from apse_uav_tpu.dcnn.hungarian import gated_auction_match

    rng = np.random.default_rng(11)
    thr = 0.6
    for _ in range(10):
        t, d = 12, 9
        cost = rng.uniform(1.0, 3.0, (32, 32)).astype(np.float32)  # clutter
        # Plant 6 clear matches well under threshold.
        planted = list(zip(rng.permutation(t)[:6], rng.permutation(d)[:6]))
        for r, c in planted:
            cost[r, c] = rng.uniform(0.05, 0.3)
        rv = np.arange(32) < t
        cv = np.arange(32) < d
        col = np.asarray(gated_auction_match(
            jnp.asarray(cost), jnp.asarray(rv), jnp.asarray(cv), thr
        ))
        # Reference emulation: pad to square, exact assignment, gate.
        padded = np.asarray(pad_cost(jnp.asarray(cost), jnp.asarray(rv), jnp.asarray(cv)))
        ri, ci = scipy_opt.linear_sum_assignment(padded)
        ref_col = np.full(32, -1)
        for r, c in zip(ri, ci):
            if r < t and c < d and cost[r, c] < thr:
                ref_col[r] = c
        assert col.tolist() == ref_col.tolist()


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
