"""Fixed-size linear assignment (Hungarian) on device.

Replaces ``scipy.optimize.linear_sum_assignment`` in the tracker association
step (reference: dcnn/engines/rcnn_tracker.py:132), keeping the whole
associate-detections-to-tracks computation on the TPU instead of a
device->host->device round trip.

Implementation: the classical O(n^3) shortest-augmenting-path form of the
Hungarian algorithm with dual potentials (Jonker-Volgenant style).  The
per-row Dijkstra scan is a ``lax.while_loop`` whose body is dense O(n)
vector work — XLA-friendly, no host sync, exact optimum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

# Pad value for masked entries.  Must dominate any real cost but stay small
# enough that f32 keeps resolution when padded rows join augmenting paths:
# ULP(1e4) ~ 1e-3, far below meaningful cost differences (embedding
# distances are < 4 with threshold 0.6); ULP(1e7) would be 1.0 and silently
# absorb sub-unit dual-potential updates.
_BIG = 1e4


@functools.partial(jax.jit, static_argnames=("maximize",))
def linear_sum_assignment(cost: Array, maximize: bool = False) -> tuple[Array, Array]:
    """Optimal assignment for a square (N, N) cost matrix.

    Returns (row_ind, col_ind) like scipy: row_ind = arange(N) and col_ind[i]
    is the column assigned to row i.  Pad rectangular problems to square
    (see :func:`pad_cost`).
    """
    cost = cost.astype(jnp.float32)
    if maximize:
        cost = -cost
    n = cost.shape[0]
    inf = jnp.float32(jnp.inf)
    # Index n is the virtual source column.
    u0 = jnp.zeros(n, jnp.float32)
    v0 = jnp.zeros(n + 1, jnp.float32)
    p0 = jnp.full(n + 1, -1, jnp.int32)  # p[j] = row owning column j

    def add_row(i, state):
        u, v, p = state
        p = p.at[n].set(i)
        minv = jnp.full(n + 1, inf)
        way = jnp.full(n + 1, n, jnp.int32)
        used = jnp.zeros(n + 1, bool)

        def cond(s):
            return s[2][s[6]] != -1

        def body(s):
            u, v, p, minv, way, used, j0 = s
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = cost[i0] - u[i0] - v[:n]  # (n,)
            better = (~used[:n]) & (cur < minv[:n])
            minv = minv.at[:n].set(jnp.where(better, cur, minv[:n]))
            way = way.at[:n].set(jnp.where(better, j0, way[:n]))
            masked = jnp.where(used[:n], inf, minv[:n])
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # Dual updates over scanned columns.
            add = jnp.where(used, delta, 0.0)
            u = u.at[jnp.where(used, p, 0)].add(jnp.where(used, delta, 0.0), mode="drop")
            v = v - add
            minv = jnp.where(used, minv, minv - delta)
            return u, v, p, minv, way, used, j1

        u, v, p, minv, way, used, j0 = jax.lax.while_loop(
            cond, body, (u, v, p, minv, way, used, jnp.int32(n))
        )

        # Augment along the alternating path back to the virtual column.
        def aug_cond(s):
            j0, _ = s
            return j0 != n

        def aug_body(s):
            j0, p = s
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return j1, p

        _, p = jax.lax.while_loop(aug_cond, aug_body, (j0, p))
        return u, v, p

    u, v, p = jax.lax.fori_loop(0, n, add_row, (u0, v0, p0))
    row_of_col = p[:n]
    col_of_row = jnp.zeros(n, jnp.int32).at[row_of_col].set(jnp.arange(n, dtype=jnp.int32))
    return jnp.arange(n, dtype=jnp.int32), col_of_row


@functools.partial(jax.jit, static_argnames=("maximize", "max_sweeps"))
def auction_assignment(
    cost: Array, maximize: bool = False, max_sweeps: int = 256
) -> tuple[Array, Array]:
    """Near-optimal assignment via Bertsekas' auction with eps-scaling.

    Same interface as :func:`linear_sum_assignment`.  Rationale: the exact
    Jonker-Volgenant solve runs O(n^2) *sequential* Dijkstra steps, each a
    tiny vector op — pure launch/loop latency on TPU (the dominant cost of
    the tracker association at n=32).  The auction's Jacobi bidding sweep
    is one dense (n, n) pass assigning many rows at once; with eps-scaling
    it converges in tens of sweeps and the final eps puts the total cost
    within n*eps of optimal (exact when cost gaps exceed n*eps_final).

    Reference semantics target: dcnn/engines/rcnn_tracker.py:132 uses
    scipy's exact solver; for tracking costs (embedding distances, gaps
    >> 1e-3) the eps-scaled auction returns the same matching.
    """
    cost = cost.astype(jnp.float32)
    n = cost.shape[0]
    benefit = jnp.where(maximize, cost, -cost)
    neg_inf = jnp.float32(-1e30)

    # eps scaling: spread-based start, ~1/8 decay, final eps resolves
    # sub-1e-3 cost gaps (embedding distances are O(1)).
    spread = jnp.maximum(jnp.max(benefit) - jnp.min(benefit), 1e-6)

    def sweep(state):
        owner, col_of_row, prices, eps, _ = state
        unassigned = col_of_row < 0  # (n,) rows
        values = benefit - prices[None, :]  # (n, n)
        j_star = jnp.argmax(values, axis=1)  # (n,)
        v1 = jnp.max(values, axis=1)
        masked = values.at[jnp.arange(n), j_star].set(neg_inf)
        v2 = jnp.max(masked, axis=1)
        bid = v1 - v2 + eps  # raise over current price
        # Column-wise best bid among unassigned bidders (dense one-hot max).
        bids = jnp.where(
            unassigned[:, None] & (jnp.arange(n)[None, :] == j_star[:, None]),
            bid[:, None],
            neg_inf,
        )  # (n, n) rows x cols
        best_row = jnp.argmax(bids, axis=0)  # per column
        best_bid = jnp.max(bids, axis=0)
        got_bid = best_bid > neg_inf / 2
        prices = jnp.where(got_bid, prices + best_bid, prices)
        # Displace previous owners of rebid columns.
        displaced = got_bid[jnp.where(col_of_row >= 0, col_of_row, 0)] & (col_of_row >= 0)
        new_owner_row = jnp.where(got_bid, best_row, owner)
        col_of_row = jnp.where(displaced, -1, col_of_row)
        # Winners take their columns.
        col_idx = jnp.arange(n, dtype=jnp.int32)
        col_of_row = col_of_row.at[jnp.where(got_bid, best_row, n)].set(
            col_idx, mode="drop"
        )
        return new_owner_row, col_of_row, prices, eps, unassigned.sum()

    def run_phase(carry, eps):
        owner, col_of_row, prices, budget = carry
        # Reset assignments each phase (prices persist — the point of
        # scaling); the shared sweep budget gives a static worst-case bound.
        col_of_row = jnp.full(n, -1, jnp.int32)

        def cond(s):
            return jnp.any(s[0][1] < 0) & (s[1] > 0)

        def body(s):
            st, budget = s
            return sweep(st), budget - 1

        (owner, col_of_row, prices, _, _), budget = jax.lax.while_loop(
            cond, body, ((owner, col_of_row, prices, eps, jnp.int32(n)), budget)
        )
        return (owner, col_of_row, prices, budget), None

    eps_schedule = jnp.asarray(
        [1.0 / 4.0, 1.0 / 32.0, 1.0 / 256.0, 1.0 / 4096.0], jnp.float32
    ) * spread
    owner0 = jnp.full(n, -1, jnp.int32)
    col0 = jnp.full(n, -1, jnp.int32)
    prices0 = jnp.zeros(n, jnp.float32)
    (owner, col_of_row, prices, _), _ = jax.lax.scan(
        run_phase, (owner0, col0, prices0, jnp.int32(max_sweeps)), eps_schedule
    )
    # Budget exhausted mid-phase leaves rows unassigned: pair leftover rows
    # with unclaimed columns by rank (correctness backstop — with sane eps
    # schedules the loop converges long before the cap).
    unassigned = col_of_row < 0
    taken = jnp.zeros(n, bool).at[jnp.where(unassigned, 0, col_of_row)].set(
        ~unassigned, mode="drop"
    )
    # rank among unassigned rows <-> rank among free columns.
    row_rank = jnp.cumsum(unassigned.astype(jnp.int32)) - 1
    free_cols = jnp.where(~taken, jnp.arange(n, dtype=jnp.int32), n)
    free_sorted = jnp.sort(free_cols)  # free column ids first
    fallback = free_sorted[jnp.clip(row_rank, 0, n - 1)]
    col_of_row = jnp.where(unassigned, fallback, col_of_row)
    return jnp.arange(n, dtype=jnp.int32), col_of_row


@functools.partial(jax.jit, static_argnames=("max_sweeps",))
def gated_auction_match(
    cost: Array,
    row_valid: Array,
    col_valid: Array,
    threshold: float,
    max_sweeps: int = 128,
) -> Array:
    """Threshold-gated min-cost bipartite matching via auction with a null
    option — the tracker-association solver.

    Solves: match rows (tracks) to columns (detections), each at most once,
    minimizing total cost over matched pairs, where a pair may only match if
    ``cost < threshold`` (every row can instead take the null option).
    Returns ``col_of_row`` (R,) int32 with -1 = unmatched.

    Why not pad-to-square + full assignment (the reference's scipy shape,
    rcnn_tracker.py:132 + :136-147 threshold gate): constant pad blocks make
    rows indifferent between many columns, so auction bids degenerate to
    +eps price creep and the sweep count explodes (hundreds).  With the
    null option there are no pads: a bid consumes the bidder's full surplus
    over its second-best-or-null, so contested columns resolve in a couple
    of sweeps and the whole solve is tens of dense (R, D) passes.

    Semantics note: this optimizes the *gated* matching directly, whereas
    the reference optimizes the full assignment and then drops pairs over
    the threshold.  The two differ only when global assignment optimality
    routes a track through an above-threshold pair (which the reference
    then discards, losing a match this solver keeps) — a rare, noise-driven
    edge the tests treat as behavioral tolerance.

    Single phase, no eps-scaling: with a null option, absolute price levels
    carry meaning (a bid consumes the bidder's full surplus over its
    second-best-or-null), so re-running phases against retained prices
    makes every row indifferent and exit.  Bids jump by full surpluses
    anyway, so convergence doesn't need scaling; eps only breaks exact
    ties.  If near-tied crowding exhausts the sweep budget, leftover rows
    exit to null — for tracking, a missed match just re-enters as a new
    track next frame.
    """
    cost = cost.astype(jnp.float32)
    n_rows, n_cols = cost.shape
    neg_inf = jnp.float32(-1e30)
    benefit = jnp.where(row_valid[:, None] & col_valid[None, :], -cost, neg_inf)
    reserve = jnp.float32(-threshold)
    spread = jnp.maximum(jnp.max(jnp.where(benefit > neg_inf / 2, benefit, reserve)) - reserve, 1e-6)

    # col_of_row states: -2 = bidding, -1 = exited to null, >=0 = assigned.
    BIDDING, NULL = jnp.int32(-2), jnp.int32(-1)

    def sweep(state):
        col_of_row, owner, prices, eps, _ = state
        bidding = col_of_row == BIDDING
        values = benefit - prices[None, :]
        j_star = jnp.argmax(values, axis=1)
        v1 = jnp.max(values, axis=1)
        masked = values.at[jnp.arange(n_rows), j_star].set(neg_inf)
        v2 = jnp.maximum(jnp.max(masked, axis=1), reserve)
        exits = bidding & (v1 <= reserve)
        col_of_row = jnp.where(exits, NULL, col_of_row)
        bidders = bidding & ~exits
        bid = v1 - v2 + eps  # full surplus over second-best-or-null
        bids = jnp.where(
            bidders[:, None] & (jnp.arange(n_cols)[None, :] == j_star[:, None]),
            bid[:, None],
            neg_inf,
        )
        best_row = jnp.argmax(bids, axis=0)
        best_bid = jnp.max(bids, axis=0)
        got = best_bid > neg_inf / 2
        prices = jnp.where(got, prices + best_bid, prices)
        # Displace previous owners of rebid columns back to bidding.
        prev_owner = jnp.where(got, owner, -1)
        # Scatter True at real owners only (index n_rows drops): writing
        # `prev_owner >= 0` values directly would land False at index 0 for
        # every bid-less column, clobbering a genuine displacement there.
        displaced_mask = jnp.zeros(n_rows, bool).at[
            jnp.where(prev_owner >= 0, prev_owner, n_rows)
        ].set(True, mode="drop")
        col_of_row = jnp.where(displaced_mask, BIDDING, col_of_row)
        owner = jnp.where(got, best_row, owner)
        col_idx = jnp.arange(n_cols, dtype=jnp.int32)
        col_of_row = col_of_row.at[jnp.where(got, best_row, n_rows)].set(
            col_idx, mode="drop"
        )
        return col_of_row, owner, prices, eps, jnp.sum(bidding)

    eps = spread / 1024.0
    col0 = jnp.where(row_valid, BIDDING, NULL).astype(jnp.int32)

    def cond(s):
        return jnp.any(s[0][0] == BIDDING) & (s[1] > 0)

    def body(s):
        st, budget = s
        return sweep(st), budget - 1

    (col_of_row, _, _, _, _), _ = jax.lax.while_loop(
        cond,
        body,
        (
            (col0, jnp.full(n_cols, -1, jnp.int32), jnp.zeros(n_cols, jnp.float32),
             eps, jnp.int32(0)),
            jnp.int32(max_sweeps),
        ),
    )
    # Budget exhausted: any still-bidding rows exit to null.
    return jnp.where(col_of_row == BIDDING, NULL, col_of_row)


def pad_cost(cost: Array, row_valid: Array, col_valid: Array, pad_value: float = _BIG) -> Array:
    """Mask invalid rows/cols of a square-padded cost matrix with a large
    finite constant so real pairs are always preferred and the padded
    problem stays feasible."""
    c = jnp.where(row_valid[:, None] & col_valid[None, :], cost, pad_value)
    return jnp.where(jnp.isfinite(c), c, pad_value)
