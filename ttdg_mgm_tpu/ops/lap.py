"""Linear assignment on device.

The reference discretizes doubly-stochastic matrices with scipy's
``linear_sum_assignment`` on the CPU (reference
``adapteacher/modeling/GModule/utils/hungarian.py:63``) — a device->host
round trip inside the hottest TTA loop (GA-GM final iterations, reference
``multi_graph_matching.py:327,368,385``).  Here the LAP runs *on device* as a
Jonker-Volgenant shortest-augmenting-path solve expressed with ``lax`` control
flow: the outer loop is sequential over rows, but every inner step is a
vectorized sweep over columns (VPU-friendly), and the whole solve is
``vmap``-ed over a batch of problems.  The matrices are tiny
(<= MAX_NODES x UNIV), so exactness costs almost nothing on device while the
reference pays a PCIe sync per call.

Semantics match the reference wrapper: ``hungarian(s, n1, n2)`` MAXIMIZES the
score over the valid ``n1 x n2`` sub-matrix and returns a 0/1 assignment
matrix of the full physical shape (zeros outside the valid region).
``n1 <= n2`` is required per instance (the reference guarantees row<=col at
every call site by transposing first).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.float32(1.0e30)


def _lap_single(cost: jnp.ndarray, n1: jnp.ndarray, n2: jnp.ndarray) -> jnp.ndarray:
    """Jonker-Volgenant minimization on one (NR, NC) cost matrix with n1/n2
    valid rows/cols.  Returns col4row (per-row assigned column, -1 invalid)."""
    nr, nc = cost.shape
    col_ids = jnp.arange(nc, dtype=jnp.int32)
    col_valid = col_ids < n2
    cost = jnp.where(col_valid[None, :], cost, _INF)

    u0 = jnp.zeros((nr,), jnp.float32)
    v0 = jnp.zeros((nc,), jnp.float32)
    p0 = jnp.full((nc,), -1, jnp.int32)  # p[j]: row assigned to column j

    def assign_row(i, carry):
        u, v, p = carry

        def do(carry):
            u, v, p = carry
            minv0 = jnp.full((nc,), _INF)
            way0 = jnp.full((nc,), -1, jnp.int32)  # predecessor used column (-1 = root row i)
            used0 = jnp.zeros((nc,), bool)

            # state: (u, v, minv, way, used, i0, j_prev, done, j_free, steps)
            # A legitimate search marks a fresh column per step, so it takes at
            # most nc steps; the cap guards the vmapped-cond case where this
            # (ultimately discarded) branch runs for a padded row with every
            # valid column already assigned and would otherwise never find a
            # free column.
            def cond(st):
                return ~st[7]

            def step(st):
                u, v, minv, way, used, i0, j_prev, _, _, steps = st
                cur = jnp.where(used, _INF, cost[i0] - u[i0] - v)
                better = cur < minv
                minv = jnp.where(better, cur, minv)
                way = jnp.where(better, j_prev, way)
                reach = jnp.where(used, _INF, minv)
                j1 = jnp.argmin(reach).astype(jnp.int32)
                delta = reach[j1]
                # potentials: +delta for row i and rows of used columns,
                # -delta for used columns, minv shrinks on the frontier
                used_row = jnp.any((p[None, :] == jnp.arange(nr)[:, None]) & used[None, :], axis=1)
                u = jnp.where(used_row, u + delta, u).at[i].add(delta)
                v = jnp.where(used, v - delta, v)
                minv = jnp.where(used, minv, minv - delta)
                used = used.at[j1].set(True)
                nxt = p[j1]
                done = (nxt < 0) | (steps + 1 >= nc)
                return (u, v, minv, way, used, jnp.where(done, i0, nxt), j1, done, j1, steps + 1)

            # rows past n1 start `done` (the vmapped `lax.cond` below lowers
            # to a select that runs this branch for every lane, so the guard
            # must live in the loop state, not in python control flow)
            st = (
                u, v, minv0, way0, used0, i,
                jnp.int32(-1), i >= n1, jnp.int32(-1), jnp.int32(0),
            )
            u, v, _, way, _, _, _, _, j_free, _ = jax.lax.while_loop(cond, step, st)

            # augment along predecessor chain ending at the root row i
            def aug_cond(st):
                _, j, done, steps = st
                return ~done

            def aug_step(st):
                p, j, _, steps = st
                jp = way[j]
                new_row = jnp.where(jp < 0, i, p[jnp.maximum(jp, 0)])
                p = p.at[j].set(new_row)
                return (p, jnp.maximum(jp, 0), (jp < 0) | (steps + 1 >= nc), steps + 1)

            p, _, _, _ = jax.lax.while_loop(
                aug_cond, aug_step, (p, j_free, j_free < 0, jnp.int32(0))
            )
            return (u, v, p)

        return jax.lax.cond(i < n1, do, lambda c: c, (u, v, p))

    # dynamic upper bound: under vmap this becomes a while_loop that stops
    # updating a lane's carry once its own n1 rows are assigned, so padded
    # rows cost nothing instead of running cap-limited garbage searches
    _, _, p = jax.lax.fori_loop(0, jnp.minimum(n1, nr), assign_row, (u0, v0, p0))

    col4row = jnp.full((nr,), -1, jnp.int32)
    col4row = col4row.at[jnp.where(p >= 0, p, nr)].set(col_ids, mode="drop")
    return jnp.where(jnp.arange(nr) < n1, col4row, -1)


@jax.jit
def hungarian(
    s: jnp.ndarray, n1: jnp.ndarray | None = None, n2: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Maximize ``sum(s * X)`` over 0/1 assignment matrices X (see module doc)."""
    batch_shape = s.shape[:-2]
    nr, nc = s.shape[-2], s.shape[-1]
    if n1 is None:
        n1 = jnp.full(batch_shape, nr, jnp.int32)
    else:
        n1 = jnp.broadcast_to(jnp.asarray(n1, jnp.int32), batch_shape)
    if n2 is None:
        n2 = jnp.full(batch_shape, nc, jnp.int32)
    else:
        n2 = jnp.broadcast_to(jnp.asarray(n2, jnp.int32), batch_shape)

    flat_s = (-s.astype(jnp.float32)).reshape((-1, nr, nc))  # maximize -> minimize
    col4row = jax.vmap(_lap_single)(flat_s, n1.reshape(-1), n2.reshape(-1))
    perm = (col4row[..., None] == jnp.arange(nc)[None, None, :]) & (col4row[..., None] >= 0)
    return perm.astype(jnp.float32).reshape(s.shape)


def hungarian_auto(
    s: jnp.ndarray, n1: jnp.ndarray | None = None, n2: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Orientation-robust maximization LAP: instances with ``n1 > n2`` are
    solved transposed (assigning every *column*), matching scipy's rectangular
    behavior that the reference relies on (``utils/hungarian.py:63``)."""
    batch_shape = s.shape[:-2]
    nr, nc = s.shape[-2], s.shape[-1]
    if n1 is None:
        n1 = jnp.full(batch_shape, nr, jnp.int32)
    if n2 is None:
        n2 = jnp.full(batch_shape, nc, jnp.int32)
    n1 = jnp.broadcast_to(jnp.asarray(n1, jnp.int32), batch_shape)
    n2 = jnp.broadcast_to(jnp.asarray(n2, jnp.int32), batch_shape)
    n = max(nr, nc)
    pad = [(0, 0)] * (s.ndim - 2) + [(0, n - nr), (0, n - nc)]
    sq = jnp.pad(s, pad)

    def fwd(_):
        return hungarian(sq, n1, n2)

    def bwd(_):
        return jnp.swapaxes(hungarian(jnp.swapaxes(sq, -1, -2), n2, n1), -1, -2)

    def mixed(_):
        return jnp.where((n1 <= n2)[..., None, None], fwd(None), bwd(None))

    # orientation is almost always uniform across the batch (GA-GM projects
    # every graph onto the same universe size), so dispatch on a SCALAR
    # predicate: lax.cond executes one branch, halving the sequential LAP
    # work vs solving both orientations and selecting.
    out = jax.lax.cond(
        jnp.all(n1 <= n2),
        fwd,
        lambda _: jax.lax.cond(jnp.all(n1 > n2), bwd, mixed, None),
        None,
    )
    return out[..., :nr, :nc]


def hungarian_scipy(s, n1=None, n2=None):
    """Host-side exact reference (scipy), for tests and offline tools."""
    import scipy.optimize as opt

    s = np.asarray(s)
    squeeze = s.ndim == 2
    if squeeze:
        s = s[None]
    b, nr, nc = s.shape
    n1 = [nr] * b if n1 is None else np.asarray(n1).reshape(-1)
    n2 = [nc] * b if n2 is None else np.asarray(n2).reshape(-1)
    out = np.zeros_like(s, dtype=np.float32)
    for i in range(b):
        r, c = opt.linear_sum_assignment(-s[i, : n1[i], : n2[i]])
        out[i, r, c] = 1.0
    return out[0] if squeeze else out
