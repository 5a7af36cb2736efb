"""Log-domain Sinkhorn normalization with static shapes and validity masks.

Reproduces the numerics the reference gets from ``pygmtools.sinkhorn``
(called at reference ``adapteacher/modeling/GModule/utils/sinkhorn.py:87``):

* temperature scaling ``log_s = s / tau``
* ``dummy_row`` padding: when a matrix has fewer valid rows than valid
  columns, virtual rows with log-value ``-100`` are introduced so the
  doubly-stochastic projection is over a square problem; they are dropped
  (zeroed) in the output
* ``max_iter`` alternating row / column ``logsumexp`` normalizations,
  starting with a row normalization (iteration 0 normalizes rows)
* output is ``exp(log_s)`` with invalid entries exactly 0

The TPU-first difference: instead of per-instance Python loops over ragged
matrices, everything is a fixed-shape batch ``(..., N1, N2)`` with per-instance
valid counts ``nrows``/``ncols``; the whole solve is one fused XLA loop
(`lax.fori_loop`), fully differentiable, and accumulates in float32 regardless
of input dtype (SURVEY.md section 7.3 item 7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30  # stand-in for -inf that keeps TPU arithmetic NaN-free
DUMMY_LOG_VALUE = -100.0  # pygmtools' fill value for dummy rows


def _masked_logsumexp(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """logsumexp that returns NEG_INF (not NaN) for all-masked slices.

    No branch may produce +/-inf even when discarded by the ``where``: under
    whole-program XLA fusion (jit of forward+backward+optimizer) the CPU
    backend reorders the dead branch into live arithmetic and a ``log(0)``
    -inf poisons the fused expression to NaN (observed with
    ``--xla_force_host_platform_device_count``).  Clamping the sum keeps every
    intermediate finite; the ``where`` still selects the sentinel.
    """
    m = jnp.max(x, axis=axis, keepdims=True)
    m_safe = jnp.where(m > NEG_INF / 2, m, 0.0)
    s = jnp.sum(jnp.exp(x - m_safe), axis=axis, keepdims=True)
    out = m_safe + jnp.log(jnp.maximum(s, 1e-38))
    return jnp.where(m > NEG_INF / 2, out, NEG_INF)


@functools.partial(
    jax.jit, static_argnames=("max_iter", "dummy_row", "unroll")
)
def sinkhorn(
    s: jnp.ndarray,
    nrows: jnp.ndarray | None = None,
    ncols: jnp.ndarray | None = None,
    *,
    tau: float | jnp.ndarray = 1.0,  # traced: solvers rescale it jointly with s
    max_iter: int = 10,
    dummy_row: bool = False,
    unroll: int = 1,
) -> jnp.ndarray:
    """Doubly-stochastic projection of ``s`` (``(..., N1, N2)``).

    ``nrows``/``ncols`` are integer arrays broadcastable to the batch shape
    giving the number of valid rows/columns per instance (defaults: all).
    Rows/columns beyond the valid counts come back as exact zeros.

    With ``dummy_row=True`` and ``nrows < ncols`` for an instance, rows
    ``[nrows, ncols)`` are treated as dummy rows (log value -100) during the
    solve, matching pygmtools; the physical row dimension ``N1`` must be
    >= the largest possible ``ncols``.  Callers must ensure ``nrows <= ncols``
    (transpose first otherwise; see :func:`sinkhorn_auto`).
    """
    batch_shape = s.shape[:-2]
    n1, n2 = s.shape[-2], s.shape[-1]
    orig_dtype = s.dtype
    s = s.astype(jnp.float32)

    if nrows is None:
        nrows = jnp.full(batch_shape, n1, dtype=jnp.int32)
    else:
        nrows = jnp.broadcast_to(jnp.asarray(nrows, jnp.int32), batch_shape)
    if ncols is None:
        ncols = jnp.full(batch_shape, n2, dtype=jnp.int32)
    else:
        ncols = jnp.broadcast_to(jnp.asarray(ncols, jnp.int32), batch_shape)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 1)
    # broadcast to batch
    nr = nrows[..., None, None]
    nc = ncols[..., None, None]

    valid_row = row_ids < nr
    valid_col = col_ids < nc
    real = valid_row & valid_col

    log_s = s / tau
    if dummy_row:
        # rows [nrows, ncols) become dummy rows with log value -100 in valid cols
        dummy = (row_ids >= nr) & (row_ids < nc) & valid_col
        eff_row = row_ids < jnp.maximum(nr, nc)
        log_s = jnp.where(real, log_s, jnp.where(dummy, DUMMY_LOG_VALUE, NEG_INF))
        live = eff_row & valid_col
    else:
        log_s = jnp.where(real, log_s, NEG_INF)
        live = real

    log_s = jnp.where(live, log_s, NEG_INF)

    def body(i, ls):
        def row_norm(ls):
            return ls - _masked_logsumexp(ls, axis=-1)

        def col_norm(ls):
            return ls - _masked_logsumexp(ls, axis=-2)

        ls = jax.lax.cond(i % 2 == 0, row_norm, col_norm, ls)
        return jnp.where(live, ls, NEG_INF)

    # `unroll` removes per-iteration loop overhead — matters inside the
    # latency-bound GA-GM while_loop where each solve is on tiny matrices.
    log_s = jax.lax.fori_loop(0, max_iter, body, log_s, unroll=unroll)

    out = jnp.exp(jnp.where(real, log_s, NEG_INF))
    return out.astype(orig_dtype)


@functools.partial(jax.jit, static_argnames=("tau", "max_iter"))
def sinkhorn_masked(
    s: jnp.ndarray,
    row_mask: jnp.ndarray,
    col_mask: jnp.ndarray | None = None,
    *,
    tau: float = 1.0,
    max_iter: int = 10,
) -> jnp.ndarray:
    """Sinkhorn over an explicit (possibly non-contiguous) validity mask.

    Needed by the universe learner, whose score matrix is a padded-block
    concatenation of per-graph rows (reference applies one global Sinkhorn to
    the ragged concatenation at ``multi_graph_matching.py:143``).  No dummy
    rows: rows and columns are alternately normalized over valid entries only
    (row pass first), 'invalid' entries come back as exact zeros.
    """
    n1, n2 = s.shape[-2], s.shape[-1]
    orig_dtype = s.dtype
    if col_mask is None:
        col_mask = jnp.ones(s.shape[:-2] + (n2,), dtype=bool)
    live = row_mask[..., :, None] & col_mask[..., None, :]
    log_s = jnp.where(live, s.astype(jnp.float32) / tau, NEG_INF)

    def body(i, ls):
        ls = jax.lax.cond(
            i % 2 == 0,
            lambda x: x - _masked_logsumexp(x, axis=-1),
            lambda x: x - _masked_logsumexp(x, axis=-2),
            ls,
        )
        return jnp.where(live, ls, NEG_INF)

    log_s = jax.lax.fori_loop(0, max_iter, body, log_s)
    return jnp.exp(jnp.where(live, log_s, NEG_INF)).astype(orig_dtype)


def sinkhorn_project(
    s: jnp.ndarray,
    nrows: jnp.ndarray | None = None,
    ncols: jnp.ndarray | None = None,
    *,
    tau: float = 1.0,
    max_iter: int = 10,
    unroll: int = 1,
) -> jnp.ndarray:
    """Orientation-robust doubly-stochastic projection on a rectangular
    physical shape ``(..., N1, N2)``.

    The reference always transposes so valid-rows <= valid-cols before a
    ``dummy_row`` solve (e.g. ``multi_graph_matching.py:519-522,330-338``).
    Inside one fixed-shape batch both orientations can occur, so both are
    solved — stacked into ONE batched solve (sequential depth of one solve,
    the TPU-relevant cost in latency-bound solver loops) — and selected per
    instance.
    """
    batch_shape = s.shape[:-2]
    n1, n2 = s.shape[-2], s.shape[-1]
    if nrows is None:
        nrows = jnp.full(batch_shape, n1, dtype=jnp.int32)
    if ncols is None:
        ncols = jnp.full(batch_shape, n2, dtype=jnp.int32)
    nrows = jnp.broadcast_to(jnp.asarray(nrows, jnp.int32), batch_shape)
    ncols = jnp.broadcast_to(jnp.asarray(ncols, jnp.int32), batch_shape)

    n = max(n1, n2)
    pad = [(0, 0)] * (s.ndim - 2) + [(0, n - n1), (0, n - n2)]
    sq = jnp.pad(s, pad)
    both = jnp.stack([sq, jnp.swapaxes(sq, -1, -2)], axis=0)
    rows_b = jnp.stack([nrows, ncols], axis=0)
    cols_b = jnp.stack([ncols, nrows], axis=0)
    solved = sinkhorn(both, rows_b, cols_b, tau=tau, max_iter=max_iter,
                      dummy_row=True, unroll=unroll)
    out = jnp.where(
        (nrows <= ncols)[..., None, None], solved[0], jnp.swapaxes(solved[1], -1, -2)
    )
    return out[..., :n1, :n2]


def gumbel_sinkhorn(
    s: jnp.ndarray,
    key,
    nrows: jnp.ndarray | None = None,
    ncols: jnp.ndarray | None = None,
    *,
    tau: float = 1.0,
    max_iter: int = 10,
    sample_num: int = 5,
    dummy_row: bool = False,
) -> jnp.ndarray:
    """Gumbel-perturbed Sinkhorn sampling (reference
    ``utils/sinkhorn.py:172-235`` ``GumbelSinkhorn``; unused in the active
    path, kept for capability parity).  Returns ``sample_num`` stacked
    doubly-stochastic samples along a new leading axis."""
    import jax as _jax

    def sample_one(k):
        g = -jnp.log(-jnp.log(_jax.random.uniform(k, s.shape) + 1e-20) + 1e-20)
        return sinkhorn(s + g, nrows, ncols, tau=tau, max_iter=max_iter,
                        dummy_row=dummy_row)

    keys = _jax.random.split(key, sample_num)
    return _jax.vmap(sample_one)(keys)


def sinkhorn_auto(
    s: jnp.ndarray,
    nrows: jnp.ndarray | None = None,
    ncols: jnp.ndarray | None = None,
    *,
    tau: float = 1.0,
    max_iter: int = 10,
) -> jnp.ndarray:
    """Orientation-robust Sinkhorn with dummy rows.

    The reference transposes any matrix with more valid rows than columns
    before the solve and transposes back after (e.g. reference
    ``multi_graph_matching.py:519-522``).  With mixed orientations inside one
    fixed-shape batch we solve both orientations and select per instance —
    the matrices here are tiny (tens of nodes), so this costs less than the
    data movement a gather/scatter reorganization would.
    """
    assert s.shape[-1] == s.shape[-2], "sinkhorn_auto requires square physical shape"
    batch_shape = s.shape[:-2]
    n = s.shape[-1]
    if nrows is None:
        nrows = jnp.full(batch_shape, n, dtype=jnp.int32)
    if ncols is None:
        ncols = jnp.full(batch_shape, n, dtype=jnp.int32)
    nrows = jnp.broadcast_to(jnp.asarray(nrows, jnp.int32), batch_shape)
    ncols = jnp.broadcast_to(jnp.asarray(ncols, jnp.int32), batch_shape)

    fwd = sinkhorn(s, nrows, ncols, tau=tau, max_iter=max_iter, dummy_row=True)
    bwd = sinkhorn(
        jnp.swapaxes(s, -1, -2), ncols, nrows, tau=tau, max_iter=max_iter, dummy_row=True
    )
    bwd = jnp.swapaxes(bwd, -1, -2)
    use_fwd = (nrows <= ncols)[..., None, None]
    return jnp.where(use_fwd, fwd, bwd)
