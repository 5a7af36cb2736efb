"""Multi-graph-matching solvers: HiPPI and Graduated-Assignment (GA-GM).

Capability of reference ``adapteacher/modeling/GModule/multi_graph_matching.py``
``HiPPI`` (``:392-449``) and ``GA_GM`` (``:191-389``), re-designed TPU-first:

* **Padded-block layout.** The joint matrices over ``G`` graphs with at most
  ``M`` nodes each are ``(G*M, G*M)`` / ``(G*M, U)`` with each graph's valid
  nodes compacted to the front of its block; invalid rows/columns are exact
  zeros, so the power iterations need no masking beyond the projections.
* **``lax.while_loop`` instead of Python ``while``/``break``.**  The whole
  solve is one XLA program; convergence is a loop-carried predicate.
* **No gradients.**  The reference detaches ``W`` on entry (``:225``) and its
  final Hungarian projection goes through scipy/NumPy, which severs autograd
  anyway, so both solvers run under ``stop_gradient`` here; gradients flow
  through the *inputs* of the matching losses (Sinkhorn'd affinities), exactly
  as in the reference's effective compute graph.
* **On-device discretization.**  The per-graph Hungarian projections that the
  reference bounces to CPU scipy (``:327,368,385``) run on device
  (``ops.lap.hungarian_auto``), eliminating a host round-trip per GA
  iteration from the hottest TTA loop (SURVEY.md section 3.1).

The spectral-clustering outer loop (MGM-Mixture, reference ``:246-296``) only
runs for ``num_clusters > 1``; the flagship TTA path calls with the default
single cluster (reference ``:533``), which is the path implemented as the hot
jitted program.  A multi-cluster variant is provided for capability parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ttdg_mgm_tpu.ops.lap import hungarian_auto
from ttdg_mgm_tpu.ops.sinkhorn import sinkhorn_project


def _fro(x):
    return jnp.sqrt(jnp.sum(jnp.square(x)))


def _mutual_argmax(X, ms, n_univ):
    """Round a near-assignment matrix to a hard partial permutation: keep
    (i, j) iff j is row-i's argmax AND i is column-j's argmax.

    This is the TPU-first discretization (SURVEY.md section 7.1): the exact
    Jonker-Volgenant LAP is thousands of *sequential* tiny steps per graph —
    latency-crippling inside the GA while_loop — while after a sharp Sinkhorn
    the matrix is already near-permutation, where mutual-argmax equals the
    LAP except on ties/conflicts (which then resolve over subsequent GA
    iterations).  ``ops.lap.hungarian`` remains available for exactness.
    """
    G, M, U = X.shape
    row_best = jnp.argmax(X, axis=-1)  # (G, M)
    col_best = jnp.argmax(X, axis=-2)  # (G, U)
    cols = jax.lax.broadcasted_iota(jnp.int32, (G, M, U), 2)
    rows = jax.lax.broadcasted_iota(jnp.int32, (G, M, U), 1)
    one = (cols == row_best[..., None]) & (rows == col_best[:, None, :])
    nonzero = jnp.max(X, axis=-1, keepdims=True) > 0
    return (one & nonzero).astype(X.dtype)


def _project_blocks(V, ms, n_univ, *, tau, sk_iter, use_hungarian,
                    exact_hungarian: bool = False):
    """Project each graph's (M, U) block of ``V`` (G, M, U) to a
    doubly-stochastic / permutation matrix over its valid ``ms`` rows."""
    if use_hungarian and exact_hungarian:
        out = hungarian_auto(V, ms, jnp.full_like(ms, n_univ))
    else:
        # fully unrolled: inside the GA while_loop the solve is latency-bound
        out = sinkhorn_project(V, ms, jnp.full_like(ms, n_univ), tau=tau,
                               max_iter=sk_iter, unroll=sk_iter)
        if use_hungarian:
            out = _mutual_argmax(out, ms, n_univ)
    m = V.shape[-2]
    row_valid = jax.lax.broadcasted_iota(jnp.int32, (V.shape[0], m), 1) < ms[:, None]
    return jnp.where(row_valid[..., None], out, 0.0)


@functools.partial(
    jax.jit, static_argnames=("n_univ", "max_iter", "sk_iter", "sk_tau", "tol")
)
def hippi(W, U0, ms, n_univ: int, *, max_iter: int = 50, sk_iter: int = 20,
          sk_tau: float = 1.0 / 200.0, tol: float = 1e-5):
    """Higher-order Projected Power Iteration (ICCV'19).

    W: ``(G*M, G*M)`` joint similarity; U0: ``(G*M, U)``; ms: ``(G,)`` valid
    node counts (each graph's block padded to M rows).  Returns ``(G*M, U)``.
    Iteration: ``V = (WU) U^T (WU)``, per-graph Sinkhorn projection, until
    ``||U - U_last|| < tol`` (reference ``multi_graph_matching.py:414-449``).
    """
    W = jax.lax.stop_gradient(W).astype(jnp.float32)
    U0 = jax.lax.stop_gradient(U0).astype(jnp.float32)
    G = ms.shape[0]
    T = W.shape[0]
    M = T // G

    def cond(state):
        i, U, diff = state
        return (i < max_iter) & (diff >= tol)

    def body(state):
        i, U, _ = state
        WU = W @ U
        V = WU @ (U.T @ WU)
        # float32 overflow guard with EXACT semantics: the Sinkhorn result
        # depends only on V/tau, so dividing both V and tau by the same c is
        # the identity.  c > 1 only when V nears the float32 ceiling (the
        # universe path's 1e8 adjacency scale, cubed); normal-scale problems
        # project the raw V at the raw tau, bit-comparable to the
        # reference's torch path (multi_graph_matching.py:420-435) —
        # torch-parity-tested in tests/test_torch_parity.py.
        c = jnp.maximum(jnp.max(jnp.abs(V)) / 1e30, 1.0)
        U_new = _project_blocks(
            (V / c).reshape(G, M, n_univ), ms, n_univ, tau=sk_tau / c,
            sk_iter=sk_iter, use_hungarian=False,
        ).reshape(T, n_univ)
        return i + 1, U_new, _fro(U_new - U)

    _, U, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), U0, jnp.float32(1e30)))
    return U


def _gagm_round(A, W, U0, ms, n_univ, cluster_weight, *, tau, sk_iter, max_iter,
                tol, quad_weight, use_hungarian, num_graphs, M,
                exact_hungarian: bool = False):
    """One projector round of the GA power iteration
    (reference ``multi_graph_matching.py:300-389`` inner ``for`` loop)."""
    T = num_graphs * M

    def power_step(U):
        UUt = U @ U.T
        V = (A @ ((UUt * cluster_weight) @ A)) @ U * (quad_weight * 2.0) + (
            W * cluster_weight
        ) @ U
        V = V / num_graphs
        # exact-rescale overflow guard (see hippi): identity unless V nears
        # the float32 ceiling
        c = jnp.maximum(jnp.max(jnp.abs(V)) / 1e30, 1.0)
        U_new = _project_blocks(
            (V / c).reshape(num_graphs, M, n_univ), ms, n_univ, tau=tau / c,
            sk_iter=sk_iter, use_hungarian=use_hungarian,
            exact_hungarian=exact_hungarian,
        ).reshape(T, n_univ)
        if num_graphs == 2:
            # reference pins graph 0 to identity in the 2-graph case (:358-359)
            eye = (
                jax.lax.broadcasted_iota(jnp.int32, (M, n_univ), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (M, n_univ), 1)
            ).astype(U_new.dtype)
            row_valid = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) < ms[0]
            U_new = U_new.at[:M].set(jnp.where(row_valid, eye, 0.0))
        return U_new

    def cond(state):
        i, U, lastU, lastU2, done = state
        return (i < max_iter) & (~done)

    def body(state):
        i, U, lastU, lastU2, _ = state
        U_new = power_step(U)
        done = (_fro(U_new - U) < tol) | (_fro(U_new - lastU) == 0.0)
        return i + 1, U_new, U, lastU, done

    init = (jnp.int32(0), U0, jnp.zeros_like(U0), jnp.zeros_like(U0), jnp.array(False))
    _, U, _, _, _ = jax.lax.while_loop(cond, body, init)
    return U


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_univ", "quad_weight", "mgm_iter", "sk_iter", "sk_tau0", "sk_gamma",
        "min_tau", "tol", "hung_iter_cap", "final_hungarian",
    ),
)
def ga_gm(A, W, U0, ms, n_univ: int, *, quad_weight: float = 1.0,
          mgm_iter: int = 200, sk_iter: int = 20, sk_tau0: float = 0.1,
          sk_gamma: float = 0.5, min_tau: float = 1e-2, tol: float = 1e-3,
          hung_iter_cap: int = 200, final_hungarian: bool = True):
    """Graduated-Assignment multi-graph matching, single-cluster path.

    A: ``(G*M, G*M)`` block-diagonal intra-graph adjacency; W: ``(G*M, G*M)``
    joint pairwise doubly-stochastic matrix; U0: ``(G*M, U)`` init; ms: ``(G,)``.

    Control flow mirrors reference ``gagm`` (``:300-389``): rounds of the
    power iteration with Sinkhorn projection at annealed temperature
    (tau0, tau0*gamma, ... down to min_tau), then one final round with
    Hungarian projection.  The tau schedule is static so the rounds unroll
    into one XLA program with one ``while_loop`` each.
    """
    A = jax.lax.stop_gradient(A).astype(jnp.float32)
    W = jax.lax.stop_gradient(W).astype(jnp.float32)
    U = jax.lax.stop_gradient(U0).astype(jnp.float32)
    G = ms.shape[0]
    M = A.shape[0] // G
    ones = jnp.ones_like(W)

    taus = []
    t = sk_tau0
    while True:
        taus.append(t)
        if t > min_tau:
            t *= sk_gamma
        else:
            break

    kw = dict(quad_weight=quad_weight, sk_iter=sk_iter, max_iter=mgm_iter, tol=tol,
              num_graphs=G, M=M)
    for tau in taus:
        U = _gagm_round(A, W, U, ms, n_univ, ones, tau=tau, use_hungarian=False, **kw)
    if final_hungarian:
        # final hungarian round: the EXACT on-device JV-LAP, matching the
        # reference's scipy Hungarian projection (:368,385).  The iteration
        # budget must MATCH the reference's (200): on degenerate problems the
        # hard-projection fixed point is chaotic and never converges, and
        # parity then means cutting the (deterministic) orbit at the same
        # iteration — measured in tests/test_torch_parity.py.  hung_iter_cap
        # is a speed knob for callers that can trade that tail away.
        U = _gagm_round(A, W, U, ms, n_univ, ones, tau=taus[-1],
                        use_hungarian=True, exact_hungarian=True,
                        **{**kw, "max_iter": hung_iter_cap})
    return U


@functools.partial(
    jax.jit,
    static_argnames=("n_univ", "quad_weight", "mgm_iter", "sk_iter", "tau",
                     "tol"),
)
def final_hungarian_round(A, W, U, ms, n_univ: int, *, quad_weight: float = 1.0,
                          mgm_iter: int = 200, sk_iter: int = 20,
                          tau: float = 1e-2, tol: float = 1e-3):
    """The GA solve's terminal Hungarian round (reference ``gagm`` with
    ``projector='hungarian'``, ``:374-376``) with the EXACT on-device JV-LAP
    projection — composed after ``ops.pallas.ga_gm_fused(...,
    final_hungarian=False)`` so the VMEM kernel does the long annealed
    Sinkhorn rounds and this short round discretizes reference-faithfully."""
    A = jax.lax.stop_gradient(A).astype(jnp.float32)
    W = jax.lax.stop_gradient(W).astype(jnp.float32)
    U = jax.lax.stop_gradient(U).astype(jnp.float32)
    G = ms.shape[0]
    M = A.shape[0] // G
    return _gagm_round(
        A, W, U, ms, n_univ, jnp.ones_like(W), tau=tau, sk_iter=sk_iter,
        max_iter=mgm_iter, tol=tol, quad_weight=quad_weight,
        use_hungarian=True, exact_hungarian=True, num_graphs=G, M=M,
    )


def _cluster_affinity(A, W, U, ms, G, M, *, quad_weight: float = 1.0,
                      scale: float = 1.0):
    """Pairwise graph-affinity matrix Alpha (reference
    ``multi_graph_matching.py:252-271``):
    ``Alpha_ij = sum(W_ij * X_ij) + exp(-||X_ij^T A_i X_ij - A_j|| / scale) * qw``
    with ``X_ij = U_i U_j^T``; diagonal zero."""
    Ug = U.reshape(G, M, -1)
    X = jnp.einsum("imu,jnu->ijmn", Ug, Ug)  # (G, G, M, M)
    Wb = W.reshape(G, M, G, M).transpose(0, 2, 1, 3)
    term1 = jnp.sum(Wb * X, axis=(-2, -1))
    Ab = jnp.stack([jax.lax.dynamic_slice(A, (g * M, g * M), (M, M))
                    for g in range(G)])
    # X_ij^T A_i X_ij: (G, G, M, M)
    XtA = jnp.einsum("ijmn,imk->ijnk", X, Ab)  # X^T A_i
    quad = jnp.einsum("ijnk,ijkl->ijnl", XtA, X)
    diff = quad - Ab[None, :]
    term2 = jnp.exp(-jnp.sqrt(jnp.sum(jnp.square(diff), axis=(-2, -1)) + 1e-20)
                    / scale) * quad_weight
    alpha = term1 + term2
    return jnp.where(jnp.eye(G, dtype=bool), 0.0, alpha)


def ga_gm_mixture(A, W, U0, ms, n_univ: int, num_clusters: int, *,
                  quad_weight: float = 1.0, cluster_quad_weight: float = 1.0,
                  mgm_iter: int = 200, sk_iter: int = 20, sk_tau0: float = 0.1,
                  sk_gamma: float = 0.5, min_tau: float = 1e-2,
                  tol: float = 1e-3):
    """MGM-Mixture: GA-GM with a spectral-clustering outer step (reference
    ``GA_GM.forward`` for ``num_clusters > 1``, ``:243-298``).

    Control flow mirrors the reference's instantiation: the ``zip`` over the
    per-stage config lists truncates to ONE stage with ``beta = 1`` (cluster
    weights degenerate to all-ones) and ``if beta == 1: break`` ends the
    cluster loop after the first iteration — so the solve is: initial GA
    rounds without the final Hungarian switch, graph-affinity Alpha, spectral
    clustering, one more GA pass, returning ``(U, clusters)``.
    """
    from ttdg_mgm_tpu.graph.spectral import spectral_clustering

    A = jax.lax.stop_gradient(A).astype(jnp.float32)
    W = jax.lax.stop_gradient(W).astype(jnp.float32)
    U = jax.lax.stop_gradient(U0).astype(jnp.float32)
    G = ms.shape[0]
    M = A.shape[0] // G
    ones = jnp.ones_like(W)

    taus = []
    t = sk_tau0
    while True:
        taus.append(t)
        if t > min_tau:
            t *= sk_gamma
        else:
            break
    kw = dict(quad_weight=quad_weight, sk_iter=sk_iter, max_iter=mgm_iter,
              tol=tol, num_graphs=G, M=M)

    def run_rounds(U):
        for tau in taus:
            U = _gagm_round(A, W, U, ms, n_univ, ones, tau=tau,
                            use_hungarian=False, **kw)
        # hung_iter=False path: exact-LAP discretization of the CURRENT U
        # (reference ``[hungarian(_) for _ in U_list]``, :368-371)
        return _project_blocks(
            U.reshape(G, M, n_univ), ms, n_univ, tau=taus[-1], sk_iter=sk_iter,
            use_hungarian=True, exact_hungarian=True,
        ).reshape(G * M, n_univ)

    U = run_rounds(U)
    alpha = _cluster_affinity(A, W, U, ms, G, M, quad_weight=cluster_quad_weight)
    clusters = spectral_clustering(alpha, num_clusters, normalized=True)
    U = run_rounds(U)
    return U, clusters
