"""Unsupervised multi-graph matching for test-time adaptation (the TTA loss).

Capability of reference ``multi_graph_matching.py:451-633`` (``MGM3_unsup``):
per-graph self-attention adjacency, all-pairs learned affinity projected to
doubly-stochastic matrices by Sinkhorn, a Graduated-Assignment multi-graph
solve seeded by the frozen universe, and a BCE-focal permutation-consistency
loss between the pairwise Sinkhorn matrices and the ``U_i U_j^T`` pseudo
ground truth.

TPU-first re-design versus the reference's per-pair Python loops:

* the ``O(G^2)`` pairwise affinities are ONE batched call over a
  ``(G, G, M, M)`` tensor (two matmuls + broadcast MLP, see
  ``graph.affinity``), Sinkhorn-projected as one fused batched solve;
* the reference computes only the lower triangle and mirrors transposes
  (``:507-525``); here the full pair grid is computed and the lower triangle
  selected, so the joint ``W_ds`` is bit-identical but with zero host control
  flow;
* GA-GM runs as a single on-device ``while_loop`` program under
  ``stop_gradient`` (see ``graph.solvers``) — gradients reach the backbone
  only through the Sinkhorn'd affinities, the reference's effective gradient
  path (its final Hungarian projection is CPU scipy and severs autograd);
* the intra-class pair collection (``:594-633``) with the default single
  cluster reduces to *all* unordered pairs — a static set, so the loss is a
  masked batched BCE-focal over the ``(G, G, M, M)`` grid.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttdg_mgm_tpu.graph.affinity import Affinity
from ttdg_mgm_tpu.graph.attention import MultiHeadAttention
from ttdg_mgm_tpu.graph.losses import BCEFocalLoss
from ttdg_mgm_tpu.graph.solvers import ga_gm
from ttdg_mgm_tpu.ops.sinkhorn import sinkhorn_project


class MGM3Unsup(nn.Module):
    """``__call__(nodes (G, M, D), labels (G, M), mask (G, M), U (univ, D))``
    -> scalar TTA loss.  ``G`` must be >= 2 (the reference returns ``None``
    for fewer graphs, reference ``:489-490``; callers gate on batch size)."""

    num_classes: int = 2
    univ_size: int = 32
    dim: int = 256
    quad_weight: float = 0.5
    cluster_quad_weight: float = 1.0
    sk_tau: float = 0.05
    sk_iter: int = 20
    mgm_iter: int = 200
    num_clusters: int = 1  # >1 enables the MGM-Mixture clustering outer step
    use_fused_gagm: bool | None = None  # None = auto (fused Pallas on TPU)
    # iteration cap of the terminal exact-LAP Hungarian round (the
    # reference's 200-iteration hungarian-projector finale,
    # multi_graph_matching.py:374-387).  Since round 4 the finale runs
    # INSIDE the fused VMEM kernel (in-kernel Jonker-Volgenant LAP,
    # ops/pallas/gagm_pallas.py), so the reference's full budget costs ~2 ms
    # instead of ~2.7 ms/iteration through XLA while_loops — the default is
    # reference-faithful.  cfg key: MODEL.GRAPH.LAP_POLISH_ITERS.
    lap_polish_iters: int = 200

    def setup(self):
        self.intra_domain_graph = MultiHeadAttention(self.dim, 1, dropout=0.1)
        self.node_affinity = Affinity(self.dim)

    def build_problem(self, nodes, labels, mask, U):
        """The GA-GM problem tensors from raw nodes: intra-graph adjacency
        ``A (T, T)``, joint pairwise doubly-stochastic ``Wds (T, T)`` (and its
        ``(G, G, M, M)`` block view + pair validity, the loss inputs), seed
        ``U0 (T, univ)``, valid counts ``ms (G,)``.  Exposed as a module
        method so profiling/measurement tools can capture the REAL solver
        inputs of a live step (scripts/measure_finale.py)."""
        G, M, D = nodes.shape
        T = G * M
        ms = jnp.sum(mask.astype(jnp.int32), axis=-1)

        # --- intra-graph adjacency (reference :496-502), diagonal zeroed ---
        _, adj = self.intra_domain_graph(nodes, mask)
        eye_m = jnp.eye(M, dtype=bool)
        adj = jnp.where(eye_m[None], 0.0, adj)
        A = jnp.zeros((T, T), jnp.float32)

        def place(a, args):
            off, blk = args
            return jax.lax.dynamic_update_slice(a, blk.astype(jnp.float32), (off, off)), None

        A, _ = jax.lax.scan(place, A, (jnp.arange(G) * M, adj))

        # --- all-pairs affinity -> pairwise doubly-stochastic Wds (:504-525) ---
        # (G, 1, M, D) x (1, G, M, D) -> (G, G, M, M); pair (i, j) scores
        # affinity(nodes_i, nodes_j).
        aff = self.node_affinity(
            jnp.broadcast_to(nodes[:, None], (G, G, M, D)),
            jnp.broadcast_to(nodes[None, :], (G, G, M, D)),
        )
        ds = sinkhorn_project(
            aff,
            jnp.broadcast_to(ms[:, None], (G, G)),
            jnp.broadcast_to(ms[None, :], (G, G)),
            tau=self.sk_tau,
            max_iter=self.sk_iter,
        )
        pair_valid = mask[:, None, :, None] & mask[None, :, None, :]
        ds = jnp.where(pair_valid, ds, 0.0)
        # the reference computes pair (i, j) only for i >= j and mirrors the
        # transpose into (j, i) (:519-525); select accordingly so W_ds matches.
        lower = (
            jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
            >= jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
        )[:, :, None, None]
        ds_sym = jnp.where(lower, ds, jnp.swapaxes(ds, -1, -2).transpose(1, 0, 2, 3))
        # assemble the (T, T) joint matrix from (G, G, M, M) blocks
        Wds = ds_sym.transpose(0, 2, 1, 3).reshape(T, T)

        # --- GA-GM seed from the frozen universe (:527-533) ---
        U0 = jnp.einsum("gmd,ud->gmu", nodes, U)
        U0 = jnp.where(mask[..., None], U0, 0.0).reshape(T, self.univ_size)
        return A, Wds, ds_sym, pair_valid, U0, ms

    def __call__(self, nodes, labels, mask, U):
        G, M, D = nodes.shape
        T = G * M
        A, Wds, ds_sym, pair_valid, U0, ms = self.build_problem(
            nodes, labels, mask, U)
        if self.num_clusters > 1:
            from ttdg_mgm_tpu.graph.solvers import ga_gm_mixture

            U_b, clusters = ga_gm_mixture(
                A, Wds, U0, ms, self.univ_size, self.num_clusters,
                quad_weight=self.quad_weight,
                cluster_quad_weight=self.cluster_quad_weight,
                mgm_iter=self.mgm_iter, sk_iter=self.sk_iter,
            )
            same_cluster = clusters[:, None] == clusters[None, :]
        else:
            from ttdg_mgm_tpu.utils.platform import is_tpu_backend

            fused = self.use_fused_gagm
            if fused is None:
                import os

                # TTDG_FUSED_GAGM=1 forces the fused kernel on off-TPU
                # backends (interpret mode) — the mesh-safety tests run the
                # production kernel path on the 8-device CPU mesh
                env = os.environ.get("TTDG_FUSED_GAGM")
                fused = (env not in ("0", "false", "False")
                         if env is not None else is_tpu_backend())
            solver_kw = dict(
                quad_weight=self.quad_weight, mgm_iter=self.mgm_iter,
                sk_iter=self.sk_iter, sk_tau0=0.1, sk_gamma=0.5,
                min_tau=1e-2, tol=1e-3,
            )
            if fused:
                from ttdg_mgm_tpu.ops.pallas.gagm_pallas import ga_gm_fused

                # The VMEM kernel runs the annealed Sinkhorn rounds AND the
                # reference's terminal Hungarian round with the EXACT
                # in-kernel Jonker-Volgenant LAP (the reference's
                # 200-iteration scipy-Hungarian loop,
                # multi_graph_matching.py:374-387) — the full finale costs
                # ~2 ms in VMEM vs ~2.7 ms/iteration when the same solve ran
                # through XLA while_loops (round-3's external 8-iteration
                # polish was 22 ms of the TTA step).
                U_b = ga_gm_fused(
                    A, Wds, U0, ms, self.univ_size,
                    interpret=not is_tpu_backend(),
                    final_hungarian=False, exact_lap_finale=True,
                    lap_iter_cap=self.lap_polish_iters, **solver_kw,
                )
            else:
                U_b = ga_gm(A, Wds, U0, ms, self.univ_size, **solver_kw)
            same_cluster = jnp.ones((G, G), bool)
        Ug = U_b.reshape(G, M, self.univ_size)

        # --- permutation-consistency loss over all unordered pairs (:543-569) ---
        gt = jnp.einsum("imu,jnu->ijmn", Ug, Ug)  # U_i U_j^T pseudo-GT
        gt = jax.lax.stop_gradient(jnp.clip(gt, 0.0, 1.0))
        pair_sel = (
            jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
        ) & same_cluster  # intra-cluster pairs only (:607-613)
        focal = BCEFocalLoss()
        # ds_sym[i, j] IS the (graph-i rows, graph-j cols) block for every
        # (i, j) by construction, which is exactly the ``s`` the reference
        # collects per intra-class pair (:615-627).
        losses = jax.vmap(jax.vmap(focal))(ds_sym, gt, pair_valid)
        n_pairs = jnp.maximum(jnp.sum(pair_sel.astype(jnp.float32)), 1.0)
        return jnp.sum(jnp.where(pair_sel, losses, 0.0)) / n_pairs
