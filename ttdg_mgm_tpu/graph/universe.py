"""Supervised universe learning (source-training matching loss).

Capability of reference ``multi_graph_matching.py:77-188`` (``G_Universe`` +
``U_sup``): a learnable universe matrix ``U in R^{univ x dim}`` is matched
against per-image graph nodes; the loss pulls the Sinkhorn-normalized
node-to-universe scores toward the HiPPI fixed point.

Padded-block layout: nodes ``(G, M, D)`` with validity compacted to the front
of each graph's row block; all reference ragged concatenations become
reshapes of ``(G, M, ...)`` to ``(G*M, ...)``.

Gradient semantics match the reference exactly: the HiPPI target is detached
(reference ``:157``); gradients flow through the attention + score path and
into the universe parameter via the Frobenius regularizer.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttdg_mgm_tpu.graph.attention import MultiHeadAttention
from ttdg_mgm_tpu.graph.solvers import hippi
from ttdg_mgm_tpu.ops.sinkhorn import sinkhorn_masked


class GUniverse(nn.Module):
    """Node-set self-attention -> (node-to-universe scores, weighted adjacency).

    Mirrors reference ``G_Universe`` (``multi_graph_matching.py:77-116``),
    including its ``cos_similarity`` quirk: the reference computes
    ``1 - sum(n*n)/||n||^2`` per node, which is identically zero, so the
    adjacency is the attention matrix scaled by ``1/(0 + 1e-8) = 1e8``.
    The scale is applied as the explicit constant rather than via the
    ``x/x`` expression: under whole-program XLA fusion the division is
    rewritten to ``x * (1/x)`` which can land one ulp above 1, making
    ``d + 1e-8`` exactly zero and the quirk an inf factory (observed on
    XLA:CPU with ``--xla_force_host_platform_device_count``).  The constant
    is the quirk's only effect, and it cancels inside the downstream
    log-domain Sinkhorn projections anyway (see ``solvers.hippi``).
    """

    dim: int = 256
    univ_size: int = 32

    @nn.compact
    def __call__(self, nodes, mask, U):
        node, edge = MultiHeadAttention(self.dim, 1, dropout=0.1, name="g_gene")(
            nodes, mask
        )
        d_inv = 1.0e8  # == 1 / (cos_similarity quirk + 1e-8), see docstring
        edge_d = edge * d_inv
        scores = jnp.einsum("...md,ud->...mu", node, U)
        if mask is not None:
            scores = jnp.where(mask[..., None], scores, 0.0)
            edge_d = jnp.where(mask[..., None, :] & mask[..., :, None], edge_d, 0.0)
        return scores, edge_d


def _one_hot_labels(labels, mask, num_classes):
    """labels are class+1 (0 = invalid); invalid rows give all-zero one-hots
    (reference ``one_hot`` at ``multi_graph_matching.py:164-165``)."""
    oh = jax.nn.one_hot(labels - 1, num_classes, dtype=jnp.float32)
    return jnp.where((mask & (labels > 0))[..., None], oh, 0.0)


class USup(nn.Module):
    """Supervised universe matching loss (reference ``U_sup``, ``:119-188``).

    ``__call__(nodes (G, M, D), labels (G, M), mask (G, M)) -> scalar loss``.
    """

    num_classes: int = 2
    univ_size: int = 32
    dim: int = 256
    sk_tau: float = 0.05
    sk_iter: int = 20
    hippi_iters: int = 50
    loss_w: float = 0.1
    loss_lam: float = 1e-4

    @nn.compact
    def __call__(self, nodes, labels, mask, U=None):
        """``U`` is the learnable universe matrix ``(univ_size, dim)``; when
        ``None`` the module owns it as a param (standalone use), otherwise the
        caller passes it in (the meta-arch hoists it so the TTA matcher can
        read the same frozen matrix, reference ``rcnn.py:353``)."""
        G, M, D = nodes.shape
        T = G * M
        if U is None:
            U = self.param(
                "U",
                lambda key, shape: jax.random.normal(key, shape) + 1.0 / self.univ_size,
                (self.univ_size, self.dim),
            )
        U_param = U

        scores, edges = GUniverse(self.dim, self.univ_size, name="Net_U")(
            nodes, mask, U_param
        )

        # one global Sinkhorn over the concatenated (G*M, univ) score matrix
        # (reference :143) — rows are the non-contiguous union of valid nodes.
        flat_scores = scores.reshape(T, self.univ_size)
        row_mask = mask.reshape(T)
        U_ds = sinkhorn_masked(
            flat_scores, row_mask, tau=self.sk_tau, max_iter=self.sk_iter
        )

        # block-diagonal adjacency (reference :144) — NOT diagonal-zeroed here.
        A = jnp.zeros((T, T), jnp.float32)
        idx = jnp.arange(G) * M
        # scatter each (M, M) block onto the diagonal via dynamic_update_slice scan
        def place(a, args):
            off, blk = args
            return jax.lax.dynamic_update_slice(a, blk.astype(jnp.float32), (off, off)), None

        A, _ = jax.lax.scan(place, A, (idx, edges))

        # label-block matrix W (reference :147-152) and A_ = W^T A W (:153)
        oh = _one_hot_labels(labels, mask, self.num_classes).reshape(T, self.num_classes)
        Wlbl = oh @ oh.T
        A_ = Wlbl.T @ A @ Wlbl

        ms = jnp.sum(mask.astype(jnp.int32), axis=-1)
        U_target = hippi(A_, U_ds, ms, self.univ_size,
                         max_iter=self.hippi_iters, sk_iter=self.sk_iter)

        # masked MSE over valid rows (reference mse_loss over the ragged matrix)
        diff = jnp.square(U_ds - jax.lax.stop_gradient(U_target))
        denom = jnp.maximum(jnp.sum(row_mask) * self.univ_size, 1)
        mse = jnp.sum(jnp.where(row_mask[:, None], diff, 0.0)) / denom
        return self.loss_w * mse + self.loss_lam * jnp.sqrt(
            jnp.sum(jnp.square(U_param)) + 1e-12
        )
