"""Cross-domain graph-matching head (SIGMA-style) for the mean-teacher path.

Capability of reference ``adapteacher/modeling/GModule/graph_matching.py``
(``GModule``, inventory row 24 — defined but never wired in the snapshot;
SURVEY.md section 0 lists it as a capability to implement *correctly*):

* intra-domain graph aggregation (MAGNN residual GCN + single-head
  attention, reference ``:597-600``),
* cross-graph interaction between source and target node sets (``:602-616``),
* node classification loss over enhanced nodes (``:618-643``),
* EMA class centers ("graph-guided memory bank", ``:283-298,888-926``) kept
  as functional state threaded by the caller,
* one-to-one affinity matching loss with log-Sinkhorn against the
  label-agreement matrix (``:693-721``),
* topology loss: prototype transport (PCT) + entropic-OT distance between
  node clouds (``:928-949``).

All node sets are padded ``(M, D)`` with masks; the module returns a dict of
losses plus the updated center state.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttdg_mgm_tpu.graph.affinity import Affinity
from ttdg_mgm_tpu.graph.attention import MultiHeadAttention
from ttdg_mgm_tpu.graph.gcn import MAGNN
from ttdg_mgm_tpu.graph.ot import proto_loss, sinkhorn_distance
from ttdg_mgm_tpu.ops.sinkhorn import sinkhorn_masked


def _masked_ce(logits, labels, mask):
    logz = jax.nn.logsumexp(logits, axis=-1)
    ll = logz - jnp.take_along_axis(logits, labels[:, None], axis=1)[:, 0]
    return jnp.sum(jnp.where(mask, ll, 0.0)) / jnp.maximum(jnp.sum(mask), 1.0)


class CrossDomainGraphHead(nn.Module):
    num_classes: int = 2
    dim: int = 256
    sk_tau: float = 0.05
    sk_iter: int = 20
    center_momentum: float = 0.99
    completion_nodes_per_class: int = 4
    with_semantic_completion: bool = True

    def _complete(self, nodes, labels, mask, other_labels, other_mask, centers,
                  rng, seed_project):
        """Domain-guided node completion (reference
        ``graph_matching.py:442-566``): classes present in the OTHER domain
        but missing here get hallucinated nodes sampled around the EMA class
        center (+ noise) and pushed through a learned seed projection.
        Static shapes: a fixed block of ``completion_nodes_per_class`` slots
        per class is appended, masked valid only when completion applies."""
        H = self.completion_nodes_per_class
        C1 = self.num_classes + 1
        present_here = jax.vmap(
            lambda c: jnp.any((labels == c) & mask)
        )(jnp.arange(1, C1))
        present_other = jax.vmap(
            lambda c: jnp.any((other_labels == c) & other_mask)
        )(jnp.arange(1, C1))
        need = (~present_here) & present_other  # (num_classes,)

        base = centers[1:]  # (num_classes, D) class centers
        noise = jax.random.normal(rng, (self.num_classes, H, self.dim)) * (
            0.01 if not self.with_semantic_completion else 1.0
        )
        if self.with_semantic_completion:
            seeds = base[:, None, :] + noise * 0.01
        else:
            seeds = noise
        seeds = seed_project(seeds.reshape(self.num_classes * H, self.dim))
        hal_labels = jnp.repeat(jnp.arange(1, C1), H)
        hal_mask = jnp.repeat(need, H)
        out_nodes = jnp.concatenate([nodes, seeds], axis=0)
        out_labels = jnp.concatenate([labels, hal_labels.astype(labels.dtype)])
        out_mask = jnp.concatenate([mask, hal_mask])
        return out_nodes, out_labels, out_mask

    @nn.compact
    def __call__(self, src_nodes, src_labels, src_mask, tgt_nodes, tgt_labels,
                 tgt_mask, centers=None, *, completion_rng=None):
        """Node sets ``(M, D)``; labels class+1 with 0 invalid; ``centers``
        ``(num_classes + 1, D)`` EMA class prototypes (functional state).

        Returns ``(losses dict, new_centers)``.  When ``completion_rng`` is
        given, missing classes are completed from the memory-bank centers
        before matching.
        """
        C1 = self.num_classes + 1  # + background/van node class
        if completion_rng is not None:
            if centers is None:
                centers = jnp.zeros((C1, self.dim))
            seed_project = nn.Dense(self.dim, name="seed_project")
            r1, r2 = jax.random.split(completion_rng)
            src_nodes, src_labels, src_mask = self._complete(
                src_nodes, src_labels, src_mask, tgt_labels, tgt_mask, centers,
                r1, seed_project,
            )
            tgt_nodes, tgt_labels, tgt_mask = self._complete(
                tgt_nodes, tgt_labels, tgt_mask, src_labels, src_mask, centers,
                r2, seed_project,
            )

        # intra-domain aggregation: residual GCN then self-attention
        magnn = MAGNN(self.dim, self.dim, name="intra_gcn")
        att = MultiHeadAttention(self.dim, 1, name="intra_attention")
        src = magnn(src_nodes[None], src_mask[None])[0]
        tgt = magnn(tgt_nodes[None], tgt_mask[None])[0]
        src, _ = att(src, src_mask)
        tgt, _ = att(tgt, tgt_mask)

        # cross-graph interaction (queries from one domain, keys the other)
        cross = MultiHeadAttention(self.dim, 1, name="cross_attention")
        both = jnp.concatenate([src, tgt], axis=0)
        both_mask = jnp.concatenate([src_mask, tgt_mask], axis=0)
        enhanced, _ = cross(both, both_mask)
        src_e, tgt_e = jnp.split(enhanced, 2, axis=0)

        # node classification over enhanced nodes
        cls_head = nn.Dense(C1, name="node_cls")
        loss_cls = 0.5 * (
            _masked_ce(cls_head(src_e), src_labels, src_mask & (src_labels > 0))
            + _masked_ce(cls_head(tgt_e), tgt_labels, tgt_mask & (tgt_labels > 0))
        )

        # EMA class centers from source nodes
        if centers is None:
            centers = jnp.zeros((C1, self.dim))
        onehot = jax.nn.one_hot(jnp.where(src_mask, src_labels, 0), C1)
        counts = jnp.maximum(jnp.sum(onehot, axis=0), 1.0)
        batch_centers = (onehot.T @ src_e) / counts[:, None]
        seen = (jnp.sum(onehot, axis=0) > 0)[:, None]
        new_centers = jnp.where(
            seen,
            self.center_momentum * centers + (1 - self.center_momentum) * batch_centers,
            centers,
        )
        new_centers = jax.lax.stop_gradient(new_centers)

        # o2o affinity matching loss vs label agreement (log-Sinkhorn)
        aff = Affinity(self.dim, name="matching_affinity")(src_e, tgt_e)
        ds = sinkhorn_masked(aff, src_mask, tgt_mask, tau=self.sk_tau,
                             max_iter=self.sk_iter)
        agree = (
            (src_labels[:, None] == tgt_labels[None, :])
            & (src_labels > 0)[:, None] & (tgt_labels > 0)[None, :]
        ).astype(jnp.float32)
        pair_mask = src_mask[:, None] & tgt_mask[None, :]
        l1 = jnp.abs(ds - agree)
        loss_match = jnp.sum(jnp.where(pair_mask, l1, 0.0)) / jnp.maximum(
            jnp.sum(pair_mask), 1.0
        )

        # topology: prototype transport + OT distance between node clouds
        t2p, p2t, _ = proto_loss(new_centers[1:], tgt_e,
                                 jnp.full((self.num_classes, 1),
                                          1.0 / self.num_classes))
        ot_cost, _ = sinkhorn_distance(src_e[None], tgt_e[None])
        loss_topo = t2p + p2t + jnp.sum(ot_cost)

        losses = {
            "loss_node_cls": loss_cls,
            "loss_cross_matching": loss_match,
            "loss_topology": loss_topo,
        }
        return losses, new_centers
