"""KNN-hypergraph neural network blocks.

Capability of reference ``utils/attentions.py:118-299`` (``HyperGraph`` +
HGNN convolutions, Feng et al. 'Hypergraph Neural Networks'): build a
KNN-based hyperedge incidence structure from node features and run HGNN
convolutions over the normalized hypergraph Laplacian ``G = Dv^-1/2 H W De^-1
H^T Dv^-1/2``.  Used by the SIGMA-style cross-domain head's quadratic
structure loss (inventory row 24); vectorized with static K.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def knn_hypergraph_laplacian(x, k_neig: int = 10, *, prob: bool = True):
    """Construct G (N, N) from pairwise distances: each node spawns one
    hyperedge containing its k nearest neighbors; edge weights
    ``exp(-d^2 / mean_d^2)`` when ``prob`` (reference ``Eu_dis`` +
    ``construct_H_with_KNN`` + ``generate_G_from_H``)."""
    n = x.shape[0]
    d2 = jnp.sum(jnp.square(x[:, None] - x[None, :]), axis=-1)
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    k = min(k_neig, n)
    idx = jnp.argsort(dist, axis=1)[:, :k]  # each row: nearest k (incl. self)
    avg = jnp.mean(dist, axis=1, keepdims=True)
    w = jnp.exp(-jnp.square(dist) / jnp.maximum(jnp.square(avg), 1e-12))
    H = jnp.zeros((n, n))
    rows = jnp.repeat(jnp.arange(n)[:, None], k, 1)
    H = H.at[idx.reshape(-1), rows.reshape(-1)].set(
        jnp.where(prob, w[rows.reshape(-1), idx.reshape(-1)], 1.0)
    )
    # G = Dv^-1/2 H W De^-1 H^T Dv^-1/2 (edge weights W = 1)
    dv = jnp.sum(H, axis=1)
    de = jnp.sum(H, axis=0)
    dv2 = 1.0 / jnp.sqrt(jnp.maximum(dv, 1e-12))
    inv_de = 1.0 / jnp.maximum(de, 1e-12)
    return (dv2[:, None] * H) * inv_de[None, :] @ H.T * dv2[None, :]


class HGNNConv(nn.Module):
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, G):
        x = nn.Dense(self.out_features, use_bias=self.use_bias, name="theta")(x)
        return G @ x


class HyperGraphBlock(nn.Module):
    """2-layer HGNN with residual (reference ``HyperGraph``)."""

    hidden: int = 256
    k_neig: int = 10
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        G = knn_hypergraph_laplacian(x, self.k_neig)
        h = nn.relu(HGNNConv(self.hidden, name="hgc1")(x, G))
        if self.dropout > 0 and not deterministic:
            h = nn.Dropout(self.dropout)(h, deterministic=False)
        h = HGNNConv(x.shape[-1], name="hgc2")(h, G)
        return x + h
