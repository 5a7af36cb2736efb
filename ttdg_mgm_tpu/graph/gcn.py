"""Graph convolution blocks.

Capability of reference ``adapteacher/modeling/GModule/utils/graph_network.py``:

* ``Feat2Graph`` — QK-style soft adjacency: ``adj = L1-normalize((XWq (XWk)^T)^2)``
  (reference ``:95-107``),
* ``GraphConvolution`` — the classic Kipf GCN layer ``adj @ (X W) + b``
  (reference ``:40-93``),
* ``MAGNN`` — a 3-layer residual GCN over the Feat2Graph adjacency
  (reference ``:109-133``).

All are mask-aware: padded nodes contribute zero adjacency mass.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class Feat2Graph(nn.Module):
    num_feats: int = 256

    @nn.compact
    def __call__(self, x, mask=None):
        q = nn.Dense(self.num_feats, name="wq")(x)
        k = nn.Dense(self.num_feats, name="wk")(x)
        dot = jnp.einsum("...md,...nd->...mn", q, k)
        sq = jnp.square(dot)
        if mask is not None:
            sq = jnp.where(mask[..., None, :] & mask[..., :, None], sq, 0.0)
        adj = sq / jnp.maximum(jnp.sum(jnp.abs(sq), axis=-1, keepdims=True), 1e-12)
        return x, adj


class GraphConvolution(nn.Module):
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, adj):
        support = nn.Dense(
            self.out_features,
            use_bias=self.use_bias,
            kernel_init=nn.initializers.normal(stddev=0.02),
            name="weight",
        )(x)
        return jnp.einsum("...mn,...nd->...md", adj, support)


class MAGNN(nn.Module):
    """3-layer residual GCN over a learned QK adjacency."""

    nfeat: int = 256
    nhid: int = 256

    @nn.compact
    def __call__(self, x, mask=None):
        x_in = x
        x, adj = Feat2Graph(self.nfeat, name="graph")(x, mask)
        h = jnp.maximum(GraphConvolution(self.nhid, name="gc1")(x, adj), 0.0)
        h = jnp.maximum(GraphConvolution(self.nhid, name="gc2")(h, adj), 0.0)
        h = jnp.maximum(GraphConvolution(self.nfeat, name="gc3")(h, adj), 0.0)
        out = h + x_in
        if mask is not None:
            out = jnp.where(mask[..., None], out, 0.0)
        return out
