"""Self-attention blocks used for graph construction.

TPU-native re-design of the reference's node-set attention (reference
``adapteacher/modeling/GModule/utils/attentions.py:25-116``): the attention
matrix doubles as the (soft) graph adjacency.  Differences from the reference:

* operates on a fixed-shape node set ``(M, D)`` with a validity mask instead
  of a ragged tensor — masked keys get ``-inf`` logits so padded nodes carry
  zero attention weight;
* dropout is deterministic-off by default (the reference runs dropout during
  test-time adaptation as a side effect of ``model.train()``; determinism is
  the saner default on TPU, and an rng can be threaded for parity runs).

The reference's ``version='v2'`` path with ``num_heads=1`` reduces to a
standard single-head scaled-dot-product attention with scale
``dim_per_head ** -0.5`` plus a residual + LayerNorm output projection; that
is what is implemented here (vmappable over a leading graph axis).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

NEG_INF = -1.0e30


def _softmax(x):
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def dot_attention(q, k, v, scale=None, key_mask=None):
    """Scaled dot-product attention over node sets.

    q, k, v: ``(..., M, Dh)``; key_mask: ``(..., M)`` bool (True = valid).
    Returns ``(context (..., M, Dh), attention (..., M, M))``.
    """
    logits = jnp.einsum("...md,...nd->...mn", q, k)
    if scale is not None:
        logits = logits * scale
    if key_mask is not None:
        logits = jnp.where(key_mask[..., None, :], logits, NEG_INF)
    attn = _softmax(logits)
    ctx = jnp.einsum("...mn,...nd->...md", attn, v)
    return ctx, attn


class MultiHeadAttention(nn.Module):
    """Single/multi-head self-attention returning (nodes', adjacency).

    Mirrors the behavior surface of reference ``attentions.py:44-116``
    (version "v2"): per-head linear Q/K/V, softmax attention, final linear,
    residual + LayerNorm.  The returned attention matrix (head-averaged when
    ``num_heads > 1``) is used downstream as graph adjacency.
    """

    model_dim: int = 256
    num_heads: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, nodes, mask=None, *, deterministic: bool = True):
        """nodes: ``(M, D)`` or ``(G, M, D)``; mask: matching ``(…, M)`` bool."""
        dh = self.model_dim // self.num_heads
        q = nn.Dense(dh * self.num_heads, name="linear_q")(nodes)
        k = nn.Dense(dh * self.num_heads, name="linear_k")(nodes)
        v = nn.Dense(dh * self.num_heads, name="linear_v")(nodes)

        def split(x):  # (..., M, H*Dh) -> (..., H, M, Dh)
            new = x.shape[:-1] + (self.num_heads, dh)
            return jnp.moveaxis(x.reshape(new), -2, -3)

        qh, kh, vh = split(q), split(k), split(v)
        key_mask = None if mask is None else mask[..., None, :]  # broadcast over heads
        scale = dh ** -0.5
        ctx, attn = dot_attention(qh, kh, vh, scale=scale, key_mask=key_mask)
        ctx = jnp.moveaxis(ctx, -3, -2).reshape(nodes.shape[:-1] + (dh * self.num_heads,))
        out = nn.Dense(self.model_dim, name="linear_final")(ctx)
        if self.dropout > 0.0 and not deterministic:
            out = nn.Dropout(rate=self.dropout)(out, deterministic=False)
        # epsilon matches torch nn.LayerNorm (1e-5): these weights may be
        # converted from reference .pth checkpoints, so the normalization
        # must be bit-comparable.
        out = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(nodes + out)
        attn = jnp.mean(attn, axis=-3)  # head average; exact for 1 head
        if mask is not None:
            out = jnp.where(mask[..., None], out, 0.0)
            attn = jnp.where(mask[..., None, :] & mask[..., :, None], attn, 0.0)
        return out, attn
