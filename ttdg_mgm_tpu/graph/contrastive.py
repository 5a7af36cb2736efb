"""Supervised contrastive loss (SupCon / SimCLR).

Capability of reference ``adapteacher/engine/trainer.py:101-193``
(``SupConLoss``, Khosla et al. 2020): multi-view contrastive loss with a
label- or mask-defined positive set; degenerates to SimCLR with no labels.
Kept in the graph package as an engine-level auxiliary loss (unused by the
active path, inventory row 3c).
"""

from __future__ import annotations

import jax.numpy as jnp


def sup_con_loss(features, labels=None, mask=None, *, temperature: float = 0.07,
                 base_temperature: float = 0.07, contrast_mode: str = "all"):
    """features ``(B, V, D)`` L2-normalized views; labels ``(B,)`` optional;
    mask ``(B, B)`` optional positives mask.  Returns scalar loss."""
    B, V, D = features.shape
    if labels is not None and mask is not None:
        raise ValueError("Cannot define both labels and mask")
    if labels is None and mask is None:
        pos = jnp.eye(B, dtype=jnp.float32)
    elif labels is not None:
        labels = labels.reshape(-1, 1)
        pos = (labels == labels.T).astype(jnp.float32)
    else:
        pos = mask.astype(jnp.float32)

    contrast = features.transpose(1, 0, 2).reshape(V * B, D)
    if contrast_mode == "one":
        anchor = features[:, 0]
        a_count = 1
    elif contrast_mode == "all":
        anchor = contrast
        a_count = V
    else:
        raise ValueError(f"Unknown mode: {contrast_mode}")

    logits = anchor @ contrast.T / temperature
    logits = logits - jnp.max(logits, axis=1, keepdims=True)
    pos = jnp.tile(pos, (a_count, V))
    self_mask = 1.0 - jnp.eye(B * a_count, B * V, dtype=jnp.float32)
    pos = pos * self_mask
    exp_logits = jnp.exp(logits) * self_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True))
    mean_log_prob_pos = jnp.sum(pos * log_prob, axis=1) / jnp.maximum(
        jnp.sum(pos, axis=1), 1e-12
    )
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return jnp.mean(loss)
