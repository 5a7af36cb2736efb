"""Matching losses (mask-aware, batched).

Capabilities of reference ``adapteacher/modeling/GModule/utils/losses.py``:

* ``BCEFocalLoss`` (``:72-103``) — binary focal CE with fixed alpha; this is
  the loss inside ``PermutationLoss``, i.e. THE test-time-adaptation loss.
* ``PermutationLoss`` (``:400-455``) — BCE-focal between a predicted
  doubly-stochastic matrix and a (pseudo) ground-truth permutation.
* ``CrossEntropyLoss`` (``:458-507``), ``PermutationLossHung`` (``:510-567``),
  ``FocalLoss`` permutation variant (``:612-665``), ``InnerProductLoss``
  (``:668-711``), ``HammingLoss`` (``:714-741``), ``OffsetLoss`` (``:570-609``).

All functions here take explicit validity masks instead of ragged slicing:
``loss(s, gt, mask)`` where ``mask`` is the outer product of row/col node
validity.  Reductions divide by the number of *valid* entries so padded
problems produce identical values to the reference's ragged computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-6


def _masked_mean(x, mask):
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(jnp.where(mask, x, 0.0)) / denom


class BCEFocalLoss:
    """Binary focal cross-entropy on probabilities (not logits).

    loss = -alpha (1-p)^g t log p - (1-alpha) p^g (1-t) log(1-p)
    """

    def __init__(self, gamma: float = 2.0, alpha: float = 0.25, reduction: str = "mean"):
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction

    def __call__(self, p, target, mask=None):
        p = jnp.clip(p.astype(jnp.float32), EPS, 1.0 - EPS)
        t = target.astype(jnp.float32)
        loss = -self.alpha * (1.0 - p) ** self.gamma * t * jnp.log(p) - (
            1.0 - self.alpha
        ) * p ** self.gamma * (1.0 - t) * jnp.log(1.0 - p)
        if mask is None:
            mask = jnp.ones_like(loss, dtype=bool)
        if self.reduction == "mean":
            return _masked_mean(loss, mask)
        return jnp.sum(jnp.where(mask, loss, 0.0))


def permutation_loss(pred_dsmat, gt_perm, mask=None, gamma: float = 2.0, alpha: float = 0.25):
    """BCE-focal permutation loss (reference ``losses.py:400-455``).

    ``pred_dsmat``/``gt_perm``: ``(..., N1, N2)`` in [0, 1]; ``mask``: same
    shape bool.  Mean over valid entries (matching the reference's
    'elementwise_mean' over the ragged matrix).
    """
    return BCEFocalLoss(gamma=gamma, alpha=alpha)(pred_dsmat, gt_perm, mask)


def cross_entropy_perm_loss(pred_dsmat, gt_perm, row_mask=None):
    """Multi-class CE between permutations (reference ``losses.py:458-507``):
    each valid row of gt is one-hot over columns; loss = -sum gt*log(pred) / n_rows."""
    p = jnp.clip(pred_dsmat.astype(jnp.float32), EPS, 1.0)
    ll = -jnp.sum(gt_perm * jnp.log(p), axis=-1)
    if row_mask is None:
        row_mask = jnp.ones(ll.shape, dtype=bool)
    return _masked_mean(ll, row_mask)


def hamming_loss(pred_perm, gt_perm, mask=None):
    """Hamming distance loss (reference ``losses.py:714-741``):
    sum(pred*(1-gt) + gt*(1-pred)) averaged over problems."""
    x = pred_perm * (1.0 - gt_perm) + gt_perm * (1.0 - pred_perm)
    if mask is not None:
        x = jnp.where(mask, x, 0.0)
    return jnp.mean(jnp.sum(x, axis=(-2, -1)))


def inner_product_loss(pred, gt_perm, mask=None):
    """Negative inner product loss (reference ``losses.py:668-711``)."""
    x = pred * gt_perm
    if mask is not None:
        x = jnp.where(mask, x, 0.0)
    return -jnp.sum(x)


def offset_loss(d_pred, d_gt, grad_mask=None, norm: float = 1.0):
    """Robust L1 displacement loss (reference ``losses.py:570-609``)."""
    if grad_mask is not None:
        d_pred = d_pred * grad_mask
        d_gt = d_gt * grad_mask
    diff = d_pred - d_gt
    dist = jnp.sqrt(jnp.sum(jnp.square(diff), axis=-1) + 1e-12)
    return jnp.mean(dist) * norm


def focal_perm_loss(pred_dsmat, gt_perm, mask=None, gamma: float = 0.0, alpha: float = 0.5):
    """Focal permutation loss, sum-reduced per-problem then averaged
    (reference ``losses.py:612-665``)."""
    p = jnp.clip(pred_dsmat.astype(jnp.float32), EPS, 1.0 - EPS)
    t = gt_perm.astype(jnp.float32)
    loss = -alpha * (1.0 - p) ** gamma * t * jnp.log(p) - (1.0 - alpha) * p ** gamma * (
        1.0 - t
    ) * jnp.log(1.0 - p)
    if mask is not None:
        loss = jnp.where(mask, loss, 0.0)
    n = jnp.maximum(jnp.sum(mask, axis=(-2, -1)) if mask is not None else loss[..., 0, 0].size, 1)
    return jnp.mean(jnp.sum(loss, axis=(-2, -1)) / n)
