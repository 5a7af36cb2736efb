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
import numpy as np

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


def _valid_rows(mask, shape):
    """Reference ``n_sum`` = total valid SOURCE rows across the batch."""
    if mask is None:
        return float(np.prod(shape[:-1]))
    return jnp.maximum(jnp.sum(jnp.any(mask, axis=-1)), 1)


def inner_product_loss(pred, gt_perm, mask=None):
    """Negative inner product loss (reference ``losses.py:668-711``):
    ``-sum(pred * gt) / n_rows`` (n_rows = the reference's Σ src_ns)."""
    x = pred * gt_perm
    if mask is not None:
        x = jnp.where(mask, x, 0.0)
    return -jnp.sum(x) / _valid_rows(mask, pred.shape)


def offset_loss(d_pred, d_gt, grad_mask=None, norm=None, epsilon: float = 1e-5):
    """Robust displacement loss (reference ``losses.py:570-609``):
    ``sum(sqrt(||(d1-d2)/norm||^2 * mask + eps)) / n_rows``."""
    x = d_pred - d_gt
    if norm is not None:
        x = x / norm
    sq = jnp.square(x)
    if grad_mask is not None:
        sq = sq * grad_mask
    dist = jnp.sqrt(jnp.sum(sq, axis=-1) + epsilon)
    return jnp.sum(dist) / d_pred.shape[0]


def focal_perm_loss(pred_dsmat, gt_perm, mask=None, gamma: float = 0.0):
    """Focal permutation loss (reference ``losses.py:612-665``): unweighted
    focal terms (no alpha), summed over the batch, divided by total valid
    source rows."""
    p = jnp.clip(pred_dsmat.astype(jnp.float32), EPS, 1.0 - EPS)
    t = gt_perm.astype(jnp.float32)
    loss = -((1.0 - p) ** gamma) * t * jnp.log(p) - (p ** gamma) * (
        1.0 - t
    ) * jnp.log(1.0 - p)
    if mask is not None:
        loss = jnp.where(mask, loss, 0.0)
    return jnp.sum(loss) / _valid_rows(mask, pred_dsmat.shape)


def displacement(s, p_src, p_tgt, ns=None):
    """Displacement field ``d_i = (S @ P_tgt)_i - P_src_i`` between matched
    point sets, plus the dummy-node gradient mask (reference ``Displacement``,
    ``multi_graph_matching.py:32-74``; Zanfir & Sminchisescu CVPR'18).

    s: (..., N1, N2) doubly-stochastic / permutation matrix; p_src: (..., N1, 2);
    p_tgt: (..., N2, 2); ns: (...,) valid source-node counts or None.
    Returns ``(d, grad_mask)`` with grad_mask None when ``ns`` is None.
    """
    d = jnp.matmul(s, p_tgt) - p_src
    if ns is None:
        return d, None
    idx = jnp.arange(p_src.shape[-2])
    grad_mask = (idx < jnp.asarray(ns)[..., None]).astype(p_src.dtype)[..., None]
    grad_mask = jnp.broadcast_to(grad_mask, p_src.shape)
    return d, grad_mask


def ilp_attention_loss(pred_dsmat, gt_perm, src_ns=None, tgt_ns=None):
    """ILP attention loss (reference ``losses.py:744-804``; GCAN CVPR'22):
    BCE restricted to the union of the discretized prediction and the GT
    assignment.  The discretization is an exact LAP on the (non-negative
    shifted) scores — a constant w.r.t. the gradient, as in the reference
    where the Gurobi result enters as data.  Runs on-device via the
    Jonker-Volgenant LAP (``ops.lap.hungarian``) instead of Gurobi.
    """
    from ttdg_mgm_tpu.ops.lap import hungarian_auto

    p = jnp.clip(pred_dsmat.astype(jnp.float32), EPS, 1.0 - EPS)
    t = gt_perm.astype(jnp.float32)
    squeeze = p.ndim == 2
    if squeeze:
        p, t = p[None], t[None]
    b, n1, n2 = p.shape
    src_ns = jnp.full((b,), n1, jnp.int32) if src_ns is None else jnp.asarray(src_ns)
    tgt_ns = jnp.full((b,), n2, jnp.int32) if tgt_ns is None else jnp.asarray(tgt_ns)
    # hungarian_auto handles rectangular instances in either orientation
    # (src_ns > tgt_ns included), matching the reference's
    # ILP_solver(dummy=True) contract on arbitrary shapes.
    dis = jax.lax.stop_gradient(hungarian_auto(p + 1.0, src_ns, tgt_ns))
    ali = jnp.minimum(dis + t, 1.0)
    valid = (jnp.arange(n1)[None, :, None] < src_ns[:, None, None]) & (
        jnp.arange(n2)[None, None, :] < tgt_ns[:, None, None]
    )
    bce = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p)) * ali
    bce = jnp.where(valid, bce, 0.0)
    return jnp.sum(bce) / jnp.maximum(jnp.sum(src_ns).astype(jnp.float32), 1.0)


def concat_matrix(mats, indices, num_blocks: int):
    """Assemble pairwise matching matrices into one symmetric joint matrix
    (reference ``concat_matrix``, ``multi_graph_matching.py:635-673``).

    Static-shape variant: all blocks share the (M1, M2) = mats[k].shape
    padded size, so block row/col offsets are uniform multiples.  ``mats`` is
    (P, M, M); ``indices`` a static list of (row, col) block coordinates.
    Writes each block and its transpose at the symmetric position.
    """
    mats = jnp.asarray(mats)
    M = mats.shape[-1]
    big = jnp.zeros((num_blocks * M, num_blocks * M), mats.dtype)
    for k, (r, c) in enumerate(indices):
        big = jax.lax.dynamic_update_slice(big, mats[k], (r * M, c * M))
        big = jax.lax.dynamic_update_slice(big, mats[k].T, (c * M, r * M))
    return big
