"""Region Proposal Network (d2 semantics, static shapes).

Capability of the reference's ``PseudoLabRPN``
(``adapteacher/modeling/proposal_generator/rpn.py:10-55``): a standard d2 RPN
whose forward can produce proposals with or without computing losses
(``compute_loss`` flag) — here that split is structural: ``RPNHead`` +
``generate_proposals`` are the inference path, ``rpn_losses`` is called only
by training branches.

Static-shape design notes:

* d2 runs one ``batched_nms`` over the concatenated per-level top-k with the
  level index as the class id — which is exactly independent per-level NMS,
  so we run NMS per level (K^2 IoU stays small) and merge by score.
* anchor subsampling (256 @ 0.5 positive fraction) keeps d2's randomized
  choice via masked random ranking — same distribution, fixed shapes.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttdg_mgm_tpu.ops.boxes import (
    cell_anchors,
    clip_boxes,
    decode_boxes,
    encode_boxes,
    grid_anchors,
    pairwise_iou,
)
from ttdg_mgm_tpu.ops.nms import nms_mask

ANCHOR_SIZES = ((32,), (64,), (128,), (256,), (512,))
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
FPN_STRIDES = (4, 8, 16, 32, 64)


class RPNHead(nn.Module):
    """Shared 3x3 conv + 1x1 objectness / 4*A deltas (d2 StandardRPNHead)."""

    num_anchors: int = 3
    channels: int = 256
    dtype: Any = None  # computation dtype (params stay f32)

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        # d2 StandardRPNHead init: every RPN conv is normal(std=0.01) —
        # flax's lecun default (std ~0.06 at 256 ch) is 6x larger, and on
        # random frozen-BN features the initial delta predictions then
        # decode boxes far off their anchors; from-scratch RPN regression
        # took >1000 SGD steps to recover (round-5 TTA-gain diagnosis).
        # The delta head uses 0.001 (the d2 box-head bbox_pred std) so
        # from-scratch proposals start essentially AT their anchors.
        conv = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                       kernel_init=nn.initializers.normal(0.01),
                       name="conv", dtype=self.dtype)
        obj = nn.Conv(self.num_anchors, (1, 1), name="objectness_logits",
                      kernel_init=nn.initializers.normal(0.01),
                      dtype=self.dtype)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), name="anchor_deltas",
                         kernel_init=nn.initializers.normal(0.001),
                         dtype=self.dtype)
        logits, regs = [], []
        for f in feats:
            t = nn.relu(conv(f))
            logits.append(obj(t))
            regs.append(deltas(t))
        return logits, regs


def level_anchors(feat_shapes, strides=FPN_STRIDES, sizes=ANCHOR_SIZES,
                  ratios=ANCHOR_RATIOS):
    """Anchors per level for given static feature shapes [(H, W), ...]."""
    out = []
    for (h, w), stride, size in zip(feat_shapes, strides, sizes):
        out.append(grid_anchors(h, w, stride, cell_anchors(size, ratios)))
    return out


@functools.partial(
    jax.jit, static_argnames=("pre_nms_topk", "post_nms_topk", "nms_thresh")
)
def generate_proposals(logits, regs, anchors, image_sizes, *,
                       pre_nms_topk: int = 1000, post_nms_topk: int = 1000,
                       nms_thresh: float = 0.7):
    """Top-k + per-level NMS + merge (d2 ``find_top_rpn_proposals``).

    logits: list of (B, H, W, A); regs: list of (B, H, W, 4A);
    anchors: list of (H*W*A, 4); image_sizes: (B, 2) [h, w] valid sizes.
    Returns ``(boxes (B, K, 4), scores (B, K), valid (B, K))`` with
    K = post_nms_topk, sorted by score.
    """
    def per_image(lgt, rgs, h, w):
        # Stack all levels to a common (L, K) shape and run ONE batched NMS:
        # per-level nms_mask calls would serialize 5 independent while_loops
        # (latency-bound on TPU); stacked, the fixpoint sweeps run for all
        # levels at once.  Levels with fewer than K anchors pad with -inf
        # scores / invalid boxes.
        K = pre_nms_topk
        lvl_boxes, lvl_scores, lvl_valid = [], [], []
        for lv, anc in enumerate(anchors):
            score = lgt[lv].reshape(-1)
            delta = rgs[lv].reshape(-1, 4)
            k = min(K, score.shape[0])
            top_s, idx = jax.lax.top_k(score, k)
            boxes = decode_boxes(delta[idx], anc[idx])
            boxes = clip_boxes(boxes, h, w)
            ww = boxes[:, 2] - boxes[:, 0]
            hh = boxes[:, 3] - boxes[:, 1]
            valid = (ww > 0) & (hh > 0)
            pad = K - k
            if pad:
                boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
                top_s = jnp.pad(top_s, (0, pad), constant_values=-1.0e30)
                valid = jnp.pad(valid, (0, pad))
            lvl_boxes.append(boxes)
            lvl_scores.append(top_s)
            lvl_valid.append(valid)
        sb = jnp.stack(lvl_boxes)      # (L, K, 4)
        ss = jnp.stack(lvl_scores)     # (L, K)
        sv = jnp.stack(lvl_valid)      # (L, K)
        keep = jax.vmap(
            lambda b, s, v: nms_mask(b, s, v, iou_threshold=nms_thresh)
        )(sb, ss, sv)
        all_boxes = sb.reshape(-1, 4)
        all_scores = jnp.where(keep, ss, -1.0e30).reshape(-1)
        top_s, idx = jax.lax.top_k(all_scores, post_nms_topk)
        v = top_s > -1.0e29
        # d2 detaches proposals ("treated as fixed" in find_top_rpn_proposals):
        # without this, box/mask losses backprop through the ROIAlign sampling
        # COORDINATES into the exp() box decode and explode within two steps.
        return (
            jax.lax.stop_gradient(jnp.where(v[:, None], all_boxes[idx], 0.0)),
            jax.lax.stop_gradient(jnp.where(v, top_s, 0.0)),
            v,
        )

    return jax.vmap(per_image)(
        [l for l in logits], [r for r in regs], image_sizes[:, 0], image_sizes[:, 1]
    )


def match_anchors(anchors, gt_boxes, gt_valid, *, low_thresh=0.3, high_thresh=0.7):
    """d2 Matcher with allow_low_quality_matches.

    Returns ``(labels (N,), matched_gt (N,))`` with labels 1 pos / 0 neg /
    -1 ignore; matched_gt is the argmax gt index for every anchor.
    """
    iou = pairwise_iou(anchors, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best = jnp.max(iou, axis=1)
    matched = jnp.argmax(iou, axis=1)
    labels = jnp.where(best >= high_thresh, 1, jnp.where(best < low_thresh, 0, -1))
    # low-quality matches: for each gt, anchors achieving its max IoU
    best_per_gt = jnp.max(iou, axis=0)
    lq = jnp.any((iou == best_per_gt[None, :]) & (best_per_gt[None, :] > 0)
                 & gt_valid[None, :], axis=1)
    labels = jnp.where(lq, 1, labels)
    no_gt = ~jnp.any(gt_valid)
    labels = jnp.where(no_gt, 0, labels)
    return labels, matched


def subsample_indices(labels, key, num_samples=256, positive_fraction=0.5):
    """d2 ``subsample_labels`` as compact index sets (uniform random subset of
    positives up to ``num_samples * positive_fraction``, negatives fill the
    rest).  Returns ``(pos_idx (P,), pos_take (P,), neg_idx (S,), neg_take
    (S,))`` where P/S are static caps and the ``take`` masks flag live slots.

    ``top_k`` over uniform random keys replaces the earlier full argsort
    ranking — at 160k anchors x 8 images the two batched 1.28M-element
    argsorts alone cost 15 ms/step on v5e; two batched top_k(160k, <=256)
    are ~100x cheaper and draw the same uniform subset.
    """
    num_pos_target = int(num_samples * positive_fraction)
    pos = labels == 1
    neg = labels == 0
    r = jax.random.uniform(key, labels.shape)
    pos_key = jnp.where(pos, r, -1.0)
    _, pos_idx = jax.lax.top_k(pos_key, num_pos_target)
    num_pos = jnp.minimum(jnp.sum(pos.astype(jnp.int32)), num_pos_target)
    pos_take = jnp.arange(num_pos_target) < num_pos
    neg_key = jnp.where(neg, r, -1.0)
    _, neg_idx = jax.lax.top_k(neg_key, num_samples)
    num_neg = jnp.minimum(num_samples - num_pos, jnp.sum(neg.astype(jnp.int32)))
    neg_take = jnp.arange(num_samples) < num_neg
    return pos_idx, pos_take, neg_idx, neg_take


def subsample_labels(labels, key, num_samples=256, positive_fraction=0.5):
    """Mask-shaped view of ``subsample_indices`` (d2 ``subsample_labels``):
    returns ``(sampled_mask (N,), positive_mask (N,))``."""
    pos_idx, pos_take, neg_idx, neg_take = subsample_indices(
        labels, key, num_samples, positive_fraction
    )
    n = labels.shape[0]
    pos_sel = jnp.zeros((n,), bool).at[jnp.where(pos_take, pos_idx, n)].set(
        True, mode="drop"
    )
    sel = pos_sel.at[jnp.where(neg_take, neg_idx, n)].set(True, mode="drop")
    return sel, pos_sel


def rpn_losses(logits, regs, anchors, gt_boxes, gt_valid, key, *,
               batch_size_per_image: int = 256, positive_fraction: float = 0.5):
    """d2 RPN losses: BCE objectness + L1 (smooth-l1 beta 0) on deltas,
    normalized by ``B * batch_size_per_image``.

    logits: list of (B, H, W, A) -> flattened; gt_boxes (B, Kgt, 4).
    """
    B = logits[0].shape[0]
    anc = jnp.concatenate(anchors, 0)
    flat_logits = jnp.concatenate([l.reshape(B, -1) for l in logits], axis=1)
    flat_regs = jnp.concatenate([r.reshape(B, -1, 4) for r in regs], axis=1)

    def bce(o, t):
        o = jnp.clip(o, -30.0, 30.0)
        return jnp.maximum(o, 0.0) - o * t + jnp.log1p(jnp.exp(-jnp.abs(o)))

    def per_image(lgt, rgs, gtb, gtv, k):
        labels, matched = match_anchors(anc, gtb, gtv)
        pos_idx, pos_take, neg_idx, neg_take = subsample_indices(
            labels, k, batch_size_per_image, positive_fraction
        )
        # losses touch only the <=batch_size_per_image sampled anchors, so
        # gather those rows and compute compactly: encoding deltas for all
        # 160k anchors and masking cost ~10 ms/step at 800 px batch 8
        gt_deltas = encode_boxes(anc[pos_idx], gtb[matched[pos_idx]])
        box_l = jnp.sum(
            jnp.where(pos_take[:, None], jnp.abs(rgs[pos_idx] - gt_deltas), 0.0)
        )
        obj_l = jnp.sum(jnp.where(pos_take, bce(lgt[pos_idx], 1.0), 0.0)) + jnp.sum(
            jnp.where(neg_take, bce(lgt[neg_idx], 0.0), 0.0)
        )
        return box_l, obj_l

    keys = jax.random.split(key, B)
    box_l, obj_l = jax.vmap(per_image)(flat_logits, flat_regs, gt_boxes, gt_valid, keys)
    norm = B * batch_size_per_image
    return {
        "loss_rpn_cls": jnp.sum(obj_l) / norm,
        "loss_rpn_loc": jnp.sum(box_l) / norm,
    }
