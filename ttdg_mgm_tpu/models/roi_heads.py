"""ROI heads: box head/predictor (CE + focal), mask head, sampling, inference.

Capability of the reference's ``StandardROIHeadsPseudoLab``
(``adapteacher/modeling/roi_heads/roi_heads.py:22-289``) and
``FastRCNNFocaltLossOutputLayers`` (``roi_heads/fast_rcnn.py:12-103``):

* branch-aware heads — training branches label+sample proposals and compute
  losses; the ``TTT`` branch returns box inference WITHOUT the mask head
  (reference ``:109-110``); full inference adds masks;
* CE-vs-focal box classification switch (focal gamma=1.5, sum/N);
* d2 StandardROIHeads numerics: 512 proposals @ 0.25 fg, IoU 0.5 matcher
  (no low-quality), class-specific box regression with (10, 10, 5, 5)
  weights, score 0.05 / class-NMS 0.5 / top-100 inference.

All functions are per-batch with static shapes and validity masks.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttdg_mgm_tpu.ops.boxes import clip_boxes, decode_boxes, encode_boxes, pairwise_iou
from ttdg_mgm_tpu.ops.nms import batched_nms_mask

BBOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


class BoxHead(nn.Module):
    """FastRCNNConvFCHead (cfg.MODEL.ROI_BOX_HEAD.NUM_FC / FC_DIM;
    d2 default: flatten -> 1024 -> 1024)."""

    fc_dim: int = 1024
    num_fc: int = 2
    dtype: Any = None  # computation dtype (params stay f32)

    @nn.compact
    def __call__(self, x):  # (K, 7, 7, C)
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fc):
            x = nn.relu(nn.Dense(self.fc_dim, name=f"fc{i + 1}",
                                 dtype=self.dtype)(x))
        return x


class BoxPredictor(nn.Module):
    """cls_score (C+1) + class-specific bbox_pred (4C)."""

    num_classes: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        scores = nn.Dense(
            self.num_classes + 1, kernel_init=nn.initializers.normal(0.01),
            name="cls_score", dtype=self.dtype,
        )(x)
        deltas = nn.Dense(
            self.num_classes * 4, kernel_init=nn.initializers.normal(0.001),
            name="bbox_pred", dtype=self.dtype,
        )(x)
        return scores, deltas


class MaskHead(nn.Module):
    """MaskRCNNConvUpsampleHead (cfg.MODEL.ROI_MASK_HEAD.NUM_CONV /
    CONV_DIM; d2 default: 4x conv3x3 + deconv2x2 + 1x1 predictor)."""

    num_classes: int
    channels: int = 256
    num_conv: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):  # (K, 14, 14, C)
        for i in range(self.num_conv):
            x = nn.relu(
                nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                        name=f"mask_fcn{i + 1}", dtype=self.dtype)(x)
            )
        x = nn.relu(
            nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                             name="deconv", dtype=self.dtype)(x)
        )
        return nn.Conv(self.num_classes, (1, 1), name="predictor",
                       dtype=self.dtype)(x)  # (K, 28, 28, C)


# ---------------------------------------------------------------------------
# proposal labeling + sampling (training branches)
# ---------------------------------------------------------------------------

def label_and_sample_proposals(
    proposals, prop_valid, gt_boxes, gt_classes, gt_valid, key, *,
    num_classes: int, batch_size_per_image: int = 512,
    positive_fraction: float = 0.25, iou_thresh: float = 0.5,
    append_gt: bool = True,
):
    """d2 ``label_and_sample_proposals`` for ONE image, static output
    ``batch_size_per_image`` rows.

    Appends GT boxes to the proposal set (d2 PROPOSAL_APPEND_GT; the
    reference's val-loss path disables it, ``roi_heads.py:85-91``), matches
    at IoU 0.5 (no low-quality), samples fg/bg by masked random ranking, and
    returns ``(boxes (S, 4), classes (S,), matched_gt (S,), fg (S,),
    valid (S,))`` where classes == num_classes marks background.
    """
    boxes = jnp.concatenate([proposals, gt_boxes], axis=0)
    valid = jnp.concatenate(
        [prop_valid, gt_valid if append_gt else jnp.zeros_like(gt_valid)], axis=0
    )
    iou = pairwise_iou(boxes, gt_boxes)
    iou = jnp.where(gt_valid[None, :] & valid[:, None], iou, -1.0)
    best = jnp.max(iou, axis=1)
    matched = jnp.argmax(iou, axis=1)
    fg = (best >= iou_thresh) & valid
    bg = (best < iou_thresh) & valid
    cls = jnp.where(fg, gt_classes[matched], num_classes)

    S = batch_size_per_image
    num_fg_target = int(S * positive_fraction)
    r = jax.random.uniform(key, boxes.shape[:1])

    def ranks(mask):
        order = jnp.argsort(jnp.where(mask, r, 2.0))
        return jnp.zeros_like(r, dtype=jnp.int32).at[order].set(
            jnp.arange(r.shape[0], dtype=jnp.int32)
        )

    num_fg = jnp.minimum(jnp.sum(fg.astype(jnp.int32)), num_fg_target)
    fg_sel = fg & (ranks(fg) < num_fg)
    num_bg = S - num_fg
    bg_sel = bg & (ranks(bg) < num_bg)
    sel = fg_sel | bg_sel

    # compact selected rows into S static slots (fg first is NOT required by
    # d2 — original order is kept by the scatter)
    order = jnp.cumsum(sel.astype(jnp.int32)) - 1
    slot = jnp.where(sel & (order < S), order, S)

    def compact(x, fill):
        buf = jnp.full((S + 1,) + x.shape[1:], fill, x.dtype)
        return buf.at[slot].set(x)[:S]

    out_boxes = compact(boxes, 0.0)
    out_cls = compact(cls.astype(jnp.int32), num_classes)
    out_matched = compact(matched.astype(jnp.int32), 0)
    out_fg = compact(fg_sel, False)
    n_sel = jnp.minimum(jnp.sum(sel.astype(jnp.int32)), S)
    out_valid = jnp.arange(S) < n_sel
    return out_boxes, out_cls, out_matched, out_fg & out_valid, out_valid


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def fast_rcnn_losses(scores, deltas, prop_boxes, gt_boxes_matched, classes, fg,
                     valid, *, num_classes: int, cls_loss_type: str = "CrossEntropy"):
    """d2 FastRCNNOutputs losses (smooth-l1 beta 0 -> L1) with the reference's
    CE/focal switch (focal gamma 1.5, reference ``fast_rcnn.py:75-103``)."""
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    logz = jax.nn.logsumexp(scores, axis=-1)
    ce = logz - jnp.take_along_axis(scores, classes[:, None], axis=1)[:, 0]
    if cls_loss_type == "FocalLoss":
        p = jnp.exp(-ce)
        ce = (1.0 - p) ** 1.5 * ce
    loss_cls = jnp.sum(jnp.where(valid, ce, 0.0)) / n_valid

    gt_deltas = encode_boxes(prop_boxes, gt_boxes_matched, BBOX_REG_WEIGHTS)
    deltas = deltas.reshape(deltas.shape[0], num_classes, 4)
    cls_idx = jnp.clip(classes, 0, num_classes - 1)
    sel_deltas = jnp.take_along_axis(deltas, cls_idx[:, None, None], axis=1)[:, 0]
    l1 = jnp.sum(jnp.abs(sel_deltas - gt_deltas), axis=-1)
    loss_box = jnp.sum(jnp.where(fg, l1, 0.0)) / n_valid
    return {"loss_cls": loss_cls, "loss_box_reg": loss_box}


def mask_loss(mask_logits, classes, gt_masks28, fg):
    """BCE-with-logits on the gt-class channel over fg proposals
    (d2 ``mask_rcnn_loss``)."""
    K, H, W, C = mask_logits.shape
    cls_idx = jnp.clip(classes, 0, C - 1)
    logits = jnp.take_along_axis(
        mask_logits, cls_idx[:, None, None, None], axis=3
    )[..., 0]
    t = gt_masks28.astype(jnp.float32)
    x = jnp.clip(logits, -30, 30)
    bce = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    per = jnp.mean(bce, axis=(1, 2))
    n_fg = jnp.maximum(jnp.sum(fg.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(fg, per, 0.0)) / n_fg


# ---------------------------------------------------------------------------
# inference
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("num_classes", "score_thresh", "nms_thresh", "topk"),
)
def roi_box_inference(scores, deltas, prop_boxes, prop_valid, image_size, *,
                      num_classes: int, score_thresh: float = 0.05,
                      nms_thresh: float = 0.5, topk: int = 100):
    """d2 ``fast_rcnn_inference`` for one image.

    scores (K, C+1) logits; deltas (K, 4C); prop_boxes (K, 4).
    Returns ``(boxes (topk, 4), scores (topk,), classes (topk,),
    valid (topk,))`` sorted by score.
    """
    K = scores.shape[0]
    probs = jax.nn.softmax(scores, axis=-1)[:, :num_classes]  # drop background
    deltas = deltas.reshape(K, num_classes, 4)
    boxes = decode_boxes(
        deltas, jnp.broadcast_to(prop_boxes[:, None, :], (K, num_classes, 4)),
        BBOX_REG_WEIGHTS,
    )
    boxes = clip_boxes(boxes, image_size[0], image_size[1])

    flat_boxes = boxes.reshape(K * num_classes, 4)
    flat_scores = probs.reshape(K * num_classes)
    flat_cls = jnp.tile(jnp.arange(num_classes)[None, :], (K, 1)).reshape(-1)
    flat_valid = (
        jnp.repeat(prop_valid, num_classes) & (flat_scores > score_thresh)
    )
    keep = batched_nms_mask(flat_boxes, flat_scores, flat_cls, flat_valid,
                            iou_threshold=nms_thresh)
    top_s, idx = jax.lax.top_k(jnp.where(keep, flat_scores, -1.0e30), topk)
    v = top_s > -1.0e29
    return (
        jnp.where(v[:, None], flat_boxes[idx], 0.0),
        jnp.where(v, top_s, 0.0),
        jnp.where(v, flat_cls[idx], 0),
        v,
    )


def crop_gt_masks(gt_masks, matched_gt, boxes, out_size: int = 28):
    """Crop+resize per-proposal GT bitmasks to (S, 28, 28) >=0.5 binary
    (d2 ``BitMasks.crop_and_resize``: ``ROIAlign((s, s), 1.0, 0,
    aligned=True)`` — sampling_ratio 0 = the adaptive grid)."""
    from ttdg_mgm_tpu.ops.roi_align import mask_roi_align

    masks = gt_masks[matched_gt].astype(jnp.float32)  # (S, Hm, Wm)
    out = mask_roi_align(masks, boxes, output_size=out_size, sampling_ratio=0,
                         aligned=True)
    return out >= 0.5
