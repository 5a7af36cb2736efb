"""Fixed-shape non-maximum suppression.

Replaces Detectron2's CUDA ``batched_nms`` (SURVEY.md section 2.3) with a
static-shape sequential-suppression program: boxes are pre-sorted by score,
the IoU matrix is computed once (MXU-friendly ``(K, K)``), and a
``fori_loop`` walks the ranking marking survivors — identical semantics to
torchvision NMS (including the strict ``iou > thresh`` suppression and
score-order tie-breaking) but with zero host round-trips.

``batched_nms`` implements d2's class-aware trick: offset every box by
``class_id * (max_coord + 1)`` so different classes never overlap, then run
plain NMS once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ttdg_mgm_tpu.ops.boxes import pairwise_iou


@functools.partial(jax.jit, static_argnames=("iou_threshold",))
def nms_mask(boxes, scores, valid, *, iou_threshold: float = 0.5):
    """Return a keep-mask over ``K`` boxes (NOT compacted; order unchanged).

    boxes ``(K, 4)``, scores ``(K,)``, valid ``(K,)`` bool.  A box is kept if
    it is valid and no higher-scoring kept box overlaps it with
    ``IoU > iou_threshold``.
    """
    K = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -1.0e30))
    b = boxes[order]
    v = valid[order]
    iou = pairwise_iou(b, b)
    sup = iou > iou_threshold

    def body(i, keep):
        # suppressed if any earlier kept box suppresses i
        earlier = (jnp.arange(K) < i) & keep
        is_sup = jnp.any(earlier & sup[:, i])
        return keep.at[i].set(v[i] & ~is_sup)

    keep_sorted = jax.lax.fori_loop(0, K, body, jnp.zeros((K,), bool))
    keep = jnp.zeros((K,), bool).at[order].set(keep_sorted)
    return keep


def batched_nms_mask(boxes, scores, class_ids, valid, *, iou_threshold: float = 0.5):
    """Class-aware NMS keep-mask (d2 ``batched_nms`` semantics)."""
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offset = class_ids.astype(boxes.dtype)[:, None] * max_coord
    return nms_mask(boxes + offset, scores, valid, iou_threshold=iou_threshold)


def topk_after_nms(boxes, scores, keep, k: int):
    """Compact kept boxes to the top-``k`` by score (static output shapes).

    Returns ``(boxes (k, 4), scores (k,), indices (k,), valid (k,))``.
    """
    masked = jnp.where(keep, scores, -1.0e30)
    top_scores, idx = jax.lax.top_k(masked, k)
    out_valid = top_scores > -1.0e29
    out_boxes = jnp.where(out_valid[:, None], boxes[idx], 0.0)
    return out_boxes, jnp.where(out_valid, top_scores, 0.0), idx, out_valid
