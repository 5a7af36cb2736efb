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

    TPU-first algorithm: instead of the O(K) *sequential* greedy scan (K
    latency-bound loop steps — ~40 us each on TPU, seconds across FPN
    levels), iterate the suppression relation to its fixpoint:
    ``keep <- valid & ~any(higher-ranked kept suppressor)``.  The fixpoint IS
    the greedy solution (each sweep finalizes at least one more link of every
    suppression chain, so it converges in chain-depth sweeps — typically <10
    for detection boxes), and each sweep is ONE (K, K) masked matvec.
    """
    K = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -1.0e30))
    b = boxes[order]
    v = valid[order]
    iou = pairwise_iou(b, b)
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    )
    sup = (iou > iou_threshold) & tri & v[:, None]  # j suppresses i if j<i kept

    def cond(state):
        keep, last, i = state
        return (i < K) & jnp.any(keep != last)

    def body(state):
        keep, _, i = state
        new = v & ~jnp.any(sup & keep[:, None], axis=0)
        return new, keep, i + 1

    init_keep = v
    keep_sorted, _, _ = jax.lax.while_loop(
        cond, body, (init_keep, jnp.zeros((K,), bool), jnp.int32(0))
    )
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
