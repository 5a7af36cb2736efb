"""Box arithmetic: IoU, encode/decode, clipping, anchor generation.

Replaces the Detectron2 C++/Python box utilities the reference leans on
(SURVEY.md section 2.3: anchor generation + box encode/decode; d2
``Box2BoxTransform``, ``DefaultAnchorGenerator``).  Everything is vectorized
over static shapes; boxes are xyxy float32 tensors ``(..., 4)``.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp

# d2 Box2BoxTransform scale clamp: log(1000 / 16)
SCALE_CLAMP = math.log(1000.0 / 16.0)


def box_area(boxes):
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def pairwise_iou(boxes1, boxes2):
    """IoU matrix ``(..., N, M)`` between ``(..., N, 4)`` and ``(..., M, 4)``."""
    a1 = box_area(boxes1)
    a2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = a1[..., :, None] + a2[..., None, :] - inter
    return jnp.where(inter > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def clip_boxes(boxes, height, width):
    x1 = jnp.clip(boxes[..., 0], 0, width)
    y1 = jnp.clip(boxes[..., 1], 0, height)
    x2 = jnp.clip(boxes[..., 2], 0, width)
    y2 = jnp.clip(boxes[..., 3], 0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def encode_boxes(src_boxes, target_boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """d2 ``Box2BoxTransform.get_deltas``: (dx, dy, dw, dh) of target wrt src."""
    sw = src_boxes[..., 2] - src_boxes[..., 0]
    sh = src_boxes[..., 3] - src_boxes[..., 1]
    scx = src_boxes[..., 0] + 0.5 * sw
    scy = src_boxes[..., 1] + 0.5 * sh
    tw = target_boxes[..., 2] - target_boxes[..., 0]
    th = target_boxes[..., 3] - target_boxes[..., 1]
    tcx = target_boxes[..., 0] + 0.5 * tw
    tcy = target_boxes[..., 1] + 0.5 * th
    wx, wy, ww, wh = weights
    eps = 1e-8
    dx = wx * (tcx - scx) / jnp.maximum(sw, eps)
    dy = wy * (tcy - scy) / jnp.maximum(sh, eps)
    dw = ww * jnp.log(jnp.maximum(tw, eps) / jnp.maximum(sw, eps))
    dh = wh * jnp.log(jnp.maximum(th, eps) / jnp.maximum(sh, eps))
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """d2 ``Box2BoxTransform.apply_deltas`` with the log-space clamp."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, SCALE_CLAMP)
    dh = jnp.minimum(deltas[..., 3] / wh, SCALE_CLAMP)
    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = jnp.exp(dw) * w
    ph = jnp.exp(dh) * h
    return jnp.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1
    )


def cell_anchors(sizes: Sequence[float], aspect_ratios: Sequence[float]):
    """d2 ``generate_cell_anchors``: zero-centered anchors ``(A, 4)`` for one
    level, ordered sizes-major x ratios (d2 iterates sizes outer)."""
    out = []
    for size in sizes:
        area = float(size) ** 2
        for ar in aspect_ratios:
            w = math.sqrt(area / ar)
            h = ar * w
            out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return jnp.asarray(out, jnp.float32)


def grid_anchors(feat_h: int, feat_w: int, stride: int, cell: jnp.ndarray,
                 offset: float = 0.0):
    """Anchors for one level: ``(H*W*A, 4)``; d2 default offset is 0.0
    (anchor centers at ``stride * i``)."""
    shifts_x = (jnp.arange(feat_w, dtype=jnp.float32) + offset) * stride
    shifts_y = (jnp.arange(feat_h, dtype=jnp.float32) + offset) * stride
    sx = jnp.tile(shifts_x[None, :], (feat_h, 1)).reshape(-1)
    sy = jnp.tile(shifts_y[:, None], (1, feat_w)).reshape(-1)
    shifts = jnp.stack([sx, sy, sx, sy], axis=-1)  # (H*W, 4)
    return (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4)
