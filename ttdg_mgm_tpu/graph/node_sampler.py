"""Graph-node sampling from FPN features (the "graph generator").

Capability of reference ``adapteacher/modeling/GModule/build_graph.py:11-249``
(``PrototypeComputation``): FCOS-style location-to-box assignment with
per-level size-of-interest buckets, then strided subsampling of positive
pixels as graph nodes (features + class labels).  Works off GT boxes during
source training and predicted boxes during test-time adaptation (reference
``:80-85``).

TPU-first re-design: the reference's per-image/per-level Python loops with
boolean indexing become one vectorized masked assignment over all locations,
and the data-dependent ``[::step]`` subsampling becomes a rank/scatter compact
into a fixed per-level capacity.  Output is ``(B, M, C)`` node features,
``(B, M)`` labels (class+1, 0 invalid) and ``(B, M)`` validity masks with all
valid nodes compacted to the front — exactly the layout the matching solvers
expect.

Capacity note: with ``sample_dist=10`` the reference emits at most 19 nodes
per level (``step = num_pos // 10``; ``step<=1`` keeps all ``num_pos <= 19``
positives, ``step>1`` keeps ``ceil(num_pos/step) <= 15``), so the default
``cap_per_level=20`` is lossless.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

INF = 1.0e8

# FCOS size-of-interest buckets (reference build_graph.py:28-39) and strides
# (reference build_graph.py:25, graph_config.py:338).
SIZES_OF_INTEREST = ((-1.0, 64.0), (64.0, 128.0), (128.0, 256.0), (256.0, 512.0), (512.0, INF))
STRIDES = (4, 8, 16, 32, 64)


def _compact(feats, labels, sel, cap):
    """Scatter selected rows (bool ``sel`` over P rows) into the first
    ``cap`` output slots, preserving order; overflow rows are dropped."""
    P, C = feats.shape
    order = jnp.cumsum(sel.astype(jnp.int32)) - 1
    slot = jnp.where(sel & (order < cap), order, cap)
    out_f = jnp.zeros((cap + 1, C), feats.dtype).at[slot].set(feats)[:cap]
    out_l = jnp.zeros((cap + 1,), jnp.int32).at[slot].set(labels)[:cap]
    n = jnp.minimum(jnp.sum(sel.astype(jnp.int32)), cap)
    out_m = jnp.arange(cap) < n
    return out_f, jnp.where(out_m, out_l, 0), out_m


def _assign_level(feat, boxes, classes, box_mask, stride, size_lo, size_hi):
    """FCOS assignment for one level of one image.

    feat: (H, W, C); boxes: (K, 4) xyxy in input pixels; classes: (K,) 0-based.
    Returns flattened (P, C) features and (P,) labels (class+1, 0 = background).
    """
    H, W, C = feat.shape
    xs = (jnp.arange(W, dtype=jnp.float32) * stride + stride // 2)
    ys = (jnp.arange(H, dtype=jnp.float32) * stride + stride // 2)
    x = jnp.tile(xs[None, :], (H, 1)).reshape(-1)
    y = jnp.tile(ys[:, None], (1, W)).reshape(-1)

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    l = x[:, None] - x1[None, :]
    t = y[:, None] - y1[None, :]
    r = x2[None, :] - x[:, None]
    b = y2[None, :] - y[:, None]
    ltrb = jnp.stack([l, t, r, b], axis=-1)  # (P, K, 4)
    in_box = jnp.min(ltrb, axis=-1) > 0
    max_reg = jnp.max(ltrb, axis=-1)
    cared = (max_reg >= size_lo) & (max_reg <= size_hi)

    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    a = jnp.where(in_box & cared & box_mask[None, :], area[None, :], INF)
    min_area = jnp.min(a, axis=1)
    argmin = jnp.argmin(a, axis=1)
    labels = jnp.where(min_area >= INF, 0, classes[argmin] + 1).astype(jnp.int32)
    return feat.reshape(-1, C), labels


def _sample_image(feats, boxes, classes, box_mask, sample_dist, cap_per_level,
                  strides, sizes):
    """One image across all levels -> compacted (M, C)/(M,)/(M,) node set."""
    per_level = []
    for lvl, feat in enumerate(feats):
        flat, labels = _assign_level(
            feat, boxes, classes, box_mask, strides[lvl], sizes[lvl][0], sizes[lvl][1]
        )
        pos = labels > 0
        num_pos = jnp.sum(pos.astype(jnp.int32))
        rank = jnp.cumsum(pos.astype(jnp.int32)) - 1
        step = num_pos // sample_dist
        sel = pos & ((step <= 1) | (rank % jnp.maximum(step, 1) == 0))
        per_level.append(_compact(flat, labels, sel, cap_per_level))

    f = jnp.concatenate([p[0] for p in per_level], axis=0)
    l = jnp.concatenate([p[1] for p in per_level], axis=0)
    m = jnp.concatenate([p[2] for p in per_level], axis=0)
    # second compaction: gather all valid nodes (across levels) to the front
    return _compact(f, l, m, len(feats) * cap_per_level)


class PrototypeComputation:
    """Callable mirroring reference ``PrototypeComputation.__call__``
    (``build_graph.py:160-246``) with static shapes.

    ``__call__(features, boxes, classes, box_mask)`` where ``features`` is a
    sequence of ``(B, H_l, W_l, C)`` NHWC FPN levels (p2..p6), ``boxes`` is
    ``(B, K, 4)`` xyxy, ``classes`` ``(B, K)`` 0-based, ``box_mask`` ``(B, K)``.
    Returns ``nodes (B, M, C), labels (B, M), mask (B, M)`` with
    ``M = num_levels * cap_per_level``.
    """

    def __init__(self, num_classes: int, sample_dist: int = 10,
                 cap_per_level: int = 20,
                 strides: Sequence[int] = STRIDES,
                 sizes: Sequence = SIZES_OF_INTEREST):
        self.num_classes = num_classes
        self.sample_dist = sample_dist
        self.cap_per_level = cap_per_level
        self.strides = tuple(strides)
        self.sizes = tuple(tuple(s) for s in sizes)

    def __call__(self, features, boxes, classes, box_mask):
        fn = functools.partial(
            _sample_image,
            sample_dist=self.sample_dist,
            cap_per_level=self.cap_per_level,
            strides=self.strides,
            sizes=self.sizes,
        )
        return jax.vmap(lambda fs, b, c, m: fn(list(fs), b, c, m))(
            tuple(features), boxes, classes, box_mask
        )
