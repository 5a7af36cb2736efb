"""Mask pasting: 28x28 ROI mask -> full-image binary mask.

Replaces d2's ``paste_masks_in_image`` (C++/CUDA grid-sample path; SURVEY.md
section 2.3).  Semantics match d2 ``_do_paste_mask``: the ROI mask is sampled
with ``grid_sample(align_corners=False)`` over the box window — i.e. image
pixel ``(y + 0.5)`` maps to mask coordinate ``(y + 0.5 - y1) / box_h * M - 0.5``
— with zero padding outside, then thresholded at 0.5.

The device version produces ``(K, H, W)`` float masks for fixed image sizes
(used by the jitted eval path and benchmarks); a numpy twin lives in
``evaluation`` for host-side arbitrary-size pasting.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _sample_mask(mask, y, x):
    """Bilinear sample ``mask (M, M)`` at ``y, x`` with zero padding."""
    M = mask.shape[0]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)

    def g(yy, xx):
        ok = (yy >= 0) & (yy < M) & (xx >= 0) & (xx < M)
        yi = jnp.clip(yy, 0, M - 1).astype(jnp.int32)
        xi = jnp.clip(xx, 0, M - 1).astype(jnp.int32)
        return jnp.where(ok, mask[yi, xi], 0.0)

    ly = y - y0
    lx = x - x0
    return (
        g(y0, x0) * (1 - ly) * (1 - lx)
        + g(y0, x0 + 1) * (1 - ly) * lx
        + g(y0 + 1, x0) * ly * (1 - lx)
        + g(y0 + 1, x0 + 1) * ly * lx
    )


@functools.partial(jax.jit, static_argnames=("height", "width"))
def paste_masks(masks, boxes, *, height: int, width: int):
    """masks ``(K, M, M)`` probabilities; boxes ``(K, 4)`` xyxy.
    Returns ``(K, height, width)`` float masks (un-thresholded)."""
    M = masks.shape[-1]

    def one(mask, box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        w = jnp.maximum(x2 - x1, 1e-6)
        h = jnp.maximum(y2 - y1, 1e-6)
        ys = (jnp.arange(height, dtype=jnp.float32) + 0.5 - y1) / h * M - 0.5
        xs = (jnp.arange(width, dtype=jnp.float32) + 0.5 - x1) / w * M - 0.5
        gy = jnp.tile(ys[:, None], (1, width))
        gx = jnp.tile(xs[None, :], (height, 1))
        return _sample_mask(mask, gy, gx)

    return jax.vmap(one)(masks.astype(jnp.float32), boxes.astype(jnp.float32))


def paste_masks_np(masks, boxes, height: int, width: int, threshold: float = 0.5):
    """Host numpy twin (arbitrary image sizes, evaluation path)."""
    import numpy as np

    K, M, _ = masks.shape
    out = np.zeros((K, height, width), np.uint8)
    for k in range(K):
        x1, y1, x2, y2 = boxes[k]
        w = max(x2 - x1, 1e-6)
        h = max(y2 - y1, 1e-6)
        y0i = max(int(np.floor(y1)), 0)
        y1i = min(int(np.ceil(y2)) + 1, height)
        x0i = max(int(np.floor(x1)), 0)
        x1i = min(int(np.ceil(x2)) + 1, width)
        if y1i <= y0i or x1i <= x0i:
            continue
        ys = (np.arange(y0i, y1i) + 0.5 - y1) / h * M - 0.5
        xs = (np.arange(x0i, x1i) + 0.5 - x1) / w * M - 0.5
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        y0 = np.floor(gy)
        x0 = np.floor(gx)

        def g(yy, xx):
            ok = (yy >= 0) & (yy < M) & (xx >= 0) & (xx < M)
            yi = np.clip(yy, 0, M - 1).astype(np.int64)
            xi = np.clip(xx, 0, M - 1).astype(np.int64)
            return np.where(ok, masks[k][yi, xi], 0.0)

        ly = gy - y0
        lx = gx - x0
        v = (
            g(y0, x0) * (1 - ly) * (1 - lx)
            + g(y0, x0 + 1) * (1 - ly) * lx
            + g(y0 + 1, x0) * ly * (1 - lx)
            + g(y0 + 1, x0 + 1) * ly * lx
        )
        out[k, y0i:y1i, x0i:x1i] = (v >= threshold).astype(np.uint8)
    return out
