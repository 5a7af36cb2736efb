"""ROIAlign (aligned / "v2" semantics) and the FPN multi-level pooler.

Replaces the Detectron2/torchvision CUDA ROIAlign the reference uses for box
and mask pooling (SURVEY.md section 2.3; reference call sites
``roi_heads/roi_heads.py:39-44,182``, ``engine/trainer.py:83-98``).

Semantics follow d2 ``ROIAlign(aligned=True)``: coordinates shift by half a
pixel (``x * scale - 0.5``), each output bin averages an ``n x n`` grid of
bilinear samples, samples outside ``[-1, H]`` contribute zero and in-range
coordinates clamp to the border.  ``sampling_ratio`` is a static compile-time
constant (default 2); d2's adaptive ``ratio=0`` (``ceil(bin_size)``) is data
dependent and would force dynamic shapes — at FPN scale assignment the bin
size is ~1-2 px so ``n=2`` brackets the adaptive choice (deviation documented
for the Dice-parity budget).

The multi-level pooler computes the d2 FPN level assignment
``lvl = floor(4 + log2(sqrt(area)/224))`` clamped to [min, max] and evaluates
every level for every ROI, selecting by mask — no gather/scatter
reorganization, no host sync; the extra FLOPs are gathers only and vanish
next to the heads' matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bilinear_sample(feat, y, x):
    """Bilinear sample ``feat (H, W, C)`` at float coords ``y, x (...,)``.
    Out-of-range (beyond [-1, H]/[-1, W]) samples are zero; in-range coords
    clamp to the border (d2 ROIAlign convention)."""
    H, W, C = feat.shape
    valid = (y > -1.0) & (y < H) & (x > -1.0) & (x < W)
    y = jnp.clip(y, 0.0, H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ly = (y - y0)[..., None]
    lx = (x - x0)[..., None]
    flat = feat.reshape(H * W, C)

    def g(yy, xx):
        idx = (yy * W + xx).astype(jnp.int32)
        return flat[idx.reshape(-1)].reshape(idx.shape + (C,))

    v = (
        g(y0, x0) * (1 - ly) * (1 - lx)
        + g(y0, x1) * (1 - ly) * lx
        + g(y1, x0) * ly * (1 - lx)
        + g(y1, x1) * ly * lx
    )
    return jnp.where(valid[..., None], v, 0.0)


@functools.partial(
    jax.jit, static_argnames=("output_size", "sampling_ratio", "aligned")
)
def roi_align(feat, rois, spatial_scale, *, output_size: int = 7,
              sampling_ratio: int = 2, aligned: bool = True):
    """feat ``(H, W, C)``; rois ``(K, 4)`` xyxy in image coords.
    Returns ``(K, output_size, output_size, C)``."""
    P, n = output_size, sampling_ratio
    off = 0.5 if aligned else 0.0
    b = rois * spatial_scale - off
    w = b[:, 2] - b[:, 0]
    h = b[:, 3] - b[:, 1]
    if not aligned:
        w = jnp.maximum(w, 1.0)
        h = jnp.maximum(h, 1.0)
    bin_w = w / P
    bin_h = h / P
    # sample grid: (P*n,) fractional offsets within the roi, units of bins
    steps = (jnp.arange(P * n, dtype=jnp.float32) // n) + (
        (jnp.arange(P * n, dtype=jnp.float32) % n) + 0.5
    ) / n
    ys = b[:, 1, None] + bin_h[:, None] * steps[None, :]  # (K, P*n)
    xs = b[:, 0, None] + bin_w[:, None] * steps[None, :]

    def one_roi(yy, xx):
        grid_y = jnp.tile(yy[:, None], (1, P * n))
        grid_x = jnp.tile(xx[None, :], (P * n, 1))
        s = _bilinear_sample(feat, grid_y, grid_x)  # (P*n, P*n, C)
        s = s.reshape(P, n, P, n, -1)
        return jnp.mean(s, axis=(1, 3))

    return jax.vmap(one_roi)(ys, xs)


def assign_fpn_levels(rois, *, min_level: int = 2, max_level: int = 5,
                      canonical_size: float = 224.0, canonical_level: int = 4):
    """d2 ``assign_boxes_to_levels``: ``(K,)`` int level indices in
    ``[min_level, max_level]``."""
    area = jnp.maximum(rois[:, 2] - rois[:, 0], 0.0) * jnp.maximum(
        rois[:, 3] - rois[:, 1], 0.0
    )
    lvl = jnp.floor(canonical_level + jnp.log2(jnp.sqrt(area) / canonical_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def multilevel_roi_align(feats, rois, *, strides=(4, 8, 16, 32),
                         output_size: int = 7, sampling_ratio: int = 2,
                         min_level: int = 2):
    """FPN pooler over levels p2..p5 for one image.

    feats: sequence of ``(H_l, W_l, C)``; rois ``(K, 4)``.
    Returns ``(K, output_size, output_size, C)``.
    """
    levels = assign_fpn_levels(
        rois, min_level=min_level, max_level=min_level + len(feats) - 1
    )
    out = None
    for i, (feat, stride) in enumerate(zip(feats, strides)):
        pooled = roi_align(
            feat, rois, 1.0 / stride, output_size=output_size,
            sampling_ratio=sampling_ratio,
        )
        sel = (levels == (min_level + i))[:, None, None, None]
        out = jnp.where(sel, pooled, 0.0) if out is None else out + jnp.where(sel, pooled, 0.0)
    return out
