"""ROIAlign (aligned / "v2" semantics) and the FPN multi-level pooler.

Replaces the Detectron2/torchvision CUDA ROIAlign the reference uses for box
and mask pooling (SURVEY.md section 2.3; reference call sites
``roi_heads/roi_heads.py:39-44,182``, ``engine/trainer.py:83-98``).

Semantics follow d2 ``ROIAlign(aligned=True)``: coordinates shift by half a
pixel (``x * scale - 0.5``), each output bin averages an ``n x n`` grid of
bilinear samples, samples outside ``[-1, H]`` contribute zero and in-range
coordinates clamp to the border.

``sampling_ratio=0`` is d2/torchvision's ADAPTIVE grid — the reference's
poolers run with this default (``roi_bin_grid = ceil(bin_size)`` per ROI and
axis; d2 ``ROIPooler`` at reference ``roi_heads/roi_heads.py:39-44``,
``torchvision.ops.roi_align`` at ``engine/trainer.py:83-98``).  Data-dependent
sample COUNTS would force dynamic shapes, so the adaptive grid is computed on
a static ``ADAPTIVE_CAP``-sample budget per axis: sample positions are the
exact adaptive positions (they are ordinary traced floats), samples beyond
the ROI's ``ceil(bin)`` get weight 0, and the bin average becomes a weighted
sum.  This reproduces d2's ``ratio=0`` EXACTLY for every ROI whose per-axis
``ceil(bin) <= ADAPTIVE_CAP`` — which d2's area-based FPN level assignment
guarantees for all unclamped, aspect<=~2 ROIs (geometric-mean bin < 4 at the
assigned level) — and falls back to a uniform cap-point grid beyond it.
``sampling_ratio>0`` keeps the fixed static grid.

The multi-level pooler computes the d2 FPN level assignment
``lvl = floor(4 + log2(sqrt(area)/224))`` clamped to [min, max] and samples
each ROI from its assigned level ONLY, through a flattened feature pyramid:
all levels concatenate into one ``(sum H_l*W_l, C)`` buffer and each bilinear
corner is one row-gather at ``level_offset + y*W_l + x``.  (An earlier
version evaluated every level for every ROI and masked — on TPU the pooler
is row-gather-bandwidth-bound, so that cost ``num_levels`` times the traffic:
measured 164 ms -> 44 ms for the 4 x 1000-roi flagship pool.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

#: static per-axis sample budget for the adaptive (``sampling_ratio=0``) grid
ADAPTIVE_CAP = 4


def _axis_samples(b0, bin_sz, P: int, n: int, cap: int = ADAPTIVE_CAP):
    """Sample positions + per-sample weights along one axis.

    b0 ``(K,)`` roi start (shifted, level coords); bin_sz ``(K,)`` bin size.
    Returns ``(pos (K, P*m), w (K, P*m), m)`` where ``m = n`` (fixed grid,
    weight 1/n) or ``m = cap`` for ``n == 0`` (d2 adaptive: ``ceil(bin)``
    samples at the exact adaptive positions, surplus slots weight 0).  The
    weighted sum over each bin's ``m`` slots equals d2's bin average.
    """
    m = n if n > 0 else cap
    i = jnp.arange(P * m, dtype=jnp.float32) % m
    p = jnp.arange(P * m, dtype=jnp.float32) // m
    if n > 0:
        frac = (i + 0.5) / m
        w = jnp.full((b0.shape[0], P * m), 1.0 / m, jnp.float32)
    else:
        # twin/torchvision convention: ceil of the (non-negative) bin size,
        # at least 1 sample (degenerate rois sample their corner with the
        # full weight, matching torchvision's count=max(grid,1) average)
        nd = jnp.clip(jnp.ceil(jnp.maximum(bin_sz, 0.0)), 1.0, m)[:, None]
        frac = (jnp.minimum(i[None, :], nd - 1.0) + 0.5) / nd
        w = jnp.where(i[None, :] < nd, 1.0 / nd, 0.0)
    pos = b0[:, None] + bin_sz[:, None] * (p[None, :] + frac)
    return pos, w, m


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
    ys, wy, m = _axis_samples(b[:, 1], h / P, P, n)  # (K, P*m)
    xs, wx, _ = _axis_samples(b[:, 0], w / P, P, n)

    def one_roi(yy, xx, wyy, wxx):
        grid_y = jnp.tile(yy[:, None], (1, P * m))
        grid_x = jnp.tile(xx[None, :], (P * m, 1))
        s = _bilinear_sample(feat, grid_y, grid_x)  # (P*m, P*m, C)
        s = s * (wyy[:, None, None] * wxx[None, :, None])
        return jnp.sum(s.reshape(P, m, P, m, -1), axis=(1, 3))

    return jax.vmap(one_roi)(ys, xs, wy, wx)


def _interp_matrix(coords, weights, size: int, n: int):
    """Per-ROI separable bilinear interpolation matrix.

    coords ``(S, P*n)`` sample positions along one axis of a ``size``-wide
    canvas, weights ``(S, P*n)`` per-sample bin-average weights (from
    ``_axis_samples``); returns ``(S, P, size)`` where row ``p`` holds the
    weighted bilinear weights of that output bin's ``n`` sample slots
    (2 nonzeros per sample).  Out-of-range samples ([-1, size] exclusion, as
    in ``_bilinear_sample``) get all-zero weights; in-range clamp to border.
    """
    valid = (coords > -1.0) & (coords < size)
    c = jnp.clip(coords, 0.0, size - 1)
    c0 = jnp.floor(c)
    c1 = jnp.minimum(c0 + 1, size - 1)
    frac = c - c0
    iota = jnp.arange(size, dtype=jnp.float32)
    m = (iota == c0[..., None]) * (1.0 - frac)[..., None] + (
        iota == c1[..., None]
    ) * frac[..., None]  # (S, P*n, size)
    m = jnp.where(valid[..., None], m * weights[..., None], 0.0)
    s, pn, _ = m.shape
    return jnp.sum(m.reshape(s, pn // n, n, size), axis=2)


@functools.partial(
    jax.jit, static_argnames=("output_size", "sampling_ratio", "aligned")
)
def mask_roi_align(masks, rois, *, output_size: int = 28,
                   sampling_ratio: int = 2, aligned: bool = True):
    """ROIAlign on single-channel canvases as two batched matmuls.

    masks ``(S, H, W)`` float; rois ``(S, 4)`` xyxy in canvas coords (one box
    per mask).  Returns ``(S, output_size, output_size)``.

    Identical sampling semantics to ``roi_align`` with ``C=1``, but computed
    as ``Ry @ M @ Cx^T`` with per-ROI separable interpolation matrices: the
    elementwise formulation lowers to 4 single-float gathers per sample —
    measured 69 ms per corner for the 8x128-ROI mask-target crop at 800 px
    (~1 GB/s scalar-gather pathology) — while the matmul form rides the MXU
    in well under a millisecond.  The 2x2 sample-averaging fold is separable,
    so the mean over the ``n x n`` grid folds into the matrices.
    """
    S, H, W = masks.shape
    P, n = output_size, sampling_ratio
    off = 0.5 if aligned else 0.0
    b = rois - off
    bin_w = (b[:, 2] - b[:, 0]) / P
    bin_h = (b[:, 3] - b[:, 1]) / P
    ys, wy, m = _axis_samples(b[:, 1], bin_h, P, n)  # (S, P*m)
    xs, wx, _ = _axis_samples(b[:, 0], bin_w, P, n)
    ry = _interp_matrix(ys, wy, H, m)  # (S, P, H)
    cx = _interp_matrix(xs, wx, W, m)  # (S, P, W)
    # HIGHEST precision: the weights/masks are exact f32 and the reference
    # computes in f32; default (bf16-multiply) precision can wobble values
    # near the 0.5 binarization threshold.
    return jnp.einsum(
        "sph,shw,sqw->spq", ry, masks.astype(jnp.float32), cx,
        precision=jax.lax.Precision.HIGHEST,
    )


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
                         min_level: int = 2, pack_corners: bool = True):
    """FPN pooler over levels p2..p5 for one image.

    feats: sequence of ``(H_l, W_l, C)``; rois ``(K, 4)``.
    Returns ``(K, output_size, output_size, C)``.

    Each ROI samples its d2-assigned level only through a flattened feature
    pyramid (see module docstring).  ``pack_corners=True`` widens rows to 4C
    so all bilinear corners arrive in one gather — a large win for
    *differentiated* pools (backward becomes 1 row-scatter instead of 4;
    measured 230 -> 120 ms on the 800 px batch-8 train step), but a LOSS for
    forward-only inference pools, where the unpacked pyramid is small enough
    to stay cache-resident while the 4x-packed one spills to HBM (measured
    68 -> 91 ms on the 512 px TTA step) — inference callers pass False.
    """
    K = rois.shape[0]
    P, n = output_size, sampling_ratio
    C = feats[0].shape[-1]
    levels = assign_fpn_levels(
        rois, min_level=min_level, max_level=min_level + len(feats) - 1
    ) - min_level  # (K,) in [0, L)

    Hs = jnp.asarray([f.shape[0] for f in feats], jnp.int32)
    Ws = jnp.asarray([f.shape[1] for f in feats], jnp.int32)
    sizes = jnp.asarray([f.shape[0] * f.shape[1] for f in feats], jnp.int32)
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(sizes)[:-1]])
    if pack_corners:
        # Corner packing: widen each feature row to 4C = [f(y,x), f(y,x+1),
        # f(y+1,x), f(y+1,x+1)] so all four bilinear corners arrive in ONE
        # row-gather at (y0, x0).  The TPU gather unit is row-transaction-
        # bound, not byte-bound (measured 54 Mrows/s at 512 B rows vs
        # 34 Mrows/s at 2 KB rows on v5e): one 4C gather costs ~1.6x a C
        # gather, vs 4x for four separate corner gathers — and the backward
        # scatter-add shrinks from 4 row-scatters to 1 likewise.  Clamped
        # corners (x0 = W-1 or y0 = H-1, where the shifted slot holds zero
        # padding) are exact because the clamp implies a zero interpolation
        # weight for that corner.
        packed = []
        for f in feats:
            fx = jnp.concatenate([f[:, 1:], jnp.zeros_like(f[:, :1])], axis=1)
            f2 = jnp.concatenate([f, fx], axis=-1)              # [.., (y,x+1)]
            f2y = jnp.concatenate([f2[1:], jnp.zeros_like(f2[:1])], axis=0)
            packed.append(jnp.concatenate([f2, f2y], axis=-1))  # (H, W, 4C)
        flat = jnp.concatenate([p.reshape(-1, 4 * C) for p in packed], axis=0)
    else:
        flat = jnp.concatenate([f.reshape(-1, C) for f in feats], axis=0)

    scale = 1.0 / jnp.asarray(strides, jnp.float32)[levels]  # (K,)
    H = Hs[levels]  # (K,) level dims per roi
    W = Ws[levels]
    off = offs[levels]

    b = rois * scale[:, None] - 0.5  # aligned=True half-pixel shift
    bin_w = (b[:, 2] - b[:, 0]) / P
    bin_h = (b[:, 3] - b[:, 1]) / P
    ys, wgt_y, m = _axis_samples(b[:, 1], bin_h, P, n)  # (K, P*m)
    xs, wgt_x, _ = _axis_samples(b[:, 0], bin_w, P, n)
    yy = jnp.broadcast_to(ys[:, :, None], (K, P * m, P * m))
    xx = jnp.broadcast_to(xs[:, None, :], (K, P * m, P * m))
    # per-sample bin-average weight (1/n^2 static; adaptive-masked for n=0);
    # 1/n is a power of two for the standard ratios, so the bf16 product
    # below is exact there
    swgt = (wgt_y[:, :, None] * wgt_x[:, None, :]).reshape(-1, 1)

    Hf = H.astype(jnp.float32)[:, None, None]
    Wf = W.astype(jnp.float32)[:, None, None]
    valid = (yy > -1.0) & (yy < Hf) & (xx > -1.0) & (xx < Wf)
    y = jnp.clip(yy, 0.0, Hf - 1)
    x = jnp.clip(xx, 0.0, Wf - 1)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    # interpolation arithmetic stays in the feature dtype: promoting the
    # (K, P*n, P*n, C) corner products to f32 would double the HBM traffic of
    # an already bandwidth-bound op (bf16 weights cost <1e-2 relative error on
    # head inputs that are consumed in bf16 anyway)
    ly = (y - y0)[..., None].astype(flat.dtype)
    lx = (x - x0)[..., None].astype(flat.dtype)
    one = jnp.ones((), flat.dtype)

    off_b = off[:, None, None]
    W_b = W[:, None, None]

    if pack_corners:
        idx = off_b + y0.astype(jnp.int32) * W_b + x0.astype(jnp.int32)
        g = flat[idx.reshape(-1)]  # (K*Pn*Pn, 4C) — combine in the gather's
        # own flat layout: reshaping the 4C-wide output to (K, Pn, Pn, 4C)
        # before the combine cost ~25 ms/step in pure layout copies at 800 px
        w_y = jnp.stack([one - ly, ly], 0).reshape(2, -1, 1)   # (2, N, 1)
        w_x = jnp.stack([one - lx, lx], 0).reshape(2, -1, 1)
        v = (
            g[:, :C] * (w_y[0] * w_x[0])
            + g[:, C: 2 * C] * (w_y[0] * w_x[1])
            + g[:, 2 * C: 3 * C] * (w_y[1] * w_x[0])
            + g[:, 3 * C:] * (w_y[1] * w_x[1])
        )
        v = jnp.where(valid.reshape(-1, 1), v, jnp.zeros((), flat.dtype))
        v = v * swgt.astype(flat.dtype)
        out = jnp.sum(
            v.reshape(K, P, m, P, m, C), axis=(2, 4), dtype=jnp.float32
        )
        return out.astype(flat.dtype)
    else:
        y1 = jnp.minimum(y0 + 1, Hf - 1)
        x1 = jnp.minimum(x0 + 1, Wf - 1)
        w_y = jnp.stack([one - ly, ly], 0).reshape(2, -1, 1)
        w_x = jnp.stack([one - lx, lx], 0).reshape(2, -1, 1)

        def g(yi, xi):
            idx = off_b + yi.astype(jnp.int32) * W_b + xi.astype(jnp.int32)
            return flat[idx.reshape(-1)]  # (N, C) — combine flat, as above

        v = (
            g(y0, x0) * (w_y[0] * w_x[0])
            + g(y0, x1) * (w_y[0] * w_x[1])
            + g(y1, x0) * (w_y[1] * w_x[0])
            + g(y1, x1) * (w_y[1] * w_x[1])
        )
        v = jnp.where(valid.reshape(-1, 1), v, jnp.zeros((), flat.dtype))
    v = v * swgt.astype(flat.dtype)
    out = jnp.sum(
        v.reshape(K, P, m, P, m, C), axis=(2, 4), dtype=jnp.float32
    )
    return out.astype(flat.dtype)
