"""Windowed-DMA multi-level ROIAlign: the Pallas kernel for the inference
pool (the TTA step's hottest op).

Replaces the XLA row-gather FPN pooler (``ops/roi_align.py:
multilevel_roi_align``) on the forward-only pooling paths.  Identical
sampling semantics (d2 ``ROIAlign(aligned=True)``: half-pixel shift, n x n
bilinear samples per bin averaged, out-of-range zero / in-range border
clamp; reference call sites ``roi_heads/roi_heads.py:39-44,182``).

Why a kernel: the gather formulation is row-TRANSACTION-bound on the TPU
gather unit (~54 Mrows/s at 512 B rows, measured) -- the 4 x 1000-ROI
flagship pool issues ~3.1M single-row transactions and costs ~43 ms of a
~70 ms TTA step.  But each ROI's 7x7x2x2 sample grid lives inside ONE
small contiguous window of its assigned FPN level, so the kernel instead:

1. host-side (XLA, vectorized): assigns levels, computes per-ROI
   ``(WINY, WINX)`` window origins inside a row-concatenated "level
   atlas" (x origin 8-aligned for Mosaic's sublane-tile divisibility),
   and folds the full bilinear/validity/bin-average structure into a
   per-ROI interpolation matrix ``W (P*P, WINY*WINX)`` (2 nonzero diads
   per sample; exactly ``_interp_matrix``'s construction, both axes);
2. in-kernel: double-buffered async DMA of each ROI's ``(WINY, WINX, C)``
   window HBM->VMEM (a strided block copy at full HBM bandwidth instead
   of 784 row transactions), then ONE fused MXU matmul
   ``W @ window.reshape(WINY*WINX, C)`` -> all ``P*P`` outputs of that ROI.

The ``(WINY, WINX, C) -> (WINY*WINX, C)`` view is a free sublane-collapse
(C is a lane multiple, WINX a sublane multiple), so the kernel has no
relayouts.

Elongated-ROI fallback: d2's area-based level assignment bounds the
window AREA (sqrt(wh)/stride < 28 for unclamped levels) but not its
aspect, so a (w >> h) ROI can exceed a 32-wide window.  ROIs whose
clamped corner span exceeds the window are re-pooled exactly by the
gather path on a fixed per-image budget (``misfit_budget``); beyond the
budget they keep the window result, whose samples clamp to the window
edge (documented approximation; in the medical-domain benchmarks boxes
are compact and misfits are empty).

Gradients: forward-only by design.  Callers (`models/rcnn.py:_pool`) use
it on inference/TTA paths where detections are ``stop_gradient``-ed
before any loss, so XLA prunes the (undefined) backward; training pools
keep the differentiable corner-packed gather path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ttdg_mgm_tpu.ops.roi_align import assign_fpn_levels, multilevel_roi_align

WINY = 32   # window rows: covers corner spans <= 31 level pixels
WINX = 40   # window cols: 31-span + 7 alignment slack (x origin is aligned
# down to a multiple of 8: Mosaic requires dynamic starts in the sublane
# dimension to be provably divisible by the tile)


def use_windowed_pool() -> bool:
    """Kernel gate: on by default on real accelerators, off on CPU (tests
    and the virtual multi-chip mesh use the XLA gather pooler; Mosaic has
    no CPU target outside interpret mode).  Override: TTDG_WINDOWED_POOL=0/1.

    Under multi-chip ``jit`` with sharded inputs the ``pallas_call`` is not
    partition-annotated — wrap the step in ``shard_map`` (the DP trainers'
    per-device view) so the kernel sees per-shard shapes.
    """
    env = os.environ.get("TTDG_WINDOWED_POOL")
    if env is not None:
        return env not in ("0", "false", "False")
    from ttdg_mgm_tpu.utils.platform import is_tpu_backend

    return is_tpu_backend()


def _axis_weights(coords, weights, limit, w0, n, win):
    """Fold one axis of the sample grid into interpolation weights.

    coords ``(R, P*n)`` absolute level-pixel sample positions, weights
    ``(R, P*n)`` per-sample bin-average weights (``_axis_samples``; 1/n for
    the static grid, adaptive-masked for ``sampling_ratio=0``); limit
    ``(R,)`` true level extent along the axis; w0 ``(R,)`` int window
    origin.  Returns ``(w (R, P, win) f32, max_corner (R,) f32)`` where
    ``w[r, p]`` holds the weighted bilinear weights of output bin ``p``
    over window positions and ``max_corner`` is the largest in-window
    corner index actually referenced (fit check: ``<= win - 1``).
    """
    limit = limit[:, None]
    valid = (coords > -1.0) & (coords < limit)
    c = jnp.clip(coords, 0.0, limit - 1.0)
    rel = c - w0[:, None].astype(jnp.float32)
    c0 = jnp.floor(rel)
    c1 = jnp.minimum(c0 + 1.0, limit - 1.0 - w0[:, None].astype(jnp.float32))
    frac = rel - c0
    max_corner = jnp.max(jnp.where(valid, c1, 0.0), axis=1)
    c0 = jnp.clip(c0, 0.0, win - 1)
    c1 = jnp.clip(c1, 0.0, win - 1)
    iota = jnp.arange(win, dtype=jnp.float32)
    m = (iota == c0[..., None]) * (1.0 - frac)[..., None] + (
        iota == c1[..., None]
    ) * frac[..., None]
    m = jnp.where(valid[..., None], m * weights[..., None], 0.0)
    r, pn, _ = m.shape
    return jnp.sum(m.reshape(r, pn // n, n, win), axis=2), max_corner


def _pool_kernel(bidx_ref, wy0_ref, wx0_ref, ry_ref, cx_ref, atlas_ref,
                 out_ref, win_scratch, sems):
    i = pl.program_id(0)
    nprog = pl.num_programs(0)

    def window_dma(j, slot):
        return pltpu.make_async_copy(
            atlas_ref.at[bidx_ref[j], pl.ds(wy0_ref[j], WINY),
                         pl.ds(pl.multiple_of(wx0_ref[j], 8), WINX), :],
            win_scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        window_dma(0, 0).start()

    @pl.when(i + 1 < nprog)
    def _():
        window_dma(i + 1, (i + 1) % 2).start()

    slot = i % 2
    window_dma(i, slot).wait()
    C = win_scratch.shape[-1]
    P = ry_ref.shape[1]
    # separable bilinear contraction: out[p,q,c] = sum_yx ry[p,y] cx[q,x] win
    win = win_scratch[slot].reshape(WINY, WINX * C)
    tmp = jnp.dot(ry_ref[0], win, preferred_element_type=jnp.float32)
    tmp = tmp.reshape(P, WINX, C)
    rows = [
        jnp.dot(cx_ref[0], tmp[p], preferred_element_type=jnp.float32)
        for p in range(P)
    ]  # P x (P, C), unrolled: P is 7/14
    out_ref[0] = jnp.concatenate(rows, axis=0).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("strides", "output_size", "sampling_ratio", "min_level",
                     "misfit_budget", "interpret"),
)
def multilevel_roi_align_windowed(
    feats, rois, *, strides=(4, 8, 16, 32), output_size: int = 7,
    sampling_ratio: int = 2, min_level: int = 2, misfit_budget: int = 16,
    interpret: bool = False,
):
    """Batched FPN pooler: feats ``[(B, H_l, W_l, C)]``, rois ``(B, K, 4)``
    -> ``(B, K, P, P, C)``.  See module docstring.

    Differentiation: declared-zero tangent (``custom_jvp``) — the pool's
    consumers on every call site are discretized detections behind a
    ``stop_gradient``, so the true cotangent is zero; the declaration only
    lets autodiff trace *through* the surrounding function (``jax.grad`` of
    the TTA loss linearizes the whole primal before pruning, and
    ``pallas_call`` has no JVP rule).  Do NOT use on a pool whose output
    feeds a loss — training pools use the corner-packed gather path.
    """
    cfg = (tuple(strides), output_size, sampling_ratio, min_level,
           misfit_budget, interpret)
    return _windowed_nodiff(cfg, list(feats), rois)


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def _windowed_nodiff(cfg, feats, rois):
    strides, output_size, sampling_ratio, min_level, misfit_budget, interp = cfg
    return _windowed_impl(
        feats, rois, strides=strides, output_size=output_size,
        sampling_ratio=sampling_ratio, min_level=min_level,
        misfit_budget=misfit_budget, interpret=interp,
    )


@_windowed_nodiff.defjvp
def _windowed_nodiff_jvp(cfg, primals, tangents):
    out = _windowed_nodiff(cfg, *primals)
    return out, jnp.zeros_like(out)


def _atlas_layout(feats):
    """Static layout of the row-concatenated level atlas."""
    Wmax = -(-max(max(f.shape[2] for f in feats), WINX) // 8) * 8
    Hpad = [max(f.shape[1], WINY) for f in feats]
    return Hpad, Wmax


def _build_atlas(feats, Hpad, Wmax):
    """Levels row-concatenated, padded to fit a window.  Pure XLA pad/concat:
    differentiable, so autodiff slices an atlas cotangent back into
    per-level feature cotangents with no extra code."""
    return jnp.concatenate(
        [
            jnp.pad(f, ((0, 0), (0, hp - f.shape[1]), (0, Wmax - f.shape[2]),
                        (0, 0)))
            for f, hp in zip(feats, Hpad)
        ],
        axis=1,
    )


def _window_geometry(feats, rois, *, strides, output_size, sampling_ratio,
                     min_level, Hpad, Wmax, dtype):
    """Per-ROI window placement + fused interpolation matrix (host-side XLA,
    vectorized).  Returns ``(w_mat, bidx, wy0g, wx0, max_cy, max_cx)``."""
    B, K = rois.shape[:2]
    P, n = output_size, sampling_ratio
    L = len(feats)
    row_off = jnp.asarray([sum(Hpad[:l]) for l in range(L)], jnp.int32)

    flat_rois = rois.reshape(B * K, 4)
    lvl = assign_fpn_levels(
        flat_rois, min_level=min_level, max_level=min_level + L - 1
    ) - min_level
    Hs = jnp.asarray([f.shape[1] for f in feats], jnp.float32)[lvl]
    Ws = jnp.asarray([f.shape[2] for f in feats], jnp.float32)[lvl]
    Hp = jnp.asarray(Hpad, jnp.float32)[lvl]
    scale = 1.0 / jnp.asarray(strides, jnp.float32)[lvl]

    b = flat_rois * scale[:, None] - 0.5  # aligned=True half-pixel shift
    bin_w = (b[:, 2] - b[:, 0]) / P
    bin_h = (b[:, 3] - b[:, 1]) / P
    from ttdg_mgm_tpu.ops.roi_align import _axis_samples

    ys, wgt_y, m = _axis_samples(b[:, 1], bin_h, P, n)  # (BK, P*m)
    xs, wgt_x, _ = _axis_samples(b[:, 0], bin_w, P, n)

    # window origin from the ROI start (b), not the first sample: adaptive
    # first samples sit deeper inside bin 0 than static ones, but corners
    # floor back toward b
    wy0 = jnp.clip(jnp.floor(jnp.clip(b[:, 1], 0.0, Hs - 1.0)), 0.0,
                   Hp - WINY).astype(jnp.int32)
    # x origin aligned down to a multiple of 8 (Mosaic sublane-tile
    # divisibility for the dynamic DMA start); WINX absorbs the slack
    wx0 = jnp.clip(jnp.floor(jnp.clip(b[:, 0], 0.0, Ws - 1.0)), 0.0,
                   Wmax - WINX).astype(jnp.int32)
    wx0 = (wx0 // 8) * 8
    ry, max_cy = _axis_weights(ys, wgt_y, Hs, wy0, m, WINY)  # (BK, P, WINY)
    cx, max_cx = _axis_weights(xs, wgt_x, Ws, wx0, m, WINX)  # (BK, P, WINX)
    # NOTE: the fused (P*P, WINY*WINX) interpolation matrix is deliberately
    # NOT materialized: at 4000 ROIs it is ~250M elements of HBM write+read
    # traffic per pool.  The bilinear weights are separable, so the kernels
    # take ry/cx (~2 MB total) and contract the axes with two small matmuls.
    bidx = (jnp.arange(B * K, dtype=jnp.int32) // K)
    wy0g = row_off[lvl] + wy0
    return (ry.astype(dtype), cx.astype(dtype), bidx, wy0g, wx0,
            max_cy, max_cx)


def _pool_call(atlas, ry, cx, bidx, wy0g, wx0, *, P, C, dtype, interpret):
    BK = ry.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(BK,),
        in_specs=[
            pl.BlockSpec((1, P, WINY), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, WINX), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, P * P, C), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, WINY, WINX, C), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _pool_kernel,
        out_shape=jax.ShapeDtypeStruct((BK, P * P, C), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bidx, wy0g, wx0, ry, cx, atlas)


def _windowed_impl(
    feats, rois, *, strides, output_size, sampling_ratio, min_level,
    misfit_budget, interpret,
):
    B, K = rois.shape[:2]
    C = feats[0].shape[-1]
    P, n = output_size, sampling_ratio
    dtype = feats[0].dtype

    Hpad, Wmax = _atlas_layout(feats)
    atlas = _build_atlas(feats, Hpad, Wmax)
    ry, cx, bidx, wy0g, wx0, max_cy, max_cx = _window_geometry(
        feats, rois, strides=strides, output_size=output_size,
        sampling_ratio=sampling_ratio, min_level=min_level, Hpad=Hpad,
        Wmax=Wmax, dtype=dtype,
    )
    out = _pool_call(atlas, ry, cx, bidx, wy0g, wx0, P=P, C=C, dtype=dtype,
                     interpret=interpret)
    out = out.reshape(B, K, P, P, C)

    # ---- exact gather-path fallback for window misfits (elongated ROIs)
    F = min(misfit_budget, K)
    if F > 0:
        misfit = ((max_cy > WINY - 1) | (max_cx > WINX - 1)).reshape(B, K)

        def one_image(fs, rb, mb):
            score = mb.astype(jnp.float32) - jnp.arange(K) * 1e-9
            _, idx = jax.lax.top_k(score, F)
            sub = multilevel_roi_align(
                fs, rb[idx], strides=strides, output_size=P,
                sampling_ratio=n, min_level=min_level, pack_corners=False,
            )
            return idx, sub, mb[idx]

        idxs, subs, sel = jax.vmap(one_image)(feats, rois, misfit)

        def merge(o, idx, sub, s):
            keep = jnp.where(s[:, None, None, None], sub.astype(o.dtype),
                             o[idx])
            return o.at[idx].set(keep)

        out = jax.vmap(merge)(out, idxs, subs, sel)
    return out


# --------------------------------------------------------------- train pool
def use_windowed_train_pool() -> bool:
    """Gate for the DIFFERENTIABLE windowed training pooler.  ON by default
    on real accelerators since round 5: measured 249.9 ms vs 682.5 ms per
    800px batch-8 source step against the adaptive-grid gather pooler (and
    vs 310 ms for the legacy static-2 gather) — the windowed kernels'
    cost is sampling-grid-independent, so the adaptive (ratio-0) training
    pools come for free.  Off on CPU (tests use the XLA gather pooler;
    forward+grad parity is pinned in tests/test_pallas.py).  Override:
    TTDG_WINDOWED_TRAIN_POOL=0/1."""
    env = os.environ.get("TTDG_WINDOWED_TRAIN_POOL")
    if env is not None:
        return env not in ("0", "false", "False")
    from ttdg_mgm_tpu.utils.platform import is_tpu_backend

    return is_tpu_backend()


def _scatter_kernel(bidx_ref, wy0_ref, wx0_ref, ry_ref, cx_ref, g_ref,
                    zeros_ref, out_ref, win_scratch, sems):
    """Backward: per-ROI window read-modify-write accumulation.

    d(atlas)[y,x,c] += sum_pq ry[p,y] cx[q,x] g[p,q,c], contracted
    separably.  Windows of different ROIs OVERLAP, so each grid step does a
    strictly blocking read -> add -> write on the output atlas (no double
    buffering; correctness over latency).  ``zeros_ref`` is
    input-output-aliased to ``out_ref`` so the accumulator starts zeroed."""
    del zeros_ref
    i = pl.program_id(0)
    C = win_scratch.shape[-1]
    P = ry_ref.shape[1]

    window = out_ref.at[bidx_ref[i], pl.ds(wy0_ref[i], WINY),
                        pl.ds(pl.multiple_of(wx0_ref[i], 8), WINX), :]
    read = pltpu.make_async_copy(window, win_scratch, sems.at[0])
    read.start()
    read.wait()
    g = g_ref[0].reshape(P, P * C)
    # u[y, q, c] = sum_p ry[p, y] g[p, q, c]
    u = jnp.dot(ry_ref[0].T, g, preferred_element_type=jnp.float32)
    u = u.reshape(WINY, P, C)
    # upd[y, x, c] = sum_q cx[q, x] u[y, q, c]   (unrolled over y-tiles is
    # too many dots; contract q per y-row via one transposed matmul each of
    # the P q-planes instead: upd = sum_q cx[q]^T outer u[:, q, :])
    upd = jnp.zeros((WINY, WINX, C), jnp.float32)
    for q in range(P):
        # f32 before the [None, :, None] reshape: Mosaic only supports
        # non-no-op minor-dim insertion for 32-bit types (bf16 weights here
        # crashed the TPU compile)
        cx_q = cx_ref[0, q].astype(jnp.float32)
        upd = upd + cx_q[None, :, None] * u[:, q, :][:, None, :]
    win_scratch[...] = win_scratch[...] + upd.astype(win_scratch.dtype)
    write = pltpu.make_async_copy(win_scratch, window, sems.at[0])
    write.start()
    write.wait()


def _scatter_call(g, ry, cx, bidx, wy0g, wx0, atlas_shape, *, P, C, dtype,
                  interpret):
    BK = ry.shape[0]
    zeros = jnp.zeros(atlas_shape, dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(BK,),
        in_specs=[
            pl.BlockSpec((1, P, WINY), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, WINX), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P * P, C), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((WINY, WINX, C), dtype),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    return pl.pallas_call(
        _scatter_kernel,
        out_shape=jax.ShapeDtypeStruct(atlas_shape, dtype),
        grid_spec=grid_spec,
        input_output_aliases={6: 0},  # zeros atlas (3 scalars + 3 tensors) -> out
        interpret=interpret,
    )(bidx, wy0g, wx0, ry, cx, g, zeros)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pool_from_atlas(cfg, atlas, ry, cx, bidx, wy0g, wx0):
    P, C, dtype_name, interpret = cfg
    return _pool_call(atlas, ry, cx, bidx, wy0g, wx0, P=P, C=C,
                      dtype=jnp.dtype(dtype_name), interpret=interpret)


def _pool_from_atlas_fwd(cfg, atlas, ry, cx, bidx, wy0g, wx0):
    out = _pool_from_atlas(cfg, atlas, ry, cx, bidx, wy0g, wx0)
    return out, (ry, cx, bidx, wy0g, wx0, atlas.shape)


def _pool_from_atlas_bwd(cfg, res, g):
    P, C, dtype_name, interpret = cfg
    ry, cx, bidx, wy0g, wx0, atlas_shape = res
    dtype = jnp.dtype(dtype_name)
    datlas = _scatter_call(
        g.astype(dtype), ry, cx, bidx, wy0g, wx0, atlas_shape,
        P=P, C=C, dtype=dtype, interpret=interpret,
    )
    f0 = jax.dtypes.float0
    return (datlas, jnp.zeros_like(ry), jnp.zeros_like(cx),
            np.zeros(bidx.shape, f0), np.zeros(wy0g.shape, f0),
            np.zeros(wx0.shape, f0))


_pool_from_atlas.defvjp(_pool_from_atlas_fwd, _pool_from_atlas_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("strides", "output_size", "sampling_ratio", "min_level",
                     "misfit_budget", "interpret"),
)
def multilevel_roi_align_windowed_train(
    feats, rois, *, strides=(4, 8, 16, 32), output_size: int = 7,
    sampling_ratio: int = 2, min_level: int = 2, misfit_budget: int = 16,
    interpret: bool = False,
):
    """DIFFERENTIABLE windowed pooler for training pools: identical sampling
    semantics to ``multilevel_roi_align_windowed``, but with a Pallas
    backward (per-ROI windowed scatter-accumulate, ``_scatter_kernel``)
    instead of XLA's row-transaction-bound scatter-add.  Misfit ROIs merge
    through the exact differentiable gather path — their cotangent reaches
    it automatically because ``.at[idx].set`` zeroes the windowed cotangent
    at replaced positions."""
    feats = list(feats)
    B, K = rois.shape[:2]
    C = feats[0].shape[-1]
    P, n = output_size, sampling_ratio
    dtype = feats[0].dtype

    Hpad, Wmax = _atlas_layout(feats)
    atlas = _build_atlas(feats, Hpad, Wmax)
    ry, cx, bidx, wy0g, wx0, max_cy, max_cx = _window_geometry(
        feats, rois, strides=strides, output_size=output_size,
        sampling_ratio=sampling_ratio, min_level=min_level, Hpad=Hpad,
        Wmax=Wmax, dtype=dtype,
    )
    cfg = (P, C, jnp.dtype(dtype).name, interpret)
    out = _pool_from_atlas(
        cfg, atlas, jax.lax.stop_gradient(ry), jax.lax.stop_gradient(cx),
        jax.lax.stop_gradient(bidx), jax.lax.stop_gradient(wy0g),
        jax.lax.stop_gradient(wx0)
    ).reshape(B, K, P, P, C)

    F = min(misfit_budget, K)
    if F > 0:
        misfit = ((max_cy > WINY - 1) | (max_cx > WINX - 1)).reshape(B, K)

        def one_image(fs, rb, mb):
            score = mb.astype(jnp.float32) - jnp.arange(K) * 1e-9
            _, idx = jax.lax.top_k(score, F)
            sub = multilevel_roi_align(
                fs, rb[idx], strides=strides, output_size=P,
                sampling_ratio=n, min_level=min_level, pack_corners=False,
            )
            return idx, sub, mb[idx]

        idxs, subs, sel = jax.vmap(one_image)(feats, rois, misfit)

        def merge(o, idx, sub, s):
            keep = jnp.where(s[:, None, None, None], sub.astype(o.dtype),
                             o[idx])
            return o.at[idx].set(keep)

        out = jax.vmap(merge)(out, idxs, subs, sel)
    return out
