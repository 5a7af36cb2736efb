"""Tests for detection ops: boxes, NMS, ROIAlign, mask pasting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttdg_mgm_tpu.ops.boxes import (
    cell_anchors,
    decode_boxes,
    encode_boxes,
    grid_anchors,
    pairwise_iou,
)
from ttdg_mgm_tpu.ops.nms import batched_nms_mask, nms_mask, topk_after_nms
from ttdg_mgm_tpu.ops.roi_align import (
    mask_roi_align,
    multilevel_roi_align,
    roi_align,
)
from ttdg_mgm_tpu.ops.mask_paste import paste_masks, paste_masks_np


def nms_numpy(boxes, scores, thresh):
    """Plain greedy NMS reference (torchvision semantics)."""
    order = np.argsort(-scores)
    keep = []
    sup = np.zeros(len(boxes), bool)
    for i in order:
        if sup[i]:
            continue
        keep.append(i)
        for j in order:
            if sup[j] or j == i:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            iou = inter / (a1 + a2 - inter) if inter > 0 else 0.0
            if iou > thresh and scores[j] < scores[i]:
                sup[j] = True
    return sorted(keep)


class TestBoxes:
    def test_iou_known_values(self):
        b1 = jnp.array([[0, 0, 10, 10]], jnp.float32)
        b2 = jnp.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], jnp.float32)
        iou = np.asarray(pairwise_iou(b1, b2))[0]
        np.testing.assert_allclose(iou, [1.0, 25.0 / 175.0, 0.0], rtol=1e-6)

    def test_encode_decode_roundtrip(self):
        rng = np.random.RandomState(0)
        src = rng.rand(20, 4).astype(np.float32) * 100
        src[:, 2:] = src[:, :2] + 10 + src[:, 2:]
        tgt = src + rng.randn(20, 4).astype(np.float32) * 3
        w = (10.0, 10.0, 5.0, 5.0)
        deltas = encode_boxes(jnp.asarray(src), jnp.asarray(tgt), w)
        back = decode_boxes(deltas, jnp.asarray(src), w)
        np.testing.assert_allclose(np.asarray(back), tgt, atol=1e-3)

    def test_cell_anchors_d2_layout(self):
        c = np.asarray(cell_anchors([32], [0.5, 1.0, 2.0]))
        assert c.shape == (3, 4)
        # ratio 0.5: w = sqrt(1024/0.5), h = 0.5*w
        w = np.sqrt(1024 / 0.5)
        np.testing.assert_allclose(c[0], [-w / 2, -w / 4, w / 2, w / 4], rtol=1e-6)
        np.testing.assert_allclose(c[1], [-16, -16, 16, 16], rtol=1e-6)

    def test_grid_anchors(self):
        c = cell_anchors([32], [1.0])
        g = np.asarray(grid_anchors(2, 3, 16, c))
        assert g.shape == (6, 4)
        np.testing.assert_allclose(g[0], [-16, -16, 16, 16])
        np.testing.assert_allclose(g[1], [0, -16, 32, 16])  # x shifted by stride
        np.testing.assert_allclose(g[3], [-16, 0, 16, 32])  # second row


class TestNMS:
    def test_matches_greedy_reference(self):
        rng = np.random.RandomState(1)
        K = 60
        ctr = rng.rand(K, 2) * 50
        wh = rng.rand(K, 2) * 20 + 5
        boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
        scores = rng.rand(K).astype(np.float32)
        keep = np.asarray(
            nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(K, bool), iou_threshold=0.5)
        )
        ref = nms_numpy(boxes, scores, 0.5)
        assert sorted(np.nonzero(keep)[0].tolist()) == ref

    def test_invalid_never_kept_and_batched_classes(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [0, 0, 10, 10]], jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.7])
        valid = jnp.asarray([True, True, False])
        keep = np.asarray(nms_mask(boxes, scores, valid, iou_threshold=0.5))
        assert keep.tolist() == [True, False, False]
        # different classes do not suppress each other
        cls = jnp.asarray([0, 1, 0])
        keep2 = np.asarray(batched_nms_mask(boxes, scores, cls, valid, iou_threshold=0.5))
        assert keep2.tolist() == [True, True, False]

    def test_topk_after_nms(self):
        boxes = jnp.asarray([[0, 0, 1, 1], [2, 2, 3, 3], [4, 4, 5, 5]], jnp.float32)
        scores = jnp.asarray([0.1, 0.9, 0.5])
        keep = jnp.asarray([True, True, False])
        b, s, idx, v = topk_after_nms(boxes, scores, keep, 2)
        assert np.asarray(idx).tolist() == [1, 0]
        assert np.asarray(v).all()


def roi_align_numpy(feat, rois, scale, out, ratio):
    """Direct per-sample loop implementing the documented aligned semantics."""
    H, W, C = feat.shape
    K = len(rois)
    res = np.zeros((K, out, out, C), np.float32)
    for k, roi in enumerate(rois):
        x1, y1, x2, y2 = roi * scale - 0.5
        bw, bh = (x2 - x1) / out, (y2 - y1) / out
        for i in range(out):
            for j in range(out):
                acc = np.zeros(C, np.float32)
                for si in range(ratio):
                    for sj in range(ratio):
                        y = y1 + (i + (si + 0.5) / ratio) * bh
                        x = x1 + (j + (sj + 0.5) / ratio) * bw
                        if y < -1 or y > H or x < -1 or x > W:
                            continue
                        y_, x_ = np.clip(y, 0, H - 1), np.clip(x, 0, W - 1)
                        y0, x0 = int(np.floor(y_)), int(np.floor(x_))
                        y1b, x1b = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                        ly, lx = y_ - y0, x_ - x0
                        acc += (
                            feat[y0, x0] * (1 - ly) * (1 - lx)
                            + feat[y0, x1b] * (1 - ly) * lx
                            + feat[y1b, x0] * ly * (1 - lx)
                            + feat[y1b, x1b] * ly * lx
                        )
                res[k, i, j] = acc / (ratio * ratio)
    return res


class TestROIAlign:
    def test_matches_reference_loop(self):
        rng = np.random.RandomState(2)
        feat = rng.rand(16, 20, 3).astype(np.float32)
        rois = np.array(
            [[4, 4, 40, 36], [0, 0, 80, 64], [10.5, 3.3, 25.7, 50.1]], np.float32
        )
        out = np.asarray(
            roi_align(jnp.asarray(feat), jnp.asarray(rois), 0.25, output_size=4,
                      sampling_ratio=2)
        )
        ref = roi_align_numpy(feat, rois, 0.25, 4, 2)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_constant_feature_preserved(self):
        feat = jnp.ones((32, 32, 2)) * 3.0
        rois = jnp.asarray([[8, 8, 60, 60]], jnp.float32)
        out = np.asarray(roi_align(feat, rois, 0.25, output_size=7))
        np.testing.assert_allclose(out, 3.0, rtol=1e-6)

    def test_multilevel_selects_by_area(self):
        rng = np.random.RandomState(3)
        feats = [jnp.asarray(rng.rand(64 // (2 ** i), 64 // (2 ** i), 2), jnp.float32)
                 for i in range(4)]
        # small roi -> p2 (floor(4+log2(40/224)) = 1 -> clamp 2);
        # huge roi -> p5 (floor(4+log2(500/224)) = 5)
        rois = jnp.asarray([[0, 0, 40, 40], [0, 0, 500, 500]], jnp.float32)
        out = np.asarray(multilevel_roi_align(feats, rois, output_size=7))
        small = np.asarray(roi_align(feats[0], rois[:1], 1 / 4.0, output_size=7))
        big = np.asarray(roi_align(feats[3], rois[1:], 1 / 32.0, output_size=7))
        np.testing.assert_allclose(out[0], small[0], atol=1e-6)
        np.testing.assert_allclose(out[1], big[0], atol=1e-6)

    def test_multilevel_bf16_matches_f32(self):
        # the pooler keeps interpolation arithmetic in the feature dtype
        # (bandwidth-bound op; see ops/roi_align.py) — bf16 pooling must stay
        # within bf16 tolerance of the f32 result
        rng = np.random.RandomState(7)
        feats = [jnp.asarray(rng.rand(64 // (2 ** i), 64 // (2 ** i), 8), jnp.float32)
                 for i in range(4)]
        rois = jnp.asarray(
            [[0, 0, 40, 40], [5, 3, 200, 180], [0, 0, 500, 500]], jnp.float32
        )
        ref = np.asarray(multilevel_roi_align(feats, rois, output_size=7))
        out = np.asarray(
            multilevel_roi_align(
                [f.astype(jnp.bfloat16) for f in feats], rois, output_size=7
            ).astype(jnp.float32)
        )
        assert out.dtype == np.float32
        np.testing.assert_allclose(out, ref, atol=3e-2, rtol=3e-2)

    def test_packed_matches_unpacked(self):
        # corner-packed rows (training pools) must equal the plain 4-gather
        # path (inference pools) exactly, including border clamp cases
        rng = np.random.RandomState(5)
        feats = [jnp.asarray(rng.rand(32 // (2 ** i), 32 // (2 ** i), 4),
                             jnp.float32) for i in range(4)]
        rois = jnp.asarray(
            [[0, 0, 40, 40], [5, 3, 120, 100], [-10, -10, 20, 20],
             [100, 100, 140, 140], [0, 0, 500, 500]], jnp.float32
        )
        a = np.asarray(multilevel_roi_align(feats, rois, output_size=7,
                                            pack_corners=True))
        b = np.asarray(multilevel_roi_align(feats, rois, output_size=7,
                                            pack_corners=False))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_mask_roi_align_matches_elementwise(self):
        # the matmul formulation (MXU path for GT-mask target cropping) must
        # reproduce the elementwise roi_align bit-for-bit in semantics:
        # same sample grid, border clamp, out-of-range zeroing, 2x2 averaging
        from ttdg_mgm_tpu.ops.roi_align import mask_roi_align

        rng = np.random.RandomState(11)
        masks = rng.rand(5, 24, 24).astype(np.float32)
        boxes = np.array(
            [
                [2.0, 3.0, 20.0, 22.0],
                [0.0, 0.0, 24.0, 24.0],
                [-6.0, -6.0, 10.0, 10.0],   # straddles the border
                [18.0, 18.0, 40.0, 40.0],   # partially out of range
                [5.5, 7.25, 6.5, 9.75],     # sub-pixel box
            ],
            np.float32,
        )
        out = np.asarray(
            mask_roi_align(jnp.asarray(masks), jnp.asarray(boxes),
                           output_size=6, sampling_ratio=2)
        )
        ref = np.stack([
            np.asarray(
                roi_align(jnp.asarray(m)[..., None], jnp.asarray(b)[None], 1.0,
                          output_size=6, sampling_ratio=2)
            )[0, ..., 0]
            for m, b in zip(masks, boxes)
        ])
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_multilevel_edge_clamp_and_oob(self):
        # boxes straddling the border: samples beyond [-1, H] are zero,
        # in-range samples clamp (d2 aligned=True convention) — exercised
        # through the flattened-pyramid index path
        feats = [jnp.ones((16 // (2 ** i), 16 // (2 ** i), 2)) for i in range(4)]
        rois = jnp.asarray([[-20, -20, 30, 30], [50, 50, 80, 80]], jnp.float32)
        out = np.asarray(multilevel_roi_align(feats, rois, output_size=7))
        assert np.isfinite(out).all()
        # fully out-of-range bins of the second roi are zero
        assert out[1].max() <= 1.0 + 1e-6


class TestAdaptiveROIAlign:
    """``sampling_ratio=0`` — d2/torchvision's adaptive ``ceil(bin)`` grid,
    the reference poolers' convention (d2 POOLER_SAMPLING_RATIO default;
    reference ``roi_heads/roi_heads.py:39-44``) — reproduced exactly on the
    static ``ADAPTIVE_CAP`` sample budget for every ROI whose per-axis
    ``ceil(bin) <= cap``; verified against the torch twin's exact (uncapped,
    grouped-by-grid) implementation."""

    def _twin(self):
        import sys
        import os

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import torch_twin

        return torch_twin

    def test_single_level_matches_twin_within_cap(self):
        torch = pytest.importorskip("torch")
        tw = self._twin()
        rng = np.random.RandomState(3)
        feat = rng.randn(40, 56, 8).astype(np.float32)
        # bins spanning ceil(bin) in {1, 2, 3, 4} incl. border straddle
        rois = np.array([
            [10.0, 10.0, 13.0, 12.0],     # ny=nx=1
            [3.2, 4.7, 30.9, 28.3],       # ~3.4 -> 4
            [-5.0, -3.0, 9.0, 11.0],      # straddles, n=2
            [0.0, 0.0, 27.9, 20.9],       # 4.0-epsilon -> 4 / 3
            [5.0, 5.0, 5.0, 5.0],         # degenerate
        ], np.float32)
        for scale in (1.0, 0.5):
            oj = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                      scale, output_size=7, sampling_ratio=0))
            ot = tw.roi_align(torch.from_numpy(feat).permute(2, 0, 1),
                              torch.from_numpy(rois), scale, output_size=7,
                              sampling_ratio=0).permute(0, 2, 3, 1).numpy()
            np.testing.assert_allclose(oj, ot, atol=3e-6)

    def test_multilevel_matches_twin(self):
        torch = pytest.importorskip("torch")
        tw = self._twin()
        rng = np.random.RandomState(4)
        C = 8
        feats = [rng.randn(64, 80, C).astype(np.float32),
                 rng.randn(32, 40, C).astype(np.float32),
                 rng.randn(16, 20, C).astype(np.float32),
                 rng.randn(8, 10, C).astype(np.float32)]
        # compact aspect ratios: d2 level assignment keeps per-axis bins
        # within the cap for these
        rois = np.array([
            [10., 10., 120., 130.],
            [5., 5., 300., 280.],
            [30., 40., 33., 46.],
            [100., 60., 220., 190.],
        ], np.float32)
        tfeats = {f"p{i + 2}": torch.from_numpy(f).permute(2, 0, 1)[None]
                  for i, f in enumerate(feats)}
        mt = tw.multilevel_roi_align(
            tfeats, torch.from_numpy(rois), output_size=7, sampling_ratio=0
        ).permute(0, 2, 3, 1).numpy()
        for pack in (False, True):
            mj = np.asarray(multilevel_roi_align(
                [jnp.asarray(f) for f in feats], jnp.asarray(rois),
                output_size=7, sampling_ratio=0, pack_corners=pack))
            np.testing.assert_allclose(mj, mt, atol=3e-6)

    def test_windowed_kernel_adaptive_matches_gather(self):
        from ttdg_mgm_tpu.ops.pallas.roi_pool_pallas import (
            multilevel_roi_align_windowed,
        )

        rng = np.random.RandomState(5)
        C = 8
        feats = [jnp.asarray(rng.randn(1, 2 ** (6 - i), 2 ** (6 - i), C),
                             jnp.float32) for i in range(4)]
        rois = jnp.asarray(np.array([[[8., 8., 100., 90.],
                                      [4., 12., 250., 230.],
                                      [30., 40., 34., 45.],
                                      [0., 0., 60., 50.]]], np.float32))
        w = np.asarray(multilevel_roi_align_windowed(
            feats, rois, output_size=7, sampling_ratio=0, interpret=True))
        g = np.asarray(jax.vmap(
            lambda fs, b: multilevel_roi_align(
                fs, b, output_size=7, sampling_ratio=0, pack_corners=False)
        )(feats, rois))
        np.testing.assert_allclose(w, g, atol=3e-6)

    def test_mask_roi_align_adaptive(self):
        rng = np.random.RandomState(6)
        masks = rng.rand(3, 24, 24).astype(np.float32)
        boxes = np.array([[2., 3., 20., 22.], [0., 0., 24., 24.],
                          [5.5, 7.25, 6.5, 9.75]], np.float32)
        out = np.asarray(mask_roi_align(jnp.asarray(masks), jnp.asarray(boxes),
                                        output_size=6, sampling_ratio=0))
        ref = np.stack([
            np.asarray(roi_align(jnp.asarray(m)[..., None],
                                 jnp.asarray(b)[None], 1.0, output_size=6,
                                 sampling_ratio=0))[0, ..., 0]
            for m, b in zip(masks, boxes)
        ])
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestMaskPaste:
    def test_full_coverage_box(self):
        mask = jnp.ones((1, 28, 28))
        boxes = jnp.asarray([[2, 2, 30, 30]], jnp.float32)
        out = np.asarray(paste_masks(mask, boxes, height=32, width=32))
        assert out[0, 10, 10] > 0.99
        assert out[0, 0, 0] == 0.0

    def test_device_matches_numpy(self):
        rng = np.random.RandomState(4)
        masks = rng.rand(2, 14, 14).astype(np.float32)
        boxes = np.array([[3.2, 4.1, 20.5, 18.9], [0, 0, 31, 31]], np.float32)
        dev = np.asarray(paste_masks(jnp.asarray(masks), jnp.asarray(boxes),
                                     height=32, width=32))
        host = paste_masks_np(masks, boxes, 32, 32, threshold=0.5)
        np.testing.assert_array_equal((dev >= 0.5).astype(np.uint8), host)
