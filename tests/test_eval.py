"""Tests for the RLE codec and Dice/E/S evaluator."""

import numpy as np

from ttdg_mgm_tpu.evaluation.dice import (
    DiceEvaluator,
    dice_coefficient,
    enhanced_align,
    structure_measure,
)
from ttdg_mgm_tpu.utils.rle import (
    polygons_to_mask,
    rle_decode,
    rle_encode,
    segmentation_to_mask,
)


class TestRLE:
    def test_roundtrip_random(self):
        rng = np.random.RandomState(0)
        for _ in range(5):
            m = (rng.rand(23, 31) > 0.6).astype(np.uint8)
            r = rle_encode(m)
            back = rle_decode(r)
            np.testing.assert_array_equal(m, back)

    def test_roundtrip_edge_cases(self):
        for m in [np.zeros((5, 7), np.uint8), np.ones((5, 7), np.uint8)]:
            np.testing.assert_array_equal(rle_decode(rle_encode(m)), m)

    def test_uncompressed_counts(self):
        # column-major: 3 zeros then 3 ones fills the first 2 columns of 3x2
        m = rle_decode({"size": [3, 2], "counts": [3, 3]})
        expect = np.array([[0, 1], [0, 1], [0, 1]], np.uint8)
        np.testing.assert_array_equal(m, expect)

    def test_polygon_square(self):
        mask = polygons_to_mask([[2, 2, 8, 2, 8, 8, 2, 8]], 12, 12)
        assert mask[5, 5] == 1 and mask[0, 0] == 0
        assert mask.sum() >= 36

    def test_segmentation_dispatch(self):
        m = (np.arange(20).reshape(4, 5) % 3 == 0).astype(np.uint8)
        assert segmentation_to_mask(rle_encode(m), 4, 5).sum() == m.sum()


class TestMetrics:
    def test_dice_perfect_and_disjoint(self):
        a = np.zeros((10, 10), bool)
        a[2:6, 2:6] = True
        assert abs(dice_coefficient(a, a) - 1.0) < 1e-4
        b = np.zeros((10, 10), bool)
        b[7:9, 7:9] = True
        assert dice_coefficient(a, b) == 0.0

    def test_enhanced_align_perfect(self):
        a = np.zeros((20, 20), bool)
        a[5:15, 5:15] = True
        assert enhanced_align(a, a) > 0.99
        assert enhanced_align(a, ~a) < 0.3

    def test_structure_measure_perfect(self):
        a = np.zeros((20, 20), bool)
        a[5:15, 5:15] = True
        s_same = structure_measure(a.astype(float), a)
        s_diff = structure_measure((~a).astype(float), a)
        assert s_same > 0.95
        assert s_diff < s_same

    def test_empty_gt_conventions(self):
        empty = np.zeros((8, 8), bool)
        pred = np.zeros((8, 8), bool)
        # reference quirk: an all-zero pred has adaptive threshold 0, so the
        # binarized map is all ones and the empty-GT branch scores ~0
        assert enhanced_align(pred, empty) < 0.05
        assert structure_measure(pred.astype(float), empty) == 1.0


class TestEvaluator:
    def test_best_match_and_threshold(self):
        gt1 = np.zeros((16, 16), bool)
        gt1[2:8, 2:8] = True
        gt2 = np.zeros((16, 16), bool)
        gt2[10:14, 10:14] = True
        ev = DiceEvaluator(score_threshold=0.5)
        # pred matches gt1 exactly; a low-score pred is dropped
        ev.process(
            pred_masks=[gt1, gt2],
            pred_classes=[0, 1],
            pred_scores=[0.9, 0.2],
            gt_masks=[gt1, gt2],
            gt_classes=[0, 1],
        )
        res = ev.evaluate()
        assert abs(res["Dice Coefficient"] - 100.0) < 0.1
        assert len(ev.dice_scores) == 1

    def test_class_mismatch_scores_zero(self):
        gt = np.zeros((8, 8), bool)
        gt[2:6, 2:6] = True
        ev = DiceEvaluator(score_threshold=0.0)
        ev.process([gt], [1], [0.99], [gt], [0])
        assert ev.dice_scores == [0.0]


class TestVisualize:
    def test_dump_visualization_writes_overlays(self, tmp_path):
        """TEST.DRAW output layout (reference trainer.py:1288-1308 box dumps
        under OUTPUT_DIR/visual, :1376-1406 mask overlays under /masks)."""
        from ttdg_mgm_tpu.utils.visualize import dump_visualization

        img = np.full((32, 48, 3), 20, np.uint8)
        mask = np.zeros((32, 48), bool)
        mask[8:16, 10:20] = True
        det = {
            "boxes": np.asarray([[10.0, 8.0, 20.0, 16.0]]),
            "scores": np.asarray([0.9]),
            "classes": np.asarray([0]),
            "masks": [mask],
        }
        dump_visualization(str(tmp_path), 7, img, det)
        import cv2

        boxed = cv2.imread(str(tmp_path / "visual" / "7.png"))
        masked = cv2.imread(str(tmp_path / "masks" / "7.png"))
        assert boxed.shape == (32, 48, 3) and masked.shape == (32, 48, 3)
        # the overlays actually drew something
        assert (boxed != 20).any() and (masked != 20).any()
