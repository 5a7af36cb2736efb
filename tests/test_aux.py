"""Tests for auxiliary subsystems: COCO AP, OT distance, ProtoLoss, probe,
events, hooks, schedules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttdg_mgm_tpu.evaluation.coco_eval import COCOEvaluator, bbox_iou_matrix
from ttdg_mgm_tpu.graph.ot import proto_loss, sinkhorn_distance
from ttdg_mgm_tpu.engine.probe import probe_pseudo_labels
from ttdg_mgm_tpu.utils.events import EventStorage, JSONWriter
from ttdg_mgm_tpu.solver.build import (
    warmup_multistep_schedule,
    warmup_two_stage_schedule,
)


class TestCOCOEval:
    def test_perfect_predictions(self):
        ev = COCOEvaluator(iou_types=("bbox",))
        gt = np.array([[10, 10, 50, 50], [60, 60, 90, 90]], np.float64)
        ev.process(det_boxes=gt, det_scores=[0.9, 0.8], det_classes=[0, 1],
                   gt_boxes=gt, gt_classes=[0, 1])
        res = ev.evaluate()["bbox"]
        assert res["AP"] > 99.0 and res["AP50"] > 99.0

    def test_false_positive_lowers_ap(self):
        ev = COCOEvaluator(iou_types=("bbox",))
        gt = np.array([[10, 10, 50, 50]], np.float64)
        det = np.array([[10, 10, 50, 50], [100, 100, 140, 140]], np.float64)
        ev.process(det_boxes=det, det_scores=[0.7, 0.9], det_classes=[0, 0],
                   gt_boxes=gt, gt_classes=[0])
        res = ev.evaluate()["bbox"]
        # higher-scored FP precedes the TP -> precision at the TP is 0.5
        assert 40.0 < res["AP50"] < 60.0

    def test_segm_iou(self):
        a = np.zeros((10, 10), bool)
        a[:5] = True
        b = np.zeros((10, 10), bool)
        b[:5, :5] = True
        ev = COCOEvaluator(iou_types=("segm",))
        ev.process(det_boxes=[[0, 0, 10, 5]], det_scores=[0.9], det_classes=[0],
                   det_masks=[a], gt_boxes=[[0, 0, 5, 5]], gt_classes=[0],
                   gt_masks=[b])
        res = ev.evaluate()["segm"]
        # IoU = 25/50 = 0.5 -> matched at 0.5 only
        assert res["AP50"] > 99.0
        assert res["AP75"] == 0.0

    def test_iscrowd_is_ignore_region(self):
        """pycocotools crowd semantics (reference coco_evaluation.py:598-642):
        a detection matching a crowd GT is neither TP nor FP, and the crowd
        GT never enters the recall denominator."""
        gt_reg = [10.0, 10.0, 50.0, 50.0]
        crowd = [100.0, 100.0, 300.0, 300.0]
        det_tp = gt_reg
        det_in_crowd = [150.0, 150.0, 170.0, 170.0]  # tiny box inside crowd

        # with the crowd annotation: the in-crowd det is IGNORED -> AP 100
        ev = COCOEvaluator(iou_types=("bbox",))
        ev.process(det_boxes=[det_tp, det_in_crowd], det_scores=[0.8, 0.9],
                   det_classes=[0, 0], gt_boxes=[gt_reg, crowd],
                   gt_classes=[0, 0], gt_crowd=[0, 1])
        assert ev.evaluate()["bbox"]["AP"] > 99.0

        # same GT boxes but NOT crowd: higher-scored det matches the large
        # GT only at IoU (20*20)/(200*200) ~ 0.01 -> it's an FP -> AP drops
        ev2 = COCOEvaluator(iou_types=("bbox",))
        ev2.process(det_boxes=[det_tp, det_in_crowd], det_scores=[0.8, 0.9],
                    det_classes=[0, 0], gt_boxes=[gt_reg, crowd],
                    gt_classes=[0, 0], gt_crowd=[0, 0])
        assert ev2.evaluate()["bbox"]["AP"] < 99.0

    def test_crowd_absorbs_multiple_detections(self):
        """A crowd region may ignore ANY number of detections; a regular GT
        matches only the first."""
        crowd = [0.0, 0.0, 100.0, 100.0]
        dets = [[10.0, 10.0, 30.0, 30.0], [40.0, 40.0, 70.0, 70.0],
                [5.0, 60.0, 35.0, 95.0]]
        ev = COCOEvaluator(iou_types=("bbox",))
        ev.process(det_boxes=dets, det_scores=[0.9, 0.8, 0.7],
                   det_classes=[0, 0, 0], gt_boxes=[crowd],
                   gt_classes=[0], gt_crowd=[1])
        res = ev.evaluate()["bbox"]
        # all dets ignored, no valid GT anywhere -> AP undefined (NaN)
        assert np.isnan(res["AP"])

        # add one real GT+TP: the three in-crowd dets must not dilute AP
        ev.process(det_boxes=[[200.0, 200.0, 240.0, 240.0]], det_scores=[0.6],
                   det_classes=[0], gt_boxes=[[200.0, 200.0, 240.0, 240.0]],
                   gt_classes=[0], gt_crowd=[0])
        assert ev.evaluate()["bbox"]["AP"] > 99.0

    def test_crowd_iou_uses_det_area(self):
        """IoU against a crowd GT divides by the DET area: a det fully inside
        a huge crowd still reaches IoU 1.0 (pycocotools iscrowd IoU)."""
        from ttdg_mgm_tpu.evaluation.coco_eval import mask_iou_matrix

        dt = np.array([[10.0, 10.0, 20.0, 20.0]])
        gt = np.array([[0.0, 0.0, 1000.0, 1000.0]])
        assert bbox_iou_matrix(dt, gt, np.array([True]))[0, 0] == 1.0
        assert bbox_iou_matrix(dt, gt, np.array([False]))[0, 0] < 0.001

        dm = np.zeros((32, 32), bool)
        dm[10:20, 10:20] = True
        gm = np.ones((32, 32), bool)
        assert mask_iou_matrix([dm], [gm], np.array([True]))[0, 0] == 1.0
        assert mask_iou_matrix([dm], [gm], np.array([False]))[0, 0] < 0.2

    def test_packed_mask_iou_matches_dense(self):
        rng = np.random.RandomState(0)
        dts = [rng.rand(33, 47) > 0.5 for _ in range(3)]
        gts = [rng.rand(33, 47) > 0.5 for _ in range(4)]
        from ttdg_mgm_tpu.evaluation.coco_eval import mask_iou_matrix

        got = mask_iou_matrix(dts, gts)
        want = np.zeros((3, 4))
        for i, d in enumerate(dts):
            for j, g in enumerate(gts):
                inter = (d & g).sum()
                want[i, j] = inter / (d.sum() + g.sum() - inter)
        np.testing.assert_allclose(got, want, rtol=1e-12)


class TestOT:
    def test_identical_clouds_near_zero(self):
        x = jnp.asarray(np.random.RandomState(0).rand(1, 6, 4))
        cost, pi = sinkhorn_distance(x, x, eps=0.01, max_iter=100)
        assert float(cost[0]) < 1e-3
        np.testing.assert_allclose(float(pi.sum()), 1.0, atol=0.05)

    def test_distance_orders_clouds(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.rand(1, 6, 4))
        near = x + 0.05
        far = x + 2.0
        c_near, _ = sinkhorn_distance(x, near)
        c_far, _ = sinkhorn_distance(x, far)
        assert float(c_near[0]) < float(c_far[0])

    def test_proto_loss_updates_prop(self):
        rng = np.random.RandomState(2)
        mu = jnp.asarray(rng.randn(3, 8), jnp.float32)
        ft = jnp.asarray(rng.randn(10, 8), jnp.float32)
        prop = jnp.full((3, 1), 1 / 3)
        t2p, p2t, new_prop = proto_loss(mu, ft, prop, beta=0.5)
        assert np.isfinite(float(t2p)) and np.isfinite(float(p2t))
        np.testing.assert_allclose(float(new_prop.sum()), 1.0, atol=1e-5)
        assert np.abs(np.asarray(new_prop - prop)).max() > 0


class TestProbe:
    def test_counts(self):
        gt = np.asarray([[[10, 10, 50, 50], [0, 0, 0, 0]]])
        pseudo = np.asarray([[[11, 11, 49, 49], [70, 70, 90, 90]]])
        stats = probe_pseudo_labels(
            pseudo, np.asarray([[0, 1]]), np.asarray([[True, True]]),
            gt, np.asarray([[0, 0]]), np.asarray([[True, False]]),
        )
        assert stats["num_pseudo"] == 2 and stats["true_pos"] == 1
        assert stats["false_pos"] == 1 and stats["cls_accuracy"] == 1.0


class TestEventsAndSchedules:
    def test_storage_and_json(self, tmp_path):
        path = tmp_path / "metrics.json"
        w = JSONWriter(str(path))
        with EventStorage() as st:
            st.put_scalar("loss", 1.5)
            w.write(st)
            st.step()
            st.put_scalar("loss", 1.0)
            w.write(st)
        w.close()
        lines = path.read_text().strip().splitlines()
        assert len(lines) == 2
        import json

        assert json.loads(lines[1])["loss"] == 1.0

    def test_warmup_multistep(self):
        s = warmup_multistep_schedule(0.01, (100, 200), 0.1, warmup_iters=10,
                                      warmup_factor=0.1)
        assert abs(float(s(0)) - 0.001) < 1e-9
        assert abs(float(s(10)) - 0.01) < 1e-9
        assert abs(float(s(150)) - 0.001) < 1e-9
        assert abs(float(s(250)) - 0.0001) < 1e-10

    def test_two_stage(self):
        s = warmup_two_stage_schedule(1.0, (50,), (1.0, 0.5), warmup_iters=0)
        assert float(s(10)) == 1.0
        assert float(s(60)) == 0.5
