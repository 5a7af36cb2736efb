"""Tests for capability-parity extras: SupCon, GumbelSinkhorn, hypergraph,
VOC eval, cross-domain head, visualization."""

import jax
import jax.numpy as jnp
import numpy as np

from ttdg_mgm_tpu.graph.contrastive import sup_con_loss
from ttdg_mgm_tpu.graph.cross_domain import CrossDomainGraphHead
from ttdg_mgm_tpu.graph.hypergraph import HyperGraphBlock, knn_hypergraph_laplacian
from ttdg_mgm_tpu.ops.sinkhorn import gumbel_sinkhorn
from ttdg_mgm_tpu.evaluation.pascal_voc import PascalVOCDetectionEvaluator, voc_ap


class TestSupCon:
    def test_same_class_lower_loss(self):
        rng = np.random.RandomState(0)
        base = rng.randn(4, 8)
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        feats = jnp.asarray(np.stack([base, base], axis=1), jnp.float32)
        # all same label -> many positives; distinct labels -> only own view
        l_same = float(sup_con_loss(feats, labels=jnp.zeros(4, jnp.int32)))
        l_diff = float(sup_con_loss(feats, labels=jnp.arange(4)))
        assert np.isfinite(l_same) and np.isfinite(l_diff)
        assert l_diff != l_same


class TestGumbelSinkhorn:
    def test_samples_are_ds(self):
        s = jnp.asarray(np.random.RandomState(0).randn(2, 5, 5), jnp.float32)
        out = gumbel_sinkhorn(s, jax.random.PRNGKey(0), tau=0.5, max_iter=40,
                              sample_num=3)
        assert out.shape == (3, 2, 5, 5)
        np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=5e-2)
        # samples differ
        assert float(jnp.abs(out[0] - out[1]).max()) > 1e-4


class TestHypergraph:
    def test_laplacian_and_block(self):
        x = jnp.asarray(np.random.RandomState(1).randn(12, 6), jnp.float32)
        G = knn_hypergraph_laplacian(x, 4)
        assert G.shape == (12, 12)
        assert np.isfinite(np.asarray(G)).all()
        blk = HyperGraphBlock(hidden=6, k_neig=4)
        params = blk.init(jax.random.PRNGKey(0), x)
        out = blk.apply(params, x)
        assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


class TestVOC:
    def test_voc_ap_perfect(self):
        r = np.array([0.5, 1.0])
        p = np.array([1.0, 1.0])
        assert abs(voc_ap(r, p) - 1.0) < 1e-6

    def test_evaluator(self):
        ev = PascalVOCDetectionEvaluator(["a", "b"])
        gt = np.array([[0, 0, 10, 10], [20, 20, 40, 40]])
        ev.process(det_boxes=gt, det_scores=[0.9, 0.8], det_classes=[0, 1],
                   gt_boxes=gt, gt_classes=[0, 1])
        res = ev.evaluate()["bbox"]
        assert res["AP50"] > 99.0

    def test_subset(self):
        ev = PascalVOCDetectionEvaluator(["a", "b"], eval_class_subset=["b"])
        gt = np.array([[0, 0, 10, 10]])
        ev.process(det_boxes=gt, det_scores=[0.9], det_classes=[1],
                   gt_boxes=gt, gt_classes=[1])
        res = ev.evaluate()["bbox"]
        assert list(res["per_class"]) == ["b"]


class TestCrossDomainHead:
    def test_losses_and_gradients(self):
        rng = np.random.RandomState(2)
        M, D, C = 10, 16, 2
        src = jnp.asarray(rng.randn(M, D), jnp.float32)
        tgt = jnp.asarray(rng.randn(M, D), jnp.float32)
        mask = jnp.asarray([True] * 7 + [False] * 3)
        labels = jnp.where(mask, (jnp.arange(M) % C) + 1, 0)
        head = CrossDomainGraphHead(num_classes=C, dim=D)
        params = head.init(jax.random.PRNGKey(0), src, labels, mask, tgt,
                           labels, mask)

        def f(p, s):
            losses, _ = head.apply(p, s, labels, mask, tgt, labels, mask)
            return sum(losses.values())

        val, g = jax.value_and_grad(f, argnums=1)(params, src)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_node_completion(self):
        """Classes present in one domain only get hallucinated counterparts."""
        rng = np.random.RandomState(5)
        M, D, C = 8, 16, 2
        src = jnp.asarray(rng.randn(M, D), jnp.float32)
        tgt = jnp.asarray(rng.randn(M, D), jnp.float32)
        mask = jnp.ones(M, bool)
        src_labels = jnp.ones(M, jnp.int32)       # class 1 only
        tgt_labels = jnp.full((M,), 2, jnp.int32)  # class 2 only
        head = CrossDomainGraphHead(num_classes=C, dim=D)
        params = head.init(jax.random.PRNGKey(0), src, src_labels, mask, tgt,
                           tgt_labels, mask, completion_rng=jax.random.PRNGKey(5))
        assert "seed_project" in params["params"]
        losses, centers = head.apply(
            params, src, src_labels, mask, tgt, tgt_labels, mask,
            completion_rng=jax.random.PRNGKey(5),
        )
        for v in losses.values():
            assert np.isfinite(float(v))

    def test_center_update(self):
        rng = np.random.RandomState(3)
        M, D, C = 6, 8, 2
        src = jnp.asarray(rng.randn(M, D), jnp.float32)
        mask = jnp.ones(M, bool)
        labels = (jnp.arange(M) % C) + 1
        head = CrossDomainGraphHead(num_classes=C, dim=D)
        params = head.init(jax.random.PRNGKey(0), src, labels, mask, src,
                           labels, mask)
        _, centers1 = head.apply(params, src, labels, mask, src, labels, mask)
        _, centers2 = head.apply(params, src, labels, mask, src, labels, mask,
                                 centers1)
        assert np.abs(np.asarray(centers1)).max() > 0
        assert not np.allclose(np.asarray(centers1), np.asarray(centers2))
