"""Tests for the VGG backbone path and extended probe stats."""

import jax
import jax.numpy as jnp
import numpy as np

from ttdg_mgm_tpu.engine.probe import probe_ood_accuracy, probe_size_distribution
from ttdg_mgm_tpu.models.vgg import VGG16Backbone, VGG16FPNBackbone


class TestVGG:
    def test_strides_and_channels(self):
        x = jnp.zeros((1, 64, 64, 3))
        m = VGG16Backbone()
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out["vgg2"].shape == (1, 16, 16, 128)   # stride 4
        assert out["vgg3"].shape == (1, 8, 8, 256)
        assert out["vgg4"].shape == (1, 4, 4, 512)
        assert out["vgg5"].shape == (1, 2, 2, 512)     # stride 32

    def test_fpn_wrapper_names(self):
        x = jnp.zeros((1, 64, 64, 3))
        m = VGG16FPNBackbone()
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert set(out) == {"res2", "res3", "res4", "res5"}

    def test_maskrcnn_vgg_inference(self):
        from ttdg_mgm_tpu.models.rcnn import MaskRCNN

        model = MaskRCNN(
            num_classes=2, univ_size=8, node_cap_per_level=4,
            pre_nms_topk_test=32, pre_nms_topk_train=32, post_nms_topk=16,
            detections_per_image=4, batch_size_per_image=8, mask_fg_cap=4,
            backbone_name="vgg16",
        )
        imgs = jnp.ones((1, 64, 64, 3)) * 100
        sizes = jnp.asarray([[64.0, 64.0]])
        params = model.init(jax.random.PRNGKey(0), imgs, sizes)
        out = model.apply(params, imgs, sizes, method=model.forward_inference)
        assert out["boxes"].shape == (1, 4, 4)
        assert np.isfinite(np.asarray(out["scores"])).all()


class TestProbeExtras:
    def test_size_distribution(self):
        boxes = np.asarray([[[0, 0, 10, 10], [0, 0, 200, 200], [0, 0, 50, 50]]])
        valid = np.asarray([[True, True, True]])
        s = probe_size_distribution(boxes, valid)
        assert s["num_boxes"] == 3 and s["small"] == 1 and s["large"] == 1
        assert s["medium"] == 1

    def test_ood_accuracy_separation(self):
        gt = np.asarray([[[10, 10, 50, 50]]])
        gt_valid = np.asarray([[True]])
        pseudo = np.asarray([[[11, 11, 49, 49], [100, 100, 140, 140]]])
        scores = np.asarray([[0.95, 0.2]])
        valid = np.asarray([[True, True]])
        s = probe_ood_accuracy(scores, valid, pseudo, gt, gt_valid)
        assert s["num_in"] == 1 and s["num_out"] == 1
        assert s["mean_score_in"] > s["mean_score_out"]
        assert s["score_auc"] == 1.0
