"""Smoke + semantics tests for the Mask R-CNN meta-architecture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttdg_mgm_tpu.models.rcnn import MaskRCNN
from ttdg_mgm_tpu.models.rpn import match_anchors, subsample_labels


def tiny_model(**kw):
    defaults = dict(
        num_classes=2,
        univ_size=8,
        node_cap_per_level=4,
        pre_nms_topk_train=64,
        pre_nms_topk_test=64,
        post_nms_topk=32,
        detections_per_image=8,
        batch_size_per_image=16,
        mask_fg_cap=8,
        # shallow trunk + short solver orbits: these tests check the model's
        # branch semantics, not R50 capacity; XLA:CPU compile is the cost
        resnet_depth=14,
        gagm_iters=20,
        hippi_iters=10,
    )
    defaults.update(kw)
    return MaskRCNN(**defaults)


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_model()
    images = jnp.zeros((1, 64, 64, 3))
    sizes = jnp.asarray([[64.0, 64.0]])
    params = model.init(jax.random.PRNGKey(0), images, sizes)
    return model, params


class TestMaskRCNN:
    def test_inference_shapes(self, model_and_params):
        model, params = model_and_params
        images = jnp.ones((2, 64, 64, 3)) * 127.0
        sizes = jnp.asarray([[64.0, 64.0], [48.0, 60.0]])
        out = model.apply(params, images, sizes, method=model.forward_inference)
        assert out["boxes"].shape == (2, 8, 4)
        assert out["mask_probs"].shape == (2, 8, 28, 28)
        assert np.isfinite(np.asarray(out["scores"])).all()
        # boxes clipped to valid image region
        b1 = np.asarray(out["boxes"][1])
        assert (b1[:, 2] <= 60.0 + 1e-4).all() and (b1[:, 3] <= 48.0 + 1e-4).all()

    def test_supervised_losses(self, model_and_params):
        model, params = model_and_params
        images = jnp.ones((1, 64, 64, 3)) * 100.0
        sizes = jnp.asarray([[64.0, 64.0]])
        gt_boxes = jnp.asarray([[[8.0, 8.0, 40.0, 40.0], [0.0] * 4]])
        gt_classes = jnp.asarray([[0, 0]], jnp.int32)
        gt_valid = jnp.asarray([[True, False]])
        gt_masks = jnp.zeros((1, 2, 32, 32), jnp.uint8).at[0, 0, 4:20, 4:20].set(1)
        losses = model.apply(
            params, images, sizes, gt_boxes, gt_classes, gt_masks, gt_valid,
            jax.random.PRNGKey(1), method=model.loss_supervised,
        )
        expected = {
            "loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg",
            "loss_mask", "loss_matching",
        }
        assert set(losses) == expected
        for k, v in losses.items():
            assert np.isfinite(float(v)), k

    def test_architecture_knobs(self):
        """d2 architecture widths (FPN.OUT_CHANNELS, ROI_BOX_HEAD.FC_DIM /
        NUM_FC, ROI_MASK_HEAD.CONV_DIM / NUM_CONV, ANCHOR_GENERATOR.SIZES)
        reach the heads; the graph node dim follows the FPN width."""
        model = tiny_model(fpn_channels=64, box_fc_dim=128, box_num_fc=1,
                           mask_conv_dim=32, mask_num_conv=2,
                           anchor_sizes=((16,), (32,), (64,), (128,), (256,)))
        images = jnp.ones((1, 64, 64, 3)) * 100.0
        sizes = jnp.asarray([[64.0, 64.0]])
        params = model.init(jax.random.PRNGKey(0), images, sizes)["params"]
        assert params["fpn"]["lateral2"]["kernel"].shape[-1] == 64
        assert params["box_head"]["fc1"]["kernel"].shape[-1] == 128
        assert "fc2" not in params["box_head"]
        assert params["mask_head"]["mask_fcn1"]["kernel"].shape[-1] == 32
        assert "mask_fcn3" not in params["mask_head"]
        assert params["U"].shape == (8, 64)
        loss = model.apply({"params": params}, images, sizes,
                           method=model.loss_ttt)
        assert np.isfinite(float(loss))

    def test_detection_only_mode(self):
        """``mask_on=False`` (reference MODEL.MASK_ON, test_detection.yaml):
        no mask head params, no mask loss, zero mask_probs at inference."""
        model = tiny_model(mask_on=False)
        images = jnp.ones((1, 64, 64, 3)) * 100.0
        sizes = jnp.asarray([[64.0, 64.0]])
        params = model.init(jax.random.PRNGKey(0), images, sizes)
        assert "mask_head" not in params["params"]
        det = model.apply(params, images, sizes, method=model.forward_inference)
        assert float(jnp.abs(det["mask_probs"]).max()) == 0.0
        losses = model.apply(
            params, images, sizes,
            jnp.asarray([[[8.0, 8.0, 40.0, 40.0], [0.0] * 4]]),
            jnp.asarray([[0, 0]], jnp.int32),
            jnp.zeros((1, 2, 32, 32), jnp.uint8),
            jnp.asarray([[True, False]]),
            jax.random.PRNGKey(1), method=model.loss_supervised,
        )
        assert "loss_mask" not in losses
        for k, v in losses.items():
            assert np.isfinite(float(v)), k

    def test_ttt_loss_and_gradient(self, model_and_params):
        model, params = model_and_params
        images = jnp.ones((2, 64, 64, 3)) * 120.0
        sizes = jnp.asarray([[64.0, 64.0]] * 2)

        def f(p):
            return model.apply(p, images, sizes, method=model.loss_ttt)

        loss, grads = jax.value_and_grad(f)(params)
        assert np.isfinite(float(loss))
        g = grads["params"]["backbone"]["res4_0"]["conv1"]["kernel"]
        assert np.isfinite(np.asarray(g)).all()
        # the frozen universe receives no TTA gradient
        assert float(jnp.abs(grads["params"]["U"]).max()) == 0.0

    def test_freeze_at_stops_backward(self, model_and_params):
        """d2 ``MODEL.BACKBONE.FREEZE_AT`` semantics (reference default 2):
        frozen stem/res2 receive EXACTLY zero gradient — torch's
        ``requires_grad=False`` never runs their backward, and the model
        enforces the same via stop_gradient at the freeze boundary
        (``models/resnet.py:ResNet50.freeze_at``) so the TTA step skips the
        highest-resolution backward convs.  Trainable res3+ still get real
        gradients through the same loss."""
        model, params = model_and_params  # default freeze_at=2
        images = jnp.ones((2, 64, 64, 3)) * 120.0
        sizes = jnp.asarray([[64.0, 64.0]] * 2)

        def f(p):
            return model.apply(p, images, sizes, method=model.loss_ttt)

        _, grads = jax.value_and_grad(f)(params)
        g = grads["params"]["backbone"]
        assert float(jnp.abs(g["stem_conv1"]["kernel"]).max()) == 0.0
        assert float(jnp.abs(g["res2_0"]["conv1"]["kernel"]).max()) == 0.0
        assert float(jnp.abs(g["res3_0"]["conv1"]["kernel"]).max()) > 0.0

        # freeze_at=0 restores full backward (same weights)
        m0 = tiny_model(freeze_at=0)
        _, g0 = jax.value_and_grad(
            lambda p: m0.apply(p, images, sizes, method=m0.loss_ttt))(params)
        gb0 = g0["params"]["backbone"]
        assert float(jnp.abs(gb0["res2_0"]["conv1"]["kernel"]).max()) > 0.0

    def test_domain_loss_reverses_gradient(self, model_and_params):
        model, params = model_and_params
        images = jnp.ones((1, 64, 64, 3)) * 80.0

        def f(p):
            l = model.apply(p, images, images, method=model.loss_domain)
            return l["loss_D_img_s"] + l["loss_D_img_t"]

        val, grads = jax.value_and_grad(f)(params)
        assert np.isfinite(float(val))
        # discriminator gets a normal gradient; backbone gets the reversed one
        gd = grads["params"]["D_img"]["classifier"]["kernel"]
        gb = grads["params"]["backbone"]["stem_conv1"]["kernel"]
        assert np.abs(np.asarray(gd)).max() > 0
        assert np.isfinite(np.asarray(gb)).all()


class TestRPNMatching:
    def test_match_anchors_thresholds(self):
        anchors = jnp.asarray(
            [[0, 0, 10, 10], [0, 0, 9, 11], [50, 50, 60, 60], [0, 0, 4, 4]],
            jnp.float32,
        )
        gt = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        labels, matched = match_anchors(anchors, gt, jnp.asarray([True]))
        l = np.asarray(labels)
        assert l[0] == 1          # IoU 1.0 -> positive
        assert l[2] == 0          # IoU 0 -> negative
        assert (matched >= 0).all()

    def test_low_quality_match(self):
        # no anchor reaches 0.7, but the best one for the gt becomes positive
        anchors = jnp.asarray([[0, 0, 6, 10], [20, 20, 30, 30]], jnp.float32)
        gt = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        labels, _ = match_anchors(anchors, gt, jnp.asarray([True]))
        assert np.asarray(labels)[0] == 1

    def test_subsample_counts(self):
        labels = jnp.asarray([1] * 300 + [0] * 500 + [-1] * 100)
        sel, pos_sel = subsample_labels(labels, jax.random.PRNGKey(0), 256, 0.5)
        assert int(jnp.sum(pos_sel)) == 128
        assert int(jnp.sum(sel)) == 256
