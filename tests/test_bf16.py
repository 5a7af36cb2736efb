"""bf16 compute-policy tests: the AMP path must produce finite outputs close
to the f32 path (params stay f32; backbone/FPN/heads compute in bf16)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttdg_mgm_tpu.models.rcnn import MaskRCNN


def tiny(dtype):
    return MaskRCNN(
        num_classes=2, univ_size=8, node_cap_per_level=4,
        pre_nms_topk_train=64, pre_nms_topk_test=64, post_nms_topk=32,
        detections_per_image=8, batch_size_per_image=16, mask_fg_cap=8,
        compute_dtype=dtype,
        resnet_depth=14, gagm_iters=20, hippi_iters=10,
    )


class TestBF16Policy:
    def test_inference_close_to_f32(self):
        images = jnp.ones((1, 64, 64, 3)) * 120.0
        sizes = jnp.asarray([[64.0, 64.0]])
        m32 = tiny("float32")
        params = m32.init(jax.random.PRNGKey(0), images, sizes)
        out32 = m32.apply(params, images, sizes, method=m32.forward_inference)
        m16 = tiny("bfloat16")
        out16 = m16.apply(params, images, sizes, method=m16.forward_inference)
        assert np.isfinite(np.asarray(out16["scores"])).all()
        assert out16["mask_probs"].dtype == jnp.float32
        # scores shift only by bf16 rounding through the conv stack
        np.testing.assert_allclose(
            np.asarray(out16["scores"]), np.asarray(out32["scores"]), atol=0.15
        )

    def test_supervised_losses_finite(self):
        images = jnp.ones((1, 64, 64, 3)) * 100.0
        sizes = jnp.asarray([[64.0, 64.0]])
        gt_boxes = jnp.asarray([[[8.0, 8.0, 40.0, 40.0], [0.0] * 4]])
        gt_classes = jnp.asarray([[0, 0]], jnp.int32)
        gt_valid = jnp.asarray([[True, False]])
        gt_masks = jnp.zeros((1, 2, 32, 32), jnp.uint8).at[0, 0, 4:20, 4:20].set(1)
        m16 = tiny("bfloat16")
        params = m16.init(jax.random.PRNGKey(0), images, sizes)
        losses = m16.apply(
            params, images, sizes, gt_boxes, gt_classes, gt_masks, gt_valid,
            jax.random.PRNGKey(1), method=m16.loss_supervised,
        )
        for k, v in losses.items():
            assert np.isfinite(float(v)), k
            assert jnp.asarray(v).dtype == jnp.float32, k
