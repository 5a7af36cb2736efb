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

    @pytest.mark.slow  # near-duplicate of test_train_integration's
    # norm-clip stability run (that one stays in the default suite)
    def test_from_scratch_training_stable_at_reference_lr(self):
        """From-scratch FrozenBN training at the reference BASE_LR 2.5e-3
        (``seg_res50fpn_source.yaml`` SOLVER) diverged in bf16 before
        gradient clipping existed (bench.py's old LR-1e-3 workaround).  With
        d2 ``SOLVER.CLIP_GRADIENTS`` (value, 1.0) the same run must stay
        finite — the production bench-warmup configuration."""
        from bench import synth_batch
        from ttdg_mgm_tpu.engine.steps import TrainState, make_source_step
        from ttdg_mgm_tpu.solver.build import (build_optimizer,
                                               warmup_multistep_schedule)

        model = tiny("bfloat16")
        b0 = {k: jnp.asarray(v)
              for k, v in synth_batch(np, 64, 2, seed=0, mask_res=32).items()}
        params = model.init(
            jax.random.PRNGKey(0), b0["image"], b0["image_sizes"],
            b0["gt_boxes"], b0["gt_classes"], b0["gt_masks"], b0["gt_valid"],
            jax.random.PRNGKey(1), method=model.loss_supervised)["params"]
        tx = build_optimizer(
            params,
            warmup_multistep_schedule(2.5e-3, (100000,), warmup_iters=4,
                                      warmup_factor=0.05),
            clip_gradients={"ENABLED": True, "CLIP_TYPE": "value",
                            "CLIP_VALUE": 1.0})
        state = TrainState.create(params, tx)
        step = make_source_step(model, tx)
        rng = jax.random.PRNGKey(0)
        for it in range(12):
            batch = {k: jnp.asarray(v)
                     for k, v in synth_batch(np, 64, 2, seed=it,
                                             mask_res=32).items()}
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch, sub)
            lv = float(metrics["total_loss"])
            assert np.isfinite(lv), (it, {k: float(v)
                                          for k, v in metrics.items()})
