"""Training integration: source steps reduce losses on a synthetic dataset;
the mean-teacher step + EMA update run end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttdg_mgm_tpu.engine.steps import (
    TrainState,
    ema_update,
    make_mt_step,
    make_source_step,
    threshold_pseudo_labels,
)
from ttdg_mgm_tpu.models.rcnn import MaskRCNN
from ttdg_mgm_tpu.solver.build import build_optimizer


def optax_global_norm(tree):
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(tree)))


def tiny_model():
    # pixel_std ~57 (d2's non-caffe convention): the default caffe stats
    # (std=1) assume PRETRAINED first-layer weights that absorb the input
    # scale; with random init they make logits ~30x too large and the first
    # SGD step diverges. The reference never trains from scratch.
    return MaskRCNN(
        num_classes=2, univ_size=8, node_cap_per_level=4,
        pre_nms_topk_train=32, pre_nms_topk_test=32, post_nms_topk=16,
        detections_per_image=4, batch_size_per_image=16, mask_fg_cap=4,
        pixel_mean=(103.5, 116.3, 123.7), pixel_std=(57.4, 57.1, 58.4),
        resnet_depth=14, gagm_iters=20, hippi_iters=10,
    )


def synth_batch(key, B=2, size=64):
    """Images with one bright square each + matching GT."""
    imgs = jnp.full((B, size, size, 3), 40.0)
    boxes = jnp.tile(jnp.asarray([[[12.0, 12.0, 44.0, 44.0], [0.0] * 4]]), (B, 1, 1))
    for b in range(B):
        imgs = imgs.at[b, 12:44, 12:44, :].set(200.0)
    masks = jnp.zeros((B, 2, 32, 32), jnp.uint8).at[:, 0, 6:22, 6:22].set(1)
    return {
        "image": imgs,
        "image_sizes": jnp.tile(jnp.asarray([[float(size)] * 2]), (B, 1)),
        "gt_boxes": boxes,
        "gt_classes": jnp.zeros((B, 2), jnp.int32),
        "gt_masks": masks,
        "gt_valid": jnp.asarray([[True, False]] * B),
    }


class TestSourceTraining:
    def test_losses_decrease(self):
        model = tiny_model()
        batch = synth_batch(jax.random.PRNGKey(0))
        from ttdg_mgm_tpu.solver.build import warmup_multistep_schedule

        params = model.init(jax.random.PRNGKey(0), batch["image"][:1],
                            batch["image_sizes"][:1])["params"]
        # d2-style warmup: the un-warmed first steps diverge on tiny batches
        tx = build_optimizer(
            params, warmup_multistep_schedule(2.5e-3, (10000,),
                                              warmup_iters=10,
                                              warmup_factor=0.1)
        )
        state = TrainState.create(params, tx)
        step = make_source_step(model, tx)
        rng = jax.random.PRNGKey(1)
        first = None
        for it in range(15):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch, sub)
            total = float(metrics["total_loss"])
            assert np.isfinite(total), (it, {k: float(v) for k, v in metrics.items()})
            if first is None:
                first = total
        assert total < first, (first, total)

    def test_norm_clip_bounds_first_update(self):
        """d2 SOLVER.CLIP_GRADIENTS CLIP_TYPE 'norm': the global L2 norm of
        the very first SGD update must be <= lr * CLIP_VALUE no matter how
        large the raw gradients are (momentum is empty, wd disabled)."""
        params = {"a": jnp.zeros((16, 16)), "b": jnp.zeros((64,))}
        lr, cv = 2.5e-3, 1.0
        tx = build_optimizer(
            params, lambda _: lr, weight_decay=0.0, freeze_at=0,
            clip_gradients={"ENABLED": True, "CLIP_TYPE": "norm",
                            "CLIP_VALUE": cv})
        opt_state = tx.init(params)
        grads = jax.tree.map(lambda p: jnp.full(p.shape, 1e6), params)
        updates, _ = tx.update(grads, opt_state, params)
        gn = float(optax_global_norm(updates))
        assert gn <= lr * cv * 1.01, gn
        # and small gradients pass through unclipped
        grads = jax.tree.map(lambda p: jnp.full(p.shape, 1e-6), params)
        updates, _ = tx.update(grads, tx.init(params), params)
        ratios = jax.tree.map(lambda u, g: float(jnp.max(jnp.abs(u / (lr * g)))),
                              updates, grads)
        assert all(abs(r - 1.0) < 1e-3 for r in jax.tree.leaves(ratios)), ratios

    def test_from_scratch_stable_at_reference_lr_with_norm_clip(self):
        """The bench's from-scratch warmup recipe (reference BASE_LR 2.5e-3 +
        global-norm clip 1.0, bench.py:warm_params): losses stay finite and
        the run does not enter the value-clip blow-up regime (loss_cls was
        3.7e6 by iter ~114 under per-element clip — scripts/diag_warmup.py).
        Tiny model + 64px keeps this CPU-cheap; the divergence reproduced at
        every scale, so boundedness here is the regression signal."""
        from ttdg_mgm_tpu.solver.build import warmup_multistep_schedule

        model = tiny_model()
        batch = synth_batch(jax.random.PRNGKey(0))
        params = model.init(jax.random.PRNGKey(0), batch["image"][:1],
                            batch["image_sizes"][:1])["params"]
        tx = build_optimizer(
            params, warmup_multistep_schedule(2.5e-3, (10000,),
                                              warmup_iters=10,
                                              warmup_factor=0.05),
            clip_gradients={"ENABLED": True, "CLIP_TYPE": "norm",
                            "CLIP_VALUE": 1.0})
        state = TrainState.create(params, tx)
        step = make_source_step(model, tx)
        rng = jax.random.PRNGKey(1)
        totals = []
        for it in range(20):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch, sub)
            total = float(metrics["total_loss"])
            assert np.isfinite(total), (it, {k: float(v)
                                             for k, v in metrics.items()})
            totals.append(total)
        # bounded: never more than 3x the initial loss (the value-clip
        # failure mode exceeds 1000x within this horizon at full scale)
        assert max(totals) < 3.0 * totals[0] + 1.0, totals
        assert totals[-1] < totals[0], totals

    def test_frozen_params_do_not_move(self):
        """FrozenBN affines and the stem/res2 stages must receive ZERO updates
        (regression: optax.masked passes raw gradients through masked-out
        leaves -- param += grad -- which un-froze them and diverged)."""
        model = tiny_model()
        batch = synth_batch(jax.random.PRNGKey(0))
        params = model.init(jax.random.PRNGKey(0), batch["image"][:1],
                            batch["image_sizes"][:1])["params"]
        tx = build_optimizer(params, lambda _: 0.01)
        state = TrainState.create(params, tx)
        step = make_source_step(model, tx)
        frozen_before = {
            "stem": np.array(params["backbone"]["stem_conv1"]["kernel"]),
            "res2": np.array(params["backbone"]["res2_0"]["conv1"]["kernel"]),
            "bn": np.array(params["backbone"]["res4_0"]["conv1_norm"]["scale"]),
        }
        fc1_before = np.array(params["box_head"]["fc1"]["kernel"])
        state, _ = step(state, batch, jax.random.PRNGKey(1))
        p = state.params
        np.testing.assert_array_equal(
            frozen_before["stem"], np.asarray(p["backbone"]["stem_conv1"]["kernel"]))
        np.testing.assert_array_equal(
            frozen_before["res2"], np.asarray(p["backbone"]["res2_0"]["conv1"]["kernel"]))
        np.testing.assert_array_equal(
            frozen_before["bn"],
            np.asarray(p["backbone"]["res4_0"]["conv1_norm"]["scale"]))
        # a trainable layer did move
        assert np.abs(np.asarray(p["box_head"]["fc1"]["kernel"]) - fc1_before).max() > 0


class TestMeanTeacher:
    def test_mt_step_and_ema(self):
        model = tiny_model()
        sup = synth_batch(jax.random.PRNGKey(2))
        batch = {
            "label_strong": sup["image"], "label_weak": sup["image"],
            "label_sizes": sup["image_sizes"],
            "gt_boxes": sup["gt_boxes"], "gt_classes": sup["gt_classes"],
            "gt_masks": sup["gt_masks"], "gt_valid": sup["gt_valid"],
            "unlabel_strong": sup["image"] + 5.0,
            "unlabel_weak": sup["image"] + 5.0,
            "unlabel_sizes": sup["image_sizes"],
        }
        params = model.init(jax.random.PRNGKey(0), sup["image"][:1],
                            sup["image_sizes"][:1])["params"]
        tx = build_optimizer(params, lambda _: 1e-3)
        state = TrainState.create(params, tx)
        teacher = jax.tree.map(jnp.copy, params)
        step = make_mt_step(model, tx, gt_cap=2)
        state, aux = step(state, teacher, batch, jax.random.PRNGKey(3))
        for k, v in aux.items():
            assert np.isfinite(float(v)), k
        assert any(k.endswith("_pseudo") for k in aux)
        # EMA moves the teacher toward the student
        t2 = ema_update(teacher, state.params, jnp.float32(0.9))
        leaf_t = teacher["box_head"]["fc1"]["kernel"]
        leaf_s = state.params["box_head"]["fc1"]["kernel"]
        leaf_t2 = t2["box_head"]["fc1"]["kernel"]
        # atol for near-zero elements; rtol absorbs 1 - float32(0.9) rounding
        np.testing.assert_allclose(
            np.asarray(leaf_t2), np.asarray(leaf_t * 0.9 + leaf_s * 0.1),
            rtol=1e-5, atol=1e-7,
        )

    @pytest.mark.slow  # cross-domain loss/grads covered by test_extras::
    # TestCrossDomainHead; the plain MT step stays via test_mt_step_and_ema
    def test_mt_step_with_cross_domain(self):
        """The cross-domain graph-matching term (reference intent at
        ``trainer.py:929``) is wired into the MT step: losses are finite,
        the EMA class centers update, and the combined loss decreases."""
        model = tiny_model()
        sup = synth_batch(jax.random.PRNGKey(4))
        batch = {
            "label_strong": sup["image"], "label_weak": sup["image"],
            "label_sizes": sup["image_sizes"],
            "gt_boxes": sup["gt_boxes"], "gt_classes": sup["gt_classes"],
            "gt_masks": sup["gt_masks"], "gt_valid": sup["gt_valid"],
            "unlabel_strong": sup["image"] + 5.0,
            "unlabel_weak": sup["image"] + 5.0,
            "unlabel_sizes": sup["image_sizes"],
        }
        params = model.init(jax.random.PRNGKey(0), sup["image"][:1],
                            sup["image_sizes"][:1])["params"]
        from ttdg_mgm_tpu.solver.build import warmup_multistep_schedule

        tx = build_optimizer(
            params, warmup_multistep_schedule(1e-3, (10000,), warmup_iters=5,
                                              warmup_factor=0.1))
        state = TrainState.create(params, tx)
        teacher = jax.tree.map(jnp.copy, params)
        centers = jnp.zeros((model.num_classes + 1, 256))
        step = make_mt_step(model, tx, gt_cap=2, with_cross_domain=True)
        rng = jax.random.PRNGKey(5)
        totals = []
        for it in range(8):
            rng, sub = jax.random.split(rng)
            state, centers, aux = step(state, teacher, centers, batch, sub)
            for k, v in aux.items():
                assert np.isfinite(float(v)), (it, k, float(v))
            totals.append(float(aux["total_loss"]))
        assert "loss_cross_matching" in aux and "loss_node_cls" in aux
        # source GT nodes exist -> the EMA class centers moved off zero
        assert float(jnp.abs(centers).max()) > 0.0
        assert totals[-1] < totals[0], totals

    def test_threshold_pseudo_labels(self):
        det = {
            "boxes": jnp.ones((1, 4, 4)),
            "scores": jnp.asarray([[0.95, 0.5, 0.85, 0.1]]),
            "classes": jnp.asarray([[0, 1, 1, 0]]),
            "valid": jnp.asarray([[True, True, True, False]]),
        }
        b, c, v = threshold_pseudo_labels(det, threshold=0.8)
        assert np.asarray(v).tolist() == [[True, False, True, False]]
