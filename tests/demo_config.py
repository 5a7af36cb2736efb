"""Shared tuned settings for the TTA-improves-Dice demonstration.

One source of truth for ``tests/test_tta_improves_dice.py``; the TPU-scale
prototype (``scripts/demo_tta_gain.py``) exposes the same knobs as CLI args
and the PARITY.md numbers record the configuration they were measured at.

The model is the tiny flagship-family detector with anchors scaled to the
synthetic disc sizes and REAL proposal budgets (a fraction of the
flagship's 1000): with tiny post-NMS budgets the box head's only fg
training examples are the appended GT boxes (exact IoU-1 crops) and it
learns a degenerate boundary that rejects every imperfect inference
proposal — measured in round 5 (loss_cls 0.003 yet zero detections).
"""

def save_fixture_weights(params, path):
    """float16 msgpack (half the f32 size; detector weights are small-
    magnitude so fp16 is lossless in practice for this demo)."""
    import flax.serialization as fser
    import jax
    import numpy as np

    with open(path, "wb") as f:
        f.write(fser.to_bytes(
            jax.tree.map(lambda x: np.asarray(x, np.float16), params)))


def load_fixture_weights(template_params, path):
    """Load fp16 fixture weights, cast back to the template's dtypes."""
    import flax.serialization as fser
    import jax
    import jax.numpy as jnp
    import numpy as np

    tmpl16 = jax.tree.map(lambda x: np.zeros(x.shape, np.float16),
                          template_params)
    with open(path, "rb") as f:
        loaded = fser.from_bytes(tmpl16, f.read())
    return jax.tree.map(lambda t, l: jnp.asarray(l, t.dtype),
                        template_params, loaded)


DEMO = {
    "size": 128,
    "seed": 17,
    "blur": 1.5,
    "brightness": 0.7,
    "tta_lr": 2.5e-3,
    "dice_threshold": 0.2,
    # TPU source-training steps that produced the committed fixture weights
    "train_steps": 600,
    "test_images": 16,
    "test_passes": 1,
    # pass bar: a strict Dice improvement by a stated margin.  The pinned
    # (fixture weights, dataset seed, platform) configuration measures
    # +0.26 on CPU / +0.18 on TPU; the margin leaves room for jax-version
    # numeric drift without accepting a no-op.  TTA-gain magnitude is
    # regime-dependent at this synthetic scale (PARITY.md records the
    # sensitivity): the weak-source regime measured +0.83.
    "min_gain": 0.1,
    # narrow flagship-family model: same topology (R-Bottleneck trunk, FPN,
    # RPN, box/mask heads, U_sup/MGM3 matching), widths shrunk so the
    # committed golden weights stay small and the CPU A/B stays fast
    "model_kwargs": dict(
        num_classes=2, univ_size=8, node_cap_per_level=4,
        pre_nms_topk_train=512, pre_nms_topk_test=256, post_nms_topk=256,
        detections_per_image=16, batch_size_per_image=128, mask_fg_cap=16,
        resnet_depth=14, resnet_width=64, fpn_channels=128, box_fc_dim=256,
        mask_conv_dim=128, gagm_iters=20, hippi_iters=10,
        anchor_sizes=((16,), (32,), (64,), (128,), (256,)),
    ),
}
