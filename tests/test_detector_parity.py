"""Whole-detector torch parity (VERDICT r2 missing #1 / next-round #2).

The matching core is proven against reference torch to 2e-7 and every weight
layout conversion is unit-tested; this closes the remaining gap by executing
the COMPOSED detector both ways from the SAME d2-named state dict:

    torch twin  (tests/torch_twin.py, plain torch kernels, d2 conventions)
    JAX MaskRCNN (models/rcnn.py, converter-loaded params)

and asserting per-stage parity on a non-square padded image: backbone
features -> FPN -> RPN outputs -> proposals -> pooled ROI features -> box
head -> final detections -> per-detection mask probabilities (reference
``meta_arch/rcnn.py:67-420``, d2 kernel semantics per SURVEY.md §2.3).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ttdg_mgm_tpu.checkpoint.converter import convert_d2_state_dict  # noqa: E402
from ttdg_mgm_tpu.models import MaskRCNN  # noqa: E402

from torch_twin import TorchTwin  # noqa: E402

NUM_CLASSES = 2
# proposal budgets small enough for CPU, big enough to exercise merging
PRE_NMS, POST_NMS, DETS = 200, 64, 16


def detector_state_dict(seed=3):
    """d2-named state dict with He-scaled weights so the composed forward
    keeps sane activations (plain randn saturates softmax by the box head)."""
    rng = np.random.RandomState(seed)
    sd = {}

    def conv(name, o, i, k, *, std=None, bias=False):
        std = std if std is not None else np.sqrt(2.0 / (i * k * k))
        sd[name + ".weight"] = (rng.randn(o, i, k, k) * std).astype(np.float32)
        if bias:
            sd[name + ".bias"] = (rng.randn(o) * 0.01).astype(np.float32)

    def bn(name, c):
        sd[name + ".weight"] = (1.0 + 0.1 * rng.randn(c)).astype(np.float32)
        sd[name + ".bias"] = (0.1 * rng.randn(c)).astype(np.float32)
        sd[name + ".running_mean"] = (0.1 * rng.randn(c)).astype(np.float32)
        sd[name + ".running_var"] = (1.0 + 0.1 * np.abs(rng.randn(c))).astype(
            np.float32)

    def fc(name, o, i, *, std=None):
        std = std if std is not None else np.sqrt(2.0 / i)
        sd[name + ".weight"] = (rng.randn(o, i) * std).astype(np.float32)
        sd[name + ".bias"] = (rng.randn(o) * 0.01).astype(np.float32)

    bu = "backbone.bottom_up."
    conv(bu + "stem.conv1", 64, 3, 7)
    bn(bu + "stem.conv1.norm", 64)
    blocks = {"res2": (3, 64, 256), "res3": (4, 128, 512),
              "res4": (6, 256, 1024), "res5": (3, 512, 2048)}
    in_ch = 64
    for stage, (n, mid, out) in blocks.items():
        for i in range(n):
            pre = f"{bu}{stage}.{i}."
            cin = in_ch if i == 0 else out
            conv(pre + "conv1", mid, cin, 1)
            bn(pre + "conv1.norm", mid)
            conv(pre + "conv2", mid, mid, 3)
            bn(pre + "conv2.norm", mid)
            # damp the residual branch: with identity shortcuts and frozen
            # BN, He-scaled branches double the variance per block (2^16
            # overall) and the huge activations make fp tolerances vacuous
            conv(pre + "conv3", out, mid, 1, std=np.sqrt(2.0 / mid) * 0.125)
            bn(pre + "conv3.norm", out)
            if i == 0:
                conv(pre + "shortcut", out, cin, 1)
                bn(pre + "shortcut.norm", out)
        in_ch = out
    for lvl, c in zip(range(2, 6), (256, 512, 1024, 2048)):
        conv(f"backbone.fpn_lateral{lvl}", 256, c, 1, bias=True)
        conv(f"backbone.fpn_output{lvl}", 256, 256, 3, bias=True)
    conv("proposal_generator.rpn_head.conv", 256, 256, 3, bias=True)
    # head-output stds chosen so logits/deltas land at realistic magnitudes
    # (features are O(100) caffe-scale; trained heads emit O(0.1-1) outputs)
    conv("proposal_generator.rpn_head.objectness_logits", 3, 256, 1,
         std=1e-4, bias=True)
    conv("proposal_generator.rpn_head.anchor_deltas", 12, 256, 1,
         std=1e-4, bias=True)
    fc("roi_heads.box_head.fc1", 1024, 256 * 49)
    fc("roi_heads.box_head.fc2", 1024, 1024)
    fc("roi_heads.box_predictor.cls_score", NUM_CLASSES + 1, 1024, std=1e-4)
    fc("roi_heads.box_predictor.bbox_pred", NUM_CLASSES * 4, 1024, std=1e-5)
    for i in range(1, 5):
        conv(f"roi_heads.mask_head.mask_fcn{i}", 256, 256, 3, bias=True)
    sd["roi_heads.mask_head.deconv.weight"] = (
        rng.randn(256, 256, 2, 2) * np.sqrt(2.0 / (256 * 4))).astype(np.float32)
    sd["roi_heads.mask_head.deconv.bias"] = (
        rng.randn(256) * 0.01).astype(np.float32)
    conv("roi_heads.mask_head.predictor", NUM_CLASSES, 256, 1, std=1e-4,
         bias=True)
    return sd


@pytest.fixture(scope="module")
def both():
    sd = detector_state_dict()
    rng = np.random.RandomState(7)
    # non-square padded canvas, smaller valid size (the eval-path layout)
    H, W = 96, 128
    image = (rng.rand(H, W, 3) * 255).astype(np.float32)
    image[88:] = 0.0
    image[:, 120:] = 0.0
    image_size = (88.0, 120.0)

    # stage parity is pinned at the STATIC sampling grid on both sides:
    # exact for every ROI.  (The production default is the adaptive ratio-0
    # grid, which is exact only within ops/roi_align.ADAPTIVE_CAP — random
    # near-image-size junk proposals here exceed it; the adaptive grid's own
    # parity is covered by test_det_ops + the composed Dice A/B.)
    twin = TorchTwin(sd, num_classes=NUM_CLASSES, pre_nms_topk=PRE_NMS,
                     post_nms_topk=POST_NMS, detections_per_image=DETS,
                     sampling_ratio=2)
    timg = torch.from_numpy(image).permute(2, 0, 1)[None]

    model = MaskRCNN(
        num_classes=NUM_CLASSES, resnet_depth=50,
        pre_nms_topk_test=PRE_NMS, post_nms_topk=POST_NMS,
        detections_per_image=DETS, batch_size_per_image=32, mask_fg_cap=8,
        node_cap_per_level=2, univ_size=8, pooler_sampling_ratio=2,
    )
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                      jnp.asarray([[64.0, 64.0]]))["params"]
    conv = convert_d2_state_dict(sd, num_classes=NUM_CLASSES)
    params = {**init, **jax.tree.map(jnp.asarray, conv)}
    jimg = jnp.asarray(image)[None]
    jsizes = jnp.asarray([image_size])
    return dict(sd=sd, twin=twin, timg=timg, model=model, params=params,
                jimg=jimg, jsizes=jsizes, image_size=image_size)


class TestStages:
    def test_backbone_and_fpn(self, both):
        res, fpn = both["twin"].features(both["timg"])
        model, params = both["model"], both["params"]
        feats = model.apply({"params": params}, both["jimg"],
                            method=model.extract_features)
        for lvl in range(2, 7):
            want = fpn[f"p{lvl}"][0].permute(1, 2, 0).numpy()
            got = np.asarray(feats[f"p{lvl}"][0])
            np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-3,
                                       err_msg=f"p{lvl}")

    def test_rpn_outputs(self, both):
        _, fpn = both["twin"].features(both["timg"])
        logits_t, deltas_t = both["twin"].rpn_outputs(fpn)
        model, params = both["model"], both["params"]

        def rpn(m, im, sz):
            feats = m.extract_features(im)
            (logits, regs, _), _ = m._proposals(feats, sz, train=False)
            return logits, regs

        logits_j, regs_j = model.apply({"params": params}, both["jimg"],
                                       both["jsizes"], method=rpn)
        for lv in range(5):
            np.testing.assert_allclose(
                np.asarray(logits_j[lv][0]),
                logits_t[lv][0].permute(1, 2, 0).numpy(),
                atol=1e-3, rtol=1e-3, err_msg=f"logits lvl {lv}")
            np.testing.assert_allclose(
                np.asarray(regs_j[lv][0]),
                deltas_t[lv][0].permute(1, 2, 0).numpy(),
                atol=1e-3, rtol=1e-3, err_msg=f"deltas lvl {lv}")

    def test_proposals(self, both):
        _, fpn = both["twin"].features(both["timg"])
        boxes_t, scores_t = both["twin"].proposals(fpn, both["image_size"])
        model, params = both["model"], both["params"]

        def props(m, im, sz):
            feats = m.extract_features(im)
            _, out = m._proposals(feats, sz, train=False)
            return out

        bj, sj, vj = model.apply({"params": params}, both["jimg"],
                                 both["jsizes"], method=props)
        v = np.asarray(vj[0])
        bj = np.asarray(bj[0])[v]
        sj = np.asarray(sj[0])[v]
        n = min(len(bj), len(boxes_t))
        assert n >= 8, f"too few proposals to compare ({n})"
        # both are score-sorted; compare the overlapping prefix
        np.testing.assert_allclose(sj[:n], scores_t[:n].numpy(), atol=1e-3,
                                   rtol=1e-3)
        np.testing.assert_allclose(bj[:n], boxes_t[:n].numpy(), atol=1e-2)

    def test_roi_pool_and_box_head(self, both):
        """Pin the ROI stage on FIXED boxes (shared across frameworks) so
        this stage isolates ROIAlign + head numerics from NMS ordering."""
        rois = np.asarray(
            [[4.0, 6.0, 60.0, 80.0],      # p2-sized
             [10.0, 4.0, 110.0, 86.0],    # p3-sized
             [0.0, 0.0, 120.0, 88.0],     # whole image
             [30.5, 22.25, 95.75, 60.5]], # fractional coords
            np.float32)
        _, fpn = both["twin"].features(both["timg"])
        from torch_twin import multilevel_roi_align as pool_t
        pooled_t = pool_t(fpn, torch.from_numpy(rois), 7)
        scores_t, deltas_t = both["twin"].box_head(pooled_t)

        model, params = both["model"], both["params"]

        def pool_and_head(m, im, b):
            feats = m.extract_features(im)
            pooled = m._pool(feats, b[None], 7)
            x = m.box_head(pooled[0])
            return pooled[0], m.box_predictor(x)

        pooled_j, (scores_j, deltas_j) = model.apply(
            {"params": params}, both["jimg"], jnp.asarray(rois),
            method=pool_and_head)
        np.testing.assert_allclose(
            np.asarray(pooled_j), pooled_t.permute(0, 2, 3, 1).numpy(),
            atol=1e-2, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(scores_j), scores_t.numpy(),
                                   atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(deltas_j), deltas_t.numpy(),
                                   atol=1e-3, rtol=1e-3)

    def test_final_detections_and_masks(self, both):
        out_t = both["twin"].forward_inference(both["timg"],
                                               both["image_size"])
        model, params = both["model"], both["params"]
        out_j = model.apply({"params": params}, both["jimg"], both["jsizes"],
                            method=model.forward_inference)
        v = np.asarray(out_j["valid"][0])
        bj = np.asarray(out_j["boxes"][0])[v]
        sj = np.asarray(out_j["scores"][0])[v]
        cj = np.asarray(out_j["classes"][0])[v]
        mj = np.asarray(out_j["mask_probs"][0])[v]
        bt = out_t["boxes"].numpy()
        st = out_t["scores"].numpy()
        ct = out_t["classes"].numpy()
        mt = out_t["mask_probs"].numpy()
        n = min(len(bj), len(bt))
        assert n >= 4, f"too few detections to compare ({n})"
        np.testing.assert_allclose(sj[:n], st[:n], atol=1e-3, rtol=1e-3)
        np.testing.assert_array_equal(cj[:n], ct[:n])
        np.testing.assert_allclose(bj[:n], bt[:n], atol=2e-2)
        np.testing.assert_allclose(mj[:n], mt[:n], atol=2e-3)
