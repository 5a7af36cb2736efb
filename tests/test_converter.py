"""Weight-converter tests: torch-vs-flax numerical parity of every layout
conversion, plus a structural round trip of the full state dict."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import flax.linen as nn  # noqa: E402

from ttdg_mgm_tpu.checkpoint.converter import (  # noqa: E402
    _conv,
    _deconv,
    _dense,
    _fold_bn,
    convert_d2_state_dict,
)


class TestLayoutParity:
    def test_conv2d_stride2_pad1(self):
        tconv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=True)
        x = torch.randn(1, 3, 10, 10)
        with torch.no_grad():
            ref = tconv(x).permute(0, 2, 3, 1).numpy()
        fconv = nn.Conv(8, (3, 3), strides=2, padding=((1, 1), (1, 1)))
        params = {
            "params": {
                "kernel": jnp.asarray(_conv(tconv.weight.detach().numpy())),
                "bias": jnp.asarray(tconv.bias.detach().numpy()),
            }
        }
        out = fconv.apply(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_conv_transpose_2x2_stride2(self):
        tdc = torch.nn.ConvTranspose2d(4, 6, 2, stride=2)
        x = torch.randn(1, 4, 5, 5)
        with torch.no_grad():
            ref = torch.relu(tdc(x)).permute(0, 2, 3, 1).numpy()
        fdc = nn.ConvTranspose(6, (2, 2), strides=(2, 2))
        params = {
            "params": {
                "kernel": jnp.asarray(_deconv(tdc.weight.detach().numpy())),
                "bias": jnp.asarray(tdc.bias.detach().numpy()),
            }
        }
        out = nn.relu(fdc.apply(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy())))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_frozen_bn_fold(self):
        bn = torch.nn.BatchNorm2d(5).eval()
        with torch.no_grad():
            bn.weight.copy_(torch.rand(5) + 0.5)
            bn.bias.copy_(torch.randn(5))
            bn.running_mean.copy_(torch.randn(5))
            bn.running_var.copy_(torch.rand(5) + 0.3)
        x = torch.randn(1, 5, 4, 4)
        with torch.no_grad():
            ref = bn(x).permute(0, 2, 3, 1).numpy()
        sd = {
            "n.weight": bn.weight.detach().numpy(),
            "n.bias": bn.bias.detach().numpy(),
            "n.running_mean": bn.running_mean.numpy(),
            "n.running_var": bn.running_var.numpy(),
        }
        fold = _fold_bn(sd, "n")
        out = x.permute(0, 2, 3, 1).numpy() * fold["scale"] + fold["bias"]
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_boxhead_fc1_reorder(self):
        """torch fc1 on NCHW-flatten == our fc1 on NHWC-flatten after
        reordering the input dimension."""
        C = 6
        fc = torch.nn.Linear(C * 49, 16)
        feat = torch.randn(2, C, 7, 7)
        with torch.no_grad():
            ref = fc(feat.flatten(1)).numpy()
        w1 = fc.weight.detach().numpy()
        w1r = w1.reshape(-1, C, 7, 7).transpose(0, 2, 3, 1).reshape(w1.shape[0], -1)
        nhwc = feat.permute(0, 2, 3, 1).numpy().reshape(2, -1)
        out = nhwc @ _dense(w1r) + fc.bias.detach().numpy()
        np.testing.assert_allclose(out, ref, atol=1e-5)


def synth_state_dict(num_classes=2):
    """Synthetic d2-named state dict with the reference model's shapes."""
    rng = np.random.RandomState(0)
    sd = {}

    def add_conv(name, o, i, k):
        sd[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32)

    def add_conv_b(name, o, i, k):
        add_conv(name, o, i, k)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    def add_bn(name, c):
        for s, shape in (("weight", c), ("bias", c), ("running_mean", c),
                         ("running_var", c)):
            sd[name + "." + s] = np.abs(rng.randn(shape)).astype(np.float32)

    def add_fc(name, o, i):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32)
        sd[name + ".bias"] = rng.randn(o).astype(np.float32)

    bu = "backbone.bottom_up."
    add_conv(bu + "stem.conv1", 64, 3, 7)
    add_bn(bu + "stem.conv1.norm", 64)
    blocks = {"res2": (3, 64, 256), "res3": (4, 128, 512),
              "res4": (6, 256, 1024), "res5": (3, 512, 2048)}
    in_ch = 64
    for stage, (n, mid, out) in blocks.items():
        for i in range(n):
            pre = f"{bu}{stage}.{i}."
            cin = in_ch if i == 0 else out
            add_conv(pre + "conv1", mid, cin, 1)
            add_bn(pre + "conv1.norm", mid)
            add_conv(pre + "conv2", mid, mid, 3)
            add_bn(pre + "conv2.norm", mid)
            add_conv(pre + "conv3", out, mid, 1)
            add_bn(pre + "conv3.norm", out)
            if i == 0:
                add_conv(pre + "shortcut", out, cin, 1)
                add_bn(pre + "shortcut.norm", out)
        in_ch = out
    for lvl, c in zip(range(2, 6), (256, 512, 1024, 2048)):
        add_conv_b(f"backbone.fpn_lateral{lvl}", 256, c, 1)
        add_conv_b(f"backbone.fpn_output{lvl}", 256, 256, 3)
    add_conv_b("proposal_generator.rpn_head.conv", 256, 256, 3)
    add_conv_b("proposal_generator.rpn_head.objectness_logits", 3, 256, 1)
    add_conv_b("proposal_generator.rpn_head.anchor_deltas", 12, 256, 1)
    add_fc("roi_heads.box_head.fc1", 1024, 256 * 49)
    add_fc("roi_heads.box_head.fc2", 1024, 1024)
    add_fc("roi_heads.box_predictor.cls_score", num_classes + 1, 1024)
    add_fc("roi_heads.box_predictor.bbox_pred", num_classes * 4, 1024)
    for i in range(1, 5):
        add_conv_b(f"roi_heads.mask_head.mask_fcn{i}", 256, 256, 3)
    sd["roi_heads.mask_head.deconv.weight"] = rng.randn(256, 256, 2, 2).astype(np.float32)
    sd["roi_heads.mask_head.deconv.bias"] = rng.randn(256).astype(np.float32)
    add_conv_b("roi_heads.mask_head.predictor", num_classes, 256, 1)
    add_conv_b("D_img.conv1", 128, 256, 3)
    add_conv_b("D_img.conv2", 64, 128, 3)
    add_conv_b("D_img.classifier", 1, 64, 3)
    sd["multi_matching_sup.U"] = rng.randn(32, 256).astype(np.float32)
    for mod, pre in (("sup", "multi_matching_sup.Net_U.g_gene"),
                     ("unsup", "multi_matching_unsup.intra_domain_graph")):
        for lin in ("linear_q", "linear_k", "linear_v", "linear_final"):
            add_fc(f"{pre}.{lin}", 256, 256)
        sd[f"{pre}.layer_norm.weight"] = rng.randn(256).astype(np.float32)
        sd[f"{pre}.layer_norm.bias"] = rng.randn(256).astype(np.float32)
    na = "multi_matching_unsup.node_affinity"
    sd[na + ".project_sr.weight"] = rng.randn(256, 256).astype(np.float32)
    sd[na + ".project_tg.weight"] = rng.randn(256, 256).astype(np.float32)
    add_fc(na + ".fc_M.0", 512, 512)
    add_fc(na + ".fc_M.2", 1, 512)
    return sd


class TestFullConversion:
    def test_structure_matches_model(self):
        from ttdg_mgm_tpu.models import MaskRCNN

        sd = synth_state_dict()
        converted = convert_d2_state_dict(sd, num_classes=2)

        model = MaskRCNN(num_classes=2, pre_nms_topk_test=16, post_nms_topk=8,
                         detections_per_image=4, batch_size_per_image=8,
                         mask_fg_cap=4, node_cap_per_level=2, univ_size=32)
        ref = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            jnp.asarray([[64.0, 64.0]]),
        )["params"]

        ref_shapes = jax.tree.map(lambda x: tuple(x.shape), ref)
        conv_shapes = jax.tree.map(lambda x: tuple(np.shape(x)), converted)
        flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref_shapes)[0])
        flat_conv = dict(jax.tree_util.tree_flatten_with_path(conv_shapes)[0])
        def name(path):
            return "/".join(str(getattr(p, "key", p)) for p in path)

        # the cross-domain head (reference GModule) is never constructed in
        # the reference snapshot, so its weights cannot appear in reference
        # checkpoints — it keeps its fresh init on load (merge is partial)
        missing = {k for k in set(flat_ref) - set(flat_conv)
                   if not name(k).startswith("cross_domain")}
        extra = set(flat_conv) - set(flat_ref)
        assert not missing, (
            f"converter missing params: {sorted(name(k) for k in missing)[:10]}"
        )
        assert not extra, (
            f"converter produced unknown params: {sorted(name(k) for k in extra)[:10]}"
        )
        for k in flat_conv:
            assert flat_ref[k] == flat_conv[k], (k, flat_ref[k], flat_conv[k])

    def test_caffe2_imagenet_backbone(self):
        """Caffe2 MSRA R-50.pkl names (conv1_w / resX_Y_branchZ_*) convert to
        a backbone-only partial tree with correct shapes."""
        from ttdg_mgm_tpu.checkpoint.converter import c2_resnet_to_d2_names

        rng = np.random.RandomState(1)
        sd = {"conv1_w": rng.randn(64, 3, 7, 7).astype(np.float32),
              "res_conv1_bn_s": rng.randn(64).astype(np.float32),
              "res_conv1_bn_b": rng.randn(64).astype(np.float32),
              "fc1000_w": rng.randn(1000, 2048).astype(np.float32)}
        blocks = {"2": (3, 64, 256), "3": (4, 128, 512),
                  "4": (6, 256, 1024), "5": (3, 512, 2048)}
        in_ch = 64
        for stage, (n, mid, out) in blocks.items():
            for i in range(n):
                cin = in_ch if i == 0 else out
                for br, (o, ci, k) in {
                    "branch2a": (mid, cin, 1), "branch2b": (mid, mid, 3),
                    "branch2c": (out, mid, 1),
                }.items():
                    sd[f"res{stage}_{i}_{br}_w"] = rng.randn(o, ci, k, k).astype(np.float32)
                    sd[f"res{stage}_{i}_{br}_bn_s"] = rng.randn(o).astype(np.float32)
                    sd[f"res{stage}_{i}_{br}_bn_b"] = rng.randn(o).astype(np.float32)
                if i == 0:
                    sd[f"res{stage}_{i}_branch1_w"] = rng.randn(out, cin, 1, 1).astype(np.float32)
                    sd[f"res{stage}_{i}_branch1_bn_s"] = rng.randn(out).astype(np.float32)
                    sd[f"res{stage}_{i}_branch1_bn_b"] = rng.randn(out).astype(np.float32)
            in_ch = out
        d2 = c2_resnet_to_d2_names(sd)
        assert "backbone.bottom_up.stem.conv1.weight" in d2
        assert not any("fc1000" in k for k in d2)
        converted = convert_d2_state_dict(sd)
        assert set(converted) == {"backbone"}
        assert converted["backbone"]["stem_conv1"]["kernel"].shape == (7, 7, 3, 64)
        assert converted["backbone"]["res5_2"]["conv3"]["kernel"].shape == (1, 1, 512, 2048)
        # folded BN with no running stats (mean=0, var=1): d2's FrozenBN also
        # applies eps to the pre-folded caffe stats -> scale = s/sqrt(1+eps)
        np.testing.assert_allclose(
            converted["backbone"]["stem_conv1_norm"]["scale"],
            sd["res_conv1_bn_s"] / np.sqrt(1.0 + 1e-5), rtol=1e-6)

    def test_ensemble_member_selection(self):
        sd = synth_state_dict()
        ens = {("modelTeacher." + k): v for k, v in sd.items()}
        ens.update({("modelStudent." + k): v * 0 for k, v in sd.items()})
        teacher = convert_d2_state_dict(ens, member="modelTeacher")
        student = convert_d2_state_dict(ens, member="modelStudent")
        assert np.abs(teacher["U"]).max() > 0
        assert np.abs(student["U"]).max() == 0


class TestInverseConversion:
    """``flax_to_d2_state_dict`` (export back to the reference layout) must
    round-trip exactly through ``convert_d2_state_dict``."""

    def test_roundtrip_exact(self):
        from ttdg_mgm_tpu.checkpoint.converter import flax_to_d2_state_dict

        sd = synth_state_dict()
        params = convert_d2_state_dict(sd)
        back = flax_to_d2_state_dict(params)
        again = convert_d2_state_dict(back)

        flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_b = dict(jax.tree_util.tree_flatten_with_path(again)[0])
        assert len(flat_a) == len(flat_b)
        for path, va in flat_a:
            np.testing.assert_allclose(
                np.asarray(va), np.asarray(flat_b[path]), rtol=1e-6, atol=1e-7,
                err_msg=str(path))

    def test_torch_twin_consumes_export(self):
        """The exported dict must feed the torch twin byte-for-byte: same
        keys the twin's _SD view reads for the layers it executes."""
        from ttdg_mgm_tpu.checkpoint.converter import flax_to_d2_state_dict

        sd = synth_state_dict()
        params = convert_d2_state_dict(sd)
        back = flax_to_d2_state_dict(params)
        for k in ("backbone.bottom_up.stem.conv1.weight",
                  "backbone.fpn_lateral2.weight",
                  "proposal_generator.rpn_head.conv.weight",
                  "roi_heads.box_head.fc1.weight",
                  "roi_heads.mask_head.deconv.weight",
                  "multi_matching_unsup.node_affinity.fc_M.0.weight"):
            assert k in back, k
            assert back[k].shape == np.asarray(sd[k]).shape, k
        # conv weights identical to the original d2 tensors
        np.testing.assert_allclose(
            back["roi_heads.mask_head.deconv.weight"],
            sd["roi_heads.mask_head.deconv.weight"], rtol=1e-6)
        np.testing.assert_allclose(
            back["roi_heads.box_head.fc1.weight"],
            sd["roi_heads.box_head.fc1.weight"], rtol=1e-6)
