"""VGG16-BN torchvision-weight conversion: numeric equivalence between a
torch conv+BN trunk (torchvision ``vgg16_bn`` layout / ``features.N`` naming,
the init source of reference ``adapteacher/modeling/meta_arch/vgg.py:122-130``)
and our ``VGG16Backbone`` with converted params."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ttdg_mgm_tpu.checkpoint.converter import _VGG16BN_CONV_IDX, vgg16bn_to_flax
from ttdg_mgm_tpu.models.vgg import _VGG16, VGG16Backbone, VGG16FPNBackbone


def _torch_vgg16bn_features():
    """torch Sequential matching torchvision vgg16_bn.features layout."""
    layers = []
    in_ch = 3
    for v in _VGG16:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(torch.nn.BatchNorm2d(v))
            layers.append(torch.nn.ReLU(inplace=True))
            in_ch = v
    return torch.nn.Sequential(*layers)


def test_conv_index_table_matches_layout():
    feats = _torch_vgg16bn_features()
    conv_idx = [i for i, m in enumerate(feats) if isinstance(m, torch.nn.Conv2d)]
    assert conv_idx == _VGG16BN_CONV_IDX
    for i in _VGG16BN_CONV_IDX:
        assert isinstance(feats[i + 1], torch.nn.BatchNorm2d)


def test_vgg16bn_forward_equivalence():
    torch.manual_seed(0)
    feats = _torch_vgg16bn_features().eval()
    # non-trivial BN statistics
    with torch.no_grad():
        for m in feats:
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.3, 0.3)

    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        stage_outs = {}
        h = x
        stage = 0
        for m in feats:
            h = m(h)
            if isinstance(m, torch.nn.MaxPool2d):
                stage += 1
                stage_outs[f"vgg{stage}"] = h.numpy().transpose(0, 2, 3, 1)

    sd = {f"features.{k}": v.numpy() for k, v in feats.state_dict().items()}
    params = vgg16bn_to_flax(sd)

    import jax.numpy as jnp

    model = VGG16Backbone()
    outs = model.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    for name in ("vgg2", "vgg3", "vgg4", "vgg5"):
        np.testing.assert_allclose(
            np.asarray(outs[name]), stage_outs[name], rtol=2e-4, atol=2e-4
        )


def test_fpn_wrapper_accepts_converted_trunk():
    import jax
    import jax.numpy as jnp

    sd = {}
    rng = np.random.default_rng(0)
    in_ch = 3
    for i, v in enumerate([c for c in _VGG16 if c != "M"]):
        idx = _VGG16BN_CONV_IDX[i]
        sd[f"features.{idx}.weight"] = rng.normal(size=(v, in_ch, 3, 3)).astype(np.float32)
        sd[f"features.{idx}.bias"] = np.zeros(v, np.float32)
        sd[f"features.{idx + 1}.weight"] = np.ones(v, np.float32)
        sd[f"features.{idx + 1}.bias"] = np.zeros(v, np.float32)
        sd[f"features.{idx + 1}.running_mean"] = np.zeros(v, np.float32)
        sd[f"features.{idx + 1}.running_var"] = np.ones(v, np.float32)
        in_ch = v
    trunk = vgg16bn_to_flax(sd)

    model = VGG16FPNBackbone()
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    assert set(ref["trunk"]) == set(trunk)
    outs = model.apply({"params": {"trunk": trunk}}, jnp.zeros((1, 32, 32, 3)))
    assert set(outs) == {"res2", "res3", "res4", "res5"}
    assert outs["res2"].shape == (1, 8, 8, 128)
