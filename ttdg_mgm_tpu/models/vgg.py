"""VGG-16-BN backbone (alternative to R50).

Capability of reference ``adapteacher/modeling/meta_arch/vgg.py:40-154``
(``vgg_backbone``/``build_vgg_backbone``): a 5-stage VGG-16 with BatchNorm
split at the maxpools, exposing ``vgg2..vgg5`` (strides 4..32) for direct use
or FPN wrapping.  BatchNorm is frozen-affine here like the ResNet path.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from ttdg_mgm_tpu.models.resnet import FrozenBatchNorm

# VGG-16 configuration "D": channels per conv, 'M' = maxpool
_VGG16 = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
          512, 512, 512, "M"]


class VGG16Backbone(nn.Module):
    out_features: Sequence[str] = ("vgg2", "vgg3", "vgg4", "vgg5")

    @nn.compact
    def __call__(self, x):
        outputs = {}
        stage = 0
        conv_idx = 0
        for v in _VGG16:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                stage += 1
                name = f"vgg{stage}"  # vgg2 = after 2nd pool = stride 4
                if name in self.out_features:
                    outputs[name] = x
            else:
                x = nn.Conv(v, (3, 3), padding=((1, 1), (1, 1)),
                            name=f"conv{conv_idx}")(x)
                x = FrozenBatchNorm(v, name=f"conv{conv_idx}_norm")(x)
                x = nn.relu(x)
                conv_idx += 1
        return outputs


class VGG16FPNBackbone(nn.Module):
    """VGG-16 trunk + FPN (reference ``build_vgg_backbone`` FPN wrapper,
    ``vgg.py:122-154``), emitting the same ``res2..res5``-named dict the
    R50 path emits so FPN / heads are backbone-agnostic."""

    @nn.compact
    def __call__(self, x):
        feats = VGG16Backbone(name="trunk")(x)
        return {f"res{i}": feats[f"vgg{i}"] for i in range(2, 6)}
