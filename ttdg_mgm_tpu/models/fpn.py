"""Feature Pyramid Network (d2 semantics).

Capability of d2 ``build_resnet_fpn_backbone`` as configured by the reference
(``configs/Base-RCNN-FPN.yaml``: IN_FEATURES res2..res5, out 256 channels,
LastLevelMaxPool): 1x1 lateral convs, nearest-neighbor top-down upsampling,
3x3 output convs, and ``p6 = max_pool(p5, 1x1 window, stride 2)``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def _upsample_nearest_2x(x):
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


class FPN(nn.Module):
    out_channels: int = 256
    dtype: Any = None  # computation dtype (params stay f32)

    @nn.compact
    def __call__(self, feats: dict):
        names = ["res2", "res3", "res4", "res5"]
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f"lateral{i + 2}",
                    dtype=self.dtype)(feats[n])
            for i, n in enumerate(names)
        ]
        # top-down pathway
        merged = [None] * 4
        merged[3] = laterals[3]
        for i in (2, 1, 0):
            up = _upsample_nearest_2x(merged[i + 1])
            # crop in case of odd input sizes (d2 interpolates to exact shape;
            # with divisibility-32 padding shapes always match exactly)
            up = up[:, : laterals[i].shape[1], : laterals[i].shape[2], :]
            merged[i] = laterals[i] + up
        outs = {
            f"p{i + 2}": nn.Conv(
                self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                name=f"output{i + 2}", dtype=self.dtype,
            )(merged[i])
            for i in range(4)
        }
        # LastLevelMaxPool: stride-2 1x1 max pool of p5
        outs["p6"] = nn.max_pool(outs["p5"], (1, 1), strides=(2, 2))
        return outs
