"""ResNet-50 backbone with Detectron2 semantics (caffe-style layout).

Re-implements the capability of d2's ``build_resnet_backbone`` as used by the
reference (``configs/Base-RCNN-FPN.yaml``: R50, OUT_FEATURES res2..res5,
caffe MSRA weights):

* **FrozenBatchNorm**: affine-only normalization with baked statistics —
  ``y = x * scale + bias`` where ``scale = gamma / sqrt(var + eps)`` is
  folded at weight-conversion time.  Parameters live in the normal param tree
  but receive no gradient via the solver's param-group masks (matching d2's
  requires_grad=False).
* **stride_in_1x1**: caffe-style bottlenecks put the stride on the first 1x1
  conv (d2 ``RESNETS.STRIDE_IN_1X1=True`` default, required for MSRA weight
  parity).
* NHWC layout, explicit torch-style padding (pad=1 on 3x3 stride-2 convs is
  NOT XLA "SAME").

Returns a dict of feature maps ``{"res2": (B, H/4, W/4, 256), ...,
"res5": (B, H/32, W/32, 2048)}``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """``dtype``: computation dtype (flax convention).  Params stay f32;
    passing bf16 keeps the whole activation chain — and therefore the
    BACKWARD dx chain — in bf16.  Without it the f32 scale promotes every
    post-conv tensor to f32, and autodiff then drags 4x-HBM f32 cotangents
    through the entire backbone (measured ~25 ms/step at 800 px batch 4)."""

    features: int
    scale_init: nn.initializers.Initializer = nn.initializers.ones
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", self.scale_init, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.dtype is not None:
            scale = scale.astype(self.dtype)
            bias = bias.astype(self.dtype)
            x = x.astype(self.dtype)
        return x * scale + bias


class BottleneckBlock(nn.Module):
    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    has_shortcut: bool = False
    # Damp the residual branch's final norm scale at init (torch
    # ``zero_init_residual``'s intent, adapted to FrozenBN): from-scratch
    # FrozenBN stacks otherwise explode activations with depth (loss_cls ~13
    # at init, NaN by iter ~10 at the reference BASE_LR 2.5e-3).  A literal
    # zero would kill the branch FOREVER — FrozenBN affines never receive
    # gradients (solver.trainable_mask) — so a small frozen constant damps
    # the init variance while leaving conv-weight gradients alive.
    # Init-time only: checkpoint loads (ImageNet / reference .pth) overwrite
    # it, so d2 parity is unaffected.
    residual_scale_init: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        out = nn.Conv(
            self.bottleneck_channels, (1, 1), strides=self.stride, use_bias=False,
            name="conv1", dtype=dt,
        )(x)
        out = FrozenBatchNorm(self.bottleneck_channels, name="conv1_norm",
                              dtype=dt)(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.bottleneck_channels, (3, 3), padding=((1, 1), (1, 1)),
            use_bias=False, name="conv2", dtype=dt,
        )(out)
        out = FrozenBatchNorm(self.bottleneck_channels, name="conv2_norm",
                              dtype=dt)(out)
        out = nn.relu(out)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="conv3",
                      dtype=dt)(out)
        out = FrozenBatchNorm(
            self.out_channels, name="conv3_norm",
            scale_init=nn.initializers.constant(self.residual_scale_init),
            dtype=dt,
        )(out)

        if self.has_shortcut:
            sc = nn.Conv(
                self.out_channels, (1, 1), strides=self.stride, use_bias=False,
                name="shortcut", dtype=dt,
            )(x)
            sc = FrozenBatchNorm(self.out_channels, name="shortcut_norm",
                                 dtype=dt)(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNet50(nn.Module):
    """R50 trunk; stage block counts (3, 4, 6, 3), caffe-style.

    ``freeze_at``: d2 ``MODEL.BACKBONE.FREEZE_AT`` semantics (1 = stem,
    2 = stem+res2, ...).  Frozen stages end in ``stop_gradient`` — the
    reference's ``requires_grad=False`` means torch's autograd never
    RUNS the frozen stages' backward, and the stem/res2 convs are the
    highest-resolution (most expensive) backward work in the model.
    Masking updates in the optimizer alone (``solver/build.py:
    trainable_mask``) keeps parity of the *updates* but wastes that
    backward compute every TTA/train step; both layers now enforce it."""

    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    # res2 output width; stages double from here (256 = the R50 standard;
    # smaller widths give the same topology for small-scale tests/fixtures)
    stage_width: int = 256
    freeze_at: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # stem: 7x7/2 + FrozenBN + relu + maxpool 3x3/2 (torch pad 1)
        x = nn.Conv(64, (7, 7), strides=2, padding=((3, 3), (3, 3)), use_bias=False,
                    name="stem_conv1", dtype=self.dtype)(x)
        x = FrozenBatchNorm(64, name="stem_conv1_norm", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)

        outputs = {}
        for stage_idx, num_blocks in enumerate(self.stage_blocks):
            name = f"res{stage_idx + 2}"
            out_ch = self.stage_width * (2 ** stage_idx)
            mid_ch = (self.stage_width // 4) * (2 ** stage_idx)
            for b in range(num_blocks):
                stride = 2 if (b == 0 and stage_idx > 0) else 1
                x = BottleneckBlock(
                    mid_ch, out_ch, stride=stride,
                    has_shortcut=(b == 0),
                    name=f"{name}_{b}", dtype=self.dtype,
                )(x)
            if self.freeze_at >= stage_idx + 2:
                x = jax.lax.stop_gradient(x)
            if name in self.out_features:
                outputs[name] = x
        return outputs
