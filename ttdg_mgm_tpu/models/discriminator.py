"""Image-level domain discriminator with gradient reversal.

Capability of reference ``adapteacher/modeling/meta_arch/rcnn.py:30-63``:
``FCDiscriminator_img`` — a 3-conv patch classifier over a chosen FPN level
(default p2) — and ``GradReverse``, implemented here as a ``custom_vjp`` that
negates (and optionally scales) the cotangent.
"""

from __future__ import annotations

import typing as t

import flax.linen as nn
import jax
import jax.numpy as jnp


@jax.custom_vjp
def grad_reverse(x, scale=1.0):
    return x


def _gr_fwd(x, scale):
    return x, scale


def _gr_bwd(scale, g):
    return (-scale * g, None)


grad_reverse.defvjp(_gr_fwd, _gr_bwd)


class FCDiscriminatorImg(nn.Module):
    """conv3x3(C->C/2) -> LReLU -> conv3x3(C/2->C/4) -> LReLU -> conv3x3(C/4->1)."""

    channels: int = 256
    dtype: t.Any = None  # computation dtype (params stay f32)

    @nn.compact
    def __call__(self, x):
        c = self.channels
        x = nn.Conv(c // 2, (3, 3), padding=((1, 1), (1, 1)), name="conv1",
                    dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(c // 4, (3, 3), padding=((1, 1), (1, 1)), name="conv2",
                    dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), name="classifier",
                       dtype=self.dtype)(x)
