"""Learned pairwise node affinity.

Capability of reference ``adapteacher/modeling/GModule/utils/affinity.py:9-57``:
per-side linear projections (no bias) followed by a concat-MLP scored over all
N1 x N2 node pairs.  TPU-first difference: instead of materializing the
``(N1, N2, 2C)`` concat tensor and pushing it through the MLP, the first MLP
layer is split into its X-half and Y-half so the pairwise interaction becomes
two ``(N, C) @ (C, H)`` matmuls plus a broadcast add — MXU-shaped, and the
memory high-water drops from ``O(N1*N2*2C)`` to ``O(N1*N2*H)`` only at the
(fused) activation.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

_init_std001 = nn.initializers.normal(stddev=0.01)


class Affinity(nn.Module):
    """M[i, j] = MLP([proj_sr(X)_i ; proj_tg(Y)_j]) for all pairs.

    ``__call__(X (..., N1, D), Y (..., N2, D)) -> (..., N1, N2)``.
    """

    d: int = 256
    hidden: int = 512

    @nn.compact
    def __call__(self, X, Y):
        X = nn.Dense(self.d, use_bias=False, kernel_init=_init_std001, name="project_sr")(X)
        Y = nn.Dense(self.d, use_bias=False, kernel_init=_init_std001, name="project_tg")(Y)
        # fc_M layer 0 acting on concat([X_i, Y_j]) == fc0_x(X_i) + fc0_y(Y_j) + b0
        hx = nn.Dense(self.hidden, kernel_init=_init_std001, name="fc0_x")(X)
        hy = nn.Dense(self.hidden, use_bias=False, kernel_init=_init_std001, name="fc0_y")(Y)
        h = jnp.maximum(hx[..., :, None, :] + hy[..., None, :, :], 0.0)
        m = nn.Dense(1, kernel_init=_init_std001, name="fc1")(h)
        return m[..., 0]
