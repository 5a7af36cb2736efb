"""Optimizer + LR schedule construction.

Capability of d2 ``build_optimizer`` as used by the reference (SGD momentum
0.9, weight decay 1e-4, per-group LRs) and the reference's schedulers
(``adapteacher/solver/build.py:8-43``, ``lr_scheduler.py:8-52``):
``WarmupMultiStepLR``, ``WarmupCosineLR``, ``WarmupTwoStageMultiStepLR``.

TPU-native differences: schedules are pure step->lr functions consumed by
``optax.sgd``; d2's requires_grad freezing (``BACKBONE.FREEZE_AT=2`` -> stem +
res2, plus all FrozenBatchNorm affine params) becomes an ``optax.masked``
zero-update mask over the param tree.
"""

from __future__ import annotations

import math
from bisect import bisect_right
from typing import Sequence

import jax
import jax.numpy as jnp
import optax


def _warmup_factor(step, warmup_iters: int, warmup_factor: float):
    alpha = jnp.minimum(step / max(warmup_iters, 1), 1.0)
    return jnp.where(step >= warmup_iters, 1.0, warmup_factor * (1 - alpha) + alpha)


def warmup_multistep_schedule(base_lr: float, steps: Sequence[int],
                              gamma: float = 0.1, warmup_iters: int = 1000,
                              warmup_factor: float = 0.001):
    steps = tuple(steps)

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        decay = jnp.ones(())
        for s in steps:
            decay = decay * jnp.where(count >= s, gamma, 1.0)
        return base_lr * decay * _warmup_factor(count, warmup_iters, warmup_factor)

    return schedule


def warmup_two_stage_schedule(base_lr: float, milestones: Sequence[int],
                              factor_list: Sequence[float],
                              warmup_iters: int = 1000,
                              warmup_factor: float = 0.001):
    """Reference ``WarmupTwoStageMultiStepLR``: per-interval LR factors."""
    milestones = tuple(milestones)
    factor_list = tuple(factor_list)
    assert len(factor_list) == len(milestones) + 1

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        factor = jnp.full((), factor_list[0], jnp.float32)
        for i, m in enumerate(milestones):
            factor = jnp.where(count >= m, factor_list[i + 1], factor)
        return base_lr * factor * _warmup_factor(count, warmup_iters, warmup_factor)

    return schedule


def warmup_cosine_schedule(base_lr: float, max_iters: int,
                           warmup_iters: int = 1000, warmup_factor: float = 0.001):
    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * count / max_iters))
        return base_lr * cos * _warmup_factor(count, warmup_iters, warmup_factor)

    return schedule


def trainable_mask(params, *, freeze_at: int = 2):
    """True = trainable.  Freezes FrozenBatchNorm affines everywhere and the
    backbone stem + res2..res{freeze_at} stages (d2 ``BACKBONE.FREEZE_AT``)."""
    frozen_stages = [f"res{i}" for i in range(2, freeze_at + 1)]

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        for p in path:
            if p.endswith("_norm") or p == "norm":
                return False
        if len(path) >= 2 and path[0] == "backbone":
            if path[1].startswith("stem") and freeze_at >= 1:
                return False
            for st in frozen_stages:
                if path[1].startswith(st + "_"):
                    return False
        return True

    return walk(params, ())


def build_optimizer(params, schedule, *, momentum: float = 0.9,
                    weight_decay: float = 1e-4, freeze_at: int = 2,
                    nesterov: bool = False, clip_gradients: dict | None = None):
    """SGD + momentum with decoupled-into-gradient weight decay (torch
    semantics: wd added to the gradient before the momentum update).

    ``clip_gradients``: d2 ``SOLVER.CLIP_GRADIENTS`` (reference d2
    ``build_optimizer`` gradient-clipping wrapper): when ``ENABLED``,
    ``CLIP_TYPE`` "value" clips each gradient element to ±``CLIP_VALUE``
    (torch ``clip_grad_value_``), "norm" clips the global norm to
    ``CLIP_VALUE`` (torch ``clip_grad_norm_``, ``NORM_TYPE`` 2 only — the
    L2 global norm is the only one that maps to a single XLA reduction).
    Clipping applies to the raw gradients, before weight decay and momentum,
    matching the torch call order (clip after backward, wd inside the step).

    Frozen leaves get ``set_to_zero`` updates via ``multi_transform`` — NOT
    ``optax.masked``, whose masked-out leaves pass their raw gradients
    through as updates (i.e. ``param += grad``), silently un-freezing and
    destabilizing training.
    """
    mask = trainable_mask(params, freeze_at=freeze_at)
    labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    links = []
    if clip_gradients and clip_gradients.get("ENABLED"):
        ctype = clip_gradients.get("CLIP_TYPE", "value")
        cval = float(clip_gradients.get("CLIP_VALUE", 1.0))
        if ctype == "norm":
            assert float(clip_gradients.get("NORM_TYPE", 2.0)) == 2.0, \
                "only the L2 global norm is supported"
            links.append(optax.clip_by_global_norm(cval))
        else:
            links.append(optax.clip(cval))
    tx = optax.chain(
        *links,
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=schedule, momentum=momentum, nesterov=nesterov),
    )
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )
