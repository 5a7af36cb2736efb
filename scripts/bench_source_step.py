"""Timing of the supervised source-training step on the current default
device (reference ``BaselineTrainer.run_step``: batch 8 at 800px,
``configs/seg_res50fpn_source.yaml`` SOLVER).

Same measurement rules as scripts/profile_tta.py: sync by copying ONE scalar
device->host (block_until_ready can swallow axon worker aborts), min-of-reps
against tunnel contention.

Run: python scripts/bench_source_step.py [B] [canvas]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(jnp.ravel(leaf)[0])


def timeit(fn, *args, n=3, reps=4, **kw):
    _sync(fn(*args, **kw))  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args, **kw)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


def main():
    from ttdg_mgm_tpu.engine.steps import TrainState, make_source_step
    from ttdg_mgm_tpu.models import MaskRCNN
    from ttdg_mgm_tpu.solver.build import build_optimizer

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    canvas = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    gt_cap, mask_res = 20, 256
    model = MaskRCNN(num_classes=2, compute_dtype="bfloat16")

    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 64, 64, 3)),
                        jnp.asarray([[64.0, 64.0]]))["params"]
    tx = build_optimizer(params, lambda _: 0.0025)
    state = TrainState.create(params, tx)

    imgs = jax.random.uniform(rng, (B, canvas, canvas, 3)) * 255.0
    sizes = jnp.tile(jnp.asarray([[float(canvas)] * 2]), (B, 1))
    # two valid GT boxes per image with square masks
    gt_boxes = jnp.tile(
        jnp.asarray([[[100.0, 100.0, 400.0, 400.0],
                      [300.0, 250.0, 650.0, 600.0]]
                     + [[0.0] * 4] * (gt_cap - 2)]), (B, 1, 1))
    gt_classes = jnp.zeros((B, gt_cap), jnp.int32)
    gt_valid = jnp.zeros((B, gt_cap), bool).at[:, :2].set(True)
    m = mask_res
    gt_masks = jnp.zeros((B, gt_cap, m, m), jnp.uint8)
    gt_masks = gt_masks.at[:, 0, m // 8: m // 2, m // 8: m // 2].set(1)
    gt_masks = gt_masks.at[:, 1, m // 3: 3 * m // 4, m // 3: 3 * m // 4].set(1)
    batch = {"image": imgs, "image_sizes": sizes, "gt_boxes": gt_boxes,
             "gt_classes": gt_classes, "gt_masks": gt_masks,
             "gt_valid": gt_valid}

    step = make_source_step(model, tx)
    step_rng = jax.random.PRNGKey(1)

    def run(state, batch, r):
        return step(state, batch, r)

    # donated state: rebuild between timings via a fresh copy
    t0 = time.perf_counter()
    state, metrics = step(state, batch, step_rng)
    _sync(metrics["total_loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s")
    print("losses:", {k: round(float(v), 4) for k, v in metrics.items()})

    n, reps = 3, 4
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(n):
            state, metrics = step(state, {**batch, "image": imgs + i}, step_rng)
        _sync(metrics["total_loss"])
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    print(f"source step (B={B}, {canvas}px): {best:.1f} ms  "
          f"-> {B / best * 1e3:.1f} img/s/chip")


if __name__ == "__main__":
    main()
