"""Benchmark: TTA throughput (images/sec/chip) of the donated-buffer jitted
adaptation step on the flagship Mask R-CNN R50-FPN.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference's TTA loop runs ~6 separate CUDA launches + a CPU scipy
Hungarian round trip per batch (SURVEY.md section 3.1); no published
baseline number exists (BASELINE.md), so ``vs_baseline`` reports the ratio
against the recorded value in ``bench_baseline.json`` when present (our own
round-over-round record), else 0.0.
"""

from __future__ import annotations

import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp

    from ttdg_mgm_tpu.engine.steps import TrainState, make_tta_step
    from ttdg_mgm_tpu.models import MaskRCNN
    from ttdg_mgm_tpu.solver.build import build_optimizer

    B, H, W = 4, 512, 512  # reference TTA batch (TEST.BATCH=4, test_segment.yaml)
    # bf16 compute policy is the TPU production path (10x MXU throughput over
    # f32 measured on-chip; matching solvers stay f32 internally)
    model = MaskRCNN(num_classes=2, compute_dtype="bfloat16")

    rng = jax.random.PRNGKey(0)
    init_imgs = jnp.zeros((1, 64, 64, 3))
    params = model.init(rng, init_imgs, jnp.asarray([[64.0, 64.0]]))["params"]
    tx = build_optimizer(params, lambda _: 0.005)
    state = TrainState.create(params, tx)

    images = jax.random.uniform(rng, (B, H, W, 3)) * 255.0
    sizes = jnp.tile(jnp.asarray([[float(H), float(W)]]), (B, 1))
    batch = {"image": images, "image_sizes": sizes}

    step = make_tta_step(model, tx)
    state, loss = step(state, batch)  # compile + warmup
    float(loss)

    # Measurement honesty (two hard-won lessons about the axon TPU tunnel):
    # 1. ``jax.block_until_ready`` can return without raising after a worker
    #    abort, making a block-synced loop report dispatch-only times.  Sync
    #    with a device->host scalar copy (``float``) — it orders the timeline
    #    AND raises loudly if the computation aborted.
    # 2. The tunnel device is shared: identical programs vary >10x with
    #    contention.  Take the best of several reps — the min is the honest
    #    capability number; the mean measures other tenants.
    # Sync once per rep, not per step: the reference's TTA loop never reads
    # the loss back between batches, and on the axon tunnel a per-step
    # device->host scalar read charges a ~20 ms round-trip latency to every
    # step (measured 91 vs 70 ms/step).  The rep-end float() still orders
    # the timeline and raises loudly on a worker abort.
    n_iters, n_reps = 5, 6
    losses = [float(loss)]  # warmup loss: matching-active evidence pre-decay
    dt_step = float("inf")
    for rep in range(n_reps):
        t0 = time.perf_counter()
        for i in range(n_iters):
            state, loss = step(state, {"image": images + i, "image_sizes": sizes})
        losses.append(float(loss))
        dt_step = min(dt_step, (time.perf_counter() - t0) / n_iters)
    matching_active = any(l != 0.0 for l in losses)

    # A cold (random-init) detector can yield detections with no interior
    # FCOS-positive locations -> empty node sets -> the matching solver takes
    # its converged fast path.  Only in that case, charge the step with a
    # fully-loaded matching pass (G=B graphs x 100 nodes, the sampler's cap)
    # so the reported number reflects the real TTA workload.
    from ttdg_mgm_tpu.graph.mgm import MGM3Unsup

    G, M, D = B, 100, 256
    rng2 = jax.random.PRNGKey(1)
    nodes = jax.random.normal(rng2, (G, M, D))
    nmask = jnp.ones((G, M), bool)
    nlabels = (jnp.arange(M)[None] % 2 + 1) * jnp.ones((G, 1), jnp.int32)
    mgm = MGM3Unsup(num_classes=2, univ_size=32, dim=D)
    mp = mgm.init(rng2, nodes, nlabels, nmask, jax.random.normal(rng2, (32, D)))
    Umat = jax.random.normal(rng2, (32, D))
    dt_mgm = 0.0
    if not matching_active:
        mgm_vg = jax.jit(jax.value_and_grad(
            lambda n: mgm.apply(mp, n, nlabels, nmask, Umat)))
        float(mgm_vg(nodes)[0])
        dt_mgm = float("inf")
        for rep in range(n_reps):
            t0 = time.perf_counter()
            for i in range(n_iters):
                out = mgm_vg(nodes + 0.001 * i)[0]
            float(out)  # rep-end sync: orders timeline, raises on abort
            dt_mgm = min(dt_mgm, (time.perf_counter() - t0) / n_iters)

    imgs_per_sec = B / (dt_step + dt_mgm)
    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    vs = 0.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f).get("tta_images_per_sec_per_chip", 0.0)
        if base > 0:
            vs = imgs_per_sec / base
    print(json.dumps({
        "metric": "tta_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 3),
        "unit": "images/s",
        "vs_baseline": round(vs, 3),
    }))


def _main_with_retry():
    """The axon TPU worker can abort mid-run (rare, transient); an abort
    poisons the in-process backend, so retry in a FRESH process — a fresh
    process usually recovers (.claude/skills/verify gotchas)."""
    try:
        main()
    except Exception as e:  # noqa: BLE001 - any backend abort
        if os.environ.get("TTDG_BENCH_RETRY"):
            raise
        import subprocess
        import sys

        print(f"# bench aborted ({type(e).__name__}: {e}); retrying in a "
              "fresh process", file=sys.stderr)
        env = dict(os.environ, TTDG_BENCH_RETRY="1")
        raise SystemExit(subprocess.call([sys.executable, __file__], env=env))


if __name__ == "__main__":
    _main_with_retry()
