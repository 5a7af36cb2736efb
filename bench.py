"""Benchmark: TTA throughput (images/sec/chip) of the donated-buffer jitted
adaptation step on the flagship Mask R-CNN R50-FPN, at the REFERENCE
configuration: 800px canvas, TEST.BATCH=4 (reference ``test_segment.yaml``
INPUT.MIN_SIZE_TEST=800 + TEST.BATCH=4), with the matching path ACTIVE
inside the measured step — the weights are warmed by a short synthetic
source training so detections carry interior FCOS-positive locations and
the MGM solve runs for real (no composite accounting).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Extras: the 512px number (round-over-round comparability with BENCH_r01),
Sinkhorn ms/iter (BASELINE.md first-class kernel metric), and
matching_active evidence.

``vs_baseline`` honesty: the reference repo publishes NO throughput number
and no A100 is reachable from this machine (BASELINE.md), so the ratio is
against OUR recorded 800px number in ``bench_baseline.json`` (the
round-over-round record; the 512px round-1 record is reported alongside).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
WARM_STEPS = 120
WARM_SIZE = 320  # warmup resolution: conv weights are resolution-agnostic


def synth_batch(np, size: int, B: int, seed: int = 0, with_gt: bool = True,
                mask_res: int = 128):
    """Bright-disc images (+ GT) — structure a warmed detector actually
    detects, so the bench's TTA matching path is active on-distribution."""
    rng = np.random.RandomState(seed)
    imgs = rng.randint(20, 45, (B, size, size, 3)).astype(np.float32)
    boxes = np.zeros((B, 2, 4), np.float32)
    classes = np.zeros((B, 2), np.int32)
    valid = np.zeros((B, 2), bool)
    masks = np.zeros((B, 2, mask_res, mask_res), np.uint8)
    for b in range(B):
        for k in range(2):
            r = rng.randint(size // 10, size // 5)
            cx = rng.randint(r + 2, size - r - 2)
            cy = rng.randint(r + 2, size - r - 2)
            yy, xx = np.mgrid[:size, :size]
            disc = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            imgs[b][disc] = [210 - 40 * k, 170, 150 + 30 * k]
            boxes[b, k] = (cx - r, cy - r, cx + r, cy + r)
            classes[b, k] = k
            valid[b, k] = True
            sc = mask_res / size
            ym, xm = np.mgrid[:mask_res, :mask_res]
            masks[b, k] = ((ym - cy * sc) ** 2 + (xm - cx * sc) ** 2
                           <= (r * sc) ** 2).astype(np.uint8)
    sizes = np.full((B, 2), float(size), np.float32)
    out = {"image": imgs, "image_sizes": sizes}
    if with_gt:
        out.update(gt_boxes=boxes, gt_classes=classes, gt_valid=valid,
                   gt_masks=masks)
    return out


def synth_batch_rect(np, canvas_hw, valid_hw, B: int, seed: int = 0):
    """Non-square batch on a rectangular eval bucket: disc content fills the
    VALID region (valid_hw) of a larger padded canvas (canvas_hw) — the
    geometry the reference-faithful eval path feeds the step
    (``data/loader.py:CANVAS_BUCKETS``; ResizeShortestEdge(800,1333) output
    padded onto the 832x1344 bucket)."""
    CH, CW = canvas_hw
    VH, VW = valid_hw
    rng = np.random.RandomState(seed)
    imgs = np.zeros((B, CH, CW, 3), np.float32)
    imgs[:, :VH, :VW] = rng.randint(20, 45, (B, VH, VW, 3)).astype(np.float32)
    for b in range(B):
        for k in range(2):
            r = rng.randint(min(VH, VW) // 10, min(VH, VW) // 5)
            cx = rng.randint(r + 2, VW - r - 2)
            cy = rng.randint(r + 2, VH - r - 2)
            yy, xx = np.mgrid[:VH, :VW]
            disc = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            imgs[b, :VH, :VW][disc] = [210 - 40 * k, 170, 150 + 30 * k]
    sizes = np.tile(np.asarray([[float(VH), float(VW)]], np.float32), (B, 1))
    return {"image": imgs, "image_sizes": sizes}


def warm_params(model, params, np, jnp, jax):
    """~100 source-training steps on synthetic discs (cached on disk keyed by
    the param-tree signature) so the bench measures a detector whose TTA
    matching path is active, like an eval run from a real checkpoint."""
    import flax.serialization as fser

    sig = hashlib.sha1(
        str(jax.tree.map(lambda x: (tuple(x.shape), str(x.dtype)), params)).encode()
        + f"v7:{WARM_STEPS}x{WARM_SIZE}".encode()  # v7: adaptive (ratio-0) poolers
    ).hexdigest()[:16]
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"warm_{sig}.msgpack")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return fser.from_bytes(params, f.read())

    from ttdg_mgm_tpu.engine.steps import TrainState, make_source_step
    from ttdg_mgm_tpu.solver.build import build_optimizer, warmup_multistep_schedule

    # Reference BASE_LR 2.5e-3 (seg_res50fpn_source.yaml SOLVER).  This
    # warmup trains FROM SCRATCH — a regime the reference never runs (it
    # always starts from ImageNet R-50): random FrozenBN stacks produce
    # exploding activations (loss_cls ~13 at init vs ~0.6 pretrained) and
    # diverge by iter ~10 at any useful LR.  d2's own remedy for unstable
    # gradients is SOLVER.CLIP_GRADIENTS; of its two CLIP_TYPEs only the
    # GLOBAL-NORM clip (norm, 1.0) converges here — per-element value clip
    # stays finite but explodes (every element saturates to ±CLIP_VALUE, so
    # the update direction degenerates to sign(grad) with norm ~sqrt(Nparams)
    # · lr; measured: loss_cls 3.7e6 by iter 114, scripts/diag_warmup.py).
    # Norm clip at the full reference LR: total_loss 0.58 by iter 120, all
    # components stable.  The periodic finite check below makes any future
    # divergence loud instead of silently caching a NaN detector.
    wtx = build_optimizer(
        params, warmup_multistep_schedule(2.5e-3, (100000,), warmup_iters=40,
                                          warmup_factor=0.05),
        clip_gradients={"ENABLED": True, "CLIP_TYPE": "norm",
                        "CLIP_VALUE": 1.0},
    )
    state = TrainState.create(jax.tree.map(jnp.copy, params), wtx)
    step = make_source_step(model, wtx)
    rng = jax.random.PRNGKey(0)
    for it in range(WARM_STEPS):
        batch = {k: jnp.asarray(v)
                 for k, v in synth_batch(np, WARM_SIZE, 4, seed=it).items()}
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        if it % 20 == 19 or it == WARM_STEPS - 1:
            lv = float(metrics["total_loss"])  # sync + abort check
            if not np.isfinite(lv):
                raise RuntimeError(
                    f"bench warmup diverged: total_loss={lv} at iter {it}")
            import sys
            print(f"# bench warmup {it + 1}/{WARM_STEPS} loss={lv:.3f} "
                  f"t={time.time():.0f}", file=sys.stderr, flush=True)
    warmed = jax.device_get(state.params)
    with open(path, "wb") as f:
        f.write(fser.to_bytes(warmed))
    return warmed


def measure_step(step, state, batch, *, n_iters=5, n_reps=6, jitter_key="image"):
    """Min-of-reps timing with one device->host sync per rep (orders the
    timeline AND raises on a worker abort; per-step syncs charge ~20 ms
    tunnel RTT each — see round-1 notes)."""
    dt = float("inf")
    loss = None
    for _ in range(n_reps):
        t0 = time.perf_counter()
        for i in range(n_iters):
            b = dict(batch)
            b[jitter_key] = batch[jitter_key] + i
            state, loss = step(state, b)
        lv = float(loss)
        dt = min(dt, (time.perf_counter() - t0) / n_iters)
    return dt, lv, state


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ttdg_mgm_tpu.engine.steps import TrainState, make_tta_step
    from ttdg_mgm_tpu.models import MaskRCNN
    from ttdg_mgm_tpu.solver.build import build_optimizer

    # bf16 compute policy is the TPU production path; matching solvers stay
    # f32 internally (ops/sinkhorn.py, graph/solvers.py)
    model = MaskRCNN(num_classes=2, compute_dtype="bfloat16")
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 64, 64, 3)),
                        jnp.asarray([[64.0, 64.0]]))["params"]
    params = warm_params(model, params, np, jnp, jax)
    tx = build_optimizer(params, lambda _: 0.0025)

    step = make_tta_step(model, tx)
    results = {}
    losses = {}
    for size in (800, 512):
        raw = synth_batch(np, size, 4, seed=99, with_gt=False)
        batch = {"image": jnp.asarray(raw["image"]),
                 "image_sizes": jnp.asarray(raw["image_sizes"])}
        state = TrainState.create(jax.tree.map(jnp.copy, params), tx)
        state, loss = step(state, dict(batch))  # compile + warmup
        float(loss)
        dt, lv, _ = measure_step(step, state, batch)
        results[size] = 4.0 / dt
        losses[size] = lv

    # rectangular eval-geometry row (VERDICT r3 #5): the reference-faithful
    # eval path pads ResizeShortestEdge(800,1333) outputs onto the 832x1344
    # bucket (data/loader.py:CANVAS_BUCKETS) — ~1.7x the square-800 pixels.
    # Also record the bucket's one-time compile cost (what a real eval pays
    # when it first meets this canvas).
    raw = synth_batch_rect(np, (832, 1344), (800, 1333), 4, seed=99)
    batch_r = {"image": jnp.asarray(raw["image"]),
               "image_sizes": jnp.asarray(raw["image_sizes"])}
    state = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    t0 = time.perf_counter()
    state, loss = step(state, dict(batch_r))
    rect_loss = float(loss)
    rect_compile_s = time.perf_counter() - t0
    dt_r, rect_loss, _ = measure_step(step, state, batch_r)
    rect_ips = 4.0 / dt_r

    # Sinkhorn kernel ms/iter (BASELINE.md first-class metric): the TTA
    # pairwise projection shape — batch of (4x4) pair problems, 100x100
    # node matrices, 20 iterations
    from ttdg_mgm_tpu.ops.sinkhorn import sinkhorn_project

    G, M, IT = 4, 100, 20
    s = jax.random.normal(jax.random.PRNGKey(1), (G, G, M, M))
    ms_r = jnp.full((G, G), M, jnp.int32)
    f = jax.jit(lambda x: sinkhorn_project(x, ms_r, ms_r, tau=0.05, max_iter=IT))
    float(jnp.sum(f(s)))
    t0 = time.perf_counter()
    reps = 20
    for i in range(reps):
        out = f(s + 0.001 * i)
    float(jnp.sum(out))
    sk_ms_per_iter = (time.perf_counter() - t0) / reps / IT * 1000.0

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline.json")
    base = {}
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
    base_800 = base.get("tta_images_per_sec_per_chip_800px", 0.0)
    vs = results[800] / base_800 if base_800 else 0.0
    # North-star denominator (BASELINE.md "A100 extrapolation"): the
    # documented 5-7 img/s estimate of the reference TTA step on one A100.
    # The ratio is stated at the reference-faithful RECT eval geometry (what
    # polyp-shaped data actually runs) AND at the square-800 headline.
    A100_LOW, A100_HIGH = 5.0, 7.0
    print(json.dumps({
        "metric": "tta_images_per_sec_per_chip",
        "value": round(results[800], 3),
        "unit": "images/s",
        "vs_baseline": round(vs, 3),
        "config": "800px canvas, TEST.BATCH=4, warmed weights, single step",
        "img_per_sec_512": round(results[512], 3),
        "img_per_sec_rect_832x1344": round(rect_ips, 3),
        "vs_a100_estimate": round(rect_ips / A100_HIGH, 2),
        "vs_a100_estimate_range": [round(rect_ips / A100_HIGH, 2),
                                   round(rect_ips / A100_LOW, 2)],
        "vs_a100_estimate_800": round(results[800] / A100_HIGH, 2),
        "a100_estimate_img_per_sec": [A100_LOW, A100_HIGH],
        "rect_bucket_compile_s": round(rect_compile_s, 1),
        "tta_loss_rect": rect_loss,
        "sinkhorn_ms_per_iter": round(sk_ms_per_iter, 4),
        "matching_active": bool(losses[800] != 0.0),
        "tta_loss_800": losses[800],
    }))


def _main_with_retry():
    """The axon TPU worker can abort mid-run (rare, transient); an abort
    poisons the in-process backend, so retry in a FRESH process.  A tunnel
    outage at startup ("Unable to initialize backend ... UNAVAILABLE") is
    also transient — wait it out with a few spaced fresh-process retries
    rather than failing the whole bench run."""
    try:
        main()
    except Exception as e:  # noqa: BLE001 - any backend abort
        import subprocess
        import sys

        attempt = int(os.environ.get("TTDG_BENCH_RETRY", "0"))
        init_outage = "Unable to initialize backend" in str(e)
        max_attempts = 6 if init_outage else 1
        if attempt >= max_attempts:
            raise
        if init_outage:
            print(f"# TPU tunnel down ({e}); retry {attempt + 1}/"
                  f"{max_attempts} in 150 s", file=sys.stderr)
            time.sleep(150)
        else:
            print(f"# bench aborted ({type(e).__name__}: {e}); retrying in a "
                  "fresh process", file=sys.stderr)
        env = dict(os.environ, TTDG_BENCH_RETRY=str(attempt + 1))
        raise SystemExit(subprocess.call([sys.executable, __file__], env=env))


if __name__ == "__main__":
    _main_with_retry()
