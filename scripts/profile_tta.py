"""Component-wise timing of the TTA step on the current default device.

IMPORTANT measurement note: on the axon TPU tunnel, ``jax.block_until_ready``
can return without raising after a worker abort, making timings meaningless
(dispatch-only).  Every measurement here therefore syncs by copying one
scalar device->host (``_sync``), which both orders the timeline correctly and
raises loudly if the computation aborted.

Run: python scripts/profile_tta.py [size]      (size defaults to 512)

Uses the bench's warmed-weights cache (``.bench_cache/warm_*.msgpack``) when
present so the matching path is ACTIVE inside the measured step; prints the
node count and TTA loss as evidence.
"""

import importlib.util
import os
import sys
import time

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    """True synchronization: device->host copy of ONE element (copying a whole
    leaf would time the tunnel transfer, not the computation)."""
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(jnp.ravel(leaf)[0])


def timeit(fn, *args, n=5, reps=4, **kw):
    """Min-of-reps: the tunnel TPU is shared, so the best rep is the honest
    capability number; means are contention-noise."""
    _sync(fn(*args, **kw))  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args, **kw)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench


def main():
    from ttdg_mgm_tpu.engine.steps import TrainState, make_tta_step
    from ttdg_mgm_tpu.models import MaskRCNN
    from ttdg_mgm_tpu.solver.build import build_optimizer
    from ttdg_mgm_tpu.utils.platform import is_tpu_backend

    # size: an int (square canvas) or "rect" = the reference-faithful
    # 832x1344 eval bucket with valid 800x1333 (bench.synth_batch_rect)
    arg = sys.argv[1] if len(sys.argv) > 1 else "512"
    B = 4
    bench = _load_bench()
    model = MaskRCNN(num_classes=2, compute_dtype="bfloat16")
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 64, 64, 3)),
                        jnp.asarray([[64.0, 64.0]]))["params"]

    cache_dir = os.path.join(REPO, ".bench_cache")
    warm = ([f for f in os.listdir(cache_dir)
             if f.startswith("warm_") and f.endswith(".msgpack")]
            if os.path.isdir(cache_dir) else [])
    if warm:
        import flax.serialization as fser

        # newest by mtime: key-version bumps in bench.py leave stale (possibly
        # diverged) caches behind whose names sort arbitrarily
        newest = max(warm, key=lambda f: os.path.getmtime(
            os.path.join(cache_dir, f)))
        with open(os.path.join(cache_dir, newest), "rb") as f:
            params = fser.from_bytes(params, f.read())
        print(f"warmed weights: {newest}")
    else:
        print("warmed weights: NONE (random init; matching may be inactive)")

    # device-put ONCE: fser.from_bytes leaves numpy arrays, and jit re-feeds
    # host args through the tunnel EVERY call (~180 MB of weights, ~0.5 s) —
    # measured piece timings were transfer-dominated garbage until this line
    params = jax.device_put(params)

    if arg == "rect":
        raw = bench.synth_batch_rect(np, (832, 1344), (800, 1333), B, seed=99)
    else:
        raw = bench.synth_batch(np, int(arg), B, seed=99, with_gt=False)
    images = jnp.asarray(raw["image"])
    sizes = jnp.asarray(raw["image_sizes"])

    print(f"device: {jax.devices()[0].platform}; "
          f"is_tpu_backend={is_tpu_backend()} (fused GA-GM + windowed pool gate)")

    feats_fn = jax.jit(lambda p, im: model.apply(
        {"params": p}, im, method=model.extract_features))
    fwd = jax.jit(lambda p, im, sz: model.apply(
        {"params": p}, im, sz, method=model.forward_inference))
    ttt = jax.jit(lambda p, im, sz: model.apply(
        {"params": p}, im, sz, method=model.loss_ttt))
    ttt_grad = jax.jit(lambda p, im, sz: jax.value_and_grad(
        lambda q: model.apply({"params": q}, im, sz, method=model.loss_ttt))(p))

    # node-count evidence (matching active?)
    def nodes_fn(p, im, sz):
        def inner(m, x, s):
            feats = m.extract_features(x)
            _, (pb, ps, pv) = m._proposals(feats, s, train=False)
            boxes, scores, classes, valid = m._box_inference(feats, pb, pv, s)
            nodes, labels, mask = m.graph_generator(
                m._feature_list(feats), boxes, classes, valid)
            return mask

        return model.apply({"params": p}, im, sz, method=inner)

    mask = jax.jit(nodes_fn)(params, images, sizes)
    print(f"nodes sampled         : {int(jnp.sum(mask))}")

    # --- incremental pipeline stages (VERDICT r3 #1: per-stage anatomy of the
    # 800px matching-active step).  Each jitted fn runs the pipeline UP TO a
    # stage and reduces that stage's outputs to a scalar so XLA cannot DCE it;
    # consecutive differences are the per-stage costs.  XLA may fuse stage
    # boundaries differently in each program, so the splits are ~ +-10%.
    def upto_proposals(p, im, sz):
        def inner(m, x, s):
            feats = m.extract_features(x)
            _, (pb, ps, pv) = m._proposals(feats, s, train=False)
            return jnp.sum(pb) + jnp.sum(ps)

        return model.apply({"params": p}, im, sz, method=inner)

    def upto_pool(p, im, sz):
        def inner(m, x, s):
            feats = m.extract_features(x)
            _, (pb, ps, pv) = m._proposals(feats, s, train=False)
            pooled = m._pool(feats, pb, 7)
            return jnp.sum(pooled.astype(jnp.float32))

        return model.apply({"params": p}, im, sz, method=inner)

    def upto_boxinf(p, im, sz):
        def inner(m, x, s):
            feats = m.extract_features(x)
            _, (pb, ps, pv) = m._proposals(feats, s, train=False)
            boxes, scores, classes, valid = m._box_inference(feats, pb, pv, s)
            return jnp.sum(boxes) + jnp.sum(scores)

        return model.apply({"params": p}, im, sz, method=inner)

    def upto_nodes(p, im, sz):
        def inner(m, x, s):
            feats = m.extract_features(x)
            _, (pb, ps, pv) = m._proposals(feats, s, train=False)
            boxes, scores, classes, valid = m._box_inference(feats, pb, pv, s)
            nodes, labels, nm = m.graph_generator(
                m._feature_list(feats), jax.lax.stop_gradient(boxes), classes,
                valid)
            return jnp.sum(nodes.astype(jnp.float32))

        return model.apply({"params": p}, im, sz, method=inner)

    t_feat = timeit(feats_fn, params, images)
    t_prop = timeit(jax.jit(upto_proposals), params, images, sizes)
    t_pool = timeit(jax.jit(upto_pool), params, images, sizes)
    t_binf = timeit(jax.jit(upto_boxinf), params, images, sizes)
    t_node = timeit(jax.jit(upto_nodes), params, images, sizes)
    t_ttt = timeit(ttt, params, images, sizes)
    t_grad = timeit(ttt_grad, params, images, sizes)
    print("--- incremental stage splits (fwd path) ---")
    print(f"backbone+fpn          : {t_feat:8.2f} ms")
    print(f"+ rpn head/decode/nms : {t_prop:8.2f} ms  (delta {t_prop - t_feat:+7.2f})")
    print(f"+ box pooler (7x7)    : {t_pool:8.2f} ms  (delta {t_pool - t_prop:+7.2f})")
    print(f"+ box head+nms        : {t_binf:8.2f} ms  (delta {t_binf - t_pool:+7.2f})")
    print(f"+ node sampling       : {t_node:8.2f} ms  (delta {t_node - t_binf:+7.2f})")
    print(f"+ MGM solve (=ttt fwd): {t_ttt:8.2f} ms  (delta {t_ttt - t_node:+7.2f})")
    print(f"ttt fwd+bwd           : {t_grad:8.2f} ms  (backward {t_grad - t_ttt:+7.2f})")

    # detector-only TTT path: everything loss_ttt does EXCEPT the MGM3 solve
    # (isolates the matching module's cost inside the step)
    def det_only(p, im, sz):
        def inner(m, x, s):
            feats = m.extract_features(x)
            _, (pb, ps, pv) = m._proposals(feats, s, train=False)
            boxes, scores, classes, valid = m._box_inference(feats, pb, pv, s)
            nodes, labels, mask = m.graph_generator(
                m._feature_list(feats), jax.lax.stop_gradient(boxes), classes,
                valid)
            return jnp.sum(nodes.astype(jnp.float32) ** 2)

        return model.apply({"params": p}, im, sz, method=inner)

    det_grad = jax.jit(lambda p, im, sz: jax.value_and_grad(
        lambda q: det_only(q, im, sz))(p))

    print(f"inference fwd         : {timeit(fwd, params, images, sizes):8.2f} ms")
    print(f"det-only fwd+bwd      : {timeit(det_grad, params, images, sizes):8.2f} ms")

    tx = build_optimizer(params, lambda _: 0.005)
    state = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    step = make_tta_step(model, tx)
    state, loss = step(state, {"image": images, "image_sizes": sizes})
    print(f"warmup loss           : {float(loss):.5f}")
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        state, loss = step(state, {"image": images + i, "image_sizes": sizes})
    lv = float(loss)  # sync + abort check
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"full TTA step         : {dt:8.2f} ms  ({B / dt * 1e3:.1f} img/s)  loss={lv:.5f}")


if __name__ == "__main__":
    main()
