"""Isolate the GA-GM finale cost on the flagship problem size (G=4, M=100,
univ=32): time the fused VMEM kernel, the exact-LAP finale round, and a single
batched JV-LAP call; count the finale's actual convergence iterations.

Evidence for VERDICT round-2 ask #1 (profile the matching-active step and
attack the exact-JV-LAP finale).
"""
import os
import sys
import time

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from ttdg_mgm_tpu.graph.solvers import _gagm_round, final_hungarian_round
from ttdg_mgm_tpu.ops.lap import hungarian_auto
from ttdg_mgm_tpu.ops.pallas.gagm_pallas import ga_gm_fused
from ttdg_mgm_tpu.utils.platform import is_tpu_backend


def _sync(x):
    return np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[0])


def timeit(fn, *args, n=3, reps=3, **kw):
    _sync(fn(*args, **kw))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args, **kw)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


def make_problem(G=4, M=100, n_univ=32, noise=0.03, seed=0):
    rng = np.random.default_rng(seed)
    T = G * M
    ms = np.full((G,), M, np.int32)
    cols = [rng.permutation(n_univ)[: min(M, n_univ)] for _ in range(G)]
    gt = np.zeros((T, n_univ), np.float32)
    for g in range(G):
        idx = np.arange(min(M, n_univ))
        gt[g * M + idx, cols[g][idx]] = 1.0
    W = gt @ gt.T + noise * rng.random((T, T)).astype(np.float32)
    W = (W + W.T) / 2
    A = np.zeros((T, T), np.float32)
    for g in range(G):
        blk = rng.random((M, M)).astype(np.float32)
        blk = (blk + blk.T) / 2
        np.fill_diagonal(blk, 0.0)
        A[g * M : (g + 1) * M, g * M : (g + 1) * M] = blk
    U0 = (gt + 0.3 * rng.random((T, n_univ))).astype(np.float32)
    return (jnp.asarray(A), jnp.asarray(W), jnp.asarray(U0),
            jnp.asarray(ms), n_univ)


def finale_iters(A, W, U, ms, n_univ, cap=200):
    """Replicate final_hungarian_round but return the iteration count."""
    import functools
    from ttdg_mgm_tpu.graph.solvers import _project_blocks, _fro

    G = ms.shape[0]
    M = A.shape[0] // G
    T = G * M

    @jax.jit
    def run(A, W, U, ms):
        def power_step(U):
            UUt = U @ U.T
            V = (A @ ((UUt) @ A)) @ U * (0.5 * 2.0) + W @ U
            V = V / G
            c = jnp.maximum(jnp.max(jnp.abs(V)) / 1e30, 1.0)
            return _project_blocks(
                (V / c).reshape(G, M, n_univ), ms, n_univ, tau=1e-2 / c,
                sk_iter=20, use_hungarian=True, exact_hungarian=True,
            ).reshape(T, n_univ)

        def cond(st):
            i, U, lastU, lastU2, done = st
            return (i < cap) & (~done)

        def body(st):
            i, U, lastU, lastU2, _ = st
            U_new = power_step(U)
            done = (_fro(U_new - U) < 1e-3) | (_fro(U_new - lastU) == 0.0)
            return i + 1, U_new, U, lastU, done

        init = (jnp.int32(0), U, jnp.zeros_like(U), jnp.zeros_like(U),
                jnp.array(False))
        i, U, _, _, _ = jax.lax.while_loop(cond, body, init)
        return i, U

    return run(A, W, U, ms)


def real_problem(size=800):
    """Capture the REAL GA-GM inputs of the warmed bench model's TTA step
    at the reference configuration (the honest finale workload)."""
    import importlib.util

    import flax.serialization as fser

    from ttdg_mgm_tpu.models import MaskRCNN

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    model = MaskRCNN(num_classes=2, compute_dtype="bfloat16")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        jnp.asarray([[64.0, 64.0]]))["params"]
    cache = os.path.join(REPO, ".bench_cache")
    warm = sorted(f for f in os.listdir(cache) if f.startswith("warm_"))
    with open(os.path.join(cache, warm[-1]), "rb") as f:
        params = fser.from_bytes(params, f.read())
    params = jax.device_put(params)
    raw = bench.synth_batch(np, size, 4, seed=99, with_gt=False)

    def problem(m, im, sz):
        feats = m.extract_features(im)
        _, (pb, ps, pv) = m._proposals(feats, sz, train=False)
        boxes, scores, classes, valid = m._box_inference(feats, pb, pv, sz)
        nodes, labels, mask = m.graph_generator(
            m._feature_list(feats), jax.lax.stop_gradient(boxes), classes,
            valid)
        return m.multi_matching_unsup.build_problem(
            nodes.astype(jnp.float32), labels, mask,
            jax.lax.stop_gradient(m.U))

    A, Wds, ds_sym, pair_valid, U0, ms = jax.jit(
        lambda p, im, sz: model.apply({"params": p}, im, sz, method=problem)
    )(params, jnp.asarray(raw["image"]), jnp.asarray(raw["image_sizes"]))
    print(f"real problem: ms={np.asarray(ms).tolist()}")
    return (jnp.asarray(A), jnp.asarray(Wds), jnp.asarray(U0),
            jnp.asarray(ms), 32, jnp.asarray(ds_sym), jnp.asarray(pair_valid))


def tta_loss_from_U(U_b, ds_sym, pair_valid, G, M, n_univ):
    """The MGM3 permutation-consistency loss given a solved U (the exact
    formula of graph/mgm.py __call__)."""
    from ttdg_mgm_tpu.graph.losses import BCEFocalLoss

    Ug = U_b.reshape(G, M, n_univ)
    gt = jnp.einsum("imu,jnu->ijmn", Ug, Ug)
    gt = jnp.clip(gt, 0.0, 1.0)
    pair_sel = (
        jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    )
    focal = BCEFocalLoss()
    losses = jax.vmap(jax.vmap(lambda s, g, v: focal(s, g, v)))(
        ds_sym, gt, pair_valid)
    n_pairs = jnp.maximum(jnp.sum(pair_sel.astype(jnp.float32)), 1.0)
    return float(jnp.sum(jnp.where(pair_sel, losses, 0.0)) / n_pairs)


def main():
    print(f"backend: {jax.devices()[0].platform}, is_tpu={is_tpu_backend()}")
    ds_sym = pair_valid = None
    if len(sys.argv) > 1 and sys.argv[1] == "real":
        A, W, U0, ms, n_univ, ds_sym, pair_valid = real_problem()
    else:
        A, W, U0, ms, n_univ = make_problem()
    interp = not is_tpu_backend()

    t_fused_nohung = timeit(
        ga_gm_fused, A, W, U0, ms, n_univ, quad_weight=0.5, mgm_iter=200,
        sk_iter=20, interpret=interp, final_hungarian=False)
    print(f"fused kernel (annealed rounds, no finale): {t_fused_nohung:8.2f} ms")

    t_fused_hung = timeit(
        ga_gm_fused, A, W, U0, ms, n_univ, quad_weight=0.5, mgm_iter=200,
        sk_iter=20, interpret=interp, final_hungarian=True)
    print(f"fused kernel (+ mutual-argmax finale)    : {t_fused_hung:8.2f} ms")

    # the round-4 production default: the reference's 200-iteration terminal
    # Hungarian round with the EXACT in-kernel JV-LAP
    t_fused_lap = timeit(
        ga_gm_fused, A, W, U0, ms, n_univ, quad_weight=0.5, mgm_iter=200,
        sk_iter=20, interpret=interp, final_hungarian=False,
        exact_lap_finale=True, lap_iter_cap=200)
    print(f"fused kernel (+ in-kernel exact-LAP 200) : {t_fused_lap:8.2f} ms")

    G = int(ms.shape[0])
    M = A.shape[0] // G
    U_c = ga_gm_fused(A, W, U0, ms, n_univ, quad_weight=0.5, mgm_iter=200,
                      sk_iter=20, interpret=interp, final_hungarian=False)
    U_h = ga_gm_fused(A, W, U0, ms, n_univ, quad_weight=0.5, mgm_iter=200,
                      sk_iter=20, interpret=interp, final_hungarian=True)
    t_lap1 = timeit(hungarian_auto, U_c.reshape(G, M, n_univ), ms,
                    jnp.full_like(ms, n_univ))
    print(f"ONE batched exact JV-LAP ({G}x{M}x{n_univ})      : {t_lap1:8.2f} ms")

    t_finale = timeit(final_hungarian_round, A, W, U_c, ms, n_univ,
                      quad_weight=0.5, mgm_iter=200, sk_iter=20)
    print(f"exact-LAP finale round (r2 prod)         : {t_finale:8.2f} ms")

    iters, U_exact = finale_iters(A, W, U_c, ms, n_univ)
    print(f"finale convergence iterations            : {int(iters)}")

    for cap in (2, 8):
        t_polish = timeit(final_hungarian_round, A, W, U_h, ms, n_univ,
                          quad_weight=0.5, mgm_iter=cap, sk_iter=20)
        print(f"exact-LAP polish (cap {cap}) after kernel   : {t_polish:8.2f} ms")

    # discretization agreement: r2-prod exact finale vs kernel+polish
    U_pol = final_hungarian_round(A, W, U_h, ms, n_univ, quad_weight=0.5,
                                  mgm_iter=8, sk_iter=20)
    U_klap = ga_gm_fused(A, W, U0, ms, n_univ, quad_weight=0.5, mgm_iter=200,
                         sk_iter=20, interpret=interp, final_hungarian=False,
                         exact_lap_finale=True, lap_iter_cap=200)
    a_ex = np.asarray(U_exact).reshape(G, M, n_univ)
    a_po = np.asarray(U_pol).reshape(G, M, n_univ)
    a_kl = np.asarray(U_klap).reshape(G, M, n_univ)
    valid = np.arange(M)[None, :] < np.asarray(ms)[:, None]
    same = (a_ex.argmax(-1) == a_po.argmax(-1)) | ~valid
    same_kl = (a_ex.argmax(-1) == a_kl.argmax(-1)) | ~valid
    n_assigned_ex = int((a_ex.max(-1) > 0)[valid].sum())
    n_assigned_po = int((a_po.max(-1) > 0)[valid].sum())
    n_assigned_kl = int((a_kl.max(-1) > 0)[valid].sum())
    print(f"row-assignment agreement exact-vs-polish : "
          f"{int(same[valid].sum())}/{int(valid.sum())} rows "
          f"(assigned: exact {n_assigned_ex}, polish {n_assigned_po})")
    print(f"row-assignment agreement exact-vs-kernelLAP: "
          f"{int(same_kl[valid].sum())}/{int(valid.sum())} rows "
          f"(assigned: kernelLAP {n_assigned_kl})")

    if ds_sym is not None:
        for label, Ux in (("r2 exact-200 finale", U_exact),
                          ("kernel mutual-argmax only", U_h),
                          ("kernel + polish(8)", U_pol),
                          ("in-kernel exact-LAP 200 (r4)", U_klap)):
            lv = tta_loss_from_U(Ux, ds_sym, pair_valid, G, M, n_univ)
            print(f"TTA loss with {label:28s}: {lv:.6f}")


if __name__ == "__main__":
    main()
