"""Same-host, same-inputs matching-core benchmark: reference torch vs repo JAX.

The reference publishes no throughput numbers and no A100 is reachable
(BASELINE.md), so the one like-for-like comparison this machine can make is
the TTA matching core — the reference's ``MGM3_unsup`` forward+backward
(``/root/reference/adapteacher/modeling/GModule/multi_graph_matching.py:451-633``,
pure torch + pygmtools Sinkhorn) against the repo's ``MGM3Unsup`` — on the
SAME host CPU, IDENTICAL weights and node sets, at the production TTA shape
(4 graphs x 24 nodes x 256 dims, universe 32 — the TTA regime of a few
dozen nodes per image, bounded above by ``univ_size``).

Both sides time a full loss + gradient (w.r.t. nodes and matching weights),
which is what one TTA step pays.  min-of-reps; single thread each.

Prints one JSON line and exits.  Run:  python scripts/bench_matching_cpu_vs_torch.py
"""

from __future__ import annotations

import json
import os
import sys
import time

# force-override: the shell pins JAX_PLATFORMS=axon (real TPU tunnel) and a
# site hook re-pins jax_platforms at interpreter start; this comparison is
# same-host CPU by definition
os.environ["JAX_PLATFORMS"] = "cpu"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np  # noqa: E402
import torch  # noqa: E402

torch.set_num_threads(1)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# reuse the parity harness's reference-import machinery and weight copiers
import test_torch_parity as par  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from ttdg_mgm_tpu.graph.mgm import MGM3Unsup  # noqa: E402

# M <= UNIV: each graph's nodes embed as a partial permutation of the
# 32-row universe (40-node graphs crash the reference solver's block add)
G, M, UNIV, DIM, NCLS = 4, 24, 32, 256, 2
REPS = 8


def build_problem(seed: int = 0):
    rng = np.random.default_rng(seed)
    ms = [M] * G
    # planted near-one-hot seeding (same construction as the parity test's
    # fused-kernel case) so the solver orbit is the realistic "warm detector"
    # regime rather than pure-noise
    U_np = rng.standard_normal((UNIV, DIM)).astype(np.float32)
    perms = [rng.permutation(UNIV)[:m] for m in ms]
    nodes_t = [
        torch.tensor(U_np[p] * 3.0
                     + 0.05 * rng.standard_normal((len(p), DIM)).astype(np.float32))
        for p in perms
    ]
    labels_t = [torch.tensor(rng.integers(1, NCLS + 1, size=m)) for m in ms]
    return nodes_t, labels_t, torch.tensor(U_np), ms


def bench_torch(ref, nodes_t, labels_t, U):
    def run():
        nodes = [n.clone().requires_grad_(True) for n in nodes_t]
        loss = ref(nodes, labels_t, U)
        loss.backward()
        return float(loss)

    run()  # warmup
    dt = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        loss = run()
        dt = min(dt, time.perf_counter() - t0)
    return dt, loss


def bench_jax(model, params, nodes_j, labels_j, mask, U_j):
    def loss_fn(params, nodes):
        return model.apply({"params": params}, nodes, labels_j, mask, U_j)

    vg = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
    (loss, grads) = vg(params, nodes_j)
    jax.block_until_ready(grads)  # compile + warmup
    dt = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        loss, grads = vg(params, nodes_j + 0.0)
        jax.block_until_ready(grads)
        dt = min(dt, time.perf_counter() - t0)
    return dt, float(loss)


def main():
    torch.manual_seed(0)
    nodes_t, labels_t, U, ms = build_problem()
    ref = par.ref_mgm.MGM3_unsup(num_cls=NCLS, univ_size=UNIV, dim=DIM).eval()
    t_torch, loss_t = bench_torch(ref, nodes_t, labels_t, U)

    nodes_j, mask = par.pad_nodes(nodes_t, M)
    labels_j = jnp.asarray(np.stack([np.asarray(l) for l in labels_t]).astype(np.int32))
    model = MGM3Unsup(num_classes=NCLS, univ_size=UNIV, dim=DIM,
                      use_fused_gagm=False)
    params = {
        "intra_domain_graph": par.mha_params(ref.intra_domain_graph),
        "node_affinity": par.affinity_params(ref.node_affinity),
    }
    t_jax, loss_j = bench_jax(model, params, nodes_j, labels_j, mask, par.t2j(U))

    print(json.dumps({
        "metric": "mgm3_tta_loss_plus_grad_ms_same_host_cpu",
        "shape": f"{G}x{M}x{DIM}, univ {UNIV}",
        "torch_reference_ms": round(t_torch * 1e3, 2),
        "jax_repo_ms": round(t_jax * 1e3, 2),
        "speedup": round(t_torch / t_jax, 2),
        "loss_torch": round(loss_t, 6),
        "loss_jax": round(loss_j, 6),
        "threads": 1,
    }))


if __name__ == "__main__":
    main()
