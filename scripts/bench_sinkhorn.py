"""Sinkhorn kernel benchmark — ms/iter, tracked per BASELINE.md.

Measures the fused log-domain Sinkhorn at the flagship matching shapes
(all-pairs blocks of a 4-graph TTA batch: 12 pairs x 100x100 with dummy-row
masking, reference tau=0.05, 20 iters) plus a large square case, on the
current default device.  Prints one JSON line per case.

Run: python scripts/bench_sinkhorn.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def bench(shape, tau, iters, n_rep=30):
    from ttdg_mgm_tpu.ops.sinkhorn import sinkhorn

    key = jax.random.PRNGKey(0)
    s = jax.random.uniform(key, shape, jnp.float32)
    nrows = jnp.full(shape[:1], shape[1], jnp.int32)
    ncols = jnp.full(shape[:1], shape[2], jnp.int32)

    import numpy as np

    def sync(o):
        # device->host scalar copy: true sync that raises on worker abort
        # (jax.block_until_ready can return silently after an abort here)
        return np.asarray(jnp.ravel(o)[0])

    fn = jax.jit(lambda x: sinkhorn(x, nrows, ncols, tau=tau, max_iter=iters))
    sync(fn(s))
    best = float("inf")
    for _ in range(4):  # best-of-reps: the tunnel TPU is shared
        t0 = time.perf_counter()
        for _ in range(n_rep):
            out = fn(s)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / n_rep * 1e3)
    return best, best / iters


def main():
    dev = jax.devices()[0].platform
    for name, shape, tau, iters in [
        ("tta_allpairs_12x100x100", (12, 100, 100), 0.05, 20),
        ("large_64x512x512", (64, 512, 512), 0.05, 20),
    ]:
        total_ms, per_iter = bench(shape, tau, iters)
        print(json.dumps({
            "metric": f"sinkhorn_ms_per_iter[{name}]",
            "value": round(per_iter, 4),
            "unit": "ms/iter",
            "total_ms": round(total_ms, 3),
            "device": dev,
        }))


if __name__ == "__main__":
    main()
