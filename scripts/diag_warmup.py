"""Diagnose the bench's from-scratch warmup: which loss component diverges,
and which d2-native stability knob (CLIP_TYPE value/norm, LR) converges.

The reference never trains from scratch (always ImageNet R-50,
``train_net.py`` MODEL.WEIGHTS), so its BASE_LR 2.5e-3 has no published
from-scratch behavior; this script finds the recipe that keeps the bench's
synthetic-disc warmup BOTH finite and converging at the reference LR.

Run (TPU or CPU):  python scripts/diag_warmup.py --clip norm --lr 2.5e-3
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import WARM_SIZE, synth_batch  # noqa: E402
from ttdg_mgm_tpu.engine.steps import TrainState, make_source_step  # noqa: E402
from ttdg_mgm_tpu.models import MaskRCNN  # noqa: E402
from ttdg_mgm_tpu.solver.build import (build_optimizer,  # noqa: E402
                                       warmup_multistep_schedule)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clip", choices=["none", "value", "norm"], default="norm")
    ap.add_argument("--clip-value", type=float, default=1.0)
    ap.add_argument("--lr", type=float, default=2.5e-3)
    ap.add_argument("--iters", type=int, default=120)
    ap.add_argument("--warmup-iters", type=int, default=40)
    ap.add_argument("--size", type=int, default=WARM_SIZE)
    ap.add_argument("--every", type=int, default=10)
    args = ap.parse_args()

    model = MaskRCNN(num_classes=2, compute_dtype="bfloat16")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        jnp.asarray([[64.0, 64.0]]))["params"]
    clip = None
    if args.clip != "none":
        clip = {"ENABLED": True, "CLIP_TYPE": args.clip,
                "CLIP_VALUE": args.clip_value}
    tx = build_optimizer(
        params, warmup_multistep_schedule(args.lr, (100000,),
                                          warmup_iters=args.warmup_iters,
                                          warmup_factor=0.05),
        clip_gradients=clip)
    state = TrainState.create(params, tx)
    step = make_source_step(model, tx)
    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    for it in range(args.iters):
        batch = {k: jnp.asarray(v)
                 for k, v in synth_batch(np, args.size, 4, seed=it).items()}
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        if it % args.every == args.every - 1 or it == args.iters - 1:
            vals = {k: float(v) for k, v in metrics.items()}
            print(f"it {it + 1:4d} t={time.time() - t0:6.1f}s "
                  + " ".join(f"{k}={v:.4g}" for k, v in sorted(vals.items())),
                  flush=True)
            if not np.isfinite(vals.get("total_loss", float("nan"))):
                print("DIVERGED (non-finite)")
                return


if __name__ == "__main__":
    main()
