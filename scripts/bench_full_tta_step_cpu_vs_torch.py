"""Same-host FULL-TTA-STEP benchmark: composed reference torch vs repo JAX.

VERDICT r3 ask #9: a grounded reference *full-step* throughput number. The
reference stack (detectron2 + CUDA) can't run here, but every piece of its
TTA step CAN be composed from parts that execute its exact semantics on this
host CPU:

* detector forward — ``tests/torch_twin.py`` (pure-torch d2-convention
  R50-FPN Mask R-CNN, whole-detector parity-tested against the JAX model);
* node sampling — the reference's own ``PrototypeComputation``
  (``adapteacher/modeling/GModule/build_graph.py``, imported directly);
* matching loss — the reference's own ``MGM3_unsup``
  (``adapteacher/modeling/GModule/multi_graph_matching.py:451-633``);
* one SGD step over all detector+matching params, exactly what the
  reference TTA loop pays per test batch (``trainer.py:469-482``).

Both sides run the SAME warmed weights (the bench cache, exported to d2
names via ``flax_to_d2_state_dict``) and the SAME 800px TEST.BATCH=4 batch,
single-threaded on the same host CPU.  The JAX side is the production
``make_tta_step``.  Gradients flow exactly as the reference's TTT branch:
through the sampled node features into FPN+backbone (boxes are geometry
only, ``rcnn.py:331-357``).

Prints one JSON line.  Run:  python scripts/bench_full_tta_step_cpu_vs_torch.py
[--size 800] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np  # noqa: E402
import torch  # noqa: E402

torch.set_num_threads(1)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import test_torch_parity as par  # noqa: E402  (installs the ref packages)
from torch_twin import TorchTwin  # noqa: E402

from bench import synth_batch  # noqa: E402
from ttdg_mgm_tpu.checkpoint.converter import flax_to_d2_state_dict  # noqa: E402


def load_warmed():
    """The bench's warmed flagship weights (matching path active)."""
    from bench import warm_params
    from ttdg_mgm_tpu.models import MaskRCNN

    model = MaskRCNN(num_classes=2, compute_dtype="bfloat16")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        jnp.asarray([[64.0, 64.0]]))["params"]
    params = warm_params(model, params, np, jnp, jax)
    return model, params


def torch_full_step(sd, images_np, *, lr=2.5e-3, reps=3):
    """The composed reference TTA step.  images_np: (B, H, W, 3) RGB 0-255."""
    from adapteacher.modeling.GModule.build_graph import PrototypeComputation
    import types

    twin = TorchTwin(sd, num_classes=2)
    for v in twin.sd.sd.values():
        v.requires_grad_(True)
    U = torch.from_numpy(np.asarray(sd["multi_matching_sup.U"])).clone()
    U.requires_grad_(True)

    mgm = par.ref_mgm.MGM3_unsup(num_cls=2, univ_size=32, dim=256)
    msd = {k[len("multi_matching_unsup."):]: torch.from_numpy(np.asarray(v))
           for k, v in sd.items() if k.startswith("multi_matching_unsup.")}
    missing, unexpected = mgm.load_state_dict(msd, strict=False)
    mgm.train()

    sampler = PrototypeComputation(num_cls=2, sample_dist=10)
    opt = torch.optim.SGD(
        list(twin.sd.sd.values()) + [U] + list(mgm.parameters()),
        lr=lr, momentum=0.9, weight_decay=1e-4)

    B, H, W, _ = images_np.shape
    timgs = torch.from_numpy(images_np).permute(0, 3, 1, 2).contiguous()

    class Pred:
        """Minimal Instances stand-in carrying pred_boxes/pred_classes."""

        def __init__(self, boxes, classes):
            self._fields = {}
            self.pred_boxes = types.SimpleNamespace(tensor=boxes)
            self.pred_classes = classes

        def __len__(self):
            return self.pred_classes.shape[0]

    stage = {}

    # The twin's NMS is an exact but interpreted (Python-loop) greedy scan;
    # the reference uses torchvision's C++ nms.  Time it separately so the
    # headline torch number can be reported both with and without the
    # interpretation overhead (torchvision is not installed here).
    import torch_twin as tw

    nms_time = [0.0]
    real_nms = tw.nms

    def timed_nms(*a, **k):
        t = time.perf_counter()
        out = real_nms(*a, **k)
        nms_time[0] += time.perf_counter() - t
        return out

    tw.nms = timed_nms

    def step(record=False):
        opt.zero_grad(set_to_none=True)
        t0 = time.perf_counter()
        # batched backbone+FPN, grads on (the reference runs its TTT branch
        # in train mode with autograd recording everything)
        _, fpn = twin.features(timgs)
        if record:
            stage["features_fwd"] = time.perf_counter() - t0
        t1 = time.perf_counter()
        targets = []
        for i in range(B):
            fpn_i = {k: v[i: i + 1] for k, v in fpn.items()}
            pboxes, _ = twin.proposals(fpn_i, (H, W))
            boxes, _, classes = twin.box_inference(fpn_i, pboxes, (H, W))
            targets.append(Pred(boxes, classes))
        if record:
            stage["detect_fwd"] = time.perf_counter() - t1
        t2 = time.perf_counter()
        feats = [fpn[f"p{l}"] for l in range(2, 7)]
        nodes, labels = sampler(feats, targets)
        # The reference solver CRASHES when a graph carries more nodes than
        # its 32-row universe (``multi_graph_matching.py:348`` feeds an
        # (m_i x univ) matrix to a Sinkhorn that requires nr <= nc; the repo's
        # padded-block MGM handles it).  The warmed detector samples ~57
        # nodes/image here, so the torch side gets an evenly-strided <=32
        # subsample — a strictly EASIER problem than the JAX side solves.
        capped = []
        for n, l in zip(nodes, labels):
            if n.shape[0] > 32:
                idx = torch.linspace(0, n.shape[0] - 1, 32).long()
                n, l = n[idx], l[idx]
            capped.append((n, l))
        nodes = [c[0] for c in capped]
        labels = [c[1] for c in capped]
        if record:
            stage["node_sampling"] = time.perf_counter() - t2
            stage["nodes"] = [int(n.shape[0]) for n in nodes]
        t3 = time.perf_counter()
        loss = mgm(list(nodes), list(labels), U)
        if record:
            stage["matching_fwd"] = time.perf_counter() - t3
        t4 = time.perf_counter()
        loss.backward()
        opt.step()
        if record:
            stage["backward_sgd"] = time.perf_counter() - t4
        return float(loss)

    loss = step(record=True)  # warm caches + stage breakdown
    dt = float("inf")
    for _ in range(reps):
        nms_time[0] = 0.0
        t0 = time.perf_counter()
        loss = step()
        rep = time.perf_counter() - t0
        if rep < dt:
            dt, stage["nms_py_loop"] = rep, nms_time[0]
    return dt, loss, stage


def jax_full_step(model, params, images_np, *, reps=3):
    from ttdg_mgm_tpu.engine.steps import TrainState, make_tta_step
    from ttdg_mgm_tpu.solver.build import build_optimizer

    tx = build_optimizer(params, lambda _: 0.0025)
    step = make_tta_step(model, tx)
    B, H, W, _ = images_np.shape
    batch = {"image": jnp.asarray(images_np),
             "image_sizes": jnp.full((B, 2), float(H), jnp.float32)}
    state = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    state, loss = step(state, dict(batch))  # compile
    float(loss)
    dt = float("inf")
    for i in range(reps):
        b = dict(batch)
        b["image"] = batch["image"] + i
        t0 = time.perf_counter()
        state, loss = step(state, b)
        lv = float(loss)
        dt = min(dt, time.perf_counter() - t0)
    return dt, lv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-jax", action="store_true",
                    help="only measure the torch composition")
    args = ap.parse_args()

    model, params = load_warmed()
    sd = flax_to_d2_state_dict(jax.device_get(params))
    raw = synth_batch(np, args.size, 4, seed=99, with_gt=False)

    t_torch, loss_t, stage = torch_full_step(sd, raw["image"], reps=args.reps)
    out = {
        "metric": "full_tta_step_ms_same_host_cpu",
        "config": f"{args.size}px, TEST.BATCH=4, warmed weights, 1 thread",
        "torch_reference_ms": round(t_torch * 1e3, 1),
        # conservative variant: interpreted-NMS time fully excluded, as if
        # torchvision's C++ nms were free
        "torch_reference_ms_nms_free": round(
            (t_torch - stage.get("nms_py_loop", 0.0)) * 1e3, 1),
        "torch_loss": round(loss_t, 6),
        "torch_stage_ms": {k: (round(v * 1e3, 1) if isinstance(v, float) else v)
                           for k, v in stage.items()},
    }
    if not args.skip_jax:
        t_jax, loss_j = jax_full_step(model, params, raw["image"],
                                      reps=args.reps)
        out["jax_repo_ms"] = round(t_jax * 1e3, 1)
        out["jax_loss"] = round(loss_j, 6)
        out["speedup_same_host"] = round(t_torch / t_jax, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
