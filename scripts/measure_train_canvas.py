"""Measure TPU.TRAIN_CANVAS: square-fit vs reference-faithful "auto" buckets.

VERDICT r4 next-round #6: decide the train-canvas default WITH A NUMBER.
Trains two tiny models on the same synthetic non-square source data —

  square: the legacy static square canvas (downscale-to-fit, one compile),
  auto:   reference ``dataset_mapper.py:31-35`` geometry
          (ResizeShortestEdge, no fit, per-batch rectangular buckets),

then evaluates BOTH on a held-out non-square test split through the
production eval path (same "auto" eval geometry for both) and reports
Dice, per-step time, and compile counts.

Usage: python scripts/measure_train_canvas.py [--steps N] [--size N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def make_nonsquare_dataset(root, n_images: int, *, base: int, seed: int,
                           name: str):
    """Disc images with mixed polyp-like aspect ratios (4:3 / 3:4 / 16:9)."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, f"{name}_images")
    os.makedirs(img_dir, exist_ok=True)
    aspects = [(1.0, 1.333), (1.333, 1.0), (1.0, 1.7), (1.2, 1.0)]
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        ah, aw = aspects[i % len(aspects)]
        H, W = int(base * ah), int(base * aw)
        arr = rng.randint(20, 45, (H, W, 3)).astype(np.uint8)
        for k in range(2):
            r = rng.randint(min(H, W) // 8, min(H, W) // 5)
            cy = rng.randint(r + 2, H - r - 2)
            cx = rng.randint(r + 2, W - r - 2)
            yy, xx = np.mgrid[:H, :W]
            disc = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            arr[disc] = [210 - 40 * k, 170, 150 + 30 * k]
            theta = np.linspace(0, 2 * np.pi, 25)[:-1]
            poly = np.stack([cx + r * np.cos(theta), cy + r * np.sin(theta)], -1)
            poly[:, 0] = poly[:, 0].clip(0, W - 1)
            poly[:, 1] = poly[:, 1].clip(0, H - 1)
            annotations.append({
                "id": aid, "image_id": i, "category_id": 1 + k,
                "bbox": [float(cx - r), float(cy - r), float(2 * r), float(2 * r)],
                "area": float(np.pi * r * r), "iscrowd": 0,
                "segmentation": [poly.reshape(-1).tolist()],
            })
            aid += 1
        Image.fromarray(arr).save(os.path.join(img_dir, f"i{i}.png"))
        images.append({"id": i, "file_name": f"i{i}.png",
                       "height": H, "width": W})
    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "disc"}, {"id": 2, "name": "cup"}]}
    jp = os.path.join(root, f"{name}.json")
    with open(jp, "w") as f:
        json.dump(coco, f)
    from ttdg_mgm_tpu.data.catalog import DatasetCatalog
    from ttdg_mgm_tpu.data.coco import register_coco_instances

    DatasetCatalog.remove(name)
    register_coco_instances(name, jp, img_dir)
    return name


def train_one(canvas, *, steps, size, train_name, test_name, seed=0):
    import jax
    import jax.numpy as jnp

    from ttdg_mgm_tpu.engine.trainer import BaselineTrainer
    from ttdg_mgm_tpu.models import MaskRCNN
    from ttdg_mgm_tpu.solver.build import build_optimizer, warmup_multistep_schedule

    model = MaskRCNN(
        num_classes=2, univ_size=8, node_cap_per_level=4,
        pre_nms_topk_train=64, pre_nms_topk_test=64, post_nms_topk=32,
        detections_per_image=8, batch_size_per_image=32, mask_fg_cap=8,
        resnet_depth=14, gagm_iters=20, hippi_iters=10,
    )
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)),
                        jnp.asarray([[64.0, 64.0]]))["params"]
    tx = build_optimizer(
        params, warmup_multistep_schedule(2.5e-3, (100000,), warmup_iters=40,
                                          warmup_factor=0.05),
        clip_gradients={"ENABLED": True, "CLIP_TYPE": "norm", "CLIP_VALUE": 1.0},
    )
    trainer = BaselineTrainer(model, tx, params, canvas=canvas, min_size=size,
                              max_size=int(size * 1.67), gt_cap=4, mask_res=64,
                              test_canvas="auto")

    from ttdg_mgm_tpu.data.loader import build_train_loader

    loader = build_train_loader(
        [train_name], batch_size=4, canvas=canvas, min_size=size,
        max_size=int(size * 1.67), gt_cap=4, mask_res=64, seed=seed,
    )
    shapes_seen = set()
    times = []
    t_total0 = time.perf_counter()
    rng = jax.random.PRNGKey(seed)
    state = trainer.state
    import jax as _jax

    for it in range(steps):
        batch = next(loader)
        shapes_seen.add(batch["image"].shape[1:3])
        dev = {k: jnp.asarray(v) for k, v in batch.items()}
        rng, sub = jax.random.split(rng)
        t0 = time.perf_counter()
        state, metrics = trainer._source_step(state, dev, sub)
        _jax.block_until_ready(metrics["total_loss"])
        times.append(time.perf_counter() - t0)
        if it % 20 == 19:
            lv = float(metrics["total_loss"])
            print(f"# [{canvas}] it={it + 1}/{steps} total={lv:.3f}",
                  file=sys.stderr, flush=True)
            if not np.isfinite(lv):
                raise RuntimeError("diverged")
    trainer.state = state
    t_total = time.perf_counter() - t_total0

    from ttdg_mgm_tpu.engine.trainer import evaluate_dataset

    res = evaluate_dataset(model, state.params, test_name, canvas="auto",
                           min_size=size, max_size=int(size * 1.67),
                           batch_size=2, dice_threshold=0.3)
    # steady-state step time = median of the last half (excludes compiles)
    tail = sorted(times[len(times) // 2:])
    return {
        "canvas": str(canvas),
        "dice": res.get("Dice Coefficient"),
        "e": res.get("Enhanced Alignment Metric"),
        "s": res.get("Structural Similarity Metric"),
        "step_ms_median": round(1000 * tail[len(tail) // 2], 1),
        "distinct_canvas_shapes": len(shapes_seen),
        "total_wall_s": round(t_total, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--images", type=int, default=24)
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="canvas_ab_")
    train = make_nonsquare_dataset(root, args.images, base=args.size, seed=3,
                                   name="_canvas_ab_train")
    test = make_nonsquare_dataset(root, 12, base=args.size, seed=91,
                                  name="_canvas_ab_test")

    d = ((args.size + 31) // 32) * 32
    out = {}
    for canvas in (d, "auto"):
        out[str(canvas)] = train_one(canvas, steps=args.steps, size=args.size,
                                     train_name=train, test_name=test)
        print(json.dumps(out[str(canvas)]), flush=True)
    print(json.dumps({"square": out[str(d)], "auto": out["auto"]}))


if __name__ == "__main__":
    main()
