"""TTA capability demonstration: adaptation must IMPROVE target-domain Dice.

The paper's entire point (reference ``trainer.py:469-485`` ->
``rcnn.py:331-357``): one SGD step on the multi-graph-matching loss per test
batch adapts the backbone so segmentation on a SHIFTED target domain gets
better.  This script builds the synthetic domain-shift benchmark
(VERDICT r4 next-round #1):

1. source-train a small detector (+ universe U via ``U_sup``) on clean
   bright-disc images,
2. write a domain-shifted target test set to disk (blur + color shift +
   contrast change + background texture, polyp-like aspect ratios) and
   register it,
3. run the PRODUCTION ``trainer.test`` twice — ``ttt=False`` vs
   ``ttt=True`` — from the same source weights and report Dice/E/S.

Usage: python scripts/demo_tta_gain.py [--steps N] [--images N] [--seed K]
The in-suite version of this demonstration is
``tests/test_tta_improves_dice.py``; this script is the tunable prototype
that produced the recorded PARITY.md numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image, ImageFilter


def make_shifted_target(root, n_images: int, size: int = 64, seed: int = 17,
                        blur: float = 1.2, brightness: float = 0.75):
    """Domain-shifted disc images + COCO JSON: darker/greener discs,
    elliptical (polyp-like aspect), Gaussian blur, brightness drop, and a
    textured background."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        # textured background (coarse blotches instead of uniform dark)
        base = rng.randint(25, 70, (size // 8, size // 8, 3)).astype(np.uint8)
        arr = np.asarray(Image.fromarray(base).resize((size, size),
                                                      Image.BILINEAR))
        arr = arr.astype(np.float32)
        for k in range(2):
            r = rng.randint(size // 10, size // 5)
            ar = 1.0 + 0.6 * rng.rand()  # elliptical aspect up to 1.6
            rx, ry = int(r * ar), r
            cx = rng.randint(rx + 2, size - rx - 2)
            cy = rng.randint(ry + 2, size - ry - 2)
            yy, xx = np.mgrid[:size, :size]
            ell = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
            # shifted palette: source is [210-40k, 170, 150+30k]
            arr[ell] = [150 - 30 * k, 190, 120 + 40 * k]
            theta = np.linspace(0, 2 * np.pi, 25)[:-1]
            poly = np.stack([cx + rx * np.cos(theta),
                             cy + ry * np.sin(theta)], -1)
            poly[:, 0] = poly[:, 0].clip(0, size - 1)
            poly[:, 1] = poly[:, 1].clip(0, size - 1)
            annotations.append({
                "id": aid, "image_id": i, "category_id": 1 + k,
                "bbox": [float(cx - rx), float(cy - ry),
                         float(2 * rx), float(2 * ry)],
                "area": float(np.pi * rx * ry), "iscrowd": 0,
                "segmentation": [poly.reshape(-1).tolist()],
            })
            aid += 1
        # brightness drop + blur (acquisition shift)
        arr = np.clip(arr * brightness, 0, 255).astype(np.uint8)
        im = Image.fromarray(arr).filter(ImageFilter.GaussianBlur(blur))
        im.save(os.path.join(img_dir, f"t{i}.png"))
        images.append({"id": i, "file_name": f"t{i}.png",
                       "height": size, "width": size})
    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "disc"}, {"id": 2, "name": "cup"}]}
    jp = os.path.join(root, "target.json")
    with open(jp, "w") as f:
        json.dump(coco, f)
    return jp, img_dir


def source_train(model, params, *, steps: int, size: int, jnp, jax,
                 lr: float = 2.5e-3, log=print):
    """Short synthetic source training (bench.warm_params recipe: reference
    BASE_LR + d2 global-norm gradient clip)."""
    import bench
    from ttdg_mgm_tpu.engine.steps import TrainState, make_source_step
    from ttdg_mgm_tpu.solver.build import build_optimizer, warmup_multistep_schedule

    tx = build_optimizer(
        params, warmup_multistep_schedule(lr, (100000,), warmup_iters=40,
                                          warmup_factor=0.05),
        clip_gradients={"ENABLED": True, "CLIP_TYPE": "norm", "CLIP_VALUE": 1.0},
    )
    state = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    step = make_source_step(model, tx)
    rng = jax.random.PRNGKey(0)
    for it in range(steps):
        batch = {k: jnp.asarray(v) for k, v in
                 bench.synth_batch(np, size, 4, seed=it, mask_res=64).items()}
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        if it % 20 == 19 or it == steps - 1:
            lv = float(metrics["total_loss"])
            log(f"# source it={it + 1}/{steps} total={lv:.3f}")
            if not np.isfinite(lv):
                raise RuntimeError(f"source training diverged at {it}")
    return jax.device_get(state.params)


def run_demo(*, steps: int, n_images: int, size: int, tta_lr: float,
             dice_threshold: float, seed: int, tta_passes: int = 1,
             root: str | None = None, cache: str | None = None,
             blur: float = 1.2, brightness: float = 0.75,
             diag: bool = False):
    import jax
    import jax.numpy as jnp

    from ttdg_mgm_tpu.data.catalog import DatasetCatalog
    from ttdg_mgm_tpu.data.coco import register_coco_instances
    from ttdg_mgm_tpu.engine.trainer import BaselineTrainer
    from ttdg_mgm_tpu.models import MaskRCNN
    from ttdg_mgm_tpu.solver.build import build_optimizer

    model = MaskRCNN(
        num_classes=2, univ_size=8, node_cap_per_level=4,
        pre_nms_topk_train=64, pre_nms_topk_test=64, post_nms_topk=32,
        detections_per_image=8, batch_size_per_image=32, mask_fg_cap=8,
        resnet_depth=14, gagm_iters=20, hippi_iters=10,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        jnp.asarray([[64.0, 64.0]]))["params"]

    if cache:
        cache = f"{cache}.s{steps}x{size}"
    if cache and os.path.exists(cache):
        import flax.serialization as fser

        with open(cache, "rb") as f:
            params = fser.from_bytes(params, f.read())
        print(f"# loaded source weights from {cache}")
    else:
        params = source_train(model, params, steps=steps, size=size,
                              jnp=jnp, jax=jax)
        if cache:
            import flax.serialization as fser

            with open(cache, "wb") as f:
                f.write(fser.to_bytes(params))

    root = root or tempfile.mkdtemp(prefix="tta_demo_")
    jp, img_dir = make_shifted_target(root, n_images, size=size, seed=seed,
                                      blur=blur, brightness=brightness)
    name = "_tta_demo_target"
    DatasetCatalog.remove(name)
    register_coco_instances(name, jp, img_dir)

    if diag:
        # detection-score diagnostics on source-style vs shifted images
        import bench

        src = bench.synth_batch(np, size, 4, seed=999, with_gt=False)
        det = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                          jnp.asarray(src["image"]),
                          jnp.asarray(src["image_sizes"]),
                          method=model.forward_inference)
        s = np.asarray(det["scores"])[np.asarray(det["valid"])]
        print(f"# source-style scores: n={s.size} max={s.max() if s.size else 0:.3f} "
              f"mean={(s.mean() if s.size else 0):.3f}")
        from ttdg_mgm_tpu.data.loader import load_image
        recs = DatasetCatalog.get(name)[:4]
        timgs = np.stack([load_image(r["file_name"]) for r in recs]).astype(np.float32)
        det = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                          jnp.asarray(timgs),
                          jnp.full((len(recs), 2), float(size), jnp.float32),
                          method=model.forward_inference)
        s = np.asarray(det["scores"])[np.asarray(det["valid"])]
        print(f"# shifted-target scores: n={s.size} max={s.max() if s.size else 0:.3f} "
              f"mean={(s.mean() if s.size else 0):.3f}")

    def fresh_trainer():
        tx = build_optimizer(params, lambda _: tta_lr)
        return BaselineTrainer(
            model, tx, jax.tree.map(jnp.asarray, params),
            canvas=size, min_size=size, max_size=size, test_canvas=size,
        )

    res_off = fresh_trainer().test([name], ttt=False,
                                   dice_threshold=dice_threshold)
    tr = fresh_trainer()
    # tta_passes > 1 repeats the TTA loop (each pass = one SGD step per
    # test batch, the reference budget) before the final eval
    for _ in range(tta_passes - 1):
        tr.test([name], ttt=True, tta_batch=4, min_batch_num=10**6,
                dice_threshold=dice_threshold)
    res_on = tr.test([name], ttt=True, tta_batch=4,
                     dice_threshold=dice_threshold)
    d_off = res_off[name]["Dice Coefficient"]
    d_on = res_on[name]["Dice Coefficient"]
    print(json.dumps({
        "dice_no_ttt": d_off, "dice_ttt": d_on, "gain": d_on - d_off,
        "e_no_ttt": res_off[name].get("Enhanced Alignment Metric"),
        "e_ttt": res_on[name].get("Enhanced Alignment Metric"),
        "s_no_ttt": res_off[name].get("Structural Similarity Metric"),
        "s_ttt": res_on[name].get("Structural Similarity Metric"),
        "last_tta_loss": tr.last_tta_loss,
        "config": {"steps": steps, "n_images": n_images, "size": size,
                   "tta_lr": tta_lr, "passes": tta_passes, "seed": seed},
    }))
    return d_off, d_on


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--images", type=int, default=32)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--tta-lr", type=float, default=2.5e-3)
    ap.add_argument("--dice-threshold", type=float, default=0.3)
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--passes", type=int, default=1)
    ap.add_argument("--blur", type=float, default=1.2)
    ap.add_argument("--brightness", type=float, default=0.75)
    ap.add_argument("--diag", action="store_true")
    ap.add_argument("--cache", default="/tmp/tta_demo_source.msgpack")
    args = ap.parse_args()
    run_demo(steps=args.steps, n_images=args.images, size=args.size,
             tta_lr=args.tta_lr, dice_threshold=args.dice_threshold,
             seed=args.seed, tta_passes=args.passes, cache=args.cache,
             blur=args.blur, brightness=args.brightness, diag=args.diag)
