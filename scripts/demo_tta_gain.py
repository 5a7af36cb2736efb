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
                        blur: float = 1.2, brightness: float = 0.75,
                        palette: str = "shifted", subdir: str = "images",
                        json_name: str = "target.json"):
    """Domain-shifted disc images + COCO JSON: darker/greener discs,
    elliptical (polyp-like aspect), Gaussian blur, brightness drop, and a
    textured background.  ``palette="source"`` + ``blur=0`` +
    ``brightness=1`` reproduces the CLEAN source distribution
    (``bench.synth_batch`` colors, circular discs, flat background)."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, subdir)
    os.makedirs(img_dir, exist_ok=True)
    source = palette == "source"
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        if source:
            arr = rng.randint(20, 45, (size, size, 3)).astype(np.float32)
        else:
            # textured background (coarse blotches instead of uniform dark)
            base = rng.randint(25, 70, (size // 8, size // 8, 3)).astype(np.uint8)
            arr = np.asarray(Image.fromarray(base).resize(
                (size, size), Image.BILINEAR)).astype(np.float32)
        for k in range(2):
            r = rng.randint(size // 10, size // 5)
            ar = 1.0 if source else 1.0 + 0.6 * rng.rand()  # ellipse <= 1.6
            rx, ry = int(r * ar), r
            cx = rng.randint(rx + 2, size - rx - 2)
            cy = rng.randint(ry + 2, size - ry - 2)
            yy, xx = np.mgrid[:size, :size]
            ell = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
            # shifted palette: source is [210-40k, 170, 150+30k]
            arr[ell] = ([210 - 40 * k, 170, 150 + 30 * k] if source
                        else [150 - 30 * k, 190, 120 + 40 * k])
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
    jp = os.path.join(root, json_name)
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


def calibrate_and_learn_universe(model, params, source_name, *, size: int,
                                 u_steps: int = 40, u_lr: float = 0.01,
                                 log=print):
    """Probe-calibrated source detector + SGD-learned universe.

    The VERDICT r4 ask allows 'the composed-A/B machinery already
    calibrates/trains tiny models': the detector heads are set by the
    deterministic linear-probe calibration (tests/test_composed_dice.py) on
    the clean source set — confident detections in seconds — and the
    universe learning (the part TTA consumes: U + the U_sup attention/
    edge-weight params) is trained by real SGD on the supervised matching
    loss (reference ``rcnn.py:262-266``) with every other parameter frozen
    so the calibrated heads stay calibrated."""
    import jax
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_composed_dice import calibrate_probe_detector

    from ttdg_mgm_tpu.data.catalog import DatasetCatalog
    from ttdg_mgm_tpu.data.loader import build_train_loader

    records = DatasetCatalog.get(source_name)
    params = calibrate_probe_detector(model, params, records)
    params = jax.tree.map(jnp.asarray, params)

    # ---- universe learning: SGD on loss_matching, U-subtree only ----
    def label_tree(tree, path=()):
        if isinstance(tree, dict):
            return {k: label_tree(v, path + (k,)) for k, v in tree.items()}
        train = path[:1] == ("U",) or path[:1] == ("multi_matching_sup",)
        return "train" if train else "freeze"

    tx = optax.multi_transform(
        {"train": optax.sgd(u_lr, momentum=0.9), "freeze": optax.set_to_zero()},
        label_tree(params),
    )
    opt_state = tx.init(params)

    def u_loss(p, img, sz, gb, gc, gv):
        def inner(m, x, s):
            feats = m.extract_features(x)
            nodes, labels, mask = m.graph_generator(
                m._feature_list(feats), gb, gc.astype(jnp.int32), gv)
            return m.multi_matching_sup(
                nodes.astype(jnp.float32), labels, mask, m.U)

        return model.apply({"params": p}, img, sz, method=inner)

    @jax.jit
    def u_step(p, o, img, sz, gb, gc, gv):
        loss, g = jax.value_and_grad(u_loss)(p, img, sz, gb, gc, gv)
        upd, o = tx.update(g, o, p)
        return optax.apply_updates(p, upd), o, loss

    loader = build_train_loader([source_name], batch_size=4, canvas=size,
                                min_size=size, max_size=size, gt_cap=4,
                                mask_res=64, seed=0, flip_prob=0.0)
    for it in range(u_steps):
        b = next(loader)
        params, opt_state, lu = u_step(
            params, opt_state, jnp.asarray(b["image"]),
            jnp.asarray(b["image_sizes"]), jnp.asarray(b["gt_boxes"]),
            jnp.asarray(b["gt_classes"]), jnp.asarray(b["gt_valid"]))
        if it % 10 == 9 or it == u_steps - 1:
            log(f"# U-learning it={it + 1}/{u_steps} loss_matching={float(lu):.4f}")
    return jax.device_get(params)


def run_demo(*, steps: int, n_images: int, size: int, tta_lr: float,
             dice_threshold: float, seed: int, tta_passes: int = 1,
             root: str | None = None, cache: str | None = None,
             blur: float = 1.2, brightness: float = 0.75,
             diag: bool = False, mode: str = "sgd",
             save_weights: str | None = None, full_width: bool = False):
    import jax
    import jax.numpy as jnp

    from ttdg_mgm_tpu.data.catalog import DatasetCatalog
    from ttdg_mgm_tpu.data.coco import register_coco_instances
    from ttdg_mgm_tpu.engine.trainer import BaselineTrainer
    from ttdg_mgm_tpu.models import MaskRCNN
    from ttdg_mgm_tpu.solver.build import build_optimizer

    # the shared demo model (tests/demo_config.py — single source of truth
    # with tests/test_tta_improves_dice.py).  Key choices, each diagnosed in
    # round 5: anchors scaled to the synthetic disc sizes (the d2 default
    # 32..512 leaves sub-64px objects only low-quality-matched -> weak RPN);
    # proposal budgets a real fraction of the flagship's (with ~32 post-NMS
    # survivors the box head's fg diet is the appended GT alone and it
    # learns a degenerate boundary rejecting every imperfect proposal).
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from demo_config import DEMO

    kwargs = dict(DEMO["model_kwargs"])
    if full_width:
        # the PARITY.md headline configuration: flagship widths (trunk 256,
        # FPN 256, box-fc 1024) on the shallow resnet-14 stage layout —
        # measured Dice 38.47 -> 39.76 (+1.29) at --steps 400 --blur 1.0
        # --brightness 0.8
        kwargs.update(resnet_width=256, fpn_channels=256, box_fc_dim=1024,
                      mask_conv_dim=256)
    model = MaskRCNN(**kwargs)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        jnp.asarray([[64.0, 64.0]]))["params"]

    root = root or tempfile.mkdtemp(prefix="tta_demo_")
    if mode == "probe":
        # calibrated-probe source detector + SGD-learned universe (see
        # calibrate_and_learn_universe) — deterministic and CPU-fast; the
        # in-suite test (tests/test_tta_improves_dice.py) runs this mode
        sjp, simg = make_shifted_target(
            root, max(n_images // 2, 8), size=size, seed=5, blur=0.0,
            brightness=1.0, palette="source", subdir="src_images",
            json_name="source.json")
        sname = "_tta_demo_source"
        DatasetCatalog.remove(sname)
        register_coco_instances(sname, sjp, simg)
        params = calibrate_and_learn_universe(
            model, params, sname, size=size, u_steps=steps)
    elif cache and os.path.exists(f"{cache}.s{steps}x{size}"):
        import flax.serialization as fser

        cache = f"{cache}.s{steps}x{size}"
        with open(cache, "rb") as f:
            params = fser.from_bytes(params, f.read())
        print(f"# loaded source weights from {cache}")
    else:
        params = source_train(model, params, steps=steps, size=size,
                              jnp=jnp, jax=jax)
        if cache:
            import flax.serialization as fser

            cache = f"{cache}.s{steps}x{size}"
            with open(cache, "wb") as f:
                f.write(fser.to_bytes(params))
    if save_weights:
        from demo_config import save_fixture_weights

        save_fixture_weights(jax.device_get(params), save_weights)
        print(f"# fixture weights saved to {save_weights}")
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
        "config": {"mode": mode, "steps": steps, "n_images": n_images,
                   "size": size, "tta_lr": tta_lr, "passes": tta_passes,
                   "seed": seed, "blur": blur, "brightness": brightness},
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
    ap.add_argument("--mode", choices=("sgd", "probe"), default="sgd",
                    help="sgd: full from-scratch source training; probe: "
                         "calibrated linear-probe detector + SGD-learned "
                         "universe (steps = U-learning steps)")
    ap.add_argument("--cache", default="/tmp/tta_demo_source.msgpack")
    ap.add_argument("--save-weights", default=None,
                    help="write fp16 fixture weights (the in-suite test's "
                         "golden source model) after training")
    ap.add_argument("--full-width", action="store_true",
                    help="flagship widths (the PARITY.md headline config)")
    args = ap.parse_args()
    run_demo(steps=args.steps, n_images=args.images, size=args.size,
             tta_lr=args.tta_lr, dice_threshold=args.dice_threshold,
             seed=args.seed, tta_passes=args.passes, cache=args.cache,
             blur=args.blur, brightness=args.brightness, diag=args.diag,
             mode=args.mode, save_weights=args.save_weights,
             full_width=args.full_width)
