"""Trainers: supervised source training and the eval-only TTA loop.

Capability of reference ``BaselineTrainer``
(``adapteacher/engine/trainer.py:197-542``):

* ``train``: supervised loop (det + universe-matching losses, one SGD step
  per batch) with periodic checkpointing/eval hooks,
* ``test``: THE flagship path (SURVEY.md section 3.1) — per test dataset, a
  TTA loop (one SGD step on the MGM loss per batch of ``TEST.BATCH``, capped
  by ``TEST.MIN_BATCH_NUM``) followed by Dice/E/S evaluation, with per-family
  aggregation (``trainer.py:509-527``: datasets grouped by name prefix).
  Adaptation state persists across datasets within one run, exactly like the
  reference's in-place model mutation; ``reset_between_datasets`` opts out.

The per-batch device work is one donated-buffer jitted step (engine.steps);
this class is the host-side orchestration only.
"""

from __future__ import annotations

import logging
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from ttdg_mgm_tpu.data.catalog import DatasetCatalog
from ttdg_mgm_tpu.data.loader import build_test_loader, build_train_loader
from ttdg_mgm_tpu.engine.steps import TrainState, make_source_step, make_tta_step
from ttdg_mgm_tpu.utils.native import paste_masks_native
from ttdg_mgm_tpu.utils.rle import segmentation_to_mask

logger = logging.getLogger("ttdg_mgm_tpu")


def postprocess_detections(det: dict, meta: dict, b: int, *, mask_threshold=0.5,
                           score_floor: float = 0.0):
    """Rescale detections of image ``b`` to original size + paste masks
    (host-side; d2 ``detector_postprocess`` equivalent)."""
    sy, sx = meta["scale"]
    valid = np.asarray(det["valid"][b])
    boxes = np.asarray(det["boxes"][b])[valid]
    scores = np.asarray(det["scores"][b])[valid]
    classes = np.asarray(det["classes"][b])[valid]
    probs = np.asarray(det["mask_probs"][b])[valid]
    keep = scores >= score_floor
    boxes, scores, classes, probs = boxes[keep], scores[keep], classes[keep], probs[keep]
    oh, ow = meta["orig_height"], meta["orig_width"]
    boxes = boxes / np.array([sx, sy, sx, sy], np.float32)
    boxes[:, 0::2] = boxes[:, 0::2].clip(0, ow)
    boxes[:, 1::2] = boxes[:, 1::2].clip(0, oh)
    masks = paste_masks_native(probs, boxes, oh, ow, threshold=mask_threshold)
    return {"boxes": boxes, "scores": scores, "classes": classes, "masks": masks}


def evaluate_dataset(model, params, dataset_name: str, *,
                     canvas: int | str = "auto",
                     min_size: int = 800, max_size: int = 1333,
                     batch_size: int = 1, dice_threshold: float = 0.9,
                     log_every: int = 50, draw_dir: str | None = None,
                     evaluator_type: str | None = None) -> dict:
    """Inference + evaluation over one dataset (reference
    ``inference_on_dataset``, ``trainer.py:1230-1360``, incl. the s/iter
    breakdown log format parsed by grep).

    The evaluator dispatches on the dataset's registered ``evaluator_type``
    (reference ``build_evaluator``, ``trainer.py:316-328``): Dice/E/S for
    the medical TTA splits (the default when unset — the flagship path,
    ``trainer.py:484-485``), COCO AP for coco-type (incl. ``iscrowd``
    IGNORE semantics), VOC mAP for pascal-type.  ``evaluator_type``
    overrides the metadata.  Results come back as ONE flat scalar dict
    (``bbox_AP`` style for AP evaluators).

    ``draw_dir``: when set (the reference's ``TEST.DRAW``), box overlays are
    written under ``<draw_dir>/visual`` and mask overlays under
    ``<draw_dir>/masks`` (reference ``trainer.py:1288-1308,1376-1406``)."""
    from ttdg_mgm_tpu.evaluation.build import build_evaluator, flatten_results

    loader = build_test_loader(dataset_name, batch_size=batch_size,
                               canvas=canvas, min_size=min_size, max_size=max_size)
    evaluator, etype = build_evaluator(
        dataset_name, dice_threshold=dice_threshold,
        evaluator_type=evaluator_type,
        mask_on=getattr(model, "mask_on", True),
    )
    # Parse the dataset ONCE and index records by image_id — the catalog
    # loader re-reads the COCO JSON on every .get(), which made the old
    # per-image lookup O(N^2) in host work.
    records_by_id = {r["image_id"]: r for r in DatasetCatalog.get(dataset_name)}

    @jax.jit
    def infer(p, image, sizes):
        return model.apply({"params": p}, image, sizes,
                           method=model.forward_inference)

    # multi-process: params are global arrays, so inputs must be too
    # (identical on all processes -> replication is safe)
    from ttdg_mgm_tpu.parallel.mesh import global_like

    n_img = 0
    t_data = t_compute = t_eval = 0.0
    t0 = time.perf_counter()
    for batch, metas in loader:
        t_data += time.perf_counter() - t0
        t1 = time.perf_counter()
        dev = global_like(params, (batch["image"], batch["image_sizes"]))
        det = infer(params, *dev)
        det = jax.tree.map(np.asarray, det)
        t_compute += time.perf_counter() - t1
        t2 = time.perf_counter()
        for b, meta in enumerate(metas[: metas[0]["n_real"]]):
            out = postprocess_detections(det, meta, b)
            record = records_by_id[meta["image_id"]]
            if draw_dir is not None:
                from ttdg_mgm_tpu.data.loader import load_image
                from ttdg_mgm_tpu.utils.visualize import dump_visualization

                dump_visualization(draw_dir, meta["image_id"],
                                   load_image(record["file_name"]), out)
            anns = record["annotations"]
            gt_classes = [a["category_id"] for a in anns]
            if etype == "dice":
                gt_masks = [
                    segmentation_to_mask(a["segmentation"], record["height"],
                                         record["width"])
                    for a in anns
                ]
                evaluator.process(out["masks"], out["classes"], out["scores"],
                                  gt_masks, gt_classes)
            elif etype == "coco":
                with_segm = "segm" in evaluator.iou_types
                gt_masks = [
                    segmentation_to_mask(a["segmentation"], record["height"],
                                         record["width"])
                    for a in anns
                ] if with_segm else None
                evaluator.process(
                    det_boxes=out["boxes"], det_scores=out["scores"],
                    det_classes=out["classes"],
                    det_masks=list(out["masks"]) if with_segm else None,
                    gt_boxes=np.asarray([a["bbox"] for a in anns],
                                        np.float64).reshape(-1, 4),
                    gt_classes=gt_classes, gt_masks=gt_masks,
                    gt_crowd=[a.get("iscrowd", 0) for a in anns],
                )
            else:  # pascal_voc
                evaluator.process(
                    out["boxes"], out["scores"], out["classes"],
                    np.asarray([a["bbox"] for a in anns],
                               np.float64).reshape(-1, 4),
                    gt_classes,
                    gt_difficult=[a.get("difficult", 0) for a in anns],
                )
            n_img += 1
        t_eval += time.perf_counter() - t2
        if n_img % log_every < batch_size:
            tot = max(n_img, 1)
            logger.info(
                "Inference done %d img. Dataloading: %.4f s/iter. Inference: "
                "%.4f s/iter. Eval: %.4f s/iter.",
                n_img, t_data / tot, t_compute / tot, t_eval / tot,
            )
        t0 = time.perf_counter()
    logger.info(
        "Total inference time: %.4fs (%.6f s / iter per device)",
        t_data + t_compute + t_eval, t_compute / max(n_img, 1),
    )
    return flatten_results(evaluator.evaluate())


def aggregate_family_means(results: dict) -> dict:
    """Per-family averaging (reference ``trainer.py:509-527``): group by the
    dataset-name prefix before the first '_'."""
    fam = defaultdict(lambda: defaultdict(list))
    for name, res in results.items():
        if name.endswith("_mean"):
            continue
        d = name.split("_")[0]
        for metric, value in res.items():
            fam[d][metric].append(value)
    out = dict(results)
    for d, metrics in fam.items():
        out[f"{d}_mean"] = {
            m: float(np.mean(vs)) for m, vs in metrics.items()
        }
    return out


class BaselineTrainer:
    """Supervised source training + eval-only TTA (reference rows 3a)."""

    def __init__(self, model, tx, params, *, canvas: int = 800,
                 min_size: int = 800, max_size: int = 1333,
                 gt_cap: int = 20, mask_res: int = 256, mesh=None,
                 train_min_sizes=None, test_canvas: int | str = "auto"):
        self.model = model
        self.tx = tx
        self.state = TrainState.create(params, tx)
        self.canvas = canvas
        # eval-path geometry: "auto" = d2 ResizeShortestEdge(min_size,
        # max_size) onto rectangular per-batch buckets (reference-faithful);
        # an int keeps the legacy square fit (tiny-model tests)
        self.test_canvas = test_canvas
        self.min_size = min_size
        self.max_size = max_size
        # reference INPUT.MIN_SIZE_TRAIN multi-scale "choice" sampling;
        # the static canvas absorbs size variation as padding
        self.train_min_sizes = train_min_sizes
        self.gt_cap = gt_cap
        self.mask_res = mask_res
        # Data-parallel mesh (the reference's DDP, SURVEY.md section 2.2/5.8):
        # state replicated, batches sharded over the 'data' axis.  The steps
        # run under shard_map (engine.steps._shard_map_step) so each device
        # computes its local shard — the production Pallas kernels see
        # per-shard shapes and need no GSPMD partitioning rules.
        self.mesh = mesh
        if mesh is not None:
            from ttdg_mgm_tpu.parallel.mesh import replicate

            self.state = replicate(mesh, self.state)
        self._source_step = make_source_step(model, tx, mesh=mesh)
        self._tta_step = make_tta_step(model, tx, mesh=mesh)
        self.last_tta_loss = 0.0

    def _put_batch(self, batch: dict) -> dict:
        """Host batch -> device: shard the leading axis over the mesh's
        'data' axis (DDP's per-rank batch split), or plain transfer.

        Host arrays go straight to ``shard_batch`` — a ``jnp.asarray``
        pre-transfer would cost a wasted full-batch H2D+D2H round trip per
        step in multi-process mode (shard_batch works from host numpy)."""
        if self.mesh is not None:
            from ttdg_mgm_tpu.parallel.mesh import shard_batch

            n_data = self.mesh.shape["data"]
            b = next(iter(batch.values())).shape[0]
            assert b % n_data == 0, (
                f"global batch {b} not divisible by data-mesh size {n_data} "
                "(the reference's d2 loader asserts the same for DDP, "
                "data/build.py:241-255)"
            )
            return shard_batch(self.mesh, batch)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def _put_replicated(self, tree):
        if self.mesh is not None:
            from ttdg_mgm_tpu.parallel.mesh import replicate

            return replicate(self.mesh, tree)
        return tree

    # ---------------- checkpoint / resume (reference trainer.py:233-257) ---
    def state_dict(self) -> dict:
        """Everything a restart needs: params + optimizer state + iteration
        (reference checkpoint contents, SURVEY.md section 5.4)."""
        return {"step": self.state.step, "params": self.state.params,
                "opt_state": self.state.opt_state}

    def load_state_dict(self, tree: dict):
        self.state = self._put_replicated(
            TrainState(step=jnp.asarray(tree["step"], jnp.int32),
                       params=tree["params"], opt_state=tree["opt_state"])
        )

    def resume_or_load(self, checkpointer) -> bool:
        """Restore the full train state from the latest checkpoint if one
        exists (reference ``resume_or_load`` semantics, ``trainer.py:233-257``;
        the CLI forces resume like reference ``train_net.py:92``).  Returns
        True when resumed; otherwise the state keeps the weights the trainer
        was constructed with (``MODEL.WEIGHTS`` via the converter)."""
        restored, resumed = checkpointer.resume_or_load(self.state_dict())
        if resumed:
            self.load_state_dict(restored)
            logger.info("resumed from checkpoint at iteration %d",
                        int(self.state.step))
        return resumed

    def default_hooks(self, *, checkpointer=None, checkpoint_period: int = 0,
                      output_dir: str | None = None, log_every: int = 20):
        """The hook set the reference trainers register
        (``trainer.py:352-392``): anomaly guard (SURVEY.md section 5.2),
        periodic full-state checkpointing, and JSON+terminal writers."""
        from ttdg_mgm_tpu.engine.hooks import (
            AnomalyDetectionHook,
            PeriodicCheckpointHook,
            WriterHook,
        )
        from ttdg_mgm_tpu.utils.events import EventStorage, JSONWriter, TerminalWriter

        hooks = [AnomalyDetectionHook(period=log_every)]
        if checkpointer is not None and checkpoint_period > 0:
            hooks.append(PeriodicCheckpointHook(checkpointer, self,
                                                checkpoint_period))
        # host-side writers on the main process only: OUTPUT_DIR is shared
        # across hosts in multi-process runs, and every process writing
        # metrics.json would clobber it (the reference gates its
        # PeriodicWriter via comm.is_main_process, trainer.py:390-391)
        if output_dir is not None and jax.process_index() == 0:
            import os

            storage = EventStorage(int(self.state.step))
            writers = [JSONWriter(os.path.join(output_dir, "metrics.json")),
                       TerminalWriter()]
            hooks.append(WriterHook(storage, writers, period=log_every))
        return hooks

    def train(self, dataset_names, *, max_iter: int, batch_size: int = 8,
              seed: int = 0, log_every: int = 20, hooks=()):
        """Hooks are invoked EVERY iteration with the device metrics dict
        (they sync at their own period); see ``default_hooks``."""
        loader = build_train_loader(
            dataset_names, batch_size=batch_size, canvas=self.canvas,
            min_size=self.min_size, max_size=self.max_size,
            gt_cap=self.gt_cap, mask_res=self.mask_res, seed=seed,
            min_size_choices=self.train_min_sizes,
        )
        rng = jax.random.PRNGKey(seed)
        for it in range(int(self.state.step), max_iter):
            batch = next(loader)
            rng, sub = jax.random.split(rng)
            batch = self._put_batch(batch)
            self.state, metrics = self._source_step(
                self.state, batch, self._put_replicated(sub)
            )
            for h in hooks:
                h(it, metrics)
            if it % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                logger.info("iter %d: %s", it, {k: round(v, 4) for k, v in m.items()})
        return self.state

    def test(self, dataset_names, *, ttt: bool = True, tta_batch: int = 4,
             min_batch_num: int | None = None, dice_threshold: float = 0.9,
             reset_between_datasets: bool = False,
             draw_dir: str | None = None,
             evaluator_type: str | None = None) -> dict:
        """Eval-only TTA over the test datasets (reference ``test``,
        ``trainer.py:431-529``).

        ``evaluator_type``: force one evaluator for every dataset
        (``TEST.EVALUATOR`` CLI override); ``None`` dispatches per dataset on
        its registered ``evaluator_type`` metadata — Dice for the medical
        splits, COCO AP for coco-type, VOC mAP for pascal-type (reference
        ``build_evaluator``, ``trainer.py:316-328``)."""
        results = {}
        # TTA steps donate the state buffers; keep an un-donatable snapshot
        # only when each dataset must restart from the source weights.
        source_state = (
            jax.tree.map(jnp.copy, self.state) if reset_between_datasets else None
        )
        state = self.state
        for name in dataset_names:
            if reset_between_datasets:
                state = jax.tree.map(jnp.copy, source_state)
            if ttt:
                loader = build_test_loader(
                    name, batch_size=tta_batch, canvas=self.test_canvas,
                    min_size=self.min_size, max_size=self.max_size,
                )
                loss = None
                for idx, (batch, metas) in enumerate(loader):
                    if min_batch_num is not None and idx >= min_batch_num:
                        break
                    dev = self._put_batch({"image": batch["image"],
                                           "image_sizes": batch["image_sizes"]})
                    state, loss = self._tta_step(state, dev)
                if loss is not None:
                    self.last_tta_loss = float(loss)
                    logger.info("TTA on %s: final loss %.5f", name, float(loss))
            results[name] = evaluate_dataset(
                self.model, state.params, name, canvas=self.test_canvas,
                min_size=self.min_size, max_size=self.max_size,
                batch_size=tta_batch if ttt else 1,
                dice_threshold=dice_threshold, draw_dir=draw_dir,
                evaluator_type=evaluator_type,
            )
            logger.info("Results %s: %s", name, results[name])
        self.state = state
        return aggregate_family_means(results)
