"""Mean-teacher (adaptive-teacher) trainer.

Capability of reference ``ATeacherTrainer``
(``adapteacher/engine/trainer.py:546-1177``), implemented *correctly* where
the snapshot is broken (SURVEY.md section 0): burn-in supervised stage with
x0.1 loss weighting (``:810-816``), teacher initialized as a copy of the
student at ``BURN_UP_STEP`` (EMA keep-rate 0, ``:829-832``), then per-iter
EMA updates (keep 0.9996) and the semi-supervised step
(``engine.steps.make_mt_step``): teacher pseudo-labels + student
supervised/pseudo/domain losses.

The teacher is part of the (replicated) train state — never re-broadcast,
which is the TPU equivalent of DDP ``broadcast_buffers=False``
(SURVEY.md section 5.8).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

from ttdg_mgm_tpu.data.loader import build_two_crop_loader
from ttdg_mgm_tpu.engine.steps import (
    TrainState,
    ema_update,
    make_mt_step,
    make_source_step,
)
from ttdg_mgm_tpu.engine.trainer import BaselineTrainer

logger = logging.getLogger("ttdg_mgm_tpu")


class ATeacherTrainer(BaselineTrainer):
    def __init__(self, model, tx, params, *, ema_keep_rate: float = 0.9996,
                 teacher_update_iter: int = 1, burn_up_step: int = 0,
                 unsup_weight: float = 1.0, dis_weight: float = 0.1,
                 pseudo_threshold: float = 0.8, cross_domain: bool = False,
                 sup_percent: float | None = None, split_seed: int = 0,
                 **kw):
        super().__init__(model, tx, params, **kw)
        # DATALOADER.SUP_PERCENT split of the labeled set (reference
        # divide_label_unlabel) when no explicit unlabeled datasets exist
        self.sup_percent = sup_percent
        self.split_seed = split_seed
        # Replicated across the mesh like the student; only ever updated by
        # the deterministic EMA step, never re-broadcast (the DDP
        # broadcast_buffers=False semantics, SURVEY.md section 5.8).
        self.teacher_params = self._put_replicated(jax.tree.map(jnp.copy, params))
        self.ema_keep_rate = ema_keep_rate
        self.teacher_update_iter = teacher_update_iter
        self.burn_up_step = burn_up_step
        self._burnin_step = make_source_step(model, tx, loss_weight=0.1,
                                             mesh=self.mesh)
        self.cross_domain = cross_domain
        # EMA class centers for the cross-domain head (functional state,
        # the reference GModule's "graph-guided memory bank")
        self.centers = self._put_replicated(
            jnp.zeros((model.num_classes + 1, model.fpn_channels))
        ) if cross_domain else None
        self._mt_step = make_mt_step(
            model, tx, unsup_weight=unsup_weight, dis_weight=dis_weight,
            pseudo_threshold=pseudo_threshold, gt_cap=self.gt_cap,
            with_cross_domain=cross_domain, mesh=self.mesh,
        )

    def train_semisup(self, label_names, unlabel_names, *, max_iter: int,
                      batch_size: int = 4, seed: int = 0, log_every: int = 20,
                      hooks=()):
        loader = build_two_crop_loader(
            label_names, unlabel_names, batch_size=batch_size,
            canvas=self.canvas, min_size=self.min_size, max_size=self.max_size,
            gt_cap=self.gt_cap, mask_res=self.mask_res, seed=seed,
            sup_percent=self.sup_percent, split_seed=self.split_seed,
        )
        rng = jax.random.PRNGKey(seed)
        for it in range(int(self.state.step), max_iter):
            batch = next(loader)
            batch = self._put_batch(batch)
            rng, sub = jax.random.split(rng)
            sub = self._put_replicated(sub)
            if it < self.burn_up_step:
                sup_batch = {
                    "image": batch["label_strong"],
                    "image_sizes": batch["label_sizes"],
                    "gt_boxes": batch["gt_boxes"],
                    "gt_classes": batch["gt_classes"],
                    "gt_masks": batch["gt_masks"],
                    "gt_valid": batch["gt_valid"],
                }
                self.state, metrics = self._burnin_step(self.state, sup_batch, sub)
            else:
                if it == self.burn_up_step:
                    # teacher <- student copy (EMA with keep 0, reference :829-832)
                    self.teacher_params = jax.tree.map(jnp.copy, self.state.params)
                elif it % self.teacher_update_iter == 0:
                    self.teacher_params = ema_update(
                        self.teacher_params, self.state.params,
                        jnp.float32(self.ema_keep_rate),
                    )
                if self.cross_domain:
                    self.state, self.centers, metrics = self._mt_step(
                        self.state, self.teacher_params, self.centers, batch, sub
                    )
                else:
                    self.state, metrics = self._mt_step(
                        self.state, self.teacher_params, batch, sub
                    )
            for h in hooks:
                h(it, metrics)
            if it % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                logger.info("iter %d: %s", it, {k: round(v, 4) for k, v in m.items()})
        return self.state

    def state_dict(self) -> dict:
        """Student state + EMA teacher (the reference checkpoints the
        ``EnsembleTSModel``, SURVEY.md section 5.4)."""
        d = super().state_dict()
        d["teacher_params"] = self.teacher_params
        return d

    def load_state_dict(self, tree: dict):
        teacher = tree.pop("teacher_params", None)
        super().load_state_dict(tree)
        if teacher is not None:
            self.teacher_params = self._put_replicated(teacher)

    def test(self, dataset_names, *, eval_student: bool = False, **kw):
        """Evaluate the teacher (default) or student (``TEST.EVAL_STU``),
        reference ``train_net.py:53-56``."""
        if eval_student:
            return super().test(dataset_names, **kw)
        saved = self.state
        self.state = TrainState.create(self.teacher_params, self.tx)
        try:
            return super().test(dataset_names, **kw)
        finally:
            self.teacher_params = self.state.params
            self.state = saved
