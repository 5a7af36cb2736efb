"""Trainer hooks.

Capability of reference ``adapteacher/engine/hooks.py:10-119``
(``LossEvalHook``: periodic validation-loss evaluation with NaN/Inf anomaly
detection) plus the d2 hook set the reference trainers register
(``trainer.py:352-392``): PeriodicCheckpointer, EvalHook, PeriodicWriter.
The LR schedule lives inside the optax transform, so there is no LR hook.

Hooks are callables ``hook(iteration, metrics) -> None`` invoked by the
trainers EVERY iteration; ``metrics`` is the jitted step's loss dict of
*device* arrays.  Hooks that need host values convert at their own period so
the train loop stays asynchronous between syncs (a per-iteration
device->host scalar read costs a full round trip on a TPU tunnel).
"""

from __future__ import annotations

import logging
import math

logger = logging.getLogger("ttdg_mgm_tpu")


def _floats(metrics: dict) -> dict:
    return {k: float(v) for k, v in metrics.items()}


class PeriodicCheckpointHook:
    """Save the trainer's FULL state every ``period`` iterations (reference
    ``PeriodicCheckpointer`` every SOLVER.CHECKPOINT_PERIOD,
    ``trainer.py:377-382``); the saved tree is what ``resume_or_load``
    restores — params + optimizer state + iteration (+ teacher for MT)."""

    def __init__(self, checkpointer, trainer, period: int):
        self.ckpt = checkpointer
        self.trainer = trainer
        self.period = period

    def __call__(self, it: int, metrics: dict):
        if self.period > 0 and (it + 1) % self.period == 0:
            self.ckpt.save(it + 1, self.trainer.state_dict())


class PeriodicEvalHook:
    def __init__(self, trainer, dataset_names, period: int, **test_kwargs):
        self.trainer = trainer
        self.datasets = dataset_names
        self.period = period
        self.kwargs = test_kwargs
        self.results = []

    def __call__(self, it: int, metrics: dict):
        if self.period > 0 and (it + 1) % self.period == 0:
            self.results.append((it + 1, self.trainer.test(self.datasets,
                                                           **self.kwargs)))


class LossEvalHook:
    """Periodic validation-*loss* evaluation (reference ``LossEvalHook``,
    ``hooks.py:56-71``: branch-aware model call on the val set, mean loss
    recorded) — distinct from full test inference (PeriodicEvalHook).

    Runs the supervised loss branch with the CURRENT params on
    ``num_batches`` deterministic batches of the validation dataset; no
    parameter update.  Results land in ``self.history`` and the log."""

    def __init__(self, trainer, dataset_name: str, period: int,
                 num_batches: int = 8, batch_size: int = 2):
        self.trainer = trainer
        self.dataset = dataset_name
        self.period = period
        self.num_batches = num_batches
        self.batch_size = batch_size
        self.history: list[tuple[int, float]] = []
        self._loss_fn = None
        self._loader_batches = None

    def _build(self):
        import jax

        from ttdg_mgm_tpu.data.loader import build_train_loader

        t = self.trainer
        loader = build_train_loader(
            [self.dataset], batch_size=self.batch_size, canvas=t.canvas,
            min_size=t.min_size, max_size=t.max_size, gt_cap=t.gt_cap,
            mask_res=t.mask_res, seed=0, flip_prob=0.0,
        )
        self._loader_batches = [next(loader) for _ in range(self.num_batches)]
        model = t.model

        @jax.jit
        def loss_fn(params, batch, rng):
            losses = model.apply(
                {"params": params}, batch["image"], batch["image_sizes"],
                batch["gt_boxes"], batch["gt_classes"], batch["gt_masks"],
                batch["gt_valid"], rng, method=model.loss_supervised,
            )
            return sum(losses.values())

        self._rng = jax.random.PRNGKey(0)
        self._loss_fn = loss_fn

    def __call__(self, it: int, metrics: dict):
        if self.period <= 0 or (it + 1) % self.period != 0:
            return
        if self._loss_fn is None:
            self._build()
        from ttdg_mgm_tpu.parallel.mesh import global_like

        total = 0.0
        params = self.trainer.state.params
        rng = global_like(params, self._rng)
        for batch in self._loader_batches:
            # multi-process: params are global arrays -> inputs must be too
            dev = global_like(params, batch)
            total += float(self._loss_fn(params, dev, rng))
        mean = total / max(len(self._loader_batches), 1)
        self.history.append((it + 1, mean))
        logger.info("validation loss (%s) at iter %d: %.5f",
                    self.dataset, it + 1, mean)
        if not math.isfinite(mean):
            raise FloatingPointError(
                f"validation loss became non-finite at iteration={it + 1}"
            )


class AnomalyDetectionHook:
    """Finite-loss guard (reference ``LossEvalHook._detect_anomaly``,
    ``hooks.py:92-98`` — defined but never registered there; registered by
    default here as the TPU-side numerical guard, SURVEY.md section 5.2).
    Syncs device metrics every ``period`` iterations."""

    def __init__(self, period: int = 20):
        self.period = max(period, 1)

    def __call__(self, it: int, metrics: dict):
        if it % self.period != 0:
            return
        for k, v in _floats(metrics).items():
            if math.isnan(v) or math.isinf(v):
                raise FloatingPointError(
                    f"Loss became infinite or NaN at iteration={it}: {k}={v}"
                )


class WriterHook:
    """Record scalars into the EventStorage and flush all writers every
    ``period`` iterations (reference ``PeriodicWriter(build_writers(), 20)``,
    ``trainer.py:390-391``)."""

    def __init__(self, storage, writers, period: int = 20):
        self.storage = storage
        self.writers = writers
        self.period = max(period, 1)

    def __call__(self, it: int, metrics: dict):
        if (it + 1) % self.period != 0:
            return
        self.storage.iter = it
        self.storage.put_scalars(**_floats(metrics))
        for w in self.writers:
            w.write(self.storage)
