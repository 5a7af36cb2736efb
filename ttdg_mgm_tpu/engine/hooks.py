"""Trainer hooks.

Capability of reference ``adapteacher/engine/hooks.py:10-119``
(``LossEvalHook``: periodic validation-loss evaluation with NaN/Inf anomaly
detection) and the d2 hook set the trainers register (LR schedule is inside
the optax transform; periodic checkpoint/eval/writer hooks live here).

Hooks are callables ``hook(iteration, metrics) -> None`` invoked by
``BaselineTrainer.train``; classes below carry state.
"""

from __future__ import annotations

import math


class PeriodicCheckpointHook:
    def __init__(self, checkpointer, trainer, period: int):
        self.ckpt = checkpointer
        self.trainer = trainer
        self.period = period

    def __call__(self, it: int, metrics: dict):
        if self.period > 0 and (it + 1) % self.period == 0:
            self.ckpt.save(it + 1, {"params": self.trainer.state.params})


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


class AnomalyDetectionHook:
    """Finite-loss guard (reference ``LossEvalHook._detect_anomaly``,
    ``hooks.py:92-98`` — defined but never registered there; registered by
    default here as the TPU-side numerical guard, SURVEY.md section 5.2)."""

    def __call__(self, it: int, metrics: dict):
        for k, v in metrics.items():
            if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
                raise FloatingPointError(
                    f"Loss became infinite or NaN at iteration={it}: {k}={v}"
                )


class WriterHook:
    def __init__(self, storage, writers, period: int = 20):
        self.storage = storage
        self.writers = writers
        self.period = period

    def __call__(self, it: int, metrics: dict):
        self.storage.iter = it
        self.storage.put_scalars(**{
            k: v for k, v in metrics.items() if isinstance(v, (int, float))
        })
        if (it + 1) % self.period == 0:
            for w in self.writers:
                w.write(self.storage)
