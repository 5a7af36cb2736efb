"""Optimizers and LR schedules (optax)."""

from ttdg_mgm_tpu.solver.build import (
    build_optimizer,
    trainable_mask,
    warmup_cosine_schedule,
    warmup_multistep_schedule,
    warmup_two_stage_schedule,
)
