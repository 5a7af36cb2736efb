"""Engine: jitted train/adapt steps and trainers.

Capability of reference ``adapteacher/engine/`` (SURVEY.md section 2.1 rows
3a-5): ``BaselineTrainer`` source training + eval-only TTA loop,
``ATeacherTrainer`` mean-teacher semi-supervised training (implemented
*correctly* where the reference snapshot is broken — SURVEY.md section 0
caveat), EMA teacher update, hooks and metric aggregation.
"""

from ttdg_mgm_tpu.engine.steps import (
    TrainState,
    ema_update,
    make_mt_step,
    make_source_step,
    make_tta_step,
    threshold_pseudo_labels,
)
from ttdg_mgm_tpu.engine.trainer import BaselineTrainer
from ttdg_mgm_tpu.engine.mean_teacher import ATeacherTrainer
