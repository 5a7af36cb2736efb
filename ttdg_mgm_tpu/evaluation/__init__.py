"""Evaluation: Dice / E-measure / S-measure (the TTA benchmark metrics)."""

from ttdg_mgm_tpu.evaluation.dice import (
    DiceEvaluator,
    dice_coefficient,
    enhanced_align,
    structure_measure,
)
