"""Evaluation: Dice / E-measure / S-measure (the TTA benchmark metrics),
COCO AP, VOC mAP, and the per-dataset evaluator dispatch."""

from ttdg_mgm_tpu.evaluation.build import build_evaluator, evaluator_type_of
from ttdg_mgm_tpu.evaluation.coco_eval import COCOEvaluator
from ttdg_mgm_tpu.evaluation.dice import (
    DiceEvaluator,
    dice_coefficient,
    enhanced_align,
    structure_measure,
)
from ttdg_mgm_tpu.evaluation.pascal_voc import PascalVOCDetectionEvaluator
