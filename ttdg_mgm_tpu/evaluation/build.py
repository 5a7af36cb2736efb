"""Evaluator dispatch by dataset type.

Capability of reference ``ATeacherTrainer.build_evaluator``
(``adapteacher/engine/trainer.py:316-328``): pick the evaluator from the
dataset's registered ``evaluator_type`` metadata — COCO AP for coco-type
datasets, VOC mAP for pascal-type (with the watercolor class subset), and
(this framework's flagship addition) Dice/E/S for the medical TTA splits,
which the reference's ``BaselineTrainer.test`` hardwires to
``DiceEvaluator`` (``trainer.py:484-485``).
"""

from __future__ import annotations

from ttdg_mgm_tpu.data.catalog import MetadataCatalog
from ttdg_mgm_tpu.data.datasets.pascal_voc import (
    VOC_CLASS_NAMES,
    WATERCOLOR_CLASS_NAMES,
)
from ttdg_mgm_tpu.evaluation.coco_eval import COCOEvaluator
from ttdg_mgm_tpu.evaluation.dice import DiceEvaluator
from ttdg_mgm_tpu.evaluation.pascal_voc import PascalVOCDetectionEvaluator


def evaluator_type_of(dataset_name: str, override: str | None = None) -> str:
    """Resolve a dataset's evaluator type.  Unset metadata falls back to
    ``"dice"`` — the reference's flagship eval path evaluates every test
    dataset with ``DiceEvaluator`` (``trainer.py:484-485``), and the medical
    splits carry no d2 evaluator_type of their own."""
    if override:
        return override
    return MetadataCatalog.get(dataset_name).get("evaluator_type") or "dice"


def build_evaluator(dataset_name: str, *, dice_threshold: float = 0.9,
                    evaluator_type: str | None = None, mask_on: bool = True):
    """Returns ``(evaluator, evaluator_type)`` (reference
    ``trainer.py:316-328``; NotImplementedError on unknown types like d2)."""
    etype = evaluator_type_of(dataset_name, evaluator_type)
    meta = MetadataCatalog.get(dataset_name)
    if etype == "dice":
        return DiceEvaluator(dataset_name, dice_threshold), etype
    if etype == "coco":
        return COCOEvaluator(
            iou_types=("bbox", "segm") if mask_on else ("bbox",)
        ), etype
    if etype == "pascal_voc":
        return PascalVOCDetectionEvaluator(
            meta.get("thing_classes", list(VOC_CLASS_NAMES)),
            use_07_metric=bool(meta.get("year", 2012) == 2007),
        ), etype
    if etype == "pascal_voc_water":
        # reference: target_classnames=["bicycle", "bird", "car", "cat",
        # "dog", "person"] (trainer.py:327)
        return PascalVOCDetectionEvaluator(
            meta.get("thing_classes", list(VOC_CLASS_NAMES)),
            eval_class_subset=list(WATERCOLOR_CLASS_NAMES),
        ), "pascal_voc"
    raise NotImplementedError(
        f"no Evaluator for the dataset {dataset_name} with the type {etype}"
    )


def flatten_results(results: dict) -> dict:
    """``{"bbox": {"AP": x}} -> {"bbox_AP": x}``: one flat scalar dict per
    dataset so per-family averaging (reference ``trainer.py:509-527``) and
    the ``result_ap.txt`` JSON lines stay uniform across evaluator types.
    Non-scalar entries (VOC ``per_class``) are kept under their joined key
    only if scalar-valued per class."""
    flat = {}

    def walk(prefix, d):
        for k, v in d.items():
            key = f"{prefix}_{k}" if prefix else str(k)
            if isinstance(v, dict):
                walk(key, v)
            elif isinstance(v, (int, float)):
                flat[key] = float(v)

    walk("", results)
    return flat
