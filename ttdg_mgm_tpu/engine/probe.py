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


def probe_size_distribution(boxes, valid, *, bins=(32.0, 96.0)) -> dict:
    """Pseudo-box size histogram (reference ``probe.py`` size stats):
    counts of small/medium/large boxes by sqrt-area."""
    sizes = []
    for b in range(len(boxes)):
        v = np.asarray(valid[b], bool)
        bx = np.asarray(boxes[b])[v]
        if len(bx):
            areas = np.clip(bx[:, 2] - bx[:, 0], 0, None) * np.clip(
                bx[:, 3] - bx[:, 1], 0, None
            )
            sizes.extend(np.sqrt(areas).tolist())
    sizes = np.asarray(sizes)
    return {
        "num_boxes": float(len(sizes)),
        "small": float((sizes < bins[0]).sum()),
        "medium": float(((sizes >= bins[0]) & (sizes < bins[1])).sum()),
        "large": float((sizes >= bins[1]).sum()),
        "mean_size": float(sizes.mean()) if len(sizes) else 0.0,
    }


def probe_ood_accuracy(pseudo_scores, pseudo_valid, pseudo_boxes,
                       gt_boxes, gt_valid, *, iou_thresh: float = 0.5) -> dict:
    """In/out-of-distribution pseudo-label accuracy (reference
    ``probe.py:211-290`` ``probe_ood``): treating IoU-matched pseudo boxes as
    in-distribution, how well does the confidence score separate them?"""
    ins, outs = [], []
    for b in range(len(pseudo_boxes)):
        pv = np.asarray(pseudo_valid[b], bool)
        pb = np.asarray(pseudo_boxes[b])[pv]
        ps = np.asarray(pseudo_scores[b])[pv]
        gv = np.asarray(gt_valid[b], bool)
        gb = np.asarray(gt_boxes[b])[gv]
        if len(pb) == 0:
            continue
        if len(gb) == 0:
            outs.extend(ps.tolist())
            continue
        iou = bbox_iou_matrix(pb.astype(np.float64), gb.astype(np.float64))
        matched = iou.max(axis=1) >= iou_thresh
        ins.extend(ps[matched].tolist())
        outs.extend(ps[~matched].tolist())
    mean_in = float(np.mean(ins)) if ins else 0.0
    mean_out = float(np.mean(outs)) if outs else 0.0
    # threshold-free separability: P(score_in > score_out) (AUC by pairs)
    auc = 0.5
    if ins and outs:
        a = np.asarray(ins)[:, None]
        o = np.asarray(outs)[None, :]
        auc = float((a > o).mean() + 0.5 * (a == o).mean())
    return {"mean_score_in": mean_in, "mean_score_out": mean_out,
            "score_auc": auc, "num_in": float(len(ins)),
            "num_out": float(len(outs))}
