"""Visualization dumps (boxes + masks over images).

Capability of reference ``engine/trainer.py:1179-1228`` (``draw_box``),
``:1288-1308`` (per-image prediction dumps under ``OUTPUT_DIR/visual``) and
``:1376-1406`` (``draw_mask_img`` under ``/masks``), gated by ``TEST.DRAW``.
cv2-based host-side drawing.
"""

from __future__ import annotations

import os

import numpy as np

_COLORS = [(66, 133, 244), (219, 68, 55), (244, 180, 0), (15, 157, 88),
           (171, 71, 188), (0, 172, 193)]


def draw_detections(image: np.ndarray, boxes, scores=None, classes=None,
                    class_names=None, score_floor: float = 0.0) -> np.ndarray:
    import cv2

    out = np.ascontiguousarray(image[..., ::-1].copy())  # RGB -> BGR for cv2
    for i, box in enumerate(np.asarray(boxes).reshape(-1, 4)):
        s = float(scores[i]) if scores is not None else 1.0
        if s < score_floor:
            continue
        c = int(classes[i]) if classes is not None else 0
        color = _COLORS[c % len(_COLORS)]
        x1, y1, x2, y2 = (int(round(v)) for v in box)
        cv2.rectangle(out, (x1, y1), (x2, y2), color, 2)
        label = class_names[c] if class_names else str(c)
        cv2.putText(out, f"{label} {s:.2f}", (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return out[..., ::-1]


def overlay_masks(image: np.ndarray, masks, classes=None,
                  alpha: float = 0.45) -> np.ndarray:
    out = image.astype(np.float32).copy()
    for i, m in enumerate(masks):
        c = int(classes[i]) if classes is not None else i
        color = np.asarray(_COLORS[c % len(_COLORS)], np.float32)[::-1]
        mm = np.asarray(m, bool)
        out[mm] = out[mm] * (1 - alpha) + color * alpha
    return out.astype(np.uint8)


def mask_image(image: np.ndarray, masks) -> np.ndarray:
    """White masks on a black canvas the size of the image — the reference's
    per-image mask dump (``draw_mask_img``, ``trainer.py:1376-1406``), which
    writes one file per evaluated image even with zero detections."""
    out = np.zeros_like(np.asarray(image), dtype=np.uint8)
    for m in masks:
        out[np.asarray(m, bool)] = 255
    return out


def dump_visualization(output_dir: str, image_id, image, detections,
                       class_names=None):
    """Write box + mask overlays (reference ``OUTPUT_DIR/visual`` and
    ``/masks`` dumps)."""
    import cv2

    vis_dir = os.path.join(output_dir, "visual")
    mask_dir = os.path.join(output_dir, "masks")
    os.makedirs(vis_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    boxed = draw_detections(image, detections["boxes"], detections["scores"],
                            detections["classes"], class_names)
    cv2.imwrite(os.path.join(vis_dir, f"{image_id}.png"), boxed[..., ::-1])
    # one mask dump per image regardless of detection count (the reference
    # writes a black canvas when nothing scored high enough)
    masked = mask_image(image, detections.get("masks", []))
    cv2.imwrite(os.path.join(mask_dir, f"{image_id}.png"), masked[..., ::-1])
