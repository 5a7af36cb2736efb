"""Fetal-ultrasound detection dataset (legacy standalone loader).

Capability of reference ``adapteacher/data/datasets/fetus_dataset.py:157-493``:
a hospital-structured JSON annotation tree —

    <root>/<hospital>/annotations/<slice>_annotations.json
    <root>/<hospital>/<slice>/<image file>

where each annotation file maps image filename -> {``bodyPart``,
``annotations``: [{``name``, ``vertex``: [[x1, y1], [x2, y2]], ...}]}.
Images are filtered (file exists, bodyPart matches the slice, >=1 usable
organ), split 0.7/0.1/0.2 train/valid/test with a fixed seed, and organ
names map to integer labels through per-slice vocabularies.

Differences from the reference, by design: pure NumPy/PIL host code (no
torch Dataset), a deterministic ``numpy.random.Generator`` split instead of
global-seed ``random.sample``, and the per-slice organ vocabularies are a
constructor argument (``label_maps``) so new slice types need no code edit.
"""

from __future__ import annotations

import json
import os

import numpy as np

# Per-slice organ-name -> label vocabularies (dataset schema; reference
# ``fetus_dataset.py:57-75``).  Heart slices + brain slices; label 0 is
# background by convention, organs start at 1.
DEFAULT_LABEL_MAPS = {
    "four_chamber_heart": {
        "右心房": 1, "右心室": 2, "左心室": 3, "室间隔": 4, "脊柱": 5,
        "左心房": 6, "房室间隔十字交叉": 7, "降主动脉": 8, "肋骨": 9,
    },
    "left_ventricular_outflow_tract": {
        "右心室": 1, "左室流出道及主动脉": 2, "左心室": 3, "脊柱": 4, "室间隔": 5,
    },
    "right_ventricular_outflow_tract": {
        "右心室": 1, "主肺动脉及动脉导管": 2, "脊柱": 3, "左心室": 4,
        "升主动脉": 5, "主动脉弓": 6,
    },
    "three_vessel_tracheal": {
        "降主动脉": 1, "脊柱": 2, "主肺动脉及动脉导管": 3, "气管": 4,
        "上腔静脉": 5, "主动脉弓": 6,
    },
    "cenao": {
        "侧脑室后角": 1, "丘脑": 2, "脉络丛": 3, "透明隔腔": 4, "脑中线": 5,
        "大脑外侧裂": 6, "颅骨强回声环": 7,
    },
    "qiunao": {
        "丘脑": 1, "大脑外侧裂": 2, "脉络丛": 3, "透明隔腔": 4, "脑中线": 5,
        "颅骨强回声环": 6, "小脑": 7,
    },
    "xiaonao": {
        "小脑": 1, "丘脑": 2, "大脑外侧裂": 3, "透明隔腔": 4, "脑中线": 5,
        "颅后窝池": 6, "颅骨强回声环": 7,
    },
}

SLICE_BODYPART = {
    "four_chamber_heart": "四腔心切面",
    "left_ventricular_outflow_tract": "左室流出道切面",
    "right_ventricular_outflow_tract": "右室流出道切面",
    "three_vessel_tracheal": "三血管气管切面",
    "cenao": "侧脑室水平横切面",
    "qiunao": "丘脑水平横切面",
    "xiaonao": "小脑水平横切面",
}


def _vertex_to_xyxy(vertex) -> np.ndarray:
    (x1, y1), (x2, y2) = vertex[0], vertex[1]
    return np.asarray(
        [min(x1, x2), min(y1, y2), max(x1, x2), max(y1, y2)], np.float32
    )


def _scan(root: str, hospitals, slices, label_maps, bodypart_ok):
    """Collect {image_key: record} over all hospital/slice annotation files."""
    images = {}
    for hospital in hospitals:
        ann_dir = os.path.join(root, hospital, "annotations")
        if not os.path.isdir(ann_dir):
            continue
        for slice_name in slices:
            path = os.path.join(ann_dir, f"{slice_name}_annotations.json")
            if not os.path.exists(path):
                continue
            with open(path) as f:
                per_image = json.load(f)["annotations"]
            vocab = label_maps[slice_name]
            want_part = bodypart_ok.get(slice_name)
            for key, info in per_image.items():
                img_path = os.path.join(root, hospital, slice_name, key)
                if not os.path.exists(img_path):
                    continue
                if want_part and info.get("bodyPart") not in want_part:
                    continue
                boxes, labels = [], []
                for organ in info.get("annotations", []):
                    if organ.get("name") in vocab:
                        boxes.append(_vertex_to_xyxy(organ["vertex"]))
                        labels.append(vocab[organ["name"]])
                if not boxes:
                    continue
                images[f"{hospital}/{slice_name}/{key}"] = {
                    "file_name": img_path,
                    "image_id": key,
                    "slice": slice_name,
                    "hospital": hospital,
                    "boxes": np.stack(boxes),
                    "labels": np.asarray(labels, np.int64),
                }
    return images


def _split_keys(keys, ratios, seed):
    keys = sorted(keys)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(keys))
    n_train = int(len(keys) * ratios[0])
    n_valid = int(len(keys) * ratios[1])
    train = [keys[i] for i in perm[:n_train]]
    valid = [keys[i] for i in perm[n_train : n_train + n_valid]]
    test = sorted(keys[i] for i in perm[n_train + n_valid :])
    return {"train": train, "valid": valid, "test": test}


class FetusDataset:
    """Index-able host dataset yielding dicts with decoded image + boxes."""

    def __init__(
        self,
        root: str,
        hospitals,
        slices,
        operation: str = "train",
        ratios=(0.7, 0.1, 0.2),
        seed: int = 6666,
        label_maps: dict | None = None,
        bodypart_filter: dict | None = None,
    ):
        if operation not in ("train", "valid", "test"):
            raise ValueError(f"operation must be train/valid/test, got {operation}")
        label_maps = label_maps or DEFAULT_LABEL_MAPS
        bodypart = bodypart_filter
        if bodypart is None:
            bodypart = {s: {SLICE_BODYPART[s]} for s in slices if s in SLICE_BODYPART}
        self.images = _scan(root, hospitals, slices, label_maps, bodypart)
        self.splits = _split_keys(self.images.keys(), ratios, seed)
        self.operation = operation
        self.used = self.splits[operation]

    def __len__(self):
        return len(self.used)

    def __getitem__(self, index: int) -> dict:
        from PIL import Image

        rec = dict(self.images[self.used[index]])
        with Image.open(rec["file_name"]) as im:
            rec["image"] = np.asarray(im.convert("RGB"), np.uint8)
        rec["height"], rec["width"] = rec["image"].shape[:2]
        return rec


def load_fetus_dicts(root: str, hospitals, slices, operation="test", **kw):
    """Catalog-style dataset dicts (no image decode) for the standard
    loader path — lets fetus data flow through the same train/test loaders
    as the COCO-registered medical splits."""
    ds = FetusDataset(root, hospitals, slices, operation=operation, **kw)
    out = []
    for key in ds.used:
        rec = ds.images[key]
        out.append({
            "file_name": rec["file_name"],
            "image_id": rec["image_id"],
            "annotations": [
                {
                    "bbox": box.tolist(),
                    "bbox_mode": "xyxy",
                    # catalog convention is 0-based contiguous classes
                    "category_id": int(label) - 1,
                    "iscrowd": 0,
                }
                for box, label in zip(rec["boxes"], rec["labels"])
            ],
        })
    return out
