"""Foggy-Cityscapes instance loader (legacy DA benchmark support).

Capability of reference ``adapteacher/data/datasets/cityscapes_foggy.py``:
scan a ``leftImg8bit_foggy`` image tree + ``gtFine`` annotation tree, pair
each foggy rendering (optionally only the beta=0.02 attenuation) with its
``gtFine_polygons.json``, and emit standard dataset dicts with polygon
instance annotations mapped to the 8 contiguous "thing" classes.

Differences from the reference, by design:
- no ``cityscapesscripts`` dependency — the instance-class table below is the
  standard Cityscapes label set (the 8 ``hasInstances and not ignoreInEval``
  classes), stated directly;
- a JSON sidecar cache instead of ``torch.save`` pickles;
- a plain thread pool instead of a multiprocessing pool (the work is
  JSON parsing, GIL-released file IO dominates).
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor

# Cityscapes "thing" classes (hasInstances, not ignoreInEval) and their raw
# label ids, in canonical order -> contiguous ids 0..7.
CITYSCAPES_THING_CLASSES = [
    "person", "rider", "car", "truck", "bus", "train", "motorcycle", "bicycle",
]
_RAW_ID = {
    "person": 24, "rider": 25, "car": 26, "truck": 27,
    "bus": 28, "train": 31, "motorcycle": 32, "bicycle": 33,
}
_LABEL_TO_CONTIGUOUS = {name: i for i, name in enumerate(CITYSCAPES_THING_CLASSES)}
# group labels collapse onto their instance class (cityscapes convention)
_GROUP_ALIASES = {name + "group": name for name in CITYSCAPES_THING_CLASSES}

_SPLITS = {
    "cityscapes_foggy_train": ("leftImg8bit_foggy/train", "gtFine/train"),
    "cityscapes_foggy_val": ("leftImg8bit_foggy/val", "gtFine/val"),
    "cityscapes_foggy_test": ("leftImg8bit_foggy/test", "gtFine/test"),
}


def _pair_files(image_dir: str, gt_dir: str, beta: str | None):
    """(image, polygons-json) pairs for every foggy rendering on disk."""
    pairs = []
    for city in sorted(os.listdir(image_dir)):
        city_img = os.path.join(image_dir, city)
        if not os.path.isdir(city_img):
            continue
        for fname in sorted(os.listdir(city_img)):
            if "leftImg8bit_foggy" not in fname:
                continue
            if beta is not None and f"beta_{beta}" not in fname:
                continue
            stem = fname.split("leftImg8bit_foggy")[0]
            poly = os.path.join(gt_dir, city, stem + "gtFine_polygons.json")
            pairs.append((os.path.join(city_img, fname), poly))
    if not pairs:
        raise FileNotFoundError(f"no foggy cityscapes images under {image_dir}")
    return pairs


def _file_to_dict(pair):
    image_file, poly_file = pair
    with open(poly_file) as f:
        ann = json.load(f)
    record = {
        "file_name": image_file,
        "image_id": os.path.basename(image_file),
        "height": ann["imgHeight"],
        "width": ann["imgWidth"],
        "annotations": [],
    }
    for obj in ann["objects"]:
        if obj.get("deleted"):
            continue
        label = _GROUP_ALIASES.get(obj["label"], obj["label"])
        if label not in _LABEL_TO_CONTIGUOUS:
            continue
        poly = [float(v) for xy in obj["polygon"] for v in xy]
        if len(poly) < 6:
            continue
        xs, ys = poly[0::2], poly[1::2]
        record["annotations"].append({
            "bbox": [min(xs), min(ys), max(xs), max(ys)],
            "bbox_mode": "xyxy",
            "category_id": _LABEL_TO_CONTIGUOUS[label],
            "raw_category_id": _RAW_ID[label],
            "segmentation": [poly],
            # '...group' polygons are crowd regions (reference
            # cityscapes_foggy.py:228): ignore regions in eval, not GT
            # instances — the class mapping still collapses onto the
            # instance class.
            "iscrowd": 1 if obj["label"].endswith("group") else 0,
        })
    return record


def load_cityscapes_foggy_instances(
    image_dir: str,
    gt_dir: str,
    beta: str | None = None,
    cache: bool = True,
    workers: int = 8,
):
    """Load foggy-cityscapes instance dicts.

    ``beta``: fog attenuation to keep ("0.02", "0.01", "0.005"); ``None``
    keeps all renderings (the reference's ``_USE_ALLSPLITS=True`` default).
    """
    tag = beta or "allsplits"
    cache_path = os.path.join(gt_dir, f"ttdg_cache_{tag}.json")
    if cache and os.path.exists(cache_path):
        with open(cache_path) as f:
            return json.load(f)
    pairs = _pair_files(image_dir, gt_dir, beta)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        dicts = list(pool.map(_file_to_dict, pairs))
    if cache:
        try:
            with open(cache_path, "w") as f:
                json.dump(dicts, f)
        except OSError:
            pass  # read-only dataset tree: skip the cache
    return dicts


def register_all_cityscapes_foggy(root: str | None = None, beta: str | None = None):
    """Register train/val/test splits under ``root`` (default
    ``$TTDG_DATASETS/cityscapes_foggy``) in the dataset catalog."""
    from ttdg_mgm_tpu.data.catalog import DatasetCatalog, MetadataCatalog

    root = root or os.path.join(
        os.environ.get("TTDG_DATASETS", "datasets"), "cityscapes_foggy"
    )
    for name, (img_rel, gt_rel) in _SPLITS.items():
        img_dir = os.path.join(root, img_rel)
        gt_dir = os.path.join(root, gt_rel)
        DatasetCatalog.register(
            name,
            lambda i=img_dir, g=gt_dir: load_cityscapes_foggy_instances(i, g, beta),
        )
        meta = MetadataCatalog.get(name)
        meta["thing_classes"] = list(CITYSCAPES_THING_CLASSES)
        meta["evaluator_type"] = "coco"
