"""Host-side augmentation (weak + strong).

Capability of reference weak aug (d2 ``ResizeShortestEdge`` + ``RandomFlip``)
and strong aug (``adapteacher/data/detection_utils.py:20-43``: SimCLR-style
ColorJitter p0.8, Grayscale p0.2, GaussianBlur p0.5, 3x RandomErasing), all
in NumPy/PIL on host.

Geometry transforms update boxes and polygon coordinates so the weak/strong
two-crop pipeline shares geometry exactly like the reference's
``DatasetMapperTwoCropSeparate`` (``dataset_mapper.py:17-177``).
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter


def resize_shortest_edge_size(h: int, w: int, short: int, max_size: int):
    """d2 ResizeShortestEdge target (newh, neww) — EXACT arithmetic of
    ``detectron2/data/transforms/augmentation_impl.py`` ``get_output_shape``:
    the short side is pinned to exactly ``short`` (not h*scale re-rounded),
    and rounding is half-up ``int(x + 0.5)``, not Python banker's round."""
    scale = short / min(h, w)
    if h < w:
        newh, neww = short, scale * w
    else:
        newh, neww = scale * h, short
    if max(newh, neww) > max_size:
        s2 = max_size / max(newh, neww)
        newh, neww = newh * s2, neww * s2
    return int(newh + 0.5), int(neww + 0.5)


def resize_shortest_edge(img: np.ndarray, short: int, max_size: int):
    """d2 ResizeShortestEdge (bilinear).  Returns (resized, scale)."""
    h, w = img.shape[:2]
    nh, nw = resize_shortest_edge_size(h, w, short, max_size)
    out = np.asarray(
        Image.fromarray(img).resize((nw, nh), Image.BILINEAR), dtype=img.dtype
    )
    return out, (nh / h, nw / w)


def hflip(img, boxes, polygons):
    w = img.shape[1]
    img = img[:, ::-1]
    if boxes is not None and len(boxes):
        boxes = boxes.copy()
        x1 = boxes[:, 0].copy()
        boxes[:, 0] = w - boxes[:, 2]
        boxes[:, 2] = w - x1
    flipped_polys = []
    for segs in polygons:
        out = []
        for p in segs or []:
            p = np.asarray(p, np.float64).copy()
            p[0::2] = w - p[0::2]
            out.append(p.tolist())
        flipped_polys.append(out)
    return np.ascontiguousarray(img), boxes, flipped_polys


def scale_annotations(boxes, polygons, sy: float, sx: float):
    if boxes is not None and len(boxes):
        boxes = boxes * np.array([sx, sy, sx, sy], np.float32)
    scaled = []
    for segs in polygons:
        out = []
        for p in segs or []:
            p = np.asarray(p, np.float64).copy()
            p[0::2] *= sx
            p[1::2] *= sy
            out.append(p.tolist())
        scaled.append(out)
    return boxes, scaled


# --- strong augmentation (photometric only, geometry preserved) -------------

def _color_jitter(img: Image.Image, rng) -> Image.Image:
    # torchvision ColorJitter(0.4, 0.4, 0.4, 0.1) applied in random order
    ops = []
    b, c, s = (rng.uniform(0.6, 1.4) for _ in range(3))
    hshift = rng.uniform(-0.1, 0.1)
    ops.append(lambda im: ImageEnhance.Brightness(im).enhance(b))
    ops.append(lambda im: ImageEnhance.Contrast(im).enhance(c))
    ops.append(lambda im: ImageEnhance.Color(im).enhance(s))

    def hue(im):
        hsv = np.array(im.convert("HSV"), np.int16)
        hsv[..., 0] = (hsv[..., 0] + int(hshift * 255)) % 256
        return Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB")

    ops.append(hue)
    rng.shuffle(ops)
    for op in ops:
        img = op(img)
    return img


def _random_erase(arr: np.ndarray, rng, scale, ratio, value=None):
    h, w = arr.shape[:2]
    for _ in range(10):
        area = rng.uniform(*scale) * h * w
        r = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1])))
        eh = int(round(np.sqrt(area * r)))
        ew = int(round(np.sqrt(area / r)))
        if eh < h and ew < w and eh > 0 and ew > 0:
            y = rng.randint(0, h - eh)
            x = rng.randint(0, w - ew)
            if value is None:
                arr[y:y + eh, x:x + ew] = rng.randint(0, 256, (eh, ew, arr.shape[2]))
            else:
                arr[y:y + eh, x:x + ew] = value
            return arr
    return arr


def build_strong_augmentation(seed: int | None = None):
    """Reference ``build_strong_augmentation`` (``detection_utils.py:20-43``):
    ColorJitter p0.8 -> Grayscale p0.2 -> GaussianBlur sigma U[0.1, 2] p0.5 ->
    RandomErasing x3 (p0.7/p0.5/p0.3, varying scales/ratios/values)."""
    rng = np.random.RandomState(seed)

    def strong(img: np.ndarray) -> np.ndarray:
        pil = Image.fromarray(img)
        if rng.rand() < 0.8:
            pil = _color_jitter(pil, rng)
        if rng.rand() < 0.2:
            pil = pil.convert("L").convert("RGB")
        if rng.rand() < 0.5:
            sigma = rng.uniform(0.1, 2.0)
            pil = pil.filter(ImageFilter.GaussianBlur(radius=sigma))
        arr = np.array(pil)
        if rng.rand() < 0.7:
            arr = _random_erase(arr, rng, (0.05, 0.2), (0.3, 3.3), value=None)
        if rng.rand() < 0.5:
            arr = _random_erase(arr, rng, (0.02, 0.2), (0.1, 6.0), value=None)
        if rng.rand() < 0.3:
            arr = _random_erase(arr, rng, (0.02, 0.2), (0.05, 8.0), value=None)
        return arr

    return strong
