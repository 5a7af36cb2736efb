"""Host-side mask point samplers (graph-node seeding from binary masks).

Capability of reference ``adapteacher/data/node_sampling.py:7-158``: sample
(x, y) points from instance masks three ways — uniformly along the boundary
contour (optionally nudged inward), on a regular interior grid, and on a ring
around the mask centroid.  The reference calls these only from commented-out
mapper code (``dataset_mapper.py:165-175``); here they are a supported data
utility so the mapper *can* seed graph nodes from GT masks.

Pure NumPy/SciPy — these run on the host inside the input pipeline, never on
the TPU, so there is no JAX here by design.  cv2 is used for contour tracing
when available, with a morphological fallback.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

from ttdg_mgm_tpu.utils.rle import polygons_to_mask

try:  # optional: ordered contours beat the unordered erosion fallback
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in the target image
    cv2 = None


def boundary_points(mask: np.ndarray) -> np.ndarray:
    """Ordered (x, y) int points on the outer boundary of a binary mask.

    Returns an ``(N, 2)`` array; empty ``(0, 2)`` if the mask is empty.
    """
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    if not mask.any():
        return np.zeros((0, 2), np.int64)
    if cv2 is not None:
        contours, _ = cv2.findContours(
            mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE
        )
        if not contours:
            return np.zeros((0, 2), np.int64)
        return np.vstack([c.reshape(-1, 2) for c in contours]).astype(np.int64)
    # fallback: boundary = mask minus its erosion (unordered but complete)
    inner = ndimage.binary_erosion(mask.astype(bool))
    ys, xs = np.nonzero(mask.astype(bool) & ~inner)
    return np.stack([xs, ys], axis=1).astype(np.int64)


def sample_boundary(
    mask: np.ndarray,
    num_samples: int = 10,
    inward_offset: float = 0.0,
    uniform: bool = True,
    rng: np.random.Generator | None = None,
) -> list[tuple[int, int]]:
    """Sample points on (or just inside) the mask boundary.

    ``uniform=True`` spaces samples evenly along the contour (reference
    ``boundary_sampling_in_mask_uni``); ``uniform=False`` draws them at
    random without replacement (``boundary_sampling_in_mask``).
    ``inward_offset`` moves each point toward the mask center by that many
    pixels along the center-to-point direction.
    """
    pts = boundary_points(mask)
    if len(pts) == 0:
        return []
    h, w = mask.shape
    pts = pts.astype(np.float64)
    if inward_offset:
        center = np.asarray([w // 2, h // 2], np.float64)
        d = pts - center
        norm = np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
        pts = pts - inward_offset * d / norm
        pts = np.clip(pts, 0, [w - 1, h - 1])
    if uniform:
        idx = np.linspace(0, len(pts) - 1, num_samples).astype(np.int64)
    else:
        rng = rng or np.random.default_rng()
        idx = rng.choice(len(pts), size=min(num_samples, len(pts)), replace=False)
    return [(int(x), int(y)) for x, y in pts[idx]]


def sample_grid(mask: np.ndarray, grid_size: int = 20) -> list[tuple[int, int]]:
    """Regular-grid interior samples: lattice points that fall inside the mask."""
    h, w = mask.shape
    gx, gy = np.meshgrid(np.arange(0, w, grid_size), np.arange(0, h, grid_size))
    gx, gy = gx.ravel(), gy.ravel()
    inside = mask[gy, gx].astype(bool)
    return [(int(x), int(y)) for x, y in zip(gx[inside], gy[inside])]


def sample_centroid_ring(
    mask: np.ndarray, num_samples: int = 10, radius: float = 10.0
) -> list[tuple[int, int]]:
    """Points on a ring of ``radius`` around the mask centroid, kept only if
    they land inside both the image and the mask."""
    m = mask.astype(np.float64)
    total = m.sum()
    if total == 0:
        return []
    ys, xs = np.nonzero(m)
    cx = float((xs * m[ys, xs]).sum() / total)
    cy = float((ys * m[ys, xs]).sum() / total)
    h, w = mask.shape
    out = []
    for i in range(num_samples):
        ang = 2.0 * np.pi * i / num_samples
        x = int(cx + radius * np.cos(ang))
        y = int(cy + radius * np.sin(ang))
        if 0 <= x < w and 0 <= y < h and mask[y, x]:
            out.append((x, y))
    return out


def sample_polygon_instances(
    polygon_masks,
    image_height: int,
    image_width: int,
    num_boundary: int = 10,
    num_centroid: int = 5,
    centroid_radius: float = 10.0,
):
    """Per-instance boundary + centroid-ring samples over a list of polygon
    instances (reference ``process_polygon_masks``).  Returns
    ``(boundary_samples, centroid_samples)`` flat lists of (x, y)."""
    all_boundary, all_centroid = [], []
    for polys in polygon_masks:
        m = polygons_to_mask(polys, image_height, image_width)
        all_boundary.extend(sample_boundary(m, num_samples=num_boundary))
        all_centroid.extend(
            sample_centroid_ring(m, num_samples=num_centroid, radius=centroid_radius)
        )
    return all_boundary, all_centroid
