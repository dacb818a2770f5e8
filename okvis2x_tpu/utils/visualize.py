"""Debug visualisations: keypoint/match overlays + top-view trajectory.

PIL-based counterpart of the reference's `ViVisualizer` (keypoint/match
debug images) and `TrajectoryOutput`'s top-view plot — written as PNGs
instead of GUI windows (headless environments).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def _to_rgb(img: np.ndarray) -> np.ndarray:
    g = np.clip(np.asarray(img) * 255, 0, 255).astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


def draw_keypoints(
    img: np.ndarray,
    uv: np.ndarray,
    valid: Optional[np.ndarray] = None,
    matched: Optional[np.ndarray] = None,
    radius: int = 2,
) -> np.ndarray:
    """Overlay keypoints: green = matched to map, yellow = unmatched."""
    rgb = _to_rgb(img)
    H, W = rgb.shape[:2]
    n = len(uv)
    valid = np.ones(n, bool) if valid is None else valid
    matched = np.zeros(n, bool) if matched is None else matched
    for i in np.nonzero(valid)[0]:
        x, y = int(round(uv[i, 0])), int(round(uv[i, 1]))
        if not (radius <= x < W - radius and radius <= y < H - radius):
            continue
        color = (0, 220, 0) if matched[i] else (230, 200, 0)
        rgb[y - radius : y + radius + 1, x - radius : x + radius + 1] = color
        rgb[y, x] = (255, 255, 255)
    return rgb


def draw_matches(
    img_a: np.ndarray, uv_a: np.ndarray,
    img_b: np.ndarray, uv_b: np.ndarray,
    pairs: np.ndarray,  # (M, 2) indices
) -> np.ndarray:
    """Side-by-side match visualisation with connecting lines."""
    ra, rb = _to_rgb(img_a), _to_rgb(img_b)
    H = max(ra.shape[0], rb.shape[0])
    W = ra.shape[1] + rb.shape[1]
    canvas = np.zeros((H, W, 3), np.uint8)
    canvas[: ra.shape[0], : ra.shape[1]] = ra
    canvas[: rb.shape[0], ra.shape[1] :] = rb
    off = ra.shape[1]
    for ia, ib in pairs:
        x0, y0 = uv_a[ia]
        x1, y1 = uv_b[ib]
        x1 = x1 + off
        n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
        xs = np.linspace(x0, x1, n).astype(int)
        ys = np.linspace(y0, y1, n).astype(int)
        ok = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
        canvas[ys[ok], xs[ok]] = (0, 200, 60)
    return canvas


def top_view(
    trajectory: np.ndarray,  # (N, >=3) positions
    landmarks: Optional[np.ndarray] = None,  # (L, 3)
    size: int = 600,
    margin: float = 1.0,
) -> np.ndarray:
    """Top-view (x-y) plot of the trajectory (+ landmarks) as an RGB image."""
    img = np.full((size, size, 3), 20, np.uint8)
    pts = [trajectory[:, :2]]
    if landmarks is not None and len(landmarks):
        pts.append(landmarks[:, :2])
    allp = np.concatenate(pts)
    lo = allp.min(0) - margin
    hi = allp.max(0) + margin
    scale = (size - 1) / max(float((hi - lo).max()), 1e-6)

    def to_px(p):
        q = (p - lo) * scale
        return np.clip(q.astype(int), 0, size - 1)

    if landmarks is not None and len(landmarks):
        px = to_px(landmarks[:, :2])
        img[size - 1 - px[:, 1], px[:, 0]] = (90, 90, 90)
    px = to_px(trajectory[:, :2])
    for (x0, y0), (x1, y1) in zip(px[:-1], px[1:]):
        n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
        xs = np.linspace(x0, x1, n).astype(int)
        ys = np.linspace(y0, y1, n).astype(int)
        img[size - 1 - ys, xs] = (0, 220, 60)
    # start marker
    img[size - 1 - px[0, 1], px[0, 0]] = (255, 60, 60)
    return img


def save_png(path: str, rgb: np.ndarray):
    from PIL import Image

    Image.fromarray(rgb).save(path)
