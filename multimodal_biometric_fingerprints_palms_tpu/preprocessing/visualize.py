"""Orientation field visualization (host-side debug overlay).

Rebuild of src/preprocessing/orientation.py:87-130: per-block line overlay
gated by mask and reliability, alpha-blended over the grayscale image.
Debug-only, so it runs host-side in numpy.
"""

from __future__ import annotations

import numpy as np


def visualize_orientation(img: np.ndarray, orient_img: np.ndarray,
                          reliability_img: np.ndarray | None = None,
                          block_size: int = 16, scale: int = 8,
                          rel_thresh: float = 0.2,
                          mask: np.ndarray | None = None,
                          color=(255, 0, 0)) -> np.ndarray:
    """Returns an RGB uint8 overlay. img in [0,1] or uint8."""
    import cv2

    g = np.asarray(img)
    if g.dtype != np.uint8:
        g = np.clip(g * 255.0 if g.max() <= 1.0 + 1e-6 else g, 0, 255)
        g = g.astype(np.uint8)
    vis = cv2.cvtColor(g, cv2.COLOR_GRAY2BGR)

    h, w = np.asarray(orient_img).shape
    half = block_size // 2
    for by in range(h // block_size):
        for bx in range(w // block_size):
            cy = by * block_size + half
            cx = bx * block_size + half
            if cy >= h or cx >= w:
                continue
            if mask is not None and not mask[cy, cx]:
                continue
            if (reliability_img is not None
                    and reliability_img[cy, cx] < rel_thresh):
                continue
            angle = float(orient_img[cy, cx])
            dx = int(round(scale * np.cos(angle)))
            dy = int(round(scale * np.sin(angle)))
            x1, y1 = max(0, cx - dx), max(0, cy - dy)
            x2, y2 = min(w - 1, cx + dx), min(h - 1, cy + dy)
            cv2.line(vis, (x1, y1), (x2, y2), color[::-1], 1, cv2.LINE_AA)

    base = cv2.cvtColor(g, cv2.COLOR_GRAY2BGR)
    overlay = cv2.addWeighted(vis, 0.8, base, 0.2, 0)
    return cv2.cvtColor(overlay, cv2.COLOR_BGR2RGB)
