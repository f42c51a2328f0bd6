"""Host-side I/O: images and minutiae JSON.

Files exist only at pipeline boundaries; the on-device dataflow is batched
tensors. The minutiae JSON schema is bit-compatible with the reference
(src/features/extract_features.py:104-105, post_processing.py:122-127):

    [{"x": int, "y": int, "type": "ending"|"bifurcation", "orientation": float,
      "quality": float, "coherence": float, "angular_stability": float}, ...]

and the (N, 7) matrix layout matches match_features.py:52-64:
    [x, y, type(0=ending/1=bifurcation), orientation, quality, coherence,
     angular_stability]
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False
    from PIL import Image


MINUTIA_TYPES = ("ending", "bifurcation")


def read_image_grayscale(path: str | Path) -> np.ndarray:
    """Read an image as a 2-D uint8 array."""
    path = str(path)
    if _HAS_CV2:
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise IOError(f"cannot read image: {path}")
        return img
    img = Image.open(path).convert("L")  # pragma: no cover
    return np.asarray(img)


def write_image(path: str | Path, img: np.ndarray) -> None:
    """Write a uint8 (or float in [0,1]) image."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0 if arr.max() <= 1.0 + 1e-6 else arr, 0, 255)
        arr = arr.astype(np.uint8)
    if _HAS_CV2:
        ok = cv2.imwrite(str(path), arr)
        if not ok:
            raise IOError(f"cannot write image: {path}")
    else:  # pragma: no cover
        Image.fromarray(arr).save(str(path))


def minutiae_to_json(xy: np.ndarray, types: np.ndarray, orientation: np.ndarray,
                     quality: np.ndarray, coherence: np.ndarray,
                     angular_stability: np.ndarray, valid: np.ndarray) -> list[dict]:
    """Convert padded fixed-K device arrays to the reference JSON records."""
    out = []
    for i in np.nonzero(np.asarray(valid))[0]:
        out.append({
            "x": int(xy[i, 0]),
            "y": int(xy[i, 1]),
            "type": MINUTIA_TYPES[int(types[i])],
            "orientation": float(orientation[i]),
            "quality": float(quality[i]),
            "coherence": float(coherence[i]),
            "angular_stability": float(angular_stability[i]),
        })
    return out


def save_minutiae_json(path: str | Path, records: list[dict]) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(records, f, indent=2)


def load_minutiae_matrix(path: str | Path) -> np.ndarray:
    """Load minutiae JSON into the reference's (N, 7) float64 matrix
    (match_features.py:52-64)."""
    with open(path) as f:
        records = json.load(f)
    if not records:
        return np.zeros((0, 7), dtype=np.float64)
    rows = []
    for r in records:
        rows.append([
            float(r["x"]), float(r["y"]),
            0.0 if r.get("type", "ending") == "ending" else 1.0,
            float(r.get("orientation", 0.0)),
            float(r.get("quality", 0.0)),
            float(r.get("coherence", 0.0)),
            float(r.get("angular_stability", 0.0)),
        ])
    return np.asarray(rows, dtype=np.float64)


def pad_minutiae(mat: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad an (N, 7) matrix to (k, 7) plus validity mask (k,).

    Fixed K keeps every matching op static-shape; the reference caps N at 60
    (post_processing.py:135) so K=64 loses nothing.
    """
    n = min(mat.shape[0], k)
    out = np.zeros((k, 7), dtype=np.float32)
    out[:n] = mat[:n]
    valid = np.zeros((k,), dtype=bool)
    valid[:n] = True
    return out, valid
