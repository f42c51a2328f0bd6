"""UNet++ segmentation inference.

Rebuild of src/preprocessing/segmentation/inference.py:35-137: loads a
checkpoint, runs sigmoid>0.5 masks over a directory of grayscale images
(replicated to 3 channels, :87-93), and writes per image
``_mask / _segmented / _overlay.png`` (:128-130).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
from flax import serialization

from ..config import load_segmentation_config
from ..models.unetpp import NestedUNet
from ..utils.io import read_image_grayscale, write_image
from ..utils.logging import console_step, get_file_logger

logger = get_file_logger(__name__, "data/metadata/inference.log")


def load_model(cfg, checkpoint: str | Path):
    model = NestedUNet(filters=tuple(cfg.get("model.filters",
                                             [64, 128, 256, 512, 1024])))
    size = cfg.get("dataset.image_size", 256)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)), train=False)
    payload = serialization.from_bytes(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {}),
         "opt_state": None, "epoch": 0},
        Path(checkpoint).read_bytes())
    return model, {"params": payload["params"],
                   "batch_stats": payload["batch_stats"]}, size


def segment_images(input_dir: str | Path, output_dir: str | Path,
                   checkpoint: str | Path, config_path: str | None = None,
                   threshold: float = 0.5) -> int:
    cfg = load_segmentation_config(config_path)
    model, variables, size = load_model(cfg, checkpoint)

    @jax.jit
    def forward(x):
        return jax.nn.sigmoid(model.apply(variables, x, train=False))

    input_dir, output_dir = Path(input_dir), Path(output_dir)
    n = 0
    for p in sorted(input_dir.glob("*")):
        if p.suffix.lower() not in {".jpg", ".jpeg", ".png", ".bmp"}:
            continue
        gray = read_image_grayscale(p).astype(np.float32) / 255.0
        h, w = gray.shape
        import cv2
        resized = cv2.resize(gray, (size, size), interpolation=cv2.INTER_AREA)
        x = jnp.asarray(np.stack([resized] * 3, axis=-1)[None])
        prob = np.asarray(forward(x))[0, ..., 0]
        mask = (cv2.resize(prob, (w, h)) > threshold).astype(np.float32)

        write_image(output_dir / f"{p.stem}_mask.png", mask)
        write_image(output_dir / f"{p.stem}_segmented.png", gray * mask)
        overlay = np.stack([gray, gray, np.clip(gray + 0.4 * mask, 0, 1)], -1)
        write_image(output_dir / f"{p.stem}_overlay.png", overlay)
        logger.info("segmented %s", p.name)
        n += 1
    console_step(f"Segmented {n} images")
    return n


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--config", default=None)
    args = ap.parse_args()
    segment_images(args.input, args.output, args.checkpoint, args.config)
