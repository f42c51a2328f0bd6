"""Catalog builder.

Walks a sorted dataset (``cluster_*`` directories) and writes the catalog CSV
with the exact column schema of the reference
(src/catalog/prepare_catalog.py:95-105, :147-150):

    image_id,subject_id,finger_id,session_id,cluster_name,path,width,height,format
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd

from ..utils.io import read_image_grayscale
from ..utils.logging import console_step, get_file_logger
from .parse import parse_filename

CATALOG_COLUMNS = [
    "image_id", "subject_id", "finger_id", "session_id",
    "cluster_name", "path", "width", "height", "format",
]

_IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff"}

logger = get_file_logger(__name__)


def scan_cluster(cluster_dir: Path, cluster_name: str) -> list[dict]:
    """Scan one cluster directory into catalog records."""
    records = []
    for path in sorted(cluster_dir.iterdir()):
        if not path.is_file() or path.suffix.lower() not in _IMAGE_EXTS:
            continue
        parsed = parse_filename(path.name)
        if parsed is None:
            logger.warning("unrecognized filename %s, skipped", path.name)
            continue
        subject_id, finger_id, session_id = parsed
        try:
            img = read_image_grayscale(path)
            height, width = img.shape[:2]
        except Exception as e:  # unreadable image: log and skip (ref :85-92)
            logger.warning("unreadable image %s: %s", path, e)
            continue
        records.append({
            "image_id": path.stem,
            "subject_id": subject_id,
            "finger_id": finger_id,
            "session_id": session_id,
            "cluster_name": cluster_name,
            "path": str(path),
            "width": width,
            "height": height,
            "format": path.suffix.lower().lstrip("."),
        })
    return records


def scan_dataset(sorted_dataset_dir: str | Path) -> pd.DataFrame:
    """Scan every ``cluster_*`` directory (reference: prepare_catalog.py:114-133)."""
    base = Path(sorted_dataset_dir)
    records: list[dict] = []
    for cluster_dir in sorted(base.glob("cluster_*")):
        if cluster_dir.is_dir():
            records.extend(scan_cluster(cluster_dir, cluster_dir.name))
    return pd.DataFrame(records, columns=CATALOG_COLUMNS)


def save_catalog(df: pd.DataFrame, out_csv: str | Path) -> Path:
    """Sort and write the catalog CSV (reference: prepare_catalog.py:139-176)."""
    out_csv = Path(out_csv)
    out_csv.parent.mkdir(parents=True, exist_ok=True)
    df = df.sort_values(
        ["cluster_name", "subject_id", "finger_id", "session_id"]
    ).reset_index(drop=True)
    df.to_csv(out_csv, index=False)
    return out_csv


def main(sorted_dataset_dir: str = "dataset/sorted_dataset",
         out_csv: str = "data/metadata/catalog.csv") -> pd.DataFrame:
    console_step("Building catalog")
    df = scan_dataset(sorted_dataset_dir)
    save_catalog(df, out_csv)
    console_step(f"Catalog written: {out_csv} ({len(df)} images)")
    return df


if __name__ == "__main__":
    main()
