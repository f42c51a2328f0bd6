"""Cluster sorter: copy files into cluster_* dirs + purity report.

Rebuild of classifier/sorted.py:41-183, without its bug: the reference reads
the ``global_class`` key from a CSV whose header is ``global_id``
(sorted.py:47 vs main_ssl_pipeline.py:296), so purity labels were always
empty; here the real column is read.
"""

from __future__ import annotations

import json
import shutil
from collections import Counter, defaultdict
from pathlib import Path

import numpy as np
import pandas as pd

from ..clustering import evaluate_clustering
from ..utils.logging import console_step, get_file_logger

logger = get_file_logger(__name__)


def copy_files_to_clusters(df: pd.DataFrame, output_dir: str | Path,
                           copy_mode: str = "copy") -> dict[int, int]:
    """Copy/move each file into cluster_<label>/ with dedup-rename
    (sorted.py:60-72)."""
    output_dir = Path(output_dir)
    counts: dict[int, int] = defaultdict(int)
    for _, row in df.iterrows():
        src = Path(row["path"])
        if not src.exists():
            logger.warning("missing source file %s", src)
            continue
        cdir = output_dir / f"cluster_{row['cluster_label']}"
        cdir.mkdir(parents=True, exist_ok=True)
        dst = cdir / src.name
        stem, suffix = dst.stem, dst.suffix
        k = 1
        while dst.exists():
            dst = cdir / f"{stem}_{k}{suffix}"
            k += 1
        if copy_mode == "move":
            shutil.move(str(src), str(dst))
        else:
            shutil.copy2(str(src), str(dst))
        counts[int(row["cluster_label"])] += 1
    return dict(counts)


def compute_purity(df: pd.DataFrame) -> dict:
    """Majority-label purity per cluster (sorted.py:77-92), using the real
    ``global_id`` column."""
    out = {}
    for cl, group in df.groupby("cluster_label"):
        ids = Counter(group["global_id"])
        total = sum(ids.values())
        top_id, top_n = ids.most_common(1)[0]
        out[str(cl)] = {"size": total, "majority_id": str(top_id),
                        "purity": top_n / max(total, 1)}
    sizes = [v["size"] for v in out.values()]
    overall = (sum(v["purity"] * v["size"] for v in out.values())
               / max(sum(sizes), 1))
    return {"clusters": out, "overall_purity": overall}


def main(input_csv: str | Path = "save_models/id_clusters.csv",
         embeddings_npz: str | Path = "save_models/embeddings.npz",
         output_dir: str | Path = "dataset/sorted_dataset",
         copy_mode: str = "copy",
         compute_metrics: bool = True,
         report_path: str | Path = "save_models/sorted_report.json") -> dict:
    console_step("Sorting dataset into clusters")
    df = pd.read_csv(input_csv)
    counts = copy_files_to_clusters(df, output_dir, copy_mode)
    purity = compute_purity(df)

    report = {"cluster_counts": counts, "purity": purity}
    if compute_metrics and Path(embeddings_npz).exists():
        data = np.load(embeddings_npz, allow_pickle=True)
        emb = data["embeddings"]
        path_to_label = dict(zip(df["path"], df["cluster_label"]))
        labels = np.asarray([path_to_label.get(str(p), -1) for p in data["paths"]])
        ok = labels >= 0
        if ok.sum() > 1 and len(set(labels[ok])) > 1:
            report["embedding_metrics"] = evaluate_clustering(
                emb[ok], labels[ok], int(labels[ok].max()) + 1)

    report_path = Path(report_path)
    report_path.parent.mkdir(parents=True, exist_ok=True)
    with open(report_path, "w") as f:
        json.dump(report, f, indent=2)
    console_step(f"sorted_report.json written (purity "
                 f"{purity['overall_purity']:.3f})")
    return report


if __name__ == "__main__":
    main()
