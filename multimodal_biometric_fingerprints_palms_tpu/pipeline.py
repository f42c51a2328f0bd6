"""Full-stack pipeline driver.

Chains every stage in the reference's order (SURVEY.md §1 dataflow):

  raw dataset -> SSL pipeline -> sorter -> catalog -> preprocessing ->
  minutiae extraction -> matching/evaluation

Each stage is also independently runnable as a module; this driver wires
them through the same on-disk contracts (id_clusters.csv, sorted_dataset/,
catalog.csv, enhanced/, minutiae/, logs/).
"""

from __future__ import annotations

import argparse
from pathlib import Path

from .utils.logging import console_step


def run_all(dataset_dir: str = "dataset",
            classifier_config: str | None = None,
            matching_config: str | None = None,
            train: bool = True,
            demo_matching: bool = True,
            skip_ssl: bool = False) -> dict:
    results: dict = {}

    if not skip_ssl:
        from .classifier.pipeline import main as ssl_main
        from .classifier.sorter import main as sorter_main
        from .catalog.verify import check_id_consistency

        results["ssl"] = ssl_main(classifier_config, train=train)
        csv_path = results["ssl"]["csv_path"]
        consistency = check_id_consistency(csv_path)
        results["id_consistency"] = consistency
        if not consistency["ok"]:
            console_step(f"WARNING: id consistency violations: "
                         f"{len(consistency['violations'])}")
        results["sorter"] = sorter_main(input_csv=csv_path)

    from .catalog.catalog import main as catalog_main
    results["catalog_rows"] = len(catalog_main(
        str(Path(dataset_dir) / "sorted_dataset"),
        "data/metadata/catalog.csv"))

    from .preprocessing.runner import run_preprocessing
    results["preprocessing"] = run_preprocessing(
        Path(dataset_dir) / "sorted_dataset",
        Path(dataset_dir) / "processed")

    from .features.runner import process_directory
    results["features"] = process_directory(
        Path(dataset_dir) / "processed" / "enhanced",
        Path(dataset_dir) / "processed" / "minutiae")

    from .matching.runner import main as match_main
    results["matching"] = match_main(
        matching_config, demo=demo_matching,
        minutiae_base=str(Path(dataset_dir) / "processed" / "minutiae"))

    console_step("Pipeline complete")
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description="Run the full pipeline")
    ap.add_argument("--dataset", default="dataset")
    ap.add_argument("--skip-ssl", action="store_true",
                    help="start from an existing sorted_dataset")
    ap.add_argument("--no-train", action="store_true")
    ap.add_argument("--full-matching", action="store_true")
    args = ap.parse_args()
    run_all(args.dataset, train=not args.no_train,
            demo_matching=not args.full_matching, skip_ssl=args.skip_ssl)
