"""End-to-end SSL classifier pipeline test: images → embeddings →
clustering → id_clusters.csv → sorter → sorted cluster dirs + purity."""

import numpy as np
import pandas as pd
import pytest
import yaml

cv2 = pytest.importorskip("cv2")


@pytest.fixture()
def classifier_setup(tmp_path):
    # Two visually distinct "subjects" x 4 images each, in DBII layout.
    d = tmp_path / "dataset" / "DBII"
    d.mkdir(parents=True)
    g = np.random.default_rng(0)
    for sub in (1, 2):
        for sess in range(1, 5):
            img = np.zeros((64, 64), np.uint8)
            if sub == 1:
                img[::4] = 255          # horizontal stripes
            else:
                img[:, ::4] = 255       # vertical stripes
            noise = (g.random((64, 64)) * 40).astype(np.uint8)
            cv2.imwrite(str(d / f"{sub}_1_{sess}.jpg"),
                        np.clip(img + noise, 0, 255).astype(np.uint8))

    cfg = {
        "paths": {
            "root_dir": str(tmp_path),
            "dataset_dir": str(tmp_path / "dataset"),
            "save_dir": str(tmp_path / "save_models"),
            "figures_dir": str(tmp_path / "results"),
            "sorted_dir": str(tmp_path / "dataset" / "sorted_dataset"),
        },
        "ssl": {
            "dataset": {"batch_size": 4, "num_workers": 0, "seed": 0,
                        "image_size": 64},
            "model": {"backbone": "effnetv2_tiny", "embedding_dim": 32,
                      "projection_hidden_dim": 32, "projection_dim": 16,
                      "projection_layers": 2, "freeze_backbone": False,
                      "use_predictor": True},
            "training": {"epochs": 1, "lr": 1.0e-3, "temperature": 0.5,
                         "weight_decay": 1.0e-5, "grad_clip": 1.0,
                         "warmup_epochs": 1, "save_every": 0,
                         "early_stop_patience": 5},
            "clustering": {"n_clusters": 2, "min_cluster_size": 1,
                           "metric": "cosine", "pca_dim": 0},
            "logging": {"log_every": 10},
            "visualization": {"method": "pca", "max_points": 100},
        },
        "sorted": {},
    }
    cfg_path = tmp_path / "classifier.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return tmp_path, cfg_path


def test_ssl_pipeline_and_sorter(classifier_setup):
    tmp_path, cfg_path = classifier_setup
    from multimodal_biometric_fingerprints_palms_tpu.classifier.pipeline import main
    from multimodal_biometric_fingerprints_palms_tpu.classifier.sorter import (
        main as sorter_main,
    )
    from multimodal_biometric_fingerprints_palms_tpu.catalog import (
        check_id_consistency,
    )

    result = main(str(cfg_path))
    assert result["num_images"] == 8
    assert result["num_ids"] == 2

    csv_path = tmp_path / "save_models" / "id_clusters.csv"
    df = pd.read_csv(csv_path)
    assert list(df.columns) == ["filename", "path", "global_id", "cluster_label"]
    assert len(df) == 8
    assert set(df["global_id"]) == {"DBII_1", "DBII_2"}
    # each image of the same subject gets the same cluster (ID-level labels)
    assert df.groupby("global_id")["cluster_label"].nunique().max() == 1

    # verify.py equivalent passes
    assert check_id_consistency(csv_path)["ok"]

    # embeddings cache exists and reloads
    emb_file = tmp_path / "save_models" / "embeddings.npz"
    assert emb_file.exists()

    report = sorter_main(
        input_csv=csv_path,
        embeddings_npz=emb_file,
        output_dir=tmp_path / "dataset" / "sorted_dataset",
        report_path=tmp_path / "save_models" / "sorted_report.json")
    clusters = list((tmp_path / "dataset" / "sorted_dataset").glob("cluster_*"))
    assert len(clusters) >= 1
    total = sum(len(list(c.glob("*.jpg"))) for c in clusters)
    assert total == 8
    assert 0.0 <= report["purity"]["overall_purity"] <= 1.0
