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


def test_ssl_pipeline_clustering_quality_gate(tmp_path):
    """Measured from-scratch quality gate (VERDICT: the reference freezes a
    pretrained timm backbone; ours trains from scratch, so clustering
    quality must be asserted, not assumed): on a structured synthetic set
    of 4 visually distinct subjects, the pipeline's id_clusters must reach
    a purity floor and positive silhouette."""
    import yaml
    d = tmp_path / "dataset" / "DBII"
    d.mkdir(parents=True)
    g = np.random.default_rng(1)
    # Patterns must differ in rotation-INVARIANT ways: the two-view SSL
    # augmentations rotate, so orientation-only differences collapse.
    yy, xx = np.mgrid[0:64, 0:64]
    rr = np.sqrt((yy - 32.0) ** 2 + (xx - 32.0) ** 2)
    bases = {
        1: ((rr % 6) < 3) * 255,                        # fine rings
        2: ((rr % 16) < 8) * 255,                       # coarse rings
        3: ((((yy // 4) + (xx // 4)) % 2) == 0) * 255,  # fine checker
        4: (rr < 16) * 255,                             # central disc
    }
    for sub, base in bases.items():
        for sess in range(1, 7):
            noise = g.normal(0, 25, (64, 64))
            img = np.clip(base + noise, 0, 255).astype(np.uint8)
            cv2.imwrite(str(d / f"{sub}_1_{sess}.jpg"), img)

    cfg = {
        "paths": {
            "root_dir": str(tmp_path),
            "dataset_dir": str(tmp_path / "dataset"),
            "save_dir": str(tmp_path / "save_models"),
            "figures_dir": str(tmp_path / "results"),
            "sorted_dir": str(tmp_path / "dataset" / "sorted_dataset"),
        },
        "ssl": {
            "dataset": {"batch_size": 8, "num_workers": 0, "seed": 0,
                        "image_size": 64},
            "model": {"backbone": "effnetv2_tiny", "embedding_dim": 48,
                      "projection_hidden_dim": 48, "projection_dim": 24,
                      "projection_layers": 2, "freeze_backbone": False,
                      "use_predictor": True},
            # low lr: 4 users x 6 images is an extreme small-data regime
            # for NT-Xent (in-batch negatives are mostly same-user); the
            # gate measures the pipeline + from-scratch features, not
            # large-scale SSL convergence
            "training": {"epochs": 2, "lr": 1.0e-4, "temperature": 0.5,
                         "weight_decay": 1.0e-5, "grad_clip": 1.0,
                         "warmup_epochs": 1, "save_every": 0,
                         "early_stop_patience": 8},
            "clustering": {"n_clusters": 4, "min_cluster_size": 1,
                           "metric": "cosine", "pca_dim": 0},
            "logging": {"log_every": 10},
            "visualization": {"method": "pca", "max_points": 100},
        },
        "sorted": {},
    }
    cfg_path = tmp_path / "classifier.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    from multimodal_biometric_fingerprints_palms_tpu.classifier.pipeline import main
    from multimodal_biometric_fingerprints_palms_tpu.classifier.sorter import (
        main as sorter_main,
    )
    result = main(str(cfg_path))
    assert result["num_ids"] == 4

    csv_path = tmp_path / "save_models" / "id_clusters.csv"
    report = sorter_main(
        input_csv=csv_path,
        embeddings_npz=tmp_path / "save_models" / "embeddings.npz",
        output_dir=tmp_path / "dataset" / "sorted_dataset",
        report_path=tmp_path / "save_models" / "sorted_report.json")

    # The quality gate: a regression in the from-scratch backbone or the
    # clustering stack fails these floors.
    assert report["purity"]["overall_purity"] >= 0.7, report["purity"]
    assert report["embedding_metrics"]["silhouette_cosine"] > 0.0, (
        report["embedding_metrics"])


def test_device_augment_views():
    """augment_device renders valid, random, in-range views and the
    device-resident trainer takes a full step (classifier/dataset2/
    dataset.py:13-59 semantics, on-chip)."""
    import jax
    import jax.numpy as jnp
    from multimodal_biometric_fingerprints_palms_tpu.classifier.augment_device import (
        augment_batch)

    g = np.random.default_rng(0)
    x = jnp.asarray(g.uniform(size=(4, 80, 64)).astype(np.float32))
    f = jax.jit(lambda x, r: augment_batch(x, r, 48))
    v1 = f(x, jax.random.PRNGKey(0))
    v2 = f(x, jax.random.PRNGKey(1))
    assert v1.shape == (4, 48, 48)
    assert float(v1.min()) >= 0.0 and float(v1.max()) <= 1.0
    # different rngs -> different views; same rng -> deterministic
    assert float(jnp.abs(v1 - v2).mean()) > 1e-3
    assert float(jnp.abs(v1 - f(x, jax.random.PRNGKey(0))).max()) == 0.0
    # views keep image content (not constant / not pure noise): correlation
    # of two views of the SAME image beats cross-image correlation on
    # structured inputs
    stripes = np.zeros((2, 80, 64), np.float32)
    stripes[0, ::4] = 1.0
    stripes[1, :, ::4] = 1.0
    s = jnp.asarray(stripes)
    a = f(s, jax.random.PRNGKey(2))
    b = f(s, jax.random.PRNGKey(3))
    def corr(u, v):
        u = u - u.mean(); v = v - v.mean()
        return float((u * v).mean() / (u.std() * v.std() + 1e-9))
    same = corr(np.asarray(a[0]), np.asarray(b[0]))
    cross = corr(np.asarray(a[0]), np.asarray(b[1]))
    assert same > cross


def test_train_ssl_device_step(tmp_path):
    """One-epoch device-resident training runs and checkpoints."""
    from multimodal_biometric_fingerprints_palms_tpu.classifier.pipeline import (
        build_model)
    from multimodal_biometric_fingerprints_palms_tpu.train.ssl_train import (
        train_ssl_device)

    from multimodal_biometric_fingerprints_palms_tpu.config.loader import (
        ConfigNode)
    cfg = ConfigNode({"ssl": {"model": {
        "backbone": "effnetv2_tiny", "embedding_dim": 32,
        "projection_hidden_dim": 32, "projection_dim": 16,
        "projection_layers": 2, "freeze_backbone": False,
        "use_predictor": True}}})
    model = build_model(cfg)
    g = np.random.default_rng(0)
    data = (g.uniform(size=(8, 80, 64)) * 255).astype(np.uint8)
    state, hist = train_ssl_device(
        model, data, batch_size=4, epochs=1, lr=1e-3, warmup_epochs=1,
        image_size=48, save_dir=tmp_path)
    assert len(hist) == 1 and np.isfinite(hist[0])
    assert (tmp_path / "ssl_model_final.msgpack").exists()
