"""Smoke tests for the SSL and segmentation training loops (tiny models)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from multimodal_biometric_fingerprints_palms_tpu.models import SSLModel
from multimodal_biometric_fingerprints_palms_tpu.train.ssl_train import (
    train_ssl, load_checkpoint, init_ssl_state,
)


def _tiny_prints(tmp_path, n=8, size=64):
    d = tmp_path / "DBII"
    d.mkdir(parents=True, exist_ok=True)
    g = np.random.default_rng(0)
    paths = []
    for i in range(n):
        img = (g.random((size, size)) * 255).astype(np.uint8)
        p = d / f"{i + 1}_1_1.jpg"
        cv2.imwrite(str(p), img)
        paths.append(p)
    return paths


def test_ssl_train_smoke(tmp_path):
    paths = _tiny_prints(tmp_path)
    model = SSLModel(backbone_name="effnetv2_tiny", embedding_dim=32,
                     proj_hidden_dim=32, proj_output_dim=16)

    from multimodal_biometric_fingerprints_palms_tpu.classifier.data import (
        two_view_batches,
    )

    def batches():
        return two_view_batches(paths, batch_size=4, image_size=64, seed=0)

    state, history = train_ssl(
        model, batches, steps_per_epoch=2, epochs=2, lr=1e-3,
        warmup_epochs=1, input_shape=(64, 64),
        save_dir=tmp_path / "save", early_stop_patience=5, save_every=0)
    assert len(history) == 2
    assert all(np.isfinite(h) for h in history)
    assert (tmp_path / "save" / "ssl_model_final.msgpack").exists()
    assert (tmp_path / "save" / "ssl_best.msgpack").exists()

    # checkpoint round-trips
    import optax
    template_state = init_ssl_state(model, jax.random.PRNGKey(0), (64, 64),
                                    optax.identity())
    payload = load_checkpoint(tmp_path / "save" / "ssl_model_final.msgpack",
                              {"params": template_state.params,
                               "batch_stats": template_state.batch_stats,
                               "step": 0})
    x = jnp.asarray(np.random.default_rng(1).random((2, 64, 64), np.float32))
    out = model.apply({"params": payload["params"],
                       "batch_stats": payload["batch_stats"]}, x, train=False)
    assert out.shape == (2, 16)


def test_seg_train_smoke(tmp_path, monkeypatch):
    # tiny image/mask pairs in the expected layout
    img_dir = tmp_path / "DBII"
    mask_dir = tmp_path / "debug" / "c0" / "mask"
    img_dir.mkdir(parents=True)
    mask_dir.mkdir(parents=True)
    g = np.random.default_rng(0)
    for i in range(6):
        name = f"{i + 1}_1_1.jpg"
        cv2.imwrite(str(img_dir / name), (g.random((64, 64)) * 255).astype(np.uint8))
        mask = np.zeros((64, 64), np.uint8)
        mask[16:48, 16:48] = 255
        cv2.imwrite(str(mask_dir / name), mask)

    import yaml
    cfg = {
        "experiment": {"seed": 0},
        "dataset": {"images_dir": str(img_dir), "masks_dir": str(tmp_path / "debug"),
                    "image_size": 64, "batch_size": 2, "val_split": 0.34},
        "model": {"filters": [4, 8, 12, 16, 20]},
        "training": {"epochs": 2, "grad_clip": 1.0,
                     "checkpoint_dir": str(tmp_path / "ckpt"),
                     "early_stop_patience": 5},
        "optimizer": {"lr": 1e-3, "weight_decay": 1e-4},
        "scheduler": {"factor": 0.5, "patience": 2},
        "loss": {"bce_weight": 0.7,
                 "focal_tversky": {"alpha": 0.7, "beta": 0.3, "gamma": 0.75}},
        "augmentation": {"hflip_prob": 0.5},
        "misc": {"resume_from_checkpoint": None},
    }
    cfg_path = tmp_path / "seg.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    from multimodal_biometric_fingerprints_palms_tpu.train.seg_train import (
        train_from_config,
    )
    result = train_from_config(str(cfg_path))
    assert result["best_dice"] > 0.3         # big centered square is learnable
    assert (tmp_path / "ckpt" / "best.msgpack").exists()
    assert (tmp_path / "ckpt" / "last.msgpack").exists()
    assert len(result["history"]) == 2
    # training-curve CSV artifact (reference train.py:237-243 observability)
    import csv
    with open(result["curves_csv"]) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2 and "val_dice" in rows[0]


def test_seg_train_onecycle(tmp_path):
    """OneCycle scheduler option (reference train.py:210-226)."""
    img_dir = tmp_path / "DBII"
    mask_dir = tmp_path / "debug" / "c0" / "mask"
    img_dir.mkdir(parents=True)
    mask_dir.mkdir(parents=True)
    g = np.random.default_rng(0)
    for i in range(4):
        name = f"{i + 1}_1_1.jpg"
        cv2.imwrite(str(img_dir / name), (g.random((64, 64)) * 255).astype(np.uint8))
        mask = np.zeros((64, 64), np.uint8)
        mask[16:48, 16:48] = 255
        cv2.imwrite(str(mask_dir / name), mask)

    import yaml
    cfg = {
        "experiment": {"seed": 0},
        "dataset": {"images_dir": str(img_dir), "masks_dir": str(tmp_path / "debug"),
                    "image_size": 64, "batch_size": 2, "val_split": 0.3},
        "model": {"filters": [4, 8, 12, 16, 20]},
        "training": {"epochs": 2, "grad_clip": 1.0,
                     "checkpoint_dir": str(tmp_path / "ckpt"),
                     "early_stop_patience": 5},
        "optimizer": {"lr": 1e-3, "weight_decay": 1e-4},
        "scheduler": {"type": "onecycle", "pct_start": 0.3},
        "loss": {"bce_weight": 0.7,
                 "focal_tversky": {"alpha": 0.7, "beta": 0.3, "gamma": 0.75}},
        "misc": {"resume_from_checkpoint": None},
    }
    cfg_path = tmp_path / "seg.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    from multimodal_biometric_fingerprints_palms_tpu.train.seg_train import (
        train_from_config,
    )
    result = train_from_config(str(cfg_path))
    assert len(result["history"]) == 2
    assert all(np.isfinite(h["loss"]) for h in result["history"])
