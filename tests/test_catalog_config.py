"""Tests for filename parsing, catalog CSV schema, verify, and configs."""

import numpy as np
import pandas as pd
import pytest

from multimodal_biometric_fingerprints_palms_tpu.catalog import (
    parse_filename, scan_dataset, save_catalog, CATALOG_COLUMNS,
    check_id_consistency,
)
from multimodal_biometric_fingerprints_palms_tpu.classifier.data import extract_id
from multimodal_biometric_fingerprints_palms_tpu.config import (
    load_fingerprint_config, load_matching_config, load_classifier_config,
    load_segmentation_config,
)


def test_parse_filename_patterns():
    assert parse_filename("12_3_4.jpg") == (12, 3, 4)
    assert parse_filename("F0001_2.bmp") == (1, 2, 1)
    assert parse_filename("S0042_7.png") == (42, 7, 1)
    assert parse_filename("readme.txt") is None
    assert parse_filename("notaprint.jpg") is None


def test_extract_id_reference_semantics():
    # main_ssl_pipeline.py:49-68
    assert extract_id("1_1_1.jpg") == "1"
    assert extract_id("F0001_01.bmp") == "1"
    assert extract_id("007_2_1.jpg") == "7"


def test_catalog_schema(tmp_path):
    import cv2
    d = tmp_path / "sorted" / "cluster_0"
    d.mkdir(parents=True)
    img = np.zeros((32, 24), np.uint8)
    cv2.imwrite(str(d / "1_2_3.jpg"), img)
    cv2.imwrite(str(d / "F0009_1.bmp"), img)
    df = scan_dataset(tmp_path / "sorted")
    assert list(df.columns) == CATALOG_COLUMNS
    assert len(df) == 2
    assert set(df["width"]) == {24} and set(df["height"]) == {32}
    out = save_catalog(df, tmp_path / "catalog.csv")
    reloaded = pd.read_csv(out)
    assert list(reloaded.columns) == CATALOG_COLUMNS


def test_check_id_consistency(tmp_path):
    good = pd.DataFrame({
        "filename": ["1_1_1.jpg", "1_1_2.jpg", "2_1_1.jpg"],
        "global_id": ["DBII_1", "DBII_1", "DBII_2"],
    })
    good.to_csv(tmp_path / "good.csv", index=False)
    assert check_id_consistency(tmp_path / "good.csv")["ok"]

    bad = pd.DataFrame({
        "filename": ["1_1_1.jpg", "1_1_2.jpg"],
        "global_id": ["DBII_1", "DBII_9"],
    })
    bad.to_csv(tmp_path / "bad.csv", index=False)
    res = check_id_consistency(tmp_path / "bad.csv")
    assert not res["ok"] and "1" in res["violations"]


def test_configs_load_with_live_nested_keys():
    fp = load_fingerprint_config()
    assert fp.binarization.sauvola_window == 25
    assert fp.get("orientation.block_size") == 16

    m = load_matching_config()
    # the keys that were dead in the reference resolve here
    assert m.get("ransac.max_iterations") == 300
    assert m.get("matching.max_distance") == 10.0
    assert m.get("evaluation.demo.ransac_iterations") == 50

    c = load_classifier_config()
    assert c.ssl.model.embedding_dim == 756
    assert c.ssl.training.temperature == 0.5

    s = load_segmentation_config()
    assert s.get("loss.focal_tversky.alpha") == 0.7
    assert s.get("optimizer.lr") == pytest.approx(1.5e-4)
