"""End-to-end file-level pipeline test: images on disk → preprocessing
runner → minutiae runner → matching runner → scores + artifacts.

Uses a tiny synthetic 2-user dataset and the demo evaluation settings. This
is the stage-materialization contract of the reference (every stage reads/
writes files, SURVEY.md §1) exercised through our batched runners.
"""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _print(seed, phase=0.0, h=160, w=128):
    g = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy, cx = h / 2, w / 2
    r = np.sqrt(((yy - cy) / 1.1) ** 2 + (xx - cx) ** 2)
    ang = np.arctan2(yy - cy, xx - cx)
    ridges = 0.5 + 0.5 * np.cos(r / 4.0 + 2.0 * np.sin(3 * ang) + phase)
    blobs = np.zeros((h, w), np.float32)
    for _ in range(25):
        by, bx = g.integers(25, h - 25), g.integers(25, w - 25)
        rr = g.integers(2, 4)
        blobs[by - rr:by + rr, bx - rr:bx + rr] = 1.0
    ell = (((yy - cy) / (0.42 * h)) ** 2 + ((xx - cx) / (0.40 * w)) ** 2) < 1
    img = np.where(ell, 1.0 - 0.8 * ridges * (1 - 0.9 * blobs), 0.95)
    img = np.clip(img + g.normal(0, 0.02, (h, w)), 0, 1)
    return (img * 255).astype(np.uint8)


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    cluster = root / "sorted" / "cluster_0"
    cluster.mkdir(parents=True)
    # 2 users x 2 sessions; same seed per user = same print, phase-jittered
    for user, seed in ((1, 10), (2, 77)):
        for sess in (1, 2):
            img = _print(seed, phase=0.1 * (sess - 1))
            cv2.imwrite(str(cluster / f"{user}_1_{sess}.jpg"), img)
    return root


def test_full_file_pipeline(tiny_dataset, monkeypatch):
    monkeypatch.chdir(tiny_dataset)
    from multimodal_biometric_fingerprints_palms_tpu.preprocessing.runner import (
        run_preprocessing,
    )
    from multimodal_biometric_fingerprints_palms_tpu.features.runner import (
        process_directory,
    )
    from multimodal_biometric_fingerprints_palms_tpu.matching import runner as mrun

    stats = run_preprocessing(tiny_dataset / "sorted",
                              tiny_dataset / "processed", batch_size=4)
    assert stats["num_images"] == 4
    enhanced = list((tiny_dataset / "processed" / "enhanced").rglob("*_enhanced.jpg"))
    skeletons = list((tiny_dataset / "processed" / "enhanced").rglob("*_skeleton.jpg"))
    assert len(enhanced) == 4 and len(skeletons) == 4

    fstats = process_directory(tiny_dataset / "processed" / "enhanced",
                               tiny_dataset / "processed" / "minutiae",
                               batch_size=4)
    assert fstats["num_images"] == 4
    jsons = list((tiny_dataset / "processed" / "minutiae").rglob("*_minutiae.json"))
    assert len(jsons) == 4
    # reference-compatible JSON schema
    recs = json.loads(jsons[0].read_text())
    if recs:
        assert set(recs[0]) == {"x", "y", "type", "orientation", "quality",
                                "coherence", "angular_stability"}

    results = mrun.main(demo=True,
                        minutiae_base=str(tiny_dataset / "processed" / "minutiae"),
                        logs_dir=str(tiny_dataset / "logs"))
    assert results["num_users"] == 2
    assert results["genuine_pairs"] == 2
    assert results["impostor_pairs"] >= 1
    assert (tiny_dataset / "logs" / "minutiae_stats.csv").exists()
    assert (tiny_dataset / "logs" / "genuine_match_stats.csv").exists()
    assert (tiny_dataset / "logs" / "roc.png").exists()
    assert 0.0 <= results["eer"] <= 1.0
