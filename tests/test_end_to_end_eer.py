"""The definitive end-to-end correctness test: PolyU-sized synthetic prints
through the file pipeline (preprocess → minutiae → matching) must separate
genuine from impostor pairs perfectly under the full protocol (min_inliers
6/12, as in the reference's full mode, match_features.py:102-109)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _print(seed, phase=0.0, h=320, w=256):
    g = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = np.sqrt(((yy - h / 2) / 1.1) ** 2 + (xx - w / 2) ** 2)
    ang = np.arctan2(yy - h / 2, xx - w / 2)
    ridges = 0.5 + 0.5 * np.cos(r / 4.5 + 2.0 * np.sin(3 * ang) + phase)
    blobs = np.zeros((h, w), np.float32)
    for _ in range(60):
        by, bx = g.integers(40, h - 40), g.integers(40, w - 40)
        rr = g.integers(2, 5)
        blobs[by - rr:by + rr, bx - rr:bx + rr] = 1.0
    ell = (((yy - h / 2) / (0.42 * h)) ** 2 + ((xx - w / 2) / (0.40 * w)) ** 2) < 1
    img = np.where(ell, 1.0 - 0.8 * ridges * (1 - 0.9 * blobs), 0.95)
    return (np.clip(img + g.normal(0, 0.02, (h, w)), 0, 1) * 255).astype(np.uint8)


@pytest.mark.slow
def test_full_protocol_eer_zero(tmp_path, monkeypatch):
    cluster = tmp_path / "sorted" / "cluster_0"
    cluster.mkdir(parents=True)
    for user, seed in ((1, 10), (2, 77)):
        for sess in (1, 2):
            cv2.imwrite(str(cluster / f"{user}_1_{sess}.jpg"),
                        _print(seed, 0.12 * (sess - 1)))
    monkeypatch.chdir(tmp_path)

    from multimodal_biometric_fingerprints_palms_tpu.preprocessing.runner import (
        run_preprocessing,
    )
    from multimodal_biometric_fingerprints_palms_tpu.features.runner import (
        process_directory,
    )
    from multimodal_biometric_fingerprints_palms_tpu.matching import runner as mrun

    run_preprocessing(tmp_path / "sorted", tmp_path / "processed",
                      batch_size=4, debug=False)
    process_directory(tmp_path / "processed" / "enhanced",
                      tmp_path / "processed" / "minutiae", batch_size=4)
    res = mrun.main(demo=False,
                    minutiae_base=str(tmp_path / "processed" / "minutiae"),
                    logs_dir=str(tmp_path / "logs"))
    assert res["genuine_pairs"] == 2 and res["impostor_pairs"] == 4
    assert res["genuine_scores"].min() > 0.5
    assert res["impostor_scores"].max() == 0.0
    assert res["eer"] == 0.0
