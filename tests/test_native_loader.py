"""Tests for the native C++ batch image loader (ctypes)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from multimodal_biometric_fingerprints_palms_tpu.utils.native_loader import (
    batch_load, batch_load_u8, native_available,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native loader build unavailable")


def test_batch_load_jpeg_bmp_parity(tmp_path, rng):
    paths = []
    for i in range(4):
        img = (rng.random((60, 50)) * 255).astype(np.uint8)
        p = tmp_path / f"{i}_1_1.jpg"
        cv2.imwrite(str(p), img)
        paths.append(p)
    bmp = tmp_path / "F0001_1.bmp"
    cv2.imwrite(str(bmp), (rng.random((40, 30)) * 255).astype(np.uint8))
    paths.append(bmp)

    batch, status, ws, hs = batch_load(paths, 64, 64)
    assert (status == 0).all()
    assert batch.shape == (5, 64, 64)
    for i, p in enumerate(paths):
        ref = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
        h, w = ref.shape
        assert hs[i] == h and ws[i] == w
        np.testing.assert_allclose(batch[i, :h, :w], ref, atol=1e-6)
        # padding is zero
        assert batch[i, h:, :].max() == 0.0


def test_batch_load_u8_bit_exact(tmp_path, rng):
    """The uint8 staging path (JPEG rows decode straight into the padded
    batch buffer) must be bit-identical to cv2.imread, with zero padding
    and failures flagged + zeroed like the float path."""
    paths = []
    for i in range(4):
        img = (rng.random((60, 50)) * 255).astype(np.uint8)
        p = tmp_path / f"{i}_1_1.jpg"
        cv2.imwrite(str(p), img)
        paths.append(p)
    bmp = tmp_path / "F0001_1.bmp"
    cv2.imwrite(str(bmp), (rng.random((40, 30)) * 255).astype(np.uint8))
    paths.append(bmp)
    bad = tmp_path / "9_1_1.jpg"
    bad.write_text("not an image")
    paths.append(bad)

    batch, status, ws, hs = batch_load_u8(paths, 64, 64)
    assert batch.dtype == np.uint8
    assert (status[:5] == 0).all() and status[5] != 0
    assert batch[5].max() == 0
    for i, p in enumerate(paths[:5]):
        ref = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
        h, w = ref.shape
        assert hs[i] == h and ws[i] == w
        np.testing.assert_array_equal(batch[i, :h, :w], ref)
        assert batch[i, h:, :].max() == 0 and batch[i, :, w:].max() == 0


def test_batch_load_failures_flagged(tmp_path):
    good = tmp_path / "1_1_1.jpg"
    cv2.imwrite(str(good), np.zeros((10, 10), np.uint8))
    bad = tmp_path / "2_1_1.jpg"
    bad.write_text("not an image")
    missing = tmp_path / "ghost.jpg"
    oversize = tmp_path / "3_1_1.jpg"
    cv2.imwrite(str(oversize), np.zeros((100, 100), np.uint8))

    batch, status, ws, hs = batch_load([good, bad, missing, oversize], 32, 32)
    assert status[0] == 0
    assert status[1] != 0 and status[2] != 0
    assert status[3] != 0            # larger than the staging shape
    assert batch[1].max() == 0.0
