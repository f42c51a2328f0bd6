"""Property tests for the orientation field and geometry ops."""

import numpy as np
import pytest
import jax.numpy as jnp

from multimodal_biometric_fingerprints_palms_tpu.ops.orientation import (
    compute_orientation_field,
)
from multimodal_biometric_fingerprints_palms_tpu.ops.geometry import (
    rotate_points, angle_diff, orientation_diff, affine_warp, resize_bilinear,
)


def _oriented_ridges(angle_deg: float, h=128, w=128, period=8.0):
    """Parallel dark ridges perpendicular to ``angle_deg``... i.e. ridge
    direction = angle_deg."""
    theta = np.deg2rad(angle_deg)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # waves varying along the normal of the ridge direction
    phase = (-np.sin(theta) * xx + np.cos(theta) * yy) / period * 2 * np.pi
    return (0.5 + 0.4 * np.cos(phase)).astype(np.float32)


@pytest.mark.parametrize("angle", [0, 30, 60, 90, 120, 150])
def test_orientation_recovers_ridge_angle(angle):
    img = _oriented_ridges(angle)
    field = compute_orientation_field(jnp.asarray(img))
    # compare in the doubled-angle (undirected) domain, center crop
    est = np.asarray(field.orientation)[32:96, 32:96]
    target = np.deg2rad(angle)
    err = np.abs(np.angle(np.exp(2j * (est - target)))) / 2.0
    assert np.median(err) < np.deg2rad(6), f"angle {angle}: {np.rad2deg(np.median(err))}"


def test_orientation_reliability_high_on_ridges():
    img = _oriented_ridges(45)
    field = compute_orientation_field(jnp.asarray(img))
    rng = np.random.default_rng(0)
    noise = rng.random((128, 128)).astype(np.float32)
    field_noise = compute_orientation_field(jnp.asarray(noise))
    assert (np.asarray(field.reliability)[32:96, 32:96].mean()
            > np.asarray(field_noise.reliability)[32:96, 32:96].mean())


def test_rotate_points_and_angle_diff():
    pts = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    out = np.asarray(rotate_points(pts, jnp.asarray(np.pi / 2)))
    np.testing.assert_allclose(out, [[0, 1], [-1, 0]], atol=1e-6)

    assert float(angle_diff(jnp.asarray(3.0), jnp.asarray(-3.0))) == pytest.approx(
        3.0 - (-3.0) - 2 * np.pi, abs=1e-6)
    assert float(orientation_diff(jnp.asarray(np.pi / 2 - 0.01),
                                  jnp.asarray(-np.pi / 2 + 0.01))) == pytest.approx(
        -0.02, abs=1e-6)


def test_affine_warp_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.random((48, 64)).astype(np.float32)
    m = cv2.getRotationMatrix2D((32, 24), 20.0, 1.0).astype(np.float32)
    ref = cv2.warpAffine(img, m, (64, 48), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    ours = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(m)))
    # interior parity (border rows differ by interpolation clamping)
    err = np.abs(ours[4:-4, 4:-4] - ref[4:-4, 4:-4])
    assert np.median(err) < 1e-3
    assert np.mean(err) < 2e-2


def test_resize_bilinear_shape():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    out = resize_bilinear(x, (6, 8))
    assert out.shape == (6, 8)
