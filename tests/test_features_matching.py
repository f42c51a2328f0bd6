"""Tests for minutiae extraction, quality postprocessing, and matching."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_biometric_fingerprints_palms_tpu.features import (
    extract_minutiae, postprocess_minutiae,
)
from multimodal_biometric_fingerprints_palms_tpu.features.minutiae import (
    MinutiaeSet, crossing_number,
)
from multimodal_biometric_fingerprints_palms_tpu.matching import (
    MatchParams, match_minutiae_pair, match_pairs_batch,
    compute_descriptor_weights,
)


def _cn_reference(sk):
    """Reference CN semantics (extract_features.py:53-58)."""
    h, w = sk.shape
    out = {}
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            if not sk[y, x]:
                continue
            P = [sk[y, x+1], sk[y-1, x+1], sk[y-1, x], sk[y-1, x-1],
                 sk[y, x-1], sk[y+1, x-1], sk[y+1, x], sk[y+1, x+1]]
            cn = sum(abs(int(P[i]) - int(P[(i+1) % 8])) for i in range(8)) // 2
            out[(y, x)] = cn
    return out


def test_crossing_number_matches_reference(rng):
    sk = rng.random((24, 24)) > 0.7
    cn = np.asarray(crossing_number(jnp.asarray(sk)))
    ref = _cn_reference(sk.astype(np.uint8))
    for (y, x), v in ref.items():
        assert cn[y, x] == v, (y, x)


def test_extract_minutiae_simple_line():
    # A straight horizontal line: two endings (CN=1), no bifurcations.
    sk = np.zeros((16, 32), bool)
    sk[8, 4:28] = True
    ms = extract_minutiae(jnp.asarray(sk), k=64)
    n = int(ms.count)
    assert n == 2
    xy = np.asarray(ms.xy[:n]).astype(int)
    assert {tuple(p) for p in xy} == {(4, 8), (27, 8)}
    assert np.asarray(ms.minutia_type[:n]).tolist() == [0, 0]


def test_extract_minutiae_bifurcation():
    # A Y-shape: one bifurcation at the junction.
    sk = np.zeros((32, 32), bool)
    sk[16, 4:16] = True                      # stem
    for i in range(10):                      # two diagonal branches
        sk[16 - 1 - i, 16 + i] = True
        sk[16 + 1 + i, 16 + i] = True
    sk[16, 16] = True
    ms = extract_minutiae(jnp.asarray(sk), k=64)
    types = np.asarray(ms.minutia_type)[np.asarray(ms.valid)]
    assert (types == 1).sum() >= 1           # at least the junction


def _synthetic_minutiae(rng, n, k=64, spread=100.0):
    xy = np.zeros((k, 2), np.float32)
    xy[:n] = rng.random((n, 2)).astype(np.float32) * spread + 60
    ori = np.zeros((k,), np.float32)
    ori[:n] = (rng.random(n).astype(np.float32) - 0.5) * np.pi
    types = np.zeros((k,), np.int32)
    types[:n] = (rng.random(n) > 0.5).astype(np.int32)
    q = np.zeros((k,), np.float32)
    q[:n] = 0.5 + 0.5 * rng.random(n).astype(np.float32)
    valid = np.zeros((k,), bool)
    valid[:n] = True
    return MinutiaeSet(
        xy=jnp.asarray(xy), minutia_type=jnp.asarray(types),
        orientation=jnp.asarray(ori), quality=jnp.asarray(q),
        coherence=jnp.asarray(q), angular_stability=jnp.asarray(q),
        valid=jnp.asarray(valid),
    )


def _transform_set(ms, theta, t, n):
    c, s = math.cos(theta), math.sin(theta)
    xy = np.asarray(ms.xy).copy()
    x, y = xy[:n, 0].copy(), xy[:n, 1].copy()
    xy[:n, 0] = c * x - s * y + t[0]
    xy[:n, 1] = s * x + c * y + t[1]
    ori = np.asarray(ms.orientation).copy()
    ori[:n] = ori[:n] + theta
    return ms._replace(xy=jnp.asarray(xy), orientation=jnp.asarray(ori))


def test_match_identical_sets_high_score(rng):
    a = _synthetic_minutiae(rng, 20)
    res = match_minutiae_pair(a, a, MatchParams(ransac_iter=64))
    assert float(res.final_score) > 0.6
    assert int(res.n_inliers) >= 15


def test_match_rotated_translated(rng):
    a = _synthetic_minutiae(rng, 25)
    theta, t = 0.3, (12.0, -8.0)
    b = _transform_set(a, theta, t, 25)
    res = match_minutiae_pair(a, b, MatchParams(ransac_iter=128))
    assert float(res.final_score) > 0.5
    # recovered transform close to ground truth
    assert abs(float(res.theta) - theta) < 0.05
    assert np.allclose(np.asarray(res.t), t, atol=3.0)


def test_match_impostor_low_score(rng):
    a = _synthetic_minutiae(rng, 20)
    b = _synthetic_minutiae(np.random.default_rng(7), 20)
    genuine = match_minutiae_pair(a, _transform_set(a, 0.1, (5, 5), 20),
                                  MatchParams(ransac_iter=128))
    impostor = match_minutiae_pair(a, b, MatchParams(ransac_iter=128))
    assert float(genuine.final_score) > float(impostor.final_score)


def test_match_too_few_minutiae_rejected(rng):
    a = _synthetic_minutiae(rng, 5)
    res = match_minutiae_pair(a, a, MatchParams(ransac_iter=16))
    assert float(res.final_score) == 0.0


def test_match_batch(rng):
    a = _synthetic_minutiae(rng, 20)
    b = _transform_set(a, 0.2, (5, 5), 20)
    batch_a = jax.tree.map(lambda x: jnp.stack([x, x]), a)
    batch_b = jax.tree.map(lambda x: jnp.stack([x, x]), b)
    res = match_pairs_batch(batch_a, batch_b, MatchParams(ransac_iter=64))
    assert res.final_score.shape == (2,)
    np.testing.assert_allclose(np.asarray(res.final_score[0]),
                               np.asarray(res.final_score[1]), atol=1e-6)


def test_descriptor_weights_reference_formula(rng):
    ms = _synthetic_minutiae(rng, 10)
    w = np.asarray(compute_descriptor_weights(ms))
    q = np.asarray(ms.quality)
    coh = np.asarray(ms.coherence)
    ang = np.asarray(ms.angular_stability)
    ty = np.asarray(ms.minutia_type)
    bonus = np.where(ty == 1, 1.25, 1.0)
    ref = np.clip(bonus * (0.5 * q + 0.3 * coh + 0.2 * ang), 0.05, 2.0)
    ref[~np.asarray(ms.valid)] = 0.0
    np.testing.assert_allclose(w, ref, rtol=1e-6)


def test_postprocess_gates_and_cap(synthetic_fingerprint):
    # Build a plausible skeleton from the synthetic image, extract + enrich.
    from multimodal_biometric_fingerprints_palms_tpu.ops import skeletonize
    img = jnp.asarray(synthetic_fingerprint)
    binary = img < 0.45
    skel = skeletonize(binary)
    ms = extract_minutiae(skel, k=64)
    out = postprocess_minutiae(ms, skel)
    n = int(out.count)
    assert n <= 60
    v = np.asarray(out.valid)
    q = np.asarray(out.quality)
    assert (q[v] > 0).all()
    # sorted by quality descending
    assert (np.diff(q[:n]) <= 1e-6).all()
    # margins respected
    xy = np.asarray(out.xy)[v]
    h, w = synthetic_fingerprint.shape
    assert (xy[:, 0] >= 30).all() and (xy[:, 0] < w - 30).all()
    assert (xy[:, 1] >= 30).all() and (xy[:, 1] < h - 30).all()
