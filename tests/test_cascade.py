"""Tests for the two-phase cascade matcher."""

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_biometric_fingerprints_palms_tpu.matching import MatchParams
from multimodal_biometric_fingerprints_palms_tpu.matching.dataset import MinutiaeDataset
from multimodal_biometric_fingerprints_palms_tpu.matching.runner import match_pair_indices
from multimodal_biometric_fingerprints_palms_tpu.features.minutiae import MinutiaeSet


def _dataset(rng, n_users=4, samples=2, n_min=20, k=64):
    sets, users, sidx, mats = [], [], [], []
    for u in range(n_users):
        g = np.random.default_rng(100 + u)
        base_xy = g.random((n_min, 2)).astype(np.float32) * 120 + 60
        base_ori = (g.random(n_min).astype(np.float32) - 0.5) * np.pi
        types = (g.random(n_min) > 0.5).astype(np.int32)
        q = 0.5 + 0.5 * g.random(n_min).astype(np.float32)
        for s in range(samples):
            jit = base_xy + rng.normal(0, 1.0, (n_min, 2)).astype(np.float32)
            xy = np.zeros((k, 2), np.float32); xy[:n_min] = jit
            ori = np.zeros((k,), np.float32); ori[:n_min] = base_ori
            ty = np.zeros((k,), np.int32); ty[:n_min] = types
            qq = np.zeros((k,), np.float32); qq[:n_min] = q
            valid = np.zeros((k,), bool); valid[:n_min] = True
            sets.append(MinutiaeSet(xy=xy, minutia_type=ty, orientation=ori,
                                    quality=qq, coherence=qq,
                                    angular_stability=qq, valid=valid))
            users.append(u)
            sidx.append(s)
            mat = np.zeros((n_min, 7))
            mat[:, :2] = jit
            mats.append(mat)
    stacked = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *sets)
    return MinutiaeDataset(
        users=[str(u) for u in range(n_users)],
        user_index=np.asarray(users, np.int32),
        sample_index=np.asarray(sidx, np.int32),
        matrices=mats, stacked=stacked)


def test_cascade_matches_full_on_genuine_and_impostor(rng):
    ds = _dataset(rng)
    pairs = np.asarray([[0, 1], [2, 3], [0, 2], [4, 6], [1, 5]], np.int32)
    p = MatchParams(ransac_iter=128, min_inliers=6)
    full = match_pair_indices(ds, pairs, p, chunk=8)
    casc = match_pair_indices(ds, pairs, p, chunk=8, cascade=True,
                              screen_iters=16)
    # genuine pairs (same user) keep their full scores
    np.testing.assert_allclose(casc["final_score"][:2],
                               full["final_score"][:2], atol=1e-6)
    # impostor scores stay non-positive-biased: cascade <= full + eps
    assert (casc["final_score"] <= full["final_score"] + 1e-6).all()
    assert full["final_score"][0] > 0.3  # sanity: genuine matched


def test_screen_kernel_promotes_all_scoring_pairs(rng):
    """The finish-free screen (interpret mode) must promote every pair the
    full matcher scores > 0 under the SAME hypothesis budget, and reject
    the bulk of impostors."""
    import jax
    import jax.numpy as jnp
    from multimodal_biometric_fingerprints_palms_tpu.features.minutiae import (
        MinutiaeSet,
    )
    from multimodal_biometric_fingerprints_palms_tpu.matching import (
        MatchParams, match_pairs_batch,
    )
    from multimodal_biometric_fingerprints_palms_tpu.matching.pallas_match import (
        screen_pairs_batch_pallas,
    )

    k, n, pnum = 64, 40, 8
    g = np.random.default_rng(3)
    xy = g.uniform(40, 200, (pnum, k, 2)).astype(np.float32)
    ori = g.uniform(-np.pi, np.pi, (pnum, k)).astype(np.float32)
    ty = g.integers(0, 2, (pnum, k)).astype(np.float32)
    q = g.uniform(0.4, 1, (pnum, k)).astype(np.float32)
    valid = np.zeros((pnum, k), bool)
    valid[:, :n] = True
    j = jnp.asarray
    a = MinutiaeSet(xy=j(xy), orientation=j(ori), minutia_type=j(ty),
                    quality=j(q), coherence=j(q), angular_stability=j(q),
                    valid=j(valid))
    # first half genuine (rigid copies + noise), second half impostor
    th = np.radians(8.0)
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]],
                   np.float32)
    xyb = xy @ rot.T + np.array([4.0, -2.0], np.float32) \
        + g.normal(0, 0.8, xy.shape).astype(np.float32)
    orib = ori + th
    xyb[pnum // 2:] = g.uniform(40, 200, (pnum // 2, k, 2))
    orib[pnum // 2:] = g.uniform(-np.pi, np.pi, (pnum // 2, k))
    b = MinutiaeSet(xy=j(xyb), orientation=j(orib), minutia_type=j(ty),
                    quality=j(q), coherence=j(q), angular_stability=j(q),
                    valid=j(valid))

    p = MatchParams(ransac_iter=32, min_inliers=6)
    promoted = np.asarray(screen_pairs_batch_pallas(a, b, p, interpret=True))
    full = np.asarray(match_pairs_batch(a, b, p).final_score)
    # every scoring pair is promoted (the cascade-exactness contract)
    assert (promoted | (full == 0.0)).all(), (promoted, full)
    # genuine half promoted, impostor half rejected on this fixture
    assert promoted[: pnum // 2].all()
    assert not promoted[pnum // 2:].any()


def test_anchor_promote_rescues_weak_templates(rng):
    """Recall anchors: a genuine pair with few minutiae that the sampled
    screen can miss is promoted by the deterministic top-weight anchors;
    impostors and early-reject pairs are not."""
    from multimodal_biometric_fingerprints_palms_tpu.matching.ransac import (
        anchor_promote, screen_promote_batch,
    )

    k, n = 64, 13                       # weak template (13 minutiae)
    g = np.random.default_rng(11)

    def tmpl(xy, ori, q):
        pad = lambda v, d=0.0: np.concatenate(
            [v, np.full((k - n,) + v.shape[1:], d, v.dtype)])
        return MinutiaeSet(
            xy=jnp.asarray(pad(xy.astype(np.float32))),
            orientation=jnp.asarray(pad(ori.astype(np.float32))),
            minutia_type=jnp.asarray(pad((q > 0.7).astype(np.int32))),
            quality=jnp.asarray(pad(q.astype(np.float32))),
            coherence=jnp.asarray(pad(q.astype(np.float32))),
            angular_stability=jnp.asarray(pad(q.astype(np.float32))),
            valid=jnp.asarray(np.arange(k) < n))

    xy = g.uniform(40, 200, (n, 2))
    ori = g.uniform(-np.pi, np.pi, n)
    q = g.uniform(0.4, 1.0, n)
    a = tmpl(xy, ori, q)
    genuine = tmpl(xy + g.normal(0, 0.5, (n, 2)), ori, q + 0.01)
    impostor = tmpl(g.uniform(40, 200, (n, 2)),
                    g.uniform(-np.pi, np.pi, n), g.uniform(0.4, 1.0, n))

    p = MatchParams(ransac_iter=32, min_inliers=4,
                    full_iters=64)
    assert bool(anchor_promote(a, genuine, p))
    assert not bool(anchor_promote(a, impostor, p))

    # early rejects still gate: identical-but-tiny templates stay out
    tiny = jax.tree.map(lambda x: x, a)._replace(
        valid=jnp.asarray(np.arange(k) < 5))
    assert not bool(anchor_promote(tiny, tiny, p))

    # the batch helper ORs anchors into the sampled screen
    stack = lambda *ts: jax.tree.map(lambda *xs: jnp.stack(xs), *ts)
    mask = np.asarray(screen_promote_batch(
        stack(a, a), stack(genuine, impostor), p, use_pallas=False))
    assert mask[0] and not mask[1]
