"""Interpret-mode parity tests for the Pallas connected-components kernel."""

import numpy as np
import scipy.ndimage as ndi
import jax.numpy as jnp
import pytest

from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_cc import (
    connected_components_pallas,
)
from multimodal_biometric_fingerprints_palms_tpu.ops.components import (
    connected_components,
)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("conn", [1, 2])
def test_pallas_cc_scipy_parity(seed, conn):
    x = np.random.default_rng(seed).random((48, 64)) > 0.55
    lab = np.asarray(connected_components_pallas(jnp.asarray(x), conn,
                                                 interpret=True))
    struct = (ndi.generate_binary_structure(2, 1) if conn == 1
              else np.ones((3, 3)))
    ref, n = ndi.label(x, structure=struct)
    assert len(np.unique(lab[x])) == n
    for l in np.unique(lab[x]):
        assert len(np.unique(ref[lab == l])) == 1
    # background convention
    assert (lab[~x] == 2 ** 30).all()


def test_pallas_cc_matches_xla(rng):
    x = rng.random((2, 32, 48)) > 0.5
    a = np.asarray(connected_components_pallas(jnp.asarray(x), 2,
                                               interpret=True))
    b = np.asarray(connected_components(jnp.asarray(x), 2))
    np.testing.assert_array_equal(a, b)


def test_pallas_match_parity(rng):
    """Pallas hypothesis-scoring path matches the XLA matcher end to end."""
    import jax
    import jax.numpy as jnp
    from multimodal_biometric_fingerprints_palms_tpu.matching import (
        MatchParams, match_pairs_batch,
    )
    from multimodal_biometric_fingerprints_palms_tpu.matching.pallas_match import (
        match_pairs_batch_pallas,
    )
    from multimodal_biometric_fingerprints_palms_tpu.features.minutiae import (
        MinutiaeSet,
    )

    k, n, pnum = 64, 20, 4
    sets = []
    for i in range(pnum * 2):
        g = np.random.default_rng(i // 2)  # pairs share constellations
        xy = np.zeros((k, 2), np.float32)
        xy[:n] = g.random((n, 2)).astype(np.float32) * 120 + 60
        if i % 2:
            xy[:n] += rng.normal(0, 0.7, (n, 2)).astype(np.float32)
        ori = np.zeros((k,), np.float32)
        ori[:n] = (g.random(n).astype(np.float32) - 0.5) * np.pi
        ty = np.zeros((k,), np.int32); ty[:n] = (g.random(n) > 0.5)
        q = np.zeros((k,), np.float32); q[:n] = 0.5 + 0.5 * g.random(n)
        valid = np.zeros((k,), bool); valid[:n] = True
        sets.append(MinutiaeSet(xy=xy, minutia_type=ty, orientation=ori,
                                quality=q, coherence=q, angular_stability=q,
                                valid=valid))
    a = jax.tree.map(lambda *x: jnp.asarray(np.stack(x)), *sets[0::2])
    b = jax.tree.map(lambda *x: jnp.asarray(np.stack(x)), *sets[1::2])
    p = MatchParams(ransac_iter=48, min_inliers=6)
    r1 = match_pairs_batch(a, b, p)
    r2 = match_pairs_batch_pallas(a, b, p, interpret=True)
    np.testing.assert_allclose(np.asarray(r1.final_score),
                               np.asarray(r2.final_score), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(r1.n_inliers),
                                  np.asarray(r2.n_inliers))


@pytest.mark.parametrize("ransac_iter", [32, 70])
def test_grouped_hypothesis_kernel_matches_ungrouped(rng, ransac_iter):
    """The grouped (K, K*G) kernel reproduces the one-hypothesis-per-step
    kernel exactly, including the H-padding path (70 pads to 128)."""
    import jax
    import jax.numpy as jnp
    from multimodal_biometric_fingerprints_palms_tpu.matching import MatchParams
    from multimodal_biometric_fingerprints_palms_tpu.matching.pallas_match import (
        hypothesis_scores_pallas, hypothesis_scores_pallas_grouped,
    )
    from multimodal_biometric_fingerprints_palms_tpu.features.minutiae import (
        MinutiaeSet,
    )

    pnum, k, n = 3, 64, 40
    xy = rng.uniform(40, 200, (pnum, k, 2)).astype(np.float32)
    ori = rng.uniform(-np.pi, np.pi, (pnum, k)).astype(np.float32)
    ty = rng.integers(0, 2, (pnum, k)).astype(np.float32)
    q = rng.uniform(0.4, 1, (pnum, k)).astype(np.float32)
    valid = np.zeros((pnum, k), bool)
    valid[:, :n] = True
    j = jnp.asarray
    a = MinutiaeSet(xy=j(xy), orientation=j(ori), minutia_type=j(ty),
                    quality=j(q), coherence=j(q), angular_stability=j(q),
                    valid=j(valid))
    th = np.radians(10.0)
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]],
                   np.float32)
    xyb = xy @ rot.T + np.array([5.0, -3.0], np.float32) \
        + rng.normal(0, 0.8, xy.shape).astype(np.float32)
    b = MinutiaeSet(xy=j(xyb), orientation=j(ori + th), minutia_type=j(ty),
                    quality=j(q), coherence=j(q), angular_stability=j(q),
                    valid=j(valid))

    p = MatchParams(ransac_iter=ransac_iter)
    s1, c1, th1, t1 = hypothesis_scores_pallas(a, b, p, interpret=True)
    s2, c2, th2, t2 = hypothesis_scores_pallas_grouped(a, b, p,
                                                       interpret=True)
    assert (np.asarray(s1) > 0).sum() > 0  # the comparison is non-trivial
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(th1), np.asarray(th2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_binary_reconstruct_pallas_matches_xla(rng):
    """Marker-reachability reconstruction == geodesic-dilation fixpoint."""
    import jax.numpy as jnp
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_cc import (
        binary_reconstruct_pallas,
    )
    from multimodal_biometric_fingerprints_palms_tpu.ops.morphology import (
        binary_reconstruction_by_dilation,
    )
    mask = jnp.asarray(rng.random((2, 24, 128)) > 0.45)
    marker = jnp.asarray((rng.random((2, 24, 128)) > 0.9)) & mask
    ours = np.asarray(binary_reconstruct_pallas(marker, mask, interpret=True))
    ref = np.asarray(binary_reconstruction_by_dilation(marker, mask))
    np.testing.assert_array_equal(ours, ref)


def test_thin_stage_bitpacked_matches_xla(rng):
    """clean (fused CC kernel) + gate + bit-packed ZS+prune == the XLA
    composition used by enhance.thinning_and_cleaning's fallback path."""
    import jax.numpy as jnp
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_cc import (
        cc_filter_pallas,
    )
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_bitpack import (
        zs_thin_bitpacked,
    )
    from multimodal_biometric_fingerprints_palms_tpu.ops.components import clean_mask
    from multimodal_biometric_fingerprints_palms_tpu.ops.skeleton import (
        skeletonize, prune_isolated,
    )
    # blobby mask with some structure
    base = rng.random((1, 32, 128))
    mask = jnp.asarray((base + np.roll(base, 1, -1) + np.roll(base, 1, -2)) > 1.4)
    rel = jnp.asarray(rng.random((1, 32, 128)).astype(np.float32))
    cleaned = cc_filter_pallas(mask, "clean", connectivity=1,
                               min_size=10, max_size=20, interpret=True)
    gated = jnp.logical_and(cleaned, rel > 0.1)
    ours = np.asarray(zs_thin_bitpacked(gated, prune=True, interpret=True))
    m = clean_mask(mask, 10, 20, connectivity=1)
    m = jnp.logical_and(m, rel > 0.1)
    ref = np.asarray(prune_isolated(skeletonize(m)))
    np.testing.assert_array_equal(ours, ref)


def test_bitpack_roundtrip_and_multi_plane(rng):
    """pack/unpack roundtrip, and a >32-image batch exercising 2 planes."""
    import jax.numpy as jnp
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_bitpack import (
        pack_bits, unpack_bits, zs_thin_bitpacked,
    )
    from multimodal_biometric_fingerprints_palms_tpu.ops.skeleton import (
        skeletonize,
    )
    m = jnp.asarray(rng.random((37, 16, 128)) > 0.5)
    assert bool(jnp.all(unpack_bits(pack_bits(m), 37) == m))
    # cross-plane parity on a small structured batch
    base = rng.random((34, 16, 128))
    masks = jnp.asarray((base + np.roll(base, 1, -1)) > 1.0)
    ours = np.asarray(zs_thin_bitpacked(masks, max_iters=16, interpret=True))
    ref = np.asarray(skeletonize(masks, max_iters=16))
    np.testing.assert_array_equal(ours, ref)


def test_border_reach_packed_matches_flood(rng):
    """Packed segmented-OR border reachability == BFS flood fill, incl. the
    canonical-seed variant (the clean_mask_split exactness test)."""
    from collections import deque
    import jax.numpy as jnp
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_bitpack import (
        border_reach_packed,
    )

    def flood(t, seeds, conn):
        out = np.zeros_like(t)
        q = deque(zip(*np.nonzero(seeds & t)))
        out[seeds & t] = True
        offs = [(1, 0), (-1, 0), (0, 1), (0, -1)]
        if conn == 2:
            offs += [(1, 1), (1, -1), (-1, 1), (-1, -1)]
        while q:
            y, x = q.popleft()
            for dy, dx in offs:
                ny, nx = y + dy, x + dx
                if 0 <= ny < t.shape[0] and 0 <= nx < t.shape[1] \
                        and t[ny, nx] and not out[ny, nx]:
                    out[ny, nx] = True
                    q.append((ny, nx))
        return out

    h, w = 40, 128
    batch = np.stack([rng.random((h, w)) > d
                      for d in (0.3, 0.5, 0.7)] * 12)[:34]  # 2 planes
    border = np.zeros((h, w), bool)
    border[0] = border[-1] = True
    border[:, 0] = border[:, -1] = True
    for conn in (1, 2):
        reach, reach1 = border_reach_packed(jnp.asarray(batch),
                                            connectivity=conn,
                                            interpret=True)
        reach, reach1 = np.asarray(reach), np.asarray(reach1)
        for i in range(batch.shape[0]):
            t = batch[i]
            np.testing.assert_array_equal(reach[i], flood(t, border, conn),
                                          err_msg=f"img {i} conn {conn}")
            idx = np.argwhere(t & border)
            s1 = np.zeros((h, w), bool)
            if len(idx):
                y, x = idx[np.argmin(idx[:, 0] * w + idx[:, 1])]
                s1[y, x] = True
            np.testing.assert_array_equal(reach1[i], flood(t, s1, conn),
                                          err_msg=f"img {i} conn {conn}")


@pytest.mark.parametrize("conn", [1, 2])
def test_remove_small_split_matches_unsplit(rng, conn):
    """The center-seeded objects split (packed reach of the canonical
    component + per-image remnant relax) == cc_filter "remove_small",
    including when the center seed lands in a SMALL speck (the big
    component then relaxes per image — slower, still exact) and on
    empty-foreground images."""
    import jax.numpy as jnp
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_cc import (
        cc_filter_pallas, remove_small_split_pallas,
    )
    h, w = 32, 64
    yy, xx = np.mgrid[:h, :w]
    ridge = np.cos(np.sqrt((yy - 16.0) ** 2 + (xx - 32.0) ** 2) / 2.5) > 0.0
    speck_center = np.zeros((h, w), bool)   # seed -> 2-px speck at center
    speck_center[15:17, 32] = True
    speck_center[2:20, 2:8] = True          # the big component, off center
    batch = jnp.asarray(np.stack([
        rng.random((h, w)) > 0.5,
        ridge,
        speck_center,
        np.zeros((h, w), bool),
        np.ones((h, w), bool),
    ]))
    a = np.asarray(remove_small_split_pallas(batch, 10, connectivity=conn,
                                             interpret=True))
    b = np.asarray(cc_filter_pallas(batch, "remove_small", connectivity=conn,
                                    min_size=10, interpret=True))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("conn", [1, 2])
def test_split2_matches_unsplit_walled(rng, conn):
    """Two-plane split (border-canonical + center-canonical packed legs) ==
    the one-kernel filters on the walled-off topology it targets: a
    border-touching fg ring walls an interior network off the border (the
    post-hull Sauvola structure), plus specks/holes, noise, empty, full."""
    import jax.numpy as jnp
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_cc import (
        cc_filter_pallas, remove_small_split2_pallas,
        fill_holes_split2_pallas,
    )
    h, w = 32, 64
    walled = np.zeros((h, w), bool)
    walled[0:3, :] = walled[-3:, :] = True    # border ring (big fg)
    walled[:, 0:3] = walled[:, -3:] = True
    walled[8:24, 10:50] = True                # walled-off center network
    walled[8:24, 28:32] = False               # valley slot inside it
    walled[10:12, 30] = True                  # 2-px speck inside the slot
    walled[26, 6] = True                      # 1-px speck in the moat
    batch = jnp.asarray(np.stack([
        walled,
        rng.random((h, w)) > 0.5,
        np.zeros((h, w), bool),
        np.ones((h, w), bool),
    ]))
    a = np.asarray(remove_small_split2_pallas(batch, 10, connectivity=conn,
                                              interpret=True))
    b = np.asarray(cc_filter_pallas(batch, "remove_small", connectivity=conn,
                                    min_size=10, interpret=True))
    np.testing.assert_array_equal(a, b)
    a = np.asarray(fill_holes_split2_pallas(batch, 25, connectivity=conn,
                                            interpret=True))
    b = np.asarray(cc_filter_pallas(batch, "fill_holes", connectivity=conn,
                                    max_size=25, interpret=True))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("conn", [1, 2])
def test_clean_mask_split_matches_clean(rng, conn):
    """The 3-leg split clean (small-object relax -> packed border reach ->
    interior-hole relax) is pixel-identical to the one-kernel clean mode on
    noise (multi border components -> exact fallback) and on ridge-like
    masks (single border component -> fast path)."""
    import jax.numpy as jnp
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_cc import (
        cc_filter_pallas, clean_mask_split,
    )
    h, w = 32, 64
    yy, xx = np.mgrid[:h, :w]
    ridge = np.cos(np.sqrt((yy - 16.0) ** 2 + (xx - 32.0) ** 2) / 2.5) > 0.0
    small_border = np.zeros((h, w), bool)   # tiny bg pocket at the border
    small_border[:, :] = True
    small_border[0, 3:6] = False            # 3-px border hole
    small_border[20:24, 40:47] = False      # interior hole
    batch = jnp.asarray(np.stack([
        rng.random((h, w)) > 0.5,
        ridge,
        small_border,
        np.ones((h, w), bool),
    ]))
    a = np.asarray(clean_mask_split(batch, 10, 25, connectivity=conn,
                                    interpret=True))
    b = np.asarray(cc_filter_pallas(batch, "clean", connectivity=conn,
                                    min_size=10, max_size=25,
                                    interpret=True))
    np.testing.assert_array_equal(a, b)


def test_binarize_split_matches_fused(rng):
    """binarize_fused_split_pallas (packed border-reach middle leg) ==
    binarize_fused_pallas on smooth ridge-like images and on noise."""
    import jax.numpy as jnp
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_kernels import (
        binarize_fused_pallas, binarize_fused_split_pallas,
    )
    h, w = 64, 96
    yy, xx = np.mgrid[:h, :w]
    ridges = 0.5 + 0.45 * np.cos(np.sqrt((yy - 30.0) ** 2
                                         + (xx - 48.0) ** 2) / 2.2)
    imgs = jnp.asarray(np.stack([
        ridges, rng.random((h, w))]).astype(np.float32))
    a = np.asarray(binarize_fused_split_pallas(imgs, interpret=True))
    b = np.asarray(binarize_fused_pallas(imgs, interpret=True))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("conn", [1, 2])
def test_largest_component_majority_matches_oracle(rng, conn):
    """Majority-shortcut largest_component == label+size oracle, both when
    the seeded component holds a strict fg majority (closed-form path) and
    when it does not (two comparable blobs -> exact kernel fallback)."""
    import jax.numpy as jnp
    from multimodal_biometric_fingerprints_palms_tpu.ops.components import (
        _largest_component_majority, connected_components, component_sizes,
    )

    h, w = 40, 128
    imgs = []
    # one dominant blob + speckles (majority path)
    m = rng.random((h, w)) > 0.92
    m[8:30, 20:90] = True
    imgs.append(m)
    # three comparable blobs: the seeded one holds ~1/3 of fg, no strict
    # majority -> the exact-kernel fallback decides
    m2 = np.zeros((h, w), bool)
    m2[4:18, 4:44] = True      # 560 px (the largest)
    m2[22:36, 4:42] = True     # 532 px
    m2[12:28, 70:103] = True   # 528 px, but the only 15x15-dense one:
    imgs.append(m2)            # the seed lands here and fails the majority
    # empty mask
    imgs.append(np.zeros((h, w), bool))
    batch = jnp.asarray(np.stack(imgs))

    got = np.asarray(_largest_component_majority(batch, conn,
                                                 interpret=True))
    lab = connected_components(batch, conn)
    sizes = component_sizes(lab, batch)
    best = jnp.argmax(sizes[..., :-1], axis=-1).astype(jnp.int32)
    want = np.asarray(jnp.logical_and(batch, lab == best[..., None, None]))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("conn", [1, 2])
def test_window_fast_path_threshold_exact(conn):
    """The sliding-window fast path (_all_components_below) must not
    misclassify components AT the threshold: a size-T diagonal staircase
    (bbox exactly T x T), a size T-1 speck cluster, and scattered specks
    whose TOTAL far exceeds T but never co-occupy one T x T window (the
    case the old total-mass fast path always sent to the slow path)."""
    from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_cc import (
        cc_filter_pallas, remove_small_split2_pallas,
        fill_holes_split2_pallas,
    )
    h, w, T = 64, 96, 12
    # exactly-T staircase: 2 px per diagonal step -> bbox (T//2) x (T//2+1)
    stair = np.zeros((h, w), bool)
    y0, x0 = 30, 40
    for k in range(T // 2):
        stair[y0 + k, x0 + k] = True
        stair[y0 + k, x0 + k + 1] = True
    assert stair.sum() == T
    # scattered specks: 3-px specks on a sparse grid, total >> T, every
    # T x T window sees at most 2 specks (6 px < T)
    specks = np.zeros((h, w), bool)
    for yy in range(4, h - 4, 16):
        for xx in range(4, w - 4, 16):
            specks[yy, xx] = specks[yy, xx + 1] = specks[yy + 1, xx] = True
    assert specks.sum() > 3 * T
    small = np.zeros((h, w), bool)
    small[10:13, 10:14] = True          # 12 px = T exactly (bbox 3x4)
    small[50, 50:50 + T - 1] = True     # T-1 px line
    batch = jnp.asarray(np.stack([stair, specks, small,
                                  stair | specks | small]))
    for mode, fn, kw in [
        ("remove_small", remove_small_split2_pallas, {}),
        ("fill_holes", fill_holes_split2_pallas, {}),
    ]:
        a = np.asarray(fn(batch, T, connectivity=conn, interpret=True))
        ckw = {"min_size": T} if mode == "remove_small" else {"max_size": T}
        b = np.asarray(cc_filter_pallas(batch, mode, connectivity=conn,
                                        interpret=True, **ckw))
        np.testing.assert_array_equal(a, b, err_msg=f"{mode} conn={conn}")
