"""FULL-PROTOCOL parity vs the reference's own evaluation stack.

The reference's end-to-end protocol (match_features.py:102-151) was run ONCE
over the committed 136-template fixture set (32 PolyU-shaped users x 4
impressions + 8 NIST-style single-session users) by
tests/gen_reference_golden.py, driving /root/reference's compute_frr
(FRR.py:67) and compute_far (FAR.py:35) with the full-mode settings:
RANSAC 300, FRR gates dist 30/orient 30/min_inliers 6, FAR gates dist 15/
orient 10/min_inliers 12, 50 threshold points — with TWO deviations:
(1) max_per_user 4 instead of 2, so the genuine-pair count is
32*C(4,2) = 192 instead of 32 and the parity tolerances can be ~4x tighter
(VERDICT round-3 item 6); (2) the RANSAC early stop is disabled
(stop_inlier_ratio=2.0) on BOTH stacks, because the reference's
first-past-the-post stop is thread-racy (measured self-reproducibility
corr ~0.68 — see gen_reference_golden.py) and would make the golden an
unstable target. The resulting curves are committed as
tests/fixtures/parity_full_golden.json.

This test runs OUR orchestrator (matching.runner.main — the production
entry point, not the pair matcher) with the same protocol on the same
fixtures and asserts the 50-point FRR/FAR curves match pointwise and the
EERs agree, with tolerances set by the genuine-pair sample size (192
pairs → 1/192 curve granularity) and the different RANSAC streams. Also asserts the
cascade (screen-then-full) changes nothing on this set.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest
import yaml

HERE = Path(__file__).parent
FIXTURES = HERE / "fixtures" / "parity_full"
GOLDEN = HERE / "fixtures" / "parity_full_golden.json"

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def golden():
    if not GOLDEN.exists():  # pragma: no cover
        pytest.skip("golden artifact not generated")
    return json.loads(GOLDEN.read_text())


def _run_ours(tmp_path, cascade: bool):
    from multimodal_biometric_fingerprints_palms_tpu.matching.runner import main

    base_cfg = yaml.safe_load(
        (Path(__file__).parents[1] / "configs" / "config_matching.yml")
        .read_text())
    base_cfg["matching"]["cascade"] = cascade
    # the golden's protocol: all 4 impressions per user (192 genuine pairs)
    base_cfg["evaluation"]["max_per_user"] = 4
    # the golden's SECOND deviation (gen_reference_golden.py): the
    # reference's racy first-past-the-post early stop is disabled
    # (stop_inlier_ratio=2.0 => best-of-300 hypotheses); our stack must run
    # the identical no-stop protocol or the curves measure different
    # estimators (measured: genuine mean 0.615 at stop=0.15 vs 0.863 at 2.0).
    base_cfg["ransac"]["stop_inlier_ratio"] = 2.0
    cfg_path = tmp_path / f"cfg_{cascade}.yml"
    cfg_path.write_text(yaml.safe_dump(base_cfg))
    return main(config_path=str(cfg_path), minutiae_base=str(FIXTURES),
                logs_dir=str(tmp_path / "logs"))


@pytest.fixture(scope="module")
def ours(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("full_protocol")
    return {
        "cascade": _run_ours(tmp, cascade=True),
        "plain": _run_ours(tmp, cascade=False),
    }


def test_frr_curve_parity(golden, ours):
    """50-point FRR curves agree within 2.5/192 vertically after at most
    ONE threshold bin (0.0204 score units) of horizontal slack.

    Why the slack: the golden's genuine scores put ~96 of 192 pairs inside
    a 0.1-wide band (0.43-0.53), so the CDF rises ~0.1 per threshold bin
    there — a sub-bin score offset between two independent RANSAC streams
    (different hypothesis sampling, same protocol) moves the pointwise
    curve by ~0.1 even when the distributions agree. Bounding each point
    by the neighboring bins' envelope +- 2.5 pairs tests the distribution
    ~8x tighter than the round-3 pointwise +-4.5/32 while staying robust
    to the score-axis jitter the two stacks cannot share."""
    ref = np.asarray(golden["frr"])
    our = np.asarray(ours["plain"]["frr"])
    assert our.shape == ref.shape
    tol = 2.5 / 192.0
    lo = np.minimum(np.minimum(ref, np.roll(ref, 1)), np.roll(ref, -1))
    hi = np.maximum(np.maximum(ref, np.roll(ref, 1)), np.roll(ref, -1))
    lo[0], hi[0] = ref[0], ref[0]
    lo[-1], hi[-1] = ref[-1], ref[-1]
    viol = np.maximum(our - (hi + tol), (lo - tol) - our)
    assert np.max(viol) <= 0.0, (
        int(np.argmax(viol)), float(np.max(viol)), our[np.argmax(viol)],
        ref[np.argmax(viol)])


def test_far_curve_parity(golden, ours):
    """50-point FAR curves agree pointwise. The reference scores each user
    pair in both orders (~18.0k scores) while we score unordered pairs once
    (~9.0k); the distributions must still agree."""
    ref = np.asarray(golden["far"])
    our = np.asarray(ours["plain"]["far"])
    assert our.shape == ref.shape
    assert np.max(np.abs(our - ref)) <= 0.03, np.max(np.abs(our - ref))


def test_eer_parity(golden, ours):
    """EER within 1.5 points of the reference protocol's (VERDICT round-3
    item 6 tolerance; 192 genuine pairs)."""
    assert abs(ours["plain"]["eer"] - golden["eer"]) <= 0.015, (
        ours["plain"]["eer"], golden["eer"])


def test_genuine_impostor_mass_parity(golden, ours):
    rg = np.asarray(golden["genuine_scores"])
    ri = np.asarray(golden["impostor_scores"])
    og = np.asarray(ours["plain"]["genuine_scores"])
    oi = np.asarray(ours["plain"]["impostor_scores"])
    assert abs(og.mean() - rg.mean()) <= 0.04, (og.mean(), rg.mean())
    assert abs(oi.mean() - ri.mean()) <= 0.01, (oi.mean(), ri.mean())


def test_cascade_matches_full_protocol(ours):
    """The production cascade must not change the full protocol's curves."""
    for key in ("frr", "far"):
        np.testing.assert_allclose(
            np.asarray(ours["cascade"][key]),
            np.asarray(ours["plain"][key]), atol=1e-12,
            err_msg=f"cascade changed the {key} curve")
    assert abs(ours["cascade"]["eer"] - ours["plain"]["eer"]) <= 1e-12
