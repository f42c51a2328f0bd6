"""Generate the committed cross-implementation parity fixture set.

Synthetic minutiae JSON files (reference schema, extract_features.py:104-105)
for N users x S impressions, designed so the matching problem is *hard*:

- every template has the same spatial spread statistics, so the reference's
  spatial-std early reject (match.py:85-88) never trivially separates
  impostors;
- half the users share a common "global pattern" of minutiae positions
  (jittered per user), so impostor pairs have plausible partial structure;
- genuine impressions are rigid-transformed (rotation + translation) with
  positional/orientation jitter, ~15% dropout, and spurious minutiae.

Run once; the JSON output under tests/fixtures/parity/ is committed so the
parity test (tests/test_reference_parity.py) is stable even if this
generator later changes.

    python tests/gen_parity_fixtures.py
"""

from __future__ import annotations

import json
import math
from pathlib import Path

import numpy as np

OUT = Path(__file__).parent / "fixtures" / "parity"

N_USERS = 8
N_IMPRESSIONS = 4
FRAME_W, FRAME_H = 320, 256
MARGIN = 34          # keep clear of the reference's 30px margin gate
MIN_SEP = 9.0        # minimum separation between template minutiae


def _poisson_disk(rng, n, shared_xy=None):
    """Rejection-sample n points with min separation; optionally start from a
    shared (jittered) global pattern so impostors are structurally similar."""
    pts = []
    if shared_xy is not None:
        for p in shared_xy:
            q = p + rng.normal(0, 3.0, 2)
            q[0] = np.clip(q[0], MARGIN, FRAME_W - MARGIN)
            q[1] = np.clip(q[1], MARGIN, FRAME_H - MARGIN)
            pts.append(q)
    while len(pts) < n:
        q = np.array([rng.uniform(MARGIN, FRAME_W - MARGIN),
                      rng.uniform(MARGIN, FRAME_H - MARGIN)])
        if all(np.linalg.norm(q - p) >= MIN_SEP for p in pts):
            pts.append(q)
    return np.asarray(pts[:n])


def make_template(rng, shared_xy=None):
    n = int(rng.integers(38, 52))
    xy = _poisson_disk(rng, n, shared_xy)
    mtype = (rng.random(n) < 0.32).astype(int)
    orient = rng.uniform(-math.pi / 2, math.pi / 2, n)
    quality = rng.uniform(0.35, 0.9, n)
    coherence = rng.uniform(0.3, 0.85, n)
    angs = rng.uniform(0.4, 0.95, n)
    return dict(xy=xy, mtype=mtype, orient=orient, quality=quality,
                coherence=coherence, angs=angs)


def make_impression(rng, tpl):
    """Rigid transform + jitter + dropout + spurious points."""
    theta = rng.uniform(-math.radians(10), math.radians(10))
    t = rng.uniform(-12, 12, 2)
    c, s = math.cos(theta), math.sin(theta)
    R = np.array([[c, -s], [s, c]])
    xy = tpl["xy"] @ R.T + t + rng.normal(0, 1.3, tpl["xy"].shape)
    orient = tpl["orient"] + theta + rng.normal(0, math.radians(2.5),
                                                len(tpl["orient"]))
    orient = np.mod(orient + math.pi, 2 * math.pi) - math.pi

    keep = rng.random(len(xy)) > 0.15
    # keep only in-frame points (sensor crop)
    inframe = ((xy[:, 0] > 12) & (xy[:, 0] < FRAME_W - 12)
               & (xy[:, 1] > 12) & (xy[:, 1] < FRAME_H - 12))
    keep &= inframe

    recs = []
    for i in np.nonzero(keep)[0]:
        recs.append({
            "x": int(round(xy[i, 0])), "y": int(round(xy[i, 1])),
            "type": "bifurcation" if tpl["mtype"][i] else "ending",
            "orientation": float(orient[i]),
            "quality": float(np.clip(tpl["quality"][i]
                                     + rng.normal(0, 0.05), 0.05, 1.0)),
            "coherence": float(np.clip(tpl["coherence"][i]
                                       + rng.normal(0, 0.05), 0.05, 1.0)),
            "angular_stability": float(np.clip(tpl["angs"][i]
                                               + rng.normal(0, 0.05), 0.05, 1.0)),
        })
    # spurious minutiae
    n_spur = int(rng.integers(3, 7))
    for _ in range(n_spur):
        recs.append({
            "x": int(rng.uniform(MARGIN, FRAME_W - MARGIN)),
            "y": int(rng.uniform(MARGIN, FRAME_H - MARGIN)),
            "type": "bifurcation" if rng.random() < 0.32 else "ending",
            "orientation": float(rng.uniform(-math.pi / 2, math.pi / 2)),
            "quality": float(rng.uniform(0.1, 0.5)),
            "coherence": float(rng.uniform(0.1, 0.5)),
            "angular_stability": float(rng.uniform(0.2, 0.6)),
        })
    return recs


def main():
    rng = np.random.default_rng(20260816)
    OUT.mkdir(parents=True, exist_ok=True)
    # shared global pattern for the "hard impostor" half of the users
    shared = _poisson_disk(rng, 20)
    for u in range(N_USERS):
        tpl = make_template(rng, shared_xy=shared if u < N_USERS // 2 else None)
        for s in range(N_IMPRESSIONS):
            recs = make_impression(rng, tpl)
            path = OUT / f"u{u:02d}_{s + 1}_minutiae.json"
            with open(path, "w") as f:
                json.dump(recs, f, indent=1)
    print(f"wrote {N_USERS * N_IMPRESSIONS} fixtures to {OUT}")


def main_full():
    """The FULL-PROTOCOL fixture set (tests/fixtures/parity_full/):
    32 PolyU-shaped users x 4 impressions (half sharing a jittered global
    pattern — hard impostors) plus 8 NIST-style single-session users
    (`F00xx_1` names, README.md:80-91) that contribute only impostor
    templates. Drives the reference's own FRR.py/FAR.py end-to-end
    (tests/gen_reference_golden.py) and our matching.runner full protocol
    (tests/test_full_protocol_parity.py)."""
    rng = np.random.default_rng(20260817)
    out = Path(__file__).parent / "fixtures" / "parity_full"
    out.mkdir(parents=True, exist_ok=True)
    shared = _poisson_disk(rng, 20)
    n_users, n_impr = 32, 4
    for u in range(n_users):
        tpl = make_template(rng, shared_xy=shared if u < n_users // 2 else None)
        for s in range(n_impr):
            recs = make_impression(rng, tpl)
            with open(out / f"u{u:02d}_{s + 1}_minutiae.json", "w") as f:
                json.dump(recs, f, indent=1)
    # NIST-style stress users: single session, no genuine pairs
    for u in range(8):
        tpl = make_template(rng, shared_xy=shared if u % 2 == 0 else None)
        recs = make_impression(rng, tpl)
        with open(out / f"F{u:04d}_1_minutiae.json", "w") as f:
            json.dump(recs, f, indent=1)
    print(f"wrote {n_users * n_impr + 8} fixtures to {out}")


if __name__ == "__main__":
    import sys as _sys
    if "--full" in _sys.argv:
        main_full()
    else:
        main()
