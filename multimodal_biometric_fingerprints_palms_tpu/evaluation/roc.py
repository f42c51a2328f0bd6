"""ROC (FAR vs FRR) plotting — rebuild of src/matching/ROC.py:4-44.

Saves to file instead of blocking on plt.show().
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def plot_roc(far, frr, out_path: str | Path = "logs/roc.png",
             title: str = "ROC (FAR vs FRR)"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    far = np.asarray(far, dtype=np.float64)
    frr = np.asarray(frr, dtype=np.float64)
    order = np.argsort(far)
    far_s, frr_s = far[order], frr[order]

    fig, ax = plt.subplots(figsize=(6, 6))
    ax.plot(far_s, frr_s, marker="o", markersize=3, linewidth=1.2)
    ax.plot([0, 1], [0, 1], "--", color="gray", linewidth=0.8, label="EER line")
    ax.set_xlabel("FAR")
    ax.set_ylabel("FRR")
    ax.set_title(title)
    ax.grid(True, alpha=0.3)
    ax.legend()
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path
