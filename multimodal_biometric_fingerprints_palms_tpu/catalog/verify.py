"""Data-consistency checks.

Equivalent of the reference's classifier/verify.py:7-36: every
filename-derived ID must map to exactly one ``global_id`` in id_clusters.csv.
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd

from .parse import user_id_from_filename


def check_id_consistency(id_clusters_csv: str | Path) -> dict:
    """Return {"ok": bool, "violations": {derived_id: [global_ids...]}}."""
    df = pd.read_csv(id_clusters_csv)
    df["derived_id"] = df["filename"].map(user_id_from_filename)
    grouped = df.groupby("derived_id")["global_id"].nunique()
    violations = {
        str(k): sorted(df.loc[df["derived_id"] == k, "global_id"].unique().tolist())
        for k in grouped[grouped > 1].index
    }
    return {"ok": not violations, "violations": violations}
