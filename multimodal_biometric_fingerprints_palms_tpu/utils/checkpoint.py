"""Checkpoint utilities.

Two interchangeable backends for pytree checkpoints:
- msgpack (flax.serialization): single-file, used by the training loops
  (mirrors the reference's single-file .pth role, train_ssl.py:139-158);
- orbax: atomic directory checkpoints for production runs (safe against
  partial writes on interruption — the reference's KeyboardInterrupt
  checkpoint concern, segmentation/train.py:335-340).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from flax import serialization


def save_msgpack(path: str | Path, tree: Any) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(serialization.to_bytes(tree))
    tmp.replace(path)  # atomic rename
    return path


def load_msgpack(path: str | Path, template: Any) -> Any:
    return serialization.from_bytes(template, Path(path).read_bytes())


def save_orbax(path: str | Path, tree: Any) -> Path:
    import orbax.checkpoint as ocp
    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def load_orbax(path: str | Path, template: Any) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).resolve(), target=template)
