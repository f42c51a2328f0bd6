"""Config system.

Mirrors the reference's four YAML surfaces (config/config_fingerprint.yml,
config_classifier.yml, config_matching.yml, config_segmentation.yml) but with
one loader style instead of three (reference: module constants in
config_fingerprint.py, SimpleNamespace tree in config_classifier.py:5-25,
raw dicts in match_features.py:78).

Defects of the reference deliberately NOT reproduced (SURVEY.md §5 config):
- flat-key reads that dead-ended config_matching.yml's nested values
  (match_features.py:81-84): here nested keys resolve properly;
- hard-coded values shadowing config (CLAHE 2.5 vs configured 2.0,
  fingerprint_preprocess.py:26): here stage params come from the config.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import yaml


class ConfigNode(Mapping):
    """Immutable-ish attribute/dict hybrid view over nested YAML.

    Supports ``cfg.ransac.max_iterations``, ``cfg["ransac"]["max_iterations"]``
    and dotted ``cfg.get("ransac.max_iterations", default)``.
    """

    def __init__(self, data: dict[str, Any]):
        object.__setattr__(self, "_data", dict(data))

    # -- Mapping protocol -------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        val = self._data[key]
        return ConfigNode(val) if isinstance(val, dict) else val

    def __iter__(self):
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    # -- attribute access --------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def get(self, key: str, default: Any = None) -> Any:
        """Dotted-path lookup: ``cfg.get("ransac.seed", 42)``."""
        node: Any = self._data
        for part in key.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return ConfigNode(node) if isinstance(node, dict) else node

    def to_dict(self) -> dict[str, Any]:
        return dict(self._data)

    def __repr__(self) -> str:
        return f"ConfigNode({self._data!r})"


def _repo_root() -> Path:
    return Path(__file__).resolve().parents[2]


def load_yaml_config(path: str | Path) -> ConfigNode:
    path = Path(path)
    if not path.is_absolute():
        path = _repo_root() / path
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    return ConfigNode(data)


def _resolve_paths(cfg: dict[str, Any], root: Path) -> dict[str, Any]:
    """Absolutize ``./``-relative entries under a ``paths`` section
    (reference behavior: config_classifier.py:10-16)."""
    paths = cfg.get("paths")
    if isinstance(paths, dict):
        root_dir = Path(paths.get("root_dir", root))
        if not root_dir.is_absolute():
            root_dir = root / root_dir
        for k, v in list(paths.items()):
            if isinstance(v, str) and v.startswith("./"):
                paths[k] = str(root_dir / v[2:])
        paths["root_dir"] = str(root_dir)
    return cfg


def _load(named_default: str, path: str | Path | None) -> ConfigNode:
    cfg_path = Path(path) if path else _repo_root() / "configs" / named_default
    cfg = load_yaml_config(cfg_path)
    data = _resolve_paths(cfg.to_dict(), _repo_root())
    return ConfigNode(data)


def load_fingerprint_config(path: str | Path | None = None) -> ConfigNode:
    """Preprocessing/binarization/orientation params
    (reference: config/config_fingerprint.yml:1-50)."""
    return _load("config_fingerprint.yml", path)


def load_classifier_config(path: str | Path | None = None) -> ConfigNode:
    """SSL classifier params (reference: config/config_classifier.yml:1-83)."""
    return _load("config_classifier.yml", path)


def load_matching_config(path: str | Path | None = None) -> ConfigNode:
    """Matching/RANSAC/eval params (reference: config/config_matching.yml:1-29)."""
    return _load("config_matching.yml", path)


def load_segmentation_config(path: str | Path | None = None) -> ConfigNode:
    """UNet++ segmentation training params
    (reference: config/config_segmentation.yml:1-76)."""
    return _load("config_segmentation.yml", path)


def print_config_summary(cfg: ConfigNode, title: str = "config") -> None:
    """Console dump of a config tree (reference:
    config_fingerprint.py:31)."""
    print(f"===== {title} =====")

    def walk(node, indent=0):
        for k in node:
            v = node[k]
            if isinstance(v, ConfigNode):
                print("  " * indent + f"{k}:")
                walk(v, indent + 1)
            else:
                print("  " * indent + f"{k}: {v}")

    walk(cfg)
