"""Device mesh helpers.

The reference has no distributed computing (SURVEY.md §2.10); the TPU-native
scaling axes are:
- ``gallery``: 1:N identification shards the (N, K, 7) template tensor
  across chips; all-pairs scoring all_gathers template blocks over ICI.
- ``data``: SSL/segmentation training shards the batch axis.

Meshes are 1-D by default (a v5e-8 slice); tests fake 8 devices on CPU via
``xla_force_host_platform_device_count``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: int | None = None, axis_name: str = "gallery") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def gallery_sharding(mesh: Mesh, axis_name: str = "gallery") -> NamedSharding:
    """Shard the leading (template) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
