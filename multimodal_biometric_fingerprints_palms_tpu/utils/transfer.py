"""Host↔device transfer packing.

The file pipeline's cost on this TPU host is bytes on the wire, not
compute: the relay link moves ~12 MB/s, and the original runners moved the
full float32 stage images both directions (≈335 MB per 128-image batch
down), burying the 553 img/s device pipeline under minutes of transfer
(docs/PERF.md). All images therefore cross the link as uint8 and all
boolean masks as bit-packed uint8 (8 pixels/byte, np.packbits 'big' bit
order); the pack/unpack arithmetic runs on device where it is free.

This is the right layout on real hardware too — PCIe moves 4–32× fewer
bytes per image, and the host-side unpack (np.unpackbits) is memcpy-speed.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# np.packbits / np.unpackbits default bit order ('big'): bit 7 first.
_PACK_W = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
_UNPACK_SHIFTS = jnp.array([7, 6, 5, 4, 3, 2, 1, 0], jnp.int32)


def device_packbits(mask: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) bool → (..., H, W//8) uint8, np.packbits-compatible.
    W must be a multiple of 8 (canonical shapes are multiples of 32)."""
    w = mask.shape[-1]
    b = mask.astype(jnp.int32).reshape(mask.shape[:-1] + (w // 8, 8))
    return jnp.sum(b * _PACK_W, axis=-1).astype(jnp.uint8)


def device_unpackbits(packed: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W//8) uint8 → (..., H, W) bool (np.unpackbits semantics)."""
    x = packed.astype(jnp.int32)[..., None]
    bits = jnp.bitwise_and(jnp.right_shift(x, _UNPACK_SHIFTS), 1)
    return bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,)) > 0


def device_to_u8(img: jnp.ndarray) -> jnp.ndarray:
    """float [0,1] → uint8 on device (rounding like the u8 file formats)."""
    return jnp.round(jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def host_unpackbits(packed: np.ndarray, width: int) -> np.ndarray:
    """uint8 (..., H, W//8) → bool (..., H, width) on the host."""
    return np.unpackbits(np.asarray(packed), axis=-1)[..., :width] > 0


def host_packbits(mask: np.ndarray) -> np.ndarray:
    """bool (..., H, W) → uint8 (..., H, ceil(W/8)) on the host."""
    return np.packbits(np.asarray(mask).astype(bool), axis=-1)
