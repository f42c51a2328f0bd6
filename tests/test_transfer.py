"""utils/transfer.py: device pack/unpack must be np.packbits-compatible."""

import numpy as np
import jax.numpy as jnp

from multimodal_biometric_fingerprints_palms_tpu.utils.transfer import (
    device_packbits, device_unpackbits, device_to_u8,
    host_packbits, host_unpackbits)


def test_device_packbits_matches_numpy():
    g = np.random.default_rng(0)
    m = g.random((3, 16, 64)) < 0.3
    ours = np.asarray(device_packbits(jnp.asarray(m)))
    assert np.array_equal(ours, np.packbits(m, axis=-1))


def test_roundtrip_device_pack_host_unpack():
    g = np.random.default_rng(1)
    m = g.random((2, 32, 256)) < 0.5
    packed = np.asarray(device_packbits(jnp.asarray(m)))
    assert np.array_equal(host_unpackbits(packed, 256), m)


def test_roundtrip_host_pack_device_unpack():
    g = np.random.default_rng(2)
    m = g.random((2, 32, 128)) < 0.5
    un = np.asarray(device_unpackbits(jnp.asarray(host_packbits(m))))
    assert np.array_equal(un, m)


def test_device_to_u8_roundtrip():
    u8 = np.arange(256, dtype=np.uint8).reshape(16, 16)
    out = np.asarray(device_to_u8(jnp.asarray(u8.astype(np.float32) / 255.0)))
    assert np.array_equal(out, u8)
