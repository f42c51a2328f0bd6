"""Checkpoint backend round-trip tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from multimodal_biometric_fingerprints_palms_tpu.utils.checkpoint import (
    save_msgpack, load_msgpack, save_orbax, load_orbax,
)


def _tree():
    return {"params": {"w": jnp.arange(6.0).reshape(2, 3),
                       "b": jnp.zeros((3,))},
            "step": 7}


def test_msgpack_roundtrip(tmp_path):
    tree = _tree()
    p = save_msgpack(tmp_path / "ckpt.msgpack", tree)
    out = load_msgpack(p, tree)
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]),
                                  np.asarray(tree["params"]["w"]))
    assert out["step"] == 7


def test_orbax_roundtrip(tmp_path):
    tree = _tree()
    try:
        p = save_orbax(tmp_path / "ckpt_orbax", tree)
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"orbax unavailable: {e}")
    out = load_orbax(p, tree)
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]),
                                  np.asarray(tree["params"]["w"]))
