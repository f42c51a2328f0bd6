"""Interpret-mode parity tests for the Pallas connected-components kernel."""

import numpy as np
import scipy.ndimage as ndi
import jax.numpy as jnp
import pytest

from multimodal_biometric_fingerprints_palms_tpu.ops.pallas_cc import (
    connected_components_pallas,
)
from multimodal_biometric_fingerprints_palms_tpu.ops.components import (
    connected_components,
)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("conn", [1, 2])
def test_pallas_cc_scipy_parity(seed, conn):
    x = np.random.default_rng(seed).random((48, 64)) > 0.55
    lab = np.asarray(connected_components_pallas(jnp.asarray(x), conn,
                                                 interpret=True))
    struct = (ndi.generate_binary_structure(2, 1) if conn == 1
              else np.ones((3, 3)))
    ref, n = ndi.label(x, structure=struct)
    assert len(np.unique(lab[x])) == n
    for l in np.unique(lab[x]):
        assert len(np.unique(ref[lab == l])) == 1
    # background convention
    assert (lab[~x] == 2 ** 30).all()


def test_pallas_cc_matches_xla(rng):
    x = rng.random((2, 32, 48)) > 0.5
    a = np.asarray(connected_components_pallas(jnp.asarray(x), 2,
                                               interpret=True))
    b = np.asarray(connected_components(jnp.asarray(x), 2))
    np.testing.assert_array_equal(a, b)
