"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from okvis2x_tpu.frontend.descriptor import DESC_BITS
from okvis2x_tpu.ops import hamming_pallas
import pytest

pytestmark = pytest.mark.smoke

RNG = np.random.default_rng(21)


def pack(bits):  # (N, 384) -> (N, 12) uint32
    b = bits.reshape(bits.shape[0], 12, 32).astype(np.uint32)
    return (b << np.arange(32, dtype=np.uint32)[None, None, :]).sum(-1).astype(
        np.uint32
    )


def test_packed_hamming_matches_reference():
    bits_q = RNG.integers(0, 2, (256, DESC_BITS))
    bits_d = RNG.integers(0, 2, (512, DESC_BITS))
    D = np.asarray(
        hamming_pallas.hamming_matrix_packed(
            jnp.asarray(pack(bits_q)), jnp.asarray(pack(bits_d)), interpret=True
        )
    )
    D_ref = (bits_q[:, None, :] != bits_d[None, :, :]).sum(-1)
    np.testing.assert_array_equal(D, D_ref)


def test_best_matches_packed():
    bits = RNG.integers(0, 2, (256, DESC_BITS))
    bits_d = bits.copy()
    for i in range(256):
        idx = RNG.integers(0, DESC_BITS, 7)
        bits_d[i, idx] ^= 1
    idx, d, ok = hamming_pallas.best_matches_packed(
        jnp.asarray(pack(bits)), jnp.asarray(pack(bits_d)), interpret=True
    )
    assert (np.asarray(idx) == np.arange(256)).all()
    assert np.asarray(d).max() <= 7
    assert bool(np.asarray(ok).all())
