"""Pallas kernel prototypes (interpret mode on CPU; hardware numbers via
scripts/microbench.py)."""

import numpy as np
import jax.numpy as jnp

from tensornetworkquantumsimulator_tpu.parallel.pallas_kernels import (
    complex_matmul,
)


def test_gauss_complex_matmul_matches_xla():
    rng = np.random.default_rng(3)
    a = (
        rng.standard_normal((3, 128, 128))
        + 1j * rng.standard_normal((3, 128, 128))
    ).astype(np.complex64)
    b = (
        rng.standard_normal((3, 128, 128))
        + 1j * rng.standard_normal((3, 128, 128))
    ).astype(np.complex64)
    c = complex_matmul(jnp.asarray(a), jnp.asarray(b), interpret=True)
    ref = a @ b
    assert np.abs(np.asarray(c) - ref).max() / np.abs(ref).max() < 1e-5


def test_gauss_complex_matmul_rectangular():
    rng = np.random.default_rng(4)
    a = (
        rng.standard_normal((2, 64, 128))
        + 1j * rng.standard_normal((2, 64, 128))
    ).astype(np.complex64)
    b = (
        rng.standard_normal((2, 128, 256))
        + 1j * rng.standard_normal((2, 128, 256))
    ).astype(np.complex64)
    c = complex_matmul(jnp.asarray(a), jnp.asarray(b), interpret=True)
    ref = a @ b
    assert np.abs(np.asarray(c) - ref).max() / np.abs(ref).max() < 1e-5
