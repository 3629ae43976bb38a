"""Mirrors reference `test/test_beliefpropagation.jl`: BP is exact on trees,
matches the exact partition function / norm / RDM there."""

import jax.numpy as jnp
import numpy as np
import pytest

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    BeliefPropagationCache,
    TensorNetwork,
    TensorNetworkState,
    named_comb_tree,
    random_tensornetwork,
    random_tensornetworkstate,
)

DTYPES = [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]


def _rtol(dtype):
    return 5e-4 if jnp.dtype(dtype).itemsize <= 8 and jnp.finfo(
        jnp.zeros((), dtype).real.dtype
    ).bits == 32 else 1e-8


@pytest.mark.parametrize("dtype", DTYPES)
def test_bp_flat_network_tree(dtype):
    g = named_comb_tree((3, 3))
    psi = random_tensornetwork(dtype, g, bond_dimension=2)
    bpc = BeliefPropagationCache(psi)
    assert isinstance(bpc.network(), TensorNetwork)
    assert bpc.graph() == g
    assert not bpc.messages()

    bpc = bpc.update()
    assert len(bpc.messages()) == 2 * len(g.edges())
    z_bp = bpc.partitionfunction()
    z_exact = tnqs.contract(psi, alg="exact")
    np.testing.assert_allclose(z_bp, z_exact, rtol=_rtol(dtype))
    np.testing.assert_allclose(
        tnqs.contract(psi, alg="bp"), z_exact, rtol=_rtol(dtype)
    )


@pytest.mark.parametrize("dtype", DTYPES)
def test_bp_state_tree(dtype):
    g = named_comb_tree((3, 3))
    psi = random_tensornetworkstate(dtype, g, bond_dimension=2)
    bpc = BeliefPropagationCache(psi)
    assert isinstance(bpc.network(), TensorNetworkState)
    bpc = bpc.update()
    z_bp = bpc.partitionfunction()
    z_exact = tnqs.norm_sqr(psi, alg="exact")
    np.testing.assert_allclose(z_bp, z_exact, rtol=_rtol(dtype))
    np.testing.assert_allclose(
        tnqs.norm_sqr(psi, alg="bp"), z_exact, rtol=_rtol(dtype)
    )

    vc = g.center()[0]
    rho_bp = tnqs.reduced_density_matrix(psi, vc, alg="bp")
    rho_exact = tnqs.reduced_density_matrix(psi, vc, alg="exact")
    diff = rho_bp - rho_exact  # indices align by name
    eps = float(jnp.finfo(jnp.zeros((), dtype).real.dtype).eps)
    assert diff.norm() <= 100 * eps
