"""Batched certified sampler vs physics oracles and the generic engine."""

import jax
import jax.numpy as jnp
import numpy as np

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    named_grid,
    random_tensornetworkstate,
    siteinds,
    tensornetworkstate,
)
from tensornetworkquantumsimulator_tpu.parallel import batched_from_tns
from tensornetworkquantumsimulator_tpu.parallel.certified_sampling import (
    make_grid_certified_sampler,
)


def test_product_state_certified():
    g = named_grid((3, 3))
    psi = tensornetworkstate(jnp.complex128, lambda v: "↓", g)
    psi = tnqs.gauge_and_scale(psi)
    spec, state = batched_from_tns(psi, chi=2)
    sampler = make_grid_certified_sampler(spec, 3, 3, norm_rank=4, projected_rank=4)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    bits, logq, log_pq = sampler(state.tensors, keys)
    bits = np.asarray(bits)
    assert np.all(bits == 1)
    # q(x) = 1 for a product state, and p/q = |<x|psi>|^2 = 1 (normalized)
    np.testing.assert_allclose(np.asarray(logq), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(log_pq), 0.0, atol=1e-4)


def test_ghz_certified():
    g = named_grid((3, 3))
    s = siteinds("S=1/2", g)
    psi1 = tensornetworkstate(jnp.float64, lambda v: "↑", g, s)
    psi2 = tensornetworkstate(jnp.float64, lambda v: "↓", g, s)
    psi = tnqs.gauge_and_scale(psi1 + psi2)
    spec, state = batched_from_tns(psi, chi=2)
    sampler = make_grid_certified_sampler(spec, 3, 3, norm_rank=4, projected_rank=4)
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    bits, logq, log_pq = sampler(state.tensors, keys)
    bits = np.asarray(bits).reshape(8, -1)
    for row in bits:
        assert np.all(row == row[0])
    # p/q is constant (= <psi|psi>) when sampling is exact
    pq = np.exp(np.asarray(log_pq))
    assert np.std(pq) < 1e-4
    np.testing.assert_allclose(
        np.mean(pq), tnqs.norm_sqr(psi, alg="exact"), rtol=1e-4
    )


def test_random_state_certified_weights():
    """On a random (loopy) state with full ranks, p/q must be flat."""
    g = named_grid((3, 3))
    psi = random_tensornetworkstate(jnp.complex128, g, "S=1/2", bond_dimension=2)
    psi = tnqs.gauge_and_scale(psi)
    spec, state = batched_from_tns(psi, chi=2)
    sampler = make_grid_certified_sampler(
        spec, 3, 3, norm_rank=16, projected_rank=8, niters=20
    )
    keys = jax.random.split(jax.random.PRNGKey(2), 6)
    bits, logq, log_pq = sampler(state.tensors, keys)
    pq = np.exp(np.asarray(log_pq))
    # exact norm strands on a 3-wide interface: importance weights ≈ <psi|psi>
    np.testing.assert_allclose(
        pq, tnqs.norm_sqr(psi, alg="exact"), rtol=1e-3
    )
