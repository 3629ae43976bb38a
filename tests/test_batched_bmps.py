"""Batched (lax.scan fitting) boundary MPS vs the generic engine and exact
contraction."""

import jax.numpy as jnp
import numpy as np

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import named_grid, random_tensornetworkstate
from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
from tensornetworkquantumsimulator_tpu.parallel import batched_from_tns
from tensornetworkquantumsimulator_tpu.parallel.boundarymps import make_grid_bmps


def _z(norm_fn, tensors):
    lz, ph = norm_fn(tensors)
    return float(np.exp(np.asarray(lz))) * np.exp(1j * float(np.asarray(ph)))


def test_grid_bmps_norm_and_expectations():
    nx = ny = 4
    chi = 3
    g = named_grid((nx, ny))
    psi = random_tensornetworkstate(jnp.complex128, g, "S=1/2", bond_dimension=chi)
    psi = tnqs.normalize(psi, alg="bp")
    spec, state = batched_from_tns(psi, chi=chi)

    z_exact = tnqs.norm_sqr(psi, alg="exact")

    # at matched rank the batched fitting agrees with the generic engine
    norm16, _ = make_grid_bmps(spec, nx, ny, kmps=16, niters=20)
    z_gen = tnqs.norm_sqr(psi, alg="boundarymps", mps_bond_dimension=16)
    np.testing.assert_allclose(np.real(_z(norm16, state.tensors)), np.real(z_gen), rtol=1e-4)



def test_grid_bmps_exact_at_full_rank():
    # width-3 interface: full rank is (χ²)^1 = 9, so K=9 is exact — a cheap
    # end-to-end exactness check of the fitting/contraction machinery
    nx, ny, chi = 4, 3, 3
    g = named_grid((nx, ny))
    psi = random_tensornetworkstate(jnp.complex128, g, "S=1/2", bond_dimension=chi)
    psi = tnqs.normalize(psi, alg="bp")
    spec, state = batched_from_tns(psi, chi=chi)
    z_exact = tnqs.norm_sqr(psi, alg="exact")
    norm9, expect9 = make_grid_bmps(spec, nx, ny, kmps=9, niters=12)
    np.testing.assert_allclose(
        np.real(_z(norm9, state.tensors)), np.real(z_exact), rtol=1e-9
    )
    z_vals = np.asarray(expect9(state.tensors, jnp.asarray(op_matrix("Z", 2))))
    for i, v in enumerate(spec.vertices):
        ref = tnqs.expect(psi, ("Z", [v]), alg="exact")
        np.testing.assert_allclose(z_vals[i], np.real(ref), atol=1e-9)


def test_grid_bmps_row_correlations_exact_at_full_rank():
    """Same-row two-point correlators through the BMPS environment match
    exact contraction at full interface rank (loop-aware, unlike BP)."""
    import pytest

    from tensornetworkquantumsimulator_tpu.parallel.boundarymps import (
        make_grid_bmps_correlations,
    )

    nx, ny, chi = 4, 3, 3
    g = named_grid((nx, ny))
    psi = random_tensornetworkstate(jnp.complex128, g, "S=1/2", bond_dimension=chi)
    psi = tnqs.normalize(psi, alg="bp")
    spec, state = batched_from_tns(psi, chi=chi)

    z = jnp.asarray(op_matrix("Z", 2))
    x = jnp.asarray(op_matrix("X", 2))
    pairs = [((2, 1), (2, 3)), ((1, 1), (1, 2)), ((4, 2), (4, 3))]
    corr = make_grid_bmps_correlations(spec, nx, ny, kmps=9, pairs=pairs, niters=12)
    got = np.asarray(corr(state.tensors, z, x))
    want = np.asarray(
        [tnqs.expect(psi, ("ZX", [a, b]), alg="exact") for a, b in pairs]
    )
    np.testing.assert_allclose(got, want, atol=1e-9)

    with pytest.raises(ValueError):
        make_grid_bmps_correlations(
            spec, nx, ny, kmps=4, pairs=[((1, 1), (1, 1))]
        )


def test_grid_bmps_cross_row_correlations_exact_at_full_rank():
    """Cross-row correlators: an op-inserted strand chain telescoped
    against the plain chain's fit scales matches exact contraction at
    full interface rank — including reversed vertex order (op1 at the
    upper row) and a light-cone column sharing one memoized chain."""
    from tensornetworkquantumsimulator_tpu.parallel.boundarymps import (
        make_grid_bmps_correlations,
    )

    nx, ny, chi = 4, 3, 3
    g = named_grid((nx, ny))
    psi = random_tensornetworkstate(jnp.complex128, g, "S=1/2", bond_dimension=chi)
    psi = tnqs.normalize(psi, alg="bp")
    spec, state = batched_from_tns(psi, chi=chi)

    z = jnp.asarray(op_matrix("Z", 2))
    x = jnp.asarray(op_matrix("X", 2))
    pairs = [
        ((1, 1), (2, 2)),   # adjacent rows
        ((1, 1), (3, 2)),   # distance-2 chain, shares the (1,1) prefix
        ((1, 1), (4, 3)),   # distance-3, same shared chain
        ((4, 3), (2, 1)),   # reversed order: op1 sits at the UPPER row
        ((2, 2), (3, 2)),   # same column, different rows
    ]
    corr = make_grid_bmps_correlations(spec, nx, ny, kmps=9, pairs=pairs, niters=12)
    got = np.asarray(corr(state.tensors, z, x))
    want = np.asarray(
        [tnqs.expect(psi, ("ZX", [a, b]), alg="exact") for a, b in pairs]
    )
    np.testing.assert_allclose(got, want, atol=1e-9)
