"""Sample-axis-sharded certified sampling vs the single-chip sampler.

Each device draws its own block of samples with zero collectives; for the
same keys the bits, log q, and certificates must match the single-chip
vmapped sampler exactly (same kernel, same key path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    named_grid,
    tensornetworkstate,
)
from tensornetworkquantumsimulator_tpu.parallel import (
    batched_from_tns,
    make_grid_certified_sampler,
    make_sharded_sampler,
)


def test_sharded_sampler_matches_single_chip():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    nx, ny, chi = 4, 4, 2
    g = named_grid((nx, ny))
    # GHZ-ish entangled state: Hadamard+CZ layer on |0...0>
    psi = tensornetworkstate(jnp.complex128, lambda v: "↑", g, "S=1/2")
    circuit = [("H", [v]) for v in g.vertices()]
    circuit += [("CZ", pair) for pair in g.edges()]
    psi, _ = tnqs.apply_circuit(
        circuit, psi, apply_kwargs=dict(maxdim=chi, cutoff=1e-12)
    )
    psi = tnqs.normalize(psi, alg="bp")
    spec, state = batched_from_tns(psi, chi=chi)

    sampler = make_grid_certified_sampler(
        spec, nx, ny, norm_rank=4, projected_rank=4
    )
    keys = jax.random.split(jax.random.PRNGKey(7), 16)
    bits_r, logq_r, cert_r = sampler(state.tensors, keys)

    mesh = Mesh(np.array(devices[:8]), ("s",))
    sharded = make_sharded_sampler(sampler, mesh)
    bits_s, logq_s, cert_s = sharded(state.tensors, keys)

    np.testing.assert_array_equal(np.asarray(bits_s), np.asarray(bits_r))
    np.testing.assert_allclose(
        np.asarray(logq_s), np.asarray(logq_r), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(cert_s), np.asarray(cert_r), atol=1e-5
    )


def test_sharded_sampler_rejects_indivisible_batch():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    nx, ny, chi = 3, 3, 2
    g = named_grid((nx, ny))
    psi = tensornetworkstate(jnp.complex128, lambda v: "↑", g, "S=1/2")
    spec, state = batched_from_tns(psi, chi=chi)
    sampler = make_grid_certified_sampler(
        spec, nx, ny, norm_rank=2, projected_rank=2
    )
    mesh = Mesh(np.array(devices[:8]), ("s",))
    sharded = make_sharded_sampler(sampler, mesh)
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    with pytest.raises(ValueError, match="not divisible"):
        sharded(state.tensors, keys)


def test_sharded_rho_sampler_matches_single_chip():
    """Sample-axis SPMD density-matrix sampling: same keys -> same
    bitstrings and logps as the single-chip make_rho_sampler."""
    from tensornetworkquantumsimulator_tpu import (
        density_matrix_tensornetworkstate,
        edge_color,
        named_comb_tree,
    )
    from tensornetworkquantumsimulator_tpu.parallel.sampling import (
        make_rho_sampler,
        make_sharded_rho_sampler,
    )

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    g = named_comb_tree((3, 2))
    circuit = [("Rx", [v], 0.7) for v in g.vertices()]
    for grp in edge_color(g, 4):
        circuit += [("Rzz", p, 0.5) for p in grp]
    circuit += [("depolarizing", [v], 0.1) for v in g.vertices()]
    rho = density_matrix_tensornetworkstate(jnp.float64, lambda v: "0", g)
    rho, _ = tnqs.apply_circuit(
        circuit, rho,
        apply_kwargs=dict(maxdim=4, cutoff=0.0, normalize_tensors=False),
    )
    chi = 4
    spec, state = batched_from_tns(rho, chi=chi)
    sampler = make_rho_sampler(
        spec, chi, jnp.float64, refresh_iters=6, tolerance=1e-12
    )
    keys = jax.random.split(jax.random.PRNGKey(3), 16)
    bits_r, logp_r = sampler(state, keys)

    mesh = Mesh(np.array(devices[:8]), ("s",))
    sharded = make_sharded_rho_sampler(sampler, mesh)
    bits_s, logp_s = sharded(state, keys)
    np.testing.assert_array_equal(np.asarray(bits_s), np.asarray(bits_r))
    np.testing.assert_allclose(
        np.asarray(logp_s), np.asarray(logp_r), atol=1e-9
    )
    with pytest.raises(ValueError):
        sharded(state, keys[:7])
