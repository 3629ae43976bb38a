"""Ensemble (vmapped-trajectory) evolution: parametric field layers and
disorder realizations advancing in one program (`parallel/ensemble.py`).

Oracles: the generic engine with per-gate tuple circuits (the reference
semantics, `apply_gates.jl:42-92`), and per-realization single runs of
the same compiled layer."""

import jax.numpy as jnp
import numpy as np

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu.models.gates import gate_matrix, op_matrix
from tensornetworkquantumsimulator_tpu.models.tensornetwork import (
    tensornetworkstate,
)
from tensornetworkquantumsimulator_tpu.parallel import (
    batched_from_tns,
    ensemble_fn,
    local_expectations,
    make_ensemble_expectation_fn,
    make_field_layer_fn,
    rot1,
    rot2,
    stack_states,
    unstack_states,
)
from tensornetworkquantumsimulator_tpu.utils.lattices import named_grid


def test_rotation_builders_match_gate_matrix():
    for pauli, theta in [("X", 0.37), ("Y", -1.2), ("Z", 2.9)]:
        np.testing.assert_allclose(
            np.asarray(rot1(pauli, jnp.float64(theta))),
            gate_matrix("R" + pauli.lower(), theta),
            atol=1e-12,
        )
    for pp, phi in [("XX", 0.61), ("YY", -0.8), ("ZZ", 1.7)]:
        np.testing.assert_allclose(
            np.asarray(rot2(pp, jnp.float64(phi))),
            gate_matrix("R" + pp.lower(), phi),
            atol=1e-12,
        )


def _disorder_circuit(g, site_thetas, bond_thetas, edge_order):
    """Tuple circuit with per-site/per-edge angles in field-layer order."""
    circ = [("Rx", [v], float(site_thetas[i]))
            for i, v in enumerate(g.vertices())]
    circ += [("Rzz", list(e), float(bond_thetas[k]))
             for k, e in enumerate(edge_order)]
    return circ


def test_field_layer_matches_generic_disorder():
    """Per-site fields + per-edge couplings: the parametric layer agrees
    with the generic engine running the equivalent tuple circuit."""
    g = named_grid((3, 3))
    chi = 4
    rng = np.random.default_rng(7)
    psi0 = tensornetworkstate(jnp.complex128, lambda v: "↑", g, "S=1/2")
    spec, state = batched_from_tns(psi0, chi=chi)
    _, layer = make_field_layer_fn(
        g, chi=chi, spec=spec, bp_maxiter=60, bp_tolerance=1e-12,
    )
    V, E = spec.num_vertices, len(spec.edges)
    site_thetas = rng.uniform(0.2, 1.1, size=V)
    bond_thetas = rng.uniform(0.3, 0.9, size=E)

    for _ in range(2):
        state, errs = layer(state, jnp.asarray(site_thetas),
                            jnp.asarray(bond_thetas))
    z_b = local_expectations(spec, state, jnp.asarray(op_matrix("Z", 2)))

    edge_order = [
        (spec.vertices[iu], spec.vertices[iv]) for iu, iv, _, _ in spec.edges
    ]
    circ = _disorder_circuit(g, site_thetas, bond_thetas, edge_order)
    psi = psi0
    for _ in range(2):
        psi, _ = tnqs.apply_circuit(
            circ, psi,
            apply_kwargs=dict(maxdim=chi, cutoff=1e-12,
                              normalize_tensors=True),
            bp_update_kwargs=dict(maxiter=60, tolerance=1e-12),
        )
    z_g = [tnqs.expect(psi, ("Z", [v]), alg="bp") for v in g.vertices()]
    np.testing.assert_allclose(
        np.real(np.asarray(z_b)), np.real(np.asarray(z_g)), atol=5e-7
    )


def test_ensemble_vmap_matches_single_runs():
    """E realizations vmapped in one program == E independent runs."""
    g = named_grid((3, 3))
    chi, E = 3, 3
    rng = np.random.default_rng(11)
    psi0 = tensornetworkstate(jnp.complex128, lambda v: "↑", g, "S=1/2")
    spec, s0 = batched_from_tns(psi0, chi=chi)
    # tolerance=0.0 → fixed-trip BP, so vmapped and single runs execute
    # the identical iteration count per lane
    _, layer = make_field_layer_fn(
        g, chi=chi, spec=spec, bp_maxiter=25, bp_tolerance=0.0,
    )
    V, Eb = spec.num_vertices, len(spec.edges)
    site = jnp.asarray(rng.uniform(0.1, 1.0, size=(E, V)))
    bond = jnp.asarray(rng.uniform(0.2, 0.8, size=(E, Eb)))

    estate = stack_states([s0] * E)
    elayer = ensemble_fn(layer)
    estate, eerrs = elayer(estate, site, bond)
    assert eerrs.shape[0] == E

    expect_fn = make_ensemble_expectation_fn(spec, op_matrix("Z", 2))
    z_ens = np.asarray(expect_fn(estate))
    assert z_ens.shape == (E, V)

    for i in range(E):
        si, errs_i = layer(s0, site[i], bond[i])
        z_i = local_expectations(spec, si, jnp.asarray(op_matrix("Z", 2)))
        np.testing.assert_allclose(z_ens[i], np.real(np.asarray(z_i)),
                                   atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(eerrs[i]), np.asarray(errs_i), atol=1e-10
        )

    # round trip
    singles = unstack_states(estate)
    assert len(singles) == E
    np.testing.assert_allclose(
        np.asarray(singles[1].tensors), np.asarray(estate.tensors[1])
    )


def test_ensemble_broadcast_shared_angles():
    """in_axes broadcasting: shared angles across the ensemble axis."""
    g = named_grid((2, 2))
    chi, E = 2, 2
    psi0 = tensornetworkstate(jnp.complex128, lambda v: "↑", g, "S=1/2")
    spec, s0 = batched_from_tns(psi0, chi=chi)
    _, layer = make_field_layer_fn(
        g, chi=chi, spec=spec, bp_maxiter=20, bp_tolerance=0.0,
    )
    elayer = ensemble_fn(layer, in_axes=(0, None, None))
    estate = stack_states([s0] * E)
    estate, _ = elayer(estate, 0.4, 0.7)
    expect_fn = make_ensemble_expectation_fn(spec, op_matrix("Z", 2),
                                             real_output=True)
    z = np.asarray(expect_fn(estate))
    # identical initial states + shared angles → identical realizations
    np.testing.assert_allclose(z[0], z[1], atol=1e-12)


def test_ensemble_axis_shards_over_mesh():
    """The ensemble axis is embarrassingly parallel: sharding estate one
    realization per device compiles and runs under auto-SPMD."""
    import jax
    import pytest
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.array(jax.devices()[:8])
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    g = named_grid((3, 3))
    chi, E = 2, 8
    psi0 = tensornetworkstate(jnp.complex64, lambda v: "↑", g, "S=1/2")
    spec, s0 = batched_from_tns(psi0, chi=chi)
    _, layer = make_field_layer_fn(
        g, chi=chi, spec=spec, bp_maxiter=5, bp_tolerance=1e-6, jit=False,
    )
    mesh = Mesh(devices, ("e",))
    sh = NamedSharding(mesh, P("e"))
    estate = jax.device_put(stack_states([s0] * E), sh)
    rng = np.random.default_rng(3)
    site = jax.device_put(
        jnp.asarray(rng.uniform(0.1, 0.9, (E, spec.num_vertices)),
                    jnp.float32), sh)
    bond = jax.device_put(
        jnp.asarray(rng.uniform(0.1, 0.9, (E, len(spec.edges))),
                    jnp.float32), sh)
    estate, _ = ensemble_fn(layer)(estate, site, bond)
    z = make_ensemble_expectation_fn(spec, op_matrix("Z", 2),
                                     real_output=True)(estate)
    assert np.all(np.isfinite(np.asarray(z))) and z.shape == (
        E, spec.num_vertices)


def test_field_layer_heavyhex_matches_generic():
    """Degree-3 lattice (multiple slot pairs per color group): the
    parametric layer still matches the generic engine."""
    from tensornetworkquantumsimulator_tpu.utils.lattices import (
        heavy_hexagonal_lattice,
    )

    g = heavy_hexagonal_lattice(1, 1)
    chi = 3
    rng = np.random.default_rng(13)
    psi0 = tensornetworkstate(jnp.complex128, lambda v: "↑", g, "S=1/2")
    spec, state = batched_from_tns(psi0, chi=chi)
    _, layer = make_field_layer_fn(
        g, chi=chi, spec=spec, bp_maxiter=60, bp_tolerance=1e-12,
    )
    V, E = spec.num_vertices, len(spec.edges)
    site_thetas = rng.uniform(0.2, 0.9, size=V)
    bond_thetas = rng.uniform(0.2, 0.7, size=E)
    state, _ = layer(state, jnp.asarray(site_thetas),
                     jnp.asarray(bond_thetas))
    z_b = local_expectations(spec, state, jnp.asarray(op_matrix("Z", 2)))

    edge_order = [
        (spec.vertices[iu], spec.vertices[iv]) for iu, iv, _, _ in spec.edges
    ]
    circ = _disorder_circuit(g, site_thetas, bond_thetas, edge_order)
    psi, _ = tnqs.apply_circuit(
        circ, psi0,
        apply_kwargs=dict(maxdim=chi, cutoff=1e-12, normalize_tensors=True),
        bp_update_kwargs=dict(maxiter=60, tolerance=1e-12),
    )
    z_g = [tnqs.expect(psi, ("Z", [v]), alg="bp") for v in g.vertices()]
    np.testing.assert_allclose(
        np.real(np.asarray(z_b)), np.real(np.asarray(z_g)), atol=5e-7
    )


def test_ensemble_certified_sampling_composes():
    """vmap composability: one certified-sampling program draws from every
    realization of an evolved ensemble."""
    import jax

    from tensornetworkquantumsimulator_tpu.parallel import (
        make_grid_certified_sampler,
    )

    nx, ny, chi, E = 3, 3, 2, 3
    g = named_grid((nx, ny))
    psi0 = tensornetworkstate(jnp.complex64, lambda v: "↑", g, "S=1/2")
    spec, s0 = batched_from_tns(psi0, chi=chi)
    _, layer = make_field_layer_fn(
        g, chi=chi, spec=spec, bp_maxiter=10, jit=False,
    )
    rng = np.random.default_rng(17)
    site = jnp.asarray(rng.uniform(0.1, 0.6, (E, spec.num_vertices)),
                       jnp.float32)
    bond = jnp.asarray(rng.uniform(0.1, 0.6, (E, len(spec.edges))),
                       jnp.float32)
    estate, _ = ensemble_fn(layer)(stack_states([s0] * E), site, bond)

    sampler = make_grid_certified_sampler(
        spec, nx, ny, norm_rank=2, projected_rank=2
    )
    n_samples = 4
    keys = jax.random.split(jax.random.PRNGKey(0), (E, n_samples))
    bits, logq, log_poverq = jax.jit(jax.vmap(sampler))(
        estate.tensors, keys
    )
    assert bits.shape[:2] == (E, n_samples)
    assert np.all(np.isfinite(np.asarray(logq)))
    assert np.all(np.isfinite(np.asarray(log_poverq)))


def test_field_layer_multi_site_paulis_matches_generic():
    """site_pauli=("X","Z") (kicked-Ising with longitudinal field)."""
    g = named_grid((3, 3))
    chi = 3
    rng = np.random.default_rng(23)
    psi0 = tensornetworkstate(jnp.complex128, lambda v: "↑", g, "S=1/2")
    spec, state = batched_from_tns(psi0, chi=chi)
    _, layer = make_field_layer_fn(
        g, chi=chi, spec=spec, site_pauli=("X", "Z"),
        bp_maxiter=60, bp_tolerance=1e-12,
    )
    V, E = spec.num_vertices, len(spec.edges)
    thetas = rng.uniform(0.2, 0.9, size=(2, V))
    bond = rng.uniform(0.2, 0.7, size=E)
    state, _ = layer(state, jnp.asarray(thetas), jnp.asarray(bond))
    z_b = local_expectations(spec, state, jnp.asarray(op_matrix("Z", 2)))

    verts = list(g.vertices())
    circ = [("Rx", [v], float(thetas[0, i])) for i, v in enumerate(verts)]
    circ += [("Rz", [v], float(thetas[1, i])) for i, v in enumerate(verts)]
    circ += [
        ("Rzz", [spec.vertices[iu], spec.vertices[iv]], float(bond[k]))
        for k, (iu, iv, _, _) in enumerate(spec.edges)
    ]
    psi, _ = tnqs.apply_circuit(
        circ, psi0,
        apply_kwargs=dict(maxdim=chi, cutoff=1e-12, normalize_tensors=True),
        bp_update_kwargs=dict(maxiter=60, tolerance=1e-12),
    )
    z_g = [tnqs.expect(psi, ("Z", [v]), alg="bp") for v in verts]
    np.testing.assert_allclose(
        np.real(np.asarray(z_b)), np.real(np.asarray(z_g)), atol=5e-7
    )


def test_multi_pauli_ambiguous_site_thetas_raises():
    """S rotations on S vertices: a 1-D length-S theta vector is ambiguous
    and must be rejected (it would broadcast into wrong gates)."""
    import pytest

    g = named_grid((2, 1))  # V = 2
    spec, s0 = batched_from_tns(
        tensornetworkstate(jnp.complex128, lambda v: "↑", g, "S=1/2"), chi=2
    )
    _, layer = make_field_layer_fn(
        g, chi=2, spec=spec, site_pauli=("X", "Z"), bp_maxiter=5, jit=False,
    )
    with pytest.raises(ValueError, match="ambiguous"):
        layer(s0, jnp.asarray([0.3, 0.4]), 0.5)
