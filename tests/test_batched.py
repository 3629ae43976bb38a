"""Cross-validation of the batched (jit/vmap) TPU engine against the generic
engine: flooding BP vs sequential BP, batched simple update vs per-gate
simple update, full Trotter layers vs `apply_gates`."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    BeliefPropagationCache,
    edge_color,
    named_grid,
    random_tensornetworkstate,
    tensornetworkstate,
)
from tensornetworkquantumsimulator_tpu.parallel import (
    BatchedCircuit,
    batched_from_tns,
    batched_to_tns,
    bp_update,
    compile_graph,
    local_expectations,
    make_expectation_fn,
    make_layer_fn,
)
from tensornetworkquantumsimulator_tpu.models.sites import op_matrix


def _tfim_layer(g, dt=0.25, hx=1.0, hz=0.8, J=0.5):
    layer = []
    layer += [("Rx", [v], 2 * hx * dt) for v in g.vertices()]
    layer += [("Rz", [v], 2 * hz * dt) for v in g.vertices()]
    for colored_edges in edge_color(g, 4):
        layer += [("Rzz", pair, 2 * J * dt) for pair in colored_edges]
    return layer


def test_flooding_bp_matches_sequential():
    g = named_grid((3, 3))
    psi = random_tensornetworkstate(jnp.float64, g, bond_dimension=3)
    spec, state = batched_from_tns(psi, chi=3)
    state = bp_update(spec, state, maxiter=100, tolerance=1e-14)

    # batched single-site expectations vs generic BP expectations
    z = local_expectations(spec, state, jnp.asarray(op_matrix("Z", 2)))
    z_ref = [
        tnqs.expect(
            psi,
            ("Z", [v]),
            alg="bp",
            cache_update_kwargs=dict(maxiter=200, tolerance=1e-14),
        )
        for v in spec.vertices
    ]
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-7)


def test_batched_layer_matches_generic_apply():
    g = named_grid((3, 3))
    chi = 4
    psi0 = tensornetworkstate(jnp.complex128, lambda v: "↑", g, "S=1/2")
    layer = _tfim_layer(g)

    # generic engine
    psi = psi0
    for _ in range(2):
        psi, errs_g = tnqs.apply_circuit(
            layer,
            psi,
            apply_kwargs=dict(maxdim=chi, cutoff=1e-12, normalize_tensors=True),
            bp_update_kwargs=dict(maxiter=60, tolerance=1e-12),
        )
    vs = list(g.vertices())
    z_generic = [tnqs.expect(psi, ("Z", [v]), alg="bp") for v in vs]

    # batched engine
    spec, state = batched_from_tns(psi0, chi=chi)
    circuit = BatchedCircuit(layer, g, spec=spec)
    layer_fn = make_layer_fn(
        circuit, chi=chi, cutoff=1e-12, normalize_tensors=True,
        bp_maxiter=60, bp_tolerance=1e-12,
    )
    for _ in range(2):
        state, errs_b = layer_fn(state)
    z_batched = local_expectations(spec, state, jnp.asarray(op_matrix("Z", 2)))

    np.testing.assert_allclose(
        np.real(np.asarray(z_batched)), np.real(np.asarray(z_generic)),
        atol=5e-7,
    )

    # unpack round trip: norms agree
    psi_b = batched_to_tns(spec, state, g, psi0.siteinds())
    n_b = tnqs.norm_sqr(psi_b, alg="bp")
    n_g = tnqs.norm_sqr(psi, alg="bp")
    np.testing.assert_allclose(n_b, n_g, rtol=1e-6)


def test_batched_layer_multichip_shards():
    """The layer function compiles and runs under a mesh sharding over the
    vertex axis (8 virtual CPU devices from conftest)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.array(jax.devices()[:8])
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    g = named_grid((8, 8))
    chi = 2
    psi0 = tensornetworkstate(jnp.complex64, lambda v: "↑", g, "S=1/2")
    spec, state = batched_from_tns(psi0, chi=chi)
    layer = _tfim_layer(g)
    circuit = BatchedCircuit(layer, g, spec=spec)
    layer_fn = make_layer_fn(circuit, chi=chi, bp_maxiter=10)

    mesh = Mesh(devices, ("v",))
    shard = NamedSharding(mesh, P("v"))
    state = jax.device_put(state, shard)
    state, errs = layer_fn(state)
    z = local_expectations(spec, state, jnp.asarray(op_matrix("Z", 2)))
    assert np.all(np.isfinite(np.asarray(z)))


def test_batched_bond_expectations():
    from tensornetworkquantumsimulator_tpu.parallel import bond_expectations
    from tensornetworkquantumsimulator_tpu import random_tensornetworkstate

    g = named_grid((3, 3))
    psi = random_tensornetworkstate(jnp.float64, g, bond_dimension=3)
    spec, state = batched_from_tns(psi, chi=3)
    state = bp_update(spec, state, maxiter=150, tolerance=1e-14)
    zz = bond_expectations(
        spec, state,
        jnp.asarray(op_matrix("Z", 2)), jnp.asarray(op_matrix("Z", 2)),
    )
    for pos, (iu, iv, su, sv) in enumerate(spec.edges):
        u, v = spec.vertices[iu], spec.vertices[iv]
        ref = tnqs.expect(
            psi, ("ZZ", [u, v]), alg="bp",
            cache_update_kwargs=dict(maxiter=300, tolerance=1e-15),
        )
        np.testing.assert_allclose(float(np.real(zz[pos])), np.real(ref), atol=2e-6)


def test_scan_groups_layer_matches_unrolled():
    """`make_layer_fn(scan_groups=True)` folds the per-color-group
    subprograms into one `lax.scan` body; the result must match the
    unrolled layer to fp roundoff (same kernel content, only
    gather/write-back differ)."""
    g = named_grid((4, 4))
    chi = 3
    psi0 = tensornetworkstate(jnp.complex128, lambda v: "↑", g, "S=1/2")
    layer = _tfim_layer(g)
    spec, state0 = batched_from_tns(psi0, chi=chi)
    circuit = BatchedCircuit(layer, g, spec=spec)
    kw = dict(
        chi=chi, cutoff=1e-12, normalize_tensors=True,
        bp_maxiter=40, bp_tolerance=1e-12,
    )
    unrolled = make_layer_fn(circuit, **kw)
    scanned = make_layer_fn(circuit, scan_groups=True, **kw)
    from tensornetworkquantumsimulator_tpu.parallel.trotter import _scan_plan

    assert _scan_plan(circuit, spec.num_vertices) is not None

    s_a, s_b = state0, state0
    for _ in range(2):
        s_a, errs_a = unrolled(s_a)
        s_b, errs_b = scanned(s_b)
    np.testing.assert_allclose(
        np.asarray(s_b.tensors), np.asarray(s_a.tensors), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(s_b.messages), np.asarray(s_a.messages), atol=1e-10
    )
    # valid truncation errors agree (the scan pads with zero-err lanes)
    assert np.isclose(
        float(jnp.sum(errs_a)), float(jnp.sum(errs_b)), atol=1e-12
    )


def test_scan_groups_heavyhex_matches_unrolled():
    """The flagship heavy-hex lattice (degree-3, non-grid) through the
    scan-groups compiler."""
    from tensornetworkquantumsimulator_tpu import heavy_hexagonal_lattice

    g = heavy_hexagonal_lattice(2, 2)
    chi = 2
    psi0 = tensornetworkstate(jnp.complex128, lambda v: "↑", g, "S=1/2")
    layer = []
    layer += [("Rx", [v], 0.4) for v in g.vertices()]
    for colored_edges in edge_color(g, 3):
        layer += [("Rzz", pair, 0.3) for pair in colored_edges]
    spec, state0 = batched_from_tns(psi0, chi=chi)
    circuit = BatchedCircuit(layer, g, spec=spec)
    kw = dict(chi=chi, bp_maxiter=30, bp_tolerance=1e-12)
    unrolled = make_layer_fn(circuit, **kw)
    scanned = make_layer_fn(circuit, scan_groups=True, **kw)

    s_a, _ = unrolled(state0)
    s_b, _ = scanned(state0)
    np.testing.assert_allclose(
        np.asarray(s_b.tensors), np.asarray(s_a.tensors), atol=1e-10
    )
