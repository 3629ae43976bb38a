"""Batched engine on non-square lattices: heavy-hex (degree 3, mixed slot
buckets) and 3D periodic torus (degree 6), cross-validated against the
generic engine."""

import jax.numpy as jnp
import numpy as np
import pytest

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    edge_color,
    heavy_hexagonal_lattice,
    named_grid,
    tensornetworkstate,
)
from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
from tensornetworkquantumsimulator_tpu.parallel import (
    BatchedCircuit,
    batched_product_state,
    local_expectations,
    make_layer_fn,
)


def _check_lattice(g, layer, chi, obs_v, atol=5e-6, nl=1):
    psi0 = tensornetworkstate(jnp.complex128, lambda v: "↑", g, "S=1/2")
    psi = psi0
    for _ in range(nl):
        psi, _ = tnqs.apply_circuit(
            layer,
            psi,
            apply_kwargs=dict(maxdim=chi, cutoff=1e-12, normalize_tensors=True),
            bp_update_kwargs=dict(maxiter=80, tolerance=1e-13),
        )
    z_ref = tnqs.expect(
        psi, ("Z", [obs_v]), alg="bp",
        cache_update_kwargs=dict(maxiter=200, tolerance=1e-14),
    )

    spec, state = batched_product_state(g, chi=chi, dtype=np.complex128)
    circuit = BatchedCircuit(layer, g, spec=spec)
    layer_fn = make_layer_fn(
        circuit, chi=chi, cutoff=1e-12, bp_maxiter=100, bp_tolerance=1e-13
    )
    for _ in range(nl):
        state, _ = layer_fn(state)
    from tensornetworkquantumsimulator_tpu.parallel import bp_update

    state = bp_update(spec, state, maxiter=200, tolerance=1e-14)
    z = local_expectations(spec, state, jnp.asarray(op_matrix("Z", 2)))
    z_b = complex(z[spec.vertex_position(obs_v)])
    np.testing.assert_allclose(np.real(z_b), np.real(z_ref), atol=atol)


def test_heavyhex_batched_matches_generic():
    g = heavy_hexagonal_lattice(2, 2)
    layer = [("Rx", [v], 0.4) for v in g.vertices()]
    for group in edge_color(g, 3):
        layer += [("Rzz", pair, 0.6) for pair in group]
    vc = sorted(g.vertices())[len(g.vertices()) // 2]
    _check_lattice(g, layer, chi=4, obs_v=vc, nl=2)


def test_3d_torus_batched_matches_generic():
    g = named_grid((3, 3, 3), periodic=True)
    layer = [("Rz", [v], -0.04) for v in g.vertices()]
    for group in edge_color(g, 7):
        layer += [("Rxx", pair, -0.08) for pair in group]
    vc = g.center()[0]
    _check_lattice(g, layer, chi=3, obs_v=vc, nl=1, atol=2e-5)


def test_batched_heisenberg_picture():
    """Batched evolution of a Pauli-basis operator state (d=4 PTM gates)
    cross-validated against the generic engine."""
    from tensornetworkquantumsimulator_tpu import paulitensornetworkstate
    from tensornetworkquantumsimulator_tpu.parallel import (
        batched_from_tns,
        bp_update,
    )

    g = named_grid((3, 3))
    vz = g.center()[0]
    layer = [("Rz", [v], -0.05) for v in g.vertices()]
    for group in edge_color(g, 4):
        layer += [("Rxx", pair, -0.1) for pair in group]
    layer = list(reversed(layer))

    chi = 4
    op0 = paulitensornetworkstate(
        jnp.complex128, lambda v: "Z" if v == vz else "I", g
    )
    # generic
    op_g, _ = tnqs.apply_circuit(
        layer, op0,
        apply_kwargs=dict(maxdim=chi, cutoff=1e-13, normalize_tensors=False),
        bp_update_kwargs=dict(maxiter=80, tolerance=1e-13),
    )
    from tensornetworkquantumsimulator_tpu import tensornetworkstate

    w_ref = tensornetworkstate(
        jnp.complex128, lambda v: [1.0, 0.0, 0.0, 1.0], g, op_g.siteinds()
    )
    tr_ref = tnqs.inner(w_ref, op_g, alg="bp")

    # batched (PTM path via heisenberg flag)
    spec, state = batched_from_tns(op0, chi=chi)
    circuit = BatchedCircuit(layer, g, spec=spec, d=4, heisenberg=True)
    layer_fn = make_layer_fn(
        circuit, chi=chi, cutoff=1e-13, normalize_tensors=False,
        bp_maxiter=80, bp_tolerance=1e-13,
    )
    state, _ = layer_fn(state)
    # ⟨O(t)⟩ on |↑…↑⟩ = coefficients contracted with [1,0,0,1] per site
    from tensornetworkquantumsimulator_tpu.parallel import batched_to_tns

    op_b = batched_to_tns(spec, state, g, op0.siteinds())
    w_b = tensornetworkstate(
        jnp.complex128, lambda v: [1.0, 0.0, 0.0, 1.0], g, op_b.siteinds()
    )
    tr_b = tnqs.inner(w_b, op_b, alg="bp")
    assert abs(np.real(tr_ref)) > 0.1  # ⟨Z(t)⟩ on |↑...↑⟩ is O(1)
    np.testing.assert_allclose(np.real(tr_b), np.real(tr_ref), rtol=1e-5)


def test_triangular_lattice_structure():
    from tensornetworkquantumsimulator_tpu import triangular_lattice

    g = triangular_lattice(4, 4)
    assert len(list(g.vertices())) == 16
    assert sum(1 for _ in g.edges()) == 24 + 9  # grid bonds + diagonals
    gp = triangular_lattice(4, 4, periodic=True)
    assert all(len(gp.neighbors(v)) == 6 for v in gp.vertices())
    assert sum(1 for _ in gp.edges()) == 48
    with pytest.raises(ValueError):
        triangular_lattice(2, 4, periodic=True)


def test_kagome_lattice_structure():
    from tensornetworkquantumsimulator_tpu import kagome_lattice

    k = kagome_lattice(2, 2)
    degs = sorted(len(k.neighbors(v)) for v in k.vertices())
    assert max(degs) == 4  # corner-sharing triangles
    # medial-graph counts: one vertex per honeycomb edge
    from tensornetworkquantumsimulator_tpu import named_hexagonal_lattice_graph

    hg = named_hexagonal_lattice_graph(2, 2)
    assert len(list(k.vertices())) == sum(1 for _ in hg.edges())
    # every honeycomb degree-3 vertex contributes a triangle (3 edges)
    tri_edges = sum(
        3 if len(hg.neighbors(v)) == 3 else 1 for v in hg.vertices()
    ) // 2
    assert sum(1 for _ in k.edges()) >= tri_edges


def test_triangular_batched_matches_generic():
    from tensornetworkquantumsimulator_tpu import triangular_lattice

    g = triangular_lattice(3, 3)
    layer = [("Rx", [v], 0.3) for v in g.vertices()]
    for group in edge_color(g, 7):
        layer += [("Rzz", pair, 0.5) for pair in group]
    vc = (2, 2)
    _check_lattice(g, layer, chi=4, obs_v=vc, nl=1, atol=2e-5)


def test_kagome_batched_matches_generic():
    from tensornetworkquantumsimulator_tpu import kagome_lattice

    g = kagome_lattice(1, 2)
    layer = [("Rx", [v], 0.3) for v in g.vertices()]
    for group in edge_color(g, 5):
        layer += [("Rzz", pair, 0.5) for pair in group]
    vc = sorted(g.vertices())[len(list(g.vertices())) // 2]
    _check_lattice(g, layer, chi=4, obs_v=vc, nl=1, atol=2e-5)
