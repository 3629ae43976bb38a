"""Batched boundary MPS + certified sampling beyond grids (heavy-hex,
comb): the planar path-partition engine vs exact contraction and the
generic engine (`boundarympscache.jl:139-194`, `sampling.jl:202-207`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    heavy_hexagonal_lattice,
    named_comb_tree,
    random_tensornetworkstate,
    zerostate,
)
from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
from tensornetworkquantumsimulator_tpu.parallel import (
    batched_from_tns,
    make_planar_bmps,
    make_planar_certified_sampler,
)


def _z(norm_fn, tensors):
    lz, ph = norm_fn(tensors)
    return float(np.exp(np.asarray(lz))) * np.exp(1j * float(np.asarray(ph)))


def _kicked_ising_state(g, theta_zz=0.6, theta_x=0.7, maxdim=4):
    circ = [("Rzz", (e.src, e.dst), theta_zz) for e in g.edges()]
    circ += [("Rx", [v], theta_x) for v in g.vertices()]
    psi = zerostate(jnp.complex128, g, "S=1/2")
    psi, _ = tnqs.apply_circuit(
        circ, psi, apply_kwargs=dict(maxdim=maxdim, cutoff=1e-14)
    )
    return tnqs.gauge_and_scale(psi)


def test_planar_bmps_heavyhex_exact_at_full_rank():
    # heavy-hex interfaces have ≤ 3 bonds at χ=2 → K = (χ²)³ = 64 is exact;
    # K=16 is already machine-precision on (2,2)
    g = heavy_hexagonal_lattice(2, 2)
    chi = 2
    psi = random_tensornetworkstate(jnp.complex128, g, "S=1/2", bond_dimension=chi)
    psi = tnqs.normalize(psi, alg="bp")
    spec, state = batched_from_tns(psi, chi=chi)
    norm_fn, expect_fn = make_planar_bmps(spec, kmps=16, niters=20)
    z_exact = tnqs.norm_sqr(psi, alg="exact")
    np.testing.assert_allclose(
        np.real(_z(norm_fn, state.tensors)), np.real(z_exact), rtol=1e-10
    )
    z_vals = np.asarray(expect_fn(state.tensors, jnp.asarray(op_matrix("Z", 2))))
    for i, v in enumerate(spec.vertices):
        ref = tnqs.expect(psi, ("Z", [v]), alg="exact")
        np.testing.assert_allclose(z_vals[i], np.real(ref), atol=1e-10)


def test_planar_bmps_heavyhex_matches_generic_engine():
    # the VERDICT cross-check: batched vs generic boundary MPS on a (3, 3)
    # heavy-hex to 1e-5 (`/root/reference/examples/heavyhexIsing_dynamics.jl`)
    g = heavy_hexagonal_lattice(3, 3)
    psi = _kicked_ising_state(g, maxdim=2)
    spec, state = batched_from_tns(psi, chi=2)
    norm_fn, expect_fn = make_planar_bmps(spec, kmps=16, niters=20)
    z_gen = tnqs.norm_sqr(psi, alg="boundarymps", mps_bond_dimension=16)
    np.testing.assert_allclose(
        np.real(_z(norm_fn, state.tensors)), np.real(z_gen), rtol=1e-5
    )
    z_vals = np.asarray(expect_fn(state.tensors, jnp.asarray(op_matrix("Z", 2))))
    some = list(spec.vertices)[::7]
    refs = tnqs.expect(
        psi,
        [("Z", [v]) for v in some],
        alg="boundarymps",
        mps_bond_dimension=16,
    )
    for v, ref in zip(some, refs):
        i = spec.vertex_position(v)
        np.testing.assert_allclose(z_vals[i], np.real(ref), atol=1e-5)


def test_planar_bmps_comb_tree():
    # trees: BP (= exact on trees) must agree with the planar strand sweep
    g = named_comb_tree((3, 3))
    chi = 2
    psi = random_tensornetworkstate(jnp.complex128, g, "S=1/2", bond_dimension=chi)
    psi = tnqs.normalize(psi, alg="bp")
    spec, state = batched_from_tns(psi, chi=chi)
    norm_fn, _ = make_planar_bmps(spec, kmps=8, niters=15)
    z_exact = tnqs.norm_sqr(psi, alg="exact")
    np.testing.assert_allclose(
        np.real(_z(norm_fn, state.tensors)), np.real(z_exact), rtol=1e-8
    )


def test_planar_certified_sampling_heavyhex():
    g = heavy_hexagonal_lattice(2, 2)
    psi = _kicked_ising_state(g, maxdim=4)
    spec, state = batched_from_tns(psi, chi=4)
    sampler = make_planar_certified_sampler(
        spec, norm_rank=8, projected_rank=8, niters=8
    )
    keys = jax.random.split(jax.random.PRNGKey(7), 12)
    bits, logq, log_poverq = sampler(state.tensors, keys)
    assert np.asarray(bits).shape == (12, spec.num_vertices)
    pq = np.exp(np.asarray(log_poverq))
    nsq = float(np.real(tnqs.norm_sqr(psi, alg="exact")))
    # exact-rank sampling: p/q is the norm² for every sample
    np.testing.assert_allclose(pq, nsq, rtol=1e-4)


def test_planar_certified_sampling_product_state_deterministic():
    g = heavy_hexagonal_lattice(2, 2)
    psi = zerostate(jnp.complex128, g, "S=1/2")
    spec, state = batched_from_tns(psi, chi=2)
    sampler = make_planar_certified_sampler(
        spec, norm_rank=4, projected_rank=4, niters=4
    )
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    bits, logq, log_poverq = sampler(state.tensors, keys)
    assert not np.asarray(bits).any()
    np.testing.assert_allclose(np.asarray(logq), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.exp(np.asarray(log_poverq)), 1.0, rtol=1e-4)


def test_planar_spec_rejects_nonaligned():
    # a lone diagonal edge is no longer rejected (columns are derived);
    # genuinely infeasible is two bonds from one vertex to one adjacent
    # row (a triangle spanning two rows) — must fall back loudly
    from tensornetworkquantumsimulator_tpu.parallel import compile_graph
    from tensornetworkquantumsimulator_tpu.parallel.boundarymps import (
        PlanarBMPSSpec,
    )
    from tensornetworkquantumsimulator_tpu.utils.graphs import NamedEdge, NamedGraph

    g = NamedGraph([(1, 1), (2, 2)])
    g.add_edge_inplace(NamedEdge((1, 1), (2, 2)))
    PlanarBMPSSpec(compile_graph(g))  # derived columns make this fine

    g = NamedGraph([(1, 1), (2, 1), (2, 2)])
    g.add_edge_inplace(NamedEdge((1, 1), (2, 1)))
    g.add_edge_inplace(NamedEdge((1, 1), (2, 2)))
    g.add_edge_inplace(NamedEdge((2, 1), (2, 2)))
    with pytest.raises(ValueError):
        PlanarBMPSSpec(compile_graph(g))


def _sheared_grid(nx, ny):
    from tensornetworkquantumsimulator_tpu.utils.lattices import NamedGraph

    g = NamedGraph()
    for r in range(nx):
        for c in range(ny):
            g.add_vertex_inplace((r, c))
    for r in range(nx):
        for c in range(ny - 1):
            g.add_edge_inplace((r, c), (r, c + 1))
    for r in range(nx - 1):
        for c in range(ny - 1):
            g.add_edge_inplace((r, c), (r + 1, c + 1))
    return g


def test_planar_bmps_derived_columns_sheared_grid():
    # diagonal inter-row edges: the coordinate-default columns are NOT
    # aligned, so PlanarBMPSSpec derives an assignment from the graph
    # (derive_planar_columns) — batched path, no generic fallback
    from tensornetworkquantumsimulator_tpu.parallel.boundarymps import (
        PlanarBMPSSpec,
        derive_planar_columns,
    )
    from tensornetworkquantumsimulator_tpu.parallel.structure import compile_graph

    g = _sheared_grid(4, 4)
    spec0 = compile_graph(g)
    cols = derive_planar_columns(spec0)
    # shear needs exactly nx+ny-1 columns (one per diagonal group)
    assert len(set(cols.values())) == 7
    assert PlanarBMPSSpec(spec0).W == 7

    chi = 2
    psi = random_tensornetworkstate(jnp.complex128, g, "S=1/2", bond_dimension=chi)
    psi = tnqs.normalize(psi, alg="bp")
    spec, state = batched_from_tns(psi, chi=chi)
    norm_fn, expect_fn = make_planar_bmps(spec, kmps=16, niters=25)
    z_exact = tnqs.norm_sqr(psi, alg="exact")
    np.testing.assert_allclose(
        np.real(_z(norm_fn, state.tensors)), np.real(z_exact), rtol=1e-10
    )
    z_vals = np.asarray(expect_fn(state.tensors, jnp.asarray(op_matrix("Z", 2))))
    for v in [(0, 0), (1, 2), (3, 3)]:
        i = spec.vertex_position(v)
        ref = tnqs.expect(psi, ("Z", [v]), alg="exact")
        np.testing.assert_allclose(z_vals[i], np.real(ref), atol=1e-10)


def test_planar_bmps_derived_columns_integer_names():
    # vertex names carry no geometry at all (build_graph_from_circuit
    # style): only row_of is supplied, columns are derived
    from tensornetworkquantumsimulator_tpu.utils.lattices import NamedGraph
    from tensornetworkquantumsimulator_tpu.parallel.structure import compile_graph
    from tensornetworkquantumsimulator_tpu.parallel.boundarymps import PlanarBMPSSpec

    hh = heavy_hexagonal_lattice(2, 2)
    vs = list(hh.vertices())
    lbl = {v: i for i, v in enumerate(vs)}
    g = NamedGraph()
    for v in vs:
        g.add_vertex_inplace(lbl[v])
    for e in hh.edges():
        g.add_edge_inplace(lbl[e.src], lbl[e.dst])
    rows = {lbl[v]: float(v[0]) for v in vs}
    spec0 = compile_graph(g)
    assert PlanarBMPSSpec(spec0, row_of=lambda v: rows[v]).nrows == 5

    chi = 2
    psi = random_tensornetworkstate(jnp.complex128, g, "S=1/2", bond_dimension=chi)
    psi = tnqs.normalize(psi, alg="bp")
    spec, state = batched_from_tns(psi, chi=chi)
    norm_fn, _ = make_planar_bmps(
        spec, kmps=16, niters=25, row_of=lambda v: rows[v]
    )
    z_exact = tnqs.norm_sqr(psi, alg="exact")
    np.testing.assert_allclose(
        np.real(_z(norm_fn, state.tensors)), np.real(z_exact), rtol=1e-8
    )


def test_planar_bmps_heavyhex_row_correlations():
    from tensornetworkquantumsimulator_tpu.parallel.boundarymps import (
        PlanarBMPSSpec,
        make_planar_bmps_correlations,
    )

    g = heavy_hexagonal_lattice(2, 2)
    chi = 2
    psi = random_tensornetworkstate(jnp.complex128, g, "S=1/2", bond_dimension=chi)
    psi = tnqs.normalize(psi, alg="bp")
    spec, state = batched_from_tns(psi, chi=chi)

    # pick two same-row pairs from the planar layout
    pspec = PlanarBMPSSpec(spec)
    by_row = {}
    for i, v in enumerate(spec.vertices):
        r, _c = pspec.rowcol[i]
        by_row.setdefault(r, []).append(v)
    rows = [vs for vs in by_row.values() if len(vs) >= 3]
    pairs = [(rows[0][0], rows[0][-1]), (rows[1][0], rows[1][1])]

    z = jnp.asarray(op_matrix("Z", 2))
    corr = make_planar_bmps_correlations(spec, kmps=16, pairs=pairs, niters=20)
    got = np.asarray(corr(state.tensors, z, z))
    want = np.asarray(
        [tnqs.expect(psi, ("ZZ", [a, b]), alg="exact") for a, b in pairs]
    )
    np.testing.assert_allclose(got, want, atol=1e-9)

    # cross-row pairs through the op-inserted strand chain (incl. a
    # reversed-order pair: first vertex in the upper row)
    xpairs = [
        (rows[0][0], rows[1][1]),
        (rows[1][-1], rows[0][0]),
    ]
    xcorr = make_planar_bmps_correlations(spec, kmps=16, pairs=xpairs, niters=20)
    xgot = np.asarray(xcorr(state.tensors, z, z))
    xwant = np.asarray(
        [tnqs.expect(psi, ("ZZ", [a, b]), alg="exact") for a, b in xpairs]
    )
    np.testing.assert_allclose(xgot, xwant, atol=1e-8)
