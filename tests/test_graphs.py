"""Graph layer: lattices, schedules, colorings, diagnostics."""

import jax.numpy as jnp
import numpy as np

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    NamedEdge,
    edge_color,
    heavy_hexagonal_lattice,
    lieb_lattice,
    named_comb_tree,
    named_grid,
    named_hexagonal_lattice_graph,
    named_path_graph,
    random_tensornetworkstate,
    topology_to_graph,
)
from tensornetworkquantumsimulator_tpu.engines.diagnostics import loop_correlations
from tensornetworkquantumsimulator_tpu.utils import (
    build_graph_from_circuit,
    forest_cover_edge_sequence,
)
from tensornetworkquantumsimulator_tpu.utils.lattices import ibm_eagle_lattice


def test_lattice_constructors():
    g = named_grid((4, 5))
    assert g.nv() == 20 and g.ne() == 4 * 4 + 5 * 3
    gt = named_grid((3, 3, 3), periodic=True)
    assert gt.nv() == 27 and all(gt.degree(v) == 6 for v in gt.vertices())
    hh = heavy_hexagonal_lattice(2, 2)
    assert hh.max_degree() == 3 and hh.is_connected()
    eagle = ibm_eagle_lattice()
    assert eagle.nv() == 127 and eagle.ne() == 144 and eagle.max_degree() == 3
    lieb = lieb_lattice(3, 3)
    assert (2, 2) not in lieb.vertices()
    comb = named_comb_tree((3, 4))
    assert comb.is_tree() and comb.nv() == 12
    path = named_path_graph(5)
    assert path.is_line_graph()
    topo = topology_to_graph([(1, 2), (2, 3), (3, 1)])
    assert topo.nv() == 3 and topo.ne() == 3


def test_edge_coloring_properties():
    for g, n in [
        (named_grid((4, 4)), 4),
        (heavy_hexagonal_lattice(2, 2), 3),
        (named_grid((3, 3, 3), periodic=True), 7),
    ]:
        groups = edge_color(g, n)
        assert len(groups) <= n
        assert sum(len(grp) for grp in groups) == g.ne()
        for grp in groups:
            seen = set()
            for e in grp:
                assert e.src not in seen and e.dst not in seen
                seen.update((e.src, e.dst))


def test_forest_cover_schedule_covers_all_edges():
    g = named_grid((3, 4))
    seq = forest_cover_edge_sequence(g)
    directed = {(e.src, e.dst) for e in seq}
    for e in g.edges():
        assert (e.src, e.dst) in directed and (e.dst, e.src) in directed


def test_build_graph_from_circuit():
    circ = [("Rx", [1], 0.1), ("CZ", [1, 2]), ("CZ", [2, 3])]
    g = build_graph_from_circuit(circ)
    assert g.nv() == 3 and g.ne() == 2


def test_loop_correlations():
    g = named_comb_tree((3, 3))
    psi = random_tensornetworkstate(jnp.complex128, g, bond_dimension=2)
    assert loop_correlations(psi, 4) == []  # trees have no loops

    g = named_grid((3, 3))
    psi = random_tensornetworkstate(jnp.complex128, g, bond_dimension=2)
    psi = tnqs.normalize(psi, alg="bp")
    corrs = loop_correlations(psi, 4)
    assert len(corrs) == 4  # four plaquettes
    assert all(0 <= c <= 1 for c in corrs)


def test_native_leaffree_enumeration_matches_python():
    """The C++ bitset enumerator (native/subgraphs.cpp) and the pure-Python
    fallback produce the identical configuration set (the 'generalized
    loops' of loopcorrection.jl:11-12)."""
    import pytest

    from tensornetworkquantumsimulator_tpu.native import get_subgraphs
    from tensornetworkquantumsimulator_tpu.utils.graphs import (
        _edgeinduced_subgraphs_no_leaves_py,
        _leaffree_edge_sets_native,
        edgeinduced_subgraphs_no_leaves,
    )

    if get_subgraphs() is None:
        pytest.skip("no native toolchain")

    def canon(graphs):
        return sorted(
            tuple(sorted((str(e.src), str(e.dst)) for e in sg.edges()))
            for sg in graphs
        )

    for g, size in [
        (named_grid((4, 4)), 8),
        (named_grid((3, 3), periodic=True), 6),
        (heavy_hexagonal_lattice(2, 2), 12),
        (named_comb_tree((3, 3)), 6),  # tree: no loops at all
    ]:
        native_sets = _leaffree_edge_sets_native(g, g.edges(), size)
        assert native_sets is not None
        nat = edgeinduced_subgraphs_no_leaves(g, size)
        py = _edgeinduced_subgraphs_no_leaves_py(g, size)
        assert canon(nat) == canon(py)
