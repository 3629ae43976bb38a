"""Graphs, lattices, schedules, argument checks."""

from .checks import algorithm_check, collect_vertices, default_alg
from .graphs import (
    NamedEdge,
    NamedGraph,
    cycle_to_path,
    edge_color,
    edgeinduced_subgraphs_no_leaves,
    forest_cover_edge_sequence,
    unique_simplecycles_limited_length,
)
from .lattices import (
    build_graph_from_circuit,
    build_graph_from_gates,
    heavy_hexagonal_lattice,
    ibm_eagle_lattice,
    lieb_lattice,
    triangular_lattice,
    kagome_lattice,
    named_comb_tree,
    named_grid,
    named_hexagonal_lattice_graph,
    named_path_graph,
    topology_to_graph,
)
