"""tensornetworkquantumsimulator_tpu — a TPU-native tensor-network quantum
simulator.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference Julia package haimeng-zhang/TensorNetworkQuantumSimulator
(mounted read-only at /root/reference; see SURVEY.md for the layer map):
quantum circuits, dynamics and equilibrium physics on tensor networks of
near-arbitrary geometry, with simple-update gate application under
belief-propagation environments and four interchangeable contraction
backends ("exact", "bp", "boundarymps", "loopcorrections").

The generic engine here is an eager named-index tensor layer over jnp; the
jit/vmap/shard_map static-shape fast path for TPUs lives in
`tensornetworkquantumsimulator_tpu.parallel`.
"""

from . import ops, utils, models, engines
from .ops import Index, Tensor
from .utils import (
    NamedEdge,
    NamedGraph,
    build_graph_from_circuit,
    edge_color,
    heavy_hexagonal_lattice,
    lieb_lattice,
    triangular_lattice,
    kagome_lattice,
    named_comb_tree,
    named_grid,
    named_hexagonal_lattice_graph,
    named_path_graph,
    topology_to_graph,
)
from .models import (
    BilinearForm,
    QuadraticForm,
    TensorNetwork,
    TensorNetworkState,
    channel_kraus,
    imaginary_time_kraus,
    channel_ptm,
    density_matrix_tensornetworkstate,
    identitytensornetworkstate,
    kraus_to_ptm,
    paulitensornetworkstate,
    random_tensornetwork,
    random_tensornetworkstate,
    seed,
    siteinds,
    tensornetworkstate,
    zerostate,
)
from .engines import (
    BeliefPropagationCache,
    BoundaryMPSCache,
    contract_network as contract,
    loop_correlation,
    loop_correlations,
    loopcorrected_partitionfunction,
)
from .utils.checkpoint import (
    load_batched_state,
    load_state,
    save_batched_state,
    save_state,
)
from .utils.profiling import ApplyConfig, BPUpdateConfig, LayerTimer, trace
from .apply import apply_circuit, apply_gates, full_update, simple_update
from .gauge import (
    entanglement,
    gauge_and_scale,
    normalize,
    symmetric_gauge,
    symmetrize_and_bpnormalize,
    symmetrize_and_normalize,
)
from .measure import (
    expect,
    heisenberg_expectation,
    inner,
    norm,
    norm_sqr,
    pauli_expectation,
    purity,
    rdm,
    reduced_density_matrix,
)
from .truncate import truncate
from .sampling import (
    sample,
    sample_certified,
    sample_density_matrix,
    sample_directly_certified,
)

__version__ = "0.1.0"

__all__ = [
    "BeliefPropagationCache",
    "BilinearForm",
    "BoundaryMPSCache",
    "Index",
    "NamedEdge",
    "NamedGraph",
    "QuadraticForm",
    "Tensor",
    "TensorNetwork",
    "TensorNetworkState",
    "apply_circuit",
    "apply_gates",
    "build_graph_from_circuit",
    "channel_kraus",
    "imaginary_time_kraus",
    "channel_ptm",
    "contract",
    "density_matrix_tensornetworkstate",
    "edge_color",
    "entanglement",
    "expect",
    "full_update",
    "heisenberg_expectation",
    "kraus_to_ptm",
    "pauli_expectation",
    "purity",
    "gauge_and_scale",
    "heavy_hexagonal_lattice",
    "identitytensornetworkstate",
    "inner",
    "lieb_lattice",
    "triangular_lattice",
    "kagome_lattice",
    "loopcorrected_partitionfunction",
    "named_comb_tree",
    "named_grid",
    "named_hexagonal_lattice_graph",
    "named_path_graph",
    "norm",
    "norm_sqr",
    "normalize",
    "paulitensornetworkstate",
    "random_tensornetwork",
    "random_tensornetworkstate",
    "rdm",
    "reduced_density_matrix",
    "sample",
    "sample_density_matrix",
    "sample_certified",
    "sample_directly_certified",
    "seed",
    "simple_update",
    "siteinds",
    "symmetric_gauge",
    "tensornetworkstate",
    "topology_to_graph",
    "truncate",
    "zerostate",
]
from .api import (
    add_edge,
    center,
    datatype,
    degree,
    edges,
    expect_boundarymps,
    expect_loopcorrect,
    graph,
    is_tree,
    ket_network,
    map_tensors,
    map_virtualinds,
    maxvirtualdim,
    message,
    messages,
    neighbors,
    network,
    nv,
    partitionfunction,
    rem_vertex,
    rescale,
    scalartype,
    update,
    vertextype,
    vertices,
    virtualind,
    virtualinds,
)
from .models.tensornetwork import AbstractTensorNetwork
from .ops import make_hermitian

# keep `from ... import *` in sync with the reference-parity delegates
# above (tests/test_api_surface.py checks hasattr; star-import needs
# these in __all__ too)
__all__ += [
    "AbstractTensorNetwork",
    "add_edge",
    "center",
    "datatype",
    "degree",
    "edges",
    "expect_boundarymps",
    "expect_loopcorrect",
    "graph",
    "is_tree",
    "ket_network",
    "make_hermitian",
    "map_tensors",
    "map_virtualinds",
    "maxvirtualdim",
    "message",
    "messages",
    "neighbors",
    "network",
    "nv",
    "partitionfunction",
    "rem_vertex",
    "rescale",
    "scalartype",
    "update",
    "vertextype",
    "vertices",
    "virtualind",
    "virtualinds",
]
