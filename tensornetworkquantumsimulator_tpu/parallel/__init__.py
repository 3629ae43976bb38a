"""TPU scaling layer: static-shape batched engine, jitted Trotter layers,
and multi-chip sharding (SPMD over a jax Mesh).

No reference counterpart — this is the new first-class parallelism component
called for in SURVEY.md §2."""

from .convert import (
    batched_from_tns,
    batched_messages_to_cache,
    batched_product_state,
    batched_to_tns,
)
from .ensemble import (
    ensemble_fn,
    make_ensemble_expectation_fn,
    make_field_layer_fn,
    make_noisy_field_layer_fn,
    ptm_channel,
    ptm_rot,
    rot1,
    rot2,
    stack_states,
    unstack_states,
)
from .engine import (
    BatchedState,
    apply_color_group,
    apply_one_site,
    bond_expectations,
    bp_iteration,
    bp_update,
    identity_messages,
    local_expectations,
    local_rdms,
)
from .correlations import (
    make_mutual_information_fn,
    make_path_correlation_fn,
    make_path_rdm_fn,
    make_sharded_path_correlations,
    make_string_expectation_fn,
    path_correlations,
    shortest_path,
    string_expectations,
)
from .boundarymps import (
    PlanarBMPSSpec,
    derive_planar_columns,
    make_grid_bmps,
    make_grid_bmps_correlations,
    make_planar_bmps,
    make_planar_bmps_correlations,
)
from .certified_sampling import (
    make_grid_certified_sampler,
    make_planar_certified_sampler,
    make_sharded_sampler,
)
from .sampling import (
    make_bp_sampler,
    make_rho_sampler,
    make_sharded_rho_sampler,
)
from .gauge import batched_symmetric_gauge
from .overlap import (
    batched_inner,
    batched_loschmidt_echo,
    batched_purity,
    make_pauli_expectation_fn,
    make_sharded_inner,
    make_sharded_pauli_expectations,
)
from .loopcorrection import (
    LoopConfigurations,
    batched_partitionfunction,
    find_plaquettes,
    loopcorrected_partitionfunction as batched_loopcorrected_partitionfunction,
    make_loopcorrected_expectations,
)
from .truncate import batched_truncate
from .sharded_bmps import make_sharded_grid_bmps, make_sharded_planar_bmps
from .sharded_loopcorrection import (
    make_sharded_loopcorrected_expectations,
    make_sharded_loopcorrections,
)
from .sharded_layer import (
    build_layer_groups,
    make_sharded_bond_expectations,
    make_sharded_bond_rdms,
    make_sharded_gauge,
    make_sharded_layer,
    make_sharded_site_expectations,
    make_sharded_site_rdms,
    make_sharded_truncate,
)
from .sharding import ShardedBPSpec, make_sharded_bp_update, shard_spec
from .sharding2d import (
    Sharded2DSpec,
    make_sharded_bond_expectations_2d,
    make_sharded_gauge_2d,
    make_sharded_layer_2d,
    make_sharded_site_expectations_2d,
    shard2d_spec,
)
from .structure import BatchedGraphSpec, SlotPairBucket, compile_graph
from .trotter import BatchedCircuit, make_expectation_fn, make_layer_fn
from .variational import (
    Hamiltonian,
    bp_sweeps,
    ensemble_ground_state,
    excited_state,
    ground_state,
    heisenberg_hamiltonian,
    make_energy_fn,
    tfim_hamiltonian,
)
