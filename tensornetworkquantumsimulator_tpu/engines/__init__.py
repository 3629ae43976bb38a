"""Contraction engines: exact, belief propagation, boundary MPS, loop
corrections."""

from .beliefpropagation import (
    AbstractBeliefPropagationCache,
    BeliefPropagationCache,
    default_bp_update_kwargs,
    message_diff,
)
from .boundarymps import BoundaryMPSCache, PartitionEdge, path_contract
from .contract import contract_network
from .diagnostics import loop_correlation, loop_correlations
from .loopcorrection import loopcorrected_partitionfunction
