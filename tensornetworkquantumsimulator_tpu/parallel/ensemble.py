"""Ensemble evolution: many disorder realizations / parameter sets /
initial states advance in ONE XLA program via ``jax.vmap``.

The reference is strictly single-trajectory — a disorder average over E
realizations costs E sequential runs of `apply_gates`
(`/root/reference/src/Apply/apply_gates.jl:42-92`).  Here the batched
engine's static shapes make the whole Trotter layer (BP refreshes,
vmapped simple updates, truncations) vmappable over a leading ensemble
axis, so E realizations cost one compile and one dispatch, and the MXU
sees E-fold larger matmul batches — throughput, not latency, is the TPU
currency.  No reference counterpart (new TPU-native component,
SURVEY.md §2 "batched edge-group parallelism" taken one axis further).

Two layers of API:

- :func:`make_field_layer_fn` — a *parametric* Trotter layer
  ``(state, site_thetas[V], bond_thetas[E]) -> (state, errors)`` where
  the rotation angles are runtime inputs instead of baked-in constants
  (`gate_definitions.jl:34-57` conventions, built in-trace with
  closed-form cos/sin — no `expm`).  One compiled program serves every
  field configuration: sweeps, annealing schedules, disorder.
- :func:`ensemble_fn` / :func:`stack_states` — vmap any
  state-transforming function (a field layer, a plain
  :func:`~.trotter.make_layer_fn` layer, an expectation fn) over stacked
  :class:`~.engine.BatchedState` pytrees.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gates import _PAULIS, _kron_pauli
from .engine import (
    BatchedState,
    apply_color_group,
    apply_one_site,
    bp_update,
    local_expectations,
)
from .structure import BatchedGraphSpec, compile_graph


# ---------------------------------------------------------------------------
# traceable rotation gates (closed form; angles may be traced arrays)
# ---------------------------------------------------------------------------


def rot1(pauli: str, theta) -> jax.Array:
    """exp(-i θ/2 P) for P ∈ {X, Y, Z}; θ of any shape → [..., 2, 2].

    Matches ``gate_matrix("R"+pauli.lower(), θ)`` (`gate_definitions.jl:34-44`)
    but traceable: cos/sin instead of `expm`, so θ can be a jitted input."""
    theta = jnp.asarray(theta)
    p = jnp.asarray(_PAULIS[pauli.upper()], jnp.complex64
                    if theta.dtype == jnp.float32 else jnp.complex128)
    c = jnp.cos(theta / 2)[..., None, None]
    s = jnp.sin(theta / 2)[..., None, None]
    eye = jnp.eye(2, dtype=p.dtype)
    return c * eye - 1j * s * p


def rot2(pauli2: str, phi) -> jax.Array:
    """Two-site exp(-i φ/2 P⊗P) with the qiskit halved-parameter convention
    of ``gate_matrix("R"+pauli2.lower(), φ)`` (`gate_definitions.jl:28-31`):
    the effective angle is φ/2.  φ of any shape → [..., 4, 4]."""
    phi = jnp.asarray(phi)
    pp = jnp.asarray(_kron_pauli(pauli2.upper()), jnp.complex64
                     if phi.dtype == jnp.float32 else jnp.complex128)
    h = phi / 2  # qiskit rescale
    c = jnp.cos(h)[..., None, None]
    s = jnp.sin(h)[..., None, None]
    eye = jnp.eye(4, dtype=pp.dtype)
    return c * eye - 1j * s * pp


# ---------------------------------------------------------------------------
# parametric Trotter layer: angles as runtime inputs
# ---------------------------------------------------------------------------


def make_field_layer_fn(
    g,
    chi: int,
    *,
    site_pauli="X",
    bond_pauli: str = "ZZ",
    cutoff: float = 1e-12,
    normalize_tensors: bool = True,
    bp_maxiter: int = 30,
    bp_tolerance: float | None = None,
    bp_damping: float = 0.0,
    final_update: bool = True,
    jit: bool = True,
    spec: BatchedGraphSpec | None = None,
) -> tuple[BatchedGraphSpec, Callable]:
    """Compile a parametric TFIM-style Trotter layer over lattice ``g``.

    Returns ``(spec, layer)`` with
    ``layer(state, site_thetas, bond_thetas) -> (state, truncation_errors)``:

    - ``site_thetas``: scalar or ``[V]`` — per-vertex angle of the 1-site
      rotation ``exp(-i θ/2 site_pauli)`` applied first.  ``site_pauli``
      may also be a sequence (e.g. ``("X", "Z")`` for a kicked-Ising
      layer with both transverse and longitudinal fields), in which case
      ``site_thetas`` broadcasts to ``[S, V]`` (pass ``[S, 1]`` for one
      scalar per rotation) and the rotations apply in sequence;
    - ``bond_thetas``: scalar or ``[E]`` (``spec.edges`` order) — per-edge
      angle of the 2-site rotation applied per edge-color group with a BP
      refresh between groups, exactly where
      :class:`~.trotter.BatchedCircuit` would refresh
      (`apply_gates.jl:60-85` amortization).

    Because the angles are *inputs*, one compiled program serves every
    field configuration — and ``jax.vmap(layer)`` turns it into an
    ensemble program over stacked states and per-realization angles."""
    if spec is None:
        spec = compile_graph(g)
    V, E = spec.num_vertices, len(spec.edges)

    # per-bucket tables: positions into the [E] bond-angle vector (numpy so
    # they embed as constants at trace time — never eager device arrays)
    edge_pos = {}
    for k, (iu, iv, su, sv) in enumerate(spec.edges):
        edge_pos[(iu, iv)] = k
        edge_pos[(iv, iu)] = k
    group_tables = tuple(
        tuple(
            np.asarray(
                [edge_pos[(u, v)] for u, v in zip(b.u_idx, b.v_idx)],
                np.int32,
            )
            for b in group
        )
        for group in spec.color_groups
    )

    site_paulis = (
        (site_pauli,) if isinstance(site_pauli, str) else tuple(site_pauli)
    )
    S = len(site_paulis)

    def layer(state: BatchedState, site_thetas, bond_thetas):
        site_thetas = jnp.asarray(site_thetas)
        if S > 1 and site_thetas.ndim == 1 and site_thetas.shape[0] == S == V:
            # [S] and [V] are indistinguishable here; [V] (shared across
            # rotations) would broadcast silently into wrong gates
            raise ValueError(
                f"site_thetas shape ({S},) is ambiguous with {S} rotations "
                f"on {V} vertices; pass [S, 1] (per-rotation scalars) or "
                f"[S, V] explicitly"
            )
        site_thetas = jnp.broadcast_to(site_thetas, (S, V))
        bond_thetas = jnp.broadcast_to(jnp.asarray(bond_thetas), (E,))
        # compose the S rotations into ONE per-vertex gate (a [V, 2, 2]
        # matmul chain) so the hot loop pays a single tensor contraction
        gate = rot1(site_paulis[0], site_thetas[0])
        for k in range(1, S):
            gate = jnp.einsum(
                "vpq,vqr->vpr", rot1(site_paulis[k], site_thetas[k]), gate
            )
        state = apply_one_site(state, gate)
        errs = []
        for group, tables in zip(spec.color_groups, group_tables):
            # the 1-site sweep already touched every vertex, so every group
            # needs a refresh (matches BatchedCircuit's needs_refresh)
            state = bp_update(
                spec, state, maxiter=bp_maxiter, tolerance=bp_tolerance,
                damping=bp_damping,
            )
            for b, eidx in zip(group, tables):
                gmat = rot2(bond_pauli, bond_thetas[jnp.asarray(eidx)])
                state, err = apply_color_group(
                    state, (b,), gmat.reshape(-1, 2, 2, 2, 2), chi, cutoff,
                    normalize_tensors,
                )
                errs.append(err)
        if final_update:
            state = bp_update(
                spec, state, maxiter=bp_maxiter, tolerance=bp_tolerance,
                damping=bp_damping,
            )
        all_errs = (
            jnp.concatenate(errs) if errs else jnp.zeros((0,), jnp.float32)
        )
        return state, all_errs

    return spec, (jax.jit(layer) if jit else layer)


# ---------------------------------------------------------------------------
# ensemble (leading-axis) helpers
# ---------------------------------------------------------------------------


def stack_states(states) -> BatchedState:
    """Stack single-trajectory BatchedStates along a new leading ensemble
    axis (tensors ``[E, V, ...]``, messages ``[E, V, D, χ, χ]``)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def unstack_states(estate: BatchedState) -> list:
    """Split an ensemble state back into per-realization BatchedStates."""
    n = estate.tensors.shape[0]
    return [
        jax.tree_util.tree_map(lambda x: x[i], estate) for i in range(n)
    ]


def ensemble_fn(fn: Callable, in_axes=0, jit: bool = True) -> Callable:
    """vmap a state-transforming function over the ensemble axis.

    ``fn`` is any function whose first argument is a BatchedState (a layer
    from :func:`make_field_layer_fn` or :func:`~.trotter.make_layer_fn`, an
    expectation fn, a gauge pass, ...).  Extra arguments are vmapped per
    ``in_axes`` (default: everything carries a leading ensemble axis; pass
    ``in_axes=(0, None, ...)`` to broadcast shared arguments)."""
    out = jax.vmap(fn, in_axes=in_axes)
    return jax.jit(out) if jit else out


def make_ensemble_expectation_fn(
    spec: BatchedGraphSpec, op: np.ndarray, real_output: bool = False
) -> Callable:
    """Jitted per-realization per-vertex ⟨op⟩: estate → [E, V]."""
    op = np.asarray(op)

    @jax.jit
    def fn(estate: BatchedState):
        out = jax.vmap(lambda s: local_expectations(spec, s, op))(estate)
        return jnp.real(out) if real_output else out

    return fn
