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
# traceable Pauli-transfer matrices (d=4 picture; angles/rates traced)
# ---------------------------------------------------------------------------

import functools as _functools
import itertools as _itertools


@_functools.lru_cache(maxsize=256)
def _ptm_rot_tables(gen: str):
    """Host-side constants for the PTM of exp(-i α P_gen): commuting mask
    C0, anticommuting mask C1, and the sin-coupling M2[i,j] =
    Re Tr[P_i·(i·A·P_j)]/d on anticommuting strings."""
    A = _kron_pauli(gen)
    n = len(gen)
    d = 2**n
    paulis = [
        _kron_pauli("".join(c)) for c in _itertools.product("IXYZ", repeat=n)
    ]
    m = 4**n
    c0 = np.zeros((m, m))
    c1 = np.zeros((m, m))
    m2 = np.zeros((m, m))
    for j, pj in enumerate(paulis):
        if np.allclose(A @ pj, pj @ A, atol=1e-13):
            c0[j, j] = 1.0
        else:
            c1[j, j] = 1.0
            apj = 1j * (A @ pj)
            for i, pi in enumerate(paulis):
                v = np.trace(pi @ apj) / d
                if abs(v) > 1e-12:
                    m2[i, j] = np.real(v)
    return c0, c1, m2


def ptm_rot(gen: str, angle, heisenberg: bool = False) -> jax.Array:
    """Traceable PTM of the ``R<gen>`` tuple gate at tuple parameter
    ``angle`` — the d=4 analogue of :func:`rot1`/:func:`rot2`.

    Every R-gate here is exp(-i(param/2)·P) after conventions
    (`gate_definitions.jl:28-44`), whose PTM in the {I,X,Y,Z}^⊗n basis is
    closed-form: identity on commuting strings, a cos/sin rotation on
    anticommuting pairs — so the angle can be a jitted input.
    ``angle`` of any shape → ``[..., 4**n, 4**n]``."""
    c0, c1, m2 = _ptm_rot_tables(gen.upper())
    angle = jnp.asarray(angle)
    sgn = 1.0 if heisenberg else -1.0
    c = jnp.cos(angle)[..., None, None]
    s = jnp.sin(angle)[..., None, None]
    return c0 + c * c1 + sgn * s * m2


_E = np.eye(4)
_E00 = np.outer(_E[0], _E[0])
_E11 = np.outer(_E[1], _E[1])
_E22 = np.outer(_E[2], _E[2])
_E33 = np.outer(_E[3], _E[3])
_E30 = np.outer(_E[3], _E[0])

TRACEABLE_CHANNELS = (
    "depolarizing",
    "dephasing",
    "bitflip",
    "amplitude_damping",
    "reset",
)


def ptm_channel(name: str, param, heisenberg: bool = False) -> jax.Array:
    """Traceable single-site channel PTM at a (possibly traced) rate —
    the parametric analogue of `models.channels.channel_ptm` for noise
    sweeps.  ``param`` of any shape → ``[..., 4, 4]``.  Names as in
    `models/channels.py` (axis suffixes allowed for dephasing)."""
    base, _, suffix = name.partition(":")
    base = base.lower()
    p = jnp.asarray(param)[..., None, None]
    if base in ("depolarizing", "dep"):
        return _E00 + (1.0 - p) * (_E11 + _E22 + _E33)
    if base in ("dephasing", "deph", "phaseflip", "bitflip"):
        axis = "X" if base == "bitflip" else (suffix or "Z").upper()
        if len(axis) != 1 or axis not in "XYZ":
            raise ValueError(
                f"traceable channels are single-site; axis {axis!r} is not "
                "one of X/Y/Z (use models.channels for multi-site dephasing)"
            )
        c0, c1, _ = _ptm_rot_tables(axis)
        return c0 + (1.0 - 2.0 * p) * c1
    if base in ("amplitude_damping", "ad"):
        s = jnp.sqrt(1.0 - p)
        # Heisenberg PTM is the transpose: γ couples I→Z instead of Z→I
        cross = _E30.T if heisenberg else _E30
        return _E00 + s * (_E11 + _E22) + (1.0 - p) * _E33 + p * cross
    if base == "reset":
        cross = _E30.T if heisenberg else _E30
        return _E00 + (1.0 - p) * (_E11 + _E22 + _E33) + p * cross
    raise ValueError(
        f"channel {name!r} has no traceable form (supported: "
        f"{TRACEABLE_CHANNELS})"
    )


# ---------------------------------------------------------------------------
# parametric Trotter layer: angles as runtime inputs
# ---------------------------------------------------------------------------


def _broadcast_rows(x, R: int, V: int, what: str):
    """Broadcast a per-row parameter to [R, V]: scalars and [V] broadcast,
    [R] (per-row scalars, R≠V) reshapes to [R, 1]; the ambiguous R==V case
    must be passed explicitly."""
    x = jnp.asarray(x)
    if R > 1 and x.ndim == 1 and x.shape[0] == R:
        if R == V:
            raise ValueError(
                f"{what} shape ({R},) is ambiguous with {R} rows on {V} "
                f"vertices; pass [{R}, 1] (per-row scalars) or [{R}, {V}] "
                "explicitly"
            )
        x = x[:, None]
    return jnp.broadcast_to(x, (R, V))


def _group_angle_tables(spec: BatchedGraphSpec):
    """Per-bucket positions into the [E] bond-angle vector (numpy so they
    embed as constants at trace time — never eager device arrays)."""
    edge_pos = {}
    for k, (iu, iv, su, sv) in enumerate(spec.edges):
        edge_pos[(iu, iv)] = k
        edge_pos[(iv, iu)] = k
    return tuple(
        tuple(
            np.asarray(
                [edge_pos[(u, v)] for u, v in zip(b.u_idx, b.v_idx)],
                np.int32,
            )
            for b in group
        )
        for group in spec.color_groups
    )


def _make_parametric_core(
    spec: BatchedGraphSpec,
    chi: int,
    *,
    site_gate_fn,
    bond_gate_fn,
    site_paulis: tuple,
    bond_pauli: str,
    noise_names: tuple,
    noise_gate_fn,
    cutoff: float,
    normalize_tensors: bool,
    bp_maxiter: int,
    bp_tolerance: float | None,
    bp_damping: float,
    final_update: bool,
) -> Callable:
    """Shared body of :func:`make_field_layer_fn` (wavefunction, d=2) and
    :func:`make_noisy_field_layer_fn` (density matrix, d=4): only the gate
    builders and the optional post-unitary channel stage differ."""
    V, E = spec.num_vertices, len(spec.edges)
    group_tables = _group_angle_tables(spec)
    S, C = len(site_paulis), len(noise_names)

    def refresh(state):
        return bp_update(
            spec, state, maxiter=bp_maxiter, tolerance=bp_tolerance,
            damping=bp_damping,
        )

    def core(state: BatchedState, site_thetas, bond_thetas, noise_params):
        site_thetas = _broadcast_rows(site_thetas, S, V, "site_thetas")
        bond_thetas = jnp.broadcast_to(jnp.asarray(bond_thetas), (E,))
        # compose the S rotations into ONE per-vertex gate (a [V, d, d]
        # matmul chain) so the hot loop pays a single tensor contraction
        gate = site_gate_fn(site_paulis[0], site_thetas[0])
        for k in range(1, S):
            gate = jnp.einsum(
                "vpq,vqr->vpr", site_gate_fn(site_paulis[k], site_thetas[k]),
                gate,
            )
        state = apply_one_site(state, gate.astype(state.tensors.dtype))
        errs = []
        for group, tables in zip(spec.color_groups, group_tables):
            # the 1-site sweep already touched every vertex, so every group
            # needs a refresh (matches BatchedCircuit's needs_refresh)
            state = refresh(state)
            for b, eidx in zip(group, tables):
                gmat = bond_gate_fn(bond_pauli, bond_thetas[jnp.asarray(eidx)])
                d = int(round(gmat.shape[-1] ** 0.5))
                state, err = apply_color_group(
                    state, (b,),
                    gmat.reshape(-1, d, d, d, d).astype(state.tensors.dtype),
                    chi, cutoff, normalize_tensors,
                )
                errs.append(err)
        if C:
            # noise after the unitary part: one composed per-vertex channel
            noise_params = _broadcast_rows(noise_params, C, V, "noise_params")
            chan = noise_gate_fn(noise_names[0], noise_params[0])
            for k in range(1, C):
                chan = jnp.einsum(
                    "vpq,vqr->vpr", noise_gate_fn(noise_names[k],
                                                  noise_params[k]), chan,
                )
            state = apply_one_site(state, chan.astype(state.tensors.dtype))
        if final_update:
            state = refresh(state)
        all_errs = (
            jnp.concatenate(errs) if errs else jnp.zeros((0,), jnp.float32)
        )
        return state, all_errs

    return core


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
      ``site_thetas`` broadcasts to ``[S, V]`` (``[S]`` per-rotation
      scalars allowed when S ≠ V) and the rotations apply in sequence;
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
    site_paulis = (
        (site_pauli,) if isinstance(site_pauli, str) else tuple(site_pauli)
    )
    core = _make_parametric_core(
        spec, chi, site_gate_fn=rot1, bond_gate_fn=rot2,
        site_paulis=site_paulis, bond_pauli=bond_pauli,
        noise_names=(), noise_gate_fn=None,
        cutoff=cutoff, normalize_tensors=normalize_tensors,
        bp_maxiter=bp_maxiter, bp_tolerance=bp_tolerance,
        bp_damping=bp_damping, final_update=final_update,
    )

    def layer(state: BatchedState, site_thetas, bond_thetas):
        return core(state, site_thetas, bond_thetas, None)

    return spec, (jax.jit(layer) if jit else layer)


def make_noisy_field_layer_fn(
    g,
    chi: int,
    *,
    site_pauli="X",
    bond_pauli: str = "ZZ",
    noise=("depolarizing",),
    cutoff: float = 1e-12,
    normalize_tensors: bool = False,
    bp_maxiter: int = 30,
    bp_tolerance: float | None = None,
    bp_damping: float = 0.0,
    final_update: bool = True,
    jit: bool = True,
    spec: BatchedGraphSpec | None = None,
) -> tuple[BatchedGraphSpec, Callable]:
    """Parametric NOISY Trotter layer in the density-matrix picture: both
    the rotation angles and the channel rates are runtime inputs, so one
    compiled program serves every noise strength — and ``jax.vmap`` turns
    it into a noise-rate sweep (E rates advancing in one dispatch).

    The state is a batched "PauliRho" coefficient network (d=4,
    `models/channels.py`; build via ``batched_from_tns(
    density_matrix_tensornetworkstate(...))``).  Returns ``(spec, layer)``
    with ``layer(state, site_thetas, bond_thetas, noise_params) ->
    (state, truncation_errors)``:

    - ``site_thetas`` / ``bond_thetas``: exactly as
      :func:`make_field_layer_fn` (tuple-gate parameter conventions,
      applied as Schrödinger PTMs via :func:`ptm_rot`);
    - ``noise_params``: scalar, ``[C]``, or ``[C, V]`` — one rate per
      channel name in ``noise`` (see :data:`TRACEABLE_CHANNELS`),
      broadcast per vertex, applied after the unitary part of the layer
      as one composed per-vertex 4×4 transfer matrix.

    No reference counterpart (unitary-only reference; and even
    single-trajectory noise sweeps there would recompile per rate)."""
    if spec is None:
        spec = compile_graph(g)
    site_paulis = (
        (site_pauli,) if isinstance(site_pauli, str) else tuple(site_pauli)
    )
    noise_names = (noise,) if isinstance(noise, str) else tuple(noise)
    for name in noise_names:  # fail at build time, not inside the jit
        if np.asarray(ptm_channel(name, 0.0)).shape != (4, 4):
            raise ValueError(f"channel {name!r} is not single-site")

    def ptm_rot_s(gen, angle):
        return ptm_rot(gen, angle, heisenberg=False)

    core = _make_parametric_core(
        spec, chi, site_gate_fn=ptm_rot_s, bond_gate_fn=ptm_rot_s,
        site_paulis=site_paulis, bond_pauli=bond_pauli,
        noise_names=noise_names, noise_gate_fn=ptm_channel,
        cutoff=cutoff, normalize_tensors=normalize_tensors,
        bp_maxiter=bp_maxiter, bp_tolerance=bp_tolerance,
        bp_damping=bp_damping, final_update=final_update,
    )
    return spec, (jax.jit(core) if jit else core)


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
