"""Gradient-based variational ground-state optimization on the batched engine.

A TPU-native capability with no reference counterpart: the reference can
only reach ground states by running imaginary-time evolution through its
dynamics machinery (`/root/reference/src/Apply/simple_update.jl` is
agnostic to unitarity, which is what `examples/tfim_ground_state.py`
exploits).  Here JAX reverse-mode autodiff differentiates the BP energy
functional

    E(psi) = sum_t c_t * <psi|h_t|psi>_BP / <psi|psi>_BP

end-to-end — through the flooding-BP message iterations, the per-site /
per-bond environment contractions, and the normalization quotients — and
optax performs direct energy minimization over the vertex tensors.

Design notes (all shaped by XLA/AD semantics):

- BP must run a STATIC number of sweeps here (`lax.scan` over
  `engine.bp_iteration`) instead of `engine.bp_update`'s tolerance
  `while_loop`: reverse-mode AD cannot differentiate a dynamic-trip-count
  loop.  Each sweep is wrapped in `jax.checkpoint` so the backward pass
  rematerializes messages instead of storing every intermediate
  (O(sweeps) memory -> O(1) per sweep).
- Every energy evaluation warm-starts from the previous optimizer step's
  converged messages under `lax.stop_gradient`; gradients see a fixed
  number of refinement sweeps from an already-converged point, which
  keeps the required static sweep count near the BP mixing time instead
  of the cold-start diameter bound.
- Complex states are optimized over (real, imag) float leaves, which
  sidesteps Wirtinger-convention pitfalls entirely and lets any optax
  transform apply unchanged.
- The whole optimization loop is ONE jitted `lax.scan` program: on the
  axon TPU runtime a host-side Python step loop would pay ~2 s of
  dispatch round-trip per step (CLAUDE.md), so the step count is a
  static scan length and the energy trajectory is the scan output.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .engine import (
    BatchedState,
    bond_expectations,
    bp_iteration,
    local_expectations,
)
from .structure import BatchedGraphSpec


class Hamiltonian(NamedTuple):
    """Sum of 1-site and nearest-neighbor 2-site terms.

    site_terms: tuple of (op [d,d], coeffs) — coeffs broadcastable to [V]
    bond_terms: tuple of (op_u [d,d], op_v [d,d], coeffs) — coeffs
        broadcastable to [num_edges], in ``spec.edges`` order.
    """

    site_terms: tuple
    bond_terms: tuple


def tfim_hamiltonian(J: float = 1.0, hx: float = 3.0) -> Hamiltonian:
    """H = -J sum_<ij> Z_i Z_j - hx sum_i X_i (the BASELINE workload's
    Hamiltonian, `examples/2dIsing_dynamics.jl:41-70` in the reference)."""
    x = np.array([[0.0, 1.0], [1.0, 0.0]])
    z = np.array([[1.0, 0.0], [0.0, -1.0]])
    return Hamiltonian(
        site_terms=((x, -hx),),
        bond_terms=((z, z, -J),),
    )


def heisenberg_hamiltonian(Jx: float = 1.0, Jy: float = 1.0, Jz: float = 1.0) -> Hamiltonian:
    """H = sum_<ij> Jx X_i X_j + Jy Y_i Y_j + Jz Z_i Z_j.

    Y is imaginary, so states must be complex (the optimizer handles the
    (re, im) split automatically)."""
    x = np.array([[0.0, 1.0], [1.0, 0.0]])
    y = np.array([[0.0, -1.0j], [1.0j, 0.0]])
    z = np.array([[1.0, 0.0], [0.0, -1.0]])
    return Hamiltonian(
        site_terms=(),
        bond_terms=((x, x, Jx), (y, y, Jy), (z, z, Jz)),
    )


def bp_sweeps(
    spec: BatchedGraphSpec,
    state: BatchedState,
    num_sweeps: int,
    damping: float = 0.0,
) -> BatchedState:
    """``num_sweeps`` flooding-BP sweeps as a differentiable `lax.scan`
    (the AD-compatible counterpart of `engine.bp_update`'s while_loop;
    semantics follow `abstractbeliefpropagationcache.jl:198-222` with a
    fixed iteration budget instead of a tolerance exit)."""

    def body(msgs, _):
        new = bp_iteration(spec, BatchedState(state.tensors, msgs))
        if damping:
            new = damping * msgs + (1.0 - damping) * new
        return new, None

    msgs, _ = lax.scan(
        jax.checkpoint(body), state.messages, None, length=num_sweeps
    )
    return BatchedState(state.tensors, msgs)


def energy(spec: BatchedGraphSpec, ham: Hamiltonian, state: BatchedState):
    """BP energy functional: every term is an independently normalized BP
    expectation (`expect.jl:58-83` batched over sites/edges)."""
    e = jnp.zeros((), state.tensors.real.dtype)
    for op, coeffs in ham.site_terms:
        vals = local_expectations(spec, state, jnp.asarray(op))
        e = e + jnp.real(jnp.sum(jnp.asarray(coeffs) * vals))
    for op_u, op_v, coeffs in ham.bond_terms:
        vals = bond_expectations(
            spec, state, jnp.asarray(op_u), jnp.asarray(op_v)
        )
        e = e + jnp.real(jnp.sum(jnp.asarray(coeffs) * vals))
    return e


def make_energy_fn(
    spec: BatchedGraphSpec,
    ham: Hamiltonian,
    bp_sweeps_per_eval: int = 15,
    damping: float = 0.0,
) -> Callable:
    """fn(tensors, messages0) -> (energy, converged_messages).

    ``messages0`` is the warm start; gradients flow through the
    ``bp_sweeps_per_eval`` refinement sweeps and the expectation
    quotients, not into the warm start itself (stop_gradient)."""

    def fn(tensors, messages0):
        st = BatchedState(tensors, lax.stop_gradient(messages0))
        st = bp_sweeps(spec, st, bp_sweeps_per_eval, damping)
        return energy(spec, ham, st), st.messages

    return fn


def _split_params(tensors):
    if jnp.iscomplexobj(tensors):
        return (jnp.real(tensors), jnp.imag(tensors)), True
    return tensors, False


def _join_params(params, is_complex):
    if is_complex:
        return params[0] + 1j * params[1]
    return params


def ground_state(
    spec: BatchedGraphSpec,
    state: BatchedState,
    ham: Hamiltonian,
    steps: int = 300,
    learning_rate: float = 3e-2,
    optimizer=None,
    bp_sweeps_per_eval: int = 15,
    damping: float = 0.0,
):
    """Direct energy minimization: optax gradient steps on the vertex
    tensors against the BP energy functional.

    Returns ``(optimized_state, energies)`` where ``energies[i]`` is the
    BP energy at step ``i`` (the trajectory is the convergence
    diagnostic).  The final state's messages are the last converged BP
    fixed point, so measurement functions can use it directly.

    The whole loop compiles to one XLA program (static ``steps``)."""
    import optax

    if optimizer is None:
        optimizer = optax.adam(learning_rate)

    params, is_complex = _split_params(state.tensors)
    efn = make_energy_fn(spec, ham, bp_sweeps_per_eval, damping)

    def loss(params, msgs):
        return efn(_join_params(params, is_complex), msgs)

    @jax.jit
    def run(params, messages):
        opt_state = optimizer.init(params)

        def step(carry, _):
            params, opt_state, msgs = carry
            (e, new_msgs), grads = jax.value_and_grad(loss, has_aux=True)(
                params, msgs
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, new_msgs), e

        (params, _, msgs), energies = lax.scan(
            step, (params, opt_state, messages), None, length=steps
        )
        return params, msgs, energies

    params, msgs, energies = run(params, state.messages)
    return BatchedState(_join_params(params, is_complex), msgs), energies


def ensemble_ground_state(
    spec: BatchedGraphSpec,
    estate: BatchedState,
    ham: Hamiltonian,
    **kwargs,
):
    """Vmapped :func:`ground_state`: E disorder realizations of the
    Hamiltonian optimize in ONE XLA program.

    ``estate`` carries a leading ensemble axis (see
    :func:`~.ensemble.stack_states`).  Coefficients in ``ham`` are either
    *per-realization* — an array with an explicit leading ensemble axis
    ``[E, ...]``, e.g. random per-site fields ``[E, V]`` or per-edge
    couplings ``[E, num_edges]`` — or *shared*: a scalar, or an array
    broadcastable to ``[V]``/``[num_edges]`` whose leading dim is not
    ``E`` (it is tiled across realizations).  The one ambiguous shape —
    a 1-D array of length ``E`` when ``E`` equals the per-term size —
    raises; disambiguate with ``[E, 1]`` or an explicit ``[E, n]``.

    Returns ``(estate, energies[E, steps])``.  No reference counterpart:
    disorder-averaged ground-state studies there cost E full runs."""
    E = estate.tensors.shape[0]
    V = estate.tensors.shape[1]
    n_edges = len(spec.edges)

    def prep(c, n, what):
        c = np.asarray(c)
        if c.ndim == 0:
            return np.broadcast_to(c, (E,)).copy()
        if c.ndim == 1 and c.shape[0] == E == n:
            raise ValueError(
                f"{what} coefficient of shape ({E},) is ambiguous: "
                f"ensemble size E={E} equals the per-term size n={n}; "
                f"pass [E, 1] for per-realization scalars or [E, {n}] "
                "explicitly"
            )
        if c.shape[0] == E:
            return c  # per-realization (leading ensemble axis)
        # shared across the ensemble: tile a [n]-broadcastable array
        return np.broadcast_to(c, (E,) + c.shape)

    site_cs = tuple(prep(c, V, "site") for _, c in ham.site_terms)
    bond_cs = tuple(prep(c, n_edges, "bond") for _, _, c in ham.bond_terms)

    def one(tensors, messages, scs, bcs):
        h = Hamiltonian(
            tuple((op, c) for (op, _), c in zip(ham.site_terms, scs)),
            tuple(
                (ou, ov, c)
                for (ou, ov, _), c in zip(ham.bond_terms, bcs)
            ),
        )
        return ground_state(
            spec, BatchedState(tensors, messages), h, **kwargs
        )

    return jax.vmap(one)(
        estate.tensors, estate.messages, site_cs, bond_cs
    )
