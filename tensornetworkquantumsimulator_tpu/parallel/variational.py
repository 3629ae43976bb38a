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


def excited_state(
    spec: BatchedGraphSpec,
    state: BatchedState,
    ham: Hamiltonian,
    below,
    weight: float = 10.0,
    steps: int = 300,
    learning_rate: float = 3e-2,
    optimizer=None,
    bp_sweeps_per_eval: int = 15,
    damping: float = 0.0,
):
    """Variational excited states by overlap-penalized energy descent.

    Minimizes ``E_BP(ψ) + weight · Σ_k |⟨ψ_k|ψ⟩|²/(⟨ψ_k|ψ_k⟩⟨ψ|ψ⟩)``
    over the vertex tensors, where ``below`` is a list of previously
    optimized :class:`BatchedState`\\ s (typically ``[ground]``) — the
    standard penalty method for excited states, with every ingredient
    differentiable on the fast path: the energy through
    :func:`make_energy_fn`'s BP sweeps, the overlaps through
    :func:`~.overlap.sandwich_sweeps` (scan-based sandwich BP) and
    :func:`~.overlap.sandwich_logz`, all sharing warm-started message
    states carried through the optimization scan.  No reference
    counterpart (the reference has no variational module at all) —
    composes the round-3 `ground_state` with the sandwich-overlap
    machinery.

    Returns ``(optimized_state, energies, penalties)``: the converged
    penalty trajectory diagnoses orthogonality (→ 0 when the optimizer
    leaves the spanned subspace)."""
    import optax

    from .overlap import sandwich_logz, sandwich_sweeps

    if optimizer is None:
        optimizer = optax.adam(learning_rate)

    params, is_complex = _split_params(state.tensors)
    efn = make_energy_fn(spec, ham, bp_sweeps_per_eval, damping)
    chi = state.chi
    below_t = tuple(b.tensors for b in below)

    # constant log <psi_k|psi_k> (no gradients flow here): the converged
    # self-sandwich at each below state's own messages.  Computed under
    # jit and PASSED to run() as an argument — below_t and lkk are
    # device arrays, and closing over device arrays in a jitted fn
    # downloads them for constant embedding, which the axon runtime
    # rejects (CLAUDE.md; same rule as the sharded-module tables)
    @jax.jit
    def _self_logz(tk, mk):
        m = sandwich_sweeps(spec, tk, jnp.conj(tk), mk, 40, damping)
        return sandwich_logz(spec, tk, jnp.conj(tk), m)[0]

    lkk = jnp.stack([_self_logz(b.tensors, b.messages) for b in below])

    def loss(params, msgs, pmsgs, below_t, lkk):
        tensors = _join_params(params, is_complex)
        e, new_msgs = efn(tensors, msgs)
        # log <psi|psi> from the SAME refreshed norm messages
        lpp, _ = sandwich_logz(spec, tensors, jnp.conj(tensors), new_msgs)
        pen = jnp.zeros((), e.dtype)
        new_pmsgs = []
        for k, tk in enumerate(below_t):
            pk = sandwich_sweeps(
                spec, tensors, jnp.conj(tk),
                lax.stop_gradient(pmsgs[k]), bp_sweeps_per_eval, damping,
            )
            l0k, _ = sandwich_logz(spec, tensors, jnp.conj(tk), pk)
            pen = pen + jnp.exp(2.0 * l0k - lkk[k] - lpp).real.astype(
                e.dtype
            )
            new_pmsgs.append(pk)
        return e + weight * pen, (e, pen, new_msgs, tuple(new_pmsgs))

    @jax.jit
    def run(params, messages, pmsgs, below_t, lkk):
        opt_state = optimizer.init(params)

        def step(carry, _):
            params, opt_state, msgs, pmsgs = carry
            (_, (e, pen, new_msgs, new_pmsgs)), grads = jax.value_and_grad(
                loss, has_aux=True
            )(params, msgs, pmsgs, below_t, lkk)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, new_msgs, new_pmsgs), (e, pen)

        (params, _, msgs, _), (energies, penalties) = lax.scan(
            step, (params, opt_state, messages, pmsgs), None, length=steps
        )
        return params, msgs, energies, penalties

    from .engine import identity_messages

    pmsgs0 = tuple(
        identity_messages(spec.num_vertices, spec.degree, chi,
                          state.tensors.dtype)
        for _ in below_t
    )
    params, msgs, energies, penalties = run(
        params, state.messages, pmsgs0, below_t, lkk
    )
    return (
        BatchedState(_join_params(params, is_complex), msgs),
        energies,
        penalties,
    )


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
