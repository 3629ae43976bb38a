"""Batched ⟨ψ|ϕ⟩ overlaps: BP on the two-layer sandwich, one XLA program.

The generic engine computes overlaps through a lazily wired
`BilinearForm` + BP cache (`/root/reference/src/inner.jl:53-98`,
`Forms/bilinearform.jl`) — per-call graph assembly and sequential
message sweeps.  Here the sandwich never materializes: the flooding-BP
message update is the engine's, with the bra layer threaded through the
contraction in place of ``conj(ket)`` (the only place the two layers
differ), so a Loschmidt echo ⟨ψ(0)|ψ(t)⟩ or a truncation fidelity
|⟨ψ_χ|ψ⟩|²/(‖ψ_χ‖‖ψ‖) costs one jitted fixed-point loop on the fast
path.

Sandwich messages are NOT hermitian (the two layers differ), so message
normalization skips the hermitization the norm-cache applies — matching
the generic BilinearForm cache, whose `make_hermitian` is reserved for
quadratic forms.

Returned as ``(log_abs, phase)`` (`exp(log_abs + i·phase)`) — overlaps
of large lattices under- or overflow any float; callers exponentiate
differences, e.g. a normalized echo
``exp(log|⟨ψ|ϕ⟩| − ½log⟨ψ|ψ⟩ − ½log⟨ϕ|ϕ⟩)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .engine import (
    _LETTERS,
    _PRECISION,
    _absorb,
    _all_except_one,
    _message_distance,
    _normalize_messages,
    BatchedState,
    default_batched_tolerance,
    identity_messages,
)
from .structure import BatchedGraphSpec

__all__ = [
    "batched_inner",
    "batched_loschmidt_echo",
    "batched_purity",
    "make_pauli_expectation_fn",
    "make_sharded_inner",
]


def _sandwich_outgoing(spec, t_ket, t_bra_conj, messages):
    """m_out[u, j] on the ψ̄ϕ sandwich: incoming messages absorb into the
    ket layer; the (pre-conjugated) bra layer closes the site leg."""
    D = spec.degree
    accs = _all_except_one(t_ket, messages, list(range(D)))
    outs = []
    for j, acc in zip(range(D), accs):
        lab = [_LETTERS[k] for k in range(D)]
        acc_lab, conj_lab = list(lab), list(lab)
        acc_lab[j] = "p"
        conj_lab[j] = "q"
        eq = f"v{''.join(acc_lab)}s,v{''.join(conj_lab)}s->vpq"
        outs.append(jnp.einsum(eq, acc, t_bra_conj, precision=_PRECISION))
    return jnp.stack(outs, axis=1)


def _sandwich_bp(spec, t_ket, t_bra_conj, messages, maxiter, tolerance,
                 damping):
    nbr = jnp.asarray(spec.nbr_array())
    nbr_slot = jnp.asarray(spec.nbr_slot_array())
    mask = jnp.asarray(spec.mask_array())
    rdt = jnp.zeros((), t_ket.dtype).real.dtype

    def iterate(m):
        m_out = _sandwich_outgoing(spec, t_ket, t_bra_conj, m)
        gathered = m_out[nbr, nbr_slot]
        return _normalize_messages(gathered, mask, hermitize=False)

    def cond(carry):
        _, it, diff = carry
        return jnp.logical_and(it < maxiter, diff > tolerance)

    def body(carry):
        m, it, _ = carry
        new = iterate(m)
        if damping > 0:
            new = _normalize_messages(
                (1 - damping) * new + damping * m, mask, hermitize=False
            )
        return (new, it + 1, _message_distance(m, new, mask).astype(rdt))

    m, _, _ = jax.lax.while_loop(
        cond, body, (messages, jnp.int32(0), jnp.asarray(jnp.inf, rdt))
    )
    return m


def sandwich_sweeps(spec, t_ket, t_bra_conj, messages, num_sweeps,
                    damping: float = 0.0):
    """``num_sweeps`` sandwich-BP sweeps as a differentiable ``lax.scan``
    — the AD-compatible counterpart of the while_loop in
    :func:`batched_inner` (reverse-mode AD cannot cross a while_loop;
    mirrors `variational.bp_sweeps`).  Used by the excited-state
    overlap-penalty loss."""
    nbr = jnp.asarray(spec.nbr_array())
    nbr_slot = jnp.asarray(spec.nbr_slot_array())
    mask = jnp.asarray(spec.mask_array())

    def body(m, _):
        m_out = _sandwich_outgoing(spec, t_ket, t_bra_conj, m)
        new = _normalize_messages(m_out[nbr, nbr_slot], mask,
                                  hermitize=False)
        if damping:
            new = _normalize_messages(
                (1 - damping) * new + damping * m, mask, hermitize=False
            )
        return new, None

    m, _ = jax.lax.scan(jax.checkpoint(body), messages, None,
                        length=num_sweeps)
    return m


def sandwich_logz(spec, t_ket, t_bra_conj, m):
    """Z_BP of the sandwich at message state ``m`` as ``(log_abs, phase)``
    (vertex/edge scalar algebra of `abstractbeliefpropagationcache.
    jl:252-267` on the two-layer network)."""
    D = spec.degree
    acc = t_ket
    for k in range(D):
        acc = _absorb(acc, m[:, k], 1 + k)
    lab = "".join(_LETTERS[k] for k in range(D))
    zv = jnp.einsum(f"v{lab}s,v{lab}s->v", acc, t_bra_conj,
                    precision=_PRECISION)
    edges = np.asarray(spec.edges, dtype=np.int32)
    m_at_v = m[edges[:, 1], edges[:, 3]]
    m_at_u = m[edges[:, 0], edges[:, 2]]
    se = jnp.einsum("eab,eab->e", m_at_v, m_at_u, precision=_PRECISION)
    cdtype = jnp.result_type(t_ket.dtype, jnp.complex64)
    lzv = jnp.log(zv.astype(cdtype))
    lse = jnp.log(se.astype(cdtype))
    log_z = jnp.sum(jnp.real(lzv)) - jnp.sum(jnp.real(lse))
    phase = jnp.sum(jnp.imag(lzv)) - jnp.sum(jnp.imag(lse))
    return log_z, phase


def batched_inner(
    spec: BatchedGraphSpec,
    psi: BatchedState,
    phi: BatchedState,
    *,
    maxiter: int = 50,
    tolerance: float | None = None,
    damping: float = 0.0,
):
    """Sandwich-BP overlap matching the generic ``inner(psi, phi)``
    (`inner.jl:53-98`, alg="bp"): ``psi`` is the ket and ``phi`` is
    conjugated — `BilinearForm(ket, bra)` dags its SECOND argument
    (`bilinearform.jl:1-37`), i.e. this returns Σ ψ(x)·conj(ϕ(x)) = ⟨ϕ|ψ⟩.

    Returns ``(log_abs, phase)``; jit-compatible (wrap in ``jax.jit`` or
    call inside a jitted program — e.g. per Trotter layer for an echo
    trajectory)."""
    t_ket = psi.tensors
    t_bra_conj = jnp.conj(phi.tensors)
    if tolerance is None:
        tolerance = default_batched_tolerance(t_ket.dtype)
    m0 = identity_messages(
        spec.num_vertices, spec.degree, t_ket.shape[1], t_ket.dtype
    )
    m = _sandwich_bp(spec, t_ket, t_bra_conj, m0, maxiter, tolerance,
                     damping)
    # Z_BP = Π_v z_v / Π_e s_e on the sandwich
    return sandwich_logz(spec, t_ket, t_bra_conj, m)


def make_pauli_expectation_fn(
    spec: BatchedGraphSpec,
    chi: int,
    dtype,
    ops: tuple = ("Z",),
    *,
    maxiter: int = 50,
    tolerance: float | None = None,
):
    """Per-site ⟨P⟩ = Tr[ρP_v]/Tr[ρ] on a batched density-matrix
    ("PauliRho", d=4) state, as ONE jitted program.

    The linear functional Tr[ρ·⊗X_v] is the sandwich overlap against a
    bond-1 product bra (trace vector [1,0,0,0] per site,
    `measure.pauli_expectation`); one sandwich-BP fixed point serves every
    site and every op — each value is a local-scalar ratio with the bra's
    site vector swapped to the Pauli basis vector (exact on trees, BP
    otherwise).  Returns ``fn(state) -> {op: [V] real array}``.

    No reference counterpart (unitary-only reference); the batched analogue
    of `measure.pauli_expectation` for the TPU path."""
    basis = {"I": 0, "X": 1, "Y": 2, "Z": 3}
    V, D = spec.num_vertices, spec.degree
    if tolerance is None:
        tolerance = default_batched_tolerance(dtype)

    def _bra(vec4):
        t = np.zeros((V,) + (chi,) * D + (4,), dtype=np.dtype(dtype))
        t[(slice(None),) + (0,) * D] = np.asarray(vec4, dtype=np.dtype(dtype))
        return t

    bra_tr = _bra([1.0, 0, 0, 0])
    bra_op = {
        op: _bra(np.eye(4)[basis[op.upper()]]) for op in ops
    }
    lab = "".join(_LETTERS[k] for k in range(D))

    def fn(state: BatchedState):
        t_ket = state.tensors
        m0 = identity_messages(V, D, chi, t_ket.dtype)
        bra_c = jnp.conj(jnp.asarray(bra_tr))
        m = _sandwich_bp(spec, t_ket, bra_c, m0, maxiter, tolerance, 0.0)
        acc = t_ket
        for k in range(D):
            acc = _absorb(acc, m[:, k], 1 + k)
        zv = jnp.einsum(f"v{lab}s,v{lab}s->v", acc, bra_c,
                        precision=_PRECISION)
        out = {}
        for op, bra in bra_op.items():
            zv_op = jnp.einsum(
                f"v{lab}s,v{lab}s->v", acc, jnp.conj(jnp.asarray(bra)),
                precision=_PRECISION,
            )
            out[op] = jnp.real(zv_op / zv)
        return out

    return fn


def batched_purity(
    spec: BatchedGraphSpec,
    state: BatchedState,
    *,
    log2: bool = False,
    maxiter: int = 50,
    tolerance: float | None = None,
):
    """Tr[ρ²]/Tr[ρ]² of a batched density-matrix ("PauliRho", d=4) state
    — the jitted counterpart of `measure.purity` (no reference
    counterpart; unitary-only reference).

    With ρ a ⊗-network of Pauli coefficients c: Tr[ρ²] = ‖c‖²/2ⁿ (one
    self-sandwich fixed point) and Tr[ρ] is the overlap against the
    bond-1 trace-vector product bra — both in log space, so
    ``log2=True`` returns log₂ of the value (finite at any size; the
    second Rényi entropy is its negation) while the default
    exponentiates."""
    t = state.tensors
    V, chi, D = spec.num_vertices, t.shape[1], spec.degree
    la, _ = batched_inner(spec, state, state, maxiter=maxiter,
                          tolerance=tolerance)
    tr_t = np.zeros((V,) + (chi,) * D + (4,), dtype=t.dtype)
    tr_t[(slice(None),) + (0,) * D + (0,)] = 1.0
    lt, _ = batched_inner(
        spec, state, BatchedState(jnp.asarray(tr_t), state.messages),
        maxiter=maxiter, tolerance=tolerance,
    )
    log2p = (la - V * jnp.log(2.0) - 2.0 * lt) / jnp.log(2.0)
    return log2p if log2 else 2.0 ** log2p


def batched_loschmidt_echo(
    spec: BatchedGraphSpec,
    psi0: BatchedState,
    psit: BatchedState,
    log_norm0: float | None = None,
    **kwargs,
):
    """Normalized echo |⟨ψ₀|ψ_t⟩| / (‖ψ₀‖·‖ψ_t‖) as ``(log_abs, phase)``.

    The three sandwich/norm contractions share one compiled structure;
    the phase follows the ⟨ψ₀|ψ_t⟩ = Σ conj(ψ₀(x))·ψ_t(x) numerator
    (``batched_inner`` conjugates its SECOND argument, so ψ_t goes
    first).  ``log_norm0`` optionally carries a precomputed log⟨ψ₀|ψ₀⟩ —
    on a trajectory it never changes, so computing it once saves a third
    of each step's fixed-point work."""
    l01, p01 = batched_inner(spec, psit, psi0, **kwargs)
    if log_norm0 is None:
        log_norm0, _ = batched_inner(spec, psi0, psi0, **kwargs)
    ltt, _ = batched_inner(spec, psit, psit, **kwargs)
    return l01 - 0.5 * log_norm0 - 0.5 * ltt, p01


def _sandwich_fixed_point_local(t_ket, t_bra_conj, snv, sns, spv, sps, src,
                                mask, D, S, axis, maxiter, tolerance):
    """Per-shard sandwich-BP fixed point: `sharding._bp_fixed_point` with
    the bra layer threaded through and no hermitization (sandwich
    messages are not hermitian), starting from identity messages."""
    from .sharding import _bp_fixed_point

    Vl, chi = t_ket.shape[0], t_ket.shape[1]
    eye = jnp.eye(chi, dtype=t_ket.dtype)
    m0 = jnp.broadcast_to(eye, (Vl, D, chi, chi))
    # the identity init is device-invariant but the loop carry varies per
    # shard: mark the variance explicitly for shard_map's VMA check
    # (pcast replaced the deprecated jax.lax.pvary in jax 0.9)
    if hasattr(jax.lax, "pcast"):
        m0 = jax.lax.pcast(m0, (axis,), to="varying")
    elif hasattr(jax.lax, "pvary"):  # pragma: no cover - older jax
        m0 = jax.lax.pvary(m0, (axis,))
    return _bp_fixed_point(
        t_ket, m0, snv, sns, spv, sps, src, mask, D, S, axis, maxiter,
        tolerance, t_bra_conj=t_bra_conj, hermitize=False,
    )


def make_sharded_inner(sspec, mesh, *, axis: str = "v", maxiter: int = 50,
                       tolerance: float | None = None):
    """Jitted sandwich overlap on vertex-sharded states: ``fn(psi, phi)
    -> (log_abs, phase)`` of Σ ψ(x)·conj(ϕ(x)) = ⟨ϕ|ψ⟩ — the SAME
    conjugation convention as :func:`batched_inner` (the second argument
    is conjugated) — with neither state ever gathered.

    Same semantics (and conjugation convention) as :func:`batched_inner`
    on a :class:`~.sharding.ShardedBPSpec` strip sharding: the sandwich
    fixed point runs with the engine's halo ppermutes, vertex scalars
    are shard-local, and edge scalars reuse the bond-bucket tables (one
    ppermute per cross-shard direction bucket) — Loschmidt echoes and
    truncation fidelities at pod scale."""
    from .sharding import shard_map_novma as shard_map
    from jax.sharding import PartitionSpec as P

    from .sharded_layer import _build_bond_tables

    spec = sspec.spec
    S = sspec.num_shards
    D = spec.degree
    buckets = _build_bond_tables(sspec)
    # numpy tables only (axon constant-embedding rule)
    flat_tables: list = [
        sspec.send_next_v, sspec.send_next_slot,
        sspec.send_prev_v, sspec.send_prev_slot,
        sspec.src_index, sspec.mask,
    ]
    for b in buckets:
        flat_tables += [b[3], b[4], b[5]]  # u_tab, v_tab, valid
    flat_tables = tuple(flat_tables)
    left = [(i, (i - 1) % S) for i in range(S)]
    right = [(i, (i + 1) % S) for i in range(S)]

    def body(t_psi, t_phi, *tables):
        it = iter(tables)
        snv, sns, spv, sps, src, mask = (next(it)[0] for _ in range(6))
        t_ket = t_psi
        t_bra_conj = jnp.conj(t_phi)
        tol = (tolerance if tolerance is not None
               else default_batched_tolerance(t_ket.dtype))
        m = _sandwich_fixed_point_local(
            t_ket, t_bra_conj, snv, sns, spv, sps, src, mask, D, S, axis,
            maxiter, tol,
        )

        cdtype = jnp.result_type(t_ket.dtype, jnp.complex64)
        acc = t_ket
        for k in range(D):
            acc = _absorb(acc, m[:, k], 1 + k)
        lab = "".join(_LETTERS[k] for k in range(D))
        zv = jnp.einsum(f"v{lab}s,v{lab}s->v", acc, t_bra_conj,
                        precision=_PRECISION).astype(cdtype)
        lzv = jnp.log(zv)
        log_z = jnp.sum(jnp.real(lzv))
        phase = jnp.sum(jnp.imag(lzv))

        for (su, sv, dir_, *_unused) in buckets:
            u_tab, v_tab, valid = next(it)[0], next(it)[0], next(it)[0]
            mu = m[u_tab, su]  # [B, χ, χ] (incoming into u = m_{v→u})
            mv = m[v_tab, sv]  # incoming into v = m_{u→v}
            if dir_ == +1:  # partner lives on the next shard
                mv = jax.lax.ppermute(mv, axis, perm=left)
            elif dir_ == -1:
                mv = jax.lax.ppermute(mv, axis, perm=right)
            se = jnp.einsum("eab,eab->e", mu, mv,
                            precision=_PRECISION).astype(cdtype)
            lse = jnp.log(jnp.where(valid, se, 1.0))
            log_z -= jnp.sum(jnp.real(lse))
            phase -= jnp.sum(jnp.imag(lse))

        return (jax.lax.psum(log_z, axis), jax.lax.psum(phase, axis))

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis)) + (P(axis),) * len(flat_tables),
        out_specs=(P(), P()),
    )

    @jax.jit
    def inner_fn(psi: BatchedState, phi: BatchedState):
        return fn(psi.tensors, phi.tensors, *flat_tables)

    return inner_fn


def make_sharded_pauli_expectations(
    sspec, mesh, chi: int, dtype, ops: tuple = ("Z",), *,
    axis: str = "v", maxiter: int = 50, tolerance: float | None = None,
):
    """Per-site Tr[ρP_v]/Tr[ρ] on a VERTEX-SHARDED density-matrix
    ("PauliRho", d=4) state — the sharded counterpart of
    :func:`make_pauli_expectation_fn`, completing the pod-scale noisy
    story (evolve with the d-generic sharded layer, measure without
    gathering).  One sharded sandwich fixed point against the bond-1
    trace bra (halo ppermutes only); every per-site value is a local
    scalar ratio, so the measurement itself is collective-free.

    Returns ``fn(state) -> {op: [V] real array}`` (jitted, outputs
    sharded on the vertex axis)."""
    from .sharding import shard_map_novma as shard_map
    from jax.sharding import PartitionSpec as P

    spec = sspec.spec
    S = sspec.num_shards
    D = spec.degree
    V = spec.num_vertices
    basis = {"I": 0, "X": 1, "Y": 2, "Z": 3}
    if tolerance is None:
        tolerance = default_batched_tolerance(dtype)

    def _bra(vec4):
        t = np.zeros((V,) + (chi,) * D + (4,), dtype=np.dtype(dtype))
        t[(slice(None),) + (0,) * D] = np.asarray(vec4, dtype=np.dtype(dtype))
        return t

    bras = [_bra([1.0, 0, 0, 0])] + [
        _bra(np.eye(4)[basis[op.upper()]]) for op in ops
    ]
    flat_tables = (
        sspec.send_next_v, sspec.send_next_slot,
        sspec.send_prev_v, sspec.send_prev_slot,
        sspec.src_index, sspec.mask,
    )
    lab = "".join(_LETTERS[k] for k in range(D))

    def body(t_rho, bra_tr, *rest):
        bra_ops = rest[: len(ops)]
        snv, sns, spv, sps, src, mask = (r[0] for r in rest[len(ops):])
        bra_c = jnp.conj(bra_tr)
        m = _sandwich_fixed_point_local(
            t_rho, bra_c, snv, sns, spv, sps, src, mask, D, S, axis,
            maxiter, tolerance,
        )
        acc = t_rho
        for k in range(D):
            acc = _absorb(acc, m[:, k], 1 + k)
        zv = jnp.einsum(f"v{lab}s,v{lab}s->v", acc, bra_c,
                        precision=_PRECISION)
        outs = []
        for bra in bra_ops:
            zv_op = jnp.einsum(f"v{lab}s,v{lab}s->v", acc, jnp.conj(bra),
                               precision=_PRECISION)
            outs.append(jnp.real(zv_op / zv))
        return tuple(outs)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis),) * (2 + len(ops)) + (P(axis),) * len(flat_tables),
        out_specs=(P(axis),) * len(ops),
    )

    @jax.jit
    def expect_fn(state: BatchedState):
        outs = fn(state.tensors, bras[0], *bras[1:], *flat_tables)
        return {op: out for op, out in zip(ops, outs)}

    return expect_fn
