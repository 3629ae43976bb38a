"""Batched arbitrary-distance two-point correlators on the BP path.

The generic engine measures ⟨P_a P_b⟩ for vertices at any graph distance
through ``expect(psi, ("PP", [a, b]), alg="bp")`` — a Steiner-tree
contraction (reference semantics: `/root/reference/src/expect.jl:58-83`,
where the Steiner tree of two vertices is their connecting path).  The
batched engine previously only offered :func:`~.engine.local_expectations`
(distance 0) and :func:`~.engine.bond_expectations` (distance 1), so
correlation functions C(r) = ⟨Z_0 Z_r⟩ − ⟨Z_0⟩⟨Z_r⟩ fell back to the
~1000× slower generic path.

TPU-native design (static shapes, one jitted program for ALL pairs):

- the connecting paths are found host-side (BFS over the compiled spec's
  slot tables) at trace time;
- every *interior* path vertex contributes a χ²×χ² transfer matrix
  (site leg traced against the identity, incoming BP messages absorbed
  on all non-path slots).  Interior entries are bucketed by their
  (slot_prev, slot_next) pattern — the same slot-pair bucketing the
  engine uses everywhere — so ONE einsum per pattern builds every
  transfer matrix of that shape across all requested pairs at once;
- endpoints contribute χ²-vectors (observable applied to the site leg),
  bucketed by their single open slot;
- each pair's correlator is then a chain of batched matvecs through a
  gathered transfer table under ``lax.scan`` (pairs padded to the
  longest path with an identity transfer), numerator and denominator
  riding the same scan as a doubled batch.  Per-entry max-abs rescaling
  of the shared transfer table keeps long f32 chains in range without
  touching the numer/denom ratio (each T is a shared linear factor).

Cost scales as O(L·χ⁴) per pair — χ ≲ 32 territory; at χ=64 a single
transfer matrix is 128 MB and boundary-MPS correlators are the better
tool.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .engine import (
    _LETTERS,
    _PRECISION,
    _absorb,
    _site_transfer,
    BatchedState,
    local_expectations,
)
from .structure import BatchedGraphSpec

__all__ = [
    "make_path_correlation_fn",
    "make_mutual_information_fn",
    "make_path_rdm_fn",
    "make_sharded_path_correlations",
    "make_string_expectation_fn",
    "path_correlations",
    "shortest_path",
    "string_expectations",
]


def shortest_path(spec: BatchedGraphSpec, a, b) -> tuple[list, list]:
    """BFS shortest path a→b over the compiled slot tables (host-side).

    Returns ``(verts, slots)`` with ``verts`` a list of vertex positions
    (``verts[0] == pos(a)``, ``verts[-1] == pos(b)``) and ``slots[i]``
    the slot on ``verts[i]`` pointing toward ``verts[i+1]``."""
    ia, ib = spec.vertex_position(a), spec.vertex_position(b)
    if ia == ib:
        raise ValueError("path correlator needs two distinct vertices")
    prev: dict = {ia: None}
    q = deque([ia])
    while q and ib not in prev:
        u = q.popleft()
        for s in range(spec.degree):
            if spec.slot_mask[u][s]:
                w = spec.nbr[u][s]
                if w not in prev:
                    prev[w] = (u, s)
                    q.append(w)
    if ib not in prev:
        raise ValueError(f"vertices {a!r} and {b!r} are not connected")
    verts, slots = [ib], []
    while prev[verts[-1]] is not None:
        u, s = prev[verts[-1]]
        verts.append(u)
        slots.append(s)
    verts.reverse()
    slots.reverse()
    return verts, slots


def _site_transfer2(state: BatchedState, idx, skip1: int, skip2: int):
    """Identity-traced transfer matrices at the given vertices: ψψ̄ with
    incoming messages absorbed on every slot except ``skip1``/``skip2``
    (the two path slots, left open) and the site leg traced.
    Returns ``E[b, o, p, q, r]`` with (o, p) = (ket, bra) legs on
    ``skip1`` and (q, r) on ``skip2``."""
    D = state.degree
    t = state.tensors[idx]
    m = state.messages[idx]
    acc = t
    for k in range(D):
        if k != skip1 and k != skip2:
            acc = _absorb(acc, m[:, k], 1 + k)
    lab = [_LETTERS[k] for k in range(D)]
    acc_lab, conj_lab = list(lab), list(lab)
    acc_lab[skip1], conj_lab[skip1] = "o", "p"
    acc_lab[skip2], conj_lab[skip2] = "q", "r"
    eq = f"v{''.join(acc_lab)}s,v{''.join(conj_lab)}s->vopqr"
    return jnp.einsum(eq, acc, jnp.conj(t), precision=_PRECISION)


def _build_path_tables(spec, pairs, paths):
    """Host-side tables shared by the single-device and sharded builders.

    Returns ``(paths, a_buckets, b_buckets, int_buckets, tab_t, n_int)``:
    endpoint entries bucketed by open slot (``{slot: [(pair, vertex)]}``),
    deduplicated interior entries bucketed by (slot_prev, slot_next)
    (``{(sp, sn): [(entry, vertex)]}``), and the per-pair interior chain
    ``tab_t [Lmax, P]`` (numpy int32; pad value ``n_int`` = identity)."""
    P = len(pairs)
    if P == 0:
        raise ValueError("need at least one vertex pair")
    if paths is None:
        paths = [shortest_path(spec, a, b) for a, b in pairs]
    a_entries, b_entries = [], []
    int_entries: list[tuple[int, int, int]] = []  # (vertex, slot_prev, slot_next)
    int_key: dict = {}
    Lmax = max(len(verts) - 2 for verts, _ in paths)
    tab = np.full((P, max(Lmax, 1)), -1, dtype=np.int64)
    for p, (verts, slots) in enumerate(paths):
        if len(verts) != len(slots) + 1 or len(verts) < 2:
            raise ValueError(f"malformed path for pair {pairs[p]!r}")
        a_entries.append((p, verts[0], slots[0]))
        b_entries.append((p, verts[-1], spec.nbr_slot[verts[-2]][slots[-1]]))
        for i in range(1, len(verts) - 1):
            slot_prev = spec.nbr_slot[verts[i - 1]][slots[i - 1]]
            key = (verts[i], slot_prev, slots[i])
            if key not in int_key:
                int_key[key] = len(int_entries)
                int_entries.append(key)
            tab[p, i - 1] = int_key[key]
    n_int = len(int_entries)
    tab[tab < 0] = n_int  # padding -> identity transfer
    a_buckets: dict = {}
    for p, v, s in a_entries:
        a_buckets.setdefault(s, []).append((p, v))
    b_buckets: dict = {}
    for p, v, s in b_entries:
        b_buckets.setdefault(s, []).append((p, v))
    int_buckets: dict = {}
    for j, (v, sp, sn) in enumerate(int_entries):
        int_buckets.setdefault((sp, sn), []).append((j, v))
    # NUMPY on purpose (see callers): embeds as a trace-time constant
    tab_t = np.asarray(tab.T, dtype=np.int32)  # [Lmax, P]
    return paths, a_buckets, b_buckets, int_buckets, tab_t, n_int


def _interior_transfer_table(state, int_buckets, n_int, chi2, cdtype):
    """The shared interior chain table [n_int + 1, χ², χ²] (last row =
    identity pad): one `_site_transfer2` einsum per (slot_prev,
    slot_next) bucket, with per-entry max-abs rescaling — each T
    multiplies numerator AND denominator (or a trace-normalized RDM), so
    the rescale never touches the reported value while keeping long f32
    chains in range."""
    T = jnp.zeros((n_int + 1, chi2, chi2), cdtype)
    T = T.at[n_int].set(jnp.eye(chi2, dtype=cdtype))
    for (sp, sn), entries in sorted(int_buckets.items()):
        idx = jnp.asarray([v for _, v in entries], jnp.int32)
        pos = jnp.asarray([j for j, _ in entries], jnp.int32)
        e = _site_transfer2(state, idx, sp, sn)  # [B, o, p, q, r]
        mats = e.reshape(-1, chi2, chi2)
        scale = jnp.max(jnp.abs(mats), axis=(1, 2), keepdims=True)
        mats = mats / jnp.where(scale == 0, 1.0, scale)
        T = T.at[pos].set(mats)
    return T


def make_path_correlation_fn(
    spec: BatchedGraphSpec,
    pairs: Sequence[tuple],
    op1,
    op2=None,
    *,
    paths: Sequence[tuple[list, list]] | None = None,
    connected: bool = False,
    real_output: bool = False,
    jit: bool = True,
) -> Callable:
    """Compile ``fn(state) -> [len(pairs)]`` of ⟨op1_a op2_b⟩ (BP alg).

    ``pairs`` are ``(a, b)`` vertex names at any graph distance ≥ 1;
    ``op1``/``op2`` are ``[d, d]`` site operators (``op2`` defaults to
    ``op1``).  ``paths`` overrides the BFS shortest paths with explicit
    ``(verts, slots)`` tuples (e.g. to route around a defect).  With
    ``connected=True`` the product ⟨op1_a⟩⟨op2_b⟩ of the single-site BP
    expectations is subtracted.  Computes the same contraction as the
    generic ``expect(psi, (op_string, [a, b]), alg="bp")``
    (`expect.jl:58-83`) — note that on loopy graphs the BP value depends
    on WHICH connecting path is contracted, so exact parity with the
    generic engine holds when both contract the same path (pass
    ``paths=``; BFS tie-breaking may otherwise pick a different equal-
    length path than the generic Steiner tree) — see
    tests/test_correlations.py."""
    # host-side numpy, never eager jnp: build-time device arrays closed
    # over a jitted fn are downloaded for constant embedding at lowering,
    # which raises UNIMPLEMENTED on the axon TPU runtime (CLAUDE.md)
    op1 = np.asarray(op1)
    op2 = op1 if op2 is None else np.asarray(op2)
    paths, a_buckets, b_buckets, int_buckets, tab_t, n_int = (
        _build_path_tables(spec, pairs, paths)
    )
    P = len(pairs)

    def correlations(state: BatchedState) -> jax.Array:
        chi = state.chi
        chi2 = chi * chi
        cdtype = state.tensors.dtype
        o1 = jnp.asarray(op1).astype(cdtype)
        o2 = jnp.asarray(op2).astype(cdtype)

        # endpoint χ²-vectors: [P, χ²] numerator (op applied) + denominator
        va_n = jnp.zeros((P, chi2), cdtype)
        va_d = jnp.zeros((P, chi2), cdtype)
        for s, entries in sorted(a_buckets.items()):
            idx = jnp.asarray([v for _, v in entries], jnp.int32)
            pos = jnp.asarray([p for p, _ in entries], jnp.int32)
            e = _site_transfer(state, idx, s)  # [B, o, p, s, z]
            va_n = va_n.at[pos].set(
                jnp.einsum("bopsz,zs->bop", e, o1,
                           precision=_PRECISION).reshape(-1, chi2)
            )
            va_d = va_d.at[pos].set(
                jnp.einsum("bopss->bop", e).reshape(-1, chi2)
            )
        vb_n = jnp.zeros((P, chi2), cdtype)
        vb_d = jnp.zeros((P, chi2), cdtype)
        for s, entries in sorted(b_buckets.items()):
            idx = jnp.asarray([v for _, v in entries], jnp.int32)
            pos = jnp.asarray([p for p, _ in entries], jnp.int32)
            e = _site_transfer(state, idx, s)
            vb_n = vb_n.at[pos].set(
                jnp.einsum("bopsz,zs->bop", e, o2,
                           precision=_PRECISION).reshape(-1, chi2)
            )
            vb_d = vb_d.at[pos].set(
                jnp.einsum("bopss->bop", e).reshape(-1, chi2)
            )

        T = _interior_transfer_table(state, int_buckets, n_int, chi2, cdtype)

        # chain: numerator and denominator ride one scan, gathering each
        # step's transfer matrices ONCE (the two halves share indices)
        m0 = jnp.stack([va_n, va_d], axis=0)  # [2, P, χ²]

        def body(m, idxs):
            ts = T[idxs]  # [P, χ², χ²]
            return jnp.einsum("kpi,pij->kpj", m, ts,
                              precision=_PRECISION), None

        m, _ = jax.lax.scan(body, m0, tab_t)
        vals = jnp.einsum(
            "kpi,kpi->kp", m, jnp.stack([vb_n, vb_d], axis=0),
            precision=_PRECISION,
        )
        out = vals[0] / vals[1]
        if connected:
            z1 = local_expectations(spec, state, o1)
            z2 = local_expectations(spec, state, o2)
            ia = jnp.asarray([verts[0] for verts, _ in paths], jnp.int32)
            ib = jnp.asarray([verts[-1] for verts, _ in paths], jnp.int32)
            out = out - z1[ia] * z2[ib]
        return jnp.real(out) if real_output else out

    return jax.jit(correlations) if jit else correlations


def path_correlations(
    spec: BatchedGraphSpec,
    state: BatchedState,
    pairs: Sequence[tuple],
    op1,
    op2=None,
    **kwargs,
) -> jax.Array:
    """One-shot ⟨op1_a op2_b⟩ for the given vertex pairs (BP path alg).
    See :func:`make_path_correlation_fn` for options."""
    return make_path_correlation_fn(spec, pairs, op1, op2, **kwargs)(state)


def make_sharded_path_correlations(
    sspec,
    mesh,
    pairs: Sequence[tuple],
    op1,
    op2=None,
    *,
    paths: Sequence[tuple[list, list]] | None = None,
    connected: bool = False,
    real_output: bool = False,
    axis: str = "v",
) -> Callable:
    """Path correlators on the vertex-sharded state (SPMD, one program).

    Same semantics as :func:`make_path_correlation_fn`, on a
    :class:`~.sharding.ShardedBPSpec` strip sharding.  A path's transfer
    matrix needs only its OWN vertex's tensor and incoming messages, so
    no halo exchange is required at all: each shard builds the χ²×χ²
    transfer entries and endpoint χ²-vectors it owns (slot-pattern
    buckets, static per-shard tables padded to the widest shard), ONE
    ``psum`` assembles the replicated table across the mesh (entries are
    zero off their owner shard), and the cheap matvec chain runs
    replicated.  ICI traffic is O(total path length · χ⁴) once per call,
    independent of the state size — the state itself never gathers.
    Completes the sharded op set's measurement story next to
    `make_sharded_site_expectations` / `make_sharded_bond_expectations`
    (reference semantics: `expect.jl:58-83`)."""
    from .sharding import shard_map_novma as shard_map
    from jax.sharding import PartitionSpec as P

    spec = sspec.spec
    S = sspec.num_shards
    Vl = spec.num_vertices // S
    # host-side numpy, never eager jnp (axon constant-embedding rule —
    # see make_path_correlation_fn)
    op1 = np.asarray(op1)
    op2 = op1 if op2 is None else np.asarray(op2)
    Pn = len(pairs)
    paths, a_buckets, b_buckets, int_buckets, tab_t, n_int = (
        _build_path_tables(spec, pairs, paths)
    )

    def shard_tables(entries):
        """[(dest_row, vertex_pos)] -> per-shard padded (local_idx, dest)
        tables [S, Bmax]; pad locals to 0 and dests to the scratch row."""
        rows: list[list] = [[] for _ in range(S)]
        for dest, pos in entries:
            rows[pos // Vl].append((pos % Vl, dest))
        bmax = max(1, max(len(r) for r in rows))
        loc = np.zeros((S, bmax), np.int32)
        dst = np.full((S, bmax), -1, np.int64)
        for s, r in enumerate(rows):
            for i, (l, d) in enumerate(r):
                loc[s, i], dst[s, i] = l, d
        return loc, dst

    a_tabs = {s: shard_tables(e) for s, e in sorted(a_buckets.items())}
    b_tabs = {s: shard_tables(e) for s, e in sorted(b_buckets.items())}
    i_tabs = {k: shard_tables(e) for k, e in sorted(int_buckets.items())}

    flat_tables = []
    for tabs in (a_tabs, b_tabs, i_tabs):
        for loc, dst in tabs.values():
            # dest scratch row = last row of each accumulator; numpy so
            # the jit closure embeds them without a device download
            flat_tables += [loc, dst]
    flat_tables = tuple(flat_tables)

    def body(tensors, messages, *tables):
        st = BatchedState(tensors, messages)
        chi = st.chi
        chi2 = chi * chi
        cdtype = tensors.dtype
        o1 = jnp.asarray(op1).astype(cdtype)
        o2 = jnp.asarray(op2).astype(cdtype)
        it = iter(tables)

        def endpoint(tabs, op):
            vn = jnp.zeros((Pn + 1, chi2), cdtype)
            vd = jnp.zeros((Pn + 1, chi2), cdtype)
            for s in tabs:
                loc, dst = next(it)[0], next(it)[0]
                e = _site_transfer(st, loc, s)
                num = jnp.einsum("bopsz,zs->bop", e, op,
                                 precision=_PRECISION).reshape(-1, chi2)
                den = jnp.einsum("bopss->bop", e).reshape(-1, chi2)
                # pad dests are -1: JAX index wrapping lands them on the
                # scratch row (the accumulator's last row) by construction
                vn = vn.at[dst].set(num)
                vd = vd.at[dst].set(den)
            # scratch row dropped; psum assembles owner contributions
            return (jax.lax.psum(vn[:Pn], axis),
                    jax.lax.psum(vd[:Pn], axis))

        va_n, va_d = endpoint(a_tabs, o1)
        vb_n, vb_d = endpoint(b_tabs, o2)

        T = jnp.zeros((n_int + 1, chi2, chi2), cdtype)
        for (sp, sn) in i_tabs:
            loc, dst = next(it)[0], next(it)[0]
            e = _site_transfer2(st, loc, sp, sn)
            mats = e.reshape(-1, chi2, chi2)
            scale = jnp.max(jnp.abs(mats), axis=(1, 2), keepdims=True)
            mats = mats / jnp.where(scale == 0, 1.0, scale)
            T = T.at[dst].set(mats)  # -1 pads wrap to the scratch row
        T = jax.lax.psum(T[:n_int], axis)
        T = jnp.concatenate(
            [T, jnp.eye(chi2, dtype=cdtype)[None]], axis=0
        )

        m = jnp.stack([va_n, va_d], axis=0)  # [2, P, χ²]

        def step(m_c, idxs):
            ts = T[idxs]  # gathered once; both halves share indices
            return jnp.einsum("kpi,pij->kpj", m_c, ts,
                              precision=_PRECISION), None

        m, _ = jax.lax.scan(step, m, tab_t)
        vals = jnp.einsum("kpi,kpi->kp", m,
                          jnp.stack([vb_n, vb_d], axis=0),
                          precision=_PRECISION)
        out = vals[0] / vals[1]
        return jnp.real(out) if real_output else out

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis)) + (P(axis),) * len(flat_tables),
        out_specs=P(),
    )

    @jax.jit
    def corr_fn(state: BatchedState):
        out = fn(state.tensors, state.messages, *flat_tables)
        return out

    if not connected:
        return corr_fn

    from .sharded_layer import make_sharded_site_expectations

    ia = np.asarray([verts[0] for verts, _ in paths])
    ib = np.asarray([verts[-1] for verts, _ in paths])
    site1 = make_sharded_site_expectations(sspec, mesh, op1, axis=axis)
    site2 = make_sharded_site_expectations(sspec, mesh, op2, axis=axis)

    @jax.jit
    def connected_fn(state: BatchedState):
        out = corr_fn(state)
        z1 = site1(state)
        z2 = site2(state)
        out = out - z1[jnp.asarray(ia)] * z2[jnp.asarray(ib)]
        return jnp.real(out) if real_output else out

    return connected_fn


def _site_transfer2_op(state: BatchedState, idx, skip1: int, skip2: int, op):
    """Op-inserted variant of :func:`_site_transfer2`: the ``[d, d]`` site
    operator is applied between the ket and bra site legs instead of the
    identity trace.  Same index order ``E[b, o, p, q, r]``."""
    D = state.degree
    t = state.tensors[idx]
    m = state.messages[idx]
    acc = t
    for k in range(D):
        if k != skip1 and k != skip2:
            acc = _absorb(acc, m[:, k], 1 + k)
    lab = [_LETTERS[k] for k in range(D)]
    acc_lab, conj_lab = list(lab), list(lab)
    acc_lab[skip1], conj_lab[skip1] = "o", "p"
    acc_lab[skip2], conj_lab[skip2] = "q", "r"
    eq = f"v{''.join(acc_lab)}s,v{''.join(conj_lab)}z,zs->vopqr"
    return jnp.einsum(eq, acc, jnp.conj(t), op, precision=_PRECISION)


def make_string_expectation_fn(
    spec: BatchedGraphSpec,
    strings: Sequence[tuple],
    *,
    real_output: bool = False,
    jit: bool = True,
) -> Callable:
    """Compile ``fn(state) -> [len(strings)]`` of multi-site string
    expectations ⟨∏_i op_i⟩ (BP alg) — the batched counterpart of the
    generic ``expect(psi, (op_string, verts), alg="bp")`` for observables
    on MORE than two vertices whose Steiner tree is a path: parity
    strings ⟨Z Z … Z⟩, string order parameters ⟨Z X … X Z⟩, Wilson-line
    operators (reference Steiner-tree semantics: `expect.jl:58-83`).

    Each string is ``(ops, verts)``: ``ops`` a string of Pauli letters
    (one per vertex, resolved via the gate zoo's Pauli table) or a
    sequence of ``[d, d]`` matrices; ``verts`` the operator-carrying
    vertices *in path order* — consecutive entries are joined by BFS
    shortest paths and intermediate vertices carry the identity, exactly
    like the generic engine's Steiner-tree fill-in.  The combined walk
    must be vertex-disjoint (a path); branching vertex sets raise (use
    the generic ``expect`` there).

    Same transfer-chain design as :func:`make_path_correlation_fn`; the
    numerator and denominator chains no longer share every interior
    entry (op-inserted vs identity-traced), so each op-inserted transfer
    is rescaled by its OWN vertex's identity-traced scale — numerator
    and denominator then carry identical rescale factors per step and
    the ratio is untouched."""
    from ..models.gates import _PAULIS

    op_mats: list[np.ndarray] = []
    op_key: dict = {}

    def op_id(mat: np.ndarray) -> int:
        k = (mat.shape, mat.dtype.str, mat.tobytes())
        if k not in op_key:
            op_key[k] = len(op_mats)
            op_mats.append(mat)
        return op_key[k]

    P = len(strings)
    if P == 0:
        raise ValueError("need at least one string observable")
    resolved = []  # (full_verts, full_slots, {pos: opid})
    for ops, verts in strings:
        if isinstance(ops, str):
            mats = [np.asarray(_PAULIS[c.upper()], np.complex128) for c in ops]
        else:
            mats = [np.asarray(o) for o in ops]
        if len(mats) != len(verts):
            raise ValueError(
                f"need one operator per vertex: got {len(mats)} ops for "
                f"{len(verts)} vertices"
            )
        if len(verts) < 2:
            raise ValueError(
                "string observables need >= 2 vertices; use "
                "local_expectations for single sites"
            )
        full_verts = [spec.vertex_position(verts[0])]
        full_slots: list[int] = []
        for a, b in zip(verts, verts[1:]):
            vs, ss = shortest_path(spec, a, b)
            full_verts += vs[1:]
            full_slots += ss
        if len(set(full_verts)) != len(full_verts):
            raise ValueError(
                "the string's walk revisits a vertex — only path-shaped "
                "Steiner trees run on the batched engine; use the generic "
                "expect for branching vertex sets"
            )
        opid_at = {
            spec.vertex_position(v): op_id(m) for v, m in zip(verts, mats)
        }
        resolved.append((full_verts, full_slots, opid_at))

    # --- host-side bucket/table construction (numpy only: axon rule) ---
    a_num: dict = {}   # (slot, opid) -> [(p, vertex)]
    a_den: dict = {}   # slot -> [(p, vertex)]
    b_num: dict = {}
    b_den: dict = {}
    den_entries: list[tuple] = []   # (vertex, slot_prev, slot_next)
    den_key: dict = {}
    num_entries: list[tuple] = []   # (vertex, slot_prev, slot_next, opid)
    num_key: dict = {}
    for full_verts, full_slots, opid_at in resolved:
        for i in range(1, len(full_verts) - 1):
            sp = spec.nbr_slot[full_verts[i - 1]][full_slots[i - 1]]
            sn = full_slots[i]
            dk = (full_verts[i], sp, sn)
            if dk not in den_key:
                den_key[dk] = len(den_entries)
                den_entries.append(dk)
            oid = opid_at.get(full_verts[i])
            if oid is not None:
                nk = (full_verts[i], sp, sn, oid)
                if nk not in num_key:
                    num_key[nk] = len(num_entries)
                    num_entries.append(nk)
    n_den, n_num = len(den_entries), len(num_entries)
    pad = n_den + n_num  # identity row
    Lmax = max(len(fv) - 2 for fv, _, _ in resolved)
    tab = np.full((P, max(Lmax, 1), 2), pad, dtype=np.int64)  # [.., (num, den)]
    for p, (full_verts, full_slots, opid_at) in enumerate(resolved):
        sa = full_slots[0]
        a_num.setdefault((sa, opid_at[full_verts[0]]), []).append(
            (p, full_verts[0])
        )
        a_den.setdefault(sa, []).append((p, full_verts[0]))
        sb = spec.nbr_slot[full_verts[-2]][full_slots[-1]]
        b_num.setdefault((sb, opid_at[full_verts[-1]]), []).append(
            (p, full_verts[-1])
        )
        b_den.setdefault(sb, []).append((p, full_verts[-1]))
        for i in range(1, len(full_verts) - 1):
            sp = spec.nbr_slot[full_verts[i - 1]][full_slots[i - 1]]
            sn = full_slots[i]
            j_den = den_key[(full_verts[i], sp, sn)]
            oid = opid_at.get(full_verts[i])
            # identity interiors share the den row in the num chain, so
            # their rescale factors cancel step-by-step by construction
            j_num = j_den if oid is None else n_den + num_key[
                (full_verts[i], sp, sn, oid)
            ]
            tab[p, i - 1] = (j_num, j_den)
    tab_t = np.asarray(tab.transpose(1, 2, 0), dtype=np.int32)  # [L, 2, P]
    den_buckets: dict = {}
    for j, (v, sp, sn) in enumerate(den_entries):
        den_buckets.setdefault((sp, sn), []).append((j, v))
    num_buckets: dict = {}
    for j, (v, sp, sn, oid) in enumerate(num_entries):
        num_buckets.setdefault((sp, sn, oid), []).append(
            (j, v, den_key[(v, sp, sn)])
        )

    def string_fn(state: BatchedState) -> jax.Array:
        chi = state.chi
        chi2 = chi * chi
        cdtype = state.tensors.dtype
        rdtype = jnp.real(jnp.zeros((), cdtype)).dtype
        ops_dev = [jnp.asarray(m).astype(cdtype) for m in op_mats]

        def endpoints(nbuckets, dbuckets):
            vn = jnp.zeros((P, chi2), cdtype)
            vd = jnp.zeros((P, chi2), cdtype)
            for (s, oid), entries in sorted(nbuckets.items()):
                idx = jnp.asarray([v for _, v in entries], jnp.int32)
                pos = jnp.asarray([p for p, _ in entries], jnp.int32)
                e = _site_transfer(state, idx, s)  # [B, o, p, s, z]
                vn = vn.at[pos].set(
                    jnp.einsum("bopsz,zs->bop", e, ops_dev[oid],
                               precision=_PRECISION).reshape(-1, chi2)
                )
            for s, entries in sorted(dbuckets.items()):
                idx = jnp.asarray([v for _, v in entries], jnp.int32)
                pos = jnp.asarray([p for p, _ in entries], jnp.int32)
                e = _site_transfer(state, idx, s)  # XLA CSE merges with above
                vd = vd.at[pos].set(
                    jnp.einsum("bopss->bop", e).reshape(-1, chi2)
                )
            return vn, vd

        va_n, va_d = endpoints(a_num, a_den)
        vb_n, vb_d = endpoints(b_num, b_den)

        T = jnp.zeros((pad + 1, chi2, chi2), cdtype)
        T = T.at[pad].set(jnp.eye(chi2, dtype=cdtype))
        scales = jnp.ones((max(n_den, 1),), rdtype)
        for (sp, sn), entries in sorted(den_buckets.items()):
            idx = jnp.asarray([v for _, v in entries], jnp.int32)
            pos = jnp.asarray([j for j, _ in entries], jnp.int32)
            e = _site_transfer2(state, idx, sp, sn).reshape(-1, chi2, chi2)
            sc = jnp.max(jnp.abs(e), axis=(1, 2))
            sc = jnp.where(sc == 0, jnp.ones((), rdtype), sc)
            T = T.at[pos].set(e / sc[:, None, None])
            scales = scales.at[pos].set(sc)
        for (sp, sn, oid), entries in sorted(num_buckets.items()):
            idx = jnp.asarray([v for _, v, _ in entries], jnp.int32)
            pos = jnp.asarray([n_den + j for j, _, _ in entries], jnp.int32)
            partner = jnp.asarray([d for _, _, d in entries], jnp.int32)
            e = _site_transfer2_op(
                state, idx, sp, sn, ops_dev[oid]
            ).reshape(-1, chi2, chi2)
            sc = scales[partner]  # partner den scale: cancels in the ratio
            T = T.at[pos].set(e / sc[:, None, None])

        m = jnp.stack([va_n, va_d], axis=0)  # [2, P, χ²]

        def body(m_c, idxs):  # idxs [2, P]
            ts = T[idxs]  # [2, P, χ², χ²]
            return jnp.einsum("kpi,kpij->kpj", m_c, ts,
                              precision=_PRECISION), None

        m, _ = jax.lax.scan(body, m, tab_t)
        vals = jnp.einsum(
            "kpi,kpi->kp", m, jnp.stack([vb_n, vb_d], axis=0),
            precision=_PRECISION,
        )
        out = vals[0] / vals[1]
        return jnp.real(out) if real_output else out

    return jax.jit(string_fn) if jit else string_fn


def string_expectations(
    spec: BatchedGraphSpec,
    state: BatchedState,
    strings: Sequence[tuple],
    **kwargs,
) -> jax.Array:
    """One-shot multi-site string expectations (BP path alg).  See
    :func:`make_string_expectation_fn`."""
    return make_string_expectation_fn(spec, strings, **kwargs)(state)


def make_path_rdm_fn(
    spec: BatchedGraphSpec,
    pairs: Sequence[tuple],
    *,
    paths: Sequence[tuple[list, list]] | None = None,
    jit: bool = True,
) -> Callable:
    """Compile ``fn(state) -> [len(pairs), d, d, d, d]`` of trace-normalized
    two-site RDMs ρ_ab for vertex pairs at ANY graph distance (BP alg) —
    the batched counterpart of ``reduced_density_matrix(psi, [a, b],
    alg="bp")`` (`rdm.jl:49-70`), extending :func:`~.engine.bond_rdms`
    beyond adjacent pairs.  Index order matches ``bond_rdms``:
    (ket_a, bra_a, ket_b, bra_b).

    Same machinery as :func:`make_path_correlation_fn` with the endpoint
    site legs left OPEN: the interior chain is identical (and shared with
    a correlator built over the same paths at trace level), the carry
    just grows a d² axis."""
    paths, a_buckets, b_buckets, int_buckets, tab_t, n_int = (
        _build_path_tables(spec, pairs, paths)
    )
    P = len(pairs)

    def rdms(state: BatchedState) -> jax.Array:
        chi = state.chi
        chi2 = chi * chi
        d = state.tensors.shape[-1]
        cdtype = state.tensors.dtype

        def endpoints(buckets):
            out = jnp.zeros((P, d * d, chi2), cdtype)
            for s, entries in sorted(buckets.items()):
                idx = jnp.asarray([v for _, v in entries], jnp.int32)
                pos = jnp.asarray([p for p, _ in entries], jnp.int32)
                e = _site_transfer(state, idx, s)  # [B, o, p, s, z]
                vec = e.reshape(-1, chi2, d * d).transpose(0, 2, 1)
                out = out.at[pos].set(vec)
            return out

        va = endpoints(a_buckets)  # [P, d², χ²]
        vb = endpoints(b_buckets)

        T = _interior_transfer_table(state, int_buckets, n_int, chi2, cdtype)

        def body(m, idxs):
            ts = T[idxs]
            return jnp.einsum("pdi,pij->pdj", m, ts,
                              precision=_PRECISION), None

        m, _ = jax.lax.scan(body, va, tab_t)
        rho = jnp.einsum("pdi,pei->pde", m, vb, precision=_PRECISION)
        rho = rho.reshape(P, d, d, d, d)
        tr = jnp.einsum("paabb->p", rho)
        return rho / tr[:, None, None, None, None]

    return jax.jit(rdms) if jit else rdms


def make_mutual_information_fn(
    spec: BatchedGraphSpec,
    pairs: Sequence[tuple],
    *,
    paths: Sequence[tuple[list, list]] | None = None,
    jit: bool = True,
) -> Callable:
    """Compile ``fn(state) -> [len(pairs)]`` of the quantum mutual
    information I(a:b) = S(ρ_a) + S(ρ_b) − S(ρ_ab) between vertex pairs
    at any graph distance (BP alg; natural log).

    ρ_ab comes from :func:`make_path_rdm_fn`; the one-site marginals are
    traced out of it (so all three entropies share one contraction and
    are exactly consistent).  Entropies use eigenvalue clipping at 0 —
    BP RDMs can carry tiny negative eigenvalues at float precision.
    A standard diagnostic of correlation structure (e.g. MI light cones
    after a quench); no reference counterpart."""
    rdm_fn = make_path_rdm_fn(spec, pairs, paths=paths, jit=False)

    def entropy(w):
        w = jnp.clip(jnp.real(w), 0.0, None)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        return -jnp.sum(jnp.where(w > 0, w * jnp.log(w), 0.0), axis=-1)

    def mutual_information(state: BatchedState) -> jax.Array:
        rho = rdm_fn(state)  # [P, sa, za, sb, zb], trace-normalized
        d = rho.shape[-1]
        rho_a = jnp.einsum("pszcc->psz", rho)
        rho_b = jnp.einsum("pccsz->psz", rho)
        rho_ab = jnp.reshape(
            jnp.transpose(rho, (0, 1, 3, 2, 4)), (-1, d * d, d * d)
        )  # rows (sa sb), cols (za zb)
        sa = entropy(jnp.linalg.eigvalsh(0.5 * (
            rho_a + jnp.conj(jnp.swapaxes(rho_a, -1, -2)))))
        sb = entropy(jnp.linalg.eigvalsh(0.5 * (
            rho_b + jnp.conj(jnp.swapaxes(rho_b, -1, -2)))))
        sab = entropy(jnp.linalg.eigvalsh(0.5 * (
            rho_ab + jnp.conj(jnp.swapaxes(rho_ab, -1, -2)))))
        return sa + sb - sab

    return jax.jit(mutual_information) if jit else mutual_information
