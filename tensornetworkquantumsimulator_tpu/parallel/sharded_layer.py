"""Explicitly sharded full Trotter layer: SPMD simple update + halo BP.

Round-1 sharding covered only BP messages (`sharding.py`); the state
transformation itself relied on jit auto-SPMD, which lets XLA all-gather
the whole state.  This module shards the *gate application* too
(SURVEY.md §2 item 2: "state transformation, not just messages"):

- vertex tensors and messages stay sharded in contiguous lattice strips
  (``shard_spec`` order) for the entire layer;
- each edge-color group splits into *intra-shard* buckets (pure local
  compute) and *cross-shard* buckets, whose partner rows are halo-exchanged
  with two ``ppermute`` collectives (gather partner tensor+messages, send
  back the update) — the ICI-native analogue of the reference's sequential
  per-edge sweep (`apply_gates.jl:60-85`);
- ragged per-shard edge counts are handled WITHOUT scatters: gather
  tables are 0-padded (garbage lanes compute and are discarded), and the
  write-back is an inverse-permutation gather + ``jnp.where`` select per
  local vertex — each row receives either the exact new value or its
  exact old value (no pad-index bookkeeping, no duplicate-scatter
  hazards, works even when a bucket touches every local vertex).  The
  sharded layer stays bitwise-faithful to the unsharded one (important:
  simple-update SVDs with degenerate spectra turn any rounding
  difference into a bond-gauge jump);
- between color groups the halo-exchange flooding BP of
  `sharding._bp_fixed_point` refreshes the environments, mirroring the
  unsharded `make_layer_fn` refresh points.

The whole layer is ONE ``shard_map`` program: no all-gathers, collective
traffic = O(boundary) per color group.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .engine import (
    BatchedState,
    _PRECISION,
    _simple_update_core,
    default_batched_tolerance,
)
from .sharding import ShardedBPSpec, _bp_fixed_point


@dataclasses.dataclass(frozen=True)
class _IntraBucket:
    slot_u: int
    slot_v: int
    u_tab: np.ndarray  # [S, B] local u positions (0-padded gather table)
    v_tab: np.ndarray  # [S, B]
    valid: np.ndarray  # [S, B]
    u_inv: np.ndarray  # [S, Vl] lane writing each local vertex (else 0)
    u_wr: np.ndarray  # [S, Vl] whether that vertex is written
    v_inv: np.ndarray  # [S, Vl]
    v_wr: np.ndarray  # [S, Vl]


@dataclasses.dataclass(frozen=True)
class _CrossBucket:
    slot_u: int  # slot on the computing-side (u) vertex
    slot_v: int  # slot on the partner (v) vertex
    dir: int  # +1: v lives in the next shard; -1: v lives in the prev shard
    u_tab: np.ndarray  # [S, B] computing shard's local u positions
    vsend_tab: np.ndarray  # [S, B] partner positions each shard sends out
    valid: np.ndarray  # [S, B] valid on the computing shard
    u_inv: np.ndarray  # [S, Vl]
    u_wr: np.ndarray  # [S, Vl]
    vs_inv: np.ndarray  # [S, Vl] lane of the returned payload per sender row
    vs_wr: np.ndarray  # [S, Vl]


def _inverse_table(pairs_per_shard, Vl: int):
    """[(target_local_vertex, lane)] per shard -> (inv [S,Vl], wr [S,Vl]).

    Color groups are matchings, so each local vertex is targeted by at
    most one lane; the write-back ``where(wr, new[inv], old)`` is then a
    deterministic select with no duplicate-scatter hazard."""
    S = len(pairs_per_shard)
    inv = np.zeros((S, Vl), np.int32)
    wr = np.zeros((S, Vl), bool)
    for s, pairs in enumerate(pairs_per_shard):
        for tgt, lane in pairs:
            assert not wr[s, tgt], "bucket writes a vertex twice"
            inv[s, tgt] = lane
            wr[s, tgt] = True
    return inv, wr


def build_layer_groups(sspec: ShardedBPSpec):
    """Split every color group of the strip-ordered spec into intra/cross
    buckets with per-shard padded tables."""
    spec = sspec.spec
    S = sspec.num_shards
    Vl = spec.num_vertices // S
    groups = []
    for group in spec.color_groups:
        intra: dict = {}
        cross: dict = {}
        for b in group:
            for iu, iv in zip(b.u_idx, b.v_idx):
                su_s, sv_s = iu // Vl, iv // Vl
                if su_s == sv_s:
                    intra.setdefault((b.slot_u, b.slot_v), []).append(
                        (su_s, iu % Vl, iv % Vl)
                    )
                elif (su_s + 1) % S == sv_s:
                    cross.setdefault((b.slot_u, b.slot_v, +1), []).append(
                        (su_s, iu % Vl, iv % Vl)
                    )
                elif (sv_s + 1) % S == su_s:
                    cross.setdefault((b.slot_u, b.slot_v, -1), []).append(
                        (su_s, iu % Vl, iv % Vl)
                    )
                else:
                    raise ValueError(
                        "non-adjacent cross-shard edge: strip partition "
                        "invalid for gate application"
                    )
        buckets = []
        for (su, sv), entries in sorted(intra.items()):
            per_shard: list = [[] for _ in range(S)]
            for (s, lu, lv) in entries:
                per_shard[s].append((lu, lv))
            B = max(1, max(len(l) for l in per_shard))
            u_tab = np.zeros((S, B), np.int32)
            v_tab = np.zeros((S, B), np.int32)
            valid = np.zeros((S, B), bool)
            for s, lst in enumerate(per_shard):
                for i, (lu, lv) in enumerate(lst):
                    u_tab[s, i], v_tab[s, i], valid[s, i] = lu, lv, True
            u_inv, u_wr = _inverse_table(
                [[(lu, i) for i, (lu, _) in enumerate(lst)]
                 for lst in per_shard], Vl)
            v_inv, v_wr = _inverse_table(
                [[(lv, i) for i, (_, lv) in enumerate(lst)]
                 for lst in per_shard], Vl)
            buckets.append(_IntraBucket(
                su, sv, u_tab, v_tab, valid, u_inv, u_wr, v_inv, v_wr))
        for (su, sv, dir_), entries in sorted(cross.items()):
            per_shard: list = [[] for _ in range(S)]
            for (s, lu, lv) in entries:
                per_shard[s].append((lu, lv))
            B = max(1, max(len(l) for l in per_shard))
            u_tab = np.zeros((S, B), np.int32)
            vsend = np.zeros((S, B), np.int32)
            valid = np.zeros((S, B), bool)
            for s, lst in enumerate(per_shard):
                for i, (lu, lv) in enumerate(lst):
                    u_tab[s, i], valid[s, i] = lu, True
            vs_pairs: list = [[] for _ in range(S)]
            for s in range(S):
                sender = (s + dir_) % S
                # edges computed by s; their v's live on the sender shard
                for i, (_, lv) in enumerate(per_shard[s]):
                    vsend[sender, i] = lv
                    vs_pairs[sender].append((lv, i))
            u_inv, u_wr = _inverse_table(
                [[(lu, i) for i, (lu, _) in enumerate(lst)]
                 for lst in per_shard], Vl)
            vs_inv, vs_wr = _inverse_table(vs_pairs, Vl)
            buckets.append(_CrossBucket(
                su, sv, dir_, u_tab, vsend, valid, u_inv, u_wr,
                vs_inv, vs_wr))
        groups.append(tuple(buckets))
    return tuple(groups)


def _masked_pick(valid, new, old):
    """new where valid else old — exact values, no re-rounding."""
    m = valid.reshape(valid.shape + (1,) * (new.ndim - 1))
    return jnp.where(m, new.astype(old.dtype), old)


def _select_rows(old, new, inv, wr):
    """Write-back without scatter: ``old[p] <- new[inv[p]] where wr[p]``.

    ``jnp.where`` is an exact select, so every row carries either its
    exact old bits or the exact new lane — the deterministic replacement
    for ``old.at[tab].set(...)`` with padded scatter rows."""
    m = wr.reshape(wr.shape + (1,) * (old.ndim - 1))
    return jnp.where(m, new[inv].astype(old.dtype), old)


def make_sharded_layer(
    sspec: ShardedBPSpec,
    mesh: Mesh,
    gate2: np.ndarray,  # [d, d, d, d] uniform 2-site gate (e.g. Rzz)
    gate1: np.ndarray | None,  # [d, d] uniform 1-site gate (e.g. Rx)
    chi: int,
    cutoff: float = 1e-12,
    normalize_tensors: bool = True,
    bp_maxiter: int = 30,
    bp_tolerance: float | None = None,
    one_site_first: bool = True,
    final_update: bool = True,
    axis: str = "v",
    initial_update: bool = False,
):
    """Build the jitted fully-SPMD Trotter layer
    ``state -> (state, truncation_errors)``.

    Matches the unsharded `make_layer_fn` semantics for the uniform
    kicked-Ising layer (1-site gate on every vertex + 2-site gate on every
    edge, color group by color group with BP refreshes in between).  State
    arrays must be sharded on the vertex axis over ``mesh[axis]``."""
    from .sharding import shard_map_novma as shard_map

    spec = sspec.spec
    D = spec.degree
    S = sspec.num_shards
    groups = build_layer_groups(sspec)
    gate2 = np.asarray(gate2)

    bp_tables = (
        sspec.send_next_v, sspec.send_next_slot,
        sspec.send_prev_v, sspec.send_prev_slot,
        sspec.src_index, sspec.mask,
    )
    # flat tuple of all per-shard tables, in a fixed traversal order
    flat_tables: list = [np.asarray(t) for t in bp_tables]
    for group in groups:
        for b in group:
            if isinstance(b, _IntraBucket):
                flat_tables += [
                    np.asarray(b.u_tab), np.asarray(b.v_tab),
                    np.asarray(b.valid),
                    np.asarray(b.u_inv), np.asarray(b.u_wr),
                    np.asarray(b.v_inv), np.asarray(b.v_wr),
                ]
            else:
                flat_tables += [
                    np.asarray(b.u_tab), np.asarray(b.vsend_tab),
                    np.asarray(b.valid),
                    np.asarray(b.u_inv), np.asarray(b.u_wr),
                    np.asarray(b.vs_inv), np.asarray(b.vs_wr),
                ]
    flat_tables = tuple(flat_tables)

    if bp_tolerance is None:
        bp_tolerance = None  # resolved per-dtype inside the body

    left = [(i, (i - 1) % S) for i in range(S)]
    right = [(i, (i + 1) % S) for i in range(S)]

    def body(tensors, messages, *tables):
        it = iter(tables)
        bp_tabs = [next(it)[0] for _ in range(6)]
        tol = (
            bp_tolerance
            if bp_tolerance is not None
            else default_batched_tolerance(tensors.dtype)
        )

        def bp(tensors, messages):
            return _bp_fixed_point(
                tensors, messages, *bp_tabs, D, S, axis, bp_maxiter, tol
            )

        def one_site(tensors):
            g = jnp.asarray(gate1).astype(tensors.dtype)
            return jnp.einsum(
                "v...d,pd->v...p", tensors, g, precision=_PRECISION
            )

        errs = []
        # initial_update forces a BP refresh before the first group even
        # when no one-site gate dirtied the messages (batched_truncate
        # semantics: every group is preceded by an update)
        applied = initial_update
        if gate1 is not None and one_site_first:
            tensors = one_site(tensors)
            applied = True
        for group in groups:
            if applied:
                messages = bp(tensors, messages)
            for b in group:
                if isinstance(b, _IntraBucket):
                    u_tab, v_tab, valid = (
                        next(it)[0], next(it)[0], next(it)[0]
                    )
                    u_inv, u_wr = next(it)[0], next(it)[0]
                    v_inv, v_wr = next(it)[0], next(it)[0]
                    tu, tv = tensors[u_tab], tensors[v_tab]
                    mu, mv = messages[u_tab], messages[v_tab]
                    tu_new, tv_new, msg, err = _simple_update_core(
                        tu, tv, mu, mv, jnp.asarray(gate2), b.slot_u,
                        b.slot_v, chi, cutoff, normalize_tensors,
                    )
                    tensors = _select_rows(tensors, tu_new, u_inv, u_wr)
                    tensors = _select_rows(tensors, tv_new, v_inv, v_wr)
                    messages = messages.at[:, b.slot_u].set(_select_rows(
                        messages[:, b.slot_u], msg, u_inv, u_wr))
                    messages = messages.at[:, b.slot_v].set(_select_rows(
                        messages[:, b.slot_v], msg, v_inv, v_wr))
                    errs.append(jnp.where(valid, err, 0.0))
                else:
                    u_tab, vs_tab, valid = (
                        next(it)[0], next(it)[0], next(it)[0]
                    )
                    u_inv, u_wr = next(it)[0], next(it)[0]
                    vs_inv, vs_wr = next(it)[0], next(it)[0]
                    # halo gather: every shard sends its partner rows toward
                    # the computing shard (left when v lives in the next
                    # shard, right when it lives in the previous one)
                    gather = left if b.dir == +1 else right
                    ret = right if b.dir == +1 else left
                    tv = jax.lax.ppermute(tensors[vs_tab], axis, gather)
                    mv = jax.lax.ppermute(messages[vs_tab], axis, gather)
                    tu, mu = tensors[u_tab], messages[u_tab]
                    tu_new, tv_new, msg, err = _simple_update_core(
                        tu, tv, mu, mv, jnp.asarray(gate2), b.slot_u,
                        b.slot_v, chi, cutoff, normalize_tensors,
                    )
                    tensors = _select_rows(tensors, tu_new, u_inv, u_wr)
                    messages = messages.at[:, b.slot_u].set(_select_rows(
                        messages[:, b.slot_u], msg, u_inv, u_wr))
                    # send the partner-side update back to its owner; the
                    # owner's vs_inv/vs_wr select the valid payload lanes
                    tv_back = jax.lax.ppermute(tv_new, axis, ret)
                    mv_back = jax.lax.ppermute(msg, axis, ret)
                    tensors = _select_rows(tensors, tv_back, vs_inv, vs_wr)
                    messages = messages.at[:, b.slot_v].set(_select_rows(
                        messages[:, b.slot_v], mv_back, vs_inv, vs_wr))
                    errs.append(jnp.where(valid, err, 0.0))
            applied = True
        if gate1 is not None and not one_site_first:
            tensors = one_site(tensors)
        if final_update:
            messages = bp(tensors, messages)
        all_errs = (
            jnp.concatenate(errs)
            if errs
            else jnp.zeros((1,), jnp.float32)
        )
        return tensors, messages, all_errs

    spec_v = P(axis)
    n_in = 2 + len(flat_tables)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_v,) * n_in,
        out_specs=(spec_v, spec_v, spec_v),
    )

    @jax.jit
    def layer(state: BatchedState):
        t, m, errs = fn(state.tensors, state.messages, *flat_tables)
        return BatchedState(t, m), errs

    return layer


# ---------------------------------------------------------------------------
# sharded BP-alg measurement (round-2 VERDICT missing item 1: a sharded
# lattice could be *evolved* across devices but had to be gathered to one
# chip to be *measured* on the BP path; boundary-MPS measurement is in
# sharded_bmps.py)
# ---------------------------------------------------------------------------


def make_sharded_site_expectations(sspec: ShardedBPSpec, mesh: Mesh, op,
                                   axis: str = "v"):
    """Jitted ``state -> [V]`` of per-vertex ⟨op⟩ (`expect.jl:58-83`,
    single-site case) with tensors+messages staying sharded on
    ``mesh[axis]`` — the BP one-site RDM is vertex-local once messages
    are converged, so the computation is embarrassingly SPMD (no
    collectives at all)."""
    from .sharding import shard_map_novma as shard_map

    from .engine import local_expectations

    spec = sspec.spec
    op = np.asarray(op)

    def body(tensors, messages):
        st = BatchedState(tensors, messages)
        return local_expectations(spec, st, jnp.asarray(op))

    fn = shard_map(
        body, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P(axis)
    )

    @jax.jit
    def site_fn(state: BatchedState):
        return fn(state.tensors, state.messages)

    return site_fn


def _build_bond_tables(sspec: ShardedBPSpec):
    """Bucket ``spec.edges`` by (slot_u, slot_v[, halo direction]) with
    per-shard 0-padded gather tables (same table discipline as
    `build_layer_groups`) plus each lane's position in ``spec.edges`` so
    the caller can reassemble the canonical output order."""
    spec = sspec.spec
    S = sspec.num_shards
    Vl = spec.num_vertices // S
    intra: dict = {}
    cross: dict = {}
    for pos, (iu, iv, su, sv) in enumerate(spec.edges):
        s_u, s_v = iu // Vl, iv // Vl
        if s_u == s_v:
            intra.setdefault((su, sv), []).append(
                (s_u, iu % Vl, iv % Vl, pos))
        elif (s_u + 1) % S == s_v:
            cross.setdefault((su, sv, +1), []).append(
                (s_u, iu % Vl, iv % Vl, pos))
        elif (s_v + 1) % S == s_u:
            cross.setdefault((su, sv, -1), []).append(
                (s_u, iu % Vl, iv % Vl, pos))
        else:
            raise ValueError(
                "non-adjacent cross-shard edge: strip partition invalid "
                "for bond expectations"
            )

    def tables(entries, with_dir):
        per_shard: list = [[] for _ in range(S)]
        for e in entries:
            per_shard[e[0]].append(e[1:])
        B = max(1, max(len(l) for l in per_shard))
        u_tab = np.zeros((S, B), np.int32)
        v_tab = np.zeros((S, B), np.int32)
        valid = np.zeros((S, B), bool)
        pos_tab = np.full((S, B), -1, np.int64)
        v_pairs: list = [[] for _ in range(S)]
        for s, lst in enumerate(per_shard):
            for i, (lu, lv, pos) in enumerate(lst):
                u_tab[s, i], valid[s, i], pos_tab[s, i] = lu, True, pos
                if not with_dir:
                    v_tab[s, i] = lv
                    v_pairs[s].append((lv, i))
        if with_dir:
            # partner positions, laid out in the SENDER shard's row at the
            # computing shard's lane index (the ppermute then aligns them)
            for s, lst in enumerate(per_shard):
                sender = (s + with_dir) % S
                for i, (_, lv, _) in enumerate(lst):
                    v_tab[sender, i] = lv
                    v_pairs[sender].append((lv, i))
        u_inv, u_wr = _inverse_table(
            [[(lu, i) for i, (lu, _, _) in enumerate(lst)]
             for lst in per_shard], Vl)
        v_inv, v_wr = _inverse_table(v_pairs, Vl)
        return u_tab, v_tab, valid, pos_tab, u_inv, u_wr, v_inv, v_wr

    out = []
    for (su, sv), entries in sorted(intra.items()):
        out.append((su, sv, 0) + tables(entries, 0))
    for (su, sv, dir_), entries in sorted(cross.items()):
        out.append((su, sv, dir_) + tables(entries, dir_))
    return out


def make_sharded_bond_expectations(sspec: ShardedBPSpec, mesh: Mesh, op1,
                                   op2, axis: str = "v"):
    """Jitted ``state -> [E]`` of ⟨op1 ⊗ op2⟩ on every edge of
    ``spec.edges`` (order preserved), fully SPMD: each edge is evaluated
    on the shard owning its u vertex; for cross-shard edges the partner's
    open-bond site transfer E_v[b,l,l',s,s'] is built on the owner shard
    and moved with ONE `ppermute` per (slot-pair, direction) bucket —
    O(boundary) ICI traffic, no all-gathers.  Matches
    `engine.bond_expectations` (the BP Steiner contraction of
    `expect.jl:58-83` specialized to an edge) to float roundoff."""
    from .sharding import shard_map_novma as shard_map

    from .engine import _site_transfer

    spec = sspec.spec
    S = sspec.num_shards
    buckets = _build_bond_tables(sspec)
    o1 = np.asarray(op1)
    o2 = np.asarray(op2)

    # host-side map: edge position in spec.edges -> flat [S * B_total] lane
    offsets = []
    off = 0
    for b in buckets:
        offsets.append(off)
        off += b[3].shape[1]
    b_total = off
    order = np.zeros(len(spec.edges), np.int64)
    for b, boff in zip(buckets, offsets):
        pos_tab = b[6]
        for s in range(S):
            for i in range(pos_tab.shape[1]):
                if pos_tab[s, i] >= 0:
                    order[pos_tab[s, i]] = s * b_total + boff + i

    left = [(i, (i - 1) % S) for i in range(S)]
    right = [(i, (i + 1) % S) for i in range(S)]
    flat_tables = []
    for b in buckets:
        flat_tables += [np.asarray(b[3]), np.asarray(b[4]),
                        np.asarray(b[5])]
    flat_tables = tuple(flat_tables)

    def body(tensors, messages, *tables):
        st = BatchedState(tensors, messages)
        it = iter(tables)
        outs = []
        for (su, sv, dir_, *_unused) in buckets:
            u_tab, v_tab, valid = next(it)[0], next(it)[0], next(it)[0]
            eu = _site_transfer(st, u_tab, su)  # [B, l, l', s, s']
            ev = _site_transfer(st, v_tab, sv)
            if dir_ == +1:  # partner lives on the next shard
                ev = jax.lax.ppermute(ev, axis, perm=left)
            elif dir_ == -1:
                ev = jax.lax.ppermute(ev, axis, perm=right)
            numer = jnp.einsum(
                "bopsz,zs,bopcx,xc->b", eu, o1.astype(eu.dtype), ev,
                o2.astype(eu.dtype), precision=_PRECISION,
            )
            denom = jnp.einsum(
                "bopss,bopcc->b", eu, ev, precision=_PRECISION)
            outs.append(jnp.where(valid, numer / denom, 0.0))
        return jnp.concatenate(outs)  # [B_total] per shard

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis)) + (P(axis),) * len(flat_tables),
        out_specs=P(axis),
    )
    order_j = np.asarray(order)

    @jax.jit
    def bond_fn(state: BatchedState):
        flat = fn(state.tensors, state.messages, *flat_tables)
        return jnp.take(flat, order_j)

    return bond_fn


def make_sharded_site_rdms(sspec: ShardedBPSpec, mesh: Mesh,
                           axis: str = "v"):
    """Jitted ``state -> [V, d, d]`` of trace-normalized 1-site RDMs
    (`rdm.jl:49-70`, single-vertex Steiner tree) on the vertex-sharded
    state — vertex-local given converged messages, so zero collectives."""
    from .sharding import shard_map_novma as shard_map

    from .engine import local_rdms

    spec = sspec.spec

    def body(tensors, messages):
        rho = local_rdms(spec, BatchedState(tensors, messages))
        tr = jnp.einsum("vss->v", rho)
        return rho / tr[:, None, None]

    fn = shard_map(
        body, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P(axis)
    )

    @jax.jit
    def rdm_fn(state: BatchedState):
        return fn(state.tensors, state.messages)

    return rdm_fn


def make_sharded_bond_rdms(sspec: ShardedBPSpec, mesh: Mesh,
                           axis: str = "v"):
    """Jitted ``state -> [E, d, d, d, d]`` of trace-normalized 2-site RDMs
    (ket_u, bra_u, ket_v, bra_v) for every edge of ``spec.edges`` (order
    preserved) on the vertex-sharded state — the sharded counterpart of
    `engine.bond_rdms`, with the same one-`ppermute`-per-cross-bucket
    halo discipline as `make_sharded_bond_expectations`."""
    from .sharding import shard_map_novma as shard_map

    from .engine import _site_transfer

    spec = sspec.spec
    S = sspec.num_shards
    buckets = _build_bond_tables(sspec)

    offsets = []
    off = 0
    for b in buckets:
        offsets.append(off)
        off += b[3].shape[1]
    b_total = off
    order = np.zeros(len(spec.edges), np.int64)
    for b, boff in zip(buckets, offsets):
        pos_tab = b[6]
        for s in range(S):
            for i in range(pos_tab.shape[1]):
                if pos_tab[s, i] >= 0:
                    order[pos_tab[s, i]] = s * b_total + boff + i

    left = [(i, (i - 1) % S) for i in range(S)]
    right = [(i, (i + 1) % S) for i in range(S)]
    flat_tables = []
    for b in buckets:
        flat_tables += [np.asarray(b[3]), np.asarray(b[4]),
                        np.asarray(b[5])]
    flat_tables = tuple(flat_tables)

    def body(tensors, messages, *tables):
        st = BatchedState(tensors, messages)
        it = iter(tables)
        outs = []
        for (su, sv, dir_, *_unused) in buckets:
            u_tab, v_tab, valid = next(it)[0], next(it)[0], next(it)[0]
            eu = _site_transfer(st, u_tab, su)  # [B, l, l', s, s']
            ev = _site_transfer(st, v_tab, sv)
            if dir_ == +1:
                ev = jax.lax.ppermute(ev, axis, perm=left)
            elif dir_ == -1:
                ev = jax.lax.ppermute(ev, axis, perm=right)
            rho = jnp.einsum("bopsz,bopcx->bszcx", eu, ev,
                             precision=_PRECISION)
            tr = jnp.einsum("bsscc->b", rho)
            rho = rho / jnp.where(valid, tr, 1.0)[:, None, None, None, None]
            outs.append(jnp.where(
                valid[:, None, None, None, None], rho, 0.0))
        return jnp.concatenate(outs)  # [B_total, d, d, d, d] per shard

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis)) + (P(axis),) * len(flat_tables),
        out_specs=P(axis),
    )
    order_j = np.asarray(order)

    @jax.jit
    def rdm_fn(state: BatchedState):
        flat = fn(state.tensors, state.messages, *flat_tables)
        return jnp.take(flat, order_j, axis=0)

    return rdm_fn


def _absorb_rows(rows, slot, transforms):
    """rows[e] ← Σ_l T[..., l(slot), ...] A[l, l'] on gathered rows."""
    t2 = jnp.moveaxis(rows, 1 + slot, -1)
    t2 = jnp.einsum("e...l,elm->e...m", t2, transforms,
                    precision=_PRECISION)
    return jnp.moveaxis(t2, -1, 1 + slot)


def make_sharded_gauge(sspec: ShardedBPSpec, mesh: Mesh,
                       rel_cutoff: float | None = None, axis: str = "v"):
    """Jitted ``state -> (state, spectra[E, χ])``: Vidal/symmetric gauge
    (`symmetric_gauge.jl:85-114`) on the vertex-sharded state.

    Identical math to `gauge.batched_symmetric_gauge` — each directed
    (vertex, slot) pair belongs to exactly one edge, so per-bucket
    sequential processing reads/writes disjoint message slots and the
    result is bitwise the single-chip one.  Each edge is gauged on the
    shard owning its u vertex; cross-shard edges halo-in the partner's
    stored message (one `ppermute`) and halo-out the partner's bond
    transform + new diagonal message (one more).  Spectra come back in
    ``spec.edges`` order."""
    from .sharding import shard_map_novma as shard_map

    from .gauge import _edge_gauge_transforms

    spec = sspec.spec
    S = sspec.num_shards
    buckets = _build_bond_tables(sspec)

    offsets = []
    off = 0
    for b in buckets:
        offsets.append(off)
        off += b[3].shape[1]
    b_total = off
    order = np.zeros(len(spec.edges), np.int64)
    for b, boff in zip(buckets, offsets):
        pos_tab = b[6]
        for s in range(S):
            for i in range(pos_tab.shape[1]):
                if pos_tab[s, i] >= 0:
                    order[pos_tab[s, i]] = s * b_total + boff + i

    left = [(i, (i - 1) % S) for i in range(S)]
    right = [(i, (i + 1) % S) for i in range(S)]
    flat_tables = []
    for b in buckets:
        flat_tables += [np.asarray(t) for t in b[3:11]]
    flat_tables = tuple(flat_tables)

    def body(tensors, messages, *tables):
        rc = rel_cutoff
        if rc is None:
            rc = 1e3 * float(
                jnp.finfo(jnp.zeros((), tensors.dtype).real.dtype).eps
            )
        it = iter(tables)
        outs = []
        for (su, sv, dir_, *_unused) in buckets:
            u_tab, v_tab, valid = next(it)[0], next(it)[0], next(it)[0]
            _pos = next(it)
            u_inv, u_wr = next(it)[0], next(it)[0]
            v_inv, v_wr = next(it)[0], next(it)[0]
            Y = messages[u_tab, su]          # v→u message, stored at u
            Xs = messages[v_tab, sv]         # u→v message, stored at v
            if dir_ == +1:                   # v lives on the next shard
                X = jax.lax.ppermute(Xs, axis, perm=left)
            elif dir_ == -1:
                X = jax.lax.ppermute(Xs, axis, perm=right)
            else:
                X = Xs
            a_u, a_v, ss = _edge_gauge_transforms(X, Y, tensors.dtype, rc)
            s_diag = jax.vmap(jnp.diag)(ss.astype(messages.dtype))
            # u side (always local to the computing shard)
            tu = _absorb_rows(tensors[u_tab], su, a_u)
            tensors = _select_rows(tensors, tu, u_inv, u_wr)
            messages = messages.at[:, su].set(
                _select_rows(messages[:, su], s_diag, u_inv, u_wr))
            # v side
            if dir_ == 0:
                tv = _absorb_rows(tensors[v_tab], sv, a_v)
                tensors = _select_rows(tensors, tv, v_inv, v_wr)
                messages = messages.at[:, sv].set(
                    _select_rows(messages[:, sv], s_diag, v_inv, v_wr))
            else:
                payload = jnp.stack(
                    [a_v, s_diag.astype(a_v.dtype)], axis=1)  # [B,2,χ,χ]
                back = right if dir_ == +1 else left
                payload = jax.lax.ppermute(payload, axis, perm=back)
                a_v_r = payload[:, 0]
                s_diag_r = payload[:, 1].astype(messages.dtype)
                tv = _absorb_rows(tensors[v_tab], sv, a_v_r)
                tensors = _select_rows(tensors, tv, v_inv, v_wr)
                messages = messages.at[:, sv].set(
                    _select_rows(messages[:, sv], s_diag_r, v_inv, v_wr))
            outs.append(jnp.where(valid[:, None], ss, 0.0))
        return tensors, messages, jnp.concatenate(outs)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis)) + (P(axis),) * len(flat_tables),
        out_specs=(P(axis), P(axis), P(axis)),
    )
    order_j = np.asarray(order)

    @jax.jit
    def gauge_fn(state: BatchedState):
        t, m, flat = fn(state.tensors, state.messages, *flat_tables)
        return BatchedState(t, m), jnp.take(flat, order_j, axis=0)

    return gauge_fn


def make_sharded_truncate(
    sspec: ShardedBPSpec,
    mesh: Mesh,
    chi: int,
    cutoff: float = 0.0,
    bp_maxiter: int = 30,
    bp_tolerance: float | None = None,
    normalize_tensors: bool = True,
    axis: str = "v",
    site_dim: int = 2,
):
    """Sharded bond truncation (`truncate.jl:12-38`, BP flavor): identity
    two-site gates on every edge, color group by color group with halo-BP
    refreshes — exactly `truncate.batched_truncate` but as one SPMD
    shard_map program (it IS `make_sharded_layer` with the identity
    gate)."""
    d = site_dim
    gate = np.eye(d * d).reshape(d, d, d, d)
    return make_sharded_layer(
        sspec, mesh, gate, None, chi, cutoff=cutoff,
        normalize_tensors=normalize_tensors, bp_maxiter=bp_maxiter,
        bp_tolerance=bp_tolerance, axis=axis, initial_update=True,
    )
