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
- ragged per-shard edge counts pad with a local vertex index that is NOT
  touched by the bucket (one always exists when padding is needed), so
  masked ``.set`` scatters write back either the exact new value or the
  exact old value — the sharded layer is bitwise-faithful to the unsharded
  one (important: simple-update SVDs with degenerate spectra turn any
  rounding difference into a bond-gauge jump);
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
    u_tab: np.ndarray  # [S, B] local u positions (0-padded)
    v_tab: np.ndarray  # [S, B]
    valid: np.ndarray  # [S, B]


@dataclasses.dataclass(frozen=True)
class _CrossBucket:
    slot_u: int  # slot on the computing-side (u) vertex
    slot_v: int  # slot on the partner (v) vertex
    dir: int  # +1: v lives in the next shard; -1: v lives in the prev shard
    u_tab: np.ndarray  # [S, B] computing shard's local u positions
    vsend_tab: np.ndarray  # [S, B] partner positions each shard sends out
    valid: np.ndarray  # [S, B] valid on the computing shard
    valid_send: np.ndarray  # [S, B] valid on the sending (partner) shard


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
        def pad_index(used: set) -> int:
            # a local vertex whose row no scatter of this bucket modifies:
            # its padded entries write back their own unmodified value, so
            # every .set is exact (old value or new value, never re-rounded)
            p = 0
            while p in used:
                p += 1
            if p >= Vl:
                raise AssertionError("no free pad index (bucket covers shard)")
            return p

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
                if len(lst) < B:
                    pu = pad_index(
                        {lu for lu, _ in lst} | {lv for _, lv in lst}
                    )
                    u_tab[s, :] = pu
                    v_tab[s, :] = pu
                for i, (lu, lv) in enumerate(lst):
                    u_tab[s, i], v_tab[s, i], valid[s, i] = lu, lv, True
            buckets.append(_IntraBucket(su, sv, u_tab, v_tab, valid))
        for (su, sv, dir_), entries in sorted(cross.items()):
            per_shard: list = [[] for _ in range(S)]
            for (s, lu, lv) in entries:
                per_shard[s].append((lu, lv))
            B = max(1, max(len(l) for l in per_shard))
            u_tab = np.zeros((S, B), np.int32)
            vsend = np.zeros((S, B), np.int32)
            valid = np.zeros((S, B), bool)
            valid_send = np.zeros((S, B), bool)
            for s, lst in enumerate(per_shard):
                if len(lst) < B:
                    u_tab[s, :] = pad_index({lu for lu, _ in lst})
                for i, (lu, lv) in enumerate(lst):
                    u_tab[s, i], valid[s, i] = lu, True
            for s in range(S):
                sender = (s + dir_) % S
                lst = per_shard[s]  # edges computed by s; their v's live on sender
                if len(lst) < B:
                    # the pad row must also dodge the sender's OWN u-side
                    # updates in this bucket, or the late v-scatter would
                    # overwrite them with a stale gather
                    used = {lv for _, lv in lst} | {
                        lu for lu, _ in per_shard[sender]
                    }
                    vsend[sender, :] = pad_index(used)
                for i, (_, lv) in enumerate(lst):
                    vsend[sender, i] = lv
                    valid_send[sender, i] = True
            buckets.append(
                _CrossBucket(su, sv, dir_, u_tab, vsend, valid, valid_send)
            )
        groups.append(tuple(buckets))
    return tuple(groups)


def _masked_pick(valid, new, old):
    """new where valid else old — exact values, no re-rounding."""
    m = valid.reshape(valid.shape + (1,) * (new.ndim - 1))
    return jnp.where(m, new.astype(old.dtype), old)


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
):
    """Build the jitted fully-SPMD Trotter layer
    ``state -> (state, truncation_errors)``.

    Matches the unsharded `make_layer_fn` semantics for the uniform
    kicked-Ising layer (1-site gate on every vertex + 2-site gate on every
    edge, color group by color group with BP refreshes in between).  State
    arrays must be sharded on the vertex axis over ``mesh[axis]``."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

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
    flat_tables: list = [jnp.asarray(t) for t in bp_tables]
    for group in groups:
        for b in group:
            if isinstance(b, _IntraBucket):
                flat_tables += [jnp.asarray(b.u_tab), jnp.asarray(b.v_tab),
                                jnp.asarray(b.valid)]
            else:
                flat_tables += [jnp.asarray(b.u_tab), jnp.asarray(b.vsend_tab),
                                jnp.asarray(b.valid), jnp.asarray(b.valid_send)]
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
        applied = False
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
                    tu, tv = tensors[u_tab], tensors[v_tab]
                    mu, mv = messages[u_tab], messages[v_tab]
                    tu_new, tv_new, msg, err = _simple_update_core(
                        tu, tv, mu, mv, jnp.asarray(gate2), b.slot_u,
                        b.slot_v, chi, cutoff, normalize_tensors,
                    )
                    tensors = tensors.at[u_tab].set(
                        _masked_pick(valid, tu_new, tu)
                    )
                    tensors = tensors.at[v_tab].set(
                        _masked_pick(valid, tv_new, tv)
                    )
                    messages = messages.at[u_tab, b.slot_u].set(
                        _masked_pick(valid, msg, mu[:, b.slot_u])
                    )
                    messages = messages.at[v_tab, b.slot_v].set(
                        _masked_pick(valid, msg, mv[:, b.slot_v])
                    )
                    errs.append(jnp.where(valid, err, 0.0))
                else:
                    u_tab, vs_tab, valid, valid_send = (
                        next(it)[0], next(it)[0], next(it)[0], next(it)[0]
                    )
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
                    tensors = tensors.at[u_tab].set(
                        _masked_pick(valid, tu_new, tu)
                    )
                    messages = messages.at[u_tab, b.slot_u].set(
                        _masked_pick(valid, msg, mu[:, b.slot_u])
                    )
                    # send the partner-side update back to its owner (pad
                    # rows carry the owner's own pre-bucket value, exactly)
                    tv_back = jax.lax.ppermute(
                        _masked_pick(valid, tv_new, tv), axis, ret
                    )
                    mv_back = jax.lax.ppermute(
                        _masked_pick(valid, msg, mv[:, b.slot_v]), axis, ret
                    )
                    tensors = tensors.at[vs_tab].set(tv_back)
                    messages = messages.at[vs_tab, b.slot_v].set(mv_back)
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
