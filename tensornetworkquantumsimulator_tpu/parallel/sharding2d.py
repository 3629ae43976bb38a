"""2-D block-sharded SPMD: BP + full Trotter layer over a (Sx, Sy) mesh.

The 1-D strip layer (`sharding.py`, `sharded_layer.py`) scales until a
strip no longer fits one chip's HBM or the boundary/compute ratio stalls;
pod-scale lattices want 2-D blocks with halo exchange along BOTH mesh axes
(the scaling-book recipe: collectives ride the ICI torus).  Vertices sort
into (block_x, block_y) tiles of equal size; every cross-shard edge joins
axis-adjacent blocks, so

- flooding BP exchanges 4 halo message packets per iteration
  (``ppermute`` along "x" for row-neighbors, along "y" for column
  neighbors — inside a 2-D ``shard_map`` each acts per-ring);
- the Trotter layer's cross-shard gate buckets carry an (axis, dir) tag
  and halo-exchange partner rows along that axis, with the same
  exact-scatter padding as the 1-D layer (bitwise-faithful results).
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
from .sharded_layer import _inverse_table, _select_rows
from .sharding import _local_outgoing
from .structure import BatchedGraphSpec, compile_graph

_DIRS = ("xprev", "xnext", "yprev", "ynext")
_REVERSE_DIR = {"xprev": "xnext", "xnext": "xprev",
                "yprev": "ynext", "ynext": "yprev"}


@dataclasses.dataclass(frozen=True)
class Sharded2DSpec:
    """Static tables for halo-exchange over an Sx × Sy block mesh."""

    spec: BatchedGraphSpec  # block-contiguous vertex order
    sx: int
    sy: int
    halo: int  # H = padded halo size (shared by the 4 directions)
    send_v: dict  # dir -> [S, H] local vertex positions to send
    send_slot: dict  # dir -> [S, H]
    src_index: np.ndarray  # [S, Vl, D] into concat(local, recv per _DIRS)
    mask: np.ndarray  # [S, Vl, D]

    @property
    def num_shards(self) -> int:
        return self.sx * self.sy


def shard2d_spec(g, sx: int, sy: int) -> Sharded2DSpec:
    """Compile a coordinate lattice into equal (sx × sy) blocks.

    Blocks slab the sorted unique first coordinates into sx groups and the
    second into sy groups; requires equal block populations and cross-block
    edges only between axis-adjacent blocks (grids/tori qualify)."""
    xs = sorted({float(v[0]) for v in g.vertices()})
    ys = sorted({float(v[1]) for v in g.vertices()})
    if len(xs) % sx or len(ys) % sy:
        raise ValueError("coordinate counts must divide the mesh shape")
    bx = {x: i * sx // len(xs) for i, x in enumerate(xs)}
    by = {y: j * sy // len(ys) for j, y in enumerate(ys)}

    def block(v):
        return (bx[float(v[0])], by[float(v[1])])

    vertices = sorted(g.vertices(), key=lambda v: (block(v), v))
    V = len(vertices)
    S = sx * sy
    if V % S:
        raise ValueError(f"{V} vertices not divisible by {S} blocks")
    Vl = V // S
    reordered = type(g)(vertices)
    for e in g.edges():
        reordered.add_edge_inplace(e)
    spec = compile_graph(reordered)
    assert list(spec.vertices) == vertices
    counts: dict = {}
    for v in vertices:
        counts[block(v)] = counts.get(block(v), 0) + 1
    if len(set(counts.values())) != 1:
        raise ValueError("blocks are not equally populated")

    def shard_of(pos):
        b = block(vertices[pos])
        return b[0] * sy + b[1]

    nbr = spec.nbr_array()
    nbr_slot = spec.nbr_slot_array()
    mask = spec.mask_array()
    D = spec.degree

    send: dict = {d: [[] for _ in range(S)] for d in _DIRS}
    src: list = [[[None] * D for _ in range(Vl)] for _ in range(S)]

    def delta_dir(b_from, b_to):
        """Direction tag for a message traveling b_from -> b_to.

        When an axis has only 2 blocks, prev == next, so interior and
        wrap edges merge under one tag (dx==1==sx-1 hits the first
        branch).  Delivery stays correct (same neighbor) and the
        inverse-select write-back tolerates the wider merged buckets."""
        dx = (b_from[0] - b_to[0]) % sx
        dy = (b_from[1] - b_to[1]) % sy
        if (dx, dy) == (0, 0):
            return None
        if dy == 0 and dx == sx - 1:
            return "xprev"  # sender is the previous x-block
        if dy == 0 and dx == 1:
            return "xnext"
        if dx == 0 and dy == sy - 1:
            return "yprev"
        if dx == 0 and dy == 1:
            return "ynext"
        raise ValueError("cross-shard edge between non-adjacent blocks")

    for v in range(V):
        s, lv = shard_of(v), v % Vl
        for k in range(D):
            if not mask[v, k]:
                src[s][lv][k] = ("local", 0)
                continue
            sender = int(nbr[v, k])
            j = int(nbr_slot[v, k])
            d = delta_dir(block(vertices[sender]), block(vertices[v]))
            if d is None:
                src[s][lv][k] = ("local", (sender % Vl) * D + j)
            else:
                lst = send[d][shard_of(sender)]
                entry = (sender % Vl, j)
                if entry not in lst:
                    lst.append(entry)
                src[s][lv][k] = (d, lst.index(entry))

    H = max([1] + [len(l) for d in _DIRS for l in send[d]])

    def pad(lists, field):
        out = np.zeros((S, H), np.int32)
        for s, lst in enumerate(lists):
            for i, e in enumerate(lst):
                out[s, i] = e[field]
        return out

    base = {"local": 0}
    for i, d in enumerate(_DIRS):
        base[d] = Vl * D + i * H
    src_index = np.zeros((S, Vl, D), np.int32)
    for s in range(S):
        for lv in range(Vl):
            for k in range(D):
                kind, p = src[s][lv][k]
                src_index[s, lv, k] = base[kind] + p

    return Sharded2DSpec(
        spec=spec,
        sx=sx,
        sy=sy,
        halo=H,
        send_v={d: pad(send[d], 0) for d in _DIRS},
        send_slot={d: pad(send[d], 1) for d in _DIRS},
        src_index=src_index,
        mask=spec.mask_array().reshape(S, Vl, D),
    )


def _perms(sx: int, sy: int):
    """ppermute pairs: receiving FROM the prev/next block along each axis."""
    return {
        # "recv from xprev" = every x-ring member sends to the next one
        "xprev": ("x", [(i, (i + 1) % sx) for i in range(sx)]),
        "xnext": ("x", [(i, (i - 1) % sx) for i in range(sx)]),
        "yprev": ("y", [(i, (i + 1) % sy) for i in range(sy)]),
        "ynext": ("y", [(i, (i - 1) % sy) for i in range(sy)]),
    }


def _bp2d_fixed_point(
    tensors, messages, tabs, D, sx, sy, maxiter, tolerance
):
    """Per-shard flooding BP with 4-direction halo exchange."""
    Vl = tensors.shape[0]
    chi = tensors.shape[1]
    rdt = jnp.zeros((), tensors.dtype).real.dtype
    perms = _perms(sx, sy)
    mask = tabs["mask"]

    def one_iteration(m):
        m_out = _local_outgoing(tensors, m, D)
        recvs = []
        for d in _DIRS:
            payload = m_out[tabs["sv_" + d], tabs["ss_" + d]]
            ax, perm = perms[d]
            recvs.append(jax.lax.ppermute(payload, ax, perm))
        table = jnp.concatenate(
            [m_out.reshape(Vl * D, chi, chi)] + recvs, axis=0
        )
        new = table[tabs["src"]]
        new = 0.5 * (new + jnp.conj(jnp.swapaxes(new, -1, -2)))
        ssum = jnp.sum(new, axis=(-2, -1), keepdims=True)
        new = new / jnp.where(jnp.abs(ssum) == 0, 1.0, ssum)
        eye = jnp.eye(chi, dtype=new.dtype)
        return jnp.where(mask[..., None, None], new, eye)

    def distance(a, b):
        dot = jnp.sum(jnp.conj(a) * b, axis=(-2, -1))
        na = jnp.linalg.norm(a.reshape(a.shape[:-2] + (-1,)), axis=-1)
        nb = jnp.linalg.norm(b.reshape(b.shape[:-2] + (-1,)), axis=-1)
        den = jnp.where(na * nb == 0, 1.0, na * nb)
        d = jnp.where(mask, 1.0 - jnp.abs(dot / den) ** 2, 0.0)
        num = jax.lax.psum(jax.lax.psum(jnp.sum(d), "x"), "y")
        cnt = jax.lax.psum(jax.lax.psum(jnp.sum(mask), "x"), "y")
        return num / jnp.maximum(cnt, 1)

    def cond(c):
        _, it, diff = c
        return jnp.logical_and(it < maxiter, diff > tolerance)

    def loop(c):
        m, it, _ = c
        new = one_iteration(m)
        return (new, it + 1, distance(m, new).astype(rdt))

    m, _, _ = jax.lax.while_loop(
        cond, loop, (messages, jnp.int32(0), jnp.asarray(jnp.inf, rdt))
    )
    return m


@dataclasses.dataclass(frozen=True)
class _Intra2D:
    slot_u: int
    slot_v: int
    u_tab: np.ndarray
    v_tab: np.ndarray
    valid: np.ndarray
    u_inv: np.ndarray  # [S, Vl] write-back lane per local vertex
    u_wr: np.ndarray  # [S, Vl]
    v_inv: np.ndarray
    v_wr: np.ndarray


@dataclasses.dataclass(frozen=True)
class _Cross2D:
    slot_u: int
    slot_v: int
    dir: str  # _DIRS entry: where the PARTNER (v) lives
    u_tab: np.ndarray
    vsend_tab: np.ndarray
    valid: np.ndarray
    u_inv: np.ndarray
    u_wr: np.ndarray
    vs_inv: np.ndarray
    vs_wr: np.ndarray


def build_layer_groups_2d(sspec: Sharded2DSpec):
    """Intra/cross bucket tables per color group for the 2-D block mesh."""
    spec = sspec.spec
    sx, sy = sspec.sx, sspec.sy
    S = sx * sy
    Vl = spec.num_vertices // S

    def shard_xy(s):
        return (s // sy, s % sy)

    def neighbor(s, d):
        x, y = shard_xy(s)
        if d == "xnext":
            return ((x + 1) % sx) * sy + y
        if d == "xprev":
            return ((x - 1) % sx) * sy + y
        if d == "ynext":
            return x * sy + (y + 1) % sy
        return x * sy + (y - 1) % sy

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
                    continue
                d = next(
                    (d for d in _DIRS if neighbor(su_s, d) == sv_s), None
                )
                if d is None:
                    raise ValueError("non-adjacent cross-block edge")
                cross.setdefault((b.slot_u, b.slot_v, d), []).append(
                    (su_s, iu % Vl, iv % Vl)
                )

        buckets = []
        for (su, sv), entries in sorted(intra.items()):
            per = [[] for _ in range(S)]
            for (s, lu, lv) in entries:
                per[s].append((lu, lv))
            B = max(1, max(len(l) for l in per))
            u_tab = np.zeros((S, B), np.int32)
            v_tab = np.zeros((S, B), np.int32)
            valid = np.zeros((S, B), bool)
            for s, lst in enumerate(per):
                for i, (lu, lv) in enumerate(lst):
                    u_tab[s, i], v_tab[s, i], valid[s, i] = lu, lv, True
            u_inv, u_wr = _inverse_table(
                [[(lu, i) for i, (lu, _) in enumerate(lst)] for lst in per],
                Vl)
            v_inv, v_wr = _inverse_table(
                [[(lv, i) for i, (_, lv) in enumerate(lst)] for lst in per],
                Vl)
            buckets.append(_Intra2D(
                su, sv, u_tab, v_tab, valid, u_inv, u_wr, v_inv, v_wr))
        for (su, sv, d), entries in sorted(cross.items()):
            per = [[] for _ in range(S)]
            for (s, lu, lv) in entries:
                per[s].append((lu, lv))
            B = max(1, max(len(l) for l in per))
            u_tab = np.zeros((S, B), np.int32)
            vsend = np.zeros((S, B), np.int32)
            valid = np.zeros((S, B), bool)
            for s, lst in enumerate(per):
                for i, (lu, lv) in enumerate(lst):
                    u_tab[s, i], valid[s, i] = lu, True
            vs_pairs: list = [[] for _ in range(S)]
            for s in range(S):
                sender = neighbor(s, d)
                for i, (_, lv) in enumerate(per[s]):
                    vsend[sender, i] = lv
                    vs_pairs[sender].append((lv, i))
            u_inv, u_wr = _inverse_table(
                [[(lu, i) for i, (lu, _) in enumerate(lst)] for lst in per],
                Vl)
            vs_inv, vs_wr = _inverse_table(vs_pairs, Vl)
            buckets.append(_Cross2D(
                su, sv, d, u_tab, vsend, valid, u_inv, u_wr, vs_inv, vs_wr))
        groups.append(tuple(buckets))
    return tuple(groups)


def make_sharded_layer_2d(
    sspec: Sharded2DSpec,
    mesh: Mesh,
    gate2: np.ndarray,
    gate1: np.ndarray | None,
    chi: int,
    cutoff: float = 1e-12,
    normalize_tensors: bool = True,
    bp_maxiter: int = 30,
    bp_tolerance: float | None = None,
    one_site_first: bool = True,
    final_update: bool = True,
):
    """Fully-SPMD Trotter layer over a 2-D ("x", "y") mesh; same semantics
    and bitwise-faithfulness contract as the 1-D `make_sharded_layer`."""
    from .sharding import shard_map_novma as shard_map

    spec = sspec.spec
    D = spec.degree
    sx, sy = sspec.sx, sspec.sy
    groups = build_layer_groups_2d(sspec)
    gate2 = np.asarray(gate2)
    perms = _perms(sx, sy)

    flat: list = [np.asarray(sspec.src_index), np.asarray(sspec.mask)]
    for d in _DIRS:
        flat += [np.asarray(sspec.send_v[d]), np.asarray(sspec.send_slot[d])]
    for group in groups:
        for b in group:
            if isinstance(b, _Intra2D):
                flat += [np.asarray(b.u_tab), np.asarray(b.v_tab),
                         np.asarray(b.valid),
                         np.asarray(b.u_inv), np.asarray(b.u_wr),
                         np.asarray(b.v_inv), np.asarray(b.v_wr)]
            else:
                flat += [np.asarray(b.u_tab), np.asarray(b.vsend_tab),
                         np.asarray(b.valid),
                         np.asarray(b.u_inv), np.asarray(b.u_wr),
                         np.asarray(b.vs_inv), np.asarray(b.vs_wr)]
    flat = tuple(flat)

    def body(tensors, messages, *tables):
        it = iter(tables)
        tabs = {"src": next(it)[0], "mask": next(it)[0]}
        for d in _DIRS:
            tabs["sv_" + d] = next(it)[0]
            tabs["ss_" + d] = next(it)[0]
        tol = (
            bp_tolerance
            if bp_tolerance is not None
            else default_batched_tolerance(tensors.dtype)
        )

        def bp(tensors, messages):
            return _bp2d_fixed_point(
                tensors, messages, tabs, D, sx, sy, bp_maxiter, tol
            )

        errs = []
        applied = False
        if gate1 is not None and one_site_first:
            g = jnp.asarray(gate1).astype(tensors.dtype)
            tensors = jnp.einsum(
                "v...d,pd->v...p", tensors, g, precision=_PRECISION
            )
            applied = True
        for group in groups:
            if applied:
                messages = bp(tensors, messages)
            for b in group:
                if isinstance(b, _Intra2D):
                    u_tab, v_tab, valid = next(it)[0], next(it)[0], next(it)[0]
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
                    u_tab, vs_tab, valid = next(it)[0], next(it)[0], next(it)[0]
                    u_inv, u_wr = next(it)[0], next(it)[0]
                    vs_inv, vs_wr = next(it)[0], next(it)[0]
                    ax, gather = perms[b.dir]
                    rev = _REVERSE_DIR[b.dir]
                    _, ret = perms[rev]
                    tv = jax.lax.ppermute(tensors[vs_tab], ax, gather)
                    mv = jax.lax.ppermute(messages[vs_tab], ax, gather)
                    tu, mu = tensors[u_tab], messages[u_tab]
                    tu_new, tv_new, msg, err = _simple_update_core(
                        tu, tv, mu, mv, jnp.asarray(gate2), b.slot_u,
                        b.slot_v, chi, cutoff, normalize_tensors,
                    )
                    tensors = _select_rows(tensors, tu_new, u_inv, u_wr)
                    messages = messages.at[:, b.slot_u].set(_select_rows(
                        messages[:, b.slot_u], msg, u_inv, u_wr))
                    tv_back = jax.lax.ppermute(tv_new, ax, ret)
                    mv_back = jax.lax.ppermute(msg, ax, ret)
                    tensors = _select_rows(tensors, tv_back, vs_inv, vs_wr)
                    messages = messages.at[:, b.slot_v].set(_select_rows(
                        messages[:, b.slot_v], mv_back, vs_inv, vs_wr))
                    errs.append(jnp.where(valid, err, 0.0))
            applied = True
        if gate1 is not None and not one_site_first:
            g = jnp.asarray(gate1).astype(tensors.dtype)
            tensors = jnp.einsum(
                "v...d,pd->v...p", tensors, g, precision=_PRECISION
            )
        if final_update:
            messages = bp(tensors, messages)
        all_errs = (
            jnp.concatenate(errs) if errs else jnp.zeros((1,), jnp.float32)
        )
        return tensors, messages, all_errs

    spec_v = P(("x", "y"))
    n_in = 2 + len(flat)
    fn = shard_map(
        body, mesh=mesh, in_specs=(spec_v,) * n_in,
        out_specs=(spec_v, spec_v, spec_v),
    )

    @jax.jit
    def layer(state: BatchedState):
        t, m, errs = fn(state.tensors, state.messages, *flat)
        return BatchedState(t, m), errs

    return layer


# ---------------------------------------------------------------------------
# 2-D sharded measurement + gauge (VERDICT r3 item 7: the block mesh must
# cover more than the Trotter layer)
# ---------------------------------------------------------------------------

def _shard_map():
    from .sharding import shard_map_novma

    return shard_map_novma


def make_sharded_site_expectations_2d(sspec: Sharded2DSpec, mesh: Mesh):
    """Jitted ``state -> [V]`` of per-vertex ⟨op⟩-style one-site RDMs'
    expectations on the (Sx, Sy) block mesh — vertex-local once messages
    are converged, so zero collectives (the 2-D twin of
    `sharded_layer.make_sharded_site_expectations`); the op is passed at
    call time."""
    from .engine import local_expectations

    spec = sspec.spec

    def body(tensors, messages, op):
        st = BatchedState(tensors, messages)
        return local_expectations(spec, st, op)

    fn = _shard_map()(
        body, mesh=mesh,
        in_specs=(P(("x", "y")), P(("x", "y")), P()),
        out_specs=P(("x", "y")),
    )

    @jax.jit
    def site_fn(state: BatchedState, op):
        return fn(state.tensors, state.messages, jnp.asarray(op))

    return site_fn


def _build_bond_tables_2d(sspec: Sharded2DSpec):
    """Bucket ``spec.edges`` by (slot_u, slot_v, direction-of-partner)
    with per-shard 0-padded gather tables — the 2-D twin of
    `sharded_layer._build_bond_tables`; direction is one of `_DIRS` (or
    None for intra-block), naming which axis neighbor owns the partner
    vertex."""
    from .sharded_layer import _inverse_table

    spec = sspec.spec
    S, sx, sy = sspec.num_shards, sspec.sx, sspec.sy
    Vl = spec.num_vertices // S

    def xy(s):
        return divmod(s, sy)

    def sid(x, y):
        return (x % sx) * sy + (y % sy)

    def neighbor(s, d):
        x, y = xy(s)
        return {
            "xprev": sid(x - 1, y), "xnext": sid(x + 1, y),
            "yprev": sid(x, y - 1), "ynext": sid(x, y + 1),
        }[d]

    grouped: dict = {}
    for pos, (iu, iv, su, sv) in enumerate(spec.edges):
        s_u, s_v = iu // Vl, iv // Vl
        if s_u == s_v:
            d = None
        else:
            bu, bv = xy(s_u), xy(s_v)
            dx = (bv[0] - bu[0]) % sx
            dy = (bv[1] - bu[1]) % sy
            if dy == 0 and dx == sx - 1:
                d = "xprev"  # partner lives in the previous x-block
            elif dy == 0 and dx == 1:
                d = "xnext"
            elif dx == 0 and dy == sy - 1:
                d = "yprev"
            elif dx == 0 and dy == 1:
                d = "ynext"
            else:
                raise ValueError(
                    "cross-shard edge between non-adjacent blocks"
                )
        grouped.setdefault((su, sv, d), []).append(
            (s_u, iu % Vl, iv % Vl, pos)
        )

    out = []
    for (su, sv, d), entries in sorted(
        grouped.items(), key=lambda kv: (kv[0][0], kv[0][1], str(kv[0][2]))
    ):
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
                if d is None:
                    v_tab[s, i] = lv
                    v_pairs[s].append((lv, i))
        if d is not None:
            # partner rows laid out in the SENDER shard's row at the
            # computing shard's lane index; ppermute(d) aligns them
            for s, lst in enumerate(per_shard):
                sender = neighbor(s, d)
                for i, (_, lv, _) in enumerate(lst):
                    v_tab[sender, i] = lv
                    v_pairs[sender].append((lv, i))
        u_inv, u_wr = _inverse_table(
            [[(lu, i) for i, (lu, _, _) in enumerate(lst)]
             for lst in per_shard], Vl)
        v_inv, v_wr = _inverse_table(v_pairs, Vl)
        out.append((su, sv, d, u_tab, v_tab, valid, pos_tab,
                    u_inv, u_wr, v_inv, v_wr))
    return out


def _edge_order_table(buckets, n_edges, S):
    offsets = []
    off = 0
    for b in buckets:
        offsets.append(off)
        off += b[6].shape[1]
    b_total = off
    order = np.zeros(n_edges, np.int64)
    for b, boff in zip(buckets, offsets):
        pos_tab = b[6]
        for s in range(S):
            for i in range(pos_tab.shape[1]):
                if pos_tab[s, i] >= 0:
                    order[pos_tab[s, i]] = s * b_total + boff + i
    return order


def make_sharded_bond_expectations_2d(sspec: Sharded2DSpec, mesh: Mesh,
                                      op1, op2):
    """Jitted ``state -> [E]`` of ⟨op1 ⊗ op2⟩ on every edge (order of
    ``spec.edges``) over the (Sx, Sy) block mesh: each edge evaluates on
    the block owning u; partners halo in with ONE `ppermute` along the
    right mesh axis per (slot-pair, direction) bucket.  The 2-D twin of
    `sharded_layer.make_sharded_bond_expectations`."""
    from .engine import _site_transfer

    spec = sspec.spec
    S = sspec.num_shards
    buckets = _build_bond_tables_2d(sspec)
    o1 = np.asarray(op1)
    o2 = np.asarray(op2)
    order = _edge_order_table(buckets, len(spec.edges), S)
    perms = _perms(sspec.sx, sspec.sy)

    flat_tables = tuple(
        np.asarray(t) for b in buckets for t in (b[3], b[4], b[5])
    )

    def body(tensors, messages, *tables):
        st = BatchedState(tensors, messages)
        it = iter(tables)
        outs = []
        for (su, sv, d, *_unused) in buckets:
            u_tab, v_tab, valid = next(it)[0], next(it)[0], next(it)[0]
            eu = _site_transfer(st, u_tab, su)
            ev = _site_transfer(st, v_tab, sv)
            if d is not None:
                ax, perm = perms[d]
                ev = jax.lax.ppermute(ev, ax, perm)
            numer = jnp.einsum(
                "bopsz,zs,bopcx,xc->b", eu, o1.astype(eu.dtype), ev,
                o2.astype(eu.dtype), precision=_PRECISION,
            )
            denom = jnp.einsum(
                "bopss,bopcc->b", eu, ev, precision=_PRECISION)
            outs.append(jnp.where(valid, numer / denom, 0.0))
        return jnp.concatenate(outs)

    fn = _shard_map()(
        body, mesh=mesh,
        in_specs=(P(("x", "y")), P(("x", "y")))
        + (P(("x", "y")),) * len(flat_tables),
        out_specs=P(("x", "y")),
    )
    order_j = np.asarray(order)

    @jax.jit
    def bond_fn(state: BatchedState):
        flat = fn(state.tensors, state.messages, *flat_tables)
        return jnp.take(flat, order_j)

    return bond_fn


def make_sharded_gauge_2d(sspec: Sharded2DSpec, mesh: Mesh,
                          rel_cutoff: float | None = None):
    """Jitted ``state -> (state, spectra[E, χ])``: Vidal/symmetric gauge
    (`symmetric_gauge.jl:85-114`) on the 2-D block-sharded state — the
    block-mesh twin of `sharded_layer.make_sharded_gauge`: each edge is
    gauged on the block owning u; cross-block edges halo-in the partner's
    stored message and halo-out the partner's transform + new diagonal
    message along the right mesh axis."""
    from .gauge import _edge_gauge_transforms
    from .sharded_layer import _absorb_rows

    spec = sspec.spec
    S = sspec.num_shards
    buckets = _build_bond_tables_2d(sspec)
    order = _edge_order_table(buckets, len(spec.edges), S)
    perms = _perms(sspec.sx, sspec.sy)

    flat_tables = tuple(
        np.asarray(t) for b in buckets for t in b[3:11]
    )

    def body(tensors, messages, *tables):
        rc = rel_cutoff
        if rc is None:
            rc = 1e3 * float(
                jnp.finfo(jnp.zeros((), tensors.dtype).real.dtype).eps
            )
        it = iter(tables)
        outs = []
        for (su, sv, d, *_unused) in buckets:
            u_tab, v_tab, valid = next(it)[0], next(it)[0], next(it)[0]
            _pos = next(it)
            u_inv, u_wr = next(it)[0], next(it)[0]
            v_inv, v_wr = next(it)[0], next(it)[0]
            Y = messages[u_tab, su]          # v→u message, stored at u
            Xs = messages[v_tab, sv]         # u→v message, stored at v
            if d is not None:
                ax, perm = perms[d]
                X = jax.lax.ppermute(Xs, ax, perm)
            else:
                X = Xs
            a_u, a_v, ss = _edge_gauge_transforms(X, Y, tensors.dtype, rc)
            s_diag = jax.vmap(jnp.diag)(ss.astype(messages.dtype))
            tu = _absorb_rows(tensors[u_tab], su, a_u)
            tensors = _select_rows(tensors, tu, u_inv, u_wr)
            messages = messages.at[:, su].set(
                _select_rows(messages[:, su], s_diag, u_inv, u_wr))
            if d is None:
                tv = _absorb_rows(tensors[v_tab], sv, a_v)
                tensors = _select_rows(tensors, tv, v_inv, v_wr)
                messages = messages.at[:, sv].set(
                    _select_rows(messages[:, sv], s_diag, v_inv, v_wr))
            else:
                payload = jnp.stack(
                    [a_v, s_diag.astype(a_v.dtype)], axis=1)  # [B,2,χ,χ]
                rax, rperm = perms[_REVERSE_DIR[d]]
                payload = jax.lax.ppermute(payload, rax, rperm)
                a_v_r = payload[:, 0]
                s_diag_r = payload[:, 1].astype(messages.dtype)
                tv = _absorb_rows(tensors[v_tab], sv, a_v_r)
                tensors = _select_rows(tensors, tv, v_inv, v_wr)
                messages = messages.at[:, sv].set(
                    _select_rows(messages[:, sv], s_diag_r, v_inv, v_wr))
            outs.append(jnp.where(valid[:, None], ss, 0.0))
        return tensors, messages, jnp.concatenate(outs)

    fn = _shard_map()(
        body, mesh=mesh,
        in_specs=(P(("x", "y")), P(("x", "y")))
        + (P(("x", "y")),) * len(flat_tables),
        out_specs=(P(("x", "y")), P(("x", "y")), P(("x", "y"))),
    )
    order_j = np.asarray(order)

    @jax.jit
    def gauge_fn(state: BatchedState):
        t, m, flat = fn(state.tensors, state.messages, *flat_tables)
        return BatchedState(t, m), jnp.take(flat, order_j, axis=0)

    return gauge_fn
