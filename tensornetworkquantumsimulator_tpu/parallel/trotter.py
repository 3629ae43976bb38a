"""Circuit → single-XLA-program compiler for batched Trotter evolution.

Takes the same tuple-circuit format as the generic `apply_gates`
(`gate_definitions.jl` conventions) and compiles it into one jitted function
over a :class:`~.engine.BatchedState`:

- runs of 1-site gates are fused into one per-vertex [V, d, d] matrix and
  applied as a single einsum;
- runs of 2-site gates are segmented into matchings (refreshing BP exactly
  where the reference's overlap-amortization would,
  `apply_gates.jl:60-85`), each matching bucketed by slot pair and applied
  as a vmapped simple-update kernel.

The result is the TPU analogue of `apply_gates`: one compiled program per
layer, no host round-trips.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gates as _gates
from ..utils.graphs import NamedGraph
from ..utils.lattices import _gate_vertices
from .engine import (
    BatchedState,
    apply_color_group,
    apply_color_group_masked,
    apply_one_site,
    bp_update,
    local_expectations,
)
from .structure import BatchedGraphSpec, SlotPairBucket, compile_graph


@dataclasses.dataclass
class _OneSiteSegment:
    gate: np.ndarray  # [V, d, d] fused per-vertex matrices


@dataclasses.dataclass
class _TwoSiteSegment:
    buckets: tuple  # SlotPairBuckets
    gate: np.ndarray  # [d,d,d,d] if uniform else per-bucket list
    gates_per_bucket: tuple | None  # per-bucket [B, d,d,d,d] when non-uniform
    needs_refresh: bool


class BatchedCircuit:
    """A tuple circuit compiled against a lattice for batched execution."""

    def __init__(
        self,
        circuit: Sequence,
        g: NamedGraph,
        spec: BatchedGraphSpec | None = None,
        d: int = 2,
        heisenberg: bool = False,
        picture: str | None = None,
    ):
        """``picture`` selects the transfer-matrix convention on d=4 Pauli
        sites: "heisenberg" (≡ heisenberg=True, adjoint maps for operator
        evolution) or "rho" (Schrödinger maps for density-matrix evolution,
        `models/channels.py`).  Noise-channel names (`channels.is_channel`)
        are accepted in either picture."""
        if heisenberg and picture not in (None, "heisenberg"):
            raise ValueError(
                f"heisenberg=True contradicts picture={picture!r}"
            )
        if picture is None:
            picture = "heisenberg" if heisenberg else None
        if picture not in (None, "heisenberg", "rho"):
            raise ValueError(f"unknown picture {picture!r}")
        if picture is not None and d != 4:
            raise ValueError("PTM pictures need d=4 Pauli sites")
        self.spec = spec if spec is not None else compile_graph(g)
        self.d = d
        pos = {v: i for i, v in enumerate(self.spec.vertices)}
        slot_of = {}
        for (iu, iv, su, sv) in self.spec.edges:
            slot_of[(iu, iv)] = su
            slot_of[(iv, iu)] = sv
        V = self.spec.num_vertices

        segments = []
        one_site = None  # accumulating [V, d, d]
        two_run: list = []  # (iu, iv, matrix)
        applied_any = False

        def flush_one_site():
            nonlocal one_site
            if one_site is not None:
                segments.append(_OneSiteSegment(gate=one_site))
                one_site = None

        def flush_two_run():
            nonlocal two_run, applied_any
            if not two_run:
                return
            # split the run into matchings at vertex overlaps (the reference's
            # affected-set refresh points)
            matchings = []
            current, used = [], set()
            for (iu, iv, mat) in two_run:
                if iu in used or iv in used:
                    matchings.append(current)
                    current, used = [], set()
                current.append((iu, iv, mat))
                used.update((iu, iv))
            if current:
                matchings.append(current)
            for matching in matchings:
                buckets: dict = {}
                for (iu, iv, mat) in matching:
                    su, sv = slot_of[(iu, iv)], slot_of[(iv, iu)]
                    buckets.setdefault((su, sv), []).append((iu, iv, mat))
                bs, gates = [], []
                for (su, sv), entries in sorted(buckets.items()):
                    bs.append(
                        SlotPairBucket(
                            slot_u=su,
                            slot_v=sv,
                            u_idx=tuple(e[0] for e in entries),
                            v_idx=tuple(e[1] for e in entries),
                        )
                    )
                    gates.append(np.stack([e[2] for e in entries]))
                uniform = all(
                    np.array_equal(gp, gates[0][0][None].repeat(len(gp), 0))
                    for gp in gates
                ) if gates else True
                if uniform:
                    seg = _TwoSiteSegment(
                        buckets=tuple(bs),
                        gate=gates[0][0],
                        gates_per_bucket=None,
                        needs_refresh=applied_any,
                    )
                else:
                    seg = _TwoSiteSegment(
                        buckets=tuple(bs),
                        gate=None,
                        gates_per_bucket=tuple(gates),
                        needs_refresh=applied_any,
                    )
                segments.append(seg)
                applied_any = True
            two_run = []

        for gate in circuit:
            name = gate[0]
            verts = _gate_vertices(gate[1])
            param = gate[2] if len(gate) > 2 else None
            if picture is not None:
                from ..models import channels as _channels

                if _channels.is_channel(name):
                    mat = _channels.channel_ptm(
                        name, param, nsites=len(verts),
                        heisenberg=(picture == "heisenberg"),
                    )
                elif picture == "heisenberg":
                    mat = np.array(
                        _gates._ptm_cached(name[1:].upper(), float(param))
                    )
                else:
                    mat = np.array(
                        _gates._ptm_schrodinger_cached(
                            name, None if param is None else float(param)
                        )
                    )
            else:
                mat = np.asarray(_gates.gate_matrix(name, param))
            if len(verts) == 1:
                flush_two_run()
                if one_site is None:
                    one_site = np.broadcast_to(
                        np.eye(d, dtype=mat.dtype), (V, d, d)
                    ).copy()
                if one_site.dtype != np.promote_types(one_site.dtype, mat.dtype):
                    one_site = one_site.astype(
                        np.promote_types(one_site.dtype, mat.dtype)
                    )
                i = pos[verts[0]]
                one_site[i] = mat @ one_site[i]
                applied_any = True
            elif len(verts) == 2:
                flush_one_site()
                iu, iv = pos[verts[0]], pos[verts[1]]
                if (iu, iv) not in slot_of:
                    raise ValueError(f"gate on non-edge {verts}")
                two_run.append((iu, iv, mat.reshape(d, d, d, d)))
            else:
                raise ValueError("only 1- and 2-site gates supported")
        flush_two_run()
        flush_one_site()
        self.segments = tuple(segments)


def _scan_plan(circuit: BatchedCircuit, num_vertices: int):
    """Canonical scan tables for a (one-site segment?) + K uniform-gate
    two-site segments layer, or None if the structure doesn't qualify.

    The K per-group HLO subprograms of the unrolled layer are nearly
    identical (same fused eigh/QR/SVD chain, different index constants);
    folding them into ONE ``lax.scan`` body cuts the layer HLO ~K×,
    which directly cuts the remote-compile wall that dominates first-run
    UX and every bench sample on the axon tunnel (BASELINE.md round-2:
    compiles of 276–958 s vs ~0.4 ms/layer compute).

    Canonicalization: every group gets the same bucket STRUCTURE — the
    union of (slot_u, slot_v) keys across groups, each padded to the max
    group size for that key.  Pad rows gather vertex 0 and are discarded
    by the inverse-select write-back (`apply_color_group_masked`).
    Returns (leading_one_site | None, slot_pairs, xs) where xs is the
    stacked-per-group pytree scanned over."""
    segs = list(circuit.segments)
    one = None
    if segs and isinstance(segs[0], _OneSiteSegment):
        one = segs[0].gate
        segs = segs[1:]
    if len(segs) < 2:
        return None
    if not all(
        isinstance(s, _TwoSiteSegment) and s.gates_per_bucket is None
        for s in segs
    ):
        return None
    g0 = segs[0].gate
    if not all(np.array_equal(s.gate, g0) for s in segs[1:]):
        return None

    keys = sorted({
        (b.slot_u, b.slot_v) for s in segs for b in s.buckets
    })
    width = {
        k: max(
            len(b.u_idx)
            for s in segs
            for b in s.buckets
            if (b.slot_u, b.slot_v) == k
        )
        for k in keys
    }
    G, V = len(segs), num_vertices
    xs_tables = []
    for k in keys:
        B = width[k]
        u_tab = np.zeros((G, B), np.int32)
        v_tab = np.zeros((G, B), np.int32)
        valid = np.zeros((G, B), bool)
        u_inv = np.zeros((G, V), np.int32)
        u_wr = np.zeros((G, V), bool)
        v_inv = np.zeros((G, V), np.int32)
        v_wr = np.zeros((G, V), bool)
        for gi, s in enumerate(segs):
            b = next(
                (b for b in s.buckets if (b.slot_u, b.slot_v) == k), None
            )
            if b is None:
                continue
            for i, (iu, iv) in enumerate(zip(b.u_idx, b.v_idx)):
                u_tab[gi, i], v_tab[gi, i], valid[gi, i] = iu, iv, True
                assert not (u_wr[gi, iu] or v_wr[gi, iv])
                u_inv[gi, iu], u_wr[gi, iu] = i, True
                v_inv[gi, iv], v_wr[gi, iv] = i, True
        # NUMPY, not jnp: eager jnp.asarray would commit these to the
        # default (TPU) backend, and lowering a jit that closes over
        # device arrays downloads them for constant embedding — which
        # raises UNIMPLEMENTED on the axon runtime (CLAUDE.md).  numpy
        # xs become embedded constants at trace time instead.
        xs_tables.append({
            "u_tab": u_tab, "v_tab": v_tab, "valid": valid,
            "u_inv": u_inv, "u_wr": u_wr, "v_inv": v_inv, "v_wr": v_wr,
        })
    refresh = np.array([s.needs_refresh for s in segs])
    return one, tuple(keys), {"refresh": refresh, "bkt": xs_tables}


def make_layer_fn(
    circuit: BatchedCircuit,
    chi: int,
    cutoff: float = 1e-12,
    normalize_tensors: bool = True,
    bp_maxiter: int = 30,
    bp_tolerance: float | None = None,
    bp_damping: float = 0.0,
    final_update: bool = True,
    jit: bool = True,
    scan_groups: bool = False,
) -> Callable:
    """Build the (jitted) layer function: state -> (state, truncation_errors).

    ``scan_groups=True`` folds the per-color-group subprograms into one
    ``lax.scan`` body (see `_scan_plan`) when the layer qualifies
    (uniform 2-site gate, optional leading 1-site segment — the Trotter
    bench layers do); falls back to the unrolled form otherwise.  The
    scan body computes the union of slot-pair buckets per group (pad
    rows discarded), so per-layer FLOPs rise slightly while the HLO —
    and with it the compile time — shrinks ~K× for K groups."""
    spec = circuit.spec

    if scan_groups:
        plan = _scan_plan(circuit, spec.num_vertices)
        if plan is not None:
            one_site_gate, slot_pairs, xs = plan
            gate2 = np.asarray(next(
                s for s in circuit.segments
                if isinstance(s, _TwoSiteSegment)).gate)
            all_refresh = bool(np.all(xs["refresh"]))

            def scan_layer(state: BatchedState):
                if one_site_gate is not None:
                    state = apply_one_site(state, jnp.asarray(one_site_gate))

                def body(st, x):
                    def refresh(s):
                        return bp_update(
                            spec, s, maxiter=bp_maxiter,
                            tolerance=bp_tolerance, damping=bp_damping,
                        )

                    if all_refresh:
                        st = refresh(st)
                    else:
                        st = jax.lax.cond(
                            x["refresh"], refresh, lambda s: s, st
                        )
                    st, err = apply_color_group_masked(
                        st, slot_pairs, x["bkt"], gate2, chi, cutoff,
                        normalize_tensors,
                    )
                    return st, err

                state, errs = jax.lax.scan(body, state, xs)
                if final_update:
                    state = bp_update(
                        spec, state, maxiter=bp_maxiter,
                        tolerance=bp_tolerance, damping=bp_damping,
                    )
                return state, errs.reshape(-1)

            return jax.jit(scan_layer) if jit else scan_layer

    def layer(state: BatchedState):
        errs = []
        for seg in circuit.segments:
            if isinstance(seg, _OneSiteSegment):
                state = apply_one_site(state, jnp.asarray(seg.gate))
            else:
                if seg.needs_refresh:
                    state = bp_update(
                        spec, state, maxiter=bp_maxiter, tolerance=bp_tolerance,
                        damping=bp_damping,
                    )
                if seg.gates_per_bucket is None:
                    state, err = apply_color_group(
                        state,
                        seg.buckets,
                        jnp.asarray(seg.gate),
                        chi,
                        cutoff,
                        normalize_tensors,
                    )
                    errs.append(err)
                else:
                    for b, gb in zip(seg.buckets, seg.gates_per_bucket):
                        state, err = apply_color_group(
                            state,
                            (b,),
                            jnp.asarray(gb),
                            chi,
                            cutoff,
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

    return jax.jit(layer) if jit else layer


def make_expectation_fn(
    spec: BatchedGraphSpec, op: np.ndarray, real_output: bool = False
) -> Callable:
    """Jitted per-vertex ⟨op⟩. ``real_output=True`` returns the real part —
    use it when transferring results off-device (hermitian observables)."""
    op = np.asarray(op)  # stay host-side; becomes an MLIR constant at trace

    @jax.jit
    def fn(state: BatchedState):
        out = local_expectations(spec, state, op)
        return jnp.real(out) if real_output else out

    return fn
