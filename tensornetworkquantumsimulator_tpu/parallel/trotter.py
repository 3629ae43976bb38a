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
    ):
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
            if heisenberg:
                mat = np.array(
                    _gates._ptm_cached(name[1:].upper(), float(param))
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
) -> Callable:
    """Build the (jitted) layer function: state -> (state, truncation_errors)."""
    spec = circuit.spec

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
