"""Multi-chip boundary-MPS: pipelined row-strand fitting over a device mesh.

The reference's boundary-MPS message update sweeps rows sequentially
(`boundarympscache.jl:321-360` — BP over the partition supergraph, one
orthogonal fitting sweep per inter-row strand).  That dependency chain is
pipeline-shaped (SURVEY §2 item 3): strand r+1 needs strand r, but the
upward and downward chains are independent and every per-row scalar /
expectation is independent once the strands exist.

TPU-native schedule implemented here, over a 1-D mesh axis of S devices
holding ``nrows/S`` contiguous rows each:

- the row tensors live sharded on the row axis ([R, W, χ,χ,χ,χ,d],
  ``PartitionSpec(axis)``) — at pod scale the state never needs to be
  gathered to one chip to be measured (round-2 VERDICT missing item 1);
- the upward and downward strand chains run CONCURRENTLY as two
  wavefronts through the pipeline: at step t the up-carry is true on
  device t and the down-carry on device S-1-t, handed along with one
  ``ppermute`` each per step (ICI neighbor traffic only).  Every device
  executes the same fitting program each step (SPMD) and keeps the
  result only when the carry it holds is the true one — after S steps
  each device owns the exact strands of its local rows;
- per-row scalars and per-vertex expectations then run fully in
  parallel across devices; the partition function is assembled with a
  single ``psum`` of local log-contributions (the cross-shard interface
  ⟨m_up, m_dn⟩ scalars are computed on the interface's lower device from
  the received up-carry and the locally produced down boundary strand).

The fitting kernel itself is `boundarymps._fit_strand` — identical math,
so the sharded evaluators agree with the single-chip batched engine to
float roundoff (tested on 8 virtual devices, tests/test_sharded_bmps.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .boundarymps import (
    GridBMPSSpec,
    PlanarBMPSSpec,
    _edge_scalar,
    _fit_strand,
    _row_scalar,
    identity_strand,
)
from .structure import BatchedGraphSpec

try:  # jax>=0.4.35 moved shard_map out of experimental
    from jax import shard_map as _shard_map_raw
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_raw


def _shard_map(f, **kw):
    """shard_map with the varying-manual-axes check off: the pipeline's
    scan carries start as device-constant identity strands and become
    device-varying only after the first ppermute, which the static VMA
    checker can't express (check_vma in new jax, check_rep before)."""
    try:
        return _shard_map_raw(f, check_vma=False, **kw)
    except TypeError:  # pragma: no cover
        return _shard_map_raw(f, check_rep=False, **kw)


def _flip_ud(row):
    """Swap up/down legs for the downward sweep (`_strand_builder` flip)."""
    return jnp.transpose(row, (0, 2, 1, 3, 4, 5))


def _make_sharded_bmps_fns(
    row_tensors_fn,
    nrows: int,
    W: int,
    mesh: Mesh,
    axis: str,
    kmps: int,
    niters: int,
    tolerance="auto",
):
    """Shared builder: (norm_sqr_fn, expect_rowcol_fn) over any row
    provider, pipelined over ``mesh`` axis ``axis``."""
    S = int(mesh.shape[axis])
    if nrows % S != 0:
        raise ValueError(
            f"{nrows} rows not divisible by {S} devices on axis {axis!r}"
        )
    Rl = nrows // S
    fwd = [(i, (i + 1) % S) for i in range(S)]
    bwd = [(i, (i - 1) % S) for i in range(S)]

    def rows_stack(tensors):
        rows = jnp.stack(
            [row_tensors_fn(tensors, r) for r in range(nrows)]
        )  # [R, W, χ,χ,χ,χ,d]
        return jax.lax.with_sharding_constraint(
            rows, NamedSharding(mesh, P(axis))
        )

    def _strands_local(rows_local):
        """Pipeline both chains; returns the device's true local strands
        plus the two cross-interface boundary strands."""
        chi = rows_local.shape[2]
        dtype = rows_local.dtype
        ident = identity_strand(W, kmps, chi, dtype)
        sidx = jax.lax.axis_index(axis)
        up_saved = jnp.zeros((Rl,) + ident.shape, dtype)
        dn_saved = jnp.zeros_like(up_saved)
        recv_up = ident  # m_up[first local row] once the true carry lands
        bound_dn = ident  # m_dn[first local row - 1] (what we send down)
        carry_up, carry_dn = ident, ident
        for t in range(S):
            take_up = sidx == t
            recv_up = jnp.where(take_up, carry_up, recv_up)
            cu = carry_up
            locs = []
            for j in range(Rl):
                locs.append(cu)  # m_up[s*Rl + j]
                cu = _fit_strand(rows_local[j], cu, cu, niters, tolerance)
            up_saved = jnp.where(take_up, jnp.stack(locs), up_saved)
            carry_up = jax.lax.ppermute(cu, axis, fwd)

            take_dn = sidx == S - 1 - t
            cd = carry_dn
            locs_d = [None] * Rl
            for j in range(Rl - 1, -1, -1):
                locs_d[j] = cd  # m_dn[s*Rl + j]
                cd = _fit_strand(
                    _flip_ud(rows_local[j]), cd, cd, niters, tolerance
                )
            dn_saved = jnp.where(take_dn, jnp.stack(locs_d), dn_saved)
            bound_dn = jnp.where(take_dn, cd, bound_dn)
            carry_dn = jax.lax.ppermute(cd, axis, bwd)
        return up_saved, dn_saved, recv_up, bound_dn, sidx

    def _norm_local(rows_local):
        up, dn, recv_up, bound_dn, sidx = _strands_local(rows_local)
        rdt = jnp.zeros((), rows_local.dtype).real.dtype
        log_z = jnp.zeros((), rdt)
        phase = jnp.zeros((), rdt)
        for j in range(Rl):
            v = _row_scalar(rows_local[j], up[j], dn[j])
            log_z += jnp.log(jnp.abs(v))
            phase += jnp.angle(v)
        for j in range(Rl - 1):
            e = _edge_scalar(up[j + 1], dn[j])
            log_z -= jnp.log(jnp.abs(e))
            phase -= jnp.angle(e)
        # the interface below this device's first row (absent on device 0)
        e = _edge_scalar(recv_up, bound_dn)
        has = (sidx > 0).astype(rdt)
        log_z -= has * jnp.log(jnp.abs(e))
        phase -= has * jnp.angle(e)
        return (
            jax.lax.psum(log_z, axis),
            jax.lax.psum(phase, axis),
        )

    def _expect_local(rows_local, op):
        up, dn, *_ = _strands_local(rows_local)
        outs = []
        cols = jnp.arange(W)
        for j in range(Rl):
            denom = _row_scalar(rows_local[j], up[j], dn[j])
            num = jax.vmap(
                lambda c, j=j: _row_scalar(
                    rows_local[j], up[j], dn[j], op=op, op_col=c
                )
            )(cols)
            outs.append(jnp.real(num / denom))
        return jnp.stack(outs)  # [Rl, W]

    norm_sharded = _shard_map(
        _norm_local, mesh=mesh, in_specs=(P(axis),), out_specs=(P(), P())
    )
    expect_sharded = _shard_map(
        _expect_local,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(axis),
    )

    @jax.jit
    def norm_sqr_fn(tensors):
        return norm_sharded(rows_stack(tensors))

    @jax.jit
    def expect_rowcol_fn(tensors, op):
        return expect_sharded(rows_stack(tensors), op)  # [R, W]

    return norm_sqr_fn, expect_rowcol_fn


def make_sharded_grid_bmps(
    spec: BatchedGraphSpec,
    nx: int,
    ny: int,
    mesh: Mesh,
    axis: str = "r",
    kmps: int = 4,
    niters: int = 15,
    tolerance="auto",
):
    """Sharded boundary-MPS evaluators for an nx×ny grid state.

    Returns ``(norm_sqr_fn, expect_fn)`` matching `make_grid_bmps`:
    ``norm_sqr_fn(tensors) -> (log_abs_z, phase)``,
    ``expect_fn(tensors, op) -> [V]`` in row-major vertex order."""
    gspec = GridBMPSSpec(spec, nx, ny)
    norm_fn, expect_rc = _make_sharded_bmps_fns(
        gspec.row_tensors, nx, ny, mesh, axis, kmps, niters, tolerance
    )

    def expect_fn(tensors, op):
        return expect_rc(tensors, op).reshape(-1)

    return norm_fn, expect_fn


def make_sharded_planar_bmps(
    spec: BatchedGraphSpec,
    mesh: Mesh,
    axis: str = "r",
    kmps: int = 4,
    niters: int = 15,
    row_of=None,
    col_of=None,
    tolerance="auto",
):
    """Sharded boundary-MPS evaluators for any column-aligned planar
    lattice (heavy-hex, Lieb, comb — `make_planar_bmps` scope).

    Returns ``(norm_sqr_fn, expect_fn)`` with ``expect_fn`` output in
    ``spec.vertices`` order."""
    pspec = PlanarBMPSSpec(spec, row_of=row_of, col_of=col_of)
    norm_fn, expect_rc = _make_sharded_bmps_fns(
        pspec.row_tensors, pspec.nrows, pspec.W, mesh, axis, kmps, niters,
        tolerance,
    )
    rows = np.array([pspec.rowcol[i][0] for i in range(spec.num_vertices)])
    cols = np.array([pspec.rowcol[i][1] for i in range(spec.num_vertices)])

    def expect_fn(tensors, op):
        return expect_rc(tensors, op)[rows, cols]

    return norm_fn, expect_fn
