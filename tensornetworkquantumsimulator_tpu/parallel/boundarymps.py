"""Batched boundary-MPS engine for row-partitioned grid states.

TPU-native redesign of the boundary-MPS cache's hot path
(`boundarympscache.jl:261-360`): the one-site DMRG-style fitting sweep that
updates an inter-row message strand is expressed as ``lax.scan`` passes with
static shapes — strand tensors live in a fixed ``[W, K, χ, χ, K]`` buffer
(K = MPS bond dimension; (χ, χ) = ket/bra legs of the inter-row lattice
bonds) and every local update is a chain of small einsums, so the whole
partition function / expectation sweep compiles to one XLA program.

Scope: full rectangular grids (`named_grid((nx, ny))`) in row-major vertex
order; general planar graphs use the generic engine
(`engines/boundarymps.py`).

Conventions: rows are indexed by the first coordinate; a strand flowing
into row r carries the (ket, bra) pair of the bonds between r-1 and r.
Strand end bonds are kept at size K with content pinned to slice 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .structure import BatchedGraphSpec

_PRECISION = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# host-side role tables
# ---------------------------------------------------------------------------


class GridBMPSSpec:
    """Axis-role bookkeeping for a nx×ny grid compiled by `compile_graph`."""

    def __init__(self, spec: BatchedGraphSpec, nx: int, ny: int):
        if spec.num_vertices != nx * ny:
            raise ValueError("spec does not match the grid size")
        if spec.degree < 4:
            raise ValueError(
                "grid boundary MPS needs the 4-slot layout (nx, ny >= 3); "
                "use the generic engine for strips"
            )
        self.spec = spec
        self.nx, self.ny = nx, ny
        pos = {v: i for i, v in enumerate(spec.vertices)}
        nbr = spec.nbr_array()
        mask = spec.mask_array()
        D = spec.degree
        # role slots per vertex: [up, down, left, right]; dummies fill the rest
        self.perm = np.zeros((nx * ny, D), dtype=np.int64)
        for r in range(1, nx + 1):
            for c in range(1, ny + 1):
                v = (r, c)
                i = pos[v]
                want = [(r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1)]
                slot_of = {}
                for k in range(D):
                    if mask[i, k]:
                        slot_of[spec.vertices[nbr[i, k]]] = k
                dummies = [k for k in range(D) if not mask[i, k]]
                roles = []
                for w in want:
                    if w in slot_of:
                        roles.append(slot_of[w])
                    else:
                        roles.append(dummies.pop())
                # leftover dummies (degree > 4 can't happen on a grid)
                if dummies:
                    raise ValueError("unexpected extra slots on a grid vertex")
                self.perm[i] = roles

    def row_tensors(self, tensors: jax.Array, r: int) -> jax.Array:
        """[W, u, d, l, rt, s] for row r (0-based), trace-time stacked."""
        ny = self.ny
        out = []
        for c in range(ny):
            i = r * ny + c
            axes = [1 + k for k in self.perm[i]] + [tensors.ndim - 1]
            out.append(jnp.transpose(tensors[i], [a - 1 for a in axes]))
        return jnp.stack(out)


def identity_strand(W: int, K: int, chi: int, dtype) -> jax.Array:
    """The boundary (vacuum) strand: δ(ket, bra) at MPS-bond slice (0, 0)."""
    m = np.zeros((W, K, chi, chi, K), dtype=dtype)
    m[:, 0, :, :, 0] = np.eye(chi, dtype=dtype)
    return jnp.asarray(m)


# ---------------------------------------------------------------------------
# fitting sweep
# ---------------------------------------------------------------------------


def _fit_strand(psi_row, m_in, n0, niters: int):
    """One-site ALS fitting of the outgoing strand N ≈ (row ∘ M_in)
    (`boundarympscache.jl:321-360`).  Returns the fitted strand,
    left-canonical with a normalized final tensor."""
    W, K = n0.shape[0], n0.shape[1]
    chi = psi_row.shape[1]
    d_out = n0.shape[2]

    def left_step(l_env, inputs):
        """Update one column given its left env and right env; returns the
        Q-gauged tensor and the next left env."""
        psi, m_c, r_env = inputs
        # X1[A,u,l,m,v,b] = L[A,a,l,m] M[a,u,v,b]
        x1 = jnp.einsum("Aalm,auvb->Aulmvb", l_env, m_c, precision=_PRECISION)
        # X2[A,d,m,v,b,r,s] = X1 · ψ[u,d,l,r,s] over (u,l)
        x2 = jnp.einsum("Aulmvb,udlrs->Admvbrs", x1, psi, precision=_PRECISION)
        # X3[A,d,e,b,r,t] = X2 · ψ̄[v,e,m,t,s] over (v,m,s)
        x3 = jnp.einsum(
            "Admvbrs,vemts->Adebrt", x2, jnp.conj(psi), precision=_PRECISION
        )
        # N_new[A,d,e,B] = X3 · R[B,b,r,t]
        n_new = jnp.einsum("Adebrt,Bbrt->AdeB", x3, r_env, precision=_PRECISION)
        # QR-move the center rightward
        mat = n_new.reshape(K * d_out * d_out, K)
        q, rfac = jnp.linalg.qr(mat)
        q = q.reshape(K, d_out, d_out, K)
        # next left env: X3 · conj(q)
        l_next = jnp.einsum(
            "Adebrt,AdeB->Bbrt", x3, jnp.conj(q), precision=_PRECISION
        )
        return l_next, (q, n_new)

    def flip_psi(row):
        # reverse columns and swap left/right legs: an L→R sweep on the
        # flipped arrays is an R→L sweep on the originals
        return jnp.flip(row, 0).transpose(0, 1, 2, 4, 3, 5)

    def flip_strand(m):
        return jnp.flip(m, 0).transpose(0, 4, 2, 3, 1)

    def half_sweep(psi_r, m_r, n, _):
        # right envs from the current (conjugated) strand
        def renv_step(r_env, inputs):
            psi, m_c, n_c = inputs
            x1 = jnp.einsum("Bbrt,auvb->Bartuv", r_env, m_c, precision=_PRECISION)
            x2 = jnp.einsum(
                "Bartuv,udlrs->Batvdls", x1, psi, precision=_PRECISION
            )
            x3 = jnp.einsum(
                "Batvdls,vemts->Badelm", x2, jnp.conj(psi), precision=_PRECISION
            )
            new = jnp.einsum(
                "Badelm,AdeB->Aalm", x3, jnp.conj(n_c), precision=_PRECISION
            )
            return new, r_env

        r_init = jnp.zeros((K, K, chi, chi), n.dtype)
        r_init = r_init.at[0, 0].set(jnp.eye(chi, dtype=n.dtype))
        _, r_envs = jax.lax.scan(
            renv_step, r_init, (psi_r, m_r, n), reverse=True
        )
        # r_envs[c] = environment of columns STRICTLY right of c
        l_init = jnp.zeros((K, K, chi, chi), n.dtype)
        l_init = l_init.at[0, 0].set(jnp.eye(chi, dtype=n.dtype))
        _, (qs, raws) = jax.lax.scan(
            left_step, l_init, (psi_r, m_r, r_envs)
        )
        # keep the final (center) tensor unitless: normalize it
        last = raws[-1]
        norm = jnp.linalg.norm(last.reshape(-1))
        last = last / jnp.where(norm == 0, 1.0, norm)
        n_out = qs.at[-1].set(last)
        return n_out, None

    psi_f = None
    m_f = None

    def sweep(n, _):
        # proper ALS: alternate L→R and R→L one-site sweeps so the
        # environments on both sides of the update are isometric
        # (`boundarympscache.jl:321-360` gauge walk)
        n, _ = half_sweep(psi_row, m_in, n, None)
        nf = flip_strand(n)
        nf, _ = half_sweep(flip_psi(psi_row), flip_strand(m_in), nf, None)
        return flip_strand(nf), None

    n, _ = jax.lax.scan(sweep, n0, None, length=niters)
    return n


# ---------------------------------------------------------------------------
# scalars
# ---------------------------------------------------------------------------


def _edge_scalar(m_up, m_dn):
    """⟨m_e, m_ē⟩ along one inter-row interface (`boundarympscache.jl:505-513`)."""
    K = m_up.shape[1]

    def step(carry, inputs):
        up, dn = inputs
        # carry[a, ā] × up[a,u,v,b] × conj? messages stored un-conjugated;
        # the pairing contracts (u, v) directly (`edge_scalar`)
        x = jnp.einsum("aA,auvb->Auvb", carry, up, precision=_PRECISION)
        new = jnp.einsum("Auvb,AuvB->bB", x, dn, precision=_PRECISION)
        return new, None

    c0 = jnp.zeros((K, K), m_up.dtype).at[0, 0].set(1.0)
    out, _ = jax.lax.scan(step, c0, (m_up, m_dn))
    return out[0, 0]


def _row_scalar(psi_row, m_up, m_dn, op=None, op_col=None):
    """Contract one row with its two incoming strands; optionally insert a
    single-site operator at a (static) column (`path_contract`)."""
    W = psi_row.shape[0]
    K = m_up.shape[1]
    chi = psi_row.shape[1]

    def step(carry, inputs):
        c, (psi, up, dn) = inputs
        # carry[a_up, a_dn, l, m]
        x = jnp.einsum("aqlm,auvb->qlmuvb", carry, up, precision=_PRECISION)
        x = jnp.einsum("qlmuvb,udlrs->qmvbdrs", x, psi, precision=_PRECISION)
        psi_b = jnp.conj(psi)
        if op is not None:
            opm = op.astype(psi.dtype)
            sel = (c == op_col)
            eye = jnp.eye(op.shape[0], dtype=psi.dtype)
            o = jnp.where(sel, opm, eye)
            psi_b = jnp.einsum("vemtz,zs->vemts", psi_b, o, precision=_PRECISION)
        x = jnp.einsum("qmvbdrs,vemts->qbdert", x, psi_b, precision=_PRECISION)
        new = jnp.einsum("qbdert,qdeQ->bQrt", x, dn, precision=_PRECISION)
        return new, None

    c0 = jnp.zeros((K, K, chi, chi), psi_row.dtype)
    c0 = c0.at[0, 0].set(jnp.eye(chi, dtype=psi_row.dtype))
    cols = jnp.arange(W)
    out, _ = jax.lax.scan(step, c0, (cols, (psi_row, m_up, m_dn)))
    # close the right dummy bonds (ket-bra trace) and the strand ends
    return jnp.einsum("bQrr->bQ", out, precision=_PRECISION)[0, 0]


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------


def make_grid_bmps(
    spec: BatchedGraphSpec,
    nx: int,
    ny: int,
    kmps: int,
    niters: int = 15,
):
    """Build jitted boundary-MPS evaluators for an nx×ny grid state.

    Returns ``(norm_sqr_fn, expect_fn)``:
      - ``norm_sqr_fn(tensors) -> (log_abs_z, phase)`` — boundary-MPS ⟨ψ|ψ⟩
      - ``expect_fn(tensors, op) -> [V]`` — per-vertex ⟨op⟩ (real part)
    ``tensors`` is the BatchedState tensor array.
    """
    gspec = GridBMPSSpec(spec, nx, ny)
    W = ny

    def _strands(tensors):
        chi = tensors.shape[1]
        dtype = tensors.dtype
        rows = [gspec.row_tensors(tensors, r) for r in range(nx)]
        # upward pass: message into row r from r-1 (m_up[r])
        m_up = [identity_strand(W, kmps, chi, dtype)]
        for r in range(nx - 1):
            m_up.append(_fit_strand(rows[r], m_up[-1], m_up[-1], niters))
        # downward pass: message into row r from r+1 (m_dn[r]); the row
        # tensors need up/down swapped for the sweep direction
        def flip(row):
            return jnp.transpose(row, (0, 2, 1, 3, 4, 5))

        m_dn = [None] * nx
        m_dn[nx - 1] = identity_strand(W, kmps, chi, dtype)
        cur = m_dn[nx - 1]
        for r in range(nx - 1, 0, -1):
            cur = _fit_strand(flip(rows[r]), cur, cur, niters)
            m_dn[r - 1] = cur
        return rows, m_up, m_dn

    @jax.jit
    def norm_sqr_fn(tensors):
        rows, m_up, m_dn = _strands(tensors)
        rdt = jnp.zeros((), tensors.dtype).real.dtype
        log_z = jnp.zeros((), rdt)
        phase = jnp.zeros_like(log_z)
        for r in range(nx):
            v = _row_scalar(rows[r], m_up[r], m_dn[r])
            log_z += jnp.log(jnp.abs(v))
            phase += jnp.angle(v)
        for r in range(nx - 1):
            e = _edge_scalar(m_up[r + 1], m_dn[r])
            log_z -= jnp.log(jnp.abs(e))
            phase -= jnp.angle(e)
        return log_z, phase

    @jax.jit
    def expect_fn(tensors, op):
        rows, m_up, m_dn = _strands(tensors)
        out = []
        for r in range(nx):
            denom = _row_scalar(rows[r], m_up[r], m_dn[r])
            for c in range(W):
                numer = _row_scalar(
                    rows[r], m_up[r], m_dn[r], op=op, op_col=c
                )
                out.append(jnp.real(numer / denom))
        return jnp.stack(out)

    return norm_sqr_fn, expect_fn
