"""Batched certified sampling for grid states.

TPU-native redesign of the boundary-MPS sampler + certification
(`sampling.jl:48-75, 209-298, 300-332`): one jitted program draws a whole
batch of bitstrings and certifies each one with an independent
re-contraction of ⟨x|ψ⟩ (the `sample_certified` flavor).

Per sample (all shapes static, vmapped over PRNG keys):

1. *norm strands* — boundary-MPS messages of ⟨ψ|ψ⟩ fitted bottom-up
   (`parallel/boundarymps._fit_strand`) give the environment below each row;
2. *conditional sampling* — rows top-to-bottom; per row, right environments
   are scanned right-to-left, then a left-to-right scan samples each site's
   conditional RDM diagonal (`jax.random.categorical`), projects the site,
   and pushes the left environment forward;
3. *projected strand* — the sampled row is absorbed into a single-layer ket
   strand, densified and re-truncated at a fixed projected rank (QR/SVD
   scans);
4. *certification* — ⟨x|ψ⟩ is re-contracted from the raw tensors and
   combined with log q into p(x)/q(x).

Leg conventions per column: projected strand from above P (a, u, A) and its
conjugate P̄ (b, v, B); norm strand from below N (q, d_ket, e_bra, Q);
ψ (u, d, l, r, s), ψ̄ (v, e, m, t, z).  Left/right environments carry
(strand bonds a/b/q, ket link, bra link).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .boundarymps import (
    GridBMPSSpec,
    PlanarBMPSSpec,
    _fit_strand,
    identity_strand,
)
from .structure import BatchedGraphSpec

_PRECISION = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# single-layer (ket) strand machinery
# ---------------------------------------------------------------------------


def _single_truncate(strand, K):
    """[W, A, p, B] -> ([W, K, p, K], log_norm): QR (L→R) + SVD (R→L)
    sweeps; the result is unit-normalized with the magnitude logged."""
    W, A, p, B = strand.shape
    D = max(A, B, K)

    def pad(x, axis, size):
        if x.shape[axis] >= size:
            return x
        pads = [(0, 0)] * x.ndim
        pads[axis] = (0, size - x.shape[axis])
        return jnp.pad(x, pads)

    strand = pad(pad(strand, 1, D), 3, D)

    def qr_step(r, t):
        t = jnp.einsum("ab,bpc->apc", r, t, precision=_PRECISION)
        q, r2 = jnp.linalg.qr(t.reshape(D * p, D))
        return r2, q.reshape(D, p, D)

    eye = jnp.eye(D, dtype=strand.dtype)
    r_fin, qs = jax.lax.scan(qr_step, eye, strand)
    qs = qs.at[-1].set(
        jnp.einsum("apb,bc->apc", qs[-1], r_fin, precision=_PRECISION)
    )

    def svd_step(w, t):
        t = jnp.einsum("apb,bk->apk", t, w, precision=_PRECISION)
        u, s, vh = jnp.linalg.svd(t.reshape(D, p * K), full_matrices=False)
        k = min(K, s.shape[0])
        u, s, vh = u[:, :k], s[:k], vh[:k, :]
        if k < K:
            u = jnp.pad(u, ((0, 0), (0, K - k)))
            s = jnp.pad(s, (0, K - k))
            vh = jnp.pad(vh, ((0, K - k), (0, 0)))
        return u * s[None, :].astype(u.dtype), vh.reshape(K, p, K)

    # right end bond is pinned to slot 0 (strand-end convention)
    w0 = jnp.zeros((D, K), strand.dtype).at[0, 0].set(1.0)
    w_fin, ts = jax.lax.scan(svd_step, w0, qs, reverse=True)
    # w_fin [D(left boundary), K] hangs off position 0's pinned end: keep
    # its slot-0 row and store the result back at left-bond slot 0
    first = jnp.einsum("k,kpc->pc", w_fin[0], ts[0], precision=_PRECISION)
    norm = jnp.linalg.norm(first.reshape(-1))
    safe = jnp.where(norm == 0, 1.0, norm)
    new0 = jnp.zeros_like(ts[0]).at[0].set(first / safe)
    ts = ts.at[0].set(new0)
    return ts, jnp.log(safe)


def _e0_strand(W, K, chi, dtype):
    """Single-layer boundary strand: all legs pinned to index 0."""
    p0 = np.zeros((W, K, chi, K), dtype=dtype)
    p0[:, 0, 0, 0] = 1.0
    return jnp.asarray(p0)


def _push_projected(strand, row, K):
    """Absorb a site-projected row into the ket strand and re-truncate.

    strand: [W, A, χ(u), B]; row: [W, u, d, l, r].
    Returns ([W, K, χ(d), K], log_norm)."""
    W, A, chi, B = strand.shape
    fat = jnp.einsum("waub,wudlr->waldbr", strand, row, precision=_PRECISION)
    fat = fat.reshape(W, A * chi, chi, B * chi)
    return _single_truncate(fat, K)


def _close_projected(strand, row):
    """Contract the final (site-projected) row into the strand, pinning its
    dummy down/right legs to index 0; returns the scalar amplitude."""
    W, A, chi, B = strand.shape

    def step(carry, inputs):
        m, r = inputs  # m: (a, u, b); r: (u, d, l, rr) with d dummy
        x = jnp.einsum("al,aub->lub", carry, m, precision=_PRECISION)
        out = jnp.einsum("lub,ulr->br", x, r[:, 0], precision=_PRECISION)
        return out, None

    c0 = jnp.zeros((A, chi), strand.dtype).at[0, 0].set(1.0)
    out, _ = jax.lax.scan(step, c0, (strand, row))
    return out[0, 0]


# ---------------------------------------------------------------------------
# environment transfer steps (double layer, see module docstring for legs)
# ---------------------------------------------------------------------------


def _renv_step(renv, p_c, n_c, psi_c):
    """R[c] from R[c+1] with the site traced."""
    pbar = jnp.conj(p_c)
    psibar = jnp.conj(psi_c)
    x1 = jnp.einsum("ABQrt,auA->uBQrta", renv, p_c, precision=_PRECISION)
    x2 = jnp.einsum("uBQrta,udlrs->BQtadls", x1, psi_c, precision=_PRECISION)
    x3 = jnp.einsum("BQtadls,qdeQ->Btalsqe", x2, n_c, precision=_PRECISION)
    x4 = jnp.einsum("Btalsqe,vemts->Balqvm", x3, psibar, precision=_PRECISION)
    return jnp.einsum("Balqvm,bvB->abqlm", x4, pbar, precision=_PRECISION)


def _lenv_step(lenv, p_c, n_c, psip_c):
    """L[c+1] from L[c] with the projected site tensors absorbed."""
    pbar = jnp.conj(p_c)
    psipbar = jnp.conj(psip_c)
    y1 = jnp.einsum("abqlm,auA->bqlmuA", lenv, p_c, precision=_PRECISION)
    y2 = jnp.einsum("bqlmuA,udlr->bqmAdr", y1, psip_c, precision=_PRECISION)
    y3 = jnp.einsum("bqmAdr,qdeQ->bmArQe", y2, n_c, precision=_PRECISION)
    y4 = jnp.einsum("bmArQe,vemt->bArQvt", y3, psipbar, precision=_PRECISION)
    return jnp.einsum("bArQvt,bvB->ABQrt", y4, pbar, precision=_PRECISION)


def _local_rdm(lenv, renv, p_c, n_c, psi_c):
    """ρ[s(ket), z(bra)] at one column."""
    pbar = jnp.conj(p_c)
    psibar = jnp.conj(psi_c)
    z1 = jnp.einsum("abqlm,auA->bqlmuA", lenv, p_c, precision=_PRECISION)
    z2 = jnp.einsum("bqlmuA,udlrs->bqmAdrs", z1, psi_c, precision=_PRECISION)
    z3 = jnp.einsum("bqmAdrs,qdeQ->bmArsQe", z2, n_c, precision=_PRECISION)
    z4 = jnp.einsum("bmArsQe,vemtz->bArsQvtz", z3, psibar, precision=_PRECISION)
    z5 = jnp.einsum("bArsQvtz,bvB->ArsQtzB", z4, pbar, precision=_PRECISION)
    return jnp.einsum("ArsQtzB,ABQrt->sz", z5, renv, precision=_PRECISION)


def _env_init(kp, kn, chi, dtype):
    """Boundary environment: strand end-bonds pinned at 0, dummy lattice
    ket/bra links paired with δ."""
    env = np.zeros((kp, kp, kn, chi, chi), dtype=dtype)
    env[0, 0, 0] = np.eye(chi, dtype=dtype)
    return jnp.asarray(env)


# ---------------------------------------------------------------------------
# the sampler
# ---------------------------------------------------------------------------


def make_grid_certified_sampler(
    spec: BatchedGraphSpec,
    nx: int,
    ny: int,
    norm_rank: int,
    projected_rank: int,
    niters: int = 12,
):
    """Build ``sampler(tensors, keys) -> (bits [n, nx, W], logq [n],
    log_poverq [n])`` for a grid BatchedState (gauged/normalized states give
    the best-conditioned strands).

    ``exp(log_poverq)`` = |⟨x|ψ⟩|²/q(x): constant across samples iff the
    sampling distribution q is exact, so its spread certifies sample quality
    (`sampling.jl:300-332`)."""
    gspec = GridBMPSSpec(spec, nx, ny)
    return _make_certified_sampler(
        gspec.row_tensors, nx, ny, norm_rank, projected_rank, niters
    )


def make_planar_certified_sampler(
    spec: BatchedGraphSpec,
    norm_rank: int,
    projected_rank: int,
    niters: int = 12,
    row_of=None,
    col_of=None,
):
    """Certified sampler for any column-aligned planar lattice (heavy-hex,
    Lieb, comb, …) — the batched counterpart of the reference's
    `sample_certified` on general partitions (`sampling.jl:202-207,
    300-332`).

    Returns ``sampler(tensors, keys) -> (bits [n, V], logq [n],
    log_poverq [n])`` with bits in ``spec.vertices`` order.  Wire (padding)
    positions sample bit 0 with probability 1 and contribute nothing to
    log q or the certificate."""
    pspec = PlanarBMPSSpec(spec, row_of=row_of, col_of=col_of)
    grid_sampler = _make_certified_sampler(
        pspec.row_tensors, pspec.nrows, pspec.W, norm_rank, projected_rank,
        niters, jit=False,
    )
    rows_idx = np.asarray([pspec.rowcol[i][0] for i in range(spec.num_vertices)])
    cols_idx = np.asarray([pspec.rowcol[i][1] for i in range(spec.num_vertices)])

    @jax.jit
    def sampler(tensors, keys):
        bits, logq, log_poverq = grid_sampler(tensors, keys)
        return bits[:, rows_idx, cols_idx], logq, log_poverq

    return sampler


def _make_certified_sampler(
    row_tensors_fn,
    nx: int,
    ny: int,
    norm_rank: int,
    projected_rank: int,
    niters: int = 12,
    jit: bool = True,
):
    W = ny

    def norm_strands(tensors):
        rows = [row_tensors_fn(tensors, r) for r in range(nx)]
        chi = tensors.shape[1]
        dtype = tensors.dtype

        def flip(row):
            return jnp.transpose(row, (0, 2, 1, 3, 4, 5))

        m_dn = [None] * nx
        m_dn[nx - 1] = identity_strand(W, norm_rank, chi, dtype)
        cur = m_dn[nx - 1]
        for r in range(nx - 1, 0, -1):
            cur = _fit_strand(flip(rows[r]), cur, cur, niters, "auto")
            m_dn[r - 1] = cur
        return rows, m_dn

    def sample_row(row, n_strand, p_strand, key):
        """Sample all columns of one row; returns (bits [W], psp [W,u,d,l,r],
        logq, key)."""
        chi = row.shape[1]
        d = row.shape[-1]
        kp = p_strand.shape[1]
        kn = n_strand.shape[1]
        dtype = row.dtype

        def renv_scan(renv, inputs):
            p_c, n_c, psi_c = inputs
            return _renv_step(renv, p_c, n_c, psi_c), renv

        r_init = _env_init(kp, kn, chi, dtype)
        _, renvs = jax.lax.scan(
            renv_scan, r_init, (p_strand, n_strand, row), reverse=True
        )
        # renvs[c] = environment of columns > c

        def fwd(carry, inputs):
            lenv, key, logq = carry
            p_c, n_c, psi_c, renv = inputs
            rho = _local_rdm(lenv, renv, p_c, n_c, psi_c)
            probs = jnp.clip(jnp.real(jnp.diagonal(rho)), 0.0, None)
            total = jnp.sum(probs)
            probs = probs / jnp.where(total == 0, 1.0, total)
            key, sub = jax.random.split(key)
            bit = jax.random.categorical(sub, jnp.log(probs + 1e-30))
            q = jnp.take(probs, bit)
            psip = jnp.take(psi_c, bit, axis=-1) / jnp.sqrt(q).astype(dtype)
            lenv = _lenv_step(lenv, p_c, n_c, psip)
            return (lenv, key, logq + jnp.log(q).astype(jnp.float32)), (bit, psip)

        l_init = _env_init(kp, kn, chi, dtype)
        (lenv, key, logq), (bits, psps) = jax.lax.scan(
            fwd, (l_init, key, jnp.zeros((), jnp.float32)),
            (p_strand, n_strand, row, renvs),
        )
        return bits, psps, logq, key

    def certify(tensors, bits):
        """log |⟨x|ψ⟩|² from scratch (bits: [nx, W])."""
        kc = projected_rank
        chi = tensors.shape[1]
        strand = _e0_strand(W, kc, chi, tensors.dtype)
        log_amp = jnp.zeros((), jnp.float32)
        for r in range(nx):
            row = row_tensors_fn(tensors, r)  # [W,u,d,l,rr,s]
            sel = jnp.take_along_axis(
                row,
                bits[r][:, None, None, None, None, None],
                axis=5,
            )[..., 0]
            if r < nx - 1:
                strand, ln = _push_projected(strand, sel, kc)
                log_amp = log_amp + ln.astype(jnp.float32)
            else:
                amp = _close_projected(strand, sel)
                log_amp = log_amp + jnp.log(
                    jnp.abs(amp) + 1e-30
                ).astype(jnp.float32)
        return 2.0 * log_amp

    def sampler(tensors, keys):
        rows, m_dn = norm_strands(tensors)
        chi = tensors.shape[1]
        dtype = tensors.dtype

        def one(key):
            p_strand = _e0_strand(W, projected_rank, chi, dtype)
            logq = jnp.zeros((), jnp.float32)
            bits_rows = []
            for r in range(nx):
                bits, psps, lq, key = sample_row(
                    rows[r], m_dn[r], p_strand, key
                )
                logq = logq + lq
                bits_rows.append(bits)
                if r < nx - 1:
                    p_strand, _ln = _push_projected(
                        p_strand, psps, projected_rank
                    )
            bits_all = jnp.stack(bits_rows)  # [nx, W]
            log_p = certify(tensors, bits_all)
            return bits_all, logq, log_p - logq

        return jax.vmap(one)(keys)

    return jax.jit(sampler) if jit else sampler


# ---------------------------------------------------------------------------
# multi-chip: shard the sample batch over a device mesh
# ---------------------------------------------------------------------------


def make_sharded_sampler(sampler, mesh, axis: str = "s"):
    """Wrap a certified sampler for SPMD execution over the SAMPLE axis.

    Sampling is embarrassingly parallel across draws (`sampler` vmaps a
    per-key body), so the TPU-native multi-chip schedule shards the key
    batch over ``mesh[axis]`` and replicates the state: each device draws
    and certifies its own block of samples with zero collectives.  The
    strand/fitting preamble is recomputed per device (cheap relative to
    the per-sample sweeps, and avoiding it would need a broadcast
    anyway).  Same bits/logq/certificates as the single-chip sampler for
    the same keys (tests/test_sharded_sampling.py).

    ``keys`` must have leading dimension divisible by the mesh axis size.
    """
    from jax.sharding import PartitionSpec as P

    from .sharded_bmps import _shard_map

    smap = _shard_map(
        lambda tensors, keys: sampler(tensors, keys),
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
    )

    @jax.jit
    def sharded(tensors, keys):
        if keys.shape[0] % mesh.shape[axis] != 0:
            raise ValueError(
                f"{keys.shape[0]} keys not divisible by mesh axis "
                f"{axis!r} ({mesh.shape[axis]})"
            )
        return smap(tensors, keys)

    return sharded
