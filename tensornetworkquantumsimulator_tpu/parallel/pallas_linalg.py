"""Pallas TPU batched hermitian eigh: one kernel, zero host launches.

The per-layer wall at small χ is dominated by the *number of sequential
XLA kernels* inside the factorization calls (BASELINE.md): a single
``jnp.linalg.eigh`` on TPU lowers to a QDWH-based spectral
divide-and-conquer with hundreds of small kernels, each paying launch
latency, while the matrices (χ ∈ [10, 64]) are far below MXU size.  This
module replaces the whole batched eigh with ONE Pallas kernel that runs a
parallel-ordered cyclic Jacobi diagonalization entirely in VMEM/VPU:

- **batch in the lane dimension**: matrices are held as ``[n, n, G]``
  blocks so every elementwise op processes G matrices across the 128
  lanes (the data-layout STATUS.md round 1 identified as the winning
  shape at small χ — a per-matrix layout would fight the (8, 128) tile);
- **complex via re/im planes** (Mosaic rejects complex dtypes);
- **adjacent-pair rotations + fixed reseating permutation**: each round
  rotates the n/2 disjoint pairs (2i, 2i+1) — built ELEMENTWISE from
  masked reductions, rolls and selects, no gathers and no matmuls — then
  reseats rows/columns with a fixed local permutation σ (rolls by ±1/±2);
  σ has order n−1, so after each full sweep of n−1 rounds the matrix is
  back in its original order and every index pair has met exactly once
  (round-robin tournament / Brent–Luk ordering);
- fixed sweep count (no data-dependent control flow): cyclic Jacobi
  converges quadratically; 5–7 sweeps reach machine precision for
  n ≤ 64 (measured in the design prototype), +1 sweep of margin here.

The reference hits the same factorizations through LAPACK
(`utils.jl:77-91` safe_eigen, `simple_update.jl:46-53` factorize_svd);
this kernel is the TPU-native substrate those calls map onto
(SURVEY.md §2 "native layer to re-create").

Accuracy: float32 (complex64) — reconstruction ‖VΛV†−A‖/‖A‖ ≲ n·ε_f32.
Not a general-purpose eigh: ascending-order sort and the odd-n case are
handled by the wrapper (odd n falls back to ``jnp.linalg.eigh``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def default_sweeps(n: int) -> int:
    """Prototype-measured machine-precision sweep counts +1 margin."""
    if n <= 24:
        return 6
    if n <= 48:
        return 7
    return 8


def _lay0(n: int) -> np.ndarray:
    """Initial adjacent-pair layout: position 2i ← i, 2i+1 ← n−1−i."""
    out = np.empty(n, dtype=np.int32)
    for i in range(n // 2):
        out[2 * i] = i
        out[2 * i + 1] = n - 1 - i
    return out


def _eigh_kernel(br_ref, bi_ref, w_ref, vr_ref, vi_ref, *, n, sweeps):
    f32 = jnp.float32
    G = br_ref.shape[-1]
    row3 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    col3 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    eye3 = (row3 == col3).astype(f32)
    umask3 = ((col3 == row3 + 1) & (row3 % 2 == 0)).astype(f32)
    r1 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    even_rows = (r1 % 2 == 0)  # (n, 1) broadcasts over (n, G)

    # reseat masks: new[i] = old[σ(i)] with σ(0)=0, σ(2)=1, σ(n−1)=n−2,
    # σ(odd i<n−1)=i+2, σ(even i≥4)=i−2  (fixed round-robin rotation)
    sel_keep = (r1 == 0)[:, :, None]  # (n, 1, 1)
    sel_p1 = ((r1 == 2) | (r1 == n - 1))[:, :, None]
    sel_m2 = ((r1 % 2 == 1) & (r1 < n - 1))[:, :, None]

    def reseat(x, axis):
        if axis == 1:
            k, p1, m2 = sel_keep.transpose(1, 0, 2), sel_p1.transpose(1, 0, 2), sel_m2.transpose(1, 0, 2)
        else:
            k, p1, m2 = sel_keep, sel_p1, sel_m2
        return jnp.where(
            k,
            x,
            jnp.where(
                p1,
                jnp.roll(x, 1, axis=axis),
                jnp.where(m2, jnp.roll(x, -2, axis=axis), jnp.roll(x, 2, axis=axis)),
            ),
        )

    def pairfull(x):
        # value stored at even row → broadcast to both rows of the pair
        x = jnp.where(even_rows, x, 0.0)
        return x + jnp.roll(x, 1, axis=0)

    def round_body(_, carry):
        Br, Bi, Wr, Wi = carry
        # ---- pair quantities (per pair, stored at even rows): (n, G) ----
        d = jnp.sum(Br * eye3, axis=1)
        br = jnp.sum(Br * umask3, axis=1)
        bi = jnp.sum(Bi * umask3, axis=1)
        # |b| via scaled hypot: naive br²+bi² underflows to f32 denormals
        # for |b| ≲ 1e-19, making |u| = |b/|b|| ≠ 1 — a NON-unitary
        # "rotation" that corrupts V (measured: orth err 1e-2/round).
        m = jnp.maximum(jnp.abs(br), jnp.abs(bi))
        c_next = jnp.roll(d, -1, axis=0)
        # skip pairs whose off-diagonal is at rounding level: the induced
        # eigenvalue change is O(b²/(c−a)) < ε², and post-convergence
        # rounds then become exact no-ops
        nz = m > jnp.finfo(f32).eps * 0.03125 * (jnp.abs(d) + jnp.abs(c_next))
        msafe = jnp.where(nz, m, 1.0)
        x, y = br / msafe, bi / msafe  # in [-1, 1], no underflow
        hyp = jnp.sqrt(x * x + y * y)
        hsafe = jnp.where(nz, hyp, 1.0)
        absb = m * hyp
        ur = jnp.where(nz, x / hsafe, 1.0)  # u = b/|b| (phase)
        ui = jnp.where(nz, y / hsafe, 0.0)
        # first-order renormalization: hardware div/sqrt approximations
        # can leave |u| = 1 ± O(1e-6); a non-unit phase makes J
        # non-unitary and the error COMPOUNDS over sweeps·(n−1) rounds
        # (the hardware-vs-interpret physics gap, BASELINE.md round-3
        # gate).  One Newton step costs 4 VPU ops and squares the error.
        su = 1.5 - 0.5 * (ur * ur + ui * ui)
        ur, ui = ur * su, ui * su
        safe = jnp.where(nz, absb, 1.0)
        tau = (c_next - d) / (2.0 * safe)
        # t = sign(τ)/(|τ|+√(1+τ²)); τ→±inf ⇒ t→0 (identity rotation)
        t = jnp.where(tau >= 0, 1.0, -1.0) / (
            jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau)
        )
        t = jnp.where(nz, t, 0.0)
        one_t2 = 1.0 + t * t
        cs = jax.lax.rsqrt(one_t2)
        # Newton-refine rsqrt (TPU VPU rsqrt is an approximation):
        # r ← r·(1.5 − 0.5·x·r²) squares the relative error
        cs = cs * (1.5 - 0.5 * one_t2 * cs * cs)
        sn = t * cs
        CS, SN = pairfull(cs), pairfull(sn)
        UR, UI = pairfull(ur), pairfull(ui)

        # ---- B ← J† B J; J[2i,2i]=u·cs, J[2i,2i+1]=u·sn,
        #      J[2i+1,2i]=−sn, J[2i+1,2i+1]=cs ----
        ev = even_rows[:, :, None]  # (n, 1, 1) over rows
        CSr, SNr = CS[:, None, :], SN[:, None, :]
        URr, UIr = UR[:, None, :], UI[:, None, :]
        Bup_r, Bup_i = jnp.roll(Br, -1, axis=0), jnp.roll(Bi, -1, axis=0)
        Bdn_r, Bdn_i = jnp.roll(Br, 1, axis=0), jnp.roll(Bi, 1, axis=0)
        # even row i: conj(u)·cs·B[i] − sn·B[i+1]
        # odd  row i: conj(u)·sn·B[i−1] + cs·B[i]
        nr = jnp.where(
            ev,
            (URr * Br + UIr * Bi) * CSr - SNr * Bup_r,
            (URr * Bdn_r + UIr * Bdn_i) * SNr + CSr * Br,
        )
        ni = jnp.where(
            ev,
            (URr * Bi - UIr * Br) * CSr - SNr * Bup_i,
            (URr * Bdn_i - UIr * Bdn_r) * SNr + CSr * Bi,
        )
        Br, Bi = nr, ni

        evc = even_rows[None, :, :]  # (1, n, 1) over columns
        CSc, SNc = CS[None, :, :], SN[None, :, :]
        URc, UIc = UR[None, :, :], UI[None, :, :]

        def colup(Xr, Xi):
            # even col j: u·cs·X[:,j] − sn·X[:,j+1]
            # odd  col j: u·sn·X[:,j−1] + cs·X[:,j]
            Xup_r, Xup_i = jnp.roll(Xr, -1, axis=1), jnp.roll(Xi, -1, axis=1)
            Xdn_r, Xdn_i = jnp.roll(Xr, 1, axis=1), jnp.roll(Xi, 1, axis=1)
            yr = jnp.where(
                evc,
                (URc * Xr - UIc * Xi) * CSc - SNc * Xup_r,
                (URc * Xdn_r - UIc * Xdn_i) * SNc + CSc * Xr,
            )
            yi = jnp.where(
                evc,
                (URc * Xi + UIc * Xr) * CSc - SNc * Xup_i,
                (URc * Xdn_i + UIc * Xdn_r) * SNc + CSc * Xi,
            )
            return yr, yi

        Br, Bi = colup(Br, Bi)
        Wr, Wi = colup(Wr, Wi)

        # ---- reseat rows+cols of B, cols of W ----
        Br = reseat(reseat(Br, 0), 1)
        Bi = reseat(reseat(Bi, 0), 1)
        Wr, Wi = reseat(Wr, 1), reseat(Wi, 1)
        return Br, Bi, Wr, Wi

    Br, Bi = br_ref[:], bi_ref[:]
    Wr = jnp.zeros((n, n, G), f32) + eye3
    Wi = jnp.zeros((n, n, G), f32)
    Br, Bi, Wr, Wi = jax.lax.fori_loop(
        0, sweeps * (n - 1), round_body, (Br, Bi, Wr, Wi)
    )
    w_ref[:] = jnp.sum(Br * eye3, axis=1)
    vr_ref[:] = Wr
    vi_ref[:] = Wi


@functools.partial(
    jax.jit, static_argnames=("sweeps", "block", "interpret", "polish")
)
def jacobi_eigh(
    h: jax.Array,
    sweeps: int | None = None,
    block: int | None = None,
    interpret: bool | None = None,
    polish: bool = True,
):
    """Batched hermitian eigendecomposition as ONE Pallas TPU kernel.

    ``h``: [B, n, n] complex64/complex128 hermitian batch (n even; odd n
    falls back to ``jnp.linalg.eigh``).  Returns ``(w, v)`` with ``w``
    [B, n] real ascending and ``v`` [B, n, n] unitary (columns are
    eigenvectors), matching ``jnp.linalg.eigh`` conventions — drop-in for
    the simple-update environment roots and Gram-split truncation
    (`utils.jl:18-26`, `simple_update.jl:46-53` semantics).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        # Pallas has no CPU backend; interpret mode keeps CPU tests honest
        interpret = jax.default_backend() != "tpu"

    Bsz, n, _ = h.shape
    # VMEM budget: the round body keeps ~21 [n, n, G] f32 planes live
    # (measured: 17.12 MB at n=40, G=128), and G < 128 saves nothing (the
    # lane dim pads to 128) — so G is always 128 and large n falls back.
    if n % 2 == 1 or n < 4 or n > 88 or Bsz == 0:
        return jnp.linalg.eigh(h)
    if sweeps is None:
        sweeps = default_sweeps(n)
    if block is None:
        block = 128

    lay = _lay0(n)
    inv = np.argsort(lay).astype(np.int32)
    hp = h[:, lay][:, :, lay]  # initial adjacent-pair basis
    br = jnp.real(hp).astype(jnp.float32)
    bi = jnp.imag(hp).astype(jnp.float32)
    # batch → lane dimension, padded to a multiple of the block
    pad = (-Bsz) % block
    br = jnp.pad(br, ((0, pad), (0, 0), (0, 0))).transpose(1, 2, 0)
    bi = jnp.pad(bi, ((0, pad), (0, 0), (0, 0))).transpose(1, 2, 0)
    Bp = Bsz + pad

    spec2 = pl.BlockSpec((n, block), lambda i: (0, i))
    spec3 = pl.BlockSpec((n, n, block), lambda i: (0, 0, i))
    w, vr, vi = pl.pallas_call(
        functools.partial(_eigh_kernel, n=n, sweeps=sweeps),
        grid=(Bp // block,),
        in_specs=[spec3, spec3],
        out_specs=[spec2, spec3, spec3],
        out_shape=[
            jax.ShapeDtypeStruct((n, Bp), jnp.float32),
            jax.ShapeDtypeStruct((n, n, Bp), jnp.float32),
            jax.ShapeDtypeStruct((n, n, Bp), jnp.float32),
        ],
        # ~21 live planes × n²·128·4 B exceeds the 16 MB default scoped
        # limit for n ≥ 40; v5e has 128 MB VMEM per core
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(br, bi)

    w = w.transpose(1, 0)[:Bsz]  # [B, n] (diagonal in layout order)
    v = (vr + 1j * vi).astype(h.dtype).transpose(2, 0, 1)[:Bsz]
    # V = Lᵀ W (undo the initial row permutation), then sort ascending
    v = v[:, inv, :]
    if polish:
        # Two-pass compensation (BASELINE.md round-3 gate: the raw
        # kernel's hardware drift is (3e-4, 1e-3] per 10 layers, ~100×
        # the default path).  The in-kernel f32/VPU rounding shows up as
        # (a) V drifting from unitarity and (b) absolute eigenvalue
        # error — which `_pseudo_roots`' 1/√w amplifies ~100× near its
        # cutoff.  One Newton–Schulz step pulls V to the nearest unitary
        # (error squared), then a Rayleigh quotient re-extracts w from
        # the ORIGINAL matrix through the polished V (second-order in
        # the residual subspace mixing).  Three batched f32 matmuls on
        # the MXU — negligible next to the kernel's VPU rounds.
        prec = jax.lax.Precision.HIGHEST
        vh = jnp.conj(jnp.swapaxes(v, -1, -2))
        g = jnp.matmul(vh, v, precision=prec)
        eye = jnp.eye(n, dtype=v.dtype)
        v = jnp.matmul(v, 1.5 * eye - 0.5 * g, precision=prec)
        hv = jnp.matmul(h, v, precision=prec)
        w = jnp.real(jnp.einsum("bji,bji->bi", jnp.conj(v), hv, precision=prec)).astype(
            jnp.float32
        )
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    v = jnp.take_along_axis(v, order[:, None, :], axis=-1)
    return w, v
