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


def _jacobi_rounds(Br, Bi, *, n, sweeps):
    """The parallel-ordered cyclic Jacobi sweep loop on [n, n, G] re/im
    planes.  Shared by the eigh kernel and the fused pseudo-roots kernel;
    returns ``(Br, Bi, Wr, Wi)`` with B diagonalized and W the accumulated
    rotations (eigenvectors as columns, in the adjacent-pair layout)."""
    f32 = jnp.float32
    G = Br.shape[-1]
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

    Wr = jnp.zeros((n, n, G), f32) + eye3
    Wi = jnp.zeros((n, n, G), f32)
    return jax.lax.fori_loop(
        0, sweeps * (n - 1), round_body, (Br, Bi, Wr, Wi)
    )


def _eigh_kernel(br_ref, bi_ref, w_ref, vr_ref, vi_ref, *, n, sweeps):
    Br, Bi, Wr, Wi = _jacobi_rounds(br_ref[:], bi_ref[:], n=n, sweeps=sweeps)
    row3 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    col3 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    eye3 = (row3 == col3).astype(jnp.float32)
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


# ---------------------------------------------------------------------------
# fused pseudo-roots kernel: eigh → polish → cutoff-clipped √M, 1/√M
# ---------------------------------------------------------------------------
#
# The simple-update environment stage (`engine._pseudo_roots`,
# `utils.jl:18-26` semantics) is eigh + eigenvalue clip + FOUR dense
# reconstructions (U·√w·U†, U·w^{-1/2}·U†) plus, on the Jacobi path, the
# two-pass polish (3 matmuls) and an argsort — ~15 XLA kernel launches
# after the eigh kernel returns, each paying launch latency and an HBM
# round-trip of the [B, n, n] batch.  At χ ≤ 24 the whole layer is
# launch-bound (BASELINE.md: 0.10 ms/layer with eigh fused, the rest
# XLA), so this kernel keeps EVERYTHING in VMEM: Jacobi rounds, in-kernel
# Newton–Schulz unitarity polish, Rayleigh eigenvalue re-extraction from
# the original matrix, cutoff clip, and both root reconstructions — one
# Mosaic launch, two [B, n, n] outputs.  Eigenvalue ordering is skipped
# entirely (roots are basis-function reconstructions, sort-invariant).
#
# The matmul-shaped steps run as n-step unrolled outer-product
# accumulations on [n, n, G] planes (the lane-batched layout cannot feed
# the MXU); at n ≤ 24 that is ~6·n plane passes ≈ 25% of the Jacobi
# rounds' traffic — cheap next to the ~15 launches it removes.  VERDICT
# round-2 item 3 scoping note: fusing the FULL simple update (QR at
# M = χ³ rows, theta SVD at n = 4χd) into the kernel was analyzed and
# rejected — those stages are VPU-bandwidth-bound in this layout (the
# n = 40 eigh A/B in BASELINE.md measured 4× slower than the whole
# default layer), while XLA runs them on the MXU.


def _cmm_planes(ar, ai, br, bi, n, mode):
    """Complex matmul on [n, n, G] planes via n unrolled outer products.

    mode "NN": C = A·B (contract A's col k with B's row k)
    mode "hN": C = A†·B (contract rows i; C[k,l] = Σ_i conj(A[i,k]) B[i,l])
    """
    cr = jnp.zeros_like(ar)
    ci = jnp.zeros_like(ai)
    for k in range(n):
        if mode == "NN":
            xr, xi = ar[:, k][:, None, :], ai[:, k][:, None, :]
            yr, yi = br[k][None, :, :], bi[k][None, :, :]
        else:  # "hN": conj(A) row i becomes the output-row index
            xr, xi = ar[k][:, None, :], -ai[k][:, None, :]
            yr, yi = br[k][None, :, :], bi[k][None, :, :]
        cr = cr + xr * yr - xi * yi
        ci = ci + xr * yi + xi * yr
    return cr, ci


def _roots_kernel(
    br_ref, bi_ref, rr_ref, ri_ref, sr_ref, si_ref, *, n, sweeps, polish
):
    f32 = jnp.float32
    Ar, Ai = br_ref[:], bi_ref[:]
    Br, Bi, Wr, Wi = _jacobi_rounds(Ar, Ai, n=n, sweeps=sweeps)
    row3 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    col3 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    eye3 = (row3 == col3).astype(f32)
    w = jnp.sum(Br * eye3, axis=1)  # [n, G] (layout order — never sorted)

    if polish:
        # Newton–Schulz: W ← W·(1.5·I − 0.5·W†W), TWICE — each pass
        # squares the unitarity error, so two passes drive the kernel's
        # ~1e-6 rotation drift to rounding level.  The hardware physics
        # ladder measured the single-pass path at (3e-5, 1e-4] per 10
        # layers vs the ≤3e-5 promotion bar (BASELINE.md round 3); the
        # second pass costs 2 more n-step plane matmuls (~2% kernel time)
        for _ in range(2):
            gr, gi = _cmm_planes(Wr, Wi, Wr, Wi, n, "hN")
            mr = 1.5 * eye3 - 0.5 * gr
            mi = -0.5 * gi
            Wr, Wi = _cmm_planes(Wr, Wi, mr, mi, n, "NN")
        # Rayleigh re-extraction from the ORIGINAL (permuted-basis) matrix:
        # w[k] = Re Σ_i conj(W[i,k]) (A·W)[i,k]
        awr, awi = _cmm_planes(Ar, Ai, Wr, Wi, n, "NN")
        w = jnp.sum(Wr * awr + Wi * awi, axis=0)  # [n, G]

    # cutoff clip (`utils.jl:18-26`; identical to engine._pseudo_roots)
    eps = jnp.finfo(f32).eps
    wmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    good = w > 10.0 * eps * jnp.maximum(wmax, eps)
    safe = jnp.where(good, w, 1.0)
    sqw = jnp.where(good, jnp.sqrt(safe), 0.0)
    isqw = jnp.where(good, 1.0 / jnp.sqrt(safe), 0.0)

    # root = Σ_k f(w_k) · W[:,k] ⊗ conj(W[:,k])  (both roots in one pass)
    rr = jnp.zeros((n, n) + Ar.shape[2:], f32)
    ri = jnp.zeros_like(rr)
    sr = jnp.zeros_like(rr)
    si = jnp.zeros_like(rr)
    for k in range(n):
        cr_, ci_ = Wr[:, k], Wi[:, k]  # [n, G]
        pr = cr_[:, None, :] * cr_[None, :, :] + ci_[:, None, :] * ci_[None, :, :]
        pi = ci_[:, None, :] * cr_[None, :, :] - cr_[:, None, :] * ci_[None, :, :]
        fk = sqw[k][None, None, :]
        gk = isqw[k][None, None, :]
        rr = rr + fk * pr
        ri = ri + fk * pi
        sr = sr + gk * pr
        si = si + gk * pi
    rr_ref[:] = rr
    ri_ref[:] = ri
    sr_ref[:] = sr
    si_ref[:] = si


def roots_kernel_supported(n: int, batch: int) -> bool:
    """Shape gate for the fused kernel (even n; unroll- and VMEM-bounded)."""
    return n % 2 == 0 and 4 <= n <= 40 and batch > 0


@functools.partial(
    jax.jit, static_argnames=("sweeps", "block", "interpret", "polish")
)
def jacobi_pseudo_roots(
    h: jax.Array,
    sweeps: int | None = None,
    block: int | None = None,
    interpret: bool | None = None,
    polish: bool = True,
):
    """(√M, 1/√M) of a hermitian PSD batch as ONE Pallas TPU kernel.

    ``h``: [B, n, n] complex64 hermitian batch.  Returns ``(root,
    inv_root)`` with eigenvalues ≤ 10·ε·λmax zeroed in both — drop-in for
    the batched environment pseudo-roots (`engine._pseudo_roots`,
    reference `utils.jl:18-26`).  Callers gate on
    ``roots_kernel_supported`` and fall back to the XLA path otherwise.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    Bsz, n, _ = h.shape
    assert roots_kernel_supported(n, Bsz)
    if sweeps is None:
        sweeps = default_sweeps(n)
    if block is None:
        block = 128

    lay = _lay0(n)
    inv = np.argsort(lay).astype(np.int32)
    hp = h[:, lay][:, :, lay]  # adjacent-pair basis
    br = jnp.real(hp).astype(jnp.float32)
    bi = jnp.imag(hp).astype(jnp.float32)
    pad = (-Bsz) % block
    br = jnp.pad(br, ((0, pad), (0, 0), (0, 0))).transpose(1, 2, 0)
    bi = jnp.pad(bi, ((0, pad), (0, 0), (0, 0))).transpose(1, 2, 0)
    Bp = Bsz + pad

    spec3 = pl.BlockSpec((n, n, block), lambda i: (0, 0, i))
    rr, ri, sr, si = pl.pallas_call(
        functools.partial(_roots_kernel, n=n, sweeps=sweeps, polish=polish),
        grid=(Bp // block,),
        in_specs=[spec3, spec3],
        out_specs=[spec3, spec3, spec3, spec3],
        out_shape=[
            jax.ShapeDtypeStruct((n, n, Bp), jnp.float32) for _ in range(4)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(br, bi)

    def unpack(xr, xi):
        m = (xr + 1j * xi).astype(h.dtype).transpose(2, 0, 1)[:Bsz]
        return m[:, inv][:, :, inv]  # undo the layout permutation

    return unpack(rr, ri), unpack(sr, si)
