"""Pallas fused BP outgoing-messages kernel for degree-3 states (χ≥64).

At χ=64 the flooding-BP iteration is HBM-BANDWIDTH-bound, not MXU-bound:
each vertex tensor is χ³d·8 B ≈ 4.2 MB (532 MB for Eagle-127), and the
XLA lowering of `engine._outgoing_messages` materializes ~5 absorb
intermediates of that size in HBM plus re-reads for the 3 outgoing
contractions — ~10 full-state round-trips per BP iteration (measured
10-20 ms/iteration on hardware against a 0.7 ms roofline;
`scripts/chi64_anatomy.py`).  This kernel computes ALL D=3 outgoing
messages of a vertex in ONE grid step with the tensor VMEM-resident:
HBM traffic drops to read-t-once + write-m_out (~1× state size).

Formulation (all MXU matmuls, no gathers, no in-kernel transposes):
  layout        t[v] as X [A, B, M] with lanes M = l·d + s (the natural
                flattening of the last two axes — no XLA-side transpose)
  ×_a absorb    P = m0ᵀ·X(flat [A, B·M])            (1 matmul)
  ×_l absorb    C = X(flat [A·B, M])·K2, K2 = m2 ⊗ I_d  (1 matmul;
                the s axis rides along inside the lanes)
  ×_b absorb    per-a row-matmuls m1ᵀ·Y[a]          (fori over A)
  m_out[0]      = G0 ⋅ conj(X) over (b, ls)          ([A,BM]@[BM,A'])
  m_out[1]      = Σ_a G1[a] ⋅ conj(X)[a] over lanes  (fori over A)
  m_out[2]      = Π_s P_sᵀ·(G2 ⋅ conj(X) over (a,b))·P_s — the [M,M']
                 cross-lane product collapsed to [χ,χ] by the parity
                 projectors P_s[m,l] = δ_{m,l·d+s} (built from iota)
Complex arithmetic runs on re/im f32 planes (Mosaic rejects complex64),
4-matmul form, accumulating in f32.

Semantics match `engine._outgoing_messages` (the batched form of
`abstractbeliefpropagationcache.jl:144-177`): the slot-j leg of the
accumulated tensor stays unabsorbed, everything else absorbs its
incoming message.  Masked/dummy slots are repaired downstream by
`_normalize_messages` exactly as for the XLA path.

Gate: D == 3, complex64, χ·d a multiple of 128 (full lanes), χ a
multiple of 8 (full sublanes) — i.e. the χ=64, d=2 bench regime and up.
`TNQS_BP_KERNEL=1` routes `engine._outgoing_messages` here on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def bp_kernel_supported(degree: int, chi: int, d: int, dtype) -> bool:
    return (
        degree == 3
        and jnp.dtype(dtype) == jnp.dtype(jnp.complex64)
        and (chi * d) % 128 == 0
        and chi % 8 == 0
    )


def _kernel(A: int, BD: int, M: int, d: int):
    """Build the per-vertex kernel body.  A = χ rows, BD = χ (second
    leg), M = χ·d lanes."""
    chi = A

    def body(
        tr_ref, ti_ref,      # [1, A, BD, M] tensor planes
        m0r_ref, m0i_ref,    # [1, chi, chi]
        m1r_ref, m1i_ref,
        k2r_ref, k2i_ref,    # [1, M, M] = kron(m2, I_d)
        o0r_ref, o0i_ref,    # [1, chi, chi] outgoing per slot
        o1r_ref, o1i_ref,
        o2r_ref, o2i_ref,
        pr_ref, pi_ref,      # scratch [A, BD, M]: P = t ×_a m0
        cr_ref, ci_ref,      # scratch [A, BD, M]: C = t ×_l m2
        gr_ref, gi_ref,      # scratch [A, BD, M]: G (reused)
    ):
        f32 = jnp.float32

        def dot(a, b, dn):
            # dn = ((lhs_contract,), (rhs_contract,)); no batch dims
            return jax.lax.dot_general(
                a, b, dimension_numbers=(dn, ((), ())),
                preferred_element_type=f32,
            )

        def cdot(ar, ai, br, bi, dn):
            return (
                dot(ar, br, dn) - dot(ai, bi, dn),
                dot(ar, bi, dn) + dot(ai, br, dn),
            )

        tr = tr_ref[0]  # [A, BD, M]
        ti = ti_ref[0]
        m0r, m0i = m0r_ref[0], m0i_ref[0]
        m1r, m1i = m1r_ref[0], m1i_ref[0]
        k2r, k2i = k2r_ref[0], k2i_ref[0]

        x_r = tr.reshape(A, BD * M)
        x_i = ti.reshape(A, BD * M)
        # P = t ×_a m0 : Σ_a m0[a, a'] t[a, ...] — contract dim0 × dim0
        pr, pi = cdot(m0r, m0i, x_r, x_i, ((0,), (0,)))
        pr_ref[...] = pr.reshape(A, BD, M)
        pi_ref[...] = pi.reshape(A, BD, M)
        # C = t ×_l m2 : flat [A·B, M] @ K2 [M, M]
        cr, ci = cdot(
            tr.reshape(A * BD, M), ti.reshape(A * BD, M), k2r, k2i,
            ((1,), (0,)),
        )
        cr_ref[...] = cr.reshape(A, BD, M)
        ci_ref[...] = ci.reshape(A, BD, M)

        # G0 = C ×_b m1 (per-a row matmuls), then
        # m_out[0] = G0 ⋅ conj(t) over (b, ls)
        def bstep_c(a, _):
            yr, yi = cr_ref[a], ci_ref[a]  # [BD, M]
            zr, zi = cdot(m1r, m1i, yr, yi, ((0,), (0,)))
            gr_ref[a] = zr
            gi_ref[a] = zi
            return _

        jax.lax.fori_loop(0, A, bstep_c, 0, unroll=False)
        g0r = gr_ref[...].reshape(A, BD * M)
        g0i = gi_ref[...].reshape(A, BD * M)
        # conj(t): (x_r, -x_i)
        o0r, o0i = cdot(g0r, g0i, x_r, -x_i, ((1,), (1,)))
        o0r_ref[0] = o0r
        o0i_ref[0] = o0i

        # G1 = P ×_l m2 = P_flat @ K2 ; m_out[1] = Σ_a G1[a] ⋅ conj(t)[a]
        g1r, g1i = cdot(
            pr_ref[...].reshape(A * BD, M), pi_ref[...].reshape(A * BD, M),
            k2r, k2i, ((1,), (0,)),
        )
        gr_ref[...] = g1r.reshape(A, BD, M)
        gi_ref[...] = g1i.reshape(A, BD, M)

        def astep(a, acc):
            accr, acci = acc
            yr, yi = gr_ref[a], gi_ref[a]          # [BD, M]
            wr, wi = tr_ref[0, a], -ti_ref[0, a]   # conj
            rr, ri = cdot(yr, yi, wr, wi, ((1,), (1,)))
            return (accr + rr, acci + ri)

        o1r, o1i = jax.lax.fori_loop(
            0, A, astep,
            (jnp.zeros((BD, BD), f32), jnp.zeros((BD, BD), f32)),
            unroll=False,
        )
        o1r_ref[0] = o1r
        o1i_ref[0] = o1i

        # G2 = P ×_b m1 ; O = G2 ⋅ conj(t) over (a, b) → [M, M'];
        # m_out[2] = Σ_s P_sᵀ O P_s
        def bstep_p(a, _):
            yr, yi = pr_ref[a], pi_ref[a]
            zr, zi = cdot(m1r, m1i, yr, yi, ((0,), (0,)))
            gr_ref[a] = zr
            gi_ref[a] = zi
            return _

        jax.lax.fori_loop(0, A, bstep_p, 0, unroll=False)
        g2r = gr_ref[...].reshape(A * BD, M)
        g2i = gi_ref[...].reshape(A * BD, M)
        Or, Oi = cdot(
            g2r, g2i, tr.reshape(A * BD, M), -ti.reshape(A * BD, M),
            ((0,), (0,)),
        )  # [M, M']
        # parity projectors P_s [M, chi]: P_s[m, l] = (m == l*d + s)
        rows = jax.lax.broadcasted_iota(jnp.int32, (M, chi), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (M, chi), 1)
        o2r = jnp.zeros((chi, chi), f32)
        o2i = jnp.zeros((chi, chi), f32)
        for s in range(d):
            ps = (rows == cols * d + s).astype(f32)
            dn_t = ((0,), (0,))
            o2r = o2r + dot(ps, dot(Or, ps, ((1,), (0,))), dn_t)
            o2i = o2i + dot(ps, dot(Oi, ps, ((1,), (0,))), dn_t)
        o2r_ref[0] = o2r
        o2i_ref[0] = o2i

    return body


@functools.partial(jax.jit, static_argnames=("interpret",))
def bp_outgoing_d3(t: jax.Array, messages: jax.Array,
                   interpret: bool | None = None) -> jax.Array:
    """All outgoing messages of a degree-3 batched state in one fused
    kernel.  ``t`` [V, χ, χ, χ, d] complex64, ``messages`` [V, 3, χ, χ]
    → m_out [V, 3, χ, χ] (un-normalized; caller hermitizes/masks)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    V, A, BD, L, d = t.shape
    chi = A
    M = L * d
    f32 = jnp.float32

    tm = t.reshape(V, A, BD, M)
    tr = jnp.real(tm).astype(f32)
    ti = jnp.imag(tm).astype(f32)
    m0 = messages[:, 0]
    m1 = messages[:, 1]
    m2 = messages[:, 2]
    eye_d = jnp.eye(d, dtype=m2.dtype)
    # K2[l·d+s, L·d+s'] = m2[l, L]·δ_ss'  (kron(m2, I_d) per vertex)
    k2 = jnp.einsum("vlk,sz->vlskz", m2, eye_d).reshape(V, M, M)

    def planes(x):
        return jnp.real(x).astype(f32), jnp.imag(x).astype(f32)

    m0r, m0i = planes(m0)
    m1r, m1i = planes(m1)
    k2r, k2i = planes(k2)

    spec_t = pl.BlockSpec((1, A, BD, M), lambda i: (i, 0, 0, 0))
    spec_m = pl.BlockSpec((1, chi, chi), lambda i: (i, 0, 0))
    spec_k = pl.BlockSpec((1, M, M), lambda i: (i, 0, 0))
    out_specs = [spec_m] * 6
    outs = pl.pallas_call(
        _kernel(A, BD, M, d),
        grid=(V,),
        in_specs=[spec_t, spec_t, spec_m, spec_m, spec_m, spec_m,
                  spec_k, spec_k],
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((V, chi, chi), f32)] * 6,
        scratch_shapes=[pltpu.VMEM((A, BD, M), f32) for _ in range(6)],
        interpret=interpret,
    )(tr, ti, m0r, m0i, m1r, m1i, k2r, k2i)
    o0r, o0i, o1r, o1i, o2r, o2i = outs
    out = jnp.stack(
        [o0r + 1j * o0i, o1r + 1j * o1i, o2r + 1j * o2i], axis=1
    )
    return out.astype(t.dtype)
