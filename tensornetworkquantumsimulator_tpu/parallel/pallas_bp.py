"""Pallas fused BP outgoing-messages kernel for degree-3 states (χ≥64).

At χ=64 the flooding-BP iteration is HBM-BANDWIDTH-bound, not MXU-bound:
each vertex tensor is χ³d·8 B ≈ 4.2 MB (532 MB for Eagle-127), and the
XLA lowering of `engine._outgoing_messages` materializes ~5 absorb
intermediates of that size in HBM plus re-reads for the 3 outgoing
contractions — ~10 full-state round-trips per BP iteration (measured
10-20 ms/iteration on hardware against a ~0.7 ms roofline;
`scripts/chi64_anatomy.py`).  This kernel computes ALL D=3 outgoing
messages of a vertex in ONE grid step with the tensor VMEM-resident:
HBM traffic drops to read-t-once + write-m_out (~1× state size).

Formulation (straight-line MXU matmuls; three in-VMEM leading-dim
transposes; no gathers, no fori loops — a first version with per-row
fori matmuls was latency-bound):
  layout   t[v] as X [A, B, M], lanes M = l·d + s (natural flattening
           of the last two axes — no XLA-side transpose); X' = Xᵀ on
           the leading pair [B, A, M]
  ×_a      P  = m0ᵀ·X(flat [A, B·M]);  P' = Pᵀ [B, A', M]
  ×_l      ·K2 on the lanes, K2 = m2 ⊗ I_d (the s axis rides inside
           the lanes): C' = X'(flat [B·A, M])·K2
  ×_b      m1ᵀ·(· flat [B, A·M]) in the transposed layout
  m_out[0] = G0 ⋅ conj(X)  over (b, ls)   ([A,BM]  @ [BM,A'])
  m_out[1] = G1' ⋅ conj(X') over (a, ls)  ([B,AM]  @ [AM,B'])
  m_out[2] = Π_s P_sᵀ·(G2' ⋅ conj(X') over (b, a))·P_s — the [M,M']
             cross-lane product collapsed to [χ,χ] by parity
             projectors P_s[m,l] = δ_{m,l·d+s} built from 2-D iota
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


def bp_kernel_supported(degree: int, chi: int, d: int, dtype) -> bool:
    return (
        degree == 3
        and jnp.dtype(dtype) == jnp.dtype(jnp.complex64)
        and (chi * d) % 128 == 0
        and chi % 8 == 0
    )


def _kernel(A: int, BD: int, M: int, d: int):
    """Per-vertex kernel body.  A = χ (slot-0 leg), BD = χ (slot-1 leg),
    M = χ·d lanes (slot-2 leg merged with the physical index)."""
    chi = A

    def body(
        tr_ref, ti_ref,      # [1, A, BD, M] tensor planes
        m0r_ref, m0i_ref,    # [1, chi, chi]
        m1r_ref, m1i_ref,
        k2r_ref, k2i_ref,    # [1, M, M] = kron(m2, I_d)
        o0r_ref, o0i_ref,    # [1, chi, chi] outgoing per slot
        o1r_ref, o1i_ref,
        o2r_ref, o2i_ref,
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

        ttr = jnp.transpose(tr, (1, 0, 2))  # X' [BD, A, M]
        tti = jnp.transpose(ti, (1, 0, 2))

        # P = t ×_a m0 (flat [A, B·M]); keep the transposed copy too
        pr, pi = cdot(
            m0r, m0i, tr.reshape(A, BD * M), ti.reshape(A, BD * M),
            ((0,), (0,)),
        )  # [A', B·M]
        ptr = jnp.transpose(pr.reshape(A, BD, M), (1, 0, 2))  # P' [BD, A', M]
        pti = jnp.transpose(pi.reshape(A, BD, M), (1, 0, 2))

        # C' = t ×_l m2 in the transposed layout: [B·A, M] @ K2
        ccr, cci = cdot(
            ttr.reshape(BD * A, M), tti.reshape(BD * A, M), k2r, k2i,
            ((1,), (0,)),
        )
        # G0' = C' ×_b m1 : m1ᵀ @ C'(flat [B, A·M]) → [B', A·M]
        g0r, g0i = cdot(
            m1r, m1i, ccr.reshape(BD, A * M), cci.reshape(BD, A * M),
            ((0,), (0,)),
        )
        # back to [A, B', M] for the slot-0 contraction
        g0r = jnp.transpose(g0r.reshape(BD, A, M), (1, 0, 2)).reshape(A, BD * M)
        g0i = jnp.transpose(g0i.reshape(BD, A, M), (1, 0, 2)).reshape(A, BD * M)
        # m_out[0] = G0 ⋅ conj(t) over (b, ls)
        o0r, o0i = cdot(
            g0r, g0i, tr.reshape(A, BD * M), -ti.reshape(A, BD * M),
            ((1,), (1,)),
        )
        o0r_ref[0] = o0r
        o0i_ref[0] = o0i

        # G1' = P' ×_l m2 : [B·A, M] @ K2 ; m_out[1] over (a, ls)
        g1r, g1i = cdot(
            ptr.reshape(BD * A, M), pti.reshape(BD * A, M), k2r, k2i,
            ((1,), (0,)),
        )
        o1r, o1i = cdot(
            g1r.reshape(BD, A * M), g1i.reshape(BD, A * M),
            ttr.reshape(BD, A * M), -tti.reshape(BD, A * M),
            ((1,), (1,)),
        )
        o1r_ref[0] = o1r
        o1i_ref[0] = o1i

        # G2' = P' ×_b m1 : m1ᵀ @ P'(flat [B, A·M]) → [B', A'·M];
        # O = G2' ⋅ conj(t') over rows (b, a) → [M, M']
        g2r, g2i = cdot(
            m1r, m1i, ptr.reshape(BD, A * M), pti.reshape(BD, A * M),
            ((0,), (0,)),
        )
        Or, Oi = cdot(
            g2r.reshape(BD * A, M), g2i.reshape(BD * A, M),
            ttr.reshape(BD * A, M), -tti.reshape(BD * A, M),
            ((0,), (0,)),
        )
        # parity projectors P_s [M, chi]: P_s[m, l] = (m == l*d + s)
        rows = jax.lax.broadcasted_iota(jnp.int32, (M, chi), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (M, chi), 1)
        o2r = jnp.zeros((chi, chi), f32)
        o2i = jnp.zeros((chi, chi), f32)
        for s in range(d):
            ps = (rows == cols * d + s).astype(f32)
            o2r = o2r + dot(ps, dot(Or, ps, ((1,), (0,))), ((0,), (0,)))
            o2i = o2i + dot(ps, dot(Oi, ps, ((1,), (0,))), ((0,), (0,)))
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
    outs = pl.pallas_call(
        _kernel(A, BD, M, d),
        grid=(V,),
        in_specs=[spec_t, spec_t, spec_m, spec_m, spec_m, spec_m,
                  spec_k, spec_k],
        out_specs=[spec_m] * 6,
        out_shape=[jax.ShapeDtypeStruct((V, chi, chi), f32)] * 6,
        interpret=interpret,
    )(tr, ti, m0r, m0i, m1r, m1i, k2r, k2i)
    o0r, o0i, o1r, o1i, o2r, o2i = outs
    out = jnp.stack(
        [o0r + 1j * o0i, o1r + 1j * o1i, o2r + 1j * o2i], axis=1
    )
    return out.astype(t.dtype)
