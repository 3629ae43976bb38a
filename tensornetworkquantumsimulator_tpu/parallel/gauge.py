"""Symmetric (Vidal) gauge on the batched TPU engine.

Batched counterpart of `src/symmetric_gauge.jl:1-56` (generic version:
`gauge.py`): at the BP fixed point, per edge

    X = m_e,  Y = m_ē          (messages as χ×χ bond matrices)
    C = √X · √Yᵀ = U s V†
    A_u = X^{-1/2} U √s,   A_v = Y^{-1/2} V̄ √s

absorb A_u / A_v into the two end tensors' bond legs and replace both
messages with diag(s) — after which the messages are the entanglement
spectra and the state is in the Vidal gauge.

All E edges are processed in ONE batched eigh + SVD ([E, χ, χ] — the
natural TPU shape), then the leg transforms are applied in per-slot groups:
every (vertex, slot) pair belongs to exactly one edge, so each group's
scatter is conflict-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .engine import BatchedState, _PRECISION
from .structure import BatchedGraphSpec


def _eig_roots(m, rel_cutoff):
    """Batched hermitian pseudo √ and 1/√ (`symmetric_gauge.jl:12-24`).

    Eigendirections below ``rel_cutoff`` × the largest eigenvalue are ZEROED
    in the inverse root rather than regularized: a rank-deficient message
    (padded bond, corner vertex) otherwise amplifies the null-space junk of
    the SVD's arbitrary basis by 1/√ε, which the near-zero singular values
    cannot re-suppress in later expectations (measured: 0.24 error in ⟨Z⟩
    with 10·eps regularization on a rank-2 χ=3 message)."""
    w, u = jnp.linalg.eigh(m)
    w = jnp.real(w)
    wmax = jnp.max(w, axis=-1, keepdims=True)
    ok = w > wmax * rel_cutoff
    sqrt_w = jnp.sqrt(jnp.where(ok, w, 1.0))
    uh = jnp.conj(jnp.swapaxes(u, -1, -2))
    root = jnp.einsum(
        "...ij,...j,...jk->...ik",
        u, jnp.where(ok, sqrt_w, 0.0).astype(m.dtype), uh,
        precision=_PRECISION,
    )
    inv_root = jnp.einsum(
        "...ij,...j,...jk->...ik",
        u, jnp.where(ok, 1.0 / sqrt_w, 0.0).astype(m.dtype), uh,
        precision=_PRECISION,
    )
    return root, inv_root


def _edge_gauge_transforms(X, Y, dtype, rel_cutoff):
    """Per-edge Vidal-gauge bond transforms from the two messages.

    X/Y are [B, χ, χ] batches (X = the u→v message stored at v, Y = the
    v→u message stored at u).  Returns (a_u, a_v, ss): absorb a_u into
    u's bond leg, a_v into v's, and replace both messages with diag(ss).

    Complex-correct construction (see gauge.py): the outgoing message
    transforms as m' = Aᵀ m Ā, so C = conj(√X)·√Y and the inverse roots
    enter conjugated; then m'_e = m'_ē = diag(s) exactly and the state is
    preserved (A_u A_vᵀ = conj(X^{-1/2}) C Y^{-1/2} = 1)."""
    rootX, inv_rootX = _eig_roots(X, rel_cutoff)
    rootY, inv_rootY = _eig_roots(Y, rel_cutoff)
    ce = jnp.einsum(
        "eij,ejk->eik", jnp.conj(rootX), rootY, precision=_PRECISION
    )
    uu, ss, vvh = jnp.linalg.svd(ce, full_matrices=False)
    sqrt_s = jnp.sqrt(ss).astype(dtype)
    a_u = (
        jnp.einsum("eij,ejk->eik", jnp.conj(inv_rootX), uu,
                   precision=_PRECISION)
        * sqrt_s[:, None, :]
    )
    v = jnp.swapaxes(vvh, -1, -2)  # V̄ = Vhᵀ in the (l, new) layout
    a_v = (
        jnp.einsum("eij,ejk->eik", jnp.conj(inv_rootY), v,
                   precision=_PRECISION)
        * sqrt_s[:, None, :]
    )
    return a_u, a_v, ss


def _absorb_on_slot(tensors, idx, slot, transforms):
    """tensors[idx] ← Σ_l T[..., l(slot), ...] A[l, l'] (unique idx rows)."""
    t = tensors[idx]
    t2 = jnp.moveaxis(t, 1 + slot, -1)
    t2 = jnp.einsum("e...l,elm->e...m", t2, transforms, precision=_PRECISION)
    t2 = jnp.moveaxis(t2, -1, 1 + slot)
    return tensors.at[idx].set(t2)


def batched_symmetric_gauge(
    spec: BatchedGraphSpec, state: BatchedState, rel_cutoff: float | None = None
):
    """Vidal-gauge the whole state at once; returns (state, spectra[E, χ]).

    The input must be at (or near) the BP fixed point; afterwards the
    messages are diag(spectra) and `spectra[e]` is the entanglement spectrum
    across edge e (`symmetric_gauge.jl:85-114`)."""
    if rel_cutoff is None:
        rel_cutoff = 1e3 * float(
            jnp.finfo(jnp.zeros((), state.tensors.dtype).real.dtype).eps
        )
    edges = np.asarray(spec.edges, dtype=np.int32)  # [E, 4] (iu, iv, su, sv)
    X = state.messages[edges[:, 1], edges[:, 3]]  # sent by u, arriving at v
    Y = state.messages[edges[:, 0], edges[:, 2]]  # sent by v, arriving at u

    a_u, a_v, ss = _edge_gauge_transforms(
        X, Y, state.tensors.dtype, rel_cutoff
    )

    tensors = state.tensors
    D = spec.degree
    for slot in range(D):
        sel_u = edges[:, 2] == slot
        if sel_u.any():
            tensors = _absorb_on_slot(
                tensors, edges[sel_u, 0], slot, a_u[np.flatnonzero(sel_u)]
            )
        sel_v = edges[:, 3] == slot
        if sel_v.any():
            tensors = _absorb_on_slot(
                tensors, edges[sel_v, 1], slot, a_v[np.flatnonzero(sel_v)]
            )

    s_diag = jax.vmap(jnp.diag)(ss.astype(state.messages.dtype))
    messages = state.messages
    messages = messages.at[edges[:, 1], edges[:, 3]].set(s_diag)
    messages = messages.at[edges[:, 0], edges[:, 2]].set(s_diag)
    return BatchedState(tensors, messages), ss
