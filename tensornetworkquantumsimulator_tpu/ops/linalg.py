"""Matrix factorizations on named tensors.

TPU-native replacement for the LAPACK-backed factorizations the reference
reaches through ITensors (`qr`, `factorize_svd`, `eigen`, `svd`;
`simple_update.jl:39-53`, `utils.jl:18-33,77-91`).  Everything lowers to
``jnp.linalg`` (XLA ops).  Truncation ranks are decided eagerly on host —
these entry points run outside ``jit``; the static-shape batched kernels in
``parallel/`` handle the jitted hot path with masking instead.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .index import Index, uniqueinds
from .tensor import Tensor, _canonical_dtype


def _xp(arr):
    """Backend module for an array: numpy stays numpy (no XLA compiles in
    the eager generic engine), jax stays jax."""
    return np if isinstance(arr, np.ndarray) else jnp


def _matricize(t: Tensor, left_inds):
    left = [i for i in t.inds if i in set(left_inds)]
    right = uniqueinds(t.inds, left)
    arr = t.array(tuple(left) + tuple(right))
    ldim = int(np.prod([i.dim for i in left], initial=1))
    rdim = int(np.prod([i.dim for i in right], initial=1))
    return arr.reshape(ldim, rdim), left, right


def _promote_f64(arr):
    """Reference `safe_eigen` (`utils.jl:77-91`): do eigen in 64-bit when the
    runtime allows it (always for numpy; x64-gated for jax)."""
    if isinstance(arr, np.ndarray):
        if arr.dtype == np.float32:
            return arr.astype(np.float64), arr.dtype
        if arr.dtype == np.complex64:
            return arr.astype(np.complex128), arr.dtype
        return arr, arr.dtype
    if arr.dtype == jnp.float32:
        return arr.astype(_canonical_dtype(jnp.float64)), arr.dtype
    if arr.dtype == jnp.complex64:
        return arr.astype(_canonical_dtype(jnp.complex128)), arr.dtype
    return arr, arr.dtype


def truncation_rank(s, maxdim=None, cutoff=None, mindim=1):
    """ITensors-style truncation: drop the smallest σ while the *relative*
    discarded weight Σ_cut σ²/Σ σ² stays ≤ cutoff, capped at maxdim."""
    s = np.asarray(s)
    n = len(s)
    k = n if maxdim is None else min(n, int(maxdim))
    if cutoff is not None:
        p = s.astype(np.float64) ** 2
        total = p.sum()
        if total > 0:
            tail = np.cumsum(p[::-1])[::-1] / total  # tail[i] = rel weight of s[i:]
            keep = int(np.searchsorted(-tail, -float(cutoff), side="left"))
            k = min(k, max(keep, 1))
    return max(k, min(mindim, n))


def svd_truncated(
    t: Tensor,
    left_inds,
    maxdim=None,
    cutoff=None,
    mindim=1,
    ortho: str = "none",
    tags=("bond",),
):
    """Truncated SVD split of ``t`` across (left_inds | rest).

    Returns ``(X, Y, s_tensor, truncerr, bond_index)`` where t ≈ X·Y with a
    fresh ``bond_index`` between them; ``s_tensor`` carries the kept singular
    values on ``(bond, bond')``; ``truncerr`` is the relative discarded
    Σσ² weight (the per-gate error in `simple_update.jl:46-53`).

    ortho="none"  -> X = U√S, Y = √S·Vh    (simple-update convention)
    ortho="left"  -> X = U,   Y = S·Vh
    ortho="right" -> X = U·S, Y = Vh
    """
    mat, left, right = _matricize(t, left_inds)
    work, orig_dtype = _promote_f64(mat)
    xp = _xp(work)
    u, s, vh = xp.linalg.svd(work, full_matrices=False)
    s_host = np.asarray(s)
    k = truncation_rank(s_host, maxdim=maxdim, cutoff=cutoff, mindim=mindim)
    p = s_host.astype(np.float64) ** 2
    total = p.sum()
    truncerr = float(p[k:].sum() / total) if total > 0 else 0.0

    u, s, vh = u[:, :k], s[:k], vh[:k, :]
    if ortho == "none":
        rs = xp.sqrt(s)
        x, y = u * rs[None, :], rs[:, None] * vh
    elif ortho == "left":
        x, y = u, s[:, None] * vh
    elif ortho == "right":
        x, y = u * s[None, :], vh
    else:
        raise ValueError(f"unknown ortho {ortho}")
    x = x.astype(orig_dtype)
    y = y.astype(orig_dtype)
    s = s.astype(np.zeros((), orig_dtype).real.dtype)  # σ are real

    bond = Index(int(k), tags=tags)
    X = Tensor(x.reshape(tuple(i.dim for i in left) + (k,)), tuple(left) + (bond,))
    Y = Tensor(y.reshape((k,) + tuple(i.dim for i in right)), (bond,) + tuple(right))
    s_t = Tensor(xp.diag(s), (bond, bond.prime()))
    return X, Y, s_t, truncerr, bond


def qr_factor(t: Tensor, left_inds, tags=("qr",)):
    """QR split: t = Q·R with Q isometric on (left_inds | bond)."""
    mat, left, right = _matricize(t, left_inds)
    q, r = _xp(mat).linalg.qr(mat, mode="reduced")
    k = q.shape[1]
    bond = Index(int(k), tags=tags)
    Q = Tensor(q.reshape(tuple(i.dim for i in left) + (k,)), tuple(left) + (bond,))
    R = Tensor(r.reshape((k,) + tuple(i.dim for i in right)), (bond,) + tuple(right))
    return Q, R


def factorize(t: Tensor, left_inds, ortho="left", maxdim=None, cutoff=None, tags=("bond",)):
    """Reference `factorize`: orthogonal split, optionally truncated.

    Returns (X, Y, bond).  With no truncation requested uses QR (exact,
    cheaper); otherwise a truncated SVD.
    """
    if maxdim is None and cutoff is None and ortho == "left":
        Q, R, = qr_factor(t, left_inds, tags=tags)
        return Q, R, Q.inds[-1]
    X, Y, _s, _err, bond = svd_truncated(
        t, left_inds, maxdim=maxdim, cutoff=cutoff, ortho=ortho, tags=tags
    )
    return X, Y, bond


def eigh_tensor(t: Tensor):
    """Hermitian eigendecomposition of a (row, col) matrix tensor.

    Returns (eigenvalues [ascending, real 1-d array], U array) with the
    convention M = U diag(w) U†.  64-bit promoted when available
    (reference `safe_eigen`, `utils.jl:77-91`).
    """
    if t.ndim != 2:
        raise ValueError("eigh_tensor expects a matrix tensor")
    work, orig_dtype = _promote_f64(t.data)
    w, u = _xp(work).linalg.eigh(work)
    return w, u, orig_dtype


def pseudo_sqrt_inv_sqrt(m: Tensor, cutoff=None):
    """(√M, 1/√M) of a hermitian 2-index environment, zeroing tiny/negative
    eigenvalues (reference `pseudo_sqrt_inv_sqrt`, `utils.jl:18-26`).

    Both results carry the same (row, col) indices as ``m``.
    """
    if cutoff is None:
        cutoff = 10 * float(np.finfo(np.zeros((), m.dtype).real.dtype).eps)
    w, u, orig_dtype = eigh_tensor(m)
    xp = _xp(u)
    w = xp.real(w)
    good = (xp.abs(w) >= cutoff) & (w > 0)
    safe = xp.where(good, w, 1.0)
    sqrt_w = xp.where(good, xp.sqrt(safe), 0.0)
    inv_sqrt_w = xp.where(good, 1.0 / xp.sqrt(safe), 0.0)
    uh = xp.conj(u).T
    m_sqrt = (u * sqrt_w[None, :]) @ uh
    m_inv_sqrt = (u * inv_sqrt_w[None, :]) @ uh
    return (
        Tensor(m_sqrt.astype(orig_dtype), m.inds),
        Tensor(m_inv_sqrt.astype(orig_dtype), m.inds),
    )


def eigendecomp_hermitian(m: Tensor, regularization=0.0):
    """Return (U, w, row_ind, col_ind) with M = U diag(w) U† as arrays.

    Used by the symmetric gauge (`symmetric_gauge.jl:12-20`).
    """
    w, u, orig_dtype = eigh_tensor(m)
    w = _xp(u).real(w) + regularization
    return u, w, orig_dtype
