"""Batched, jit-compiled TPU engine: flooding BP + vmapped simple update.

This is the performance core of the framework (SURVEY.md §2 item 1:
"Batched edge-group parallelism").  Where the generic engine walks the graph
edge by edge (like the reference's sequential forest sweep,
`beliefpropagationcache.jl:74-85`), this engine runs

- synchronous ("flooding") BP: every directed message updated in one shot
  per iteration, as one batched einsum chain over ``[V, D, χ, χ]`` arrays,
  iterated inside ``lax.while_loop`` with the reference's tolerance
  semantics (`abstractbeliefpropagationcache.jl:198-222`);
- simple-update gate application vmapped over an entire edge-color group
  (`apply_gates.jl:95-122` + `simple_update.jl:17-68` semantics, with
  grow-then-truncate inside a static χ buffer);

entirely under ``jax.jit`` — one XLA program per Trotter layer.
"""

from __future__ import annotations

import os
import string
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .structure import BatchedGraphSpec

# Truncated-SVD backend for the simple-update kernel, switchable via
# TNQS_SVD_ALG ∈ {default, gram, jacobi, qr, polar} for A/B measurement
# (read at trace time, so tests/bench can flip it per process).
# - default: jnp.linalg.svd (QDWH polar + eigh on TPU)
# - gram: one hermitian eigh of the smaller Gram matrix θ†θ / θθ† — skips
#   the QDWH polar stage entirely (the dominant cost at small χ,
#   BASELINE.md).  Squares the condition number: singular values below
#   √eps·σ_max lose relative accuracy, which only affects weights ≤ eps —
#   fine for simple-update truncation, NOT a general-purpose SVD.
# Measured round 1: this jax/libtpu only implements POLAR (=QDWH, the
# default) on TPU — JACOBI raises NotImplementedError — and only
# DEFAULT/QR on CPU.


def _svd_alg() -> str:
    return os.environ.get("TNQS_SVD_ALG", "default")


# Hermitian-eigh backend: TNQS_EIGH_ALG ∈ {auto, default, jacobi}
# (trace-time).  "jacobi" routes every batched eigh (environment
# pseudo-roots and the Gram split) through the single-kernel Pallas
# parallel-Jacobi (parallel/pallas_linalg.py) — one TPU kernel launch
# instead of the hundreds of small kernels inside XLA's QDWH spectral
# divide-and-conquer.  "auto" applies it only to SMALL matrices
# (n ≤ 24) on TPU, where full-layer walls measured 4–14× faster
# (chi10: 48.6 s / 29.3 s for 511k / 1.02M layers vs 205.6 s default).
# Hardware physics state (timing-channel ladders, BASELINE.md round 3):
# raw kernel (3e-4, 1e-3] per 10 layers — rejected; compensated kernel
# (in-kernel rotation renorm + Newton–Schulz polish + Rayleigh, fused
# roots) (3e-5, 1e-4]; double-NS variant is the pending promotion
# candidate against the ≤3e-5 bar (the default path's bound is ≤3e-6).
# Speed: fused auto path sustains ≤0.092 ms/layer on the chi10 bench
# workload (4.4× the 0.40 ms default).  auto stays opt-in until a
# ladder clears the bar with channel_ok=true.
_JACOBI_AUTO_MAX_N = 24


def _eigh(m):
    alg = os.environ.get("TNQS_EIGH_ALG", "default")
    n = m.shape[-1]
    # the Pallas kernel computes on f32 re/im planes: routing 64-bit
    # inputs through it would silently drop ~8 digits, so x64 always
    # falls back to XLA's eigh regardless of the knob
    is_x64 = jnp.finfo(jnp.zeros((), m.dtype).real.dtype).bits >= 64
    use_jacobi = m.ndim >= 3 and not is_x64 and (
        alg == "jacobi"
        or (
            alg == "auto"
            and n <= _JACOBI_AUTO_MAX_N
            and jax.default_backend() == "tpu"
        )
    )
    if use_jacobi:
        from .pallas_linalg import jacobi_eigh

        lead = m.shape[:-2]
        w, v = jacobi_eigh(m.reshape((-1,) + m.shape[-2:]))
        return (
            w.reshape(lead + w.shape[-1:]).astype(m.real.dtype),
            v.reshape(lead + v.shape[-2:]),
        )
    return jnp.linalg.eigh(m)


# Isometry-split backend for the QR-reduce step: TNQS_QR_ALG ∈ {default,
# polar} (trace-time).  The simple-update kernel only needs A = Q·M with
# Q†Q = I on the range (the reference's qr at `simple_update.jl:39-40` —
# triangularity of M is never used downstream: M feeds the gate
# contraction and Q is re-absorbed in _su_finish).  "polar" computes
# M = (A†A)^{1/2} and Q = A·(A†A)^{−1/2} from small Gram eighs — which
# TNQS_EIGH_ALG=jacobi turns into single Pallas kernels — instead of
# XLA's tall-matrix Householder QR.
#
# ACCURACY: opt-in only.  The Gram cannot resolve directions of A below
# √ε·σmax, and the QR-reduce *retains* its subspace (unlike the theta
# SVD, where sub-√ε directions land in the truncated tail) — measured
# ~4e-4/layer on c64, ~3e-6 on c128.  Use for exploratory large-χ runs;
# the production default keeps Householder QR.
def _polar_once(mat):
    """One polar-QR pass: M = (A†A)^{1/2}, Q = A·(A†A)^{-1/2}.

    Routes through :func:`_pseudo_roots`, so on the jacobi/auto path the
    whole gram→eigh→clip→both-roots chain is ONE fused Pallas launch
    (`pallas_linalg.jacobi_pseudo_roots`) and the pass costs two MXU
    matmuls + one kernel — the launch-minimal QR-reduce for the
    small-gram (χd ≤ 24) regime the chi10 workload lives in."""
    gram = jnp.conj(jnp.swapaxes(mat, -1, -2)) @ mat  # [B, k, k]
    root, inv_root = _pseudo_roots(gram)
    return mat @ inv_root, root


def _chol_once(mat):
    """One CholeskyQR pass: A = Q·L† from the Gram's Cholesky factor.

    Unlike :func:`_polar_once` (gram *eigh*), this is pure MXU work: two
    [m,k]×[k,k] matmuls + one k×k Cholesky + a triangular solve — the
    tall-skinny QR shape of the χ≥64 QR-reduce ([χ²d, χd]) where XLA's
    Householder serializes over columns.  A relative ridge keeps the
    factor finite when A has zero-padded bond columns (rank-deficient
    Gram); those null columns come back as ~0 rows of M, which the
    simple-update kernel already treats as weightless (same contract as
    the polar path's spectrum cutoff)."""
    h = jnp.conj(jnp.swapaxes(mat, -1, -2))
    gram = h @ mat  # [B, k, k]
    k = gram.shape[-1]
    eps = jnp.finfo(gram.real.dtype).eps
    tr = jnp.einsum("...ii->...", gram).real
    ridge = (10.0 * k * eps * (tr / k + eps)).astype(gram.dtype)
    gram = gram + ridge[..., None, None] * jnp.eye(k, dtype=gram.dtype)
    ell = jnp.linalg.cholesky(gram)  # lower, gram = L L†
    q = jax.lax.linalg.triangular_solve(
        ell, mat, left_side=False, lower=True,
        transpose_a=True, conjugate_a=True,
    )  # x L† = A
    return q, jnp.conj(jnp.swapaxes(ell, -1, -2))


def _qr_split(mat):
    alg = os.environ.get("TNQS_QR_ALG", "default")
    if alg == "cholqr1":
        # Single-pass CholeskyQR: in the simple-update the QR factor R
        # cancels exactly in the restored tensor (t_new = A·R⁻¹·x — any
        # invertible R gives the same result in exact arithmetic; the QR
        # only conditions θ's SVD), so the orthogonality-restoring second
        # pass buys little here — half the QR-stage launches
        return _chol_once(mat)
    if alg == "cholqr2":
        # CholeskyQR2: the Gram squares the condition number, so one pass
        # leaves Q†Q − I ~ κ²ε; the second pass acts on the near-isometric
        # Q₁ (κ ≈ 1) and restores orthogonality to ~ε.  M = M₂M₁ keeps
        # A = Q·M.  Accuracy caveat as for "polar": directions below
        # √ε·σmax are not resolved — opt-in for large-χ exploration.
        q1, m1 = _chol_once(mat)
        q, m2 = _chol_once(q1)
        return q, m2 @ m1
    if alg != "polar":
        return jnp.linalg.qr(mat)
    # Two passes (CholeskyQR2-style, with gram eighs so TNQS_EIGH_ALG=
    # jacobi turns each into one Pallas kernel): see accuracy note above.
    q1, m1 = _polar_once(mat)
    q, m2 = _polar_once(q1)
    return q, m2 @ m1


def _qr_reduce(mat):
    """QR-reduce with an optionally DEFERRED Q (TNQS_QR_ALG=defer).

    "defer" is CholeskyQR1 re-associated: Q = A·L⁻† is never materialized
    — the small factor coming back from the θ split is solved against
    R = L† first and the raw A multiplies it in `_su_finish`
    (t_new = A·(R⁻¹x) instead of (A·L⁻†)·x; identical in exact
    arithmetic, same κ²-Gram accuracy class as cholqr1/cholqr2).  The
    tall [χ²d, χd] matrix is then touched exactly TWICE per update (one
    gram, one rebuild matmul) instead of cholqr2's five tall passes —
    the χ≥64 QR stage is HBM-bandwidth-bound, so passes ≈ wall.  Also
    emits no tall triangular_solve (the op whose lowering the axon
    service fast-fails in the cholqr1 HLO).

    Returns ``(q, r, deferred)``: ``deferred=False`` → ``q`` orthonormal
    as before; ``deferred=True`` → ``q`` IS the input ``mat`` and the
    caller must left-solve small factors against upper-triangular ``r``
    (see `_rinv_left`) before the `_su_finish` rebuild."""
    if os.environ.get("TNQS_QR_ALG", "default") == "defer":
        h = jnp.conj(jnp.swapaxes(mat, -1, -2))
        gram = h @ mat
        k = gram.shape[-1]
        eps = jnp.finfo(gram.real.dtype).eps
        tr = jnp.einsum("...ii->...", gram).real
        ridge = (10.0 * k * eps * (tr / k + eps)).astype(gram.dtype)
        gram = gram + ridge[..., None, None] * jnp.eye(k, dtype=gram.dtype)
        ell = jnp.linalg.cholesky(gram)  # lower, gram = L L†
        return mat, jnp.conj(jnp.swapaxes(ell, -1, -2)), True
    q, r = _qr_split(mat)
    return q, r, False


def _rinv_left(r, x):
    """Solve upper-triangular ``R z = x`` on the Q-column index (the
    deferred-Q rebuild: t_new = A·(R⁻¹x)).  ``x`` [B, k, n]."""
    return jax.lax.linalg.triangular_solve(
        r, x, left_side=True, lower=False
    )


def _svd(mat):
    alg_name = _svd_alg()
    if alg_name in ("default", "gram"):
        return jnp.linalg.svd(mat, full_matrices=False)
    import jax.lax.linalg as lla

    alg = {
        "jacobi": lla.SvdAlgorithm.JACOBI,
        "qr": lla.SvdAlgorithm.QR,
        "polar": lla.SvdAlgorithm.POLAR,
    }[alg_name]
    return lla.svd(mat, full_matrices=False, compute_uv=True, algorithm=alg)


def _gram_split(mat):
    """(U, s, V†) via one eigh of the smaller Gram matrix (see note above).

    Columns of U (rows of V†) for zero singular values are zeroed, not
    orthonormalized — the truncation path multiplies them by √s = 0."""
    n1, n2 = mat.shape[-2], mat.shape[-1]
    h = jnp.conj(jnp.swapaxes(mat, -1, -2))
    if n2 <= n1:
        gram = h @ mat  # [B, n2, n2]
        w, v = _eigh(gram)
        w, v = w[..., ::-1], v[..., ::-1]  # descending
        s = jnp.sqrt(jnp.clip(w, 0.0, None))
        us = mat @ v  # = U diag(s)
        safe = jnp.where(s > 0, s, 1.0)[..., None, :]
        uu = jnp.where(s[..., None, :] > 0, us / safe, 0.0)
        vh = jnp.conj(jnp.swapaxes(v, -1, -2))
        return uu, s, vh
    gram = mat @ h  # [B, n1, n1]
    w, u = _eigh(gram)
    w, u = w[..., ::-1], u[..., ::-1]
    s = jnp.sqrt(jnp.clip(w, 0.0, None))
    sv = jnp.conj(jnp.swapaxes(u, -1, -2)) @ mat  # = diag(s) V†
    safe = jnp.where(s > 0, s, 1.0)[..., :, None]
    vh = jnp.where(s[..., :, None] > 0, sv / safe, 0.0)
    return u, s, vh

_LETTERS = string.ascii_lowercase
_PRECISION = jax.lax.Precision.HIGHEST


class BatchedState(NamedTuple):
    """Pytree state: padded vertex tensors + per-slot incoming messages."""

    tensors: jax.Array  # [V, χ, ..., χ (D times), d]
    messages: jax.Array  # [V, D, χ, χ] (ket, bra) environment matrices

    @property
    def chi(self) -> int:
        return self.tensors.shape[1]

    @property
    def degree(self) -> int:
        return self.tensors.ndim - 2


def identity_messages(v: int, d: int, chi: int, dtype) -> jax.Array:
    eye = jnp.eye(chi, dtype=dtype)
    return jnp.broadcast_to(eye, (v, d, chi, chi)).copy()


def _absorb(t, m, axis):
    """Σ_l t[..., l, ...] m[v, l, l'] along the given axis (batched on v)."""
    t2 = jnp.moveaxis(t, axis, -1)
    out = jnp.einsum("v...l,vlm->v...m", t2, m, precision=_PRECISION)
    return jnp.moveaxis(out, -1, axis)


# ---------------------------------------------------------------------------
# flooding BP
# ---------------------------------------------------------------------------


def _all_except_one(t, messages, slots):
    """[t with every slot's message absorbed except slot j, for j in slots].

    Absorbs on distinct legs commute, so a binary split reuses the shared
    half: cost D·log₂D absorbs instead of the naive D·(D−1) (8 vs 12 at
    D=4; 16 vs 30 at D=6 for 3D lattices)."""
    if len(slots) == 1:
        return [t]
    mid = len(slots) // 2
    left, right = slots[:mid], slots[mid:]
    t_right_absorbed = t
    for k in right:
        t_right_absorbed = _absorb(t_right_absorbed, messages[:, k], 1 + k)
    t_left_absorbed = t
    for k in left:
        t_left_absorbed = _absorb(t_left_absorbed, messages[:, k], 1 + k)
    return _all_except_one(t_right_absorbed, messages, left) + _all_except_one(
        t_left_absorbed, messages, right
    )


def _outgoing_messages(spec: BatchedGraphSpec, state: BatchedState) -> jax.Array:
    """m_out[u, j]: message u sends through slot j — contract the local norm
    factors with all incoming messages except slot j
    (`abstractbeliefpropagationcache.jl:144-177`, batched).

    ``TNQS_BP_KERNEL=1`` routes the χ≥64 degree-3 case through the fused
    Pallas kernel (`pallas_bp.bp_outgoing_d3`): the per-vertex tensor
    stays VMEM-resident through all absorbs and contractions instead of
    making ~10 HBM round-trips — the BP iteration at χ=64 is
    bandwidth-bound (scripts/chi64_anatomy.py)."""
    D = spec.degree
    t = state.tensors
    if os.environ.get("TNQS_BP_KERNEL", "0") == "1" and D == 3 and t.ndim == 5:
        from .pallas_bp import bp_kernel_supported, bp_outgoing_d3

        chi, d = t.shape[1], t.shape[-1]
        if bp_kernel_supported(D, chi, d, t.dtype) and all(
            s == chi for s in t.shape[1:4]
        ):
            return bp_outgoing_d3(t, state.messages)
    # t: [V, b0..b_{D-1}, s]
    accs = _all_except_one(t, state.messages, list(range(D)))
    tconj = jnp.conj(t)
    outs = []
    for j, acc in zip(range(D), accs):
        lab = [_LETTERS[k] for k in range(D)]
        acc_lab = list(lab)
        acc_lab[j] = "p"  # outgoing ket leg
        conj_lab = list(lab)
        conj_lab[j] = "q"  # outgoing bra leg
        eq = f"v{''.join(acc_lab)}s,v{''.join(conj_lab)}s->vpq"
        outs.append(jnp.einsum(eq, acc, tconj, precision=_PRECISION))
    return jnp.stack(outs, axis=1)  # [V, D, χ, χ]


def _normalize_messages(m, mask, hermitize: bool = True):
    """Hermitize + divide by the entry sum (`abstractbeliefpropagationcache.
    jl:164-172`); dummy slots pinned to the identity."""
    if hermitize:
        m = 0.5 * (m + jnp.conj(jnp.swapaxes(m, -1, -2)))
    s = jnp.sum(m, axis=(-2, -1), keepdims=True)
    safe = jnp.where(jnp.abs(s) == 0, 1.0, s)
    m = m / safe
    eye = jnp.eye(m.shape[-1], dtype=m.dtype)
    return jnp.where(mask[..., None, None], m, eye)


def bp_iteration(spec: BatchedGraphSpec, state: BatchedState) -> jax.Array:
    """One synchronous sweep: every directed message updated at once."""
    m_out = _outgoing_messages(spec, state)
    nbr = jnp.asarray(spec.nbr_array())
    nbr_slot = jnp.asarray(spec.nbr_slot_array())
    mask = jnp.asarray(spec.mask_array())
    # the message INTO v through slot k was sent by nbr[v,k] via nbr_slot[v,k]
    gathered = m_out[nbr, nbr_slot]  # [V, D, χ, χ]
    return _normalize_messages(gathered, mask)


def _message_distance(a, b, mask):
    """Mean per-edge fidelity distance (`beliefpropagationcache.jl:15-19`)."""
    dot = jnp.sum(jnp.conj(a) * b, axis=(-2, -1))
    na = jnp.linalg.norm(a.reshape(a.shape[:-2] + (-1,)), axis=-1)
    nb = jnp.linalg.norm(b.reshape(b.shape[:-2] + (-1,)), axis=-1)
    denom = jnp.where(na * nb == 0, 1.0, na * nb)
    f = jnp.abs(dot / denom) ** 2
    d = jnp.where(mask, 1.0 - f, 0.0)
    return jnp.sum(d) / jnp.maximum(jnp.sum(mask), 1)


def default_batched_tolerance(dtype) -> float:
    if jnp.dtype(dtype) in (jnp.dtype("float32"), jnp.dtype("complex64")):
        return 1e-5
    return 1e-8


def bp_update(
    spec: BatchedGraphSpec,
    state: BatchedState,
    maxiter: int = 30,
    tolerance: float | None = None,
    damping: float = 0.0,
) -> BatchedState:
    """Flooding BP to the fixed point (tolerance on the mean message change,
    mirroring `update` at `abstractbeliefpropagationcache.jl:198-222`)."""
    if tolerance is None:
        tolerance = default_batched_tolerance(state.tensors.dtype)
    mask = jnp.asarray(spec.mask_array())
    rdt = jnp.zeros((), state.tensors.dtype).real.dtype

    def cond(carry):
        _, it, diff = carry
        return jnp.logical_and(it < maxiter, diff > tolerance)

    def body(carry):
        m, it, _ = carry
        new = bp_iteration(spec, state._replace(messages=m))
        if damping > 0:
            new = _normalize_messages(
                (1 - damping) * new + damping * m, mask, hermitize=False
            )
        return (new, it + 1, _message_distance(m, new, mask).astype(rdt))

    m, _, _ = jax.lax.while_loop(
        cond, body, (state.messages, jnp.int32(0), jnp.asarray(jnp.inf, rdt))
    )
    return state._replace(messages=m)


# ---------------------------------------------------------------------------
# environment roots
# ---------------------------------------------------------------------------


def _pseudo_roots(m):
    """(√M, 1/√M) of hermitian environment batches with cutoff zeroing
    (`utils.jl:18-26`, batched); padded/dummy directions stay exactly zero.

    On the Jacobi path (TNQS_EIGH_ALG ∈ {jacobi, auto-with-small-n}) the
    WHOLE stage — eigh, polish, clip, both reconstructions — runs as one
    fused Pallas kernel (`pallas_linalg.jacobi_pseudo_roots`), replacing
    ~15 launch-bound XLA kernels; TNQS_ROOTS_FUSED=0 keeps the kernel
    eigh + XLA reconstruction split for A/B."""
    m = 0.5 * (m + jnp.conj(jnp.swapaxes(m, -1, -2)))
    alg = os.environ.get("TNQS_EIGH_ALG", "default")
    n = m.shape[-1]
    is_x64 = jnp.finfo(jnp.zeros((), m.dtype).real.dtype).bits >= 64
    use_jacobi = m.ndim >= 3 and not is_x64 and (
        alg == "jacobi"
        or (
            alg == "auto"
            and n <= _JACOBI_AUTO_MAX_N
            and jax.default_backend() == "tpu"
        )
    )
    if use_jacobi and os.environ.get("TNQS_ROOTS_FUSED", "1") != "0":
        from .pallas_linalg import jacobi_pseudo_roots, roots_kernel_supported

        flat = m.reshape((-1,) + m.shape[-2:])
        if roots_kernel_supported(n, flat.shape[0]):
            root, inv_root = jacobi_pseudo_roots(flat)
            return (
                root.reshape(m.shape),
                inv_root.reshape(m.shape),
            )
    w, u = _eigh(m)
    eps = jnp.finfo(w.dtype).eps
    wmax = jnp.max(jnp.abs(w), axis=-1, keepdims=True)
    good = w > 10 * eps * jnp.maximum(wmax, eps)
    safe = jnp.where(good, w, 1.0)
    sq = jnp.where(good, jnp.sqrt(safe), 0.0)
    isq = jnp.where(good, 1.0 / jnp.sqrt(safe), 0.0)
    uh = jnp.conj(jnp.swapaxes(u, -1, -2))
    root = (u * sq[..., None, :]) @ uh
    inv_root = (u * isq[..., None, :]) @ uh
    return root, inv_root


# ---------------------------------------------------------------------------
# batched simple update for one slot-pair bucket
# ---------------------------------------------------------------------------


def _gate_bucket_update(
    state: BatchedState,
    gate: jax.Array,  # [s1', s2', s1, s2] or batched [B, ...]
    u_idx: jax.Array,
    v_idx: jax.Array,
    slot_u: int,
    slot_v: int,
    chi: int,
    cutoff: float,
    normalize_tensors: bool,
):
    """Simple update vmapped over all edges of one (slot_u, slot_v) bucket
    (`simple_update.jl:17-68`): gather endpoints, run the update core,
    scatter back; the kept spectrum becomes the new edge message
    (`apply_gates.jl:108-115`)."""
    tu = state.tensors[u_idx]
    tv = state.tensors[v_idx]
    mu = state.messages[u_idx]
    mv = state.messages[v_idx]
    tu_new, tv_new, msg, err = _simple_update_core(
        tu, tv, mu, mv, gate, slot_u, slot_v, chi, cutoff, normalize_tensors
    )
    tensors = state.tensors.at[u_idx].set(
        tu_new.astype(state.tensors.dtype), unique_indices=True
    )
    tensors = tensors.at[v_idx].set(
        tv_new.astype(state.tensors.dtype), unique_indices=True
    )
    messages = state.messages.at[u_idx, slot_u].set(
        msg.astype(state.messages.dtype)
    )
    messages = messages.at[v_idx, slot_v].set(
        msg.astype(state.messages.dtype)
    )
    return BatchedState(tensors, messages), err


def _simple_update_core(
    tu: jax.Array,  # [B, χ.., d] gathered u tensors
    tv: jax.Array,
    mu: jax.Array,  # [B, D, χ, χ] gathered incoming messages at u
    mv: jax.Array,
    gate: jax.Array,
    slot_u: int,
    slot_v: int,
    chi: int,
    cutoff: float,
    normalize_tensors: bool,
):
    """The batched simple-update kernel on gathered endpoint data
    (`simple_update.jl:17-68`): absorb √env → QR-reduce → gate → truncated
    SVD into the static χ buffer → restore with 1/√env.  Returns
    ``(tu_new, tv_new, message, err)`` — scatter-free so the SPMD layer can
    run it on halo-exchanged partners."""
    D = tu.ndim - 2
    d = tu.shape[-1]

    # ONE batched eigh for every environment root of both sites, and ONE
    # batched QR for both reduced tensors: the per-layer cost at small χ is
    # dominated by these factorization kernels (BASELINE.md), so launching
    # 2(D−1) eighs + 2 QRs as 2 stacked calls is the cheap win.
    slots_u = [k for k in range(D) if k != slot_u]
    slots_v = [k for k in range(D) if k != slot_v]
    env = jnp.stack(
        [mu[:, k] for k in slots_u] + [mv[:, k] for k in slots_v], axis=0
    )  # [2(D-1), B, χ, χ]
    roots, inv_roots = _pseudo_roots(env)

    tp_u = _su_prep(tu, slot_u, roots[: D - 1], chi, d)
    tp_v = _su_prep(tv, slot_v, roots[D - 1 :], chi, d)
    B0 = tp_u.shape[0]
    q_all, r_all, deferred = _qr_reduce(jnp.concatenate([tp_u, tp_v], axis=0))
    qu, qv = q_all[:B0], q_all[B0:]
    ru = r_all[:B0].reshape(B0, -1, chi, d)
    rv = r_all[B0:].reshape(B0, -1, chi, d)
    inv_u = [inv_roots[i] for i in range(D - 1)]
    inv_v = [inv_roots[D - 1 + i] for i in range(D - 1)]

    # θ = gate · (Rᵤ Rᵥ) over the shared bond l
    theta = jnp.einsum("bxlc,bylz->bxcyz", ru, rv, precision=_PRECISION)
    if gate.ndim == 4:
        theta = jnp.einsum(
            "bxcyz,pqcz->bxpyq", theta, gate.astype(theta.dtype),
            precision=_PRECISION,
        )
    else:
        theta = jnp.einsum(
            "bxcyz,bpqcz->bxpyq", theta, gate.astype(theta.dtype),
            precision=_PRECISION,
        )
    B, r1, _, r2, _ = theta.shape
    mat = theta.reshape(B, r1 * d, r2 * d)
    x, y, s_kept, err = _su_split(mat, chi, d, cutoff)

    fac_u = x.reshape(B, r1, d, chi)
    fac_v = jnp.swapaxes(y, 1, 2).reshape(B, r2, d, chi)
    if deferred:  # qu/qv are the raw tall matrices; undo R on the factor
        fac_u = _rinv_left(
            r_all[:B0], fac_u.reshape(B, r1, d * chi)
        ).reshape(B, r1, d, chi)
        fac_v = _rinv_left(
            r_all[B0:], fac_v.reshape(B, r2, d * chi)
        ).reshape(B, r2, d, chi)
    tu_new = _su_finish(qu, fac_u, inv_u, slot_u, tu, chi, d)
    tv_new = _su_finish(qv, fac_v, inv_v, slot_v, tv, chi, d)

    s_norm = jnp.linalg.norm(s_kept, axis=-1, keepdims=True)
    if normalize_tensors:
        s_msg = s_kept / jnp.where(s_norm == 0, 1.0, s_norm)
    else:
        s_msg = s_kept
    msg = jax.vmap(jnp.diag)(s_msg).astype(mat.dtype)

    if normalize_tensors:
        def _nrm(t):
            n = jnp.linalg.norm(t.reshape(t.shape[0], -1), axis=-1)
            n = jnp.where(n == 0, 1.0, n)
            return t / n.reshape((-1,) + (1,) * (t.ndim - 1))

        tu_new, tv_new = _nrm(tu_new), _nrm(tv_new)

    return tu_new, tv_new, msg, err


def apply_one_site(state: BatchedState, gate: jax.Array, idx=None) -> BatchedState:
    """Batched 1-site gates: gate [d', d] broadcast over vertices, or
    [B, d', d] applied at positions ``idx``."""
    g = gate
    if idx is None:
        if g.ndim == 2:
            t = jnp.einsum("v...d,pd->v...p", state.tensors, g.astype(state.tensors.dtype), precision=_PRECISION)
        else:
            t = jnp.einsum("v...d,vpd->v...p", state.tensors, g.astype(state.tensors.dtype), precision=_PRECISION)
        return state._replace(tensors=t)
    sub = state.tensors[idx]
    if g.ndim == 2:
        sub = jnp.einsum("b...d,pd->b...p", sub, g.astype(sub.dtype), precision=_PRECISION)
    else:
        sub = jnp.einsum("b...d,bpd->b...p", sub, g.astype(sub.dtype), precision=_PRECISION)
    return state._replace(tensors=state.tensors.at[idx].set(sub))


def apply_color_group(
    state: BatchedState,
    buckets,
    gate: jax.Array,
    chi: int,
    cutoff: float,
    normalize_tensors: bool = True,
):
    """Apply one 2-site gate to every edge of a color group (the batched
    analogue of the reference's per-color loop, `2dIsing_dynamics.jl:25-28`).

    All slot-pair buckets of the group share ONE stacked eigh, ONE stacked
    QR, and ONE stacked SVD — factorization kernel count dominates the
    per-layer wall at small χ on TPU (BASELINE.md).  Per-matrix results are
    batch-composition independent up to backend rounding (bitwise on the
    f64 configs tested; c64 backends may differ at rounding level, which
    bond-gauge freedom can amplify in tensor entries without affecting
    physics).  Set TNQS_FUSE_BUCKETS=0 for per-bucket kernels."""
    buckets = list(buckets)
    if not buckets:
        return state, jnp.zeros((0,))
    if (
        os.environ.get("TNQS_FUSE_BUCKETS", "1") == "0"
        or len(buckets) == 1
    ):
        errs = []
        for b in buckets:
            u_idx = jnp.asarray(b.u_idx, dtype=jnp.int32)
            v_idx = jnp.asarray(b.v_idx, dtype=jnp.int32)
            state, err = _gate_bucket_update(
                state, gate, u_idx, v_idx, b.slot_u, b.slot_v, chi, cutoff,
                normalize_tensors,
            )
            errs.append(err)
        return state, jnp.concatenate(errs) if errs else jnp.zeros((0,))
    return _fused_color_group(
        state, buckets, gate, chi, cutoff, normalize_tensors
    )


def _su_prep(t, slot, roots_slice, chi, d):
    """Absorb √env on the non-gate legs and matricize to [B, M, χ·d]."""
    D = t.ndim - 2
    for i, k in enumerate(k for k in range(D) if k != slot):
        t = _absorb(t, roots_slice[i], 1 + k)
    perm = [0] + [1 + k for k in range(D) if k != slot] + [1 + slot, D + 1]
    tp = jnp.transpose(t, perm)
    B = tp.shape[0]
    M = int(np.prod(tp.shape[1:D]))
    return tp.reshape(B, M, chi * d)


def _su_split(mat, chi, d, cutoff):
    """Truncated split of the gated two-site matrix [B, r1·d, r2·d]:
    reference truncation semantics (relative discarded Σσ² ≤ cutoff, cap χ)
    inside the static buffer.  Returns (x [B, r1·d, χ], y [B, χ, r2·d],
    s_kept [B, χ], err [B])."""
    if _svd_alg() == "gram":
        uu, s, vh = _gram_split(mat)
    else:
        uu, s, vh = _svd(mat)
    p = s * s
    total = jnp.sum(p, axis=-1, keepdims=True)
    tail = jnp.cumsum(p[..., ::-1], axis=-1)[..., ::-1]
    rel_tail = tail / jnp.where(total == 0, 1.0, total)
    keep = rel_tail > cutoff
    keep = keep.at[..., 0].set(True)
    keep &= jnp.arange(s.shape[-1])[None, :] < chi
    err = jnp.sum(jnp.where(keep, 0.0, p), axis=-1) / jnp.squeeze(
        jnp.where(total == 0, 1.0, total), -1
    )
    k = min(chi, s.shape[-1])
    s_kept = jnp.where(keep, s, 0.0)[..., :k]
    uu = uu[..., :k]
    vh = vh[..., :k, :]
    if k < chi:  # bond smaller than the buffer: zero-pad
        padn = chi - k
        s_kept = jnp.pad(s_kept, ((0, 0), (0, padn)))
        uu = jnp.pad(uu, ((0, 0), (0, 0), (0, padn)))
        vh = jnp.pad(vh, ((0, 0), (0, padn), (0, 0)))
    sqrt_s = jnp.sqrt(s_kept).astype(mat.dtype)
    x = uu * sqrt_s[:, None, :]
    y = sqrt_s[:, :, None] * vh
    return x, y, s_kept, err


def _su_finish(q, fac, inv_roots, slot, t_ref, chi, d):
    """Rebuild the site tensor: Q·factor, undo the transpose, absorb 1/√env."""
    D = t_ref.ndim - 2
    t = jnp.einsum("bmr,brdc->bmdc", q, fac, precision=_PRECISION)
    other = [t_ref.shape[1 + kk] for kk in range(D) if kk != slot]
    t = t.reshape((t.shape[0],) + tuple(other) + (d, chi))
    t = jnp.moveaxis(t, -1, -2)  # [..., χ(slot), d]
    order = [kk for kk in range(D) if kk != slot] + [slot]
    inv_perm = [0] + [1 + order.index(kk) for kk in range(D)] + [D + 1]
    t = jnp.transpose(t, inv_perm)
    it = iter(inv_roots)
    for kk in range(D):
        if kk == slot:
            continue
        # inv_root is hermitian: contracting the bra leg with it equals
        # the reference's dag(inv_sqrt_env) contraction
        t = _absorb(t, next(it), 1 + kk)
    return t


def _fused_group_core(state, items, gate, chi, cutoff, normalize_tensors):
    """Shared fused-color-group math on pre-gathered endpoint data.

    ``items``: list of ``(slot_u, slot_v, tu, tv, mu, mv)`` per bucket.
    Runs ONE stacked eigh, ONE stacked QR and ONE stacked SVD across all
    buckets; returns ``[(tu_new, tv_new, msg, err)]`` in bucket order —
    the caller owns gather and write-back (static scatter for the
    single-chip path, mask-select for the scan/SPMD paths)."""
    D = state.degree
    d = state.tensors.shape[-1]
    gathered = []
    for (slot_u, slot_v, tu, tv, mu, mv) in items:
        env = jnp.stack(
            [mu[:, k] for k in range(D) if k != slot_u]
            + [mv[:, k] for k in range(D) if k != slot_v],
            axis=0,
        )  # [2(D-1), B_b, χ, χ]
        gathered.append((slot_u, slot_v, tu, tv, env))

    sizes = [g[4].shape[1] for g in gathered]
    env_all = jnp.concatenate([g[4] for g in gathered], axis=1)
    roots_all, inv_roots_all = _pseudo_roots(env_all)

    tps = []
    offs = np.cumsum([0] + sizes)
    per_bucket = []
    for i, (slot_u, slot_v, tu, tv, _env) in enumerate(gathered):
        roots = roots_all[:, offs[i] : offs[i + 1]]
        inv_roots = inv_roots_all[:, offs[i] : offs[i + 1]]
        tp_u = _su_prep(tu, slot_u, roots[: D - 1], chi, d)
        tp_v = _su_prep(tv, slot_v, roots[D - 1 :], chi, d)
        tps += [tp_u, tp_v]
        per_bucket.append((slot_u, slot_v, tu, tv, inv_roots))

    q_all, r_all, deferred = _qr_reduce(jnp.concatenate(tps, axis=0))
    qs, rs, rmats = [], [], []
    off = 0
    for i, B in enumerate(sizes):
        qs.append((q_all[off : off + B], q_all[off + B : off + 2 * B]))
        rs.append(
            (
                r_all[off : off + B].reshape(B, -1, chi, d),
                r_all[off + B : off + 2 * B].reshape(B, -1, chi, d),
            )
        )
        rmats.append((r_all[off : off + B], r_all[off + B : off + 2 * B]))
        off += 2 * B

    mats = []
    for i, (slot_u, slot_v, *_rest) in enumerate(per_bucket):
        ru, rv = rs[i]
        theta = jnp.einsum("bxlc,bylz->bxcyz", ru, rv, precision=_PRECISION)
        g = gate.astype(theta.dtype)
        if g.ndim == 4:
            theta = jnp.einsum("bxcyz,pqcz->bxpyq", theta, g, precision=_PRECISION)
        else:
            theta = jnp.einsum("bxcyz,bpqcz->bxpyq", theta, g, precision=_PRECISION)
        B, r1, _, r2, _ = theta.shape
        mats.append(theta.reshape(B, r1 * d, r2 * d))

    x_all, y_all, s_all, err_all = _su_split(
        jnp.concatenate(mats, axis=0), chi, d, cutoff
    )

    results = []
    off = 0
    for i, (slot_u, slot_v, tu, tv, inv_roots) in enumerate(per_bucket):
        B = sizes[i]
        x = x_all[off : off + B]
        y = y_all[off : off + B]
        s_kept = s_all[off : off + B]
        err = err_all[off : off + B]
        off += B
        qu, qv = qs[i]
        r1 = rs[i][0].shape[1]
        r2 = rs[i][1].shape[1]
        inv_u = [inv_roots[j] for j in range(D - 1)]
        inv_v = [inv_roots[D - 1 + j] for j in range(D - 1)]
        fac_u = x.reshape(B, r1, d, chi)
        fac_v = jnp.swapaxes(y, 1, 2).reshape(B, r2, d, chi)
        if deferred:  # qu/qv are raw tall matrices; undo R on the factor
            fac_u = _rinv_left(
                rmats[i][0], fac_u.reshape(B, r1, d * chi)
            ).reshape(B, r1, d, chi)
            fac_v = _rinv_left(
                rmats[i][1], fac_v.reshape(B, r2, d * chi)
            ).reshape(B, r2, d, chi)
        tu_new = _su_finish(qu, fac_u, inv_u, slot_u, tu, chi, d)
        tv_new = _su_finish(qv, fac_v, inv_v, slot_v, tv, chi, d)
        s_norm = jnp.linalg.norm(s_kept, axis=-1, keepdims=True)
        s_msg = (
            s_kept / jnp.where(s_norm == 0, 1.0, s_norm)
            if normalize_tensors
            else s_kept
        )
        msg = jax.vmap(jnp.diag)(s_msg).astype(state.messages.dtype)
        if normalize_tensors:
            def _nrm(t):
                n = jnp.linalg.norm(t.reshape(t.shape[0], -1), axis=-1)
                n = jnp.where(n == 0, 1.0, n)
                return t / n.reshape((-1,) + (1,) * (t.ndim - 1))

            tu_new, tv_new = _nrm(tu_new), _nrm(tv_new)
        results.append((tu_new, tv_new, msg, err))
    return results


def _fused_color_group(state, buckets, gate, chi, cutoff, normalize_tensors):
    """One stacked eigh/QR/SVD across every bucket of the color group."""
    items, idxs = [], []
    for b in buckets:
        u_idx = jnp.asarray(b.u_idx, dtype=jnp.int32)
        v_idx = jnp.asarray(b.v_idx, dtype=jnp.int32)
        items.append((
            b.slot_u, b.slot_v,
            state.tensors[u_idx], state.tensors[v_idx],
            state.messages[u_idx], state.messages[v_idx],
        ))
        idxs.append((u_idx, v_idx))
    results = _fused_group_core(
        state, items, gate, chi, cutoff, normalize_tensors
    )
    tensors, messages = state.tensors, state.messages
    errs = []
    for b, (u_idx, v_idx), (tu_new, tv_new, msg, err) in zip(
        buckets, idxs, results
    ):
        # u_idx/v_idx are unique within a bucket: unique_indices lets
        # XLA lower the row scatter without serialization scratch
        # (24 MB scoped-vmem OOM at chi=64 otherwise)
        tensors = tensors.at[u_idx].set(
            tu_new.astype(tensors.dtype), unique_indices=True
        )
        tensors = tensors.at[v_idx].set(
            tv_new.astype(tensors.dtype), unique_indices=True
        )
        messages = messages.at[u_idx, b.slot_u].set(msg, unique_indices=True)
        messages = messages.at[v_idx, b.slot_v].set(msg, unique_indices=True)
        errs.append(err)
    return BatchedState(tensors, messages), jnp.concatenate(errs)


def apply_color_group_masked(
    state: BatchedState,
    slot_pairs,  # static tuple of (slot_u, slot_v) per canonical bucket
    tables,  # per bucket: dict of traced arrays u_tab/v_tab [B], valid [B],
    #          u_inv/u_wr/v_inv/v_wr [V] (inverse-select write-back)
    gate: jax.Array,
    chi: int,
    cutoff: float,
    normalize_tensors: bool = True,
):
    """Fused color-group apply with TRACED index tables — the body of the
    scan-over-color-groups layer compiler (`make_layer_fn(scan_groups=
    True)`).  Canonical buckets are padded to a uniform per-group shape:
    pad rows gather vertex 0, compute garbage, and write nothing back
    (inverse-permutation ``where`` select, no scatter hazards).  Same
    kernel content as `_fused_color_group`; only gather/write-back
    differ."""
    items = []
    for (slot_u, slot_v), tb in zip(slot_pairs, tables):
        u_idx, v_idx = tb["u_tab"], tb["v_tab"]
        items.append((
            slot_u, slot_v,
            state.tensors[u_idx], state.tensors[v_idx],
            state.messages[u_idx], state.messages[v_idx],
        ))
    results = _fused_group_core(
        state, items, gate, chi, cutoff, normalize_tensors
    )

    def select_rows(old, new, inv, wr):
        m = wr.reshape(wr.shape + (1,) * (old.ndim - 1))
        return jnp.where(m, new[inv].astype(old.dtype), old)

    tensors, messages = state.tensors, state.messages
    errs = []
    for (slot_u, slot_v), tb, (tu_new, tv_new, msg, err) in zip(
        slot_pairs, tables, results
    ):
        tensors = select_rows(tensors, tu_new, tb["u_inv"], tb["u_wr"])
        tensors = select_rows(tensors, tv_new, tb["v_inv"], tb["v_wr"])
        messages = messages.at[:, slot_u].set(select_rows(
            messages[:, slot_u], msg, tb["u_inv"], tb["u_wr"]))
        messages = messages.at[:, slot_v].set(select_rows(
            messages[:, slot_v], msg, tb["v_inv"], tb["v_wr"]))
        errs.append(jnp.where(tb["valid"], err, 0.0))
    return BatchedState(tensors, messages), jnp.concatenate(errs)


# ---------------------------------------------------------------------------
# batched local expectation values
# ---------------------------------------------------------------------------


def local_rdms(spec: BatchedGraphSpec, state: BatchedState) -> jax.Array:
    """Unnormalized 1-site RDMs ρ[v, s, s'] from the BP environments."""
    D = spec.degree
    t = state.tensors
    acc = t
    for k in range(D):
        acc = _absorb(acc, state.messages[:, k], 1 + k)
    lab = "".join(_LETTERS[k] for k in range(D))
    eq = f"v{lab}s,v{lab}z->vsz"
    return jnp.einsum(eq, acc, jnp.conj(t), precision=_PRECISION)


def local_expectations(
    spec: BatchedGraphSpec, state: BatchedState, op: jax.Array
) -> jax.Array:
    """⟨op⟩ for every vertex (single-site observables, `expect.jl:58-83`)."""
    rho = local_rdms(spec, state)  # [V, s(ket), z(bra)]
    numer = jnp.einsum("vsz,zs->v", rho, op.astype(rho.dtype), precision=_PRECISION)
    denom = jnp.einsum("vss->v", rho)
    return numer / denom


def _site_transfer(state: BatchedState, idx, skip_slot: int):
    """E[b, l, l', s, s'] at the given vertices: ψ ψ̄ with all incoming
    messages absorbed except on ``skip_slot`` (open site legs)."""
    D = state.degree
    t = state.tensors[idx]
    m = state.messages[idx]
    acc = t
    for k in range(D):
        if k != skip_slot:
            acc = _absorb(acc, m[:, k], 1 + k)
    lab = [_LETTERS[k] for k in range(D)]
    acc_lab = list(lab)
    acc_lab[skip_slot] = "o"
    conj_lab = list(lab)
    conj_lab[skip_slot] = "p"
    eq = f"v{''.join(acc_lab)}s,v{''.join(conj_lab)}z->vopsz"
    return jnp.einsum(eq, acc, jnp.conj(t), precision=_PRECISION)


def bond_expectations(
    spec: BatchedGraphSpec,
    state: BatchedState,
    op1: jax.Array,
    op2: jax.Array,
) -> jax.Array:
    """⟨op1 ⊗ op2⟩ for every graph edge (nearest-neighbor 2-site
    observables — the BP Steiner-tree contraction of `expect.jl:58-83`
    specialized to an edge, batched over all edges).

    Returns values in the order of ``spec.edges``."""
    out = []
    # bucket edges by (slot_u, slot_v) so the transfer construction is static
    buckets: dict = {}
    for pos, (iu, iv, su, sv) in enumerate(spec.edges):
        buckets.setdefault((su, sv), []).append((pos, iu, iv))
    results = [None] * len(spec.edges)
    for (su, sv), entries in sorted(buckets.items()):
        u_idx = jnp.asarray([e[1] for e in entries], dtype=jnp.int32)
        v_idx = jnp.asarray([e[2] for e in entries], dtype=jnp.int32)
        eu = _site_transfer(state, u_idx, su)  # [B, l, l', s, s']
        ev = _site_transfer(state, v_idx, sv)
        o1 = op1.astype(eu.dtype)
        o2 = op2.astype(eu.dtype)
        numer = jnp.einsum(
            "bopsz,zs,bopcx,xc->b", eu, o1, ev, o2, precision=_PRECISION
        )
        denom = jnp.einsum("bopss,bopcc->b", eu, ev, precision=_PRECISION)
        vals = numer / denom
        for j, e in enumerate(entries):
            results[e[0]] = vals[j]
    return jnp.stack(results)


def bond_rdms(spec: BatchedGraphSpec, state: BatchedState) -> jax.Array:
    """Trace-normalized 2-site RDMs ρ[e, s, s', c, c'] for every graph
    edge — the batched counterpart of ``reduced_density_matrix`` with
    ``alg="bp"`` on an edge's endpoints (`rdm.jl:49-70`: Steiner tree of
    two adjacent vertices = the edge itself).  Index order: (ket_u,
    bra_u, ket_v, bra_v), edges in ``spec.edges`` order."""
    buckets: dict = {}
    for pos, (iu, iv, su, sv) in enumerate(spec.edges):
        buckets.setdefault((su, sv), []).append((pos, iu, iv))
    d = state.tensors.shape[-1]
    results = [None] * len(spec.edges)
    for (su, sv), entries in sorted(buckets.items()):
        u_idx = jnp.asarray([e[1] for e in entries], dtype=jnp.int32)
        v_idx = jnp.asarray([e[2] for e in entries], dtype=jnp.int32)
        eu = _site_transfer(state, u_idx, su)  # [B, l, l', s, s']
        ev = _site_transfer(state, v_idx, sv)
        rho = jnp.einsum("bopsz,bopcx->bszcx", eu, ev, precision=_PRECISION)
        tr = jnp.einsum("bsscc->b", rho)
        rho = rho / tr[:, None, None, None, None]
        for j, e in enumerate(entries):
            results[e[0]] = rho[j]
    return jnp.stack(results).reshape(len(spec.edges), d, d, d, d)
