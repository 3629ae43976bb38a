"""Batched TPU sampling: conditional bitstring generation under jit.

TPU-native redesign of the BP sampler (`sampling.jl:3-46`): the sequential
per-vertex conditioning loop becomes a ``lax.scan`` over vertices (project →
flooding-BP refresh → next), and independent samples are ``vmap``-ed over
PRNG keys — one XLA program drawing the whole batch of bitstrings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .engine import BatchedState, _LETTERS, _PRECISION, bp_iteration
from .structure import BatchedGraphSpec


def _local_rdm_at(spec: BatchedGraphSpec, tensors, messages, v):
    """ρ[s, s'] at a (dynamically indexed) vertex."""
    D = spec.degree
    t = tensors[v]  # [χ.., d]
    m = messages[v]  # [D, χ, χ]
    acc = t
    for k in range(D):
        acc2 = jnp.moveaxis(acc, k, -1)
        acc2 = jnp.einsum("...l,lm->...m", acc2, m[k], precision=_PRECISION)
        acc = jnp.moveaxis(acc2, -1, k)
    lab = "".join(_LETTERS[k] for k in range(D))
    return jnp.einsum(
        f"{lab}s,{lab}z->sz", acc, jnp.conj(t), precision=_PRECISION
    )


def make_bp_sampler(
    spec: BatchedGraphSpec,
    refresh_iters: int = 5,
    jit: bool = True,
):
    """Build ``sampler(state, keys) -> bitstrings [nsamples, V]``.

    ``state`` should hold converged BP messages (and ideally a
    gauged/normalized state); ``keys`` is a [nsamples, 2] PRNG key array.
    Each sample runs the reference's conditional chain: sample the local
    RDM's diagonal, project the site, refresh BP a few flooding iterations,
    move to the next vertex."""
    V = spec.num_vertices

    def sample_one(state: BatchedState, key):
        def step(carry, v):
            tensors, messages, key = carry
            rho = _local_rdm_at(spec, tensors, messages, v)
            probs = jnp.clip(jnp.real(jnp.diagonal(rho)), 0.0, None)
            probs = probs / jnp.sum(probs)
            key, sub = jax.random.split(key)
            config = jax.random.categorical(sub, jnp.log(probs + 1e-30))
            # project: ψ_v ← ψ_v ⋅ e_config (site axis is last)
            d_ = tensors.shape[-1]
            proj = jax.nn.one_hot(config, d_, dtype=tensors.dtype)
            tv = tensors[v]
            tv = tv * proj  # broadcast over the site axis
            tensors = tensors.at[v].set(tv)
            # flooding refresh
            st = BatchedState(tensors, messages)
            for _ in range(refresh_iters):
                messages = bp_iteration(spec, BatchedState(tensors, messages))
            return (tensors, messages, key), config

        order = jnp.arange(V)
        (_, _, _), configs = jax.lax.scan(
            step, (state.tensors, state.messages, key), order
        )
        return configs

    def sampler(state: BatchedState, keys):
        return jax.vmap(lambda k: sample_one(state, k))(keys)

    return jax.jit(sampler) if jit else sampler


# ---------------------------------------------------------------------------
# density-matrix (noisy-state) sampling — batched counterpart of
# sampling.sample_density_matrix
# ---------------------------------------------------------------------------


def make_rho_sampler(
    spec: BatchedGraphSpec,
    chi: int,
    dtype,
    *,
    refresh_iters: int = 8,
    init_maxiter: int = 60,
    tolerance: float | None = None,
    jit: bool = True,
):
    """Build ``sampler(state, keys) -> (bitstrings [S, V], logps [S])``
    drawing computational-basis bitstrings from a batched density-matrix
    ("PauliRho", d=4) coefficient state.

    TPU redesign of :func:`sampling.sample_density_matrix` (which itself
    has no reference counterpart — the reference samples wavefunctions
    only, `sampling.jl:3-46`): the flat linear-functional network
    Tr[ρ·⊗w_v] is the engine's ψ̄ϕ sandwich against a bond-1 product bra
    (trace vector [1,0,0,0] per site), so ONE sandwich-BP fixed point
    (shared across the whole sample batch) seeds a ``lax.scan`` over
    vertices — local projector weights → categorical draw → swap the
    bra's site vector to the chosen projector [1,0,0,±1]/2 → a fixed
    number of flooding refresh iterations — and samples ``vmap`` over
    PRNG keys: the entire batch is one XLA program.

    ``logps[i]`` telescopes the conditional probabilities:
    log(⟨x|ρ|x⟩ / Tr ρ) wherever BP is exact (trees); ``refresh_iters``
    should cover the graph diameter for tree-exactness (the generic
    sampler re-converges BP after every projection).
    """
    import numpy as np

    from .overlap import _sandwich_bp, _sandwich_outgoing
    from .engine import _normalize_messages, default_batched_tolerance, \
        identity_messages

    V, D = spec.num_vertices, spec.degree
    if tolerance is None:
        tolerance = default_batched_tolerance(dtype)
    # factory-scope tables stay numpy (axon constant-embedding rule)
    nbr = spec.nbr_array()
    nbr_slot = spec.nbr_slot_array()
    mask = spec.mask_array()
    bra0 = np.zeros((V,) + (chi,) * D + (4,), dtype=np.dtype(dtype))
    bra0[(slice(None),) + (0,) * D + (0,)] = 1.0
    # diagonal projectors Π_b = (I + (−1)^b Z)/2 as Pauli site vectors
    proj = np.asarray(
        [[0.5, 0.0, 0.0, 0.5], [0.5, 0.0, 0.0, -0.5]], dtype=np.dtype(dtype)
    )

    def _refresh(t_ket, bra_c, m):
        for _ in range(refresh_iters):
            m_out = _sandwich_outgoing(spec, t_ket, bra_c, m)
            m = _normalize_messages(
                m_out[jnp.asarray(nbr), jnp.asarray(nbr_slot)],
                jnp.asarray(mask),
                hermitize=False,
            )
        return m

    def sample_one(t_ket, m_init, key):
        proj_j = jnp.asarray(proj)

        def step(carry, v):
            bra_c, m, key, logp = carry
            # absorb incoming sandwich messages into ρ_v's ket tensor;
            # the bra side is the one-hot (0,)*D bond slot, so the local
            # scalar against any site vector w is acc[(0,)*D] · w
            acc = t_ket[v]
            for k in range(D):
                acc2 = jnp.moveaxis(acc, k, -1)
                acc2 = jnp.einsum(
                    "...l,lm->...m", acc2, m[v, k], precision=_PRECISION
                )
                acc = jnp.moveaxis(acc2, -1, k)
            vec = acc[(0,) * D]  # [4]
            w = jnp.real(vec @ proj_j.T.astype(vec.dtype))  # [2]
            # the two weights share one (possibly negative-scaled) flat
            # environment — only the ratio matters.  Divide the common
            # sign out FIRST, then clip any residual negative weight
            # (loopy-BP artifact) and renormalize (ADVICE r3): clipping
            # after normalization left p summing < 1 (logp inconsistent
            # with the categorical draw), and a fully degenerate pair
            # (sum == 0) now falls back to a uniform draw, not NaN.
            s = jnp.sum(w)
            wc = jnp.clip(jnp.where(s < 0, -w, w), 0.0, None)
            p = wc / jnp.maximum(jnp.sum(wc), 1e-300)
            p = jnp.where(jnp.sum(wc) > 0, p, jnp.full_like(p, 0.5))
            key, sub = jax.random.split(key)
            config = jax.random.categorical(sub, jnp.log(p + 1e-300))
            logp = logp + jnp.log(jnp.maximum(p[config], 1e-300))
            bra_c = bra_c.at[(v,) + (0,) * D].set(
                proj_j[config].astype(bra_c.dtype)
            )
            # skip the flooding refresh after the FINAL vertex projection
            # (ADVICE r3): the refreshed messages are discarded.  v is the
            # unbatched scan iterate, so under the sample vmap this stays
            # a true cond (predicate unbatched), saving ~1/V of the work.
            m = jax.lax.cond(
                v < V - 1, lambda args: _refresh(*args), lambda args: args[2],
                (t_ket, bra_c, m),
            )
            return (bra_c, m, key, logp), config

        rdt = jnp.zeros((), t_ket.dtype).real.dtype
        carry0 = (jnp.asarray(bra0), m_init, key, jnp.zeros((), rdt))
        (_, _, _, logp), configs = jax.lax.scan(
            step, carry0, jnp.arange(V)
        )
        return configs, logp

    def sampler(state: BatchedState, keys):
        t_ket = state.tensors
        m0 = identity_messages(V, D, chi, t_ket.dtype)
        m_init = _sandwich_bp(
            spec, t_ket, jnp.asarray(bra0), m0, init_maxiter, tolerance, 0.0
        )
        return jax.vmap(lambda k: sample_one(t_ket, m_init, k))(keys)

    return jax.jit(sampler) if jit else sampler


def make_sharded_rho_sampler(sampler, mesh, axis: str = "s"):
    """Wrap a :func:`make_rho_sampler` sampler for SPMD execution over
    the SAMPLE axis — the density-matrix counterpart of
    `certified_sampling.make_sharded_sampler`.

    Draws are embarrassingly parallel, so the key batch shards over
    ``mesh[axis]`` and the (replicated) state's initial sandwich fixed
    point is recomputed per device — cheap relative to the per-sample
    conditioning scans, and avoiding it would need a broadcast anyway.
    Same bitstrings/logps as the single-chip sampler for the same keys.

    ``keys`` must have leading dimension divisible by the mesh axis size.
    """
    from jax.sharding import PartitionSpec as P

    from .sharded_bmps import _shard_map

    smap = _shard_map(
        lambda tensors, messages, keys: sampler(
            BatchedState(tensors, messages), keys
        ),
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=(P(axis), P(axis)),
    )

    @jax.jit
    def sharded(state: BatchedState, keys):
        if keys.shape[0] % mesh.shape[axis] != 0:
            raise ValueError(
                f"{keys.shape[0]} keys not divisible by mesh axis "
                f"{axis!r} ({mesh.shape[axis]})"
            )
        return smap(state.tensors, state.messages, keys)

    return sharded
