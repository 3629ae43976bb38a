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
