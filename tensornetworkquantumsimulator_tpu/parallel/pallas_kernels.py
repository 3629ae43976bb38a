"""Pallas TPU kernels (prototype layer; SURVEY §2 "native layer").

Round-1 measurement established the constraints (STATUS.md): Mosaic
rejects complex64 outright, and below χ≈64 the per-edge matrices sit under
the (8, 128) f32 tile, so custom kernels only pay in the χ≥64 regime where
operands are MXU-shaped.  This module is that regime's prototype:

- :func:`complex_matmul` — batched complex matmul as ONE Pallas kernel on
  re/im planes using the 3-multiplication Gauss trick
  (P1=Ar·Br, P2=Ai·Bi, P3=(Ar+Ai)(Br+Bi); C = (P1−P2) + i(P3−P1−P2)) —
  25% fewer MXU FLOPs than XLA's 4-matmul complex lowering, and the
  split/recombine arithmetic stays in VMEM instead of materializing
  intermediate planes in HBM.

Use :func:`complex_matmul` with ``interpret=True`` on CPU (tests) and
measure on hardware via ``scripts/microbench.py cpallas B N M``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gauss_kernel(ar_ref, ai_ref, br_ref, bi_ref, cr_ref, ci_ref):
    ar, ai = ar_ref[0], ai_ref[0]
    br, bi = br_ref[0], bi_ref[0]
    p1 = jnp.dot(ar, br, preferred_element_type=jnp.float32)
    p2 = jnp.dot(ai, bi, preferred_element_type=jnp.float32)
    p3 = jnp.dot(ar + ai, br + bi, preferred_element_type=jnp.float32)
    cr_ref[0] = p1 - p2
    ci_ref[0] = p3 - p1 - p2


@functools.partial(jax.jit, static_argnames=("interpret",))
def complex_matmul(a: jax.Array, b: jax.Array, interpret: bool = False):
    """C[B, N, M] = A[B, N, K] @ B[B, K, M] for complex64 batches.

    One Pallas kernel over the batch grid; operands must be MXU-friendly
    (N, K, M multiples of 8 with the last dim ideally 128-aligned — the
    χ≥64 simple-update regime).  ``interpret=True`` runs the Pallas
    interpreter (CPU tests)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, K = a.shape
    _, K2, M = b.shape
    assert K == K2
    ar, ai = jnp.real(a).astype(jnp.float32), jnp.imag(a).astype(jnp.float32)
    br, bi = jnp.real(b).astype(jnp.float32), jnp.imag(b).astype(jnp.float32)

    a_spec = pl.BlockSpec((1, N, K), lambda i: (i, 0, 0))
    b_spec = pl.BlockSpec((1, K, M), lambda i: (i, 0, 0))
    c_spec = pl.BlockSpec((1, N, M), lambda i: (i, 0, 0))
    cr, ci = pl.pallas_call(
        _gauss_kernel,
        grid=(B,),
        in_specs=[a_spec, a_spec, b_spec, b_spec],
        out_specs=[c_spec, c_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, M), jnp.float32),
            jax.ShapeDtypeStruct((B, N, M), jnp.float32),
        ],
        interpret=interpret,
    )(ar, ai, br, bi)
    return (cr + 1j * ci).astype(a.dtype)
