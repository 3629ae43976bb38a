"""Bond truncation on the batched TPU engine.

Batched counterpart of `src/truncate.jl:12-38` (BP flavor): truncation is
an identity two-site gate applied to every edge, grouped by edge color with
a flooding-BP refresh between groups, so each group is one vmapped simple
update with the target χ/cutoff."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .engine import apply_color_group, bp_update
from .structure import BatchedGraphSpec


def batched_truncate(
    spec: BatchedGraphSpec,
    state,
    chi: int,
    cutoff: float = 0.0,
    bp_maxiter: int = 30,
    bp_tolerance: float | None = None,
    normalize_tensors: bool = True,
):
    """Truncate every bond to χ/cutoff via identity gates (`truncate.jl:12-38`).

    ``chi`` must equal the state's buffer χ (static shapes); truncation to a
    smaller rank is expressed through ``cutoff`` or by converting into a
    smaller buffer with `batched_from_tns`.  Returns (state, errors)."""
    d = state.tensors.shape[-1]
    gate = jnp.asarray(np.eye(d * d).reshape(d, d, d, d), state.tensors.dtype)
    errs = []
    for group in spec.color_groups:
        state = bp_update(spec, state, maxiter=bp_maxiter, tolerance=bp_tolerance)
        state, err = apply_color_group(
            state, group, gate, chi=chi, cutoff=cutoff,
            normalize_tensors=normalize_tensors,
        )
        errs.append(err)
    state = bp_update(spec, state, maxiter=bp_maxiter, tolerance=bp_tolerance)
    return state, jnp.concatenate(errs) if errs else jnp.zeros((0,))
