"""Contraction-order search (trace-time, never inside jit).

TPU-native counterpart of the reference's `contraction_sequences.jl`
(`optimaltree` / EinExprs Greedy).  Paths are found with ``opt_einsum`` and
memoised on the structural signature of the tensor list, so the per-gate /
per-message searches in the BP hot loop amortise to dict lookups.

The returned sequence is SSA-style: a list of ``(i, j)`` pairs indexing into a
pool that starts as the input list and grows by one result per step.
"""

from __future__ import annotations

from collections import Counter
from typing import Sequence

import opt_einsum

_PATH_CACHE: dict = {}
_MAX_CACHE = 200_000


def _ssa_path(path, n):
    """Convert an opt_einsum shrinking-list path to SSA pairs."""
    pool = list(range(n))
    ssa = []
    nxt = n
    for step in path:
        step = sorted(step, reverse=True)
        ids = [pool[k] for k in step]
        for k in step:
            pool.pop(k)
        # opt_einsum steps can have >2 operands (rare); fold left
        acc = ids[-1]
        for other in ids[-2::-1]:
            ssa.append((acc, other))
            acc = nxt
            nxt += 1
        pool.append(acc)
    return ssa


def contraction_sequence(tensors: Sequence, alg: str = "optimal", **kwargs):
    """Find a pairwise contraction order for ``tensors``.

    alg="optimal"  -> opt_einsum dynamic-programming (exact) for small lists,
                      falling back to branch/greedy beyond that
                      (reference `contraction_sequences.jl:15-26`).
    alg="einexpr"/"greedy" -> greedy (reference `:28-34`).
    """
    n = len(tensors)
    if n <= 1:
        return []
    if n == 2:
        return [(0, 1)]

    # map indices to einsum symbols (first-appearance order, so the cache key
    # is invariant to concrete index ids — only the structure matters)
    symbols: dict = {}
    inputs = []
    for t in tensors:
        sub = []
        for i in t.inds:
            k = (i.id, i.plev)
            if k not in symbols:
                symbols[k] = opt_einsum.get_symbol(len(symbols))
            sub.append(symbols[k])
        inputs.append("".join(sub))
    counts = Counter(c for sub in inputs for c in sub)
    output = "".join(
        dict.fromkeys(c for sub in inputs for c in sub if counts[c] == 1)
    )
    eq = ",".join(inputs) + "->" + output
    shapes = tuple(t.shape for t in tensors)

    key = (eq, shapes, alg)
    hit = _PATH_CACHE.get(key)
    if hit is not None:
        return hit

    seq = None
    if alg == "optimal" and n <= 64:
        # native exact DP (C++, `native/pathopt.cpp`) — the counterpart of
        # the reference's TensorOperations.optimaltree: all-subsets DP to
        # n=16, connected-subset (netcon) DP to n=64 (the 64-bit subset
        # mask limit) with budgeted enumeration (falls through to the
        # cost-capped dp/greedy chain on overflow — sparse structures
        # like chains/trees/ladders solve exactly at n=41-64, dense
        # ones fail fast)
        from ..native import optimal_path_native

        dims = {}
        for sub, shape in zip(inputs, shapes):
            for c, dim in zip(sub, shape):
                dims[c] = dim
        seq = optimal_path_native([tuple(sub) for sub in inputs], dims)
    if seq is None:
        if alg == "optimal":
            # opt_einsum's cost-capped DP is exact and handles dense
            # mid-size lists the budgeted native search declines
            # (measured 0.1-7 s at n=20-25, memoised); greedy beyond
            optimize = "dp" if n <= 24 else "greedy"
        elif alg in ("einexpr", "greedy"):
            optimize = "greedy"
        else:
            optimize = alg
        path, _ = opt_einsum.contract_path(
            eq, *shapes, shapes=True, optimize=optimize
        )
        seq = _ssa_path(path, n)
    if len(_PATH_CACHE) < _MAX_CACHE:
        _PATH_CACHE[key] = seq
    return seq
