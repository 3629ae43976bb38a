"""Contraction-order search tests: the native exact DP (all-subsets to
n=16, connected-subset netcon DP to n=40 — counterpart of the reference's
`TensorOperations.optimaltree`, `contraction_sequences.jl:15-26`) and its
fallback chain (opt_einsum cost-capped dp, greedy)."""

import math
import random
from collections import Counter

import numpy as np
import opt_einsum
import pytest

from tensornetworkquantumsimulator_tpu.native import (
    get_pathopt,
    optimal_path_native,
)
from tensornetworkquantumsimulator_tpu.ops import (
    Index,
    Tensor,
    contract,
    contraction_sequence,
)

sym = opt_einsum.get_symbol


def _path_cost(inputs, dims, ssa):
    """Total scalar-multiplication cost of an SSA path (the DP's metric)."""
    pool = [frozenset(s) for s in inputs]
    cnt = Counter(c for s in inputs for c in s)
    out = {c for c in cnt if cnt[c] == 1}
    cost = 0.0
    for (i, j) in ssa:
        a, b = pool[i], pool[j]
        cost += math.prod(dims[c] for c in (a | b))
        rest = [p for k, p in enumerate(pool) if p is not None and k not in (i, j)]
        outside = set().union(*rest) if rest else set()
        pool[i] = None
        pool[j] = None
        pool.append(frozenset(c for c in (a | b) if c in outside or c in out))
    return cost


def _oe_dp_cost(inputs, dims):
    eq = ",".join("".join(s) for s in inputs)
    shapes = [tuple(dims[c] for c in s) for s in inputs]
    _, info = opt_einsum.contract_path(eq, *shapes, shapes=True, optimize="dp")
    return float(info.opt_cost) / 2  # opt_einsum counts mul+add


def _random_net(rng, n):
    inputs = [[] for _ in range(n)]
    dims = {}
    si = 0
    for i in range(n - 1):  # spanning chain
        s = sym(si); si += 1
        inputs[i].append(s); inputs[i + 1].append(s)
        dims[s] = rng.choice([2, 3, 4])
    for _ in range(rng.randint(0, n)):  # extra shared indices
        i, j = rng.sample(range(n), 2)
        s = sym(si); si += 1
        inputs[i].append(s); inputs[j].append(s)
        dims[s] = rng.choice([2, 3])
    for i in range(n):  # dangling
        s = sym(si); si += 1
        inputs[i].append(s)
        dims[s] = rng.choice([2, 3])
    return inputs, dims


@pytest.mark.skipif(get_pathopt() is None, reason="no C++ toolchain")
def test_native_dp_matches_opt_einsum_small():
    rng = random.Random(7)
    for _ in range(15):
        n = rng.randint(3, 10)
        inputs, dims = _random_net(rng, n)
        ssa = optimal_path_native([tuple(s) for s in inputs], dims)
        assert ssa is not None
        assert _path_cost(inputs, dims, ssa) == pytest.approx(
            _oe_dp_cost(inputs, dims)
        )


@pytest.mark.skipif(get_pathopt() is None, reason="no C++ toolchain")
def test_native_dp_midsize_exact():
    """17-30 tensor sparse lists (the loop-correction / Steiner shapes the
    16-cap silently sent to greedy) get exact orders."""
    # theta graph: 2 branch vertices + three paths -> 18 tensors
    rng = random.Random(3)
    inputs = [[] for _ in range(18)]
    dims = {}
    si = 0
    nid = 2
    for plen in (7, 7, 5):
        prev = 0
        for _ in range(plen - 1):
            s = sym(si); si += 1
            inputs[prev].append(s); inputs[nid].append(s)
            dims[s] = rng.choice([2, 3])
            prev = nid
            nid += 1
        s = sym(si); si += 1
        inputs[prev].append(s); inputs[1].append(s)
        dims[s] = rng.choice([2, 3])
    ssa = optimal_path_native([tuple(s) for s in inputs], dims)
    assert ssa is not None
    assert _path_cost(inputs, dims, ssa) == pytest.approx(
        _oe_dp_cost(inputs, dims)
    )

    # ring of 24 with dangling legs (a loop-correction weight list shape)
    n = 24
    inputs = [[] for _ in range(n)]
    dims = {}
    si = 0
    for i in range(n):
        s = sym(si); si += 1
        inputs[i].append(s); inputs[(i + 1) % n].append(s)
        dims[s] = 3
        s = sym(si); si += 1
        inputs[i].append(s)
        dims[s] = 2
    ssa = optimal_path_native([tuple(s) for s in inputs], dims)
    assert ssa is not None
    assert len(ssa) == n - 1


@pytest.mark.skipif(get_pathopt() is None, reason="no C++ toolchain")
def test_native_dp_n48_ring_exact():
    """41-64 tensor regime (round-5 cap lift to the 64-bit-mask limit):
    a 48-ring with dangling legs solves exactly — the returned order must
    beat or match opt_einsum greedy and cost what the optimal interval
    split of a ring costs."""
    import opt_einsum as oe

    n = 48
    inputs = [[] for _ in range(n)]
    dims = {}
    si = 0
    for i in range(n):
        s = sym(si); si += 1
        inputs[i].append(s); inputs[(i + 1) % n].append(s)
        dims[s] = 3
        s = sym(si); si += 1
        inputs[i].append(s)
        dims[s] = 2
    ssa = optimal_path_native([tuple(s) for s in inputs], dims)
    assert ssa is not None
    assert len(ssa) == n - 1
    cost = _path_cost(inputs, dims, ssa)
    shapes = [tuple(dims[s] for s in sub) for sub in inputs]
    eq = ",".join("".join(sub) for sub in inputs) + "->" + "".join(
        s for sub in inputs for s in sub
        if sum(s in t for t in inputs) == 1
    )
    _, info = oe.contract_path(
        eq, *[__import__("numpy").empty(sh) for sh in shapes],
        optimize="greedy",
    )
    assert cost <= info.opt_cost


@pytest.mark.skipif(get_pathopt() is None, reason="no C++ toolchain")
def test_native_dp_disconnected_components():
    """Disjoint cycles (disconnected adjacency) contract per component then
    join by outer products."""
    inputs = []
    dims = {}
    si = 0
    for clen in (12, 9):
        base = len(inputs)
        inputs.extend([] for _ in range(clen))
        for i in range(clen):
            s = sym(si); si += 1
            inputs[base + i].append(s)
            inputs[base + (i + 1) % clen].append(s)
            dims[s] = 2
    ssa = optimal_path_native([tuple(s) for s in inputs], dims)
    assert ssa is not None
    assert len(ssa) == len(inputs) - 1


def test_contraction_sequence_midsize_value():
    """End-to-end: a 20-tensor ring through contraction_sequence +
    contract equals the dense einsum value (whatever search path served
    it — native, oe-dp fallback, or greedy)."""
    n = 20
    rng = np.random.default_rng(0)
    bonds = [Index(3) for _ in range(n)]
    ts = []
    for i in range(n):
        il, ir = bonds[i], bonds[(i + 1) % n]
        ts.append(Tensor(rng.normal(size=(3, 3)), (il, ir)))
    seq = contraction_sequence(ts, alg="optimal")
    assert len(seq) == n - 1
    val = contract(ts, seq).scalar()
    acc = np.asarray(ts[0].data)
    for t in ts[1:]:
        acc = acc @ np.asarray(t.data)
    np.testing.assert_allclose(val, np.trace(acc), rtol=1e-9)


def test_contraction_sequence_dense_fallback():
    """A dense 4x5 grid declines the native budget and must still return a
    valid exact-or-greedy order."""
    nx, ny = 4, 5
    idx = lambda x, y: x * ny + y
    bonds = {}
    inds = [[] for _ in range(nx * ny)]
    for x in range(nx):
        for y in range(ny):
            if x + 1 < nx:
                b = Index(2)
                inds[idx(x, y)].append(b)
                inds[idx(x + 1, y)].append(b)
            if y + 1 < ny:
                b = Index(2)
                inds[idx(x, y)].append(b)
                inds[idx(x, y + 1)].append(b)
    rng = np.random.default_rng(1)
    ts = [
        Tensor(rng.normal(size=tuple(i.dim for i in ii)), tuple(ii))
        for ii in inds
    ]
    seq = contraction_sequence(ts, alg="optimal")
    assert len(seq) == nx * ny - 1
    val = contract(ts, seq).scalar()
    pos = {}
    subs = []
    for ii in inds:
        sub = ""
        for b in ii:
            if b not in pos:
                pos[b] = sym(len(pos))
            sub += pos[b]
        subs.append(sub)
    eq = ",".join(subs) + "->"
    ref = opt_einsum.contract(eq, *[np.asarray(t.data) for t in ts])
    np.testing.assert_allclose(val, ref, rtol=1e-9)
