"""Conversions between the generic named-index state and the batched
static-shape state (cross-validation bridge between the two engines)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..engines.beliefpropagation import BeliefPropagationCache
from ..models.tensornetwork import TensorNetwork, TensorNetworkState
from ..ops.index import Index
from ..ops.tensor import Tensor
from ..utils.graphs import NamedEdge
from .engine import BatchedState
from .structure import BatchedGraphSpec, compile_graph


def batched_product_state(
    g,
    chi: int,
    state_fn=None,
    dtype=np.complex64,
    spec: BatchedGraphSpec | None = None,
    d: int = 2,
) -> tuple:
    """Build a product-state BatchedState entirely host-side (numpy) and
    upload once — the TPU-native path for initial states (avoids any eager
    device work; the axon backend only supports compiled programs well).

    ``state_fn`` maps a vertex to a state string ("↑", "X+", ...) or vector;
    default is all-up."""
    from ..models.sites import state_vector

    if spec is None:
        spec = compile_graph(g)
    if state_fn is None:
        state_fn = lambda v: "↑"
    V, D = spec.num_vertices, spec.degree
    tensors = np.zeros((V,) + (chi,) * D + (d,), dtype=dtype)
    for i, v in enumerate(spec.vertices):
        if not g.has_vertex(v):  # inert shard-padding row (sharding.PAD_VERTEX)
            tensors[(i,) + (0,) * D + (0,)] = 1.0
            continue
        local = state_fn(v)
        vec = state_vector(local, d) if isinstance(local, str) else np.asarray(local)
        tensors[(i,) + (0,) * D] = vec.astype(dtype)
    msgs = np.broadcast_to(np.eye(chi, dtype=dtype), (V, D, chi, chi)).copy()
    return spec, BatchedState(jnp.asarray(tensors), jnp.asarray(msgs))


def batched_from_tns(
    tns: TensorNetworkState,
    chi: int,
    spec: BatchedGraphSpec | None = None,
    dtype=None,
    messages: dict | None = None,
) -> tuple:
    """Pack a TensorNetworkState into a BatchedState (bonds zero-padded to χ;
    dummy slots supported on index 0 with identity messages).

    Returns (spec, state)."""
    if spec is None:
        spec = compile_graph(tns.graph())
    V, D = spec.num_vertices, spec.degree
    tg = tns.graph()
    d = tns.siteinds(
        next(v for v in spec.vertices if tg.has_vertex(v))
    )[0].dim
    if dtype is None:
        dtype = tns.scalartype()

    nbr = spec.nbr_array()
    mask = spec.mask_array()
    tensors = np.zeros((V,) + (chi,) * D + (d,), dtype=dtype)
    msgs = np.broadcast_to(np.eye(chi, dtype=dtype), (V, D, chi, chi)).copy()
    for i, v in enumerate(spec.vertices):
        if not tg.has_vertex(v):  # inert shard-padding row
            tensors[(i,) + (0,) * D + (0,)] = 1.0
            continue
        t = tns[v]
        sind = tns.siteinds(v)[0]
        bond_inds = []
        for k in range(D):
            if mask[i, k]:
                w = spec.vertices[nbr[i, k]]
                vinds = tns.virtualinds(NamedEdge(v, w))
                if len(vinds) != 1:
                    raise ValueError("batched engine needs one index per edge")
                bond_inds.append(vinds[0])
            else:
                bond_inds.append(None)
        order = [b for b in bond_inds if b is not None] + [sind]
        arr = np.asarray(t.array(tuple(order)))
        # expand into the padded buffer
        dst_slices = []
        src_shape = []
        it = iter(range(arr.ndim - 1))
        full = np.zeros((chi,) * D + (d,), dtype=dtype)
        idx = []
        for k in range(D):
            if bond_inds[k] is not None:
                idx.append(slice(0, bond_inds[k].dim))
            else:
                idx.append(slice(0, 1))
        idx.append(slice(None))
        # arr axes correspond to real bonds in slot order then site; dummy
        # axes need expansion
        expand_axes = [k for k in range(D) if bond_inds[k] is None]
        for ax in expand_axes:
            arr = np.expand_dims(arr, axis=ax)
        full[tuple(idx)] = arr
        tensors[i] = full

    if messages is not None:
        for i, v in enumerate(spec.vertices):
            for k in range(D):
                if not mask[i, k]:
                    continue
                w = spec.vertices[nbr[i, k]]
                m = messages.get(NamedEdge(w, v))
                if m is None:
                    continue
                l = tns.virtualinds(NamedEdge(v, w))[0]
                arr = np.asarray(m.array((l, l.prime())))
                buf = np.zeros((chi, chi), dtype=dtype)
                buf[: l.dim, : l.dim] = arr
                msgs[i, k] = buf

    return spec, BatchedState(jnp.asarray(tensors), jnp.asarray(msgs))


def batched_to_tns(
    spec: BatchedGraphSpec,
    state: BatchedState,
    g,
    siteinds: dict,
) -> TensorNetworkState:
    """Unpack a BatchedState into a TensorNetworkState (full χ bonds kept;
    dummy slots sliced at index 0)."""
    V, D = spec.num_vertices, spec.degree
    chi = state.chi
    nbr = spec.nbr_array()
    mask = spec.mask_array()
    bond_index: dict = {}
    for (iu, iv, su, sv) in spec.edges:
        l = Index(chi)
        bond_index[(iu, su)] = l
        bond_index[(iv, sv)] = l
    tensors = {}
    for i, v in enumerate(spec.vertices):
        arr = np.asarray(state.tensors[i])
        inds = []
        for k in range(D):
            if mask[i, k]:
                inds.append(bond_index[(i, k)])
            else:
                arr = np.take(arr, 0, axis=len(inds))
        sind = siteinds[v][0]
        tensors[v] = Tensor(jnp.asarray(arr), tuple(inds) + (sind,))
    return TensorNetworkState(TensorNetwork(tensors, g.copy()), siteinds)


def batched_messages_to_cache(
    spec: BatchedGraphSpec, state: BatchedState, tns: TensorNetworkState
) -> BeliefPropagationCache:
    """Wrap an unpacked state in a BP cache carrying the batched messages."""
    cache = BeliefPropagationCache(tns)
    nbr = spec.nbr_array()
    mask = spec.mask_array()
    for i, v in enumerate(spec.vertices):
        for k in range(spec.degree):
            if not mask[i, k]:
                continue
            w = spec.vertices[nbr[i, k]]
            l = tns.virtualinds(NamedEdge(v, w))[0]
            m = Tensor(state.messages[i, k], (l, l.prime()))
            cache.setmessage(NamedEdge(w, v), m)
    return cache
