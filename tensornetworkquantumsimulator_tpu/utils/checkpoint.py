"""Checkpoint / resume for long dynamics runs.

The reference has no serialization (SURVEY.md §5) — states are in-memory
objects.  Long Trotter evolutions are the main workload here, so both state
flavors get on-disk checkpoints:

- :class:`~..parallel.engine.BatchedState` (the TPU hot path):
  :func:`save_batched_state` / :func:`load_batched_state` write a numpy
  ``.npz`` (single-host, gathers to host memory);
  :func:`save_sharded_state` / :func:`load_sharded_state` write an orbax
  directory checkpoint with per-shard IO — a mesh-sharded state saves
  without funnelling through one host and restores directly into a target
  `jax.sharding` layout (multi-chip resume);
- the generic :class:`~..models.TensorNetworkState` saves tensors + index
  metadata + graph structure to ``.npz``.
"""

from __future__ import annotations

import ast
import json

import jax.numpy as jnp
import numpy as np

from ..models.tensornetwork import TensorNetwork, TensorNetworkState
from ..ops.index import Index
from ..ops.tensor import Tensor
from ..utils.graphs import NamedEdge, NamedGraph


def _npz_path(path: str) -> str:
    """np.savez appends '.npz' to extension-less paths; normalize so the
    same path string round-trips through save and load."""
    return path if path.endswith(".npz") else path + ".npz"


def save_batched_state(path: str, state) -> None:
    np.savez(
        _npz_path(path),
        tensors=np.asarray(state.tensors),
        messages=np.asarray(state.messages),
    )


def load_batched_state(path: str):
    from ..parallel.engine import BatchedState

    with np.load(_npz_path(path)) as data:
        return BatchedState(
            jnp.asarray(data["tensors"]), jnp.asarray(data["messages"])
        )


def save_sharded_state(path: str, state) -> None:
    """Orbax directory checkpoint of a (possibly mesh-sharded) BatchedState.

    Each device writes its own shards (zarr/OCDBT) — no host gather, so a
    pod-scale state checkpoints at aggregate-disk bandwidth.  ``path`` must
    not already exist."""
    import os

    import orbax.checkpoint as ocp

    ocp.PyTreeCheckpointer().save(
        os.path.abspath(path), {"tensors": state.tensors,
                                "messages": state.messages}
    )


def load_sharded_state(path: str, sharding=None):
    """Restore a :func:`save_sharded_state` checkpoint.

    ``sharding`` is an optional `jax.sharding.Sharding` (applied to both
    fields) or a ``(tensors, messages)`` pair — the arrays land directly in
    that layout (per-shard reads), ready for the sharded engine without a
    host-side resharding step."""
    import os

    import jax
    import orbax.checkpoint as ocp

    from ..parallel.engine import BatchedState

    ckptr = ocp.PyTreeCheckpointer()
    apath = os.path.abspath(path)
    if sharding is None:
        # Without a target sharding, restore to HOST numpy (then wrap) —
        # letting orbax repopulate device sharding from the sharding file
        # is unsafe across topologies and warns (VERDICT r3 hygiene).
        meta = ckptr.metadata(apath).item_metadata.tree
        tree = ckptr.restore(
            apath,
            restore_args={
                k: ocp.RestoreArgs(restore_type=np.ndarray) for k in meta
            },
        )
        tree = {k: jnp.asarray(v) for k, v in tree.items()}
    else:
        sh_t, sh_m = (
            sharding if isinstance(sharding, (tuple, list)) else (sharding,) * 2
        )
        meta = ckptr.metadata(apath).item_metadata.tree

        def _spec(m, sh):
            return jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sh)

        tree = ckptr.restore(
            apath,
            restore_args=ocp.checkpoint_utils.construct_restore_args(
                {
                    "tensors": _spec(meta["tensors"], sh_t),
                    "messages": _spec(meta["messages"], sh_m),
                }
            ),
        )
    return BatchedState(tree["tensors"], tree["messages"])


def save_state(path: str, tns: TensorNetworkState) -> None:
    """Serialize a TensorNetworkState (tensors + index wiring + graph)."""
    arrays = {}
    meta: dict = {"vertices": [], "edges": [], "inds": {}, "siteinds": []}
    index_ids: dict = {}

    def reg(i: Index) -> str:
        key = f"i{i.id}_{i.plev}"
        if key not in index_ids:
            index_ids[key] = {"dim": i.dim, "tags": list(map(str, i.tags)), "plev": i.plev, "id": i.id}
        return key

    for k, v in enumerate(tns.vertices()):
        meta["vertices"].append(repr(v))
        arrays[f"t{k}"] = np.asarray(tns[v].data)
        meta["inds"][f"t{k}"] = [reg(i) for i in tns[v].inds]
        meta["siteinds"].append([reg(i) for i in tns.siteinds(v)])
    vs = tns.vertices()
    pos = {v: i for i, v in enumerate(vs)}
    for e in tns.edges():
        meta["edges"].append([pos[e.src], pos[e.dst]])
    meta["index_table"] = index_ids
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(_npz_path(path), **arrays)


def load_state(path: str) -> TensorNetworkState:
    with np.load(_npz_path(path)) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        # One fresh base Index per *saved id*, plev variants derived via
        # setprime, so a saved index and its primed copy reload sharing a
        # single new id and prime/noprime still map between them.
        base_by_saved_id: dict = {}
        table = {}
        for key, info in meta["index_table"].items():
            base = base_by_saved_id.get(info["id"])
            if base is None:
                base = Index(dim=info["dim"], tags=tuple(info["tags"]))
                base_by_saved_id[info["id"]] = base
            table[key] = base.setprime(info["plev"])
        # Vertices are coordinate tuples / ints / strings; literal_eval only
        # (a checkpoint is data, not code).
        vertices = [ast.literal_eval(v) for v in meta["vertices"]]
        tensors = {}
        siteinds = {}
        for k, v in enumerate(vertices):
            inds = tuple(table[key] for key in meta["inds"][f"t{k}"])
            # generic-engine tensor data stays numpy-backed (CLAUDE.md):
            # eager jnp wrapping would trigger per-op XLA compiles as bond
            # shapes evolve
            tensors[v] = Tensor(np.asarray(data[f"t{k}"]), inds)
            siteinds[v] = [table[key] for key in meta["siteinds"][k]]
        g = NamedGraph(vertices)
        for (i, j) in meta["edges"]:
            g.add_edge_inplace(NamedEdge(vertices[i], vertices[j]))
        return TensorNetworkState(TensorNetwork(tensors, g), siteinds)
