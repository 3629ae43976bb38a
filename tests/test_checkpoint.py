"""Checkpoint/resume round trips (SURVEY.md §5: new aux subsystem)."""

import jax.numpy as jnp
import numpy as np

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import named_grid, random_tensornetworkstate
from tensornetworkquantumsimulator_tpu.parallel import batched_product_state
from tensornetworkquantumsimulator_tpu.utils.checkpoint import (
    load_batched_state,
    load_state,
    save_batched_state,
    save_state,
)


def test_state_roundtrip(tmp_path):
    g = named_grid((3, 3))
    psi = random_tensornetworkstate(jnp.complex128, g, bond_dimension=3)
    path = str(tmp_path / "state.npz")
    save_state(path, psi)
    psi2 = load_state(path)
    assert psi2.graph() == psi.graph()
    n1 = tnqs.norm_sqr(psi, alg="exact")
    n2 = tnqs.norm_sqr(psi2, alg="exact")
    np.testing.assert_allclose(n1, n2, rtol=1e-12)
    z1 = tnqs.expect(psi, ("Z", [(2, 2)]), alg="exact")
    z2 = tnqs.expect(psi2, ("Z", [(2, 2)]), alg="exact")
    np.testing.assert_allclose(z1, z2, rtol=1e-12)


def test_extensionless_path_roundtrip(tmp_path):
    """np.savez appends '.npz'; save/load must agree on the final path."""
    g = named_grid((2, 2))
    spec, state = batched_product_state(g, chi=2, dtype=np.complex64)
    path = str(tmp_path / "ckpt")  # no extension
    save_batched_state(path, state)
    state2 = load_batched_state(path)
    np.testing.assert_array_equal(
        np.asarray(state.tensors), np.asarray(state2.tensors)
    )
    psi = random_tensornetworkstate(jnp.complex128, g, bond_dimension=2)
    spath = str(tmp_path / "state")  # no extension
    save_state(spath, psi)
    psi2 = load_state(spath)
    assert psi2.graph() == psi.graph()


def test_primed_index_relation_survives_reload(tmp_path):
    """An index and its primed copy must reload sharing one base id, so
    prime/noprime still map between them (ADVICE round 1)."""
    from tensornetworkquantumsimulator_tpu.models.tensornetwork import (
        TensorNetwork,
        TensorNetworkState,
    )
    from tensornetworkquantumsimulator_tpu.ops.index import Index
    from tensornetworkquantumsimulator_tpu.ops.tensor import Tensor
    from tensornetworkquantumsimulator_tpu.utils.graphs import NamedGraph

    i0 = Index(2, tags=("Site",))
    i1 = i0.prime()
    t = Tensor(np.eye(2), (i0, i1))
    g = NamedGraph(["v"])
    tns = TensorNetworkState(TensorNetwork({"v": t}, g), {"v": [i0, i1]})
    path = str(tmp_path / "primed.npz")
    save_state(path, tns)
    tns2 = load_state(path)
    s0, s1 = tns2.siteinds("v")
    assert s0.plev == 0 and s1.plev == 1
    assert s0.prime() == s1
    assert s1.noprime() == s0
    # loaded generic tensors stay numpy-backed (CLAUDE.md backend rule)
    assert isinstance(tns2["v"].data, np.ndarray)


def test_load_state_rejects_non_literal_vertices(tmp_path):
    """Checkpoints are data: vertex strings must parse with literal_eval,
    never execute (ADVICE round 1: eval on untrusted checkpoints)."""
    import json

    g = named_grid((2, 1))
    psi = random_tensornetworkstate(jnp.complex128, g, bond_dimension=2)
    path = str(tmp_path / "evil.npz")
    save_state(path, psi)
    with np.load(path) as data:
        arrays = {k: data[k] for k in data.files}
    meta = json.loads(bytes(arrays["__meta__"]).decode())
    meta["vertices"][0] = "__import__('os').getpid()"
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)
    try:
        load_state(path)
    except (ValueError, SyntaxError):
        pass  # rejected, as required
    else:
        raise AssertionError("malicious vertex string was not rejected")


def test_batched_state_roundtrip(tmp_path):
    g = named_grid((3, 3))
    spec, state = batched_product_state(g, chi=4, dtype=np.complex64)
    path = str(tmp_path / "batched.npz")
    save_batched_state(path, state)
    state2 = load_batched_state(path)
    np.testing.assert_array_equal(np.asarray(state.tensors), np.asarray(state2.tensors))
    np.testing.assert_array_equal(
        np.asarray(state.messages), np.asarray(state2.messages)
    )


def test_sharded_state_roundtrip(tmp_path):
    """Orbax per-shard save of a mesh-sharded state; restore directly into
    the target sharding (multi-chip resume, no host-side reshard)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tensornetworkquantumsimulator_tpu.parallel import (
        BatchedState,
        shard_spec,
    )
    from tensornetworkquantumsimulator_tpu.utils.checkpoint import (
        load_sharded_state,
        save_sharded_state,
    )

    S = 8
    g = named_grid((8, 4))
    sspec = shard_spec(g, S)
    _, state = batched_product_state(g, chi=3, dtype=np.complex64,
                                     spec=sspec.spec)
    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    sh = NamedSharding(mesh, P("v"))
    sharded = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    path = str(tmp_path / "sharded_ckpt")
    save_sharded_state(path, sharded)
    # restore INTO the sharding
    state2 = load_sharded_state(path, sharding=sh)
    assert state2.tensors.sharding == sh
    np.testing.assert_array_equal(
        np.asarray(sharded.tensors), np.asarray(state2.tensors)
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.messages), np.asarray(state2.messages)
    )
    # restore without a sharding (host/default layout)
    state3 = load_sharded_state(path)
    np.testing.assert_array_equal(
        np.asarray(sharded.tensors), np.asarray(state3.tensors)
    )
