"""Explicit halo-exchange sharded BP vs single-device flooding BP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    named_grid,
    random_tensornetworkstate,
    tensornetworkstate,
)
from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
from tensornetworkquantumsimulator_tpu.parallel import (
    BatchedState,
    batched_from_tns,
    batched_product_state,
    bp_update,
    local_expectations,
)
from tensornetworkquantumsimulator_tpu.parallel.sharding import (
    make_sharded_bp_update,
    shard_spec,
)


@pytest.fixture
def mesh8():
    devices = np.array(jax.devices()[:8])
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(devices, ("v",))


def test_sharded_bp_matches_flooding(mesh8):
    g = named_grid((8, 4))
    chi = 3
    sspec = shard_spec(g, num_shards=8)
    spec = sspec.spec

    # random-ish state: apply one layer of gates first via product state + Rx
    _, state = batched_product_state(g, chi=chi, dtype=np.complex64, spec=spec)
    # give bonds some structure: random tensors instead of product
    key = jax.random.PRNGKey(7)
    t = jax.random.normal(key, state.tensors.shape, jnp.float32) + 1j * (
        jax.random.normal(jax.random.PRNGKey(8), state.tensors.shape, jnp.float32)
    )
    state = state._replace(tensors=t.astype(jnp.complex64))

    ref = bp_update(spec, state, maxiter=80, tolerance=1e-12)

    shard = NamedSharding(mesh8, P("v"))
    sharded_state = jax.device_put(state, shard)
    update = make_sharded_bp_update(
        sspec, mesh8, maxiter=80, tolerance=1e-12
    )
    out = update(sharded_state)

    np.testing.assert_allclose(
        np.asarray(out.messages), np.asarray(ref.messages), atol=2e-5
    )

    # expectations agree too
    z_ref = local_expectations(spec, ref, jnp.asarray(op_matrix("Z", 2)))
    z_out = local_expectations(spec, out, jnp.asarray(op_matrix("Z", 2)))
    np.testing.assert_allclose(np.asarray(z_out), np.asarray(z_ref), atol=1e-5)


def test_sharded_bp_periodic(mesh8):
    g = named_grid((8, 3), periodic=True)  # wraps: ring of strips
    chi = 2
    sspec = shard_spec(g, num_shards=8)
    spec = sspec.spec
    _, state = batched_product_state(g, chi=chi, dtype=np.complex64, spec=spec)

    ref = bp_update(spec, state, maxiter=40, tolerance=1e-10)
    shard = NamedSharding(mesh8, P("v"))
    update = make_sharded_bp_update(sspec, mesh8, maxiter=40, tolerance=1e-10)
    out = update(jax.device_put(state, shard))
    np.testing.assert_allclose(
        np.asarray(out.messages), np.asarray(ref.messages), atol=1e-5
    )


def test_shard_spec_padding_small_lattice():
    """shard_spec(pad=True): a 10-vertex path over 4 shards pads to 12
    with inert rows; sharded BP equals unsharded on the real vertices."""
    from tensornetworkquantumsimulator_tpu.parallel.sharding import (
        PAD_VERTEX,
        make_sharded_bp_update,
        shard_spec,
    )

    g = named_grid((10, 1))
    sspec = shard_spec(g, 4, pad=True)
    spec = sspec.spec
    assert spec.num_vertices == 12
    assert sum(1 for v in spec.vertices
               if isinstance(v, tuple) and v and v[0] == PAD_VERTEX) == 2

    psi = random_tensornetworkstate(jnp.complex128, g, "S=1/2",
                                    bond_dimension=2)
    _, state = batched_from_tns(psi, chi=2, spec=spec)
    ref = bp_update(spec, state, maxiter=30, tolerance=1e-12)

    mesh = Mesh(np.array(jax.devices()[:4]), ("v",))
    sh = NamedSharding(mesh, P("v"))
    sharded = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    update = make_sharded_bp_update(sspec, mesh, maxiter=30, tolerance=1e-12)
    out = update(sharded)
    np.testing.assert_allclose(
        np.asarray(out.messages), np.asarray(ref.messages), atol=1e-10
    )
