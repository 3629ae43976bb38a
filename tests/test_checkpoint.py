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
