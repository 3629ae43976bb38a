"""Fused Pallas BP outgoing-messages kernel vs the XLA reference path
(interpret mode on CPU; the hardware A/B lives in scripts/chi64_anatomy.py).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensornetworkquantumsimulator_tpu.parallel import engine as E
from tensornetworkquantumsimulator_tpu.parallel.pallas_bp import (
    bp_kernel_supported,
    bp_outgoing_d3,
)
from tensornetworkquantumsimulator_tpu.parallel.structure import compile_graph
from tensornetworkquantumsimulator_tpu.utils.lattices import (
    heavy_hexagonal_lattice,
)


def _random_state(rng, V, chi, d):
    t = (
        rng.standard_normal((V, chi, chi, chi, d))
        + 1j * rng.standard_normal((V, chi, chi, chi, d))
    ).astype(np.complex64) / chi
    m = (
        rng.standard_normal((V, 3, chi, chi))
        + 1j * rng.standard_normal((V, 3, chi, chi))
    ).astype(np.complex64)
    m = m + np.conj(np.swapaxes(m, -1, -2))  # hermitian like BP messages
    return t, m


def test_gate_predicate():
    assert bp_kernel_supported(3, 64, 2, jnp.complex64)
    assert not bp_kernel_supported(4, 64, 2, jnp.complex64)
    assert not bp_kernel_supported(3, 10, 2, jnp.complex64)
    assert not bp_kernel_supported(3, 64, 2, jnp.complex128)


def test_kernel_matches_xla_outgoing():
    """m_out from the fused kernel == engine._outgoing_messages on a
    degree-3 chi=64 batch (interpret mode)."""
    rng = np.random.default_rng(5)
    V, chi, d = 3, 64, 2
    t, m = _random_state(rng, V, chi, d)

    got = np.asarray(
        bp_outgoing_d3(jnp.asarray(t), jnp.asarray(m), interpret=True)
    )
    ref = np.asarray(_xla_outgoing(t, m))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-5)


def _xla_outgoing(t, m):
    """The engine's XLA path, inlined on raw arrays (slots 0, 1, 2)."""
    state = E.BatchedState(jnp.asarray(t), jnp.asarray(m))
    D = 3
    accs = E._all_except_one(state.tensors, state.messages, list(range(D)))
    tconj = jnp.conj(state.tensors)
    outs = []
    import string

    letters = string.ascii_lowercase
    for j, acc in zip(range(D), accs):
        lab = [letters[k] for k in range(D)]
        acc_lab = list(lab)
        acc_lab[j] = "p"
        conj_lab = list(lab)
        conj_lab[j] = "q"
        eq = f"v{''.join(acc_lab)}s,v{''.join(conj_lab)}s->vpq"
        outs.append(
            jnp.einsum(eq, acc, tconj, precision=jax.lax.Precision.HIGHEST)
        )
    return jnp.stack(outs, axis=1)


def test_engine_routes_through_kernel(monkeypatch):
    """TNQS_BP_KERNEL=1: a full bp_iteration on a heavy-hex chi=64 state
    matches the default path (the kernel output feeds the same gather +
    normalize pipeline)."""
    monkeypatch.setenv("TNQS_BP_KERNEL", "0")
    g = heavy_hexagonal_lattice(2, 2)
    spec = compile_graph(g)
    assert spec.degree == 3
    rng = np.random.default_rng(7)
    V, chi, d = spec.num_vertices, 64, 2
    t, m = _random_state(rng, V, chi, d)
    state = E.BatchedState(jnp.asarray(t), jnp.asarray(m))

    ref = np.asarray(E.bp_iteration(spec, state))
    monkeypatch.setenv("TNQS_BP_KERNEL", "1")
    got = np.asarray(E.bp_iteration(spec, state))
    # f32 accumulation-order differences between the kernel's plain f32
    # dots and einsum's HIGHEST path; messages are entry-sum normalized
    # (~1e-2 magnitudes), so 1e-5 abs ≈ 1e-3 relative headroom
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-5)
