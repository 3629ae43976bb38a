"""Batched symmetric gauge + batched truncation (TPU engine), cross-validated
against the generic `gauge.py` / `truncate.py` semantics."""

import jax.numpy as jnp
import numpy as np

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import named_grid, random_tensornetworkstate
from tensornetworkquantumsimulator_tpu.engines.beliefpropagation import (
    BeliefPropagationCache,
    default_bp_update_kwargs,
)
from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
from tensornetworkquantumsimulator_tpu.parallel import (
    batched_from_tns,
    bp_update,
    local_expectations,
)
from tensornetworkquantumsimulator_tpu.parallel.gauge import batched_symmetric_gauge
from tensornetworkquantumsimulator_tpu.parallel.truncate import batched_truncate


def _converged_batched(seed=5, chi=3, shape=(3, 3)):
    g = named_grid(shape)
    tnqs.seed(seed)
    psi = random_tensornetworkstate(jnp.complex128, g, "S=1/2", bond_dimension=chi)
    cache = BeliefPropagationCache(psi).update(**default_bp_update_kwargs(psi))
    spec, state = batched_from_tns(psi, chi=chi, messages=cache.messages())
    return g, psi, cache, spec, state


def test_gauge_preserves_observables():
    g, psi, cache, spec, state = _converged_batched()
    op = np.asarray(op_matrix("Z", 2))
    z_before = np.asarray(local_expectations(spec, state, op))
    gauged, spectra = batched_symmetric_gauge(spec, state)
    z_after = np.asarray(local_expectations(spec, gauged, op))
    np.testing.assert_allclose(z_after, z_before, atol=1e-9)
    # spectra are positive and descending
    s = np.asarray(spectra)
    assert (s > 0).all()
    assert (np.diff(s, axis=-1) <= 1e-12).all()


def test_gauge_is_bp_fixed_point():
    """In the Vidal gauge the diagonal messages are (close to) a BP fixed
    point: one flooding refresh barely moves them."""
    g, psi, cache, spec, state = _converged_batched()
    gauged, spectra = batched_symmetric_gauge(spec, state)
    refreshed = bp_update(spec, gauged, maxiter=30)
    op = np.asarray(op_matrix("Z", 2))
    # the input fixed point is converged to fidelity tol 1e-8 (~1e-4 in
    # amplitude), so a refresh may drift by that much — not more
    np.testing.assert_allclose(
        np.asarray(local_expectations(spec, refreshed, op)),
        np.asarray(local_expectations(spec, gauged, op)),
        atol=1e-4,
    )


def test_gauge_spectra_match_generic():
    g, psi, cache, spec, state = _converged_batched()
    _gauged, spectra = batched_symmetric_gauge(spec, state)

    from tensornetworkquantumsimulator_tpu.gauge import symmetric_gauge_inplace
    from tensornetworkquantumsimulator_tpu.utils.graphs import NamedEdge

    gauged_cache = symmetric_gauge_inplace(cache.copy())
    pos = {v: i for i, v in enumerate(spec.vertices)}
    for ei, (iu, iv, su, sv) in enumerate(spec.edges):
        u, v = spec.vertices[iu], spec.vertices[iv]
        m = gauged_cache.message(NamedEdge(u, v))
        s_gen = np.sort(np.real(np.diag(np.asarray(m.array(tuple(m.inds))))))[::-1]
        s_bat = np.sort(np.asarray(spectra[ei]))[::-1]
        # generic normalizes nothing extra; spectra match up to fp noise
        np.testing.assert_allclose(s_bat, s_gen, rtol=1e-8, atol=1e-10)


def test_batched_truncate_identity_when_chi_suffices():
    g, psi, cache, spec, state = _converged_batched()
    op = np.asarray(op_matrix("Z", 2))
    z_before = np.asarray(local_expectations(spec, state, op))
    out, errs = batched_truncate(spec, state, chi=state.chi, cutoff=0.0)
    z_after = np.asarray(local_expectations(spec, out, op))
    np.testing.assert_allclose(np.asarray(errs), 0.0, atol=1e-10)
    # identity gates + BP refreshes drift within the 1e-8-fidelity window
    np.testing.assert_allclose(z_after, z_before, atol=1e-4)


def test_batched_truncate_cutoff_discards():
    """A GHZ-like weakly-entangled state truncates with small error and the
    observables stay close."""
    g = named_grid((3, 3))
    tnqs.seed(9)
    psi = random_tensornetworkstate(jnp.complex128, g, "S=1/2", bond_dimension=4)
    cache = BeliefPropagationCache(psi).update(**default_bp_update_kwargs(psi))
    spec, state = batched_from_tns(psi, chi=4, messages=cache.messages())
    out, errs = batched_truncate(spec, state, chi=4, cutoff=1e-3)
    assert np.asarray(errs).max() < 0.2
    op = np.asarray(op_matrix("Z", 2))
    z0 = np.asarray(local_expectations(spec, state, op))
    z1 = np.asarray(local_expectations(spec, out, op))
    assert np.max(np.abs(z0 - z1)) < 0.2
