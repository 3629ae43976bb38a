"""Mirrors reference `test/test_sampling.jl`: product states sample
deterministically; GHZ samples are all-0/all-1 and importance weights have
mean = norm² with tiny variance."""

import statistics

import jax.numpy as jnp
import numpy as np

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    edge_color,
    named_grid,
    named_hexagonal_lattice_graph,
    sample,
    sample_certified,
    siteinds,
    tensornetworkstate,
)


def test_product_state_sampling_deterministic():
    g = named_hexagonal_lattice_graph(2, 2)
    psi = tensornetworkstate(jnp.complex128, lambda v: "↑", g)
    psi = tnqs.gauge_and_scale(psi)
    bmps = sample(
        psi,
        1,
        alg="boundarymps",
        norm_mps_bond_dimension=1,
        projected_mps_bond_dimension=1,
        gauge_state=False,
    )[0]
    assert all(bmps[v] == 0 for v in g.vertices())

    bp = sample(psi, 1, alg="bp", gauge_state=False)[0]
    assert all(bp[v] == 0 for v in g.vertices())


def test_ghz_sampling():
    g = named_grid((3, 3))
    s = siteinds("S=1/2", g)
    psi1 = tensornetworkstate(jnp.float64, lambda v: "↑", g, s)
    psi2 = tensornetworkstate(jnp.float64, lambda v: "↓", g, s)
    psi = psi1 + psi2
    psi = tnqs.gauge_and_scale(psi)

    nsamples = 5
    bp_samples = sample(psi, nsamples, alg="bp", gauge_state=False)
    assert len(bp_samples) == nsamples
    assert all(set(b.keys()) == set(g.vertices()) for b in bp_samples)
    for b in bp_samples:
        vals = {b[v] for v in g.vertices()}
        assert vals == {0} or vals == {1}

    certified = sample_certified(
        psi,
        nsamples,
        alg="boundarymps",
        norm_mps_bond_dimension=4,
        projected_mps_bond_dimension=4,
    )
    p_qs = [c["poverq"] for c in certified]
    bitstrings = [c["bitstring"] for c in certified]
    for b in bitstrings:
        vals = {b[v] for v in g.vertices()}
        assert vals == {0} or vals == {1}
    assert statistics.pstdev(p_qs) < 1e-8
    np.testing.assert_allclose(
        statistics.mean(p_qs),
        tnqs.norm_sqr(psi, alg="boundarymps", mps_bond_dimension=4),
        rtol=1e-6,
    )


def test_certified_sampling_complex_state():
    """Certified importance weights on a genuinely COMPLEX state: the
    earlier suite only sampled (effectively real) GHZ states, so the
    complex boundary-MPS sampling path was uncovered.  Note p/q flatness is
    gauge-invariant (importance weights self-correct), so gauge-convention
    correctness is guarded by tests/test_batched_gauge.py instead."""
    from tensornetworkquantumsimulator_tpu import random_tensornetworkstate
    from tensornetworkquantumsimulator_tpu.engines.beliefpropagation import (
        BeliefPropagationCache,
        default_bp_update_kwargs,
    )

    g = named_grid((3, 3))
    tnqs.seed(23)
    psi = random_tensornetworkstate(jnp.complex128, g, "S=1/2", bond_dimension=3)
    psi = tnqs.normalize(psi, alg="bp")

    # complex messages: imaginary parts must be present for this test to
    # exercise the complex gauge path
    cache = BeliefPropagationCache(psi).update(**default_bp_update_kwargs(psi))
    max_imag = max(
        float(np.max(np.abs(np.imag(np.asarray(m.data)))))
        for m in cache.messages().values()
    )
    assert max_imag > 1e-3

    nsamples = 6
    certified = sample_certified(
        psi,
        nsamples,
        alg="boundarymps",
        norm_mps_bond_dimension=9,
        projected_mps_bond_dimension=9,
    )
    p_qs = [c["poverq"] for c in certified]
    # at full interface rank the sampler is exact: p/q is the same constant
    # (= the state's norm squared) for every sample
    assert statistics.pstdev(p_qs) / abs(statistics.mean(p_qs)) < 1e-6
    np.testing.assert_allclose(
        statistics.mean(p_qs),
        tnqs.norm_sqr(psi, alg="boundarymps", mps_bond_dimension=9),
        rtol=1e-5,
    )
