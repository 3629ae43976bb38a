"""Mirrors reference `test/test_truncate.jl`: truncation fidelities ∈ [0,1],
boundary-MPS truncation ≥ BP truncation, maxdim respected."""

import jax.numpy as jnp
import numpy as np

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    named_hexagonal_lattice_graph,
    random_tensornetworkstate,
)


def test_truncate():
    g = named_hexagonal_lattice_graph(2, 2)
    psi = random_tensornetworkstate(jnp.complex128, g, "S=1/2", bond_dimension=3)
    psi = tnqs.gauge_and_scale(psi)

    psi_bp = tnqs.truncate(
        psi, alg="bp", maxdim=2, cutoff=1e-10, normalize_tensors=False
    )
    psi_bmps = tnqs.truncate(
        psi,
        alg="boundarymps",
        maxdim=2,
        cutoff=1e-10,
        normalize_tensors=False,
        gauge_state=False,
        mps_bond_dimension=9,
    )

    def fidelity(phi):
        ip = tnqs.inner(phi, psi, alg="exact")
        denom = np.sqrt(
            abs(tnqs.norm_sqr(phi, alg="exact")) * abs(tnqs.norm_sqr(psi, alg="exact"))
        )
        f = ip / denom
        return float(np.real(f * np.conj(f)))

    f_bp = fidelity(psi_bp)
    f_bmps = fidelity(psi_bmps)
    assert 0 <= f_bp <= 1 + 1e-10
    assert 0 <= f_bmps <= 1 + 1e-10
    assert f_bmps >= f_bp - 1e-6
    assert psi_bp.maxvirtualdim() <= 2
    assert psi_bmps.maxvirtualdim() <= 2
