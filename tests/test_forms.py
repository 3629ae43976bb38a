"""Mirrors reference `test/test_forms.jl`."""

import jax.numpy as jnp
import numpy as np
import pytest

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    BeliefPropagationCache,
    BilinearForm,
    BoundaryMPSCache,
    QuadraticForm,
    named_comb_tree,
    named_grid,
    random_tensornetworkstate,
    siteinds,
)

DTYPES = [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]


def _rtol(dtype):
    return 1e-3 if jnp.finfo(jnp.zeros((), dtype).real.dtype).bits == 32 else 1e-8


@pytest.mark.parametrize("dtype", DTYPES)
def test_quadratic_form(dtype):
    g = named_grid((3, 3))
    s = siteinds("S=1/2", g)
    psi = random_tensornetworkstate(dtype, g, s, bond_dimension=2)
    psi = tnqs.normalize(psi, alg="bp")
    qf = QuadraticForm(psi)
    assert qf.scalartype() == jnp.dtype(dtype)
    assert qf.graph() == g

    bpc = BeliefPropagationCache(qf).update()
    np.testing.assert_allclose(
        bpc.partitionfunction(), tnqs.norm_sqr(psi, alg="bp"), rtol=_rtol(dtype)
    )

    bmps = BoundaryMPSCache(qf, 16).update()
    np.testing.assert_allclose(
        bmps.partitionfunction(), tnqs.norm_sqr(psi, alg="exact"), rtol=_rtol(dtype)
    )


@pytest.mark.parametrize("dtype", DTYPES)
def test_bilinear_form(dtype):
    g = named_comb_tree((3, 3))
    s = siteinds("S=1/2", g)
    psi = random_tensornetworkstate(dtype, g, s, bond_dimension=3)
    phi = random_tensornetworkstate(dtype, g, s, bond_dimension=4)
    psi = tnqs.normalize(psi, alg="bp")
    phi = tnqs.normalize(phi, alg="bp")
    pf = BilinearForm(psi, phi)
    assert pf.scalartype() == jnp.dtype(dtype)
    assert pf.graph() == g

    bpc = BeliefPropagationCache(pf).update()
    np.testing.assert_allclose(
        bpc.partitionfunction(),
        tnqs.inner(psi, phi, alg="bp"),
        rtol=_rtol(dtype),
    )
    # tree: BP inner product is exact
    np.testing.assert_allclose(
        tnqs.inner(psi, phi, alg="bp"),
        tnqs.inner(psi, phi, alg="exact"),
        rtol=_rtol(dtype),
    )
