"""Mirrors reference `test/test_expect.jl`: BP == exact on trees, != on loopy
graphs; boundary MPS == exact at sufficient rank for 1- and 2-site
observables."""

import jax.numpy as jnp
import numpy as np
import pytest

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    named_grid,
    named_hexagonal_lattice_graph,
    random_tensornetworkstate,
)

GRAPHS = [
    (named_grid((4, 1)), "line"),
    (named_hexagonal_lattice_graph(2, 2), "hexagonal"),
    (named_grid((4, 4)), "square"),
]


@pytest.mark.parametrize("g,g_str", GRAPHS, ids=[s for _, s in GRAPHS])
def test_expect_backends(g, g_str):
    chi = 2
    psi = random_tensornetworkstate(jnp.complex64, g, "S=1/2", bond_dimension=chi)
    v_centre = g.center()[0]

    sz_exact = tnqs.expect(psi, ("Z", v_centre), alg="exact")
    sz_bp = tnqs.expect(psi, ("Z", v_centre), alg="bp")

    if g.is_tree():
        np.testing.assert_allclose(sz_bp, sz_exact, rtol=1e-4)
    else:
        assert abs(sz_bp - sz_exact) > 1e-10

    rmps = 16
    sz_bmps = tnqs.expect(
        psi, ("Z", v_centre), alg="boundarymps", mps_bond_dimension=rmps
    )
    np.testing.assert_allclose(sz_bmps, sz_exact, rtol=5e-4)

    if not g.is_tree():
        v_n = g.neighbors(v_centre)[0]
        zz_exact = tnqs.expect(psi, ("ZZ", [v_centre, v_n]), alg="exact")
        zz_bmps = tnqs.expect(
            psi, ("ZZ", [v_centre, v_n]), alg="boundarymps", mps_bond_dimension=rmps
        )
        np.testing.assert_allclose(zz_bmps, zz_exact, rtol=5e-4)
