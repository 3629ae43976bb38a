"""Loop-corrected partition functions (reference
`examples/loopcorrections.jl`, `src/MessagePassing/loopcorrection.jl`)."""

import jax.numpy as jnp
import numpy as np

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import named_grid, random_tensornetworkstate
from tensornetworkquantumsimulator_tpu.utils.graphs import (
    edgeinduced_subgraphs_no_leaves,
)


def test_subgraph_enumeration_square():
    g = named_grid((3, 3))
    egs = edgeinduced_subgraphs_no_leaves(g, 4)
    # exactly the four plaquettes at size 4
    assert len(egs) == 4
    assert all(eg.ne() == 4 for eg in egs)
    egs7 = edgeinduced_subgraphs_no_leaves(g, 7)
    assert len(egs7) > 4  # 6-loops and theta-shaped 7-edge subgraphs appear


def test_line_graph_no_corrections():
    g = named_grid((4, 1))
    psi = random_tensornetworkstate(jnp.complex64, g, "S=1/2", bond_dimension=3)
    psi = tnqs.normalize(psi, alg="bp")
    n_bp = tnqs.norm_sqr(psi, alg="bp")
    n_lc = tnqs.norm_sqr(psi, alg="loopcorrections", max_configuration_size=6)
    np.testing.assert_allclose(n_bp, n_lc, rtol=1e-6)


def test_loop_corrections_improve_on_bp():
    g = named_grid((3, 3))
    psi = random_tensornetworkstate(jnp.complex128, g, "S=1/2", bond_dimension=3)
    psi = tnqs.normalize(psi, alg="bp")
    n_exact = tnqs.norm_sqr(psi, alg="exact")
    n_bp = tnqs.norm_sqr(psi, alg="bp")
    n_lc = tnqs.norm_sqr(psi, alg="loopcorrections", max_configuration_size=7)
    assert abs(n_lc - n_exact) < abs(n_bp - n_exact)
    np.testing.assert_allclose(n_lc, n_exact, rtol=2e-2)
