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


def test_expect_loopcorrections_exact_on_single_loop():
    """On a 2x2 grid the only leaf-free subgraph is the 4-cycle itself, so
    the size-4 loop series is the EXACT contraction — for the norm AND for
    the QuadraticForm numerator (`_expect_loopcorrections`; the reference
    exports expect_loopcorrect but never defines it)."""
    import tensornetworkquantumsimulator_tpu as tnqs

    g = named_grid((2, 2))
    tnqs.seed(21)
    psi = random_tensornetworkstate(jnp.complex128, g, bond_dimension=3)
    obs = ("Z", [(1, 1)])
    val_exact = tnqs.expect(psi, obs, alg="exact")
    val_loop = tnqs.expect(
        psi, obs, alg="loopcorrections", max_configuration_size=4,
        cache_update_kwargs=dict(maxiter=200, tolerance=1e-14),
    )
    np.testing.assert_allclose(
        complex(val_loop), complex(val_exact), rtol=1e-8
    )
    # free-function spelling
    val_api = tnqs.expect_loopcorrect(
        psi, obs, max_configuration_size=4,
        cache_update_kwargs=dict(maxiter=200, tolerance=1e-14),
    )
    np.testing.assert_allclose(complex(val_api), complex(val_loop), rtol=1e-12)


def test_expect_loopcorrections_improves_on_bp():
    """On a loopy 3x3 grid the corrected expectation is closer to exact
    than plain BP."""
    import tensornetworkquantumsimulator_tpu as tnqs

    g = named_grid((3, 3))
    tnqs.seed(22)
    psi = random_tensornetworkstate(jnp.complex128, g, bond_dimension=2)
    obs = ("Z", [(2, 2)])
    kw = dict(cache_update_kwargs=dict(maxiter=300, tolerance=1e-14))
    val_exact = complex(tnqs.expect(psi, obs, alg="exact"))
    val_bp = complex(tnqs.expect(psi, obs, alg="bp", **kw))
    val_loop = complex(tnqs.expect(
        psi, obs, alg="loopcorrections", max_configuration_size=8, **kw
    ))
    assert abs(val_loop - val_exact) < abs(val_bp - val_exact)


def test_loop_corrections_on_triangular_lattice():
    """Triangles (3-cycles) are BP's worst case — the shortest loops the
    enumeration produces.  On a 3×3 triangular patch the size-5 series
    (triangles + squares + pentagons) must beat plain BP against exact."""
    from tensornetworkquantumsimulator_tpu import triangular_lattice

    g = triangular_lattice(3, 3)
    egs = edgeinduced_subgraphs_no_leaves(g, 3)
    assert len(egs) == 8  # 4 square plaquettes × 2 triangles each
    tnqs.seed(7)
    psi = random_tensornetworkstate(jnp.complex128, g, "S=1/2", bond_dimension=2)
    psi = tnqs.normalize(psi, alg="bp")
    n_exact = tnqs.norm_sqr(psi, alg="exact")
    n_bp = tnqs.norm_sqr(psi, alg="bp")
    n_lc = tnqs.norm_sqr(psi, alg="loopcorrections", max_configuration_size=5)
    assert abs(n_lc - n_exact) < abs(n_bp - n_exact)
