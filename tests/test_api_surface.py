"""Smaller API-surface parity checks vs the reference export list."""

import jax.numpy as jnp
import numpy as np
import pytest

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    BeliefPropagationCache,
    QuadraticForm,
    named_grid,
    random_tensornetworkstate,
    siteinds,
)
from tensornetworkquantumsimulator_tpu.ops import Index, make_hermitian, random_tensor
import jax


def test_expect_multi_observable_batch():
    g = named_grid((3, 3))
    psi = random_tensornetworkstate(jnp.complex128, g, bond_dimension=2)
    obs = [("Z", [(1, 1)]), ("X", [(2, 2)]), ("Z", [(3, 3)], 0.5)]
    vals = tnqs.expect(psi, obs, alg="bp")
    assert len(vals) == 3
    singles = [tnqs.expect(psi, o, alg="bp") for o in obs]
    np.testing.assert_allclose(np.asarray(vals), np.asarray(singles), rtol=1e-10)
    # zero-coefficient observables short-circuit
    assert tnqs.expect(psi, ("Z", [(1, 1)], 0), alg="bp") == 0


def test_norm_function():
    g = named_grid((3, 1))
    psi = random_tensornetworkstate(jnp.float64, g, bond_dimension=2)
    n = tnqs.norm(psi, alg="bp")
    np.testing.assert_allclose(n * n, tnqs.norm_sqr(psi, alg="exact"), rtol=1e-10)


def test_quadratic_form_with_operator():
    # on a tree BP is exact, so Z(QF with op) = <Z> * <psi|psi>
    g = named_grid((4, 1))
    psi = random_tensornetworkstate(jnp.float64, g, bond_dimension=2)
    qf = QuadraticForm(psi, lambda v: "Z" if v == (1, 1) else "I")
    bpc = BeliefPropagationCache(qf).update(maxiter=50, tolerance=1e-14)
    numer = bpc.partitionfunction()
    expected = tnqs.expect(psi, ("Z", [(1, 1)]), alg="exact") * tnqs.norm_sqr(
        psi, alg="exact"
    )
    np.testing.assert_allclose(numer, expected, rtol=1e-9)


def test_make_hermitian():
    i = Index(3)
    t = random_tensor(jax.random.PRNGKey(0), (i, i.prime()), dtype=jnp.complex128)
    h = make_hermitian(t)
    arr = np.asarray(h.data)
    np.testing.assert_allclose(arr, arr.conj().T, atol=1e-14)


def test_insert_and_combine_virtualinds():
    from tensornetworkquantumsimulator_tpu import TensorNetwork
    from tensornetworkquantumsimulator_tpu.ops import random_tensor as rt
    from tensornetworkquantumsimulator_tpu.utils import NamedEdge, NamedGraph

    i, j, k = Index(2), Index(2), Index(2)
    t1 = rt(jax.random.PRNGKey(1), (i, j))
    t2 = rt(jax.random.PRNGKey(2), (i, j, k))
    g = NamedGraph(["a", "b", "c"], [NamedEdge("a", "b"), NamedEdge("b", "c")])
    tn = TensorNetwork({"a": t1, "b": t2, "c": rt(jax.random.PRNGKey(3), (k,))}, g)
    # a-b share two indices: combine them into one
    assert len(tn.virtualinds(NamedEdge("a", "b"))) == 2
    tn.combine_virtualinds_inplace()
    assert len(tn.virtualinds(NamedEdge("a", "b"))) == 1
    assert tn.virtualind(NamedEdge("a", "b")).dim == 4

    # disconnected-in-index edge gets a trivial bond inserted
    g2 = NamedGraph(["x", "y"], [NamedEdge("x", "y")])
    tn2 = TensorNetwork(
        {"x": rt(jax.random.PRNGKey(4), (Index(2),)),
         "y": rt(jax.random.PRNGKey(5), (Index(2),))},
        g2,
    )
    assert not tn2.virtualinds(NamedEdge("x", "y"))
    tn2.insert_virtualinds_inplace()
    assert len(tn2.virtualinds(NamedEdge("x", "y"))) == 1


def test_algorithm_check_errors():
    g = named_grid((2, 2))
    psi = random_tensornetworkstate(jnp.float64, g, bond_dimension=2)
    with pytest.raises(ValueError):
        tnqs.truncate(psi, alg="exact", maxdim=2)
    with pytest.raises(ValueError):
        tnqs.norm_sqr(psi, alg="nonsense")


def test_reference_export_list_resolves():
    """Every symbol the reference exports
    (`src/TensorNetworkQuantumSimulator.jl:36-113`) has a top-level
    counterpart here (free-function delegates live in `api.py`; mutating
    `foo!` spellings map to the functional `foo`)."""
    reference_exports = """
        vertices edges add_edge degree apply_gates apply_circuit rem_vertex
        truncate expect is_tree expect_boundarymps expect_loopcorrect
        make_hermitian ket_network maxvirtualdim siteinds edge_color
        zerostate named_grid sample TensorNetworkState tensornetworkstate
        random_tensornetworkstate BeliefPropagationCache rescale message
        network update symmetric_gauge messages gauge_and_scale
        paulitensornetworkstate identitytensornetworkstate
        random_tensornetwork inner named_comb_tree
        named_hexagonal_lattice_graph named_path_graph neighbors center
        NamedGraph graph datatype scalartype BoundaryMPSCache TensorNetwork
        AbstractTensorNetwork partitionfunction contract norm_sqr
        map_virtualinds map_tensors normalize QuadraticForm BilinearForm
        sample_certified sample_directly_certified vertextype virtualind
        virtualinds nv heavy_hexagonal_lattice entanglement
        build_graph_from_circuit reduced_density_matrix rdm
    """.split()
    missing = [s for s in reference_exports if not hasattr(tnqs, s)]
    assert not missing, f"missing reference exports: {missing}"


def test_free_function_delegates():
    """The api.py delegates behave like the reference free functions."""
    g = named_grid((3, 2))
    psi = random_tensornetworkstate(jnp.float64, g, bond_dimension=2)
    assert set(tnqs.vertices(psi)) == set(psi.vertices())
    assert tnqs.nv(g) == 6
    assert tnqs.degree(g, (1, 1)) == 2
    assert not tnqs.is_tree(g)
    assert tnqs.vertextype(g) is tuple
    assert tnqs.scalartype(psi) == tnqs.datatype(psi)
    assert set(tnqs.neighbors(g, (1, 1))) == set(g.neighbors((1, 1)))

    cache = BeliefPropagationCache(psi)
    cache = tnqs.update(cache, maxiter=30, tolerance=1e-12)
    z = tnqs.partitionfunction(cache)
    np.testing.assert_allclose(
        complex(z), complex(tnqs.norm_sqr(psi, alg="bp")), rtol=1e-8
    )
    e = tnqs.edges(psi)[0]
    assert tnqs.message(cache, e) is not None
    assert len(tnqs.messages(cache)) > 0
    assert tnqs.network(cache) is not None

    g2 = tnqs.rem_vertex(g, (1, 1))
    assert g.nv() == 6 and g2.nv() == 5  # non-mutating

    val_b = tnqs.expect_boundarymps(psi, ("Z", [(2, 1)]), mps_bond_dimension=8)
    val = tnqs.expect(psi, ("Z", [(2, 1)]), alg="exact")
    np.testing.assert_allclose(np.real(val_b), np.real(val), atol=1e-6)


def test_free_function_delegates_transforms():
    """map_tensors / map_virtualinds / ket_network / maxvirtualdim /
    virtualind(s) free-function spellings."""
    g = named_grid((2, 2))
    psi = random_tensornetworkstate(jnp.float64, g, bond_dimension=3)
    assert tnqs.maxvirtualdim(psi) == 3
    e = tnqs.edges(psi)[0]
    assert tnqs.virtualind(psi, e).dim == 3
    assert len(tnqs.virtualinds(psi, e)) == 1

    psi2 = tnqs.map_tensors(lambda t: t * 2.0, psi)
    np.testing.assert_allclose(
        complex(tnqs.norm_sqr(psi2, alg="exact")),
        complex(tnqs.norm_sqr(psi, alg="exact")) * 2.0 ** (2 * 4),
        rtol=1e-9,
    )
    psi3 = tnqs.map_virtualinds(lambda i: i.prime(), psi)
    assert all(i.plev == 1 for ee in psi3.edges() for i in psi3.virtualinds(ee))

    qf = QuadraticForm(psi)
    assert tnqs.ket_network(qf) is qf.ket()
    assert tnqs.graph(qf) == psi.graph()
