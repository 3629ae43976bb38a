"""Mirrors reference `test/test_constructors.jl`."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    Index,
    NamedEdge,
    NamedGraph,
    TensorNetwork,
    TensorNetworkState,
    named_grid,
    named_hexagonal_lattice_graph,
    named_path_graph,
    random_tensornetwork,
    random_tensornetworkstate,
    siteinds,
    tensornetworkstate,
)
from tensornetworkquantumsimulator_tpu.ops import random_tensor

DTYPES = [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]


def test_network_from_tensors_infers_ring():
    i, j, k, l = Index(2), Index(2), Index(2), Index(2)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    a = random_tensor(ks[0], (i, j))
    b = random_tensor(ks[1], (j, k))
    c = random_tensor(ks[2], (k, l))
    d = random_tensor(ks[3], (l, i))
    t = TensorNetwork([a, b, c, d])
    assert isinstance(t, TensorNetwork)
    assert t.maxvirtualdim() == 2
    expected = named_path_graph(4).add_edge(NamedEdge(1, 4))
    assert t.graph() == expected


@pytest.mark.parametrize("dtype", DTYPES)
def test_random_tensornetwork(dtype):
    g = named_hexagonal_lattice_graph(3, 3)
    chi = 3
    psi = random_tensornetwork(dtype, g, bond_dimension=chi)
    assert isinstance(psi, TensorNetwork)
    assert psi.scalartype() == jnp.dtype(dtype)
    assert psi.graph() == g
    assert psi.maxvirtualdim() == 3
    assert all(psi[v].ndim == g.degree(v) for v in psi.vertices())

    # conjugated network contracts to the conjugate scalar
    psidag = psi.map_tensors(lambda t: t.dag()).map_virtualinds(lambda i: i.prime())
    z = tnqs.contract(psi, alg="exact")
    zdag = tnqs.contract(psidag, alg="exact")
    np.testing.assert_allclose(zdag, np.conj(z), rtol=1e-5)

    v = psi.vertices()[0]
    gref = psi.graph().copy()
    psi.rem_vertex_inplace(v)
    assert psi.graph() == gref.rem_vertex(v)


def test_siteinds():
    g = named_hexagonal_lattice_graph(3, 3)
    s = siteinds("S=1/2", g)
    assert set(s.keys()) == set(g.vertices())
    assert all(len(s[v]) == 1 and s[v][0].dim == 2 for v in g.vertices())


@pytest.mark.parametrize("dtype", DTYPES)
def test_random_tensornetworkstate(dtype):
    g = named_hexagonal_lattice_graph(3, 3)
    s = siteinds("S=1/2", g)
    chi = 3
    psi = random_tensornetworkstate(dtype, g, s, bond_dimension=chi)
    assert isinstance(psi, TensorNetworkState)
    assert psi.scalartype() == jnp.dtype(dtype)
    assert psi.graph() == g
    assert psi.maxvirtualdim() == 3
    assert all(psi[v].ndim == g.degree(v) + 1 for v in psi.vertices())
    assert all(psi.siteinds(v) == s[v] for v in psi.vertices())


@pytest.mark.parametrize("dtype", DTYPES)
def test_product_state(dtype):
    g = named_hexagonal_lattice_graph(3, 3)
    psi = tensornetworkstate(dtype, lambda v: "X+", g, "S=1/2")
    assert psi.maxvirtualdim() == 1
    assert psi.scalartype() == jnp.dtype(dtype)
    assert all(psi[v].ndim == g.degree(v) + 1 for v in psi.vertices())


def test_ghz_direct_sum_and_entanglement():
    g = named_hexagonal_lattice_graph(3, 3)
    s = siteinds("S=1/2", g)
    psi1 = tensornetworkstate(jnp.float64, lambda v: "↑", g, s)
    psi2 = tensornetworkstate(jnp.float64, lambda v: "↓", g, s)
    ghz = psi1 + psi2
    assert isinstance(ghz, TensorNetworkState)
    assert ghz.maxvirtualdim() == 2
    ee = tnqs.entanglement(ghz, ghz.edges()[0], alg="bp")
    np.testing.assert_allclose(ee, np.log(2), rtol=1e-8)
