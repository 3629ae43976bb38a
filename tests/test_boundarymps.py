"""Mirrors reference `test/test_boundarymps.jl`."""

import jax.numpy as jnp
import numpy as np
import pytest

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    BoundaryMPSCache,
    TensorNetwork,
    TensorNetworkState,
    named_grid,
    random_tensornetwork,
    random_tensornetworkstate,
)

DTYPES = [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]


def _rtol(dtype):
    return 1e-3 if jnp.finfo(jnp.zeros((), dtype).real.dtype).bits == 32 else 1e-8


@pytest.mark.parametrize("dtype", DTYPES)
def test_bmps_flat_network(dtype):
    g = named_grid((3, 3))
    psi = random_tensornetwork(dtype, g, bond_dimension=2)
    cache = BoundaryMPSCache(psi, 4)
    assert isinstance(cache.network(), TensorNetwork)
    assert cache.graph() == g  # 3x3 grid partitions are already paths
    cache = cache.update()
    z_bmps = cache.partitionfunction()
    z_exact = tnqs.contract(psi, alg="exact")
    np.testing.assert_allclose(z_bmps, z_exact, rtol=_rtol(dtype))
    np.testing.assert_allclose(
        tnqs.contract(psi, alg="boundarymps", mps_bond_dimension=4),
        z_exact,
        rtol=_rtol(dtype),
    )


@pytest.mark.parametrize("dtype", DTYPES)
def test_bmps_state(dtype):
    g = named_grid((3, 3))
    psi = random_tensornetworkstate(dtype, g, bond_dimension=2)
    cache = BoundaryMPSCache(psi, 4)
    assert isinstance(cache.network(), TensorNetworkState)
    cache = cache.update()
    z_bmps = cache.partitionfunction()
    z_exact = tnqs.norm_sqr(psi, alg="exact")
    np.testing.assert_allclose(z_bmps, z_exact, rtol=_rtol(dtype))
    np.testing.assert_allclose(
        tnqs.norm_sqr(psi, alg="boundarymps", mps_bond_dimension=4),
        z_exact,
        rtol=_rtol(dtype),
    )

    vs = [(2, 1), (2, 3)]
    rho_1 = tnqs.rdm(cache, vs)
    rho_2 = tnqs.reduced_density_matrix(
        psi, vs, alg="boundarymps", mps_bond_dimension=4
    )
    rho_exact = tnqs.reduced_density_matrix(psi, vs, alg="exact")
    eps = float(jnp.finfo(jnp.zeros((), dtype).real.dtype).eps)
    assert (rho_1 - rho_2).norm() <= 300 * eps
    assert (rho_1 - rho_exact).norm() <= 300 * eps


def test_bmps_cylinder_ring_partitions():
    """Ring partitions graph (cylinder, periodic rows): the validity check
    accepts it (`boundarympscache.jl:66-78`) and partition-loop BP through
    the MPS strands converges to the exact value on a physical state."""
    from tensornetworkquantumsimulator_tpu import edge_color, named_grid

    g = named_grid((4, 3), periodic=(True, False))
    assert len(g.edges()) == 4 * 3 * 2 - 4  # wrap in rows only
    layer = [("Rx", [v], 0.3) for v in g.vertices()]
    for grp in edge_color(g, 5):
        layer += [("Rzz", p, 0.25) for p in grp]
    psi = tnqs.tensornetworkstate(jnp.complex128, lambda v: "↑", g)
    for _ in range(2):
        psi, _ = tnqs.apply_circuit(
            layer,
            psi,
            apply_kwargs=dict(maxdim=4, cutoff=1e-12, normalize_tensors=False),
        )
    val = tnqs.expect(
        psi, ("Z", [(2, 2)]), alg="boundarymps", mps_bond_dimension=16
    )
    val_exact = tnqs.expect(psi, ("Z", [(2, 2)]), alg="exact")
    np.testing.assert_allclose(np.real(val), np.real(val_exact), atol=1e-9)


def test_bmps_triangular_multibond_interfaces():
    """Triangular lattices put TWO bonds between a vertex and the adjacent
    row (the diagonal + the vertical) — the case the batched planar engine
    fences out (`parallel/boundarymps.py`) and routes here: the generic
    cache's MPS strands carry multi-bond interfaces like the reference's
    MPO strands (`boundarympscache.jl:554-569`), exactly at full rank."""
    from tensornetworkquantumsimulator_tpu import (
        random_tensornetworkstate,
        triangular_lattice,
    )

    g = triangular_lattice(3, 3)
    tnqs.seed(3)
    psi = random_tensornetworkstate(
        jnp.complex128, g, "S=1/2", bond_dimension=2
    )
    psi = tnqs.normalize(psi, alg="bp")
    val = tnqs.expect(
        psi, ("Z", [(2, 2)]), alg="boundarymps", mps_bond_dimension=16
    )
    val_exact = tnqs.expect(psi, ("Z", [(2, 2)]), alg="exact")
    np.testing.assert_allclose(np.real(val), np.real(val_exact), atol=1e-10)
