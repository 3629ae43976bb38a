"""Batched sandwich-BP overlaps vs the generic BilinearForm `inner`."""

import jax
import jax.numpy as jnp
import numpy as np

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import named_grid, random_tensornetworkstate
from tensornetworkquantumsimulator_tpu.parallel import (
    batched_from_tns,
    batched_inner,
    batched_loschmidt_echo,
)


def _two_states(g, chi=3, dtype=jnp.complex128):
    from tensornetworkquantumsimulator_tpu import siteinds

    s = siteinds("S=1/2", g)  # shared sites: BilinearForm needs them
    psi = random_tensornetworkstate(
        dtype, g, s, bond_dimension=chi, key=jax.random.PRNGKey(0)
    )
    phi = random_tensornetworkstate(
        dtype, g, s, bond_dimension=chi, key=jax.random.PRNGKey(1)
    )
    spec, ks = batched_from_tns(psi, chi=chi)
    _, kf = batched_from_tns(phi, chi=chi, spec=spec)
    return psi, phi, spec, ks, kf


def _val(log_abs, phase):
    return float(np.exp(np.asarray(log_abs))) * np.exp(
        1j * float(np.asarray(phase))
    )


def test_batched_inner_matches_generic_bp():
    """Truncation-fidelity scenario (the physical use of `inner` on loopy
    graphs): phi = truncate(psi).  Random-state sandwiches are NOT tested
    here — BP on them is ill-conditioned (the generic engine itself lands
    ~10x from exact, and every schedule/damping finds a different fixed
    point); nearby states are the well-posed regime."""
    g = named_grid((3, 4))
    psi, _phi, spec, ks, _ = _two_states(g)
    psi = tnqs.normalize(psi, alg="bp")
    phi = tnqs.truncate(psi, alg="bp", maxdim=2)
    _, ks = batched_from_tns(psi, chi=3, spec=spec)
    _, kf = batched_from_tns(phi, chi=3, spec=spec)
    got = _val(*batched_inner(spec, psi=ks, phi=kf, maxiter=300,
                              tolerance=1e-14))
    want = tnqs.inner(
        psi, phi, alg="bp",
        cache_update_kwargs=dict(maxiter=400, tolerance=1e-14),
    )
    np.testing.assert_allclose(got, complex(want), rtol=1e-6)


def test_batched_inner_matches_exact_on_tree():
    # BP is exact on trees: the sandwich overlap must hit the exact value
    from tensornetworkquantumsimulator_tpu.utils.lattices import named_comb_tree

    g = named_comb_tree((3, 3))
    psi, phi, spec, ks, kf = _two_states(g)
    got = _val(*batched_inner(spec, psi=ks, phi=kf, maxiter=200,
                              tolerance=1e-14))
    want = tnqs.inner(psi, phi, alg="exact")
    np.testing.assert_allclose(got, complex(want), rtol=1e-9)


def test_self_overlap_is_norm_sqr():
    from tensornetworkquantumsimulator_tpu.parallel.loopcorrection import (
        batched_partitionfunction,
    )
    from tensornetworkquantumsimulator_tpu.parallel import bp_update

    g = named_grid((3, 3))
    psi, _, spec, ks, _ = _two_states(g)
    got = _val(*batched_inner(spec, psi=ks, phi=ks, maxiter=200,
                              tolerance=1e-14))
    st = bp_update(spec, ks, maxiter=200, tolerance=1e-14)
    want = complex(np.asarray(batched_partitionfunction(spec, st)))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_loschmidt_echo_unit_at_t0_and_decays():
    """Echo of a state with itself is 1; after layers it drops below 1."""
    from tensornetworkquantumsimulator_tpu.models.sites import op_matrix  # noqa: F401
    from tensornetworkquantumsimulator_tpu.parallel import (
        BatchedCircuit,
        batched_product_state,
        make_layer_fn,
    )
    from tensornetworkquantumsimulator_tpu.utils import edge_color

    g = named_grid((3, 3))
    spec, s0 = batched_product_state(g, chi=4, dtype=np.complex64)
    la, ph = batched_loschmidt_echo(spec, s0, s0, maxiter=100)
    np.testing.assert_allclose(float(la), 0.0, atol=1e-5)

    layer = [("Rx", [v], 0.3) for v in g.vertices()]
    for grp in edge_color(g, 4):
        layer += [("Rzz", p, 0.5) for p in grp]
    fn = make_layer_fn(BatchedCircuit(layer, g, spec=spec), chi=4)
    st = s0
    prev = 0.0
    for _ in range(3):
        st, _errs = fn(st)
    la_t, _ = batched_loschmidt_echo(spec, s0, st, maxiter=100)
    assert float(la_t) < prev - 0.01  # echo strictly decayed


def test_sharded_inner_matches_unsharded():
    """SPMD sandwich overlap == single-device batched_inner (states never
    gather): truncation-fidelity pair on an 8-way-sharded torus."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tensornetworkquantumsimulator_tpu import normalize, siteinds, truncate
    from tensornetworkquantumsimulator_tpu.parallel import (
        BatchedState,
        make_sharded_inner,
        shard_spec,
    )

    S = 8
    g = named_grid((8, 4), periodic=True)
    sspec = shard_spec(g, S)
    spec = sspec.spec
    s = siteinds("S=1/2", g)
    psi = random_tensornetworkstate(
        jnp.complex128, g, s, bond_dimension=3, key=jax.random.PRNGKey(11)
    )
    psi = normalize(psi, alg="bp")
    phi = truncate(psi, alg="bp", maxdim=2)
    _, ks = batched_from_tns(psi, chi=3, spec=spec)
    _, kf = batched_from_tns(phi, chi=3, spec=spec)

    la_ref, ph_ref = batched_inner(spec, ks, kf, maxiter=120,
                                   tolerance=1e-13)

    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    sh = NamedSharding(mesh, P("v"))
    sks = BatchedState(jax.device_put(ks.tensors, sh),
                       jax.device_put(ks.messages, sh))
    skf = BatchedState(jax.device_put(kf.tensors, sh),
                       jax.device_put(kf.messages, sh))
    fn = make_sharded_inner(sspec, mesh, maxiter=120, tolerance=1e-13)
    la, ph = fn(sks, skf)
    np.testing.assert_allclose(float(la), float(np.asarray(la_ref)),
                               rtol=1e-9)
    np.testing.assert_allclose(float(ph), float(np.asarray(ph_ref)),
                               atol=1e-9)
