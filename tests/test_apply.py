"""Mirrors reference `test/test_apply.jl`: circuit application preserves norm
for unitary circuits and respects maxdim."""

import jax.numpy as jnp
import numpy as np

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    apply_circuit,
    build_graph_from_circuit,
    edge_color,
    named_grid,
    random_tensornetworkstate,
    tensornetworkstate,
)


def test_custom_circuit():
    circuit = [
        ("Rx", [(1, 1)], 0.5),
        ("Rx", [(2, 1)], 0.2),
        ("CPHASE", [(1, 1), (2, 1)], -0.3),
    ]
    g = build_graph_from_circuit(circuit)
    psi0 = tensornetworkstate(jnp.complex64, lambda v: "↓", g)
    apply_kwargs = dict(maxdim=2, cutoff=1e-10, normalize_tensors=False)
    psi, errs = apply_circuit(circuit, psi0, apply_kwargs=apply_kwargs)
    assert psi.scalartype() == jnp.complex64
    assert psi.maxvirtualdim() <= 2
    np.testing.assert_allclose(tnqs.norm_sqr(psi, alg="exact"), 1.0, rtol=1e-5)


def test_ising_layer_on_grid():
    g = named_grid((3, 3))
    psi0 = random_tensornetworkstate(jnp.complex64, g, bond_dimension=1)
    psi0 = tnqs.normalize(psi0, alg="bp")

    dt, hx, hz, J = 0.25, 1.0, 0.8, 0.5
    layer = []
    layer += [("Rx", [v], 2 * hx * dt) for v in g.vertices()]
    layer += [("Rz", v, 2 * hz * dt) for v in g.vertices()]
    for colored_edges in edge_color(g, 4):
        layer += [("Rzz", pair, 2 * J * dt) for pair in colored_edges]

    apply_kwargs = dict(cutoff=1e-10, normalize_tensors=False)
    psi, errs = apply_circuit(layer, psi0, apply_kwargs=apply_kwargs)
    assert psi.scalartype() == jnp.complex64
    assert psi.maxvirtualdim() <= 2
    np.testing.assert_allclose(tnqs.norm_sqr(psi, alg="exact"), 1.0, rtol=1e-5)


def test_exact_agreement_small_circuit():
    """Oracle: simple-update with BP envs on a tree is exact; compare a 2x2
    circuit against dense statevector simulation."""
    g = named_grid((2, 2))
    psi0 = tensornetworkstate(jnp.complex128, lambda v: "↑", g)
    layer = [("Rx", [v], 0.3) for v in g.vertices()]
    for colored_edges in edge_color(g, 4):
        layer += [("Rzz", pair, 0.7) for pair in colored_edges]
    psi, errs = apply_circuit(
        layer, psi0, apply_kwargs=dict(maxdim=4, cutoff=1e-14)
    )
    assert max(errs) < 1e-12

    # dense reference
    import scipy.linalg

    vs = g.vertices()
    idx = {v: i for i, v in enumerate(vs)}
    n = len(vs)
    state = np.zeros(2**n, dtype=complex)
    state[0] = 1.0
    X = np.array([[0, 1], [1, 0]], dtype=complex)
    Z = np.diag([1.0, -1.0]).astype(complex)

    def op1(m, i):
        mats = [np.eye(2, dtype=complex)] * n
        mats[i] = m
        out = mats[0]
        for mm in mats[1:]:
            out = np.kron(out, mm)
        return out

    U = np.eye(2**n, dtype=complex)
    for v in vs:
        U = scipy.linalg.expm(-1j * 0.15 * op1(X, idx[v])) @ U
    for colored_edges in edge_color(g, 4):
        for e in colored_edges:
            zz = op1(Z, idx[e.src]) @ op1(Z, idx[e.dst])
            U = scipy.linalg.expm(-1j * (0.7 / 2) * zz) @ U
    state = U @ state

    z_middle = op1(Z, idx[vs[0]])
    expected = np.real(state.conj() @ z_middle @ state)
    got = tnqs.expect(psi, ("Z", [vs[0]]), alg="exact")
    np.testing.assert_allclose(np.real(got), expected, rtol=1e-8)


def test_full_update_matches_simple_update_on_tree():
    """On a tree with converged BP envs and no truncation, full update and
    simple update give the same state (both exact)."""
    import tensornetworkquantumsimulator_tpu as tnqs
    from tensornetworkquantumsimulator_tpu import (
        BeliefPropagationCache,
        random_tensornetworkstate,
    )
    from tensornetworkquantumsimulator_tpu.apply import full_update, simple_update
    from tensornetworkquantumsimulator_tpu.models.gates import to_tensor

    g = named_grid((3, 1))
    psi = random_tensornetworkstate(jnp.complex128, g, bond_dimension=2)
    psi = tnqs.normalize(psi, alg="bp")
    cache = BeliefPropagationCache(psi).update(maxiter=50, tolerance=1e-14)
    gate, verts = to_tensor(("Rzz", [(1, 1), (2, 1)], 0.3), psi.siteinds())
    envs = cache.incoming_messages(verts)

    t_fu = full_update(gate, psi, verts, envs=envs, nfullupdatesweeps=10)
    psi_fu = psi.copy()
    for t, v in zip(t_fu, verts):
        psi_fu.tensornetwork().setindex_preserve(t, v)

    t_su, _s, _err = simple_update(
        gate, psi, verts, envs=envs, normalize_tensors=False
    )
    psi_su = psi.copy()
    for t, v in zip(t_su, verts):
        psi_su.tensornetwork().setindex_preserve(t, v)

    # same physical state: overlap fidelity 1
    ip = tnqs.inner(psi_fu, psi_su, alg="exact")
    n1 = tnqs.norm_sqr(psi_fu, alg="exact")
    n2 = tnqs.norm_sqr(psi_su, alg="exact")
    f = abs(ip) ** 2 / abs(n1 * n2)
    np.testing.assert_allclose(f, 1.0, rtol=1e-8)


def test_full_update_cg_matches_dense():
    """Matrix-free CG ALS (KrylovKit-linsolve parity, `full_update.jl:102-163`)
    reaches the same optimum as the dense least-squares solve."""
    import tensornetworkquantumsimulator_tpu as tnqs
    from tensornetworkquantumsimulator_tpu import (
        BeliefPropagationCache,
        random_tensornetworkstate,
    )
    from tensornetworkquantumsimulator_tpu.apply import full_update
    from tensornetworkquantumsimulator_tpu.models.gates import to_tensor

    g = named_grid((2, 2))
    psi = random_tensornetworkstate(jnp.complex128, g, bond_dimension=3)
    psi = tnqs.normalize(psi, alg="bp")
    cache = BeliefPropagationCache(psi).update(maxiter=50, tolerance=1e-14)
    gate, verts = to_tensor(("Rzz", [(1, 1), (1, 2)], 0.4), psi.siteinds())
    envs = cache.incoming_messages(verts)

    out = {}
    for solver in ("dense", "cg"):
        ts = full_update(
            gate, psi, verts, envs=envs, nfullupdatesweeps=6, solver=solver
        )
        p = psi.copy()
        for t, v in zip(ts, verts):
            p.tensornetwork().setindex_preserve(t, v)
        out[solver] = p
    ip = tnqs.inner(out["dense"], out["cg"], alg="exact")
    n1 = tnqs.norm_sqr(out["dense"], alg="exact")
    n2 = tnqs.norm_sqr(out["cg"], alg="exact")
    f = abs(ip) ** 2 / abs(n1 * n2)
    np.testing.assert_allclose(f, 1.0, rtol=1e-9)
