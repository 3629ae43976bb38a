"""Noise channels (models/channels.py): PTM algebra, density-matrix and
Heisenberg-picture noisy evolution vs an in-test dense Kraus oracle, and
the batched-engine channel paths.  No reference counterpart (the reference
covers unitary gates only, `gate_definitions.jl`)."""

import jax.numpy as jnp
import numpy as np
import pytest

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    density_matrix_tensornetworkstate,
    edge_color,
    heisenberg_expectation,
    named_comb_tree,
    named_grid,
    pauli_expectation,
    paulitensornetworkstate,
    purity,
)
from tensornetworkquantumsimulator_tpu.models import channels as ch
from tensornetworkquantumsimulator_tpu.models.gates import (
    collect_gate_vertices,
    gate_matrix,
)

# ---------------------------------------------------------------------------
# dense Kraus oracle
# ---------------------------------------------------------------------------


def _lift1(m, i, nq):
    out = np.array([[1.0]])
    for k in range(nq):
        out = np.kron(out, m if k == i else np.eye(2))
    return out


def _lift2(m4, i, j, nq):
    m = m4.reshape(2, 2, 2, 2)
    out = np.zeros((2**nq,) * 2, dtype=complex)
    for a in range(2):
        for b in range(2):
            for c in range(2):
                for d in range(2):
                    e_ac = np.zeros((2, 2))
                    e_ac[a, c] = 1
                    e_bd = np.zeros((2, 2))
                    e_bd[b, d] = 1
                    out += m[a, b, c, d] * _lift1(e_ac, i, nq) @ _lift1(
                        e_bd, j, nq
                    )
    return out


def _dense_evolve(circuit, pos, nq):
    """Exact Kraus evolution of |0…0⟩⟨0…0| through a tuple circuit."""
    psi0 = np.zeros(2**nq)
    psi0[0] = 1.0
    rho = np.outer(psi0, psi0).astype(complex)
    for gate in circuit:
        name = gate[0]
        vs = collect_gate_vertices(gate[1])
        param = gate[2] if len(gate) > 2 else None
        if ch.is_channel(name):
            ks = ch.channel_kraus(name, param, len(vs))
            lift = (
                (lambda k: _lift1(k, pos[vs[0]], nq))
                if len(vs) == 1
                else (lambda k: _lift2(k, pos[vs[0]], pos[vs[1]], nq))
            )
            rho = sum(K @ rho @ K.conj().T for K in map(lift, ks))
        else:
            u = gate_matrix(name, param)
            U = (
                _lift1(u, pos[vs[0]], nq)
                if len(vs) == 1
                else _lift2(u, pos[vs[0]], pos[vs[1]], nq)
            )
            rho = U @ rho @ U.conj().T
    return rho


def _noisy_layer(g, dt=0.15, h=0.9, J=1.1, p_dep=0.05, gam=0.08, p_zz=0.0):
    circuit = [("Rx", [v], 2 * h * dt) for v in g.vertices()]
    groups = edge_color(g, 4)
    for group in groups:
        circuit += [("Rzz", pair, 2 * J * dt) for pair in group]
    if p_zz:  # two-site correlated dephasing through the SVD path
        circuit += [("dephasing:ZZ", pair, p_zz) for pair in groups[0]]
    circuit += [("depolarizing", [v], p_dep) for v in g.vertices()]
    circuit += [("amplitude_damping", [v], gam) for v in g.vertices()]
    return circuit


# ---------------------------------------------------------------------------
# PTM algebra
# ---------------------------------------------------------------------------


def test_channel_ptm_properties():
    cases = [
        ("depolarizing", 0.3, 1),
        ("dephasing", 0.2, 1),
        ("bitflip", 0.4, 1),
        ("amplitude_damping", 0.25, 1),
        ("generalized_amplitude_damping", (0.3, 0.7), 1),
        ("pauli_channel", [0.7, 0.1, 0.1, 0.1], 1),
        ("reset", 0.2, 1),
        ("depolarizing", 0.1, 2),
        ("dephasing:ZZ", 0.15, 2),
    ]
    for name, param, n in cases:
        ts = ch.channel_ptm(name, param, nsites=n, heisenberg=False)
        th = ch.channel_ptm(name, param, nsites=n, heisenberg=True)
        # trace preservation: first row of the Schrödinger PTM is e0;
        # equivalently Φ†(I) = I, i.e. first column of the Heisenberg PTM
        np.testing.assert_allclose(ts[0], np.eye(4**n)[0], atol=1e-14)
        np.testing.assert_allclose(th[:, 0], np.eye(4**n)[0], atol=1e-14)
        # adjoint relation in the Hermitian Pauli basis
        np.testing.assert_allclose(th, ts.T, atol=1e-14)

    # depolarizing at p=1 wipes every non-identity component
    t = ch.channel_ptm("depolarizing", 1.0, 1, heisenberg=False)
    np.testing.assert_allclose(t, np.diag([1.0, 0, 0, 0]), atol=1e-14)
    # Pauli channels are unital AND diagonal; dephasing damps the
    # anticommuting components by 1−2p
    t = ch.channel_ptm("dephasing", 0.2, 1, heisenberg=False)
    np.testing.assert_allclose(t, np.diag([1.0, 0.6, 0.6, 1.0]), atol=1e-14)
    # amplitude damping is NOT unital: Z picks up a constant from I
    t = ch.channel_ptm("amplitude_damping", 0.36, 1, heisenberg=False)
    np.testing.assert_allclose(t[3, 0], 0.36, atol=1e-14)
    np.testing.assert_allclose(t[3, 3], 0.64, atol=1e-14)
    np.testing.assert_allclose(t[1, 1], 0.8, atol=1e-14)

    # kraus_to_ptm of a unitary matches pauli_transfer_matrix
    from tensornetworkquantumsimulator_tpu.models.gates import (
        pauli_transfer_matrix,
    )

    u = gate_matrix("Rx", 0.37)
    np.testing.assert_allclose(
        ch.kraus_to_ptm([u], heisenberg=True),
        pauli_transfer_matrix(u, heisenberg=True),
        atol=1e-14,
    )


def test_explicit_kraus_gate():
    """("kraus", verts, [K…]) tuples: arbitrary CPTP maps in circuits."""
    # a random unitary-rotated amplitude damping
    rng = np.random.default_rng(5)
    h = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    u = np.linalg.qr(h)[0]
    ks = [u @ k @ u.conj().T for k in ch.amplitude_damping_kraus(0.3)]
    assert ch.is_channel("kraus")
    np.testing.assert_allclose(
        ch.channel_ptm("kraus", ks, 1, heisenberg=False),
        ch.kraus_to_ptm(ks, heisenberg=False),
        atol=1e-14,
    )
    with pytest.raises(ValueError):  # not trace preserving
        ch.channel_kraus("kraus", [0.5 * np.eye(2)], 1)

    g = named_grid((2, 2))
    verts = g.vertices()
    pos = {v: i for i, v in enumerate(verts)}
    circuit = [("Rx", [v], 0.6) for v in verts] + [
        ("kraus", [verts[0]], ks),
        ("kraus", [verts[2]], ks),
    ]
    rho_d = _dense_evolve(circuit, pos, len(verts))
    rho = density_matrix_tensornetworkstate(jnp.float64, lambda v: "0", g)
    rho, _ = tnqs.apply_circuit(
        circuit, rho,
        apply_kwargs=dict(maxdim=8, cutoff=0.0, normalize_tensors=False),
    )
    for v in verts:
        z_d = np.real(
            np.trace(rho_d @ _lift1(np.diag([1, -1]), pos[v], len(verts)))
        )
        np.testing.assert_allclose(
            np.real(pauli_expectation(rho, ("Z", [v]), alg="exact")),
            z_d, atol=1e-9,
        )


def test_channel_param_validation():
    with pytest.raises(ValueError):
        ch.channel_kraus("depolarizing", 1.5, 1)
    with pytest.raises(ValueError):
        ch.channel_kraus("pauli_channel", [0.5, 0.1, 0.1, 0.1], 1)
    with pytest.raises(ValueError):
        ch.channel_kraus("dephasing:ZZ", 0.1, 1)  # axis/nsites mismatch
    with pytest.raises(ValueError):
        ch.channel_kraus("amplitude_damping", 0.1, 2)
    assert not ch.is_channel("Rx")
    assert ch.is_channel("dephasing:XX")


# ---------------------------------------------------------------------------
# both pictures vs the dense Kraus oracle
# ---------------------------------------------------------------------------


def test_noisy_dynamics_vs_dense_kraus():
    g = named_grid((2, 2))
    verts = g.vertices()
    nq = len(verts)
    pos = {v: i for i, v in enumerate(verts)}
    circuit = _noisy_layer(g, p_zz=0.03)
    rho_d = _dense_evolve(circuit, pos, nq)
    z_dense = {
        v: np.real(np.trace(rho_d @ _lift1(np.diag([1, -1]), pos[v], nq)))
        for v in verts
    }

    # density-matrix (Schrödinger) picture, forward circuit
    rho = density_matrix_tensornetworkstate(jnp.float64, lambda v: "0", g)
    rho, _ = tnqs.apply_circuit(
        circuit,
        rho,
        apply_kwargs=dict(maxdim=16, cutoff=0.0, normalize_tensors=False),
    )
    for v in verts:
        val = pauli_expectation(rho, ("Z", [v]), alg="exact")
        np.testing.assert_allclose(np.real(val), z_dense[v], atol=1e-9)
    zz = pauli_expectation(rho, ("ZZ", [verts[0], verts[3]]), alg="exact")
    zz_d = np.real(
        np.trace(
            rho_d
            @ _lift1(np.diag([1, -1]), 0, nq)
            @ _lift1(np.diag([1, -1]), 3, nq)
        )
    )
    np.testing.assert_allclose(np.real(zz), zz_d, atol=1e-9)
    np.testing.assert_allclose(
        purity(rho, alg="exact"), np.real(np.trace(rho_d @ rho_d)), atol=1e-9
    )

    # Heisenberg picture: reversed circuit, adjoint channels
    vz = verts[0]
    op = paulitensornetworkstate(
        jnp.float64, lambda v: "Z" if v == vz else "I", g
    )
    op, _ = tnqs.apply_circuit(
        list(reversed(circuit)),
        op,
        apply_kwargs=dict(maxdim=16, cutoff=0.0, normalize_tensors=False),
    )
    val = heisenberg_expectation(op, "0", alg="exact")
    np.testing.assert_allclose(np.real(val), z_dense[vz], atol=1e-9)
    # arbitrary product initial state through the same evolved operator
    val_plus = heisenberg_expectation(op, "+", alg="exact")
    op_d = _lift1(np.diag([1, -1]), pos[vz], nq)
    plus = np.full(2**nq, 2.0 ** (-nq / 2))
    # evolve ρ0=|+..+⟩ exactly for the cross-check
    rho_p = np.outer(plus, plus).astype(complex)
    for gate in circuit:
        name = gate[0]
        vs = collect_gate_vertices(gate[1])
        param = gate[2] if len(gate) > 2 else None
        if ch.is_channel(name):
            ks = ch.channel_kraus(name, param, len(vs))
            lift = (
                (lambda k: _lift1(k, pos[vs[0]], nq))
                if len(vs) == 1
                else (lambda k: _lift2(k, pos[vs[0]], pos[vs[1]], nq))
            )
            rho_p = sum(K @ rho_p @ K.conj().T for K in map(lift, ks))
        else:
            u = gate_matrix(name, param)
            U = (
                _lift1(u, pos[vs[0]], nq)
                if len(vs) == 1
                else _lift2(u, pos[vs[0]], pos[vs[1]], nq)
            )
            rho_p = U @ rho_p @ U.conj().T
    np.testing.assert_allclose(
        np.real(val_plus), np.real(np.trace(rho_p @ op_d)), atol=1e-9
    )


def test_bp_tree_exact_and_invariants():
    """BP is exact on trees for the coefficient network; trace is
    preserved and purity decreases under depolarizing noise."""
    g = named_comb_tree((3, 2))
    circuit = _noisy_layer(g, p_dep=0.1, gam=0.0)
    rho = density_matrix_tensornetworkstate(jnp.float64, lambda v: "0", g)
    purities = [1.0]
    for _ in range(2):
        rho, _ = tnqs.apply_circuit(
            circuit,
            rho,
            apply_kwargs=dict(maxdim=8, cutoff=0.0, normalize_tensors=False),
        )
        purities.append(purity(rho, alg="bp"))
    v = g.vertices()[1]
    np.testing.assert_allclose(
        np.real(pauli_expectation(rho, ("Z", [v]), alg="bp")),
        np.real(pauli_expectation(rho, ("Z", [v]), alg="exact")),
        atol=1e-8,
    )
    # trace: contraction against all-identity weights == 1
    from tensornetworkquantumsimulator_tpu import tensornetworkstate

    w = tensornetworkstate(
        jnp.float64, lambda v: [1.0, 0.0, 0.0, 0.0], g, rho.siteinds()
    )
    np.testing.assert_allclose(np.real(tnqs.inner(w, rho, alg="bp")), 1.0, atol=1e-9)
    assert purities[0] > purities[1] > purities[2] > 0.0

    # p=1 depolarizing on every site gives the maximally mixed state
    wipe = [("depolarizing", [v], 1.0) for v in g.vertices()]
    rho, _ = tnqs.apply_circuit(
        wipe, rho, apply_kwargs=dict(maxdim=8, cutoff=0.0, normalize_tensors=False)
    )
    np.testing.assert_allclose(
        np.real(pauli_expectation(rho, ("Z", [v]), alg="bp")), 0.0, atol=1e-10
    )
    np.testing.assert_allclose(
        purity(rho, alg="bp"), 2.0 ** (-len(g.vertices())), atol=1e-10
    )


def test_sample_density_matrix_vs_dense():
    """Sequential conditional sampling from ρ: each drawn bitstring's
    accumulated log-probability equals log⟨x|ρ|x⟩ exactly on a tree."""
    from tensornetworkquantumsimulator_tpu.sampling import (
        sample_density_matrix,
        seed_sampler,
    )

    g = named_comb_tree((3, 2))
    verts = g.vertices()
    nq = len(verts)
    pos = {v: i for i, v in enumerate(verts)}
    circuit = [("Rx", [v], 0.7) for v in verts]
    for grp in edge_color(g, 4):
        circuit += [("Rzz", p, 0.5) for p in grp]
    circuit += [("depolarizing", [v], 0.1) for v in verts]
    circuit += [("amplitude_damping", [v], 0.15) for v in verts]
    rho_d = _dense_evolve(circuit, pos, nq)

    rho = density_matrix_tensornetworkstate(jnp.float64, lambda v: "0", g)
    rho, _ = tnqs.apply_circuit(
        circuit,
        rho,
        apply_kwargs=dict(maxdim=8, cutoff=0.0, normalize_tensors=False),
    )
    seed_sampler(7)
    res = sample_density_matrix(
        rho, 10, bp_update_kwargs=dict(maxiter=60, tolerance=1e-12)
    )
    for r in res:
        idx = 0
        for v in verts:
            idx = idx * 2 + r["bitstring"][v]
        np.testing.assert_allclose(
            r["logp"], np.log(np.real(rho_d[idx, idx])), atol=1e-8
        )

    # p=1 reset channel makes sampling deterministic all-zeros
    wipe = [("reset", [v], 1.0) for v in verts]
    rho, _ = tnqs.apply_circuit(
        wipe, rho, apply_kwargs=dict(maxdim=8, cutoff=0.0, normalize_tensors=False)
    )
    res = sample_density_matrix(rho, 3)
    for r in res:
        assert all(b == 0 for b in r["bitstring"].values())
        np.testing.assert_allclose(r["logp"], 0.0, atol=1e-10)


# ---------------------------------------------------------------------------
# batched engine
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("picture", ["heisenberg", "rho"])
def test_batched_channels_vs_generic(picture):
    from tensornetworkquantumsimulator_tpu import tensornetworkstate
    from tensornetworkquantumsimulator_tpu.parallel import (
        BatchedCircuit,
        batched_from_tns,
        batched_to_tns,
        make_layer_fn,
    )

    g = named_grid((3, 3))
    vz = g.center()[0]
    circuit = _noisy_layer(g, p_dep=0.04, gam=0.06, p_zz=0.03)
    chi = 4

    if picture == "heisenberg":
        tns0 = paulitensornetworkstate(
            jnp.complex128, lambda v: "Z" if v == vz else "I", g
        )
        circ = list(reversed(circuit))
    else:
        tns0 = density_matrix_tensornetworkstate(
            jnp.complex128, lambda v: "0", g
        )
        circ = circuit

    ref, _ = tnqs.apply_circuit(
        circ,
        tns0,
        apply_kwargs=dict(maxdim=chi, cutoff=1e-13, normalize_tensors=False),
        bp_update_kwargs=dict(maxiter=80, tolerance=1e-13),
    )

    spec, state = batched_from_tns(tns0, chi=chi)
    bc = BatchedCircuit(circ, g, spec=spec, d=4, picture=picture)
    layer_fn = make_layer_fn(
        bc, chi=chi, cutoff=1e-13, normalize_tensors=False,
        bp_maxiter=80, bp_tolerance=1e-13,
    )
    state, _ = layer_fn(state)
    tns_b = batched_to_tns(spec, state, g, tns0.siteinds())

    if picture == "heisenberg":
        val_ref = heisenberg_expectation(ref, "0", alg="bp")
        val_b = heisenberg_expectation(tns_b, "0", alg="bp")
    else:
        val_ref = pauli_expectation(ref, ("Z", [vz]), alg="bp")
        val_b = pauli_expectation(tns_b, ("Z", [vz]), alg="bp")
    assert abs(np.real(val_ref)) > 0.05
    np.testing.assert_allclose(np.real(val_b), np.real(val_ref), rtol=1e-5)

    if picture == "rho":
        # fully batched per-site expectations: one jitted program
        import jax

        from tensornetworkquantumsimulator_tpu.parallel import (
            make_pauli_expectation_fn,
        )

        fn = jax.jit(
            make_pauli_expectation_fn(
                spec, chi, jnp.complex128, ops=("Z", "X"),
                maxiter=80, tolerance=1e-13,
            )
        )
        vals = fn(state)
        for i, v in enumerate(spec.vertices):
            ref_z = pauli_expectation(ref, ("Z", [v]), alg="bp")
            np.testing.assert_allclose(
                float(vals["Z"][i]), np.real(ref_z), rtol=2e-5, atol=1e-7
            )


def test_batched_channels_heavyhex():
    """Channels through the batched engine's mixed slot buckets: noisy
    Heisenberg evolution on the degree-3 heavy-hex lattice."""
    from tensornetworkquantumsimulator_tpu import heavy_hexagonal_lattice
    from tensornetworkquantumsimulator_tpu.parallel import (
        BatchedCircuit,
        batched_from_tns,
        batched_to_tns,
        make_layer_fn,
    )

    g = heavy_hexagonal_lattice(1, 1)
    vz = g.vertices()[len(g.vertices()) // 2]
    circuit = [("Rx", [v], 0.4) for v in g.vertices()]
    for grp in edge_color(g, 3):
        circuit += [("Rzz", pair, 0.3) for pair in grp]
    circuit += [("depolarizing", [v], 0.05) for v in g.vertices()]
    circ = list(reversed(circuit))
    chi = 4

    op0 = paulitensornetworkstate(
        jnp.complex128, lambda v: "Z" if v == vz else "I", g
    )
    ref, _ = tnqs.apply_circuit(
        circ, op0,
        apply_kwargs=dict(maxdim=chi, cutoff=1e-13, normalize_tensors=False),
        bp_update_kwargs=dict(maxiter=80, tolerance=1e-13),
    )
    spec, state = batched_from_tns(op0, chi=chi)
    bc = BatchedCircuit(circ, g, spec=spec, d=4, picture="heisenberg")
    layer_fn = make_layer_fn(
        bc, chi=chi, cutoff=1e-13, normalize_tensors=False,
        bp_maxiter=80, bp_tolerance=1e-13,
    )
    state, _ = layer_fn(state)
    tns_b = batched_to_tns(spec, state, g, op0.siteinds())
    val_ref = heisenberg_expectation(ref, "0", alg="bp")
    val_b = heisenberg_expectation(tns_b, "0", alg="bp")
    assert abs(np.real(val_ref)) > 0.05
    np.testing.assert_allclose(np.real(val_b), np.real(val_ref), rtol=1e-5)


def test_two_time_correlator_vs_dense():
    """Dynamical response functions C(t) = Tr[ρ₀ A(t) B] come for free from
    the Heisenberg machinery: by cyclicity C = Tr[(Bρ₀) A(t)], so the
    product weights of `heisenberg_expectation` just carry the (generally
    non-Hermitian) local matrix B_w·ρ_w at B's site — `pauli_coefficients`
    accepts 2×2 matrices and keeps complex coefficients.  Works with noise
    (A(t) evolves under the adjoint channels)."""
    from tensornetworkquantumsimulator_tpu.models.sites import (
        PAULI_X,
        PAULI_Z,
        pauli_coefficients,
    )

    g = named_grid((2, 2))
    verts = g.vertices()
    nq = len(verts)
    pos = {v: i for i, v in enumerate(verts)}
    va = vb = verts[0]  # autocorrelation ⟨Z_a(t) X_a⟩: complex response
    circuit = _noisy_layer(g, p_dep=0.04, gam=0.05) * 2

    # dense oracle: A(t) by applying adjoint maps to A in reverse order
    A = _lift1(PAULI_Z, pos[va], nq)
    for gate in reversed(circuit):
        name = gate[0]
        vs = collect_gate_vertices(gate[1])
        param = gate[2] if len(gate) > 2 else None
        if ch.is_channel(name):
            ks = ch.channel_kraus(name, param, len(vs))
            lift = (
                (lambda k: _lift1(k, pos[vs[0]], nq))
                if len(vs) == 1
                else (lambda k: _lift2(k, pos[vs[0]], pos[vs[1]], nq))
            )
            A = sum(K.conj().T @ A @ K for K in map(lift, ks))
        else:
            u = gate_matrix(name, param)
            U = (
                _lift1(u, pos[vs[0]], nq)
                if len(vs) == 1
                else _lift2(u, pos[vs[0]], pos[vs[1]], nq)
            )
            A = U.conj().T @ A @ U
    psi0 = np.zeros(2**nq)
    psi0[0] = 1.0
    rho0 = np.outer(psi0, psi0)
    B = _lift1(PAULI_X, pos[vb], nq)
    c_dense = np.trace(rho0 @ A @ B)

    # TNS: evolve A through the reversed circuit, weight B's site with B·ρ
    op = paulitensornetworkstate(
        jnp.complex128, lambda v: "Z" if v == va else "I", g
    )
    op, _ = tnqs.apply_circuit(
        list(reversed(circuit)), op,
        apply_kwargs=dict(maxdim=16, cutoff=0.0, normalize_tensors=False),
    )
    rho_loc = np.array([[1.0, 0.0], [0.0, 0.0]])

    def init(v):
        return PAULI_X @ rho_loc if v == vb else rho_loc

    val = heisenberg_expectation(op, init, alg="exact")
    np.testing.assert_allclose(np.complex128(val), c_dense, atol=1e-9)
    assert abs(np.imag(c_dense)) > 1e-3  # a genuinely complex response


def test_pauli_expectation_boundarymps_alg():
    """The linear Tr[ρP] functionals run under every contraction backend:
    boundary-MPS agrees with exact on a noisy 3×3 state."""
    g = named_grid((3, 3))
    rho = density_matrix_tensornetworkstate(jnp.float64, lambda v: "0", g)
    rho, _ = tnqs.apply_circuit(
        _noisy_layer(g), rho,
        apply_kwargs=dict(maxdim=6, cutoff=1e-14, normalize_tensors=False),
    )
    v = (2, 2)
    ref = pauli_expectation(rho, ("Z", [v]), alg="exact")
    bm = pauli_expectation(
        rho, ("Z", [v]), alg="boundarymps", mps_bond_dimension=8
    )
    np.testing.assert_allclose(np.real(bm), np.real(ref), atol=1e-8)
    np.testing.assert_allclose(
        purity(rho, alg="boundarymps", mps_bond_dimension=8),
        purity(rho, alg="exact"),
        rtol=1e-8,
    )


def test_lindblad_trotter_convergence():
    """Trotterized channels integrate Lindblad dynamics: the error of the
    product formula (unitary layer ∘ damping ∘ dephasing) against an exact
    Liouvillian integrator is O(dt) and halves with dt."""
    from scipy.linalg import expm as dense_expm

    g = named_grid((2, 2))
    verts = g.vertices()
    nq = len(verts)
    pos = {v: i for i, v in enumerate(verts)}
    h, J, gamma, kappa, t_final = 1.0, 1.0, 0.3, 0.1, 0.4

    # exact: vectorized Liouvillian  dρ/dt = L ρ
    dim = 2**nq
    H = np.zeros((dim, dim), dtype=complex)
    for v in verts:
        H += h * _lift1(np.array([[0, 1], [1, 0]]), pos[v], nq)
    for e in g.edges():
        zz = _lift1(np.diag([1, -1]), pos[e.src], nq) @ _lift1(
            np.diag([1, -1]), pos[e.dst], nq
        )
        H += J * zz
    eye = np.eye(dim)
    L = -1j * (np.kron(H, eye) - np.kron(eye, H.T))
    for v in verts:
        for c, rate in (
            (np.array([[0, 1], [0, 0]]), gamma),   # σ⁻ damping
            (np.diag([1.0, -1.0]), kappa),          # dephasing
        ):
            C = _lift1(c, pos[v], nq) * np.sqrt(rate)
            CdC = C.conj().T @ C
            L += (
                np.kron(C, C.conj())
                - 0.5 * np.kron(CdC, eye)
                - 0.5 * np.kron(eye, CdC.T)
            )
    psi0 = np.zeros(dim)
    psi0[0] = 1.0
    rho_exact = (
        dense_expm(L * t_final) @ np.outer(psi0, psi0).reshape(-1)
    ).reshape(dim, dim)
    # ⟨X⟩ carries the leading Trotter error here (⟨Z⟩ is accidentally
    # near-cancelling on this workload and does not scale cleanly)
    x_mat = np.array([[0.0, 1.0], [1.0, 0.0]])
    x_exact = {
        v: np.real(np.trace(rho_exact @ _lift1(x_mat, pos[v], nq)))
        for v in verts
    }

    import importlib.util
    import pathlib

    spec_ = importlib.util.spec_from_file_location(
        "lindblad_dynamics",
        pathlib.Path(__file__).resolve().parent.parent
        / "examples" / "lindblad_dynamics.py",
    )
    mod = importlib.util.module_from_spec(spec_)
    spec_.loader.exec_module(mod)

    errs = []
    for dt in (0.08, 0.04):
        layer = mod.lindblad_layer(g, dt, h=h, J=J, gamma=gamma, kappa=kappa)
        rho = density_matrix_tensornetworkstate(jnp.float64, lambda v: "0", g)
        for _ in range(int(round(t_final / dt))):
            rho, _ = tnqs.apply_circuit(
                layer, rho,
                apply_kwargs=dict(maxdim=16, cutoff=0.0,
                                  normalize_tensors=False),
            )
        err = max(
            abs(np.real(pauli_expectation(rho, ("X", [v]), alg="exact"))
                - x_exact[v])
            for v in verts
        )
        errs.append(err)
    assert errs[0] < 0.1  # already accurate at dt=0.08
    assert errs[1] < 0.65 * errs[0]  # ~first-order in dt


def test_thermal_state_imaginary_time_vs_dense():
    """Finite-temperature states by imaginary time: ("map", verts, [G]) with
    G = e^{−dτ·h} (non-trace-preserving, `imaginary_time_kraus`) drives
    ρ ∝ I toward e^{−βH} under a Strang product formula (each layer
    advances β by 2dτ since ρ → GρG†).  Machinery oracle: exact agreement
    with dense evolution of the SAME formula from ρ₀ = I/2ⁿ on a 4-site
    path (BP exact on trees); physics oracle: the Strang error vs exact
    e^{−βH} is O(dτ²)."""
    from scipy.linalg import expm as dense_expm

    from tensornetworkquantumsimulator_tpu import (
        imaginary_time_kraus,
        named_path_graph,
    )

    g = named_path_graph(4)
    verts = sorted(g.vertices())
    nq = len(verts)
    pos = {v: i for i, v in enumerate(verts)}
    J, hx, dtau, nsteps = 1.0, 0.7, 0.05, 8
    beta = 2 * dtau * nsteps

    x = np.array([[0.0, 1.0], [1.0, 0.0]])
    z = np.diag([1.0, -1.0])
    h_site = -hx * x
    h_bond = -J * np.kron(z, z)

    # one Strang step: X(dτ/2) · ZZ(dτ) · X(dτ/2)
    layer = [("map", [v], imaginary_time_kraus(h_site, dtau / 2))
             for v in verts]
    for group in edge_color(g, 3):
        layer += [("map", pair, imaginary_time_kraus(h_bond, dtau))
                  for pair in group]
    layer += [("map", [v], imaginary_time_kraus(h_site, dtau / 2))
              for v in verts]

    rho = density_matrix_tensornetworkstate(
        jnp.complex128, lambda v: "mixed", g
    )
    for _ in range(nsteps):
        rho, _ = tnqs.apply_circuit(
            layer, rho,
            apply_kwargs=dict(maxdim=16, cutoff=1e-14,
                              normalize_tensors=True),
            bp_update_kwargs=dict(maxiter=80, tolerance=1e-13),
        )

    # dense oracle of the same product formula, from I/2ⁿ
    dim = 2**nq
    rho_d = np.eye(dim, dtype=complex) / dim
    for _ in range(nsteps):
        for gate in layer:
            vs = collect_gate_vertices(gate[1])
            (G,) = gate[2]
            lifted = (
                _lift1(G, pos[vs[0]], nq)
                if len(vs) == 1
                else _lift2(G, pos[vs[0]], pos[vs[1]], nq)
            )
            rho_d = lifted @ rho_d @ lifted.conj().T
    rho_d /= np.trace(rho_d).real

    obs = [("Z", [v]) for v in verts] + [("X", [v]) for v in verts]
    vals = pauli_expectation(
        rho, obs, cache_update_kwargs=dict(maxiter=200, tolerance=1e-14)
    )
    for (name, (v,)), got in zip(obs, vals):
        mat = z if name == "Z" else x
        want = np.real(np.trace(rho_d @ _lift1(mat, pos[v], nq)))
        np.testing.assert_allclose(np.real(got), want, atol=1e-8)
    pur = purity(rho, cache_update_kwargs=dict(maxiter=200, tolerance=1e-14))
    np.testing.assert_allclose(
        pur, np.real(np.trace(rho_d @ rho_d)), atol=1e-8
    )

    # physics: Strang ⇒ O(dτ²) from the true thermal state
    H = np.zeros((dim, dim), dtype=complex)
    for v in verts:
        H += -hx * _lift1(x, pos[v], nq)
    for e in g.edges():
        H += -J * _lift1(z, pos[e.src], nq) @ _lift1(z, pos[e.dst], nq)
    rho_th = dense_expm(-beta * H)
    rho_th /= np.trace(rho_th).real
    zc = np.real(np.trace(rho_th @ _lift1(x, pos[verts[1]], nq)))
    got = np.real(vals[nq + 1])
    np.testing.assert_allclose(got, zc, atol=5e-3)

    # the checked "kraus" form must still reject non-trace-preserving lists
    with pytest.raises(ValueError, match="map"):
        ch.channel_kraus("kraus", imaginary_time_kraus(h_site, dtau), 1)


def test_thermal_state_batched_matches_generic():
    """Imaginary-time ("map") channels run through the batched rho-picture
    engine unchanged (non-unitary PTMs go through the same simple-update
    path as CPTP channels): ⟨X⟩ of the cooled 3×3 TFIM matches the generic
    engine."""
    from tensornetworkquantumsimulator_tpu import imaginary_time_kraus
    from tensornetworkquantumsimulator_tpu.parallel import (
        BatchedCircuit,
        batched_from_tns,
        make_layer_fn,
        make_pauli_expectation_fn,
    )

    x = np.array([[0.0, 1.0], [1.0, 0.0]])
    z = np.diag([1.0, -1.0])
    g = named_grid((3, 3))
    dtau = 0.05
    half = [("map", [v], imaginary_time_kraus(-x, dtau / 2))
            for v in g.vertices()]
    layer = list(half)
    for grp in edge_color(g, 4):
        layer += [("map", pair, imaginary_time_kraus(-np.kron(z, z), dtau))
                  for pair in grp]
    layer += half

    rho = density_matrix_tensornetworkstate(
        jnp.complex128, lambda v: "mixed", g
    )
    for _ in range(4):
        rho, _ = tnqs.apply_circuit(
            layer, rho,
            apply_kwargs=dict(maxdim=8, cutoff=1e-13,
                              normalize_tensors=True),
        )
    x_gen = np.real(pauli_expectation(rho, [("X", [(2, 2)])]))[0]

    rho0 = density_matrix_tensornetworkstate(
        jnp.complex128, lambda v: "mixed", g
    )
    spec, state = batched_from_tns(rho0, chi=8)
    circ = BatchedCircuit(layer, g, spec=spec, d=4, picture="rho")
    fn = make_layer_fn(circ, chi=8, cutoff=1e-13, normalize_tensors=True,
                       bp_maxiter=80, bp_tolerance=1e-13)
    for _ in range(4):
        state, _ = fn(state)
    pe = make_pauli_expectation_fn(spec, 8, jnp.complex128, ops=("X",))
    x_b = float(np.asarray(pe(state)["X"])[spec.vertex_position((2, 2))])
    np.testing.assert_allclose(x_b, x_gen, atol=1e-6)


def test_batched_rho_sampler_vs_dense():
    """make_rho_sampler: each drawn bitstring's accumulated logp equals
    log⟨x|ρ|x⟩ on a tree (Tr ρ = 1 with normalize_tensors=False), matching
    the generic sample_density_matrix oracle contract."""
    import jax

    from tensornetworkquantumsimulator_tpu.parallel.convert import (
        batched_from_tns,
    )
    from tensornetworkquantumsimulator_tpu.parallel.sampling import (
        make_rho_sampler,
    )

    g = named_comb_tree((3, 2))
    verts = g.vertices()
    nq = len(verts)
    pos = {v: i for i, v in enumerate(verts)}
    circuit = [("Rx", [v], 0.7) for v in verts]
    for grp in edge_color(g, 4):
        circuit += [("Rzz", p, 0.5) for p in grp]
    circuit += [("depolarizing", [v], 0.1) for v in verts]
    circuit += [("amplitude_damping", [v], 0.15) for v in verts]
    rho_d = _dense_evolve(circuit, pos, nq)

    rho = density_matrix_tensornetworkstate(jnp.float64, lambda v: "0", g)
    rho, _ = tnqs.apply_circuit(
        circuit,
        rho,
        apply_kwargs=dict(maxdim=8, cutoff=0.0, normalize_tensors=False),
    )
    chi = 8
    spec, state = batched_from_tns(rho, chi=chi)
    sampler = make_rho_sampler(
        spec, chi, jnp.float64, refresh_iters=8, init_maxiter=80,
        tolerance=1e-12,
    )
    keys = jax.random.split(jax.random.PRNGKey(11), 12)
    bits, logps = sampler(state, keys)
    bits = np.asarray(bits)
    logps = np.asarray(logps)
    for s in range(bits.shape[0]):
        idx = 0
        for v in verts:
            idx = idx * 2 + int(bits[s, spec.vertex_position(v)])
        np.testing.assert_allclose(
            logps[s], np.log(np.real(rho_d[idx, idx])), atol=1e-7
        )

    # p=1 reset makes sampling deterministic all-zeros at logp 0
    wipe = [("reset", [v], 1.0) for v in verts]
    rho, _ = tnqs.apply_circuit(
        wipe, rho, apply_kwargs=dict(maxdim=8, cutoff=0.0,
                                     normalize_tensors=False),
    )
    _, state = batched_from_tns(rho, chi=chi)
    bits, logps = sampler(state, keys[:3])
    assert not np.asarray(bits).any()
    np.testing.assert_allclose(np.asarray(logps), 0.0, atol=1e-9)


def test_batched_purity_vs_generic():
    """batched_purity == measure.purity (both BP, exact on trees), and
    log2=True returns its log₂."""
    from tensornetworkquantumsimulator_tpu.parallel.convert import (
        batched_from_tns,
    )
    from tensornetworkquantumsimulator_tpu.parallel.overlap import (
        batched_purity,
    )

    g = named_comb_tree((3, 2))
    circuit = [("Rx", [v], 0.6) for v in g.vertices()]
    for grp in edge_color(g, 4):
        circuit += [("Rzz", p, 0.4) for p in grp]
    circuit += [("dephasing", [v], 0.2) for v in g.vertices()]

    rho = density_matrix_tensornetworkstate(jnp.float64, lambda v: "0", g)
    rho, _ = tnqs.apply_circuit(
        circuit,
        rho,
        apply_kwargs=dict(maxdim=8, cutoff=0.0, normalize_tensors=True),
    )
    p_gen = purity(rho, alg="bp")
    spec, state = batched_from_tns(rho, chi=8)
    p_b = float(np.asarray(batched_purity(spec, state, tolerance=1e-13)))
    np.testing.assert_allclose(p_b, p_gen, rtol=1e-8)
    l2 = float(np.asarray(batched_purity(spec, state, log2=True,
                                         tolerance=1e-13)))
    np.testing.assert_allclose(2.0 ** l2, p_gen, rtol=1e-8)
    assert 0.0 < p_b < 1.0 + 1e-12
