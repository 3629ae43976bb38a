"""Parametric noisy Trotter layer (`parallel/ensemble.py::
make_noisy_field_layer_fn`): traceable channel PTMs, equivalence with the
compiled BatchedCircuit(picture="rho") path at fixed rates, and vmapped
noise-rate sweeps in one program.  No reference counterpart."""

import jax
import jax.numpy as jnp
import numpy as np

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    density_matrix_tensornetworkstate,
    edge_color,
    named_grid,
)
from tensornetworkquantumsimulator_tpu.models import channels as ch
from tensornetworkquantumsimulator_tpu.models.gates import (
    gate_matrix,
    pauli_transfer_matrix,
)
from tensornetworkquantumsimulator_tpu.parallel import (
    BatchedCircuit,
    batched_from_tns,
    ensemble_fn,
    make_layer_fn,
    make_noisy_field_layer_fn,
    make_pauli_expectation_fn,
    ptm_channel,
    ptm_rot,
    stack_states,
)


def test_traceable_ptms_match_reference_builders():
    for name, gen in [("Rx", "X"), ("Rz", "Z"), ("Rzz", "ZZ"), ("Rxx", "XX")]:
        th = 0.437
        for heis in (False, True):
            ref = pauli_transfer_matrix(gate_matrix(name, th), heisenberg=heis)
            np.testing.assert_allclose(
                np.array(ptm_rot(gen, th, heisenberg=heis)), ref, atol=1e-12
            )
    for cn, par in [
        ("depolarizing", 0.23),
        ("dephasing", 0.19),
        ("dephasing:X", 0.11),
        ("bitflip", 0.3),
        ("amplitude_damping", 0.37),
        ("reset", 0.21),
    ]:
        for heis in (False, True):
            ref = ch.channel_ptm(cn, par, nsites=1, heisenberg=heis)
            np.testing.assert_allclose(
                np.array(ptm_channel(cn, par, heisenberg=heis)), ref,
                atol=1e-12,
            )
    # batched rates broadcast
    out = ptm_channel("depolarizing", jnp.asarray([0.0, 0.5]))
    assert out.shape == (2, 4, 4)
    np.testing.assert_allclose(np.array(out[0]), np.eye(4), atol=1e-14)


def _setup(chi=4):
    g = named_grid((3, 3))
    rho0 = density_matrix_tensornetworkstate(jnp.complex128, lambda v: "0", g)
    spec, state0 = batched_from_tns(rho0, chi=chi)
    return g, spec, state0


def test_noisy_field_layer_matches_compiled_circuit():
    """At fixed angles/rates the parametric noisy layer equals the
    BatchedCircuit(picture='rho') compilation of the same layer."""
    chi, th, phi, p_dep, gam = 4, 0.31, 0.22, 0.05, 0.08
    g, spec, state0 = _setup(chi)
    _, layer = make_noisy_field_layer_fn(
        g, chi, site_pauli="X", bond_pauli="ZZ",
        noise=("depolarizing", "amplitude_damping"),
        cutoff=1e-13, bp_maxiter=80, bp_tolerance=1e-13, spec=spec,
    )
    state_a, _ = layer(state0, th, phi, jnp.asarray([p_dep, gam]))

    circuit = [("Rx", [v], th) for v in g.vertices()]
    for grp in edge_color(g, 4):
        circuit += [("Rzz", pair, phi) for pair in grp]
    circuit += [("depolarizing", [v], p_dep) for v in g.vertices()]
    circuit += [("amplitude_damping", [v], gam) for v in g.vertices()]
    bc = BatchedCircuit(circuit, g, spec=spec, d=4, picture="rho")
    ref_layer = make_layer_fn(
        bc, chi=chi, cutoff=1e-13, normalize_tensors=False,
        bp_maxiter=80, bp_tolerance=1e-13,
    )
    state_b, _ = ref_layer(state0)

    fn = make_pauli_expectation_fn(
        spec, chi, jnp.complex128, ops=("Z", "X"), maxiter=80,
        tolerance=1e-13,
    )
    va, vb = fn(state_a), fn(state_b)
    for op in ("Z", "X"):
        np.testing.assert_allclose(
            np.asarray(va[op]), np.asarray(vb[op]), rtol=1e-6, atol=1e-8
        )


def test_noise_rate_sweep_one_program():
    """vmap over the rate axis: E noise strengths advance in one program;
    the zero-rate row equals a noiseless run and rows match per-rate runs."""
    chi, th, phi = 4, 0.31, 0.22
    g, spec, state0 = _setup(chi)
    _, layer = make_noisy_field_layer_fn(
        g, chi, noise=("depolarizing",),
        cutoff=1e-13, bp_maxiter=60, bp_tolerance=1e-13, spec=spec, jit=False,
    )
    rates = jnp.asarray([0.0, 0.06, 0.12])
    estate = stack_states([state0] * len(rates))
    sweep = ensemble_fn(layer, in_axes=(0, None, None, 0))
    estate, _ = sweep(estate, th, phi, rates)
    estate, _ = sweep(estate, th, phi, rates)

    fn = make_pauli_expectation_fn(
        spec, chi, jnp.complex128, maxiter=60, tolerance=1e-13
    )
    z = jax.vmap(lambda s: fn(s)["Z"])(estate)

    for i, p in enumerate(np.asarray(rates)):
        s, _ = layer(state0, th, phi, jnp.asarray(p))
        s, _ = layer(s, th, phi, jnp.asarray(p))
        np.testing.assert_allclose(
            np.asarray(z[i]), np.asarray(fn(s)["Z"]), rtol=1e-7, atol=1e-9
        )
    # noise strictly reduces |<Z>| site-wise on this workload
    za = np.abs(np.asarray(z))
    assert np.all(za[0] > za[1]) and np.all(za[1] > za[2])


def test_sharded_noisy_rho_layer_matches_unsharded():
    """Noisy density-matrix evolution at pod scale: the vertex-sharded
    Trotter layer (`parallel/sharded_layer.py`) is d-generic, so PTM gates
    + composed channel matrices run the rho picture across 8 devices with
    exact equivalence to the single-chip batched path."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tensornetworkquantumsimulator_tpu.models import channels as ch
    from tensornetworkquantumsimulator_tpu.parallel import (
        BatchedState,
        apply_color_group,
        apply_one_site,
        bp_update,
    )
    from tensornetworkquantumsimulator_tpu.parallel.sharded_layer import (
        make_sharded_layer,
    )
    from tensornetworkquantumsimulator_tpu.parallel.sharding import shard_spec

    nx, ny, chi, S = 8, 4, 3, 8
    g = named_grid((nx, ny))
    sspec = shard_spec(g, S)
    spec = sspec.spec
    rho0 = density_matrix_tensornetworkstate(
        jnp.complex128, lambda v: "+" if v[0] % 2 else "0", g
    )
    _, state = batched_from_tns(rho0, chi=chi, spec=spec)

    # one-site stage: Rx rotation followed by depolarizing + amplitude
    # damping, composed into a single 4x4 transfer matrix
    g1 = np.array(ptm_rot("X", 0.8, heisenberg=False))
    g1 = ch.channel_ptm("depolarizing", 0.05, 1, heisenberg=False) @ g1
    g1 = ch.channel_ptm("amplitude_damping", 0.07, 1, heisenberg=False) @ g1
    g2 = np.array(ptm_rot("ZZ", 0.35, heisenberg=False)).reshape(4, 4, 4, 4)
    tol = 1e-10

    ref = apply_one_site(state, jnp.asarray(g1))
    for group in spec.color_groups:
        ref = bp_update(spec, ref, maxiter=30, tolerance=tol)
        ref, _ = apply_color_group(ref, group, jnp.asarray(g2), chi, 1e-12, True)
    ref = bp_update(spec, ref, maxiter=30, tolerance=tol)

    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    layer = make_sharded_layer(
        sspec, mesh, g2, g1, chi, cutoff=1e-12, bp_tolerance=tol,
        one_site_first=True,
    )
    sh = NamedSharding(mesh, P("v"))
    sharded = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    out, _ = layer(sharded)
    np.testing.assert_allclose(
        np.asarray(out.tensors), np.asarray(ref.tensors), atol=1e-9
    )


def test_sharded_pauli_expectations_match_unsharded():
    """Per-site Tr[ρP] on the vertex-sharded noisy state equals the
    single-chip batched values (measurement never gathers)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tensornetworkquantumsimulator_tpu.parallel import (
        BatchedState,
        make_pauli_expectation_fn,
        make_sharded_pauli_expectations,
    )
    from tensornetworkquantumsimulator_tpu.parallel.sharding import shard_spec

    nx, ny, chi, S = 8, 4, 3, 8
    g = named_grid((nx, ny))
    sspec = shard_spec(g, S)
    spec = sspec.spec
    rho0 = density_matrix_tensornetworkstate(
        jnp.complex128, lambda v: "+" if v[0] % 2 else "0", g
    )
    _, state = batched_from_tns(rho0, chi=chi, spec=spec)
    _, layer = make_noisy_field_layer_fn(
        g, chi, noise=("depolarizing", "amplitude_damping"), spec=spec,
        bp_maxiter=40, bp_tolerance=1e-12,
    )
    state, _ = layer(state, 0.4, 0.3, jnp.asarray([0.04, 0.06]))

    ref_fn = make_pauli_expectation_fn(
        spec, chi, jnp.complex128, ops=("Z", "X"), maxiter=50,
        tolerance=1e-12,
    )
    ref = ref_fn(state)

    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    sh = NamedSharding(mesh, P("v"))
    sharded = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    fn = make_sharded_pauli_expectations(
        sspec, mesh, chi, jnp.complex128, ops=("Z", "X"), maxiter=50,
        tolerance=1e-12,
    )
    out = fn(sharded)
    for op in ("Z", "X"):
        np.testing.assert_allclose(
            np.asarray(out[op]), np.asarray(ref[op]), atol=1e-9
        )
