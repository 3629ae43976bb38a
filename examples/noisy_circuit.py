"""Noisy kicked-Ising dynamics in the density-matrix picture.

Evolves ρ(t) for a 4×4 kicked transverse-field Ising circuit with
per-site depolarizing + amplitude-damping noise after every layer, as a
Pauli-coefficient tensor network over "PauliRho" sites
(`models/channels.py`, `density_matrix_tensornetworkstate`).  Tracks the
noise-driven decay of the staggered magnetization and the global purity
Tr[ρ²] (second Rényi entropy).  The same circuit runs on the batched
TPU engine via ``BatchedCircuit(picture="rho")``.

The reference has no counterpart: its gate zoo is unitary-only
(`gate_definitions.jl`).

    python examples/noisy_circuit.py
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from tensornetworkquantumsimulator_tpu import (
    density_matrix_tensornetworkstate,
    edge_color,
    named_grid,
    pauli_expectation,
    purity,
)
import tensornetworkquantumsimulator_tpu as tnqs


def main(nx=4, ny=4, layers=5, dt=0.15, h=1.0, J=1.0, p_dep=0.02, gam=0.03):
    g = named_grid((nx, ny))
    layer = [("Rx", [v], 2 * h * dt) for v in g.vertices()]
    for group in edge_color(g, 4):
        layer += [("Rzz", pair, 2 * J * dt) for pair in group]
    layer += [("depolarizing", [v], p_dep) for v in g.vertices()]
    layer += [("amplitude_damping", [v], gam) for v in g.vertices()]

    rho = density_matrix_tensornetworkstate(jnp.float64, lambda v: "0", g)
    obs = [("Z", [v]) for v in g.vertices()]
    print("layer  <Z>_mean    purity")
    for t in range(layers):
        rho, _ = tnqs.apply_circuit(
            layer,
            rho,
            apply_kwargs=dict(maxdim=8, cutoff=1e-12, normalize_tensors=False),
        )
        z = np.real(pauli_expectation(rho, obs, alg="bp"))
        p2 = purity(rho, alg="bp")
        print(f"{t + 1:5d}  {np.mean(z):+.6f}  {p2:.6f}")

    from tensornetworkquantumsimulator_tpu.sampling import sample_density_matrix

    samples = sample_density_matrix(rho, 5)
    print("samples from the noisy state (bit fraction, logp):")
    for s in samples:
        bits = s["bitstring"]
        frac = sum(bits.values()) / len(bits)
        print(f"    {frac:.3f}  {s['logp']:+.3f}")

    # the same circuit on the batched TPU engine: evolve + measure as
    # jitted programs (BatchedCircuit(picture="rho") + one sandwich-BP
    # expectation program for every site)
    from tensornetworkquantumsimulator_tpu import (
        density_matrix_tensornetworkstate as dm_state,
    )
    from tensornetworkquantumsimulator_tpu.parallel import (
        BatchedCircuit,
        batched_from_tns,
        make_layer_fn,
        make_pauli_expectation_fn,
    )

    chi = 8
    spec, state = batched_from_tns(dm_state(jnp.complex64, lambda v: "0", g), chi=chi)
    bc = BatchedCircuit(layer, g, spec=spec, d=4, picture="rho")
    layer_fn = jax.jit(make_layer_fn(bc, chi=chi, cutoff=1e-10, normalize_tensors=False))
    expect_fn = jax.jit(make_pauli_expectation_fn(spec, chi, jnp.complex64))
    for _ in range(layers):
        state, _ = layer_fn(state)
    zb = np.asarray(expect_fn(state)["Z"])
    print(f"batched engine <Z>_mean after {layers} layers: {np.mean(zb):+.6f}")

    # batched counterparts of purity + sampling: one jitted program each
    from tensornetworkquantumsimulator_tpu.parallel import (
        batched_purity,
        make_rho_sampler,
    )

    p2_b = float(np.asarray(batched_purity(spec, state)))
    print(f"batched engine purity after {layers} layers: {p2_b:.6f}")
    sampler = make_rho_sampler(spec, chi, jnp.complex64, refresh_iters=6)
    bits, logps = sampler(state, jax.random.split(jax.random.PRNGKey(0), 5))
    print("batched samples (bit fraction, logp):")
    for i in range(5):
        frac = float(np.mean(np.asarray(bits[i])))
        print(f"    {frac:.3f}  {float(logps[i]):+.3f}")

    # noise-rate sweep: E depolarizing strengths advance in ONE vmapped
    # program (make_noisy_field_layer_fn: rates are runtime inputs)
    from tensornetworkquantumsimulator_tpu.parallel import (
        ensemble_fn,
        make_noisy_field_layer_fn,
        stack_states,
    )

    _, noisy_layer = make_noisy_field_layer_fn(
        g, chi, noise=("depolarizing",), spec=spec, jit=False
    )
    rates = jnp.asarray([0.0, p_dep, 2 * p_dep, 4 * p_dep])
    _, st0 = batched_from_tns(dm_state(jnp.complex64, lambda v: "0", g), chi=chi)
    estate = stack_states([st0] * len(rates))
    sweep = ensemble_fn(noisy_layer, in_axes=(0, None, None, 0))
    for _ in range(layers):
        estate, _ = sweep(estate, 2 * h * dt, 2 * J * dt, rates)
    z_sweep = jax.vmap(lambda s: expect_fn(s)["Z"])(estate)
    print("noise-rate sweep <Z>_mean per rate:",
          [f"{float(np.mean(np.asarray(z_sweep[i]))):+.4f}" for i in range(len(rates))])
    return rho


if __name__ == "__main__":
    main()
