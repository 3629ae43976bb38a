"""Disorder-averaged TFIM dynamics: an ensemble of random-field
realizations evolving in ONE XLA program.

Each realization of the 2D transverse-field Ising model gets its own
random longitudinal fields (per-site Rx angles) and random couplings
(per-edge Rzz angles); `jax.vmap` over the parametric field layer
(`parallel/ensemble.py`) advances all of them per dispatch, and the
disorder-averaged magnetization ⟨Z⟩(t) comes off the device as one
[layers, E, V] array.

The reference has no counterpart: disorder averaging there costs E
sequential `apply_gates` runs (`apply_gates.jl:42-92`).  Here E scales
the MXU batch, not the wall clock.

    python examples/disorder_ensemble.py
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from tensornetworkquantumsimulator_tpu import named_grid
from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
from tensornetworkquantumsimulator_tpu.parallel import (
    batched_product_state,
    ensemble_fn,
    make_ensemble_expectation_fn,
    make_field_layer_fn,
    stack_states,
)


def main(nx=4, ny=4, chi=4, n_layers=8, n_ensemble=8, dt=0.1, seed=0):
    g = named_grid((nx, ny))
    spec, s0 = batched_product_state(g, chi=chi, dtype=np.complex64)
    _, layer = make_field_layer_fn(g, chi=chi, spec=spec, bp_maxiter=20)
    elayer = ensemble_fn(layer)
    expect_z = make_ensemble_expectation_fn(
        spec, op_matrix("Z", 2), real_output=True
    )

    V, E = spec.num_vertices, len(spec.edges)
    rng = np.random.default_rng(seed)
    # random fields h_i ~ U(0.5, 1.5), random couplings J_e ~ U(0.8, 1.2)
    site = jnp.asarray(2 * dt * rng.uniform(0.5, 1.5, (n_ensemble, V)),
                       jnp.float32)
    bond = jnp.asarray(2 * dt * rng.uniform(0.8, 1.2, (n_ensemble, E)),
                       jnp.float32)

    estate = stack_states([s0] * n_ensemble)
    traj = []
    for t in range(n_layers):
        estate, _ = elayer(estate, site, bond)
        traj.append(expect_z(estate))
    traj = np.asarray(jnp.stack(traj))  # [layers, E, V]

    zbar = traj.mean(axis=(1, 2))  # disorder+site average per layer
    zstd = traj.mean(axis=2).std(axis=1)  # realization spread
    for t, (m, s) in enumerate(zip(zbar, zstd)):
        print(f"layer {t + 1:2d}: <Z> = {m:+.6f}  ± {s:.6f} (over "
              f"{n_ensemble} realizations)")
    return zbar


if __name__ == "__main__":
    main()
