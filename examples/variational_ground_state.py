"""Gradient-based variational ground-state search for the 2D TFIM.

Direct energy minimization: optax gradient steps on the PEPS vertex
tensors against the BP energy functional, with reverse-mode autodiff
flowing through the flooding-BP environment iterations (see
`parallel/variational.py`).  Compare with `tfim_ground_state.py`, which
reaches the same state by imaginary-time TEBD — the variational path has
no reference counterpart (it exists because JAX provides whole-program
autodiff).

The entire optimization (all steps, BP sweeps, expectation quotients,
gradients, and adam updates) compiles to ONE XLA program.
"""

import numpy as np

from tensornetworkquantumsimulator_tpu.parallel import (
    batched_product_state,
    ground_state,
    tfim_hamiltonian,
)
from tensornetworkquantumsimulator_tpu.utils import named_grid


def main(nx=3, ny=3, chi=4, hx=3.0, J=1.0, steps=600, lr=3e-2, seed=0):
    g = named_grid((nx, ny))
    spec, state = batched_product_state(g, chi=chi, dtype=np.float32)

    # symmetry-breaking noise on the valid block (dummy slots keep bond
    # dimension 1 so the state stays a pure wavefunction)
    rng = np.random.default_rng(seed)
    t = np.asarray(state.tensors)
    noise = rng.normal(size=t.shape).astype(t.dtype)
    mask = np.asarray(spec.mask_array())
    for k in range(spec.degree):
        idx = [slice(None)] * t.ndim
        idx[1 + k] = slice(1, None)
        noise[tuple(idx)] *= mask[:, k][(slice(None),) + (None,) * (t.ndim - 1)]
    state = state._replace(tensors=t + 0.1 * noise)

    ham = tfim_hamiltonian(J=J, hx=hx)
    state, energies = ground_state(
        spec, state, ham, steps=steps, learning_rate=lr,
        bp_sweeps_per_eval=12, damping=0.1,
    )
    energies = np.asarray(energies)
    for s in range(0, steps, max(1, steps // 10)):
        print(f"step {s:5d}: E = {energies[s]:.6f}")
    print(f"final:      E = {energies[-1]:.6f}")
    return float(energies[-1])


if __name__ == "__main__":
    main()
