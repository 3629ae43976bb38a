"""Ising dynamics on a 3x3x3 periodic cube (mirrors
`examples/3dIsing_dynamics.jl`): 7-way edge coloring, Rz + Rxx Trotter
layers, BP ⟨Z⟩ at the center."""

import time

import jax
import jax.numpy as jnp
import numpy as np

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import edge_color, named_grid, tensornetworkstate
from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
from tensornetworkquantumsimulator_tpu.parallel import (
    BatchedCircuit,
    batched_product_state,
    make_expectation_fn,
    make_layer_fn,
)


def main(no_trotter_steps=10, chi=4):
    g = named_grid((3, 3, 3), periodic=True)

    h, J, dt = -1.0, -1.0, 0.04
    layer = []
    layer += [("Rz", [v], h * dt) for v in g.vertices()]
    for colored_edges in edge_color(g, 7):
        layer += [("Rxx", pair, 2 * J * dt) for pair in colored_edges]
    layer += [("Rz", [v], h * dt) for v in g.vertices()]

    spec, state = batched_product_state(g, chi=chi, dtype=np.complex64)
    circuit = BatchedCircuit(layer, g, spec=spec)
    layer_fn = make_layer_fn(circuit, chi=chi, cutoff=1e-10)
    z_fn = make_expectation_fn(spec, op_matrix("Z", 2), real_output=True)
    vc = g.center()[0]
    pos = spec.vertex_position(vc)

    print(f"Initial Sigma Z on centre site: {np.asarray(z_fn(state))[pos]:.6f}")
    for l in range(1, no_trotter_steps + 1):
        t0 = time.perf_counter()
        state, errors = layer_fn(state)
        z = np.asarray(z_fn(state))[pos]
        errs_host = np.asarray(errors)
        print(f"Layer {l}: took {time.perf_counter() - t0:.4f}s, "
              f"max gate error {errs_host.max():.3e}, "
              f"Sigma z = {z:.6f}")


if __name__ == "__main__":
    main()
