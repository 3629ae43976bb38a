"""2D transverse-field Ising dynamics on a 5x5 grid.

Mirrors `examples/2dIsing_dynamics.jl` of the reference: Trotterized TFIM
layer (Rx, Rz, edge-colored Rzz), simple-update evolution with BP
environments, per-layer truncation errors, BP and boundary-MPS ⟨Z⟩ at the
center site.  Runs on the batched TPU engine with the generic engine as the
measurement backend.
"""

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
    batched_to_tns,
    make_expectation_fn,
    make_layer_fn,
)


def main(nl=20, nx=5, ny=5, chi=5, mps_bond_dimension=4):
    g = named_grid((nx, ny))
    dt, hx, hz, J = 0.25, 1.0, 0.8, 0.5

    layer = []
    layer += [("Rx", [v], 2 * hx * dt) for v in g.vertices()]
    layer += [("Rz", [v], 2 * hz * dt) for v in g.vertices()]
    for colored_edges in edge_color(g, 4):
        layer += [("Rzz", pair, 2 * J * dt) for pair in colored_edges]

    obs_v = ((nx + 1) // 2 + 1, (ny + 1) // 2 + 1)  # near the middle

    spec, state = batched_product_state(g, chi=chi, dtype=np.complex64)
    circuit = BatchedCircuit(layer, g, spec=spec)
    layer_fn = make_layer_fn(circuit, chi=chi, cutoff=1e-10)
    z_fn = make_expectation_fn(spec, op_matrix("Z", 2), real_output=True)
    obs_pos = spec.vertex_position((3, 3))

    for l in range(1, nl + 1):
        t0 = time.perf_counter()
        state, errors = layer_fn(state)
        z_host = np.asarray(z_fn(state))
        errs_host = np.asarray(errors)
        t1 = time.perf_counter() - t0
        print(f"Layer {l}")
        print(f"    Took time: {t1:.4f} [s]")
        print(f"    Maximum Gate error for layer was {errs_host.max():.3e}")
        print(f"    BP Measured Sigmaz is {z_host[obs_pos]:.6f}")

    # boundary-MPS measurement through the generic engine
    from tensornetworkquantumsimulator_tpu import siteinds as _siteinds

    psi = batched_to_tns(spec, state, g, _siteinds("S=1/2", g))
    sz_bmps = tnqs.expect(
        psi, ("Z", [(3, 3)]), alg="boundarymps",
        mps_bond_dimension=mps_bond_dimension,
    )
    print(f"Boundary MPS Measured Sigmaz is {sz_bmps:.6f}")


if __name__ == "__main__":
    main()
