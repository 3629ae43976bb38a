"""Heavy-hex kicked-Ising dynamics with certified sampling (mirrors
`examples/heavyhexIsing_dynamics.jl`, the IBM-Eagle-style workload)."""

import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    edge_color,
    heavy_hexagonal_lattice,
    tensornetworkstate,
)
from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
from tensornetworkquantumsimulator_tpu.parallel import (
    BatchedCircuit,
    batched_product_state,
    batched_to_tns,
    make_expectation_fn,
    make_layer_fn,
)


def main(hx=5, hy=5, no_trotter_steps=20, chi=8, nsamples=10):
    g = heavy_hexagonal_lattice(hx, hy)
    print(f"heavy-hex lattice with {g.nv()} qubits")
    J, theta_h = 3.14159 / 4, 0.4

    layer = [("Rx", [v], theta_h) for v in g.vertices()]
    for edge_group in edge_color(g, 3):
        layer += [("Rzz", pair, 2 * J) for pair in edge_group]

    spec, state = batched_product_state(g, chi=chi, dtype=np.complex64)
    circuit = BatchedCircuit(layer, g, spec=spec)
    layer_fn = make_layer_fn(circuit, chi=chi, cutoff=1e-12)

    fidelities = []
    for i in range(1, no_trotter_steps + 1):
        t0 = time.perf_counter()
        state, errs = layer_fn(state)
        fid = float(np.prod(1.0 - np.asarray(errs)))
        fidelities.append(fid)
        print(f"Trotter step {i}: layer fidelity {fid:.6f} "
              f"({time.perf_counter() - t0:.3f}s)")

    total_fid = 1.0
    for f in fidelities:
        total_fid *= f
    print(f"Total final fidelity {total_fid:.6f}")

    central = sorted(g.vertices())[len(g.vertices()) // 2]
    z_fn = make_expectation_fn(spec, op_matrix("Z", 2), real_output=True)
    sz_bp = np.asarray(z_fn(state))[spec.vertex_position(central)]
    print(f"BP magnetisation on {central}: {sz_bp:.6f}")

    from tensornetworkquantumsimulator_tpu import siteinds as _siteinds

    psi = batched_to_tns(spec, state, g, _siteinds("S=1/2", g))
    bitstrings = tnqs.sample_directly_certified(
        psi, nsamples, alg="boundarymps", norm_mps_bond_dimension=10
    )
    pq = [b["poverq"] for b in bitstrings]
    print(f"Std of p(x)/q(x): {statistics.pstdev([abs(p) for p in pq]):.4f}")
    sampled_sz = sum(
        abs(b["poverq"]) * (-2 * b["bitstring"][central] + 1) for b in bitstrings
    ) / sum(abs(b["poverq"]) for b in bitstrings)
    print(f"Importance sampled magnetisation: {sampled_sz:.6f}")


if __name__ == "__main__":
    main()
