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

    # boundary-MPS measurement + certified sampling run entirely in the
    # batched engine (heavy-hex rows are path partitions with pseudo-planar
    # fill-in, `boundarympscache.jl:139-167`; wires handle them here)
    from tensornetworkquantumsimulator_tpu.parallel import (
        batched_symmetric_gauge,
        make_planar_bmps,
        make_planar_certified_sampler,
    )

    gauged, _spectra = batched_symmetric_gauge(spec, state)
    _, z_bmps_fn = make_planar_bmps(spec, kmps=10, niters=20)
    sz_bmps = np.asarray(z_bmps_fn(gauged.tensors, jnp.asarray(op_matrix("Z", 2))))
    print(
        f"Boundary-MPS magnetisation on {central}: "
        f"{sz_bmps[spec.vertex_position(central)]:.6f}"
    )

    sampler = make_planar_certified_sampler(
        spec, norm_rank=10, projected_rank=10, niters=12
    )
    keys = jax.random.split(jax.random.PRNGKey(0), nsamples)
    bits, logq, log_poverq = sampler(gauged.tensors, keys)
    pq = np.exp(np.asarray(log_poverq, dtype=np.float64))
    print(f"Std of p(x)/q(x): {float(pq.std()):.4f}")
    c = spec.vertex_position(central)
    zbits = 1.0 - 2.0 * np.asarray(bits, float)[:, c]
    sampled_sz = float((pq * zbits).sum() / pq.sum())
    print(f"Importance sampled magnetisation: {sampled_sz:.6f}")


if __name__ == "__main__":
    main()
