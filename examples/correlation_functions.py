"""Connected correlation functions C(r) = ⟨Z_0 Z_r⟩ − ⟨Z_0⟩⟨Z_r⟩ during
TFIM quench dynamics, measured on the batched TPU engine at every graph
distance in ONE jitted program per layer.

The reference can only do this through E sequential Steiner-tree
`expect` calls (`/root/reference/src/expect.jl:36-83`); here
`make_path_correlation_fn` compiles all pairs' BP path contractions into
one program (`parallel/correlations.py`).  The final layer is re-measured
through the loop-aware boundary-MPS correlator
(`make_grid_bmps_correlations`, same-row AND cross-row pairs via
op-inserted strand chains) to show the short-loop contributions BP's
tree approximation misses."""

import numpy as np

from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
from tensornetworkquantumsimulator_tpu.parallel import (
    BatchedCircuit,
    batched_product_state,
    make_grid_bmps_correlations,
    make_layer_fn,
    make_path_correlation_fn,
)
from tensornetworkquantumsimulator_tpu.utils import edge_color, named_grid


def main(steps=6, chi=6):
    nx_, ny_ = 5, 5
    g = named_grid((nx_, ny_))
    dt, hx, J = 0.2, 1.0, 0.5
    layer = [("Rx", [v], 2 * hx * dt) for v in g.vertices()]
    for group in edge_color(g, 4):
        layer += [("Rzz", pair, 2 * J * dt) for pair in group]

    spec, state = batched_product_state(g, chi=chi, dtype=np.complex64)
    circuit = BatchedCircuit(layer, g, spec=spec)
    layer_fn = make_layer_fn(circuit, chi=chi, cutoff=1e-10)

    # correlators from the row-center out to every distance along row 3
    row = [(3, c) for c in range(1, ny_ + 1)]
    origin = row[0]
    pairs = [(origin, v) for v in row[1:]]
    z = np.asarray(op_matrix("Z", 2))
    corr_fn = make_path_correlation_fn(
        spec, pairs, z, connected=True, real_output=True
    )

    for t in range(1, steps + 1):
        state, errs = layer_fn(state)
        c = np.asarray(corr_fn(state))
        pretty = "  ".join(f"C({r + 1})={v:+.5f}" for r, v in enumerate(c))
        print(f"layer {t}: max gate err {float(np.max(np.asarray(errs))):.2e}  {pretty}")

    # loop-aware re-measurement of the final state: the same row pairs
    # plus a cross-row diagonal, through the fitted boundary-MPS strands
    bmps_pairs = pairs + [(origin, (r, 3)) for r in (4, 5)]
    bmps_corr = make_grid_bmps_correlations(
        spec, nx_, ny_, kmps=2 * chi, pairs=bmps_pairs, real_output=True
    )
    raw = np.asarray(bmps_corr(state.tensors, z, z))
    labels = [f"{a}-{b}" for a, b in bmps_pairs]
    print("boundary-MPS ⟨ZZ⟩ (loop-aware, incl. cross-row):")
    print("  " + "  ".join(f"{l}={v:+.5f}" for l, v in zip(labels, raw)))


if __name__ == "__main__":
    main()
