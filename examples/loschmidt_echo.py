"""Loschmidt echo L(t) = |⟨ψ₀|ψ(t)⟩|² / (⟨ψ₀|ψ₀⟩⟨ψ(t)|ψ(t)⟩) under a TFIM
quench, on the batched TPU engine: evolution AND the sandwich-BP overlap
run as jitted programs (`parallel/overlap.py`).

The reference computes overlaps through per-call BilinearForm assembly
(`/root/reference/src/inner.jl:53-98`); here the echo trajectory costs
one fixed-point loop per step on the fast path."""

import numpy as np

from tensornetworkquantumsimulator_tpu.parallel import (
    BatchedCircuit,
    batched_loschmidt_echo,
    batched_product_state,
    make_layer_fn,
)
from tensornetworkquantumsimulator_tpu.utils import edge_color, named_grid


def main(steps=8, chi=6):
    g = named_grid((4, 4))
    dt, hx, J = 0.15, 1.0, 0.6
    layer = [("Rx", [v], 2 * hx * dt) for v in g.vertices()]
    for group in edge_color(g, 4):
        layer += [("Rzz", pair, 2 * J * dt) for pair in group]

    spec, s0 = batched_product_state(g, chi=chi, dtype=np.complex64)
    layer_fn = make_layer_fn(BatchedCircuit(layer, g, spec=spec), chi=chi)

    from tensornetworkquantumsimulator_tpu.parallel import batched_inner

    log_norm0, _ = batched_inner(spec, s0, s0, maxiter=60)  # constant on
    st = s0                                                 # the trajectory
    for t in range(1, steps + 1):
        st, _ = layer_fn(st)
        log_abs, _phase = batched_loschmidt_echo(
            spec, s0, st, log_norm0=log_norm0, maxiter=60
        )
        # rate function: -log L / N  (the dynamical free energy density)
        n = spec.num_vertices
        rate = -2.0 * float(np.asarray(log_abs)) / n
        print(f"t={t * dt:.2f}  log|echo|={float(np.asarray(log_abs)):+.4f}  "
              f"rate={rate:.5f}")


if __name__ == "__main__":
    main()
