"""Heisenberg-picture Ising dynamics in the Pauli basis (mirrors
`examples/2dIsing_dynamics_Heisenbergpicture.jl`): evolve an observable
through the reversed circuit with Pauli-transfer-matrix gates, track
Frobenius norm and traces."""

import jax.numpy as jnp
import numpy as np

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    BeliefPropagationCache,
    edge_color,
    identitytensornetworkstate,
    named_grid,
    paulitensornetworkstate,
)


def main(no_trotter_steps=5, chi=4):
    nx, ny = 4, 4
    g = named_grid((nx, ny))
    vz = g.center()[0]
    # physical indices represent [I, X, Y, Z]
    psi0 = paulitensornetworkstate(
        jnp.complex64, lambda v: "Z" if v == vz else "I", g
    )
    psi = psi0.copy()

    h, J, dt = -1.0, -1.0, 0.04
    layer = []
    layer += [("Rz", [v], h * dt) for v in g.vertices()]
    for colored_edges in edge_color(g, 4):
        layer += [("Rxx", pair, 2 * J * dt) for pair in colored_edges]
    layer += [("Rz", [v], h * dt) for v in g.vertices()]
    # Heisenberg picture: the circuit is applied reversed
    layer = list(reversed(layer))

    psi_bpc = BeliefPropagationCache(psi).update()
    for l in range(1, no_trotter_steps + 1):
        psi_bpc, errors = tnqs.apply_gates(
            layer, psi_bpc,
            apply_kwargs=dict(maxdim=chi, cutoff=1e-12, normalize_tensors=False),
        )
        psi_bpc = psi_bpc.rescale()
        print(f"Layer {l}")
        print(f"  Frobenius norm of O(t): {psi_bpc.partitionfunction():.6f}")
        psi = psi_bpc.network()
        tr_t = tnqs.inner(psi, identitytensornetworkstate(g, psi.siteinds()), alg="bp")
        tr_t0 = tnqs.inner(psi, psi0, alg="bp")
        print(f"  Trace(O(t)):      {tr_t}")
        print(f"  Trace(O(t)O(0)):  {tr_t0}")
        print(f"  Max gate error:   {np.max(errors):.3e}")


if __name__ == "__main__":
    main()
