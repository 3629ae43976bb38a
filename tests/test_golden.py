"""Golden-value regression: the 3x3 TFIM ⟨Z⟩(center) trajectory, captured
from the generic engine in float64 (BP-converged to 1e-14). Guards the whole
stack (gates → simple update → BP → expect) against silent numerics drift."""

import jax.numpy as jnp
import numpy as np

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    BeliefPropagationCache,
    edge_color,
    named_grid,
    tensornetworkstate,
)

GOLDEN = [
    0.877582561890,
    0.706469816108,
    0.668439306795,
    0.716749495652,
    0.788811892090,
]


def test_tfim_3x3_golden_trajectory():
    g = named_grid((3, 3))
    dt, hx, hz, J = 0.25, 1.0, 0.8, 0.5
    layer = []
    layer += [("Rx", [v], 2 * hx * dt) for v in g.vertices()]
    layer += [("Rz", [v], 2 * hz * dt) for v in g.vertices()]
    for ce in edge_color(g, 4):
        layer += [("Rzz", pair, 2 * J * dt) for pair in ce]
    psi0 = tensornetworkstate(jnp.complex128, lambda v: "↑", g, "S=1/2")
    bpc = BeliefPropagationCache(psi0).update()
    traj = []
    for _ in range(len(GOLDEN)):
        bpc, errs = tnqs.apply_gates(
            layer,
            bpc,
            apply_kwargs=dict(maxdim=4, cutoff=1e-14),
            bp_update_kwargs=dict(maxiter=100, tolerance=1e-14),
        )
        traj.append(np.real(tnqs.expect(bpc, ("Z", [(2, 2)]), alg="bp")))
    np.testing.assert_allclose(traj, GOLDEN, atol=1e-9)


def test_tfim_3x3_golden_trajectory_batched():
    """The batched engine reproduces the same golden trajectory (f64)."""
    import numpy as _np
    from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
    from tensornetworkquantumsimulator_tpu.parallel import (
        BatchedCircuit,
        batched_product_state,
        make_expectation_fn,
        make_layer_fn,
    )

    g = named_grid((3, 3))
    dt, hx, hz, J = 0.25, 1.0, 0.8, 0.5
    layer = []
    layer += [("Rx", [v], 2 * hx * dt) for v in g.vertices()]
    layer += [("Rz", [v], 2 * hz * dt) for v in g.vertices()]
    for ce in edge_color(g, 4):
        layer += [("Rzz", pair, 2 * J * dt) for pair in ce]
    spec, state = batched_product_state(g, chi=4, dtype=_np.complex128)
    circuit = BatchedCircuit(layer, g, spec=spec)
    layer_fn = make_layer_fn(
        circuit, chi=4, cutoff=1e-14, bp_maxiter=100, bp_tolerance=1e-14
    )
    z_fn = make_expectation_fn(spec, op_matrix("Z", 2), real_output=True)
    traj = []
    for _ in range(len(GOLDEN)):
        state, _ = layer_fn(state)
        traj.append(float(_np.asarray(z_fn(state))[spec.vertex_position((2, 2))]))
    np.testing.assert_allclose(traj, GOLDEN, atol=1e-6)
