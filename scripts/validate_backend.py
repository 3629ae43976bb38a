"""Backend physics validation: print the per-layer ⟨Z⟩(center) trajectory of
the headline 5×5 χ=10 TFIM workload on whatever backend JAX selects.

Run on CPU (`JAX_PLATFORMS=cpu python scripts/validate_backend.py`) and on
the TPU (default backend) and diff the trajectories — they agree to f32
rounding because both execute the same XLA program. Downloads are scalar
(the axon TPU runtime cannot transfer arrays to host).
"""

import jax

try:
    jax.config.update(
        "jax_compilation_cache_dir", f"/tmp/tnqs_jax_cache_{jax.default_backend()}"
    )
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
from tensornetworkquantumsimulator_tpu.parallel import (
    BatchedCircuit,
    batched_product_state,
    local_expectations,
    make_layer_fn,
)
from tensornetworkquantumsimulator_tpu.utils import edge_color, named_grid


def main(nl=20, chi=10):
    g = named_grid((5, 5))
    dt, hx, hz, J = 0.25, 1.0, 0.8, 0.5
    layer = []
    layer += [("Rx", [v], 2 * hx * dt) for v in g.vertices()]
    layer += [("Rz", [v], 2 * hz * dt) for v in g.vertices()]
    for ce in edge_color(g, 4):
        layer += [("Rzz", pair, 2 * J * dt) for pair in ce]
    spec, state = batched_product_state(g, chi=chi, dtype=np.complex64)
    circuit = BatchedCircuit(layer, g, spec=spec)
    layer_fn = make_layer_fn(circuit, chi=chi, cutoff=1e-10, bp_maxiter=25)
    op = np.asarray(op_matrix("Z", 2))
    center = spec.vertex_position((3, 3))

    @jax.jit
    def z_center(st):
        return jnp.real(local_expectations(spec, st, op)[center])

    print(f"backend: {jax.default_backend()}")
    for l in range(1, nl + 1):
        state, _ = layer_fn(state)
        try:
            print(f"layer {l:3d}: Z(3,3) = {float(z_center(state)):+.6f}")
        except Exception as e:  # scalar download can be flaky on axon
            print(f"layer {l:3d}: <download failed: {type(e).__name__}>")


if __name__ == "__main__":
    main()
