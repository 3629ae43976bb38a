"""Honest device-throughput measurement for one config.

Usage: python scripts/probe_sync2.py <chi> <n_layers>

Method (see CLAUDE.md "axon runtime"): block_until_ready does NOT
synchronize on this runtime, so we
1. AOT-compile the n-layer scan (lower().compile() — no execution),
2. dispatch it once inside the timed window,
3. force synchronization by attempting a scalar download — the attempt
   blocks until the device finishes the dependency chain even when the
   download itself fails with UNIMPLEMENTED (measured: 0.15 ms flat
   without it, 11 s with it on a backlogged queue).
A failed download poisons the process for further dispatches, so exactly
one measurement is made per process; the caller runs two layer counts and
takes the slope to cancel the constant RTT + failure latency.

Prints one JSON line {"chi":..., "n":..., "wall_seconds":...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir", f"/tmp/tnqs_jax_cache_{jax.default_backend()}"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tensornetworkquantumsimulator_tpu.utils import edge_color, named_grid
from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
from tensornetworkquantumsimulator_tpu.parallel import (
    BatchedCircuit,
    make_layer_fn,
    local_expectations,
)
from tensornetworkquantumsimulator_tpu.parallel.convert import batched_product_state


def main(chi: int, n: int) -> None:
    dt, hx, hz, J = 0.25, 1.0, 0.8, 0.5
    g = named_grid((5, 5))
    layer = []
    layer += [("Rx", [v], 2 * hx * dt) for v in g.vertices()]
    layer += [("Rz", [v], 2 * hz * dt) for v in g.vertices()]
    for colored_edges in edge_color(g, 4):
        layer += [("Rzz", pair, 2 * J * dt) for pair in colored_edges]

    spec, state = batched_product_state(g, chi=chi, dtype=np.complex64)
    circuit = BatchedCircuit(layer, g, spec=spec)
    layer_fn = make_layer_fn(
        circuit, chi=chi, cutoff=1e-10, normalize_tensors=True,
        bp_maxiter=25, jit=False,
    )
    op = np.asarray(op_matrix("Z", 2))
    center = len(spec.vertices) // 2

    def run_n(st):
        def body(s, _):
            s, errs = layer_fn(s)
            return s, None

        st, _ = jax.lax.scan(body, st, None, length=n)
        z = jnp.real(local_expectations(spec, st, op)[center])
        return st, z

    compiled = jax.jit(run_n).lower(state).compile()  # no device execution

    t0 = time.perf_counter()
    st2, z = compiled(state)
    z_val = None
    try:
        z_val = float(z)  # blocks until the device finishes, then may fail
    except Exception as exc:
        z_val = None
    wall = time.perf_counter() - t0
    print(json.dumps({"chi": chi, "n": n, "wall_seconds": wall, "z": z_val}))


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
