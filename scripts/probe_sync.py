"""Probe: does block_until_ready actually synchronize on this runtime?

Times the same scan program at two different layer counts, with and without
a forced scalar download.  If wall-clock is flat in the layer count without
the download, block_until_ready is NOT synchronizing and every published
throughput number needs the download-fit methodology instead.
"""

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
from functools import partial

from tensornetworkquantumsimulator_tpu.utils import edge_color, named_grid
from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
from tensornetworkquantumsimulator_tpu.parallel import (
    BatchedCircuit,
    make_layer_fn,
    local_expectations,
)
from tensornetworkquantumsimulator_tpu.parallel.convert import batched_product_state

CHI = 10
dt, hx, hz, J = 0.25, 1.0, 0.8, 0.5
g = named_grid((5, 5))
layer = []
layer += [("Rx", [v], 2 * hx * dt) for v in g.vertices()]
layer += [("Rz", [v], 2 * hz * dt) for v in g.vertices()]
for colored_edges in edge_color(g, 4):
    layer += [("Rzz", pair, 2 * J * dt) for pair in colored_edges]

spec, state = batched_product_state(g, chi=CHI, dtype=np.complex64)
circuit = BatchedCircuit(layer, g, spec=spec)
layer_fn = make_layer_fn(
    circuit, chi=CHI, cutoff=1e-10, normalize_tensors=True, bp_maxiter=25, jit=False
)
op = np.asarray(op_matrix("Z", 2))
center = len(spec.vertices) // 2


@partial(jax.jit, static_argnums=1)
def run_n(st, n):
    def body(s, _):
        s, errs = layer_fn(s)
        return s, None

    st, _ = jax.lax.scan(body, st, None, length=n)
    z = jnp.real(local_expectations(spec, st, op)[center])
    return st, z


for n in (5, 105):
    s2, z = run_n(state, n)
    jax.block_until_ready((s2, z))  # warm/compile

for tag, download in (("block_until_ready only", False), ("with scalar download", True)):
    for n in (5, 105):
        t0 = time.perf_counter()
        s2, z = run_n(state, n)
        jax.block_until_ready((s2, z))
        zv = None
        if download:
            try:
                zv = float(z)
            except Exception as exc:
                zv = f"DOWNLOAD FAILED: {type(exc).__name__}"
        t = time.perf_counter() - t0
        print(f"{tag:26s} n={n:4d}  wall={t*1e3:9.3f} ms  z={zv}")
