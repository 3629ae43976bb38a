"""Benchmark: TFIM Trotter dynamics layers/sec on the batched TPU engine.

Configs (BASELINE.md):
  1. 5x5 grid TFIM, chi=10  — headline metric
  2. IBM-Eagle 127q heavy-hex kicked Ising, chi=8
  3. 5x5 grid TFIM, chi=32  — large-bond regime (SVD dominated)

Prints ONE JSON line {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}.

Measurement methodology (IMPORTANT — see CLAUDE.md "axon runtime"):
`jax.block_until_ready` does NOT synchronize on the axon TPU runtime — it
returns in ~0.2 ms regardless of how much device work is queued, so naive
timing measures dispatch latency, not compute (measured: a 105-layer and a
5-layer program both "complete" in 0.15-0.19 ms, while a forced sync shows
the real work takes seconds).  The only working synchronization is to
*attempt* a host download of a result scalar: the attempt blocks until the
device finishes the dependency chain, then (usually) fails with
UNIMPLEMENTED, which also poisons the process for further dispatches.
Therefore each timing sample runs in its own subprocess, dispatching the
SAME compiled n-layer program k times (chained through the state):

  wall(k) = remote_compile + k * n * t_layer + RTT + download_latency

with remote_compile/RTT/queue noise of seconds-to-minutes (shared service),
which dwarfs any slope signal.  The reported number is therefore the BEST
sample's k*n/wall — a throughput the device provably sustained during that
window (all overheads inflate wall, so the estimate is conservative); each
sample gets unique input bytes to defeat the service's result cache.

vs_baseline compares against the Julia-reference CPU per-layer wall-clock
(~1 s/layer for config 1; the reference publishes no numbers, BASELINE.md).
"""

import json
import os
import subprocess
import sys
import time

BASELINE_SECONDS_PER_LAYER = 1.0
REPEATS = int(os.environ.get("TNQS_BENCH_REPEATS", "2"))

CONFIGS = {
    # name: (n_layers_per_dispatch, k_lo, k_hi) — the probe dispatches the
    # same compiled n-layer program k times (chained), so the two k points
    # share identical HLO (same remote-compile distribution) and the slope
    # (k_hi-k_lo)·n amplifies the compute signal over the noise floor
    # (k_hi sized so the slope signal is ≳100 s ≫ the ~20 s noise floor)
    "chi10": (2005, 1, 17),
    "heavyhex": (255, 1, 33),
    "chi32": (255, 1, 17),
}


def _build(config: str, seed: int = 0):
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", f"/tmp/tnqs_jax_cache_{jax.default_backend()}"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from tensornetworkquantumsimulator_tpu.utils import edge_color, named_grid
    from tensornetworkquantumsimulator_tpu.parallel import BatchedCircuit, make_layer_fn
    from tensornetworkquantumsimulator_tpu.parallel.convert import batched_product_state

    if config == "heavyhex":
        from tensornetworkquantumsimulator_tpu.utils.lattices import ibm_eagle_lattice

        g = ibm_eagle_lattice()
        chi = 8
        layer = [("Rx", [v], 0.4) for v in g.vertices()]
        for group in edge_color(g, 3):
            layer += [("Rzz", pair, 2 * (3.14159 / 4)) for pair in group]
    else:
        chi = {"chi10": 10, "chi32": 32}[config]
        dt, hx, hz, J = 0.25, 1.0, 0.8, 0.5
        g = named_grid((5, 5))
        layer = [("Rx", [v], 2 * hx * dt) for v in g.vertices()]
        layer += [("Rz", [v], 2 * hz * dt) for v in g.vertices()]
        for colored_edges in edge_color(g, 4):
            layer += [("Rzz", pair, 2 * J * dt) for pair in colored_edges]

    # unique input bytes per sample (the axon service caches RESULTS for
    # identical (program, input) pairs — measured 0.6 s for a repeated
    # identical 2005-layer dispatch vs ~3 s real compute), folded into the
    # host-side state build so no extra upload is needed (a separate scalar
    # device_put poisons the dispatch chain on this runtime)
    state_fn = (lambda v: np.array([1.0 + 1.0e-6 * seed, 0.0])) if seed else None
    spec, state = batched_product_state(
        g, chi=chi, dtype=np.complex64, state_fn=state_fn
    )
    circuit = BatchedCircuit(layer, g, spec=spec)
    layer_fn = make_layer_fn(
        circuit, chi=chi, cutoff=1e-10, normalize_tensors=True,
        bp_maxiter=25, jit=False,
    )
    return spec, state, layer_fn


def run_probe(config: str, n: int, k: int = 1, seed: int = 0) -> None:
    """One timing sample: AOT-compile the n-layer scan, dispatch it k times
    chained, force sync via a download attempt, print {"wall_seconds": ...}.

    ``seed`` perturbs the initial product state host-side by (1 + 1e-6·seed)
    so every sample has unique input bytes while sharing the compiled
    program (see _build for why)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
    from tensornetworkquantumsimulator_tpu.parallel import local_expectations

    spec, state, layer_fn = _build(config, seed)
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
    st2 = state
    for _ in range(k):
        st2, z = compiled(st2)
    z_val = None
    try:
        z_val = float(z)  # blocks until the device finishes; may then fail
    except Exception:
        z_val = None
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {"config": config, "n": n, "k": k, "wall_seconds": wall, "z": z_val}
        )
    )


_SAMPLE_COUNTER = [0]


def _sample(config: str, n: int, k: int) -> tuple:
    """Run one probe subprocess; returns (wall_seconds, z) or (nan, None)."""
    _SAMPLE_COUNTER[0] += 1
    try:
        proc = subprocess.run(
            [
                sys.executable, __file__, "--probe", config, str(n), str(k),
                str(_SAMPLE_COUNTER[0]),
            ],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                rec = json.loads(line)
                return rec["wall_seconds"], rec.get("z")
    except Exception:
        pass
    return float("nan"), None


def _measure(config: str) -> tuple:
    """-> (best-sample sec/layer upper bound, z).

    Each sample's wall-clock covers k·n layers PLUS nonnegative overhead
    (queue, compile, RTT, download-failure latency), so k·n/wall is a
    throughput the device provably sustained — a conservative estimate that
    shared-tunnel noise can only lower, never inflate.  The best sample over
    repeats (wall ≥ 2 s sanity cutoff: sub-second walls mean the dispatch
    chain was poisoned and nothing ran) is reported.  A two-point slope is
    unusable here: queue delays of ±300 s dwarf the ~30 s signal."""
    n, k_lo, k_hi = CONFIGS[config]
    best, z_seen = float("inf"), None
    for _ in range(REPEATS):
        for k in (k_lo, k_hi):
            w, z = _sample(config, n, k)
            print(f"# {config} n={n} k={k}: {w:.1f}s", file=sys.stderr)
            if z is not None:
                z_seen = z
            if w == w and w >= 2.0:
                best = min(best, w / (k * n))
    if best == float("inf"):
        return float("nan"), z_seen
    return best, z_seen


def main() -> None:
    per_layer, z_center = _measure("chi10")
    hh_per_layer, _ = _measure("heavyhex")
    c32_per_layer, _ = _measure("chi32")

    def _inv(x):
        return 1.0 / x if x == x and x > 0 else float("nan")

    def _num(x, nd):
        return round(x, nd) if x == x else None  # NaN -> null (strict JSON)

    print(
        json.dumps(
            {
                "metric": "tfim_5x5_chi10_layers_per_sec",
                "value": _num(_inv(per_layer), 3),
                "unit": "layers/s",
                "vs_baseline": _num(
                    BASELINE_SECONDS_PER_LAYER * _inv(per_layer), 2
                ),
                "z_center_after_layers": _num(z_center, 6) if z_center is not None else None,
                "heavyhex127q_chi8_layers_per_sec": _num(_inv(hh_per_layer), 3),
                "tfim_5x5_chi32_layers_per_sec": _num(_inv(c32_per_layer), 3),
                "sync": "download-forced sync; best-sample k*n/wall lower bound (see docstring)",
            }
        )
    )


if __name__ == "__main__":
    if "--probe" in sys.argv:
        i = sys.argv.index("--probe")
        k = int(sys.argv[i + 3]) if len(sys.argv) > i + 3 else 1
        seed = int(sys.argv[i + 4]) if len(sys.argv) > i + 4 else 0
        run_probe(sys.argv[i + 1], int(sys.argv[i + 2]), k, seed)
    else:
        main()
