"""Hardware timings for the MEASUREMENT half of the library (VERDICT r4
item 3): batched boundary-MPS expectations and batched certified
sampling on the bench's 5x5 chi=10 state, under the driver methodology
(one dispatch, nested static scan, download-forced sync — bench.py).

Probes:
  bmps    — per-evaluation wall of `make_grid_bmps(...)[1]` (all-site
            <Z> through fitted boundary-MPS strands, chi_mps=16).  Each
            scan iteration rescales the state tensors by (1 + 1e-4*i):
            <Z> is scale-invariant, so the physics result is unchanged
            while loop-invariant code motion cannot hoist the evaluation
            out of the scan and the service's result cache cannot serve
            it.
  sample  — certified samples/second from `make_grid_certified_sampler`
            (conditional row sampling + projected-strand push +
            independent re-contraction certification), batch of 32 PRNG
            keys per iteration, fresh keys each iteration.

Reference hot paths: boundarympscache.jl:321-360 (expectation sweeps),
sampling.jl:209-298 (certified sampling).

Usage:
  python scripts/measure_bench.py --probe bmps 63 4 1     # variant n k seed
  python scripts/measure_bench.py                         # all, retrying
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

NSAMPLES = 32  # certified-sample batch per iteration


def _configure_jax():
    import jax

    if os.environ.get("TNQS_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() != "cpu":  # CPU AOT cache is machine-pinned
        jax.config.update(
            "jax_compilation_cache_dir",
            f"/tmp/tnqs_jax_cache_{jax.default_backend()}",
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def run_probe(variant: str, n: int, k: int, seed: int) -> None:
    jax = _configure_jax()
    import jax.numpy as jnp
    import numpy as np

    from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
    from tensornetworkquantumsimulator_tpu.parallel import (
        make_grid_bmps,
        make_grid_certified_sampler,
    )
    from tensornetworkquantumsimulator_tpu.parallel.convert import (
        batched_product_state,
    )
    from tensornetworkquantumsimulator_tpu.utils import named_grid

    nx = ny = 5
    chi = int(os.environ.get("TNQS_MEASURE_CHI", "10"))
    g = named_grid((nx, ny))
    state_fn = (lambda v: np.array([1.0 + 1e-6 * seed, 0.6])) if seed else (
        lambda v: np.array([1.0, 0.6])
    )
    spec, state = batched_product_state(
        g, chi=chi, dtype=np.complex64, state_fn=state_fn
    )
    # a few generic layers' worth of entanglement would be better, but
    # the probe state only needs non-trivial strands: perturb the padded
    # product tensors with a seeded random bond excitation.  The noise is
    # built HOST-side (numpy) and the add happens IN-program: downloading
    # state.tensors for a host-side add raises UNIMPLEMENTED on axon
    rng = np.random.default_rng(42)
    shape = tuple(state.tensors.shape)
    noise = 0.05 * (
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ).astype(np.complex64)

    op = np.asarray(op_matrix("Z", 2))

    if variant == "bmps":
        _norm, expect = make_grid_bmps(spec, nx, ny, kmps=16, niters=8)

        def run_n(tp, nz):
            t0 = tp + nz

            def body(c, i):
                z = expect(t0 * (1.0 + 1e-4 * i), jnp.asarray(op))
                return c + jnp.sum(z), None

            def repeat(c, kk):
                c, _ = jax.lax.scan(
                    body, c, jnp.arange(n, dtype=jnp.float32) + 0.3 * kk
                )
                return c, None

            c, _ = jax.lax.scan(
                repeat, jnp.float32(0.0), jnp.arange(k, dtype=jnp.float32)
            )
            return c * jnp.ones((8,), jnp.float32)

    elif variant == "sample":
        sampler = make_grid_certified_sampler(
            spec, nx, ny, norm_rank=8, projected_rank=8
        )

        def run_n(tp, nz):
            t0 = tp + nz

            def body(c, i):
                keys = jax.vmap(
                    lambda j: jax.random.fold_in(
                        jax.random.PRNGKey(seed), i * NSAMPLES + j
                    )
                )(jnp.arange(NSAMPLES))
                bits, logq, cert = sampler(t0, keys)
                return c + jnp.sum(logq) + jnp.sum(cert), None

            def repeat(c, kk):
                c, _ = jax.lax.scan(
                    body, c,
                    jnp.arange(n, dtype=jnp.int32) + jnp.int32(1000) * kk,
                )
                return c, None

            c, _ = jax.lax.scan(
                repeat, jnp.float32(0.0), jnp.arange(k, dtype=jnp.int32)
            )
            return c * jnp.ones((8,), jnp.float32)

    else:
        raise SystemExit(f"unknown variant {variant}")

    compiled = jax.jit(run_n).lower(state.tensors, noise).compile()
    t0c = time.perf_counter()
    out = compiled(state.tensors, noise)
    z_val = None
    t1 = time.perf_counter()
    try:
        z_val = float(np.asarray(out)[0])
    except Exception:
        z_val = None
    t_sync = time.perf_counter() - t1
    wall = time.perf_counter() - t0c
    rec = {
        "variant": variant, "chi": chi, "n": n, "k": k,
        "wall_seconds": wall, "sync_seconds": t_sync, "z": z_val,
        "per_eval_ms": 1e3 * wall / (n * k),
    }
    if variant == "sample":
        rec["samples_per_sec"] = NSAMPLES * n * k / wall
    print(json.dumps(rec), flush=True)


def main():
    plans = {"bmps": (63, 4), "sample": (15, 4)}
    results = {}
    deadline = time.time() + float(
        os.environ.get("TNQS_MEASURE_BUDGET_S", "2400")
    )
    attempt = 0
    while time.time() < deadline and len(results) < len(plans):
        for variant, (n, k) in plans.items():
            if variant in results or time.time() > deadline:
                continue
            attempt += 1
            proc = subprocess.Popen(
                [sys.executable, __file__, "--probe", variant, str(n),
                 str(k), str(attempt)],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            )
            try:
                out, _ = proc.communicate(timeout=420)
            except subprocess.TimeoutExpired:
                proc.kill()
                print(f"# {variant}: probe cap hit", file=sys.stderr,
                      flush=True)
                continue
            rec = next(
                (json.loads(l) for l in (out or "").splitlines()
                 if l.startswith("{")), None)
            if rec is None:
                print(f"# {variant}: probe died", file=sys.stderr, flush=True)
                continue
            print(f"# {variant}: {json.dumps(rec)}", file=sys.stderr,
                  flush=True)
            if rec["wall_seconds"] >= 2.0 and (
                rec["z"] is not None or rec["sync_seconds"] >= 1.0
            ):
                results[variant] = rec
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    if "--probe" in sys.argv:
        i = sys.argv.index("--probe")
        run_probe(sys.argv[i + 1], int(sys.argv[i + 2]),
                  int(sys.argv[i + 3]), int(sys.argv[i + 4]))
    else:
        main()
