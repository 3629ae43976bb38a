"""shard_map overhead on the ONE real chip (VERDICT r4 item 5c).

Times the SAME 5x5 chi=10 Trotter layer two ways on a mesh of one
device, driver methodology (one dispatch, nested static scan, forced
sync):

  plain    — engine primitives (apply_one_site + per-group bp_update +
             apply_color_group + final bp_update), no shard_map
  sharded  — `make_sharded_layer` on a 1-device Mesh (the full halo
             machinery: shard_map, ppermute ring of one, masked
             cross-shard buckets)

Identical physics; the wall delta is the shard_map/partitioner tax a
single-chip user pays for running the SPMD program.  Alternate probes
A/B-style so tunnel queue drift is common-mode.

Usage:
  python scripts/shard_overhead.py --probe plain 255 4 1
  python scripts/shard_overhead.py          # alternate both, retrying
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _configure_jax():
    import jax

    if os.environ.get("TNQS_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() != "cpu":
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
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tensornetworkquantumsimulator_tpu.models.gates import gate_matrix
    from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
    from tensornetworkquantumsimulator_tpu.parallel import (
        BatchedState,
        apply_one_site,
        bp_update,
        local_expectations,
    )
    from tensornetworkquantumsimulator_tpu.parallel.convert import (
        batched_product_state,
    )
    from tensornetworkquantumsimulator_tpu.parallel.engine import (
        apply_color_group,
    )
    from tensornetworkquantumsimulator_tpu.parallel.sharded_layer import (
        make_sharded_layer,
    )
    from tensornetworkquantumsimulator_tpu.parallel.sharding import shard_spec
    from tensornetworkquantumsimulator_tpu.utils import named_grid

    chi = 10
    g = named_grid((5, 5))
    sspec = shard_spec(g, 1)
    spec = sspec.spec
    state_fn = (lambda v: np.array([1.0 + 1e-6 * seed, 0.0])) if seed else None
    _, state = batched_product_state(
        g, chi=chi, dtype=np.complex64, spec=spec, state_fn=state_fn
    )
    gate2 = np.asarray(gate_matrix("Rzz", 0.35)).reshape(2, 2, 2, 2)
    gate1 = np.asarray(gate_matrix("Rx", 0.8))
    tol = 1e-5

    if variant == "sharded":
        mesh = Mesh(np.array(jax.devices()[:1]), ("v",))
        layer = make_sharded_layer(
            sspec, mesh, gate2, gate1, chi, cutoff=1e-10, bp_maxiter=25,
            bp_tolerance=tol, one_site_first=True,
        )
        sh = NamedSharding(mesh, P("v"))
        state = BatchedState(
            jax.device_put(state.tensors, sh),
            jax.device_put(state.messages, sh),
        )

        def one_layer(st):
            st, _errs = layer(st)
            return st
    else:
        def one_layer(st):
            st = apply_one_site(st, jnp.asarray(gate1))
            for grp in spec.color_groups:
                st = bp_update(spec, st, maxiter=25, tolerance=tol)
                st, _e = apply_color_group(
                    st, grp, jnp.asarray(gate2), chi, 1e-10, True
                )
            return bp_update(spec, st, maxiter=25, tolerance=tol)

    op = np.asarray(op_matrix("Z", 2))
    center = len(spec.vertices) // 2

    def run_n(st):
        def body(s, _):
            return one_layer(s), None

        def repeat(s, _):
            s, _ = jax.lax.scan(body, s, None, length=n)
            return s, None

        st, _ = jax.lax.scan(repeat, st, None, length=k)
        z = jnp.real(local_expectations(spec, st, op))
        return st, z

    compiled = jax.jit(run_n).lower(state).compile()
    t0 = time.perf_counter()
    _st2, z = compiled(state)
    z_val = None
    t1 = time.perf_counter()
    try:
        z_val = float(np.asarray(z)[center])
    except Exception:
        z_val = None
    t_sync = time.perf_counter() - t1
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "variant": variant, "n": n, "k": k, "wall_seconds": wall,
                "sync_seconds": t_sync, "z": z_val,
                "per_layer_ms": 1e3 * wall / (n * k),
            }
        ),
        flush=True,
    )


def main():
    rounds = int(os.environ.get("TNQS_OVERHEAD_ROUNDS", "3"))
    n, k = 255, 4
    out = {"plain": [], "sharded": []}
    for r in range(rounds):
        for variant in ("plain", "sharded"):
            seed = 100 * r + 7
            proc = subprocess.Popen(
                [sys.executable, __file__, "--probe", variant, str(n),
                 str(k), str(seed)],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            )
            try:
                o, _ = proc.communicate(timeout=420)
            except subprocess.TimeoutExpired:
                proc.kill()
                print(f"# {variant} r{r}: cap hit", file=sys.stderr, flush=True)
                continue
            rec = next(
                (json.loads(l) for l in (o or "").splitlines()
                 if l.startswith("{")), None)
            print(f"# {variant} r{r}: {json.dumps(rec)}", file=sys.stderr,
                  flush=True)
            if rec and rec["wall_seconds"] >= 2.0 and (
                rec["z"] is not None or rec["sync_seconds"] >= 1.0
            ):
                out[variant].append(rec["per_layer_ms"])
    summary = {
        v: (min(xs) if xs else None) for v, xs in out.items()
    }
    if all(summary.values()):
        summary["overhead_ratio"] = summary["sharded"] / summary["plain"]
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    if "--probe" in sys.argv:
        i = sys.argv.index("--probe")
        run_probe(sys.argv[i + 1], int(sys.argv[i + 2]),
                  int(sys.argv[i + 3]), int(sys.argv[i + 4]))
    else:
        main()
