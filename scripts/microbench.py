"""Factorization microbenchmark on the real TPU (axon sync rules apply).

One subprocess per (op, shape): build a lax.scan chaining M dependent
repetitions of the op, dispatch once, force sync with the one allowed
scalar download.  wall ≈ remote_compile + M·t_op; with M large the op time
dominates, and two M points give a compile-free slope:

  python scripts/microbench.py OP B N M [seed]
      OP ∈ {svd, gram, eigh, qr, matmul}  on complex64 [B, N, N]

Prints one JSON line. Drive a sweep with --sweep (sequential subprocesses).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(op: str, b: int, n: int, m: int, seed: int = 0) -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            f"/tmp/tnqs_jax_cache_{jax.default_backend()}",
        )
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from tensornetworkquantumsimulator_tpu.parallel.engine import _gram_split

    rng = np.random.default_rng(7)
    a0 = (
        rng.standard_normal((b, n, n)) + 1j * rng.standard_normal((b, n, n))
    ).astype(np.complex64) * (1.0 + 1e-6 * seed)

    def step(a, _):
        if op == "svd":
            u, s, vh = jnp.linalg.svd(a, full_matrices=False)
            out = (u * s[..., None, :]) @ vh
        elif op == "gram":
            u, s, vh = _gram_split(a)
            out = (u * s[..., None, :].astype(a.dtype)) @ vh
        elif op == "eigh":
            h = a + jnp.conj(jnp.swapaxes(a, -1, -2))
            w, v = jnp.linalg.eigh(h)
            out = (v * w[..., None, :].astype(a.dtype)) @ jnp.conj(
                jnp.swapaxes(v, -1, -2)
            )
        elif op == "qr":
            q, r = jnp.linalg.qr(a)
            out = q @ r
        elif op == "matmul":
            out = a @ a
        elif op == "cmatmul":  # complex matmul, XLA lowering (4 real mms)
            out = a @ a
        elif op == "cpallas":  # complex matmul, Pallas Gauss kernel (3 mms)
            from tensornetworkquantumsimulator_tpu.parallel.pallas_kernels import (
                complex_matmul,
            )

            out = complex_matmul(a, a)
        elif op == "jeigh":  # single-kernel Pallas parallel-Jacobi eigh
            from tensornetworkquantumsimulator_tpu.parallel.pallas_linalg import (
                jacobi_eigh,
            )

            h = a + jnp.conj(jnp.swapaxes(a, -1, -2))
            w, v = jacobi_eigh(h)
            out = (v * w[..., None, :].astype(a.dtype)) @ jnp.conj(
                jnp.swapaxes(v, -1, -2)
            )
        else:
            raise ValueError(op)
        # keep the chain data-dependent and bounded
        nrm = jnp.linalg.norm(out.reshape(b, -1), axis=-1)[:, None, None]
        return out / jnp.where(nrm == 0, 1.0, nrm) + 1e-3, None

    def chain(a):
        a, _ = jax.lax.scan(step, a, None, length=m)
        return jnp.real(jnp.sum(jnp.abs(a[0, 0, 0])))

    compiled = jax.jit(chain).lower(jnp.asarray(a0)).compile()
    t0 = time.perf_counter()
    z = compiled(jnp.asarray(a0))
    t_disp = time.perf_counter() - t0
    z_val = None
    t1 = time.perf_counter()
    try:
        z_val = float(z)
    except Exception:
        z_val = None
    t_sync = time.perf_counter() - t1
    wall = time.perf_counter() - t0
    # a poisoned dispatch chain "finishes" instantly with a failing sync —
    # same signature bench.py rejects (round-1 post-mortem)
    valid = z_val is not None or t_sync >= 1.0
    print(
        json.dumps(
            {
                "backend": jax.default_backend(),
                "op": op,
                "B": b,
                "N": n,
                "M": m,
                "wall_seconds": wall,
                "dispatch_seconds": t_disp,
                "sync_seconds": t_sync,
                "per_op_us_upper": 1e6 * wall / m,
                "z": z_val,
                "valid": valid,
            }
        ),
        flush=True,
    )


def sweep(shapes, ops, m_points=(400, 4000), tries=3) -> None:
    """Sequential subprocess per sample (retrying poisoned samples);
    prints per-op slope estimates."""
    seed = [0]

    def one(op, b, n, m):
        for _ in range(tries):
            seed[0] += 1
            try:
                proc = subprocess.run(
                    [sys.executable, __file__, op, str(b), str(n),
                     str(m), str(seed[0])],
                    capture_output=True, text=True, timeout=1500,
                )
                rec = json.loads(
                    [l for l in proc.stdout.splitlines()
                     if l.startswith("{")][-1]
                )
                tag = "ok" if rec["valid"] else "POISONED, retrying"
                print(
                    f"# {op} [{b},{n},{n}] M={m}: wall={rec['wall_seconds']:.1f}s "
                    f"sync={rec['sync_seconds']:.1f}s ({tag})",
                    file=sys.stderr, flush=True,
                )
                if rec["valid"]:
                    return rec["wall_seconds"]
            except Exception as e:
                print(f"# {op} [{b},{n},{n}] M={m}: FAILED {e!r}",
                      file=sys.stderr, flush=True)
        return None

    for (b, n) in shapes:
        for op in ops:
            walls = {m: one(op, b, n, m) for m in m_points}
            walls = {m: w for m, w in walls.items() if w is not None}
            if len(walls) == 2:
                m_lo, m_hi = sorted(walls)
                slope = (walls[m_hi] - walls[m_lo]) / (m_hi - m_lo)
                print(json.dumps({
                    "op": op, "B": b, "N": n,
                    "per_op_us_slope": 1e6 * slope,
                    "walls": walls,
                }), flush=True)


if __name__ == "__main__":
    if "--sweep" in sys.argv:
        sweep(shapes=[(16, 40), (8, 128)], ops=("svd", "gram", "eigh", "qr"))
    else:
        run(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
            int(sys.argv[4]), int(sys.argv[5]) if len(sys.argv) > 5 else 0)
