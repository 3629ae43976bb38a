"""What can the axon runtime download?  One trivial jit program, then a
ladder of download attempts (shape × dtype), each reported with its
exception type.  Informs bench.py's sync strategy and the TPU-vs-CPU
physics artifact (`validate_backend.py --collect`).

Usage: python scripts/probe_download.py  (runs on the default backend)
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    @jax.jit
    def f(x):
        y = jnp.sin(x) * 2.0 + 1.0
        return {
            "scalar": jnp.sum(y),
            "vec25": y[:25],
            "vec8": y[:8],
            "mat8x128": jnp.broadcast_to(y[:128], (8, 128)) + y[0],
            "veci32": (y[:8] > 0).astype(jnp.int32),
            "c64": (y[:8] + 1j * y[:8]).astype(jnp.complex64),
        }

    x = jnp.asarray(np.linspace(0.0, 1.0, 256, dtype=np.float32))
    out = f(x)
    results = {}
    for name, arr in out.items():
        t0 = time.perf_counter()
        try:
            val = np.asarray(arr)
            results[name] = {
                "ok": True,
                "first": float(np.real(val.ravel()[0])),
                "sync_s": time.perf_counter() - t0,
            }
        except Exception as e:
            results[name] = {
                "ok": False,
                "err": f"{type(e).__name__}: {e}"[:300],
                "sync_s": time.perf_counter() - t0,
            }
    print(json.dumps({"backend": jax.default_backend(), "results": results}))


if __name__ == "__main__":
    main()
