"""chi64 stage anatomy on hardware: where do the 34.9 ms/layer go?

Times three de-converged probe programs under the driver methodology
(one dispatch, nested static scan, z-download forced sync — see
bench.py):

  bp     — n x (per-iteration site rotation + ONE flooding BP iteration
           [maxiter=1, tolerance=0])
  su     — n x (rotation + the 3 color-group simple updates, NO BP)
  layer  — n x (rotation + the full layer: BP per group + final BP,
           maxiter=25 like the bench)

The per-iteration rotation angle is a scan input (cos/sin closed form,
cheap: V·chi^3·d·d^2), so the state never reaches a fixed point and the
data-dependent while_loops (BP tolerance exit, QDWH iteration counts)
cannot collapse (CLAUDE.md round-3 finding f).

Stage shares:  bp wall/iter ~ the HBM roofline check for the 69 GF
bp_iteration; su wall/iter vs (layer - su) splits factorization vs BP
share of the full layer.

Usage:
  python scripts/chi64_anatomy.py --probe bp 63 4 1      # variant n k seed
  python scripts/chi64_anatomy.py                        # run all, retrying
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

VARIANTS = ("bp", "su", "layer")


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
    from tensornetworkquantumsimulator_tpu.utils.lattices import ibm_eagle_lattice

    from tensornetworkquantumsimulator_tpu.models.gates import gate_matrix

    chi = int(os.environ.get("TNQS_ANATOMY_CHI", "64"))
    g = ibm_eagle_lattice()
    state_fn = (lambda v: np.array([1.0 + 1e-6 * seed, 0.0])) if seed else None
    spec, state = batched_product_state(
        g, chi=chi, dtype=np.complex64, state_fn=state_fn
    )

    def rot(st, ang):
        # closed-form 1-site X rotation with a traced angle: de-converges
        # the trajectory at negligible cost
        c, s = jnp.cos(ang), jnp.sin(ang)
        gm = jnp.array([[0, 1], [1, 0]], jnp.complex64)
        eye = jnp.eye(2, dtype=jnp.complex64)
        return apply_one_site(st, c * eye - 1j * s * gm)

    gate2 = np.asarray(gate_matrix("Rzz", 2 * (3.14159 / 4))).reshape(2, 2, 2, 2)

    def su_groups(st):
        for grp in spec.color_groups:
            st, _err = apply_color_group(
                st, grp, jnp.asarray(gate2), chi, 1e-10, True
            )
        return st

    def body_bp(st, ang):
        st = rot(st, ang)
        st = bp_update(spec, st, maxiter=1, tolerance=0.0)
        return st, None

    def body_su(st, ang):
        st = rot(st, ang)
        return su_groups(st), None

    def body_layer(st, ang):
        st = rot(st, ang)
        for grp in spec.color_groups:
            st = bp_update(spec, st, maxiter=25)
            st, _err = apply_color_group(
                st, grp, jnp.asarray(gate2), chi, 1e-10, True
            )
        st = bp_update(spec, st, maxiter=25)
        return st, None

    # SU SUB-STAGE probes: iterate one factorization stage on
    # chi64-shaped batches (per-iteration input scaling de-converges the
    # QDWH/while_loop iteration counts), measuring each stage's own
    # hardware wall.  Shapes mirror one Eagle color group (B=48 edges).
    if variant.startswith("sub_"):
        from tensornetworkquantumsimulator_tpu.parallel.engine import (
            _gram_split,
            _pseudo_roots,
            _qr_reduce,
            _rinv_left,
        )

        # inputs are built HOST-SIDE (numpy) and passed as arguments:
        # closing over device arrays makes lowering download them for
        # constant embedding, which raises UNIMPLEMENTED on axon
        # (CLAUDE.md); a jitted-arg upload is the supported path
        B = 48
        rng = np.random.default_rng(seed)

        def _cx(*shape):
            return (rng.standard_normal(shape)
                    + 1j * rng.standard_normal(shape)).astype(np.complex64)

        if variant == "sub_qr":
            base = _cx(2 * B, chi * chi * 2, chi * 2)
        elif variant == "sub_eigh256":
            base = _cx(B, chi * 4, chi * 4)
        elif variant == "sub_eigh64":
            e = _cx(4 * B, chi, chi)
            base = (e @ np.conj(np.swapaxes(e, -1, -2))).astype(np.complex64)
        else:  # sub_absorb
            base = _cx(B, chi, chi, chi, 2)
        m0_np = _cx(B, chi, chi)

        def _absorb_like(t, m, axis):
            t2 = jnp.moveaxis(t, axis, -1)
            out = jnp.einsum("v...l,vlm->v...m", t2, m,
                             precision=jax.lax.Precision.HIGHEST)
            return jnp.moveaxis(out, -1, axis)

        def make_body(base_t, m0_t):
            def body_qr(c, ang):
                q, r, deferred = _qr_reduce(base_t * (1.0 + 0.01 * ang) + c)
                # include the rebuild so the A/B covers the whole
                # QR+rebuild dataflow for both algs
                fac = jnp.broadcast_to(
                    jnp.eye(chi * 2, dtype=q.dtype)[:, :chi],
                    (2 * B, chi * 2, chi),
                )
                if deferred:
                    fac = _rinv_left(r, fac)
                q = q @ fac
                return jnp.mean(q) * 1e-6, None

            def body_eigh256(c, ang):
                _u, s, _vh = _gram_split(base_t * (1.0 + 0.01 * ang) + c)
                return jnp.mean(s).astype(jnp.complex64) * 1e-6, None

            def body_eigh64(c, ang):
                root, _inv = _pseudo_roots(
                    base_t * (1.0 + 0.01 * ang) + jnp.abs(c)
                )
                return jnp.mean(root) * 1e-6, None

            def body_absorb(c, ang):
                t = base_t * (1.0 + 0.01 * ang) + c
                for ax in (1, 2):
                    t = _absorb_like(t, m0_t, ax)
                return jnp.mean(t) * 1e-6, None

            return {
                "sub_qr": body_qr,
                "sub_eigh256": body_eigh256,
                "sub_eigh64": body_eigh64,
                "sub_absorb": body_absorb,
            }[variant]

        def run_sub(c0, base_t, m0_t):
            body = make_body(base_t, m0_t)

            def repeat(c, kk2):
                c, _ = jax.lax.scan(
                    body, c, jnp.arange(n, dtype=jnp.float32) + kk2
                )
                return c, None

            c, _ = jax.lax.scan(
                repeat, c0, jnp.arange(k, dtype=jnp.float32)
            )
            return jnp.real(c) * jnp.ones((8,), jnp.float32)

        copts0 = (
            {"xla_tpu_scoped_vmem_limit_kib": 65536}
            if not os.environ.get("TNQS_BENCH_CPU") else None
        )
        c_init = np.complex64(1e-8 * seed)
        compiled = jax.jit(run_sub).lower(
            c_init, base, m0_np
        ).compile(compiler_options=copts0)
        t0c = time.perf_counter()
        out = compiled(c_init, base, m0_np)
        z_val = None
        t1 = time.perf_counter()
        try:
            z_val = float(np.asarray(out)[0])
        except Exception:
            z_val = None
        t_sync = time.perf_counter() - t1
        wall = time.perf_counter() - t0c
        print(
            json.dumps(
                {
                    "variant": variant, "chi": chi, "n": n, "k": k,
                    "wall_seconds": wall, "sync_seconds": t_sync,
                    "z": z_val, "per_iter_ms": 1e3 * wall / (n * k),
                }
            ),
            flush=True,
        )
        return

    body = {"bp": body_bp, "su": body_su, "layer": body_layer}[variant]
    op = np.asarray(op_matrix("Z", 2))
    center = len(spec.vertices) // 2
    angles = 0.1 * (1.0 + 0.05 * np.sin(np.arange(n, dtype=np.float32)))

    def run_n(st):
        def repeat(s, kk):
            s, _ = jax.lax.scan(body, s, jnp.asarray(angles) + 1e-4 * kk)
            return s, None

        st, _ = jax.lax.scan(repeat, st, jnp.arange(k, dtype=jnp.float32))
        z = jnp.real(local_expectations(spec, st, op))
        return st, z

    copts = {"xla_tpu_scoped_vmem_limit_kib": 65536} if chi >= 64 else None
    if os.environ.get("TNQS_BENCH_CPU"):
        copts = None
    compiled = jax.jit(run_n).lower(state).compile(compiler_options=copts)
    t0 = time.perf_counter()
    _st2, z = compiled(state)
    t_disp = time.perf_counter() - t0
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
                "variant": variant, "chi": chi, "n": n, "k": k,
                "wall_seconds": wall, "dispatch_seconds": t_disp,
                "sync_seconds": t_sync, "z": z_val,
                "per_iter_ms": 1e3 * wall / (n * k),
            }
        ),
        flush=True,
    )


def main():
    """Run all variants with per-variant retries (fast-fail storms)."""
    plans = {
        "bp": (63, 8),
        "su": (63, 8),
        "layer": (63, 4),
    }
    if os.environ.get("TNQS_ANATOMY_SUBS"):
        # factorization sub-stages (one color group's batch per iter)
        plans = {
            "sub_qr": (63, 8),
            "sub_eigh256": (63, 8),
            "sub_eigh64": (63, 8),
            "sub_absorb": (63, 8),
        }
        if os.environ.get("TNQS_QR_ALG") == "defer":
            plans = {"sub_qr": (63, 8)}
    results = {}
    deadline = time.time() + float(os.environ.get("TNQS_ANATOMY_BUDGET_S", "2400"))
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
                print(f"# {variant}: probe cap hit (compile continues "
                      "server-side)", file=sys.stderr, flush=True)
                continue
            rec = next(
                (json.loads(l) for l in (out or "").splitlines()
                 if l.startswith("{")), None)
            if rec is None:
                print(f"# {variant}: probe died", file=sys.stderr, flush=True)
                continue
            print(f"# {variant}: {json.dumps(rec)}", file=sys.stderr, flush=True)
            executed = (
                rec["wall_seconds"] >= 2.0
                and (rec["z"] is not None or rec["sync_seconds"] >= 1.0)
            )
            if executed:
                results[variant] = rec
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    if "--probe" in sys.argv:
        i = sys.argv.index("--probe")
        run_probe(sys.argv[i + 1], int(sys.argv[i + 2]),
                  int(sys.argv[i + 3]), int(sys.argv[i + 4]))
    else:
        main()
