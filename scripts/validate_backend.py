"""On-TPU physics validation: ⟨Z⟩(center) trajectory of the headline
5×5 χ=10 TFIM workload, TPU vs CPU-x64.

The axon TPU runtime allows ONE scalar download per process (the download
blocks until the device drains, then poisons further dispatches), so the
TPU trajectory is collected one point per subprocess:

  python scripts/validate_backend.py --point L     # run L layers, print z_L
  python scripts/validate_backend.py --trajectory N  # all points (CPU only)
  python scripts/validate_backend.py --collect N   # full TPU-vs-CPU table

``--collect`` runs N TPU point-subprocesses plus one CPU-x64 trajectory
subprocess and prints a markdown table (the BASELINE.md artifact).  Each
TPU subprocess pays its own remote compile (15–280 s on the shared
tunnel); the compiled per-layer program is identical across points.

On days when the runtime downloads NOTHING (scripts/probe_download.py:
every dtype/shape raises UNIMPLEMENTED), ``--bisect N`` brackets the
TPU-vs-CPU max site |Δ| through the *timing channel* instead: the
on-device trajectory is compared against an embedded CPU reference and
a large penalty workload runs iff the mismatch exceeds the tolerance —
the (blocking) failed download then reveals pass/fail in wall time.
CPU cross-check of the channel: pass 0.85 s vs fail 34.7 s at
penalty=100 layers.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup(x64: bool):
    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if x64:
        jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            f"/tmp/tnqs_jax_cache_{jax.default_backend()}",
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def _build(chi=10, x64=False, jit=True, seed=0):
    jax = _setup(x64)
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

    g = named_grid((5, 5))
    dt, hx, hz, J = 0.25, 1.0, 0.8, 0.5
    layer = []
    layer += [("Rx", [v], 2 * hx * dt) for v in g.vertices()]
    layer += [("Rz", [v], 2 * hz * dt) for v in g.vertices()]
    for ce in edge_color(g, 4):
        layer += [("Rzz", pair, 2 * J * dt) for pair in ce]
    dtype = np.complex128 if x64 else np.complex64
    # seed: unique input bytes per subprocess so the axon service's
    # RESULT cache cannot serve a previous run's output without executing
    # (bench.py's trick).  1e-9 keeps the trajectory perturbation ~2
    # decades below the tightest 3e-6 ladder rung even after 10 layers
    # of amplification.
    state_fn = (
        (lambda v: np.array([1.0 + 1.0e-9 * seed, 0.0])) if seed else None
    )
    spec, state = batched_product_state(
        g, chi=chi, dtype=dtype, state_fn=state_fn
    )
    circuit = BatchedCircuit(layer, g, spec=spec)
    # scan_groups: ~2.2x smaller HLO -> remote compiles measured <=50 s
    # instead of 276-958 s (same kernel content; test-equivalent)
    layer_fn = make_layer_fn(
        circuit, chi=chi, cutoff=1e-10, bp_maxiter=25, jit=jit,
        scan_groups=True,
    )
    op = np.asarray(op_matrix("Z", 2))
    center = spec.vertex_position((3, 3))

    @jax.jit
    def z_all(st):
        # whole real-valued vector: the axon runtime can download full
        # real arrays but (usually) not 0-d scalars — see CLAUDE.md
        return jnp.real(local_expectations(spec, st, op))

    return jax, state, layer_fn, z_all, center


def point(n_layers: int, x64: bool = False) -> None:
    """Run n_layers, download the whole ⟨Z⟩ vector, print a JSON record."""
    import numpy as np

    jax, state, layer_fn, z_all, center = _build(x64=x64)
    for _ in range(n_layers):
        state, _ = layer_fn(state)
    z = z_all(state)
    try:
        z_vec = [float(x) for x in np.asarray(z)]
        z_val = z_vec[center]
    except Exception as e:
        print(f"# z download failed: {e!r}"[:500], file=sys.stderr, flush=True)
        z_vec, z_val = None, None
    print(
        json.dumps(
            {
                "backend": jax.default_backend(),
                "x64": bool(x64),
                "layer": n_layers,
                "z": z_val,
                "z_all": z_vec,
            }
        ),
        flush=True,
    )


def trajectory(n_layers: int, x64: bool = False) -> None:
    """All points in one process (CPU: downloads are unrestricted)."""
    import numpy as np

    jax, state, layer_fn, z_all, center = _build(x64=x64)
    out, out_all = [], []
    for l in range(1, n_layers + 1):
        state, _ = layer_fn(state)
        z = np.asarray(z_all(state))
        out.append(float(z[center]))
        out_all.append([float(x) for x in z])
    print(
        json.dumps(
            {
                "backend": jax.default_backend(),
                "x64": bool(x64),
                "trajectory": out,
                "trajectory_all": out_all,
            }
        ),
        flush=True,
    )


def collect(n_layers: int) -> None:
    env_cpu = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, __file__, "--trajectory", str(n_layers), "--x64"],
        capture_output=True, text=True, env=env_cpu, timeout=1800,
    )
    cpu_rec = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    cpu = cpu_rec["trajectory"]
    cpu_all = cpu_rec["trajectory_all"]

    rows = []
    for l in range(1, n_layers + 1):
        t0 = time.perf_counter()
        rec = None
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--point", str(l)],
                capture_output=True, text=True, timeout=1500,
            )
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    rec = json.loads(line)
        except Exception:
            pass
        z_tpu = rec.get("z") if rec else None
        z_tpu_all = rec.get("z_all") if rec else None
        backend = rec.get("backend") if rec else "?"
        dt = time.perf_counter() - t0
        delta = abs(z_tpu - cpu[l - 1]) if z_tpu is not None else None
        # max |Δ| over ALL sites, not just the center
        delta_all = (
            max(abs(a - b) for a, b in zip(z_tpu_all, cpu_all[l - 1]))
            if z_tpu_all is not None
            else None
        )
        rows.append((l, z_tpu, cpu[l - 1], delta, delta_all))
        print(
            f"# layer {l}: tpu({backend})={z_tpu} cpu-x64={cpu[l-1]:.8f} "
            f"|Δ|={delta} max-site|Δ|={delta_all} ({dt:.0f}s)",
            file=sys.stderr,
        )

    print("| layer | ⟨Z⟩(center) TPU c64 | ⟨Z⟩(center) CPU c128 | |Δ| center | max |Δ| all 25 sites |")
    print("|---|---|---|---|---|")
    for (l, zt, zc, d, da) in rows:
        zt_s = f"{zt:+.6f}" if zt is not None else "download failed"
        d_s = f"{d:.2e}" if d is not None else "—"
        da_s = f"{da:.2e}" if da is not None else "—"
        print(f"| {l} | {zt_s} | {zc:+.6f} | {d_s} | {da_s} |")
    deltas = [da for (*_, da) in rows if da is not None]
    if deltas:
        print(f"\nmax site |Δ| over {len(deltas)} layers: {max(deltas):.2e}")


def verify(
    tol: float, n_layers: int, ref_path: str, penalty: int, seed: int = 0
) -> None:
    """Timing-channel physics check for days when the runtime downloads
    NOTHING (probe_download.py: every dtype/shape is UNIMPLEMENTED).

    The download *attempt* still blocks until the device drains, so wall
    time is an output channel: run the n-layer ⟨Z⟩ trajectory on device,
    compare against the embedded CPU-c64 reference, and run ``penalty``
    extra Trotter layers iff max site |Δ| > tol.  A pass returns in
    ~compile time + the FLOOR workload; a fail takes ≥ penalty·t_layer
    (several hundred s) longer — unambiguous against compile variance.

    Every program also runs a MANDATORY floor of 150k layers (≥ ~15 s
    even on the fastest measured path): a poisoned dispatch chain
    (instant failing sync, nothing executed) then shows wall ≪ 10 s and
    is reported as executed=False instead of masquerading as a pass —
    the failure mode the second round-2 bisect run's control rung caught
    (control wall 0.38 s, channel_ok=False).

    ``tol`` and ``penalty`` are RUNTIME inputs (read from a small f32
    vector), so every rung of the ladder AND the control share ONE
    compiled program: after a warm subprocess eats the remote compile
    into the service's cross-process program cache, each rung's wall is
    compute-only and the pass/fail separation no longer competes with
    the 3–960 s compile variance (what made round-2's tight rungs
    ambiguous).  ``seed`` perturbs the input state bytes so the service
    result cache cannot shortcut repeated runs."""
    import numpy as np

    jax, state, layer_fn, z_all, center = _build(jit=False, seed=seed)
    import jax.numpy as jnp

    # keep the reference as a HOST array: a closed-over device array
    # would make jit lowering download it to embed as a constant, and
    # downloads raise UNIMPLEMENTED on this runtime
    ref = np.asarray(json.load(open(ref_path))["trajectory_all"], dtype=np.float32)
    assert ref.shape[0] >= n_layers
    ref = ref[:n_layers]

    # mandatory layers: poisoned chains can't fake a pass.  A runtime
    # knob (like tol/penalty) so ladders can size it without recompiles;
    # 100k de-converged layers cost ≥ ~25 s on the fastest measured path
    # while keeping pass walls well under the decision threshold.
    FLOOR = int(os.environ.get("TNQS_VERIFY_FLOOR", "100000"))

    def run(st, knobs):
        tol_in = knobs[0]
        penalty_in = knobs[1].astype(jnp.int32)
        floor_in = knobs[2].astype(jnp.int32)

        def body(s, _):
            s, _errs = layer_fn(s)
            z = z_all(s)
            return s, z

        st, traj = jax.lax.scan(body, st, None, length=n_layers)
        delta = jnp.max(jnp.abs(traj - ref))
        steps = jnp.where(delta <= tol_in, floor_in, floor_in + penalty_in)

        def pbody(_i, s):
            s2, _errs = layer_fn(s)
            # de-converge: repeated application of one fixed layer drives
            # the state to a fixed point where every data-dependent
            # while_loop inside (BP convergence, QDWH) exits almost
            # immediately — measured 2026-08-17: the jacobi-path penalty
            # marginal cost collapsed to ~1.4 us/layer (3M→81 s but
            # 15M→98 s), voiding the channel (control < decision).
            # Rolling tensors and messages across the vertex axis
            # scrambles the network every iteration, so each floor and
            # penalty layer pays the true non-converged per-layer cost.
            return s2._replace(
                tensors=jnp.roll(s2.tensors, 1, axis=0),
                messages=jnp.roll(s2.messages, 1, axis=0),
            )

        st2 = jax.lax.fori_loop(0, steps, pbody, st)
        return z_all(st2)

    # penalties below 2^24 = 16.7M hold exactly in f32
    knobs = np.array([tol, float(penalty), float(FLOOR)] + [0.0] * 5, np.float32)
    compiled = jax.jit(run).lower(state, knobs).compile()
    t0 = time.perf_counter()
    out = compiled(state, knobs)
    try:
        np.asarray(out)  # blocks until the device drains, then fails
    except Exception:
        pass
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "backend": jax.default_backend(),
                "tol": tol,
                "n": n_layers,
                "penalty": penalty,
                "floor": FLOOR,
                "seed": seed,
                # wall below the floor workload means the chain never
                # executed (poisoned) — the parent treats it as an infra
                # error, not a pass.  15 s default: fast-FAILED chains
                # (round 3) block 5–15 s before raising while executing
                # nothing, so the old 10 s threshold let one masquerade
                # as a pass (a fake pass TIGHTENS the reported bound —
                # the one misread direction the ladder cannot absorb)
                "executed": bool(
                    wall >= float(os.environ.get("TNQS_VERIFY_MIN_WALL", "15.0"))
                ),
                "wall_seconds": wall,
            }
        ),
        flush=True,
    )


def _make_run_verify(n_layers: int):
    """Build the CPU-c64 reference trajectory (cached in /tmp across
    invocations — regenerating it costs a ~90 s CPU run) and return a
    ``run_verify(tol, penalty, floor=None)`` closure that launches one
    --verify subprocess and parses its JSON record.

    The CPU reference always runs the default (trusted) factorization
    path, even when the TPU side under test runs with TNQS_EIGH_ALG
    overridden — gating an alternative algorithm means comparing it
    against the established baseline, not against itself."""
    ref_path = "/tmp/tnqs_verify_ref.json"
    need = True
    try:
        cached = json.load(open(ref_path))
        need = len(cached["trajectory_all"]) < n_layers
    except Exception:
        need = True
    if need:
        env_cpu = dict(os.environ, JAX_PLATFORMS="cpu",
                       TNQS_EIGH_ALG="default",
                       TNQS_SVD_ALG="default", TNQS_QR_ALG="default")
        proc = subprocess.run(
            [sys.executable, __file__, "--trajectory", str(n_layers)],
            capture_output=True, text=True, env=env_cpu, timeout=1800,
        )
        rec = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        open(ref_path, "w").write(rec)
        print(f"# CPU c64 reference trajectory saved ({n_layers} layers)",
              file=sys.stderr, flush=True)
    else:
        print(f"# CPU c64 reference trajectory reused ({ref_path})",
              file=sys.stderr, flush=True)

    seed_ctr = [int(os.environ.get("TNQS_VERIFY_SEED0", "0"))]

    def run_verify(tol, pen, floor=None):
        seed_ctr[0] += 1
        env = dict(os.environ)
        if floor is not None:
            env["TNQS_VERIFY_FLOOR"] = str(int(floor))
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--verify", str(tol),
                 str(n_layers), ref_path, str(pen), str(seed_ctr[0])],
                capture_output=True, text=True, env=env,
                timeout=float(os.environ.get("TNQS_VERIFY_TIMEOUT", "3600")),
            )
            line = [
                l for l in proc.stdout.splitlines() if l.startswith("{")
            ]
            if not line:
                print(f"# verify stderr tail: {proc.stderr[-400:]}",
                      file=sys.stderr, flush=True)
                return None
            return json.loads(line[-1])
        except subprocess.TimeoutExpired:
            return {"wall_seconds": 3600.0, "executed": True}

    return run_verify


def bisect(n_layers: int) -> None:
    """Bracket the TPU-vs-CPU-c64 max site |Δ| with a descending tolerance
    ladder of --verify subprocesses (one per tol; each decision is read
    from wall time).  Records the BASELINE.md physics artifact.

    This is the ABSOLUTE-wall protocol (decision threshold + one big
    penalty).  It needs the service to execute long programs — on days
    it kills them (2026-08-18: everything ≳5 min device time returned
    59–175 s without executing, the same band fast-failed chains
    occupy), use the slope protocol (``--bisect`` with
    TNQS_BISECT_MODE=slope, the default — see bisect_slope)."""
    run_verify = _make_run_verify(n_layers)

    # tol and penalty are runtime inputs, so every rung + the control
    # reuse ONE compiled program: the warm run below eats the remote
    # compile into the service's cross-process program cache, and every
    # decision run is compute-only.  Decision walls: pass ≈ dispatch +
    # 150k floor layers (15–75 s across the measured 0.1–0.4 ms/layer
    # range); fail adds 3M penalty layers (300–1200 s).  The 170 s
    # threshold separates them without competing with compile variance;
    # a fail reading is re-run once with a fresh seed to rule out a
    # cache-miss compile masquerading as the penalty.  A misread can
    # only stop the ladder early, i.e. LOOSEN the reported bound, never
    # tighten it.
    # The penalty must dominate the 200 s decision threshold at the speed
    # of the PATH UNDER TEST: the first jacobi+polish ladder read every
    # rung "pass" but the control ran 3M penalty layers in 81 s (the
    # jacobi path executes the penalty workload ~4x faster than the
    # default path the 3M sizing assumed) and channel_ok=False correctly
    # voided the run.  Gating a faster path needs a proportionally larger
    # penalty — a runtime knob, so the resized rerun reuses the cached
    # compiled program.
    penalty = int(os.environ.get("TNQS_BISECT_PENALTY", "3000000"))
    # The decision threshold must exceed the service queue depth, which on
    # congested evenings sustains 500-700 s (2026-08-17: a floor-only warm
    # run took 98 s in-process behind a ~600 s client queue, and rung
    # walls inflated past the old fixed 200 s, misreading passes as
    # fails).  Size the pair so penalty×per-layer ≫ decision ≫ queue:
    # e.g. decision 500 s with a 2M-layer penalty (~1000 s on the
    # de-converged jacobi path).  Runtime knobs — the cached compiled
    # program is reused across resizings.
    decision_s = float(os.environ.get("TNQS_BISECT_DECISION_S", "200"))

    # tol=1e9 always passes: floor-only.  Retried on poisoned chains —
    # an unexecuted warm run compiles nothing, so the first rung would
    # pay the remote compile and misread as a fail (round-3 run 4: warm
    # wall 0.62 s, executed=False)
    for _attempt in range(3):
        t0 = time.perf_counter()
        warm = run_verify(1e9, penalty)
        print(f"# warm (compile) wall="
              f"{warm and warm.get('wall_seconds')} "
              f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr, flush=True)
        if warm is not None and warm.get("executed", True):
            break

    ladder = [1e-3, 3e-4, 1e-4, 3e-5, 1e-5, 3e-6]
    last_pass, first_fail = None, None
    for tol in ladder:
        status, wall = "error", None
        fails = 0
        # poisoned chains arrive in streaks on congested evenings (round 3:
        # three consecutive sub-7 s unexecuted walls on one rung), so infra
        # errors get their own larger budget and do not consume the
        # fail-confirmation attempts
        for attempt in range(8):  # retry infra errors; confirm fails
            t0 = time.perf_counter()
            rec = run_verify(tol, penalty)
            wall = rec["wall_seconds"] if rec else None
            if rec is None:
                status = "error"
            elif not rec.get("executed", True):
                status = "error"  # poisoned chain: nothing executed
                print(f"# tol={tol:g}: poisoned chain (wall={wall})",
                      file=sys.stderr, flush=True)
            else:
                status = "pass" if wall < decision_s else "fail"
            dt = time.perf_counter() - t0
            print(f"# tol={tol:g}: wall={wall} -> {status} ({dt:.0f}s)",
                  file=sys.stderr, flush=True)
            if status == "pass":
                break
            # a single >decision reading can be a queue burst or a
            # service-cache miss paying the compile; a genuine fail
            # (floor+penalty ≈ 50× a pass wall) re-reads >decision on a
            # fresh seed too, so require TWO fail readings — regardless
            # of how many poisoned/error attempts came between (the
            # round-3 1e-5 misread was error→228 s, recorded off one
            # ambiguous reading because the retry keyed on attempt==0)
            if status == "fail":
                fails += 1
                if fails >= 2:
                    break
        if fails >= 2:
            first_fail = tol
            break
        elif status == "pass":
            last_pass = tol
        else:
            break  # infra failure: report the bracket found so far

    # channel control: tol=-1 forces the penalty branch (delta ≥ 0 > -1
    # is impossible to pass).  Same program (runtime knobs).  A fast
    # wall here means the chain did not really execute (poisoned) — the
    # ladder's "pass" walls would then be meaningless.  Poisoned chains
    # hit the control like any rung (round-3: a 0.61 s control voided an
    # otherwise-complete ladder), so it gets the same retry policy.
    control_wall = None
    # a fast-FAILED chain can read executed=True (it blocks 5-35 s before
    # raising while running nothing — round-3: a 35.5 s "control" against a
    # 32M-layer penalty, i.e. 1.1 us/layer, voided an all-pass ladder), so
    # the control additionally enforces a physical wall floor: penalty
    # layers at the fastest de-converged per-layer time ever measured
    # (60 us on the double-NS jacobi path; default floor uses 20 us for
    # margin).  Anything faster cannot have executed the penalty.
    ctl_min = penalty * float(
        os.environ.get("TNQS_BISECT_CONTROL_MIN_PER_LAYER", "2e-5")
    )
    for _attempt in range(5):
        control = run_verify(-1.0, penalty)
        wall_c = control and control.get("wall_seconds")
        if (
            control is None
            or not control.get("executed", True)
            or (wall_c is not None and wall_c < ctl_min)
        ):
            print(
                f"# control: poisoned/failed chain "
                f"(wall={wall_c}, physical floor {ctl_min:.0f}s), retrying",
                file=sys.stderr, flush=True,
            )
            continue
        control_wall = wall_c
        break
    # the control must be distinctly SLOWER than the passes: at least
    # the decision threshold (penalty 3M layers ≥ 300 s even at the
    # fastest measured per-layer time)
    control_ok = control_wall is not None and control_wall > decision_s
    print(f"# control (tol=-1, penalty={penalty}): "
          f"wall={control_wall} channel_ok={control_ok}",
          file=sys.stderr, flush=True)
    print(json.dumps({
        "n_layers": n_layers,
        "max_site_delta_upper": last_pass,
        "max_site_delta_lower": first_fail,
        "control_wall_seconds": control_wall,
        "channel_ok": control_ok,
        "channel": "timing (cond penalty workload, shared program via "
        "runtime tol/penalty knobs); downloads UNIMPLEMENTED",
    }), flush=True)


def slope_control(run_verify, label="", p_small=None, p_big=None):
    """Execution-slope channel control (round-3 protocol, 2026-08-18).

    The single giant-penalty control became unreadable when the service
    started killing long programs: every program needing ≳5 min of
    device time returned in 59–175 s WITHOUT executing — the same band
    fast-failed dispatch chains occupy, so no absolute wall floor can
    separate "penalty executed" from "chain died".  (An 8M-layer
    penalty demonstrably ran 476 s the day before; the kill window is
    load-dependent.)

    This control reads the penalty branch DIFFERENTIALLY instead: it
    interleaves tol=-1 (forced-penalty) runs between a small and a big
    penalty that each fit under the kill window — S,B,S,B — and accepts
    the channel only if BOTH temporally-adjacent pairs show the wall
    growing with penalty size at a physically plausible per-layer rate:

        wall(B_i) - wall(S_i)  >=  (p_big - p_small) * lo      (i = 1,2)

    A fast-failed chain's wall does not scale with program size (the
    band is queue/transport noise), so faking a pass needs two
    independent band draws to land >= ~60 s above their adjacent small
    draws; a queue burst is common-mode between adjacent runs and
    cancels in the difference; a burst on a SMALL reading only deflates
    the difference (fails safe).  If the big point itself never
    executes (kill window shrank), it is halved and the control
    restarts — the accepted p_big doubles as the measured kill-window
    bound for sizing the ladder, and the measured slope is the
    de-converged per-layer time of the path under test.
    """
    lo = float(os.environ.get("TNQS_BISECT_CONTROL_MIN_PER_LAYER", "2e-5"))
    p_small = p_small or int(os.environ.get("TNQS_CONTROL_P_SMALL", "1000000"))
    p_big = p_big or int(os.environ.get("TNQS_CONTROL_P_BIG", "4000000"))
    floor = int(os.environ.get("TNQS_VERIFY_FLOOR", "100000"))
    max_pairs = int(os.environ.get("TNQS_CONTROL_MAX_PAIRS", "8"))
    # a slope below this many absolute seconds is indistinguishable from
    # queue noise no matter how small the probe sizes get, so the delta
    # requirement has an absolute floor and shrinking stops where a
    # genuine ~60 us/layer slope still clears it
    min_delta = float(os.environ.get("TNQS_CONTROL_MIN_DELTA_S", "40"))

    # once a genuine pair exists, the per-point validity floor tightens
    # from the universal 2e-5 to 60% of the SESSION's own measured
    # per-layer speed (from the smallest accepted delta, which queue
    # inflation can only overstate by its own noise): run C lost two
    # pairs because kill-band draws (59.7 s for a physically >=115 s
    # program) cleared the 2e-5 floor and flattened the pair instead of
    # being retried as the non-executions they were.
    # ...and the tightening is itself capped at 2x the universal floor:
    # run D accepted a queue-inflated 1398 s delta (25x physical) whose
    # s_est raised the 1M-layer point floor to 923 s and locked out
    # every genuine ~66 s reading thereafter.
    s_est = [None]

    def point_floor(p):
        rate = lo if s_est[0] is None else max(lo, min(0.6 * s_est[0],
                                                       2 * lo))
        return (p + floor) * rate

    def read_point(p):
        for _retry in range(3):
            rec = run_verify(-1.0, p, floor=floor)
            w = rec and rec.get("wall_seconds")
            if (rec is not None and rec.get("executed", True)
                    and w >= point_floor(p)):
                print(f"# control{label} P={p}: wall={w}",
                      file=sys.stderr, flush=True)
                return w
            print(f"# control{label} P={p}: invalid reading "
                  f"(wall={w}, floor={point_floor(p):.0f}s), retrying",
                  file=sys.stderr, flush=True)
        print(f"# control{label} P={p}: wall=None", file=sys.stderr,
              flush=True)
        return None

    # collect adjacent S,B pairs until TWO show a physical slope.  On a
    # day when ~half of all medium programs get killed, a rigid S,B,S,B
    # schedule rarely lands two clean pairs in a row; accumulating valid
    # pairs keeps the evidence requirement (two independent adjacent
    # pairs, each with wall growth >= (P_B-P_S)*lo) while tolerating
    # kill streaks.  Two FLAT pairs (both points read but no slope)
    # abort: that is the signature of a dead channel, not of kills.
    deltas_ok, walls, flat, dead_big_streak = [], [], 0, 0
    pair_attempts = 0
    while len(deltas_ok) < 2 and pair_attempts < max_pairs and flat < 2:
        pair_attempts += 1
        ws = read_point(p_small)
        wb = read_point(p_big)
        walls += [(p_small, ws), (p_big, wb)]
        if wb is None:
            dead_big_streak += 1
            if dead_big_streak >= 2:
                if p_big // 2 < p_small * 2:
                    p_small = max(750000, p_small // 2)
                p_big = max(p_small * 2, p_big // 2)
                dead_big_streak = 0
                deltas_ok, flat = [], 0  # slope changed meaning: restart
                print(f"# control{label}: big point keeps dying, "
                      f"shrinking to ({p_small}, {p_big})",
                      file=sys.stderr, flush=True)
            continue
        dead_big_streak = 0
        if ws is None:
            continue
        need = max((p_big - p_small) * lo, min_delta)
        # two-sided band: a delta far ABOVE any physical per-layer rate
        # is a queue burst that happened to hit the big point (run D:
        # +1398 s on a ~60 s physical slope), not evidence of execution
        # -- it is retried, neither accepted nor counted flat
        cap = (p_big - p_small) * float(
            os.environ.get("TNQS_CONTROL_MAX_PER_LAYER", "5e-4"))
        d = wb - ws
        if need <= d <= cap:
            deltas_ok.append(d)
            s_est[0] = min(deltas_ok) / (p_big - p_small)
            tag = "ok"
        elif d < need:
            flat += 1
            tag = "FLAT"
        else:
            tag = "INFLATED (queue burst)"
        print(f"# control{label}: pair delta={d:.1f}s (band "
              f"[{need:.0f},{cap:.0f}]s) -> {tag} "
              f"[{len(deltas_ok)}/2]", file=sys.stderr, flush=True)
    need = max((p_big - p_small) * lo, min_delta)
    ok = len(deltas_ok) >= 2
    slope = (min(deltas_ok) / (p_big - p_small)) if deltas_ok else None
    print(f"# control{label}: deltas={deltas_ok} flat={flat} -> ok={ok} "
          f"(per-layer={slope if slope is None else f'{slope:.2e}'})",
          file=sys.stderr, flush=True)
    return {
        "p_small": p_small, "p_big": p_big, "walls": walls,
        "deltas": deltas_ok, "flat_pairs": flat, "required_delta": need,
        "per_layer_seconds": slope, "ok": bool(ok),
    }


def control(n_layers: int) -> None:
    """Standalone slope control: probe whether the timing channel is
    alive right now and measure the de-converged per-layer time of the
    path under test (honors TNQS_EIGH_ALG etc.).  Prints one JSON."""
    run_verify = _make_run_verify(n_layers)
    rec = slope_control(run_verify)
    print(json.dumps(rec), flush=True)


def rung_diff(run_verify, tol, p_big, f, s, max_pairs=None):
    """Differential rung verdict: "pass" / "fail" / "ambiguous".

    Round-3 attempt-1 post-mortem (2026-08-19): the floor-sandwich rung
    read a FALSE FAIL at tol=1e-4 from queue-inflated readings
    (187.8/128.0/509.9 s against a 135 s absolute fail threshold while
    the same session showed ±400 s queue swings) — an absolute wall
    threshold cannot out-read queue noise larger than the penalty
    signal.  This reader borrows the control's own trick, with BOTH the
    queue immunity of differencing and the sandwich's execution
    positivity (review finding, same day: a service-KILLED genuine-fail
    reading lands in the 59–175 s band, which against a ~f·s baseline
    can fake a small delta — a pass vote must therefore prove the rung
    program actually executed, not just that its wall matched).

    One attempt = three temporally-adjacent readings of one cached
    program (runtime knobs), all at floor f:

        B = tol=1e9 (penalty can never fire)
        R = the rung tolerance
        F = tol=−1  (penalty ALWAYS fires)

    with the verdict in the adjacent differences (queue common-mode):

        pass:  F−R ∈ [0.5, 3]·p_big·s  and  |R−B| ≤ 0.25·p_big·s
        fail:  R−B ∈ [0.5, 3]·p_big·s  and  |F−R| ≤ 0.25·p_big·s
        else:  chaos (kill/burst/drain) -> retry

    The F reading makes a pass vote EXECUTION-POSITIVE by construction:
    it demands that the long forced-penalty program demonstrably ran
    (F−R ≈ p_big·s), which a service kill cannot fake — a killed F
    returns a small band wall, F−R collapses, and the attempt reads
    chaos.  Conversely a genuine fail makes R fire the same penalty F
    does, so R−B is large while F−R collapses.  The only false-pass
    path left is the service executing F (≈(f+p_big)·s of device time)
    while killing the IDENTICALLY-SIZED genuinely-failing R seconds
    away — twice, since two consistent votes decide.  Contradictions
    or an unreadable phase leave the rung (and the ladder below it)
    unresolved: the bracket can only loosen, never tighten."""
    max_pairs = max_pairs or int(os.environ.get("TNQS_RUNG_MAX_PAIRS", "4"))
    signal = p_big * s
    pass_hi = 0.25 * signal
    fail_lo, fail_hi = 0.5 * signal, 3.0 * signal

    def read(t):
        for _retry in range(3):
            rec = run_verify(t, p_big, floor=f)
            w = rec and rec.get("wall_seconds")
            if (rec is not None and rec.get("executed", True)
                    and w >= max(f * 2e-5, 0.3 * f * s)):
                return w
        return None

    votes = []
    for _attempt in range(max_pairs):
        wb = read(1e9)
        wr = read(tol)
        wf = read(-1.0)
        if any(w is None for w in (wb, wr, wf)):
            continue
        d_rb, d_fr = wr - wb, wf - wr
        if fail_lo <= d_fr <= fail_hi and abs(d_rb) <= pass_hi:
            votes.append("pass")
            tag = "pass"
        elif fail_lo <= d_rb <= fail_hi and abs(d_fr) <= pass_hi:
            votes.append("fail")
            tag = "fail"
        else:
            tag = "chaos (retry)"
        print(f"# tol={tol:g} diff triple: B={wb:.1f}s R={wr:.1f}s "
              f"F={wf:.1f}s (R-B={d_rb:+.1f}, F-R={d_fr:+.1f}; "
              f"small<=|{pass_hi:.0f}|, large in "
              f"[{fail_lo:.0f},{fail_hi:.0f}]) -> {tag}",
              file=sys.stderr, flush=True)
        if votes.count("pass") >= 2:
            return "pass"
        if votes.count("fail") >= 2:
            return "fail"
        if "pass" in votes and "fail" in votes:
            return "ambiguous"  # contradiction: unreadable phase
    return "ambiguous"


def rung_sandwich(run_verify, tol, p_big, floors, slope_band, fail_at):
    """Floor-sandwich rung verdict (pre-2026-08-19 reader, kept for
    TNQS_RUNG_MODE=sandwich): [F1, F2, F1] readings, absolute fail
    thresholds — vulnerable to queue swings larger than the penalty
    signal (see rung_diff)."""
    f1, f2 = floors
    lo_d, hi_d = slope_band
    verdict = "error"
    for _attempt in range(3):
        walls = []
        for f in (f1, f2, f1):
            w = None
            for _retry in range(3):
                rec = run_verify(tol, p_big, floor=f)
                wr = rec and rec.get("wall_seconds")
                if (rec is not None and rec.get("executed", True)
                        and wr >= f * 2e-5):
                    w = wr
                    break
            walls.append(w)
        print(f"# tol={tol:g} sandwich walls={walls}",
              file=sys.stderr, flush=True)
        if any(w is None for w in walls):
            verdict = "error"
            continue
        w1a, w2, w1b = walls
        n_fail = sum(w >= fail_at(f)
                     for w, f in zip(walls, (f1, f2, f1)))
        slope_ok = (lo_d <= w2 - w1a <= hi_d
                    and lo_d <= w2 - w1b <= hi_d)
        if n_fail >= 2:
            return "fail"
        if slope_ok and n_fail == 0:
            return "pass"
        verdict = "ambiguous"
        print(f"# tol={tol:g}: ambiguous sandwich (n_fail={n_fail}, "
              f"slope_ok={slope_ok}), re-reading", file=sys.stderr,
              flush=True)
    return verdict


def bisect_slope(n_layers: int) -> None:
    """Slope-verified tolerance ladder — every reading is differential.

    Protocol (each --verify subprocess shares ONE compiled program via
    the runtime tol/penalty/floor knobs and the service's cross-process
    program cache):

      1. warm run (tol=1e9) to eat the remote compile;
      2. PRE slope control (see slope_control): channel alive + measured
         per-layer time s + largest penalty p_big that executes today;
      3. rungs, descending tol — differential B/R/F triples by default
         (TNQS_RUNG_MODE=diff, see `rung_diff`: baseline / rung /
         forced-penalty readings, verdict in the adjacent differences,
         pass votes execution-positive via the forced-penalty reading;
         TNQS_RUNG_MODE=sandwich keeps the earlier [F1, F2, F1]
         floor-sandwich reader with absolute fail thresholds, see
         `rung_sandwich`).  Either way an unresolved rung stops the
         ladder, which can only LOOSEN the reported bracket, never
         tighten it;
      4. POST slope control: the channel must still be alive after the
         last rung (controls bracket the ladder in time, so a mid-ladder
         service mood change voids the run instead of faking passes).

    channel_ok = pre.ok AND post.ok.
    """
    run_verify = _make_run_verify(n_layers)

    # tol=1e9 always passes: floor-only warm to eat the remote compile
    # (retried: an unexecuted warm compiles nothing)
    for _attempt in range(3):
        t0 = time.perf_counter()
        warm = run_verify(1e9, 1000000, floor=100000)
        print(f"# warm (compile) wall={warm and warm.get('wall_seconds')} "
              f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr,
              flush=True)
        if warm is not None and warm.get("executed", True):
            break

    pre = slope_control(run_verify, label="/pre")
    if not pre["ok"]:
        print(json.dumps({
            "n_layers": n_layers, "max_site_delta_upper": None,
            "max_site_delta_lower": None, "channel_ok": False,
            "control_pre": pre, "control_post": None,
            "channel": "timing-slope; pre-control found no live channel",
        }), flush=True)
        return
    s = pre["per_layer_seconds"]
    p_big = pre["p_big"]
    # rung floor sizes derive from the DISCOVERED kill ceiling: the
    # control proved programs of p_big layers execute today, so the F2
    # pass program (f2 layers) must stay <= p_big, while f2-f1 must be
    # large enough that the floor slope clears queue noise (>= ~40 s at
    # the measured per-layer speed).  Env overrides for manual sizing.
    f1 = int(os.environ.get("TNQS_SLOPE_F1", str(max(250000, p_big // 4))))
    f2_auto = min(p_big, f1 + max(p_big // 2, int(40.0 / s)))
    f2 = int(os.environ.get("TNQS_SLOPE_F2", str(f2_auto)))
    lo_d, hi_d = 0.3 * (f2 - f1) * s, 3.0 * (f2 - f1) * s
    fail_at = lambda f: (f + 0.5 * p_big) * s

    ladder = [float(t) for t in os.environ.get(
        "TNQS_SLOPE_LADDER", "1e-4,3e-5,1e-5,3e-6").split(",")]
    rung_mode = os.environ.get("TNQS_RUNG_MODE", "diff")
    last_pass, first_fail = None, None
    for tol in ladder:
        if rung_mode == "diff":
            verdict = rung_diff(run_verify, tol, p_big, f1, s)
        else:
            verdict = rung_sandwich(
                run_verify, tol, p_big, (f1, f2), (lo_d, hi_d), fail_at
            )
        print(f"# tol={tol:g} -> {verdict}", file=sys.stderr, flush=True)
        if verdict == "pass":
            last_pass = tol
        elif verdict == "fail":
            first_fail = tol
            break
        else:
            break  # unresolved: stop, report the bracket so far

    post = slope_control(run_verify, label="/post",
                         p_small=pre["p_small"], p_big=p_big)
    channel_ok = bool(pre["ok"] and post["ok"])
    print(json.dumps({
        "n_layers": n_layers,
        "max_site_delta_upper": last_pass,
        "max_site_delta_lower": first_fail,
        "per_layer_seconds": s,
        "channel_ok": channel_ok,
        "control_pre": pre, "control_post": post,
        "rung_mode": rung_mode,
        "channel": f"timing-slope ({'differential B/R/F triple' if rung_mode == 'diff' else 'floor-sandwich'} rungs, "
        "interleaved differential controls, shared program via runtime "
        "knobs); downloads UNIMPLEMENTED",
    }), flush=True)


if __name__ == "__main__":
    x64 = "--x64" in sys.argv
    if "--point" in sys.argv:
        point(int(sys.argv[sys.argv.index("--point") + 1]), x64)
    elif "--trajectory" in sys.argv:
        trajectory(int(sys.argv[sys.argv.index("--trajectory") + 1]), x64)
    elif "--collect" in sys.argv:
        collect(int(sys.argv[sys.argv.index("--collect") + 1]))
    elif "--verify" in sys.argv:
        i = sys.argv.index("--verify")
        verify(float(sys.argv[i + 1]), int(sys.argv[i + 2]), sys.argv[i + 3],
               int(sys.argv[i + 4]),
               int(sys.argv[i + 5]) if len(sys.argv) > i + 5 else 0)
    elif "--control" in sys.argv:
        control(int(sys.argv[sys.argv.index("--control") + 1]))
    elif "--bisect" in sys.argv:
        n = int(sys.argv[sys.argv.index("--bisect") + 1])
        if os.environ.get("TNQS_BISECT_MODE", "slope") == "abs":
            bisect(n)
        else:
            bisect_slope(n)
    else:
        trajectory(20)
