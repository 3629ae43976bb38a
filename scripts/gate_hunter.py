"""Unattended physics-gate hunter: poll the timing channel until a calm
service phase, then run the full slope-verified bisect ladder.

The axon service's behavior phases over hours (BASELINE.md runs A-F:
calm / queue-burst / kill-streak / total-fast-fail), and the slope gate
(`validate_backend.py --bisect`, TNQS_BISECT_MODE=slope) correctly
refuses in every pathological phase — so certification is a matter of
CATCHING a calm phase, which no single manual run does.  This script
automates the hunt:

  loop (bounded by --max-hours / --max-attempts):
    1. run a standalone slope control (`--control 10`) under the path
       under test (TNQS_EIGH_ALG, default jacobi = the fused double-NS
       roots kernel, the round-3 promotion candidate);
    2. control ok=false -> sleep --cooldown and retry (each attempt
       logs its JSON verdict to --log for the audit trail);
    3. control ok=true -> the phase is calm NOW: immediately run the
       full `--bisect 10` ladder (pre/post controls bracket the rungs
       in time, so a mid-ladder mood change still voids the run);
    4. bisect channel_ok=true -> write the final JSON to --out and
       exit 0 (the promotion decision is made by a human/commit, not
       here).  channel_ok=false -> keep hunting.

Usage:
  nohup python scripts/gate_hunter.py --max-hours 8 \
      > /tmp/gate_hunter.log 2>&1 & echo $! > /tmp/gate_hunter.pid
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
VB = os.path.join(HERE, "validate_backend.py")
BENCH = os.path.join(HERE, "..", "bench.py")


def phase_poll(cap_s: float = 120.0) -> str:
    """Cheap service-phase probe (round-4 finding k: congestion phases are
    MACROSCOPIC — two 90-min control stages once timed out without one
    1M-layer probe completing, while minutes after, the same service
    served a 16k-layer sample in 8.0 s.  Poll cheaply, bail fast).

    Dispatches the already-warmed heavyhex k=63 program (16k layers,
    ~3-15 s in a calm phase) and classifies the service mood:

      'calm'      — wall in [2, 60] s with a blocking sync or downloaded
                    z: real execution at a sane rate; safe to spend a
                    control stage now
      'storm'     — sub-2 s wall or instant sync: fast-fail storm
                    (finding l); fresh dispatches are dying
      'congested' — the probe hit the cap: queue/kill phase
    """
    seed = int(time.time()) % 1000000
    proc = subprocess.Popen(
        [sys.executable, BENCH, "--probe", "heavyhex", "255", "63",
         str(seed)],
        text=True, start_new_session=True,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
    )
    try:
        out, _ = proc.communicate(timeout=cap_s)
    except subprocess.TimeoutExpired:
        import signal

        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        try:
            proc.communicate(timeout=15)
        except Exception:
            pass
        return "congested"
    rec = None
    for line in (out or "").splitlines():
        if line.startswith("{"):
            try:
                rec = json.loads(line)
            except ValueError:
                pass
    if rec is None:
        return "congested"
    wall = rec.get("wall_seconds", 0.0)
    executed = rec.get("z") is not None or rec.get("sync_seconds", 0.0) >= 1.0
    if wall < 2.0 or not executed:
        return "storm"
    if wall <= 60.0:
        return "calm"
    return "congested"


def run_stage(args_list, env, timeout_s, log):
    """Run one validate_backend stage; return its last JSON line (or None)."""
    t0 = time.time()
    # own process group: a stage timeout must also kill the stage's
    # in-flight --verify grandchild probes (else an orphaned multi-minute
    # penalty program keeps loading the shared tunnel into the next
    # attempt, skewing the very queue readings the hunt depends on)
    proc = subprocess.Popen(
        [sys.executable, VB] + args_list,
        env=env, text=True, start_new_session=True,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    try:
        out, _ = proc.communicate(timeout=timeout_s)
        out = out or ""
    except subprocess.TimeoutExpired:
        import signal

        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        try:
            out, _ = proc.communicate(timeout=30)
            out = out or ""
        except Exception:
            out = ""
        out += "\n# gate_hunter: stage timeout"
    log.write(out + "\n")
    log.flush()
    rec = None
    for line in out.splitlines():
        if line.startswith("{"):
            try:
                rec = json.loads(line)
            except ValueError:
                pass
    print(f"# stage {args_list} took {time.time() - t0:.0f}s -> "
          f"{json.dumps(rec)[:200] if rec else None}", flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-hours", type=float, default=8.0)
    ap.add_argument("--max-attempts", type=int, default=24)
    ap.add_argument("--cooldown", type=float, default=900.0,
                    help="seconds between attempts after a refused control")
    ap.add_argument("--eigh-alg", default="jacobi")
    ap.add_argument("--layers", type=int, default=10)
    ap.add_argument("--poll-cap", type=float, default=120.0,
                    help="cheap phase-poll probe cap (round-4 finding k)")
    ap.add_argument("--poll-cooldown", type=float, default=240.0,
                    help="sleep between phase polls while not calm")
    ap.add_argument("--control-timeout", type=float, default=2700.0)
    ap.add_argument("--bisect-timeout", type=float, default=10800.0)
    ap.add_argument("--out", default="/tmp/gate_bisect_result.json")
    ap.add_argument("--log", default="/tmp/gate_hunter_stages.log")
    args = ap.parse_args()

    env = dict(os.environ)
    env["TNQS_EIGH_ALG"] = args.eigh_alg
    env.setdefault("TNQS_BISECT_MODE", "slope")

    deadline = time.time() + args.max_hours * 3600
    log = open(args.log, "a")
    for attempt in range(1, args.max_attempts + 1):
        if time.time() > deadline:
            print("# gate_hunter: wall budget exhausted", flush=True)
            break
        print(f"# gate_hunter attempt {attempt} "
              f"({(deadline - time.time()) / 3600:.1f}h left)", flush=True)
        # phase-aware gating (round-4 finding k): never commit a long
        # control stage blind — poll with one cheap warmed probe until
        # the service reads calm (polls are minutes, not 90-min stages,
        # and do not consume control attempts)
        mood = None
        while time.time() + args.poll_cooldown < deadline:
            mood = phase_poll(args.poll_cap)
            print(f"# gate_hunter: phase poll -> {mood}", flush=True)
            if mood == "calm":
                break
            time.sleep(args.poll_cooldown)
        if mood != "calm":
            print("# gate_hunter: wall budget exhausted polling", flush=True)
            break
        ctl = run_stage(["--control", str(args.layers)], env,
                        args.control_timeout, log)
        if not (ctl and ctl.get("ok")):
            if time.time() + args.cooldown > deadline:
                break  # don't sleep past the wall budget
            time.sleep(args.cooldown)
            continue
        print(f"# gate_hunter: channel ALIVE "
              f"(s={ctl.get('per_layer_seconds')}, p_big={ctl.get('p_big')}) "
              f"-> running full bisect", flush=True)
        # seed the ladder's control sizing with what the probe learned
        benv = dict(env)
        benv["TNQS_CONTROL_P_SMALL"] = str(ctl["p_small"])
        benv["TNQS_CONTROL_P_BIG"] = str(ctl["p_big"])
        bis = run_stage(["--bisect", str(args.layers)], benv,
                        args.bisect_timeout, log)
        if bis is not None:
            with open(args.out, "w") as f:
                json.dump(bis, f)
        if bis and bis.get("channel_ok"):
            print(f"# gate_hunter: CERTIFIED bracket "
                  f"({bis.get('max_site_delta_lower')}, "
                  f"{bis.get('max_site_delta_upper')}] -> {args.out}",
                  flush=True)
            return 0
        print("# gate_hunter: bisect voided, resuming hunt", flush=True)
        time.sleep(args.cooldown / 2)
    print("# gate_hunter: no certification this session", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
