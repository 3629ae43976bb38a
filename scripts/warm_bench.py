"""Warm every bench HLO into the axon service's cross-process program
cache ahead of a driver window.

The service compiles remotely at first EXECUTION and caches compiled
programs across processes (CLAUDE.md); a cold k_hi program can burn
300+ s of a congested driver window on compile alone, while a warmed one
lands compute-only.  This script launches one probe per (config, env,
k) from the bench's own HEADLINE_ENV / extras tables — the exact HLOs
the driver's `python bench.py` will dispatch — with a generous cap, and
reports each wall.  Killed clients do NOT abort server-side compiles, so
even timed-out probes leave the compile in flight (finding (c),
CLAUDE.md).

Usage:  python scripts/warm_bench.py [--cap 900] [--sequential]
"""

import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
BENCH = os.path.join(HERE, "..", "bench.py")
sys.path.insert(0, os.path.join(HERE, ".."))

import bench  # noqa: E402


def warm_list():
    """(name, config, env, n, k) for every headline + extra program —
    straight from the bench's own CONFIGS/HEADLINE_ENV/EXTRA_SLOTS
    tables, so the warm set cannot drift from what the driver
    dispatches."""
    jobs = []
    for config, (n, _k_lo, k_hi, _floor) in bench.CONFIGS.items():
        jobs.append((config, config, bench.HEADLINE_ENV.get(config), n, k_hi))
    for name, (base, env, k) in (
        list(bench.RESERVED_SLOTS.items()) + list(bench.EXTRA_SLOTS.items())
    ):
        n, _k_lo, k_hi, _f = (
            bench.CONFIGS.get(base) or bench.EXTRA_CONFIGS[base]
        )
        jobs.append((name, base, env, n, k or k_hi))
    return jobs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=float, default=900.0)
    ap.add_argument("--sequential", action="store_true",
                    help="one probe at a time (gentler on the tunnel)")
    args = ap.parse_args()

    jobs = warm_list()
    live = []
    seed = int(time.time()) % 100000
    for i, (name, config, env_extra, n, k) in enumerate(jobs):
        env = dict(os.environ)
        if env_extra:
            env.update(env_extra)
        proc = subprocess.Popen(
            [sys.executable, BENCH, "--probe", config, str(n), str(k),
             str(seed + i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True,
        )
        live.append((name, k, time.time(), proc))
        if args.sequential:
            _wait_one(live.pop(), args.cap)
    for item in live:
        _wait_one(item, args.cap)


def _wait_one(item, cap):
    name, k, t0, proc = item
    try:
        out, _ = proc.communicate(timeout=max(5.0, cap - (time.time() - t0)))
        line = next(
            (l for l in (out or "").splitlines() if l.startswith("{")), None)
        print(f"# {name} k={k}: {line}", flush=True)
    except subprocess.TimeoutExpired:
        proc.kill()
        print(f"# {name} k={k}: probe cap hit (compile continues "
              "server-side)", flush=True)


if __name__ == "__main__":
    main()
