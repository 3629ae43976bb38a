"""Standalone timing probe — thin wrapper over bench.py's --probe mode.

Usage: python scripts/probe_sync2.py <config> <n_layers> [k] [seed]
  config ∈ {chi10, heavyhex, chi32}

One synchronized sample per process (see bench.py's docstring for the full
methodology: forced sync via download attempt, unique input bytes per seed,
best-sample k·n/wall estimation).  `scripts/probe_sync.py` is the original
experiment demonstrating that block_until_ready does not synchronize.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench

if __name__ == "__main__":
    config = sys.argv[1] if len(sys.argv) > 1 else "chi10"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2005
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    bench.run_probe(config, n, k, seed)
