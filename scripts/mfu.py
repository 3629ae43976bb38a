"""FLOPs/layer and MFU accounting per bench config (VERDICT r2 weak #3).

Lowers each bench config's single-layer program on the CPU backend and
reads XLA's flop estimate (`compiled.cost_analysis()["flops"]`), then
converts measured layers/s into MFU against the v5e peak.

Peak basis: TPU v5e ≈ 197 TFLOP/s bf16 / ≈ 98.5 TFLOP/s fp32 MXU
(complex64 arithmetic decomposes into fp32 matmuls, so fp32 peak is the
honest denominator for this workload).

Usage:
    python scripts/mfu.py                  # flops/layer table
    python scripts/mfu.py chi10=2486 ...   # add layers/s -> MFU column
"""

import json
import os
import sys

os.environ.setdefault("TNQS_BENCH_CPU", "1")

V5E_FP32_PEAK = 98.5e12

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import importlib.util

    spec_ = importlib.util.spec_from_file_location(
        "tnqs_bench",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec_)
    spec_.loader.exec_module(bench)

    import jax

    rates = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=")
        rates[k] = float(v)

    out = {}
    for config in bench.CONFIGS:
        spec, state, layer_fn, _takes_index = bench._build(config)
        compiled = jax.jit(lambda s: layer_fn(s)[0]).lower(state).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = float(ca.get("flops", float("nan")))
        rec = {"flops_per_layer": flops}
        if config in rates:
            rec["layers_per_sec"] = rates[config]
            rec["tflops_sustained"] = flops * rates[config] / 1e12
            rec["mfu_vs_v5e_fp32"] = flops * rates[config] / V5E_FP32_PEAK
        out[config] = rec
        print(json.dumps({config: rec}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
