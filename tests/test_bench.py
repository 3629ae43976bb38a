"""bench.py anti-inflation filter (VERDICT round 1, weak #2).

The round-1 filter (wall >= 2 s) accepted a poisoned chi32 sample implying
6x-inflated throughput.  These tests replay the actual round-1 sample tails
against the new filter and assert each poisoning signature is rejected.
"""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "tnqs_bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def _rec(k, wall, sync=None, z=None):
    out = {"k": k, "wall_seconds": wall, "z": z}
    if sync is not None:
        out["sync_seconds"] = sync
    return out


def test_rejects_round1_poisoned_chi32_tail():
    """chi32 k=1: 62.3s then k=17: 9.1s — 17x the work 7x faster is
    impossible; the instant sync failure marks the poisoned chain."""
    n, k_lo, k_hi, floor = bench.CONFIGS["chi32"]
    samples = [
        _rec(1, 62.3, sync=0.01),
        _rec(17, 9.1, sync=0.005),  # poisoned: dispatch chain died
    ]
    per_layer, quality = bench.select_per_layer(samples, n, k_lo, k_hi, floor)
    assert per_layer is None and quality is None


def test_rejects_subsecond_poisoned_wall():
    """heavyhex k=33: 0.6s from round 1 — below the 2 s wall floor."""
    n, k_lo, k_hi, floor = bench.CONFIGS["heavyhex"]
    samples = [_rec(33, 0.6, sync=0.001)]
    assert bench.select_per_layer(samples, n, k_lo, k_hi, floor) == (None, None)


def test_accepts_blocking_sync_sample():
    n, k_lo, k_hi, floor = bench.CONFIGS["chi10"]
    samples = [
        _rec(1, 72.1, sync=1.2),
        _rec(17, 149.0, sync=20.5),
    ]
    per_layer, quality = bench.select_per_layer(samples, n, k_lo, k_hi, floor)
    assert quality == "sync"
    assert abs(per_layer - 149.0 / (17 * n)) < 1e-12


def test_accepts_downloaded_z_even_with_fast_sync():
    """A successfully downloaded z is the gold-standard execution proof."""
    n, k_lo, k_hi, floor = bench.CONFIGS["chi10"]
    samples = [_rec(17, 40.0, sync=0.2, z=0.93)]
    per_layer, quality = bench.select_per_layer(samples, n, k_lo, k_hi, floor)
    assert quality == "sync" and per_layer is not None


def test_monotone_fallback_requires_khi_slower_than_klo():
    """If no sample has a blocking sync, accept k_hi only when walls are
    k-monotone; the poisoned pattern (k_hi faster) stays rejected."""
    n, k_lo, k_hi, floor = bench.CONFIGS["chi10"]
    good = [_rec(1, 72.1, sync=0.1), _rec(17, 149.0, sync=0.1)]
    per_layer, quality = bench.select_per_layer(good, n, k_lo, k_hi, floor)
    assert quality == "monotone"
    assert abs(per_layer - 149.0 / (17 * n)) < 1e-12

    bad = [_rec(1, 62.3, sync=0.1), _rec(17, 9.1, sync=0.1)]
    assert bench.select_per_layer(bad, n, k_lo, k_hi, floor) == (None, None)


def test_rejects_sub_floor_per_layer():
    """Implied per-layer below the physical floor => nothing executed."""
    n, k_lo, k_hi, floor = bench.CONFIGS["chi32"]
    # 2.0 s wall over 17*255 layers = 4.6e-4 s/layer, under the 5e-4 floor,
    # despite a blocking sync
    samples = [_rec(17, 2.0, sync=5.0)]
    assert bench.select_per_layer(samples, n, k_lo, k_hi, floor) == (None, None)


def test_emit_is_parseable_with_no_results(capsys):
    """A driver timeout before any config must still leave a JSON record."""
    import json

    bench._emit({})
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "tfim_5x5_chi10_layers_per_sec"
    assert rec["value"] is None


class _FakeProc:
    def __init__(self):
        self.killed = False

    def poll(self):
        return 0

    def kill(self):
        self.killed = True

    def communicate(self, timeout=None):
        return "", ""


def test_scheduler_resolves_all_configs_concurrently(monkeypatch):
    """_measure_all fills every config from concurrent probes, retrying a
    poisoned first sample (round-2 heavyhex failure mode) same-k."""
    launches = []
    heavyhex_tries = [0]

    def fake_launch(config, n, k, env_extra=None):
        launches.append((config, k))
        import time as _t

        return {"proc": _FakeProc(), "t0": _t.perf_counter(), "k": k, "cfg": config}

    def fake_reap(live):
        k = live["k"]
        config = live["cfg"]
        if config == "heavyhex" and heavyhex_tries[0] == 0:
            heavyhex_tries[0] += 1
            return _rec(k, 0.4, sync=0.001)  # poisoned chain
        return _rec(k, 50.0, sync=50.0)

    monkeypatch.setattr(bench, "_launch", fake_launch)
    monkeypatch.setattr(bench, "_reap", fake_reap)
    # mid-endgame budget: no refinement loop, but retries still allowed
    import time as _t

    monkeypatch.setattr(bench, "_T_START", _t.perf_counter() - (bench.BUDGET_S - 100.0))
    results = {}
    bench._measure_all(results)
    # headline configs all present (extras ride leftover budget only)
    assert set(bench.CONFIGS) <= set(results)
    for config in bench.CONFIGS:
        assert results[config]["per_layer"] is not None, config
        assert results[config]["quality"] == "sync"
    # the poisoned heavyhex sample triggered a same-k retry
    assert sum(1 for c, _ in launches if c == "heavyhex") == 2


def test_scheduler_extends_budget_for_unresolved_configs(monkeypatch):
    """Past the base budget, unresolved configs keep sampling (deadline
    extends to TNQS_BENCH_MAX_S); once resolved the loop exits."""
    from collections import defaultdict

    tries = defaultdict(int)

    def fake_launch(config, n, k, env_extra=None):
        tries[config] += 1
        import time as _t

        return {"proc": _FakeProc(), "t0": _t.perf_counter(), "k": k, "cfg": config}

    def fake_reap(live):
        cfg = live["cfg"]
        if cfg == "chi64" and tries[cfg] < 3:
            return None  # probe died (congestion) — twice
        return _rec(live["k"], 50.0, sync=50.0)

    monkeypatch.setattr(bench, "_launch", fake_launch)
    monkeypatch.setattr(bench, "_reap", fake_reap)
    import time as _t

    # already past the base budget: only the extension allows sampling
    monkeypatch.setattr(bench, "_T_START", _t.perf_counter() - bench.BUDGET_S - 10.0)
    monkeypatch.setenv("TNQS_BENCH_MAX_S", str(bench.BUDGET_S + 2000.0))
    results = {}
    bench._measure_all(results)
    assert tries["chi64"] == 3
    assert all(results[c]["per_layer"] is not None for c in bench.CONFIGS)


def test_scheduler_launches_reserved_slots_at_t0(monkeypatch):
    """Reserved slots (chi10_rolled real-dynamics, chi10_qdwh accuracy
    record) are headline-tier: launched alongside the four headline
    configs, not gated on their resolution (VERDICT r4 item 1)."""
    launches = []

    def fake_launch(config, n, k, env_extra=None):
        launches.append((config, k))
        import time as _t

        return {"proc": _FakeProc(), "t0": _t.perf_counter(), "k": k, "cfg": config}

    monkeypatch.setattr(bench, "_launch", fake_launch)
    monkeypatch.setattr(bench, "_reap", lambda live: _rec(live["k"], 50.0, sync=50.0))
    import time as _t

    monkeypatch.setattr(bench, "_T_START", _t.perf_counter() - (bench.BUDGET_S - 100.0))
    results = {}
    bench._measure_all(results)
    assert ("chi10_rolled", 63) in launches
    assert ("chi10", 15) in launches  # the reserved chi10_qdwh probe
    for name in bench.RESERVED_SLOTS:
        assert results[name]["per_layer"] is not None, name
        assert results[name]["quality"] == "sync"


def test_emit_prefers_rolled_real_dynamics_value(capsys):
    """The headline metric value is the de-converged rolled rate; the
    converged fixed-point number is a labeled secondary."""
    import json

    results = {
        "chi10": {"per_layer": 1e-4, "z": None, "quality": "sync"},
        "chi10_rolled": {"per_layer": 4e-4, "z": None, "quality": "sync"},
    }
    bench._emit(results)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] == 2500.0
    assert rec["tfim_5x5_chi10_converged_layers_per_sec"] == 10000.0
    assert rec["tfim_5x5_chi10_rolled_layers_per_sec"] == 2500.0
    assert "real dynamics" in rec["chi10_regime"]


def test_emit_falls_back_to_converged_with_regime_label(capsys):
    """A truncated window without a rolled sample still leaves a record,
    loudly labeled as the converged-regime number."""
    import json

    results = {"chi10": {"per_layer": 1e-4, "z": None, "quality": "sync"}}
    bench._emit(results)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] == 10000.0
    assert "converged fixed-point" in rec["chi10_regime"]


def test_rolled_probe_builds_and_steps():
    """chi10_rolled: the de-converged probe config builds, reports
    takes_index, and one indexed layer step preserves shapes (CPU)."""
    import os

    import jax
    import numpy as np

    os.environ["TNQS_BENCH_CPU"] = "1"
    import bench

    spec, state, layer_fn, takes_index = bench._build("chi10_rolled", seed=1)
    assert takes_index
    out, errs = jax.jit(lambda s: layer_fn(s, 3))(state)
    assert out.tensors.shape == state.tensors.shape
    assert np.all(np.isfinite(np.asarray(out.tensors).real))
