"""utils/profiling.py: trace capture, layer timers, config dataclasses."""

import os

import jax
import jax.numpy as jnp

from tensornetworkquantumsimulator_tpu.utils.profiling import (
    ApplyConfig,
    BPUpdateConfig,
    LayerTimer,
    trace,
)


def test_trace_produces_artifacts(tmp_path):
    log_dir = str(tmp_path / "trace")
    with trace(log_dir) as d:
        jnp.dot(jnp.ones((8, 8)), jnp.ones((8, 8))).block_until_ready()
    assert d == log_dir
    found = [
        os.path.join(root, f)
        for root, _, files in os.walk(log_dir)
        for f in files
    ]
    assert found, "profiler trace produced no files"


def test_layer_timer_accumulates():
    t = LayerTimer()
    x = jnp.ones((4, 4))
    with t.layer(x):
        y = x @ x
    out = t.time_fn(lambda a: a @ a, x)
    jax.block_until_ready((y, out))
    assert len(t.times) == 2
    assert all(dt >= 0 for dt in t.times)
    assert t.last == t.times[-1]
    assert abs(t.mean - sum(t.times) / 2) < 1e-12


def test_config_dataclasses_roundtrip():
    a = ApplyConfig(maxdim=8, cutoff=1e-10, normalize_tensors=False)
    assert a.asdict() == dict(maxdim=8, cutoff=1e-10, normalize_tensors=False)
    b = BPUpdateConfig(maxiter=7, tolerance=1e-6, verbose=True)
    d = b.asdict()
    assert d["maxiter"] == 7 and d["tolerance"] == 1e-6 and d["verbose"]
    # maxiter=None is omitted so cache defaults apply
    assert "maxiter" not in BPUpdateConfig().asdict()
