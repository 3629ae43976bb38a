"""Profiling and observability.

The reference's only instrumentation is ad-hoc `@timed` prints
(`apply_gates.jl:72-77`); here the TPU-native equivalents: `jax.profiler`
trace capture around any region, and a lightweight layer timer that reports
wall-clock per step with device synchronization.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tnqs-trace"):
    """Capture a jax.profiler trace (open with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class LayerTimer:
    """Wall-clock per layer with block_until_ready synchronization."""

    times: list = field(default_factory=list)

    @contextlib.contextmanager
    def layer(self, *sync_args):
        t0 = time.perf_counter()
        yield
        if sync_args:
            jax.block_until_ready(sync_args)
        self.times.append(time.perf_counter() - t0)

    def time_fn(self, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        self.times.append(time.perf_counter() - t0)
        return out

    @property
    def last(self) -> float:
        return self.times[-1] if self.times else float("nan")

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")


@dataclass(frozen=True)
class ApplyConfig:
    """The reference's `apply_kwargs` knob set (`apply_gates.jl` docstring)."""

    maxdim: int | None = None
    cutoff: float | None = None
    normalize_tensors: bool = True

    def asdict(self) -> dict:
        return dict(
            maxdim=self.maxdim,
            cutoff=self.cutoff,
            normalize_tensors=self.normalize_tensors,
        )


@dataclass(frozen=True)
class BPUpdateConfig:
    """The reference's `bp_update_kwargs` knob set
    (`beliefpropagationcache.jl:108-119`)."""

    maxiter: int | None = None
    tolerance: float | None = "default"  # type: ignore[assignment]
    verbose: bool = False

    def asdict(self) -> dict:
        out: dict = dict(verbose=self.verbose, tolerance=self.tolerance)
        if self.maxiter is not None:
            out["maxiter"] = self.maxiter
        return out
