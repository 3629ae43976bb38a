"""Test configuration: CPU backend with x64 enabled and 8 virtual devices so
sharding tests run without real multi-chip hardware (SURVEY.md §7)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# the axon TPU plugin overrides JAX_PLATFORMS; the config update wins
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_rngs():
    import tensornetworkquantumsimulator_tpu as tnqs
    from tensornetworkquantumsimulator_tpu import sampling

    tnqs.seed(123)
    sampling.seed_sampler(123)
    yield
