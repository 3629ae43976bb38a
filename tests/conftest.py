"""Test configuration: CPU backend with x64 enabled and 8 virtual devices so
sharding tests run without real multi-chip hardware (SURVEY.md §7)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# collective timeouts: the 8 virtual devices are threads timesharing ONE
# core on this box; heavy per-shard compute between collectives (e.g. the
# chi=16 sharded BMPS strand fitting) can exceed XLA:CPU's default
# rendezvous deadline, which ABORTS the process ("Fatal Python error:
# Aborted" with rendezvous.cc stuck-thread errors).  Raise it well past
# any test's longest inter-collective segment.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=1800"
    + " --xla_cpu_collective_timeout_seconds=1800"
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


# ---------------------------------------------------------------------------
# Two-tier suite (VERDICT r3 item 9): `pytest -q` runs the fast tier
# (< 5 min — the oracle/unit coverage of every engine); the long
# integration tests (8-virtual-device sharded equivalences, example
# replays, Pallas kernel A/Bs, big batched cross-validations) run with
# `pytest --runslow` (or TNQS_FULL_SUITE=1) — the CI-style full suite.
# ---------------------------------------------------------------------------

# whole files that are integration-tier
SLOW_FILES = {
    "test_sharded_layer.py",
    "test_sharded_bmps.py",
    "test_sharded_bp.py",
    "test_sharded_loopcorrections.py",
    "test_sharded_sampling.py",
    "test_examples.py",
    "test_pallas_linalg.py",
    "test_noisy_ensemble.py",
    "test_batched_lattices.py",
    "test_batched_planar.py",
}

# individual long tests inside otherwise-fast files (measured > ~13 s)
SLOW_TESTS = {
    "test_batched_truncate_cutoff_discards",
    "test_batched_truncate_identity_when_chi_suffices",
    "test_thermal_state_batched_matches_generic",
    "test_batched_channels_vs_generic",
    "test_batched_rho_sampler_vs_dense",
    "test_batched_purity_vs_generic",
    "test_batched_channels_heavyhex",
    "test_string_expectations_match_generic_expect",
    "test_ensemble_correlations_compose",
    "test_sharded_path_correlations_match_unsharded",
    "test_imaginary_time_ground_state",
    "test_batched_layer_multichip_shards",
    "test_scan_groups_layer_matches_unrolled",
    "test_scan_groups_heavyhex_matches_unrolled",
    "test_batched_layer_matches_generic_apply",
    "test_ensemble_ground_state_matches_single_runs",
    "test_ensemble_ground_state_shared_and_ambiguous_coeffs",
    "test_excited_state_overlap_penalty",
    "test_ensemble_certified_sampling_composes",
    "test_ensemble_vmap_matches_single_runs",
    "test_loschmidt_echo_unit_at_t0_and_decays",
    "test_truncated_regime_cross_engine",
    "test_batched_configurations_match_generic_size6",
    "test_batched_configurations_general_components",
    "test_batched_loopcorrected_expectations_match_generic",
    "test_bmps_cylinder_ring_partitions",
    "test_engine_routes_through_kernel",
    "test_sharded_state_roundtrip",
    "test_ensemble_axis_shards_over_mesh",
}


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run the slow integration tier too (full CI suite)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long integration test (runs with --runslow)"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("TNQS_FULL_SUITE"):
        return
    skip = pytest.mark.skip(
        reason="slow tier: pass --runslow (or TNQS_FULL_SUITE=1)"
    )
    for item in items:
        base = item.name.split("[")[0]
        if (
            item.fspath.basename in SLOW_FILES
            or base in SLOW_TESTS
            or "slow" in item.keywords
        ):
            item.add_marker(skip)
