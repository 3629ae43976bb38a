"""Sharded loop-corrected partition function == single-device batched
(`loopcorrection.jl:3-16` series), with the state staying vertex-sharded:
the last op of the sharded set (evolve/gauge/truncate/measure/sample/Z_lc)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    heavy_hexagonal_lattice,
    named_grid,
    random_tensornetworkstate,
)
from tensornetworkquantumsimulator_tpu.parallel import (
    BatchedState,
    batched_from_tns,
    bp_update,
)
from tensornetworkquantumsimulator_tpu.parallel.loopcorrection import (
    LoopConfigurations,
    loopcorrected_partitionfunction,
)
from tensornetworkquantumsimulator_tpu.parallel.sharded_loopcorrection import (
    make_sharded_loopcorrections,
)
from tensornetworkquantumsimulator_tpu.parallel.sharding import shard_spec


def _fixed_point_state(g, spec, chi, seed=0):
    psi = random_tensornetworkstate(
        jnp.complex128, g, "S=1/2", bond_dimension=chi,
        key=jax.random.PRNGKey(seed),
    )
    psi = tnqs.normalize(psi, alg="bp")
    _, state = batched_from_tns(psi, chi=chi, spec=spec)
    return bp_update(spec, state, maxiter=60, tolerance=1e-12)


def _sharded(state, mesh):
    sh = NamedSharding(mesh, P("v"))
    return BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )


def test_sharded_loopcorrections_grid_size6():
    """8x4 open grid, 4 strips of 2 rows: plaquettes + dominoes + disjoint
    pairs (max size 6) match the batched series exactly."""
    g = named_grid((8, 4))
    chi, S = 3, 4
    sspec = shard_spec(g, S)
    spec = sspec.spec
    state = _fixed_point_state(g, spec, chi)

    ref = complex(
        loopcorrected_partitionfunction(
            spec, state, g, max_configuration_size=6
        )
    )

    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    z_fn = make_sharded_loopcorrections(
        sspec, mesh, g, max_configuration_size=6
    )
    out = complex(z_fn(_sharded(state, mesh)))
    np.testing.assert_allclose(out, ref, rtol=1e-9, atol=1e-11)


def test_sharded_loopcorrections_torus_wrap():
    """Periodic 8x4 torus on 8 one-row strips: wrap plaquettes spanning
    shards (S-1, 0) are owned by shard S-1 and halo correctly."""
    g = named_grid((8, 4), periodic=True)
    chi, S = 2, 8
    sspec = shard_spec(g, S)
    spec = sspec.spec
    state = _fixed_point_state(g, spec, chi, seed=1)

    ref = complex(
        loopcorrected_partitionfunction(
            spec, state, g, max_configuration_size=4
        )
    )
    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    z_fn = make_sharded_loopcorrections(
        sspec, mesh, g, max_configuration_size=4
    )
    out = complex(z_fn(_sharded(state, mesh)))
    np.testing.assert_allclose(out, ref, rtol=1e-9, atol=1e-11)


def test_sharded_loopcorrections_heavyhex_12cycles():
    """Degree-3 heavy-hex (the flagship lattice): 12-cycle corrections on
    2 strips match the batched series."""
    g = heavy_hexagonal_lattice(3, 3)
    chi, S = 2, 2
    sspec = shard_spec(g, S)
    spec = sspec.spec
    state = _fixed_point_state(g, spec, chi, seed=2)

    cfgs = LoopConfigurations(spec, g, 12)
    assert cfgs.n_configurations > 0
    ref = complex(
        loopcorrected_partitionfunction(spec, state, g, configurations=cfgs)
    )
    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    z_fn = make_sharded_loopcorrections(
        sspec, mesh, g, configurations=cfgs
    )
    out = complex(z_fn(_sharded(state, mesh)))
    np.testing.assert_allclose(out, ref, rtol=1e-9, atol=1e-11)


def test_sharded_loopcorrections_span_error():
    """Configurations spanning >2 strips are rejected loudly at build time
    (use wider strips), not silently mis-computed."""
    g = named_grid((8, 4))
    sspec = shard_spec(g, 8)  # one-row strips; a vertical domino spans 3
    mesh = Mesh(np.array(jax.devices()[:8]), ("v",))
    with pytest.raises(ValueError, match="two adjacent strip shards"):
        make_sharded_loopcorrections(sspec, mesh, g, max_configuration_size=6)


def test_sharded_loopcorrected_expectations_match_batched():
    """make_sharded_loopcorrected_expectations == the single-chip
    make_loopcorrected_expectations (same norm-fixed-point series) on a
    strip-sharded 8x4 grid — single-site and bond observables, including
    the op-anchored numerator configurations."""
    from tensornetworkquantumsimulator_tpu.parallel.loopcorrection import (
        make_loopcorrected_expectations,
    )
    from tensornetworkquantumsimulator_tpu.parallel.sharded_loopcorrection import (
        make_sharded_loopcorrected_expectations,
    )

    nx, ny, chi, S = 8, 4, 2, 4
    g = named_grid((nx, ny))
    sspec = shard_spec(g, S)
    spec = sspec.spec

    psi = random_tensornetworkstate(
        jnp.complex128, g, "S=1/2", bond_dimension=chi
    )
    psi = tnqs.normalize(psi, alg="bp")
    _, state = batched_from_tns(psi, chi=chi, spec=spec)
    state = bp_update(spec, state, maxiter=60, tolerance=1e-12)

    vs = list(spec.vertices)
    obs = [
        ("Z", [vs[9]]),
        ("X", [vs[14]]),
        ("ZZ", [vs[9], vs[10]], 0.5),
    ]
    ref_fn = make_loopcorrected_expectations(
        spec, g, obs, max_configuration_size=4
    )
    ref = np.asarray(ref_fn(state))

    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    sh = NamedSharding(mesh, P("v"))
    sharded = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    fn = make_sharded_loopcorrected_expectations(
        sspec, mesh, g, obs, max_configuration_size=4
    )
    got = np.asarray(fn(sharded))
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-11)
