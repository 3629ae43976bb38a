"""Sharded-vs-single-device FULL Trotter layer equivalence (VERDICT item:
state transformation sharded explicitly, not just BP messages)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import named_grid, random_tensornetworkstate
from tensornetworkquantumsimulator_tpu.models.gates import gate_matrix
from tensornetworkquantumsimulator_tpu.parallel import (
    BatchedState,
    apply_color_group,
    apply_one_site,
    batched_from_tns,
    bp_update,
)
from tensornetworkquantumsimulator_tpu.parallel.sharded_layer import (
    build_layer_groups,
    make_sharded_layer,
)
from tensornetworkquantumsimulator_tpu.parallel.sharding import shard_spec


def _unsharded_layer(spec, state, gate2, gate1, chi, cutoff, tol):
    """Reference semantics: 1-site gate, then per color group BP refresh +
    batched simple update, then a final BP update (= make_layer_fn on the
    kicked-Ising layer)."""
    state = apply_one_site(state, jnp.asarray(gate1))
    errs = []
    for group in spec.color_groups:
        state = bp_update(spec, state, maxiter=30, tolerance=tol)
        state, err = apply_color_group(
            state, group, jnp.asarray(gate2), chi, cutoff, True
        )
        errs.append(err)
    state = bp_update(spec, state, maxiter=30, tolerance=tol)
    return state, jnp.concatenate(errs)


def test_sharded_full_layer_matches_unsharded():
    nx, ny, chi = 8, 4, 3
    S = 8
    g = named_grid((nx, ny))
    sspec = shard_spec(g, S)
    spec = sspec.spec

    psi = random_tensornetworkstate(
        jnp.complex128, g, "S=1/2", bond_dimension=chi
    )
    psi = tnqs.normalize(psi, alg="bp")
    _, state = batched_from_tns(psi, chi=chi, spec=spec)

    gate2 = np.asarray(gate_matrix("Rzz", 0.35)).reshape(2, 2, 2, 2)
    gate1 = np.asarray(gate_matrix("Rx", 0.8))
    tol = 1e-10

    ref_state, ref_errs = _unsharded_layer(
        spec, state, gate2, gate1, chi, 1e-12, tol
    )

    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    layer = make_sharded_layer(
        sspec, mesh, gate2, gate1, chi, cutoff=1e-12,
        bp_tolerance=tol, one_site_first=True,
    )
    sh = NamedSharding(mesh, P("v"))
    sharded_state = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    out_state, out_errs = layer(sharded_state)

    np.testing.assert_allclose(
        np.asarray(out_state.tensors), np.asarray(ref_state.tensors),
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(out_state.messages), np.asarray(ref_state.messages),
        atol=1e-9,
    )
    # same truncation-error multiset (ordering differs across the split)
    np.testing.assert_allclose(
        np.sort(np.asarray(out_errs)[np.asarray(out_errs) > 1e-14]),
        np.sort(np.asarray(ref_errs)[np.asarray(ref_errs) > 1e-14]),
        rtol=1e-6,
    )


def test_sharded_layer_cross_bucket_tables():
    # every edge lands in exactly one bucket; cross tables align order
    g = named_grid((8, 4))
    sspec = shard_spec(g, 8)
    groups = build_layer_groups(sspec)
    n_edges = sum(
        int(b.valid.sum()) for group in groups for b in group
    )
    assert n_edges == len(sspec.spec.edges)


def test_sharded_layer_reversed_strips():
    """Reversed strip order: tables rebuild against the new shard layout.
    (Edge orientation is normalized to vertex insertion order by the graph
    substrate, so cross edges always point at the next shard — the dir=-1
    branch in sharded_layer is defensive only.)"""
    nx, ny, chi = 8, 4, 2
    S = 8
    g = named_grid((nx, ny))
    sspec = shard_spec(g, S, strip_key=lambda v: (-v[0], v[1]))
    spec = sspec.spec
    groups = build_layer_groups(sspec)
    dirs = {b.dir for group in groups for b in group if hasattr(b, "dir")}
    assert dirs == {+1}

    psi = random_tensornetworkstate(
        jnp.complex128, g, "S=1/2", bond_dimension=chi
    )
    psi = tnqs.normalize(psi, alg="bp")
    _, state = batched_from_tns(psi, chi=chi, spec=spec)
    gate2 = np.asarray(gate_matrix("Rzz", 0.35)).reshape(2, 2, 2, 2)
    gate1 = np.asarray(gate_matrix("Rx", 0.8))
    tol = 1e-10
    ref_state, _ = _unsharded_layer(spec, state, gate2, gate1, chi, 1e-12, tol)

    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    layer = make_sharded_layer(
        sspec, mesh, gate2, gate1, chi, cutoff=1e-12, bp_tolerance=tol
    )
    sh = NamedSharding(mesh, P("v"))
    sharded = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    out_state, _ = layer(sharded)
    np.testing.assert_allclose(
        np.asarray(out_state.tensors), np.asarray(ref_state.tensors),
        atol=1e-9,
    )


def test_sharded_layer_periodic_ring_wrap():
    """Periodic lattice: the wrap edge rides the ring ppermute (shard S-1 ↔
    shard 0) without special-casing."""
    nx, ny, chi = 8, 2, 2
    S = 4
    g = named_grid((nx, ny), periodic=True)
    sspec = shard_spec(g, S, strip_key=lambda v: v)
    spec = sspec.spec

    psi = random_tensornetworkstate(
        jnp.complex128, g, "S=1/2", bond_dimension=chi
    )
    psi = tnqs.normalize(psi, alg="bp")
    _, state = batched_from_tns(psi, chi=chi, spec=spec)
    gate2 = np.asarray(gate_matrix("Rzz", 0.3)).reshape(2, 2, 2, 2)
    gate1 = np.asarray(gate_matrix("Rx", 0.6))
    tol = 1e-10
    ref_state, _ = _unsharded_layer(spec, state, gate2, gate1, chi, 1e-12, tol)

    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    layer = make_sharded_layer(
        sspec, mesh, gate2, gate1, chi, cutoff=1e-12, bp_tolerance=tol
    )
    sh = NamedSharding(mesh, P("v"))
    sharded = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    out_state, _ = layer(sharded)
    np.testing.assert_allclose(
        np.asarray(out_state.tensors), np.asarray(ref_state.tensors),
        atol=1e-9,
    )


def test_sharded_2d_mesh_layer_matches_unsharded():
    """2-D block mesh: full layer over Mesh(("x","y")) with halo exchange
    along both axes matches the single-device engine."""
    from tensornetworkquantumsimulator_tpu.parallel.sharding2d import (
        make_sharded_layer_2d,
        shard2d_spec,
    )

    nx, ny, chi = 4, 4, 2
    sx, sy = 2, 2
    g = named_grid((nx, ny))
    sspec = shard2d_spec(g, sx, sy)
    spec = sspec.spec

    psi = random_tensornetworkstate(
        jnp.complex128, g, "S=1/2", bond_dimension=chi
    )
    psi = tnqs.normalize(psi, alg="bp")
    _, state = batched_from_tns(psi, chi=chi, spec=spec)
    gate2 = np.asarray(gate_matrix("Rzz", 0.35)).reshape(2, 2, 2, 2)
    gate1 = np.asarray(gate_matrix("Rx", 0.8))
    tol = 1e-10
    ref_state, ref_errs = _unsharded_layer(
        spec, state, gate2, gate1, chi, 1e-12, tol
    )

    mesh = Mesh(np.array(jax.devices()[: sx * sy]).reshape(sx, sy), ("x", "y"))
    layer = make_sharded_layer_2d(
        sspec, mesh, gate2, gate1, chi, cutoff=1e-12, bp_tolerance=tol
    )
    sh = NamedSharding(mesh, P(("x", "y")))
    sharded = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    out_state, out_errs = layer(sharded)
    np.testing.assert_allclose(
        np.asarray(out_state.tensors), np.asarray(ref_state.tensors),
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(out_state.messages), np.asarray(ref_state.messages),
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(out_errs)[np.asarray(out_errs) > 1e-14]),
        np.sort(np.asarray(ref_errs)[np.asarray(ref_errs) > 1e-14]),
        rtol=1e-6,
    )


def test_sharded_2d_mesh_torus():
    """Periodic 4x4 torus on the 2x2 mesh: wrap edges ride both mesh rings."""
    from tensornetworkquantumsimulator_tpu.parallel.sharding2d import (
        make_sharded_layer_2d,
        shard2d_spec,
    )

    g = named_grid((4, 4), periodic=True)
    chi = 2
    sspec = shard2d_spec(g, 2, 2)
    spec = sspec.spec
    psi = random_tensornetworkstate(
        jnp.complex128, g, "S=1/2", bond_dimension=chi
    )
    psi = tnqs.normalize(psi, alg="bp")
    _, state = batched_from_tns(psi, chi=chi, spec=spec)
    gate2 = np.asarray(gate_matrix("Rzz", 0.3)).reshape(2, 2, 2, 2)
    gate1 = np.asarray(gate_matrix("Rx", 0.6))
    tol = 1e-10
    ref_state, _ = _unsharded_layer(spec, state, gate2, gate1, chi, 1e-12, tol)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("x", "y"))
    layer = make_sharded_layer_2d(
        sspec, mesh, gate2, gate1, chi, cutoff=1e-12, bp_tolerance=tol
    )
    sh = NamedSharding(mesh, P(("x", "y")))
    sharded = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    out_state, _ = layer(sharded)
    np.testing.assert_allclose(
        np.asarray(out_state.tensors), np.asarray(ref_state.tensors),
        atol=1e-9,
    )


def test_sharded_2d_full_coverage_buckets():
    """4x4 torus on a 4x2 mesh: Vl=2, so color-group buckets cover every
    local vertex of a block — the case the old pad-index scatter design
    could not build (regression for the inverse-select write-back)."""
    from tensornetworkquantumsimulator_tpu.parallel.sharding2d import (
        build_layer_groups_2d,
        make_sharded_layer_2d,
        shard2d_spec,
    )

    g = named_grid((4, 4), periodic=True)
    chi = 2
    sx, sy = 4, 2
    sspec = shard2d_spec(g, sx, sy)
    spec = sspec.spec
    groups = build_layer_groups_2d(sspec)
    n_edges = sum(int(b.valid.sum()) for group in groups for b in group)
    assert n_edges == len(spec.edges)

    psi = random_tensornetworkstate(
        jnp.complex128, g, "S=1/2", bond_dimension=chi
    )
    psi = tnqs.normalize(psi, alg="bp")
    _, state = batched_from_tns(psi, chi=chi, spec=spec)
    gate2 = np.asarray(gate_matrix("Rzz", 0.3)).reshape(2, 2, 2, 2)
    gate1 = np.asarray(gate_matrix("Rx", 0.6))
    tol = 1e-10
    ref_state, _ = _unsharded_layer(spec, state, gate2, gate1, chi, 1e-12, tol)

    mesh = Mesh(np.array(jax.devices()[: sx * sy]).reshape(sx, sy), ("x", "y"))
    layer = make_sharded_layer_2d(
        sspec, mesh, gate2, gate1, chi, cutoff=1e-12, bp_tolerance=tol
    )
    sh = NamedSharding(mesh, P(("x", "y")))
    sharded = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    out_state, _ = layer(sharded)
    np.testing.assert_allclose(
        np.asarray(out_state.tensors), np.asarray(ref_state.tensors),
        atol=1e-9,
    )


def test_sharded_layer_heavyhex():
    """Flagship degree-3 heavy-hex lattice through shard_spec /
    make_sharded_layer (VERDICT r2 item 7: the SPMD gate-application path
    must not be grid-only).  heavy_hexagonal_lattice(3,3) has V=68 = 4x17
    and a valid 4-strip partition by row coordinate."""
    from tensornetworkquantumsimulator_tpu import heavy_hexagonal_lattice

    g = heavy_hexagonal_lattice(3, 3)
    chi, S = 2, 4
    sspec = shard_spec(g, S)
    spec = sspec.spec

    psi = random_tensornetworkstate(
        jnp.complex128, g, "S=1/2", bond_dimension=chi
    )
    psi = tnqs.normalize(psi, alg="bp")
    _, state = batched_from_tns(psi, chi=chi, spec=spec)

    gate2 = np.asarray(gate_matrix("Rzz", 0.3)).reshape(2, 2, 2, 2)
    gate1 = np.asarray(gate_matrix("Rx", 0.7))
    tol = 1e-10
    ref_state, _ = _unsharded_layer(spec, state, gate2, gate1, chi, 1e-12, tol)

    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    layer = make_sharded_layer(
        sspec, mesh, gate2, gate1, chi, cutoff=1e-12,
        bp_tolerance=tol, one_site_first=True,
    )
    sh = NamedSharding(mesh, P("v"))
    sharded_state = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    out_state, _ = layer(sharded_state)
    np.testing.assert_allclose(
        np.asarray(out_state.tensors), np.asarray(ref_state.tensors),
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(out_state.messages), np.asarray(ref_state.messages),
        atol=1e-9,
    )


def test_sharded_layer_heavyhex_chi16():
    """Bench-relevant bond dimension through the SPMD layer (VERDICT r4
    weak #5: all sharded evidence was chi=2-4 toy scale).  Same heavy-hex
    pipeline as above at chi=16 — the shard_map program must stay
    equivalent when the per-vertex rows are MXU-sized, not just at the
    tiny shapes where an accidental gather hides inside tolerances."""
    from tensornetworkquantumsimulator_tpu import heavy_hexagonal_lattice
    from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
    from tensornetworkquantumsimulator_tpu.parallel.engine import (
        local_expectations,
    )
    from tensornetworkquantumsimulator_tpu.parallel.sharded_layer import (
        make_sharded_site_expectations,
    )

    g = heavy_hexagonal_lattice(3, 3)
    chi, S = 16, 4
    sspec = shard_spec(g, S)
    spec = sspec.spec

    psi = random_tensornetworkstate(
        jnp.complex128, g, "S=1/2", bond_dimension=chi
    )
    psi = tnqs.normalize(psi, alg="bp")
    _, state = batched_from_tns(psi, chi=chi, spec=spec)

    gate2 = np.asarray(gate_matrix("Rzz", 0.3)).reshape(2, 2, 2, 2)
    gate1 = np.asarray(gate_matrix("Rx", 0.7))
    tol = 1e-10
    ref_state, _ = _unsharded_layer(spec, state, gate2, gate1, chi, 1e-12, tol)

    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    layer = make_sharded_layer(
        sspec, mesh, gate2, gate1, chi, cutoff=1e-12,
        bp_tolerance=tol, one_site_first=True,
    )
    sh = NamedSharding(mesh, P("v"))
    sharded_state = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    out_state, _ = layer(sharded_state)
    np.testing.assert_allclose(
        np.asarray(out_state.tensors), np.asarray(ref_state.tensors),
        atol=1e-8,
    )
    z = np.asarray(op_matrix("Z", 2))
    got = np.asarray(make_sharded_site_expectations(sspec, mesh, z)(out_state))
    ref = np.asarray(local_expectations(spec, ref_state, jnp.asarray(z)))
    np.testing.assert_allclose(got, ref, atol=1e-8)


def test_sharded_layer_eagle127_chi16():
    """Eagle-127 at chi=16 over 8 shards (pad=True): the flagship lattice
    at a bench-relevant bond dimension (VERDICT r4 weak #5)."""
    from tensornetworkquantumsimulator_tpu.utils.lattices import (
        ibm_eagle_lattice,
    )

    g = ibm_eagle_lattice()
    chi, S = 16, 8
    sspec = shard_spec(g, S, pad=True)
    spec = sspec.spec

    psi = random_tensornetworkstate(
        jnp.complex128, g, "S=1/2", bond_dimension=chi
    )
    psi = tnqs.normalize(psi, alg="bp")
    _, state = batched_from_tns(psi, chi=chi, spec=spec)

    gate2 = np.asarray(gate_matrix("Rzz", 0.3)).reshape(2, 2, 2, 2)
    gate1 = np.asarray(gate_matrix("Rx", 0.7))
    tol = 1e-10
    ref_state, _ = _unsharded_layer(spec, state, gate2, gate1, chi, 1e-12, tol)

    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    layer = make_sharded_layer(
        sspec, mesh, gate2, gate1, chi, cutoff=1e-12,
        bp_tolerance=tol, one_site_first=True,
    )
    sh = NamedSharding(mesh, P("v"))
    sharded_state = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    out_state, _ = layer(sharded_state)
    np.testing.assert_allclose(
        np.asarray(out_state.tensors), np.asarray(ref_state.tensors),
        atol=1e-8,
    )


def test_sharded_bp_measurement_matches_unsharded():
    """Sharded site/bond expectations (BP alg) == single-device engine —
    the state is measured WITHOUT gathering (round-2 VERDICT missing 1)."""
    from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
    from tensornetworkquantumsimulator_tpu.parallel.engine import (
        bond_expectations,
        local_expectations,
    )
    from tensornetworkquantumsimulator_tpu.parallel.sharded_layer import (
        make_sharded_bond_expectations,
        make_sharded_site_expectations,
    )

    nx, ny, chi = 8, 4, 3
    S = 8
    g = named_grid((nx, ny), periodic=True)  # wrap edges ride the ring
    sspec = shard_spec(g, S)
    spec = sspec.spec

    psi = random_tensornetworkstate(
        jnp.complex128, g, "S=1/2", bond_dimension=chi
    )
    psi = tnqs.normalize(psi, alg="bp")
    _, state = batched_from_tns(psi, chi=chi, spec=spec)
    state = bp_update(spec, state, maxiter=40, tolerance=1e-10)

    z = np.asarray(op_matrix("Z", 2))
    x = np.asarray(op_matrix("X", 2))
    ref_site = np.asarray(local_expectations(spec, state, jnp.asarray(z)))
    ref_bond = np.asarray(
        bond_expectations(spec, state, jnp.asarray(z), jnp.asarray(x))
    )

    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    sh = NamedSharding(mesh, P("v"))
    sharded = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    site_fn = make_sharded_site_expectations(sspec, mesh, z)
    bond_fn = make_sharded_bond_expectations(sspec, mesh, z, x)

    np.testing.assert_allclose(
        np.asarray(site_fn(sharded)), ref_site, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(bond_fn(sharded)), ref_bond, atol=1e-11
    )


def test_sharded_gauge_matches_batched():
    """Sharded Vidal gauge == single-device batched_symmetric_gauge
    (tensors, messages, and edge spectra in spec.edges order)."""
    from tensornetworkquantumsimulator_tpu.parallel.gauge import (
        batched_symmetric_gauge,
    )
    from tensornetworkquantumsimulator_tpu.parallel.sharded_layer import (
        make_sharded_gauge,
    )

    nx, ny, chi = 8, 4, 3
    S = 8
    g = named_grid((nx, ny), periodic=True)
    sspec = shard_spec(g, S)
    spec = sspec.spec

    psi = random_tensornetworkstate(
        jnp.complex128, g, "S=1/2", bond_dimension=chi
    )
    psi = tnqs.normalize(psi, alg="bp")
    _, state = batched_from_tns(psi, chi=chi, spec=spec)
    state = bp_update(spec, state, maxiter=60, tolerance=1e-12)

    ref_state, ref_ss = batched_symmetric_gauge(spec, state)

    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    sh = NamedSharding(mesh, P("v"))
    sharded = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    gauge_fn = make_sharded_gauge(sspec, mesh)
    out_state, out_ss = gauge_fn(sharded)

    np.testing.assert_allclose(
        np.asarray(out_ss), np.asarray(ref_ss), atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(out_state.tensors), np.asarray(ref_state.tensors),
        atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(out_state.messages), np.asarray(ref_state.messages),
        atol=1e-10,
    )


def test_sharded_truncate_matches_batched():
    """Sharded truncation (identity-gate layer) == batched_truncate."""
    from tensornetworkquantumsimulator_tpu.parallel.sharded_layer import (
        make_sharded_truncate,
    )
    from tensornetworkquantumsimulator_tpu.parallel.truncate import (
        batched_truncate,
    )

    nx, ny, chi = 8, 4, 3
    S = 4
    g = named_grid((nx, ny))
    sspec = shard_spec(g, S)
    spec = sspec.spec

    psi = random_tensornetworkstate(
        jnp.complex128, g, "S=1/2", bond_dimension=chi
    )
    psi = tnqs.normalize(psi, alg="bp")
    _, state = batched_from_tns(psi, chi=chi, spec=spec)

    tol = 1e-10
    ref_state, ref_errs = batched_truncate(
        spec, state, chi=chi, cutoff=1e-8, bp_maxiter=30, bp_tolerance=tol
    )

    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    sh = NamedSharding(mesh, P("v"))
    sharded = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    trunc = make_sharded_truncate(
        sspec, mesh, chi=chi, cutoff=1e-8, bp_maxiter=30, bp_tolerance=tol
    )
    out_state, out_errs = trunc(sharded)

    np.testing.assert_allclose(
        np.asarray(out_state.tensors), np.asarray(ref_state.tensors),
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(out_errs)[np.asarray(out_errs) > 1e-14]),
        np.sort(np.asarray(ref_errs)[np.asarray(ref_errs) > 1e-14]),
        rtol=1e-6,
    )


def test_sharded_gauge_and_measurement_heavyhex():
    """Degree-3 heavy-hex through the sharded gauge + BP measurement
    (none of the new sharded ops are grid-only)."""
    from tensornetworkquantumsimulator_tpu import heavy_hexagonal_lattice
    from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
    from tensornetworkquantumsimulator_tpu.parallel.engine import (
        bond_expectations,
        local_expectations,
    )
    from tensornetworkquantumsimulator_tpu.parallel.gauge import (
        batched_symmetric_gauge,
    )
    from tensornetworkquantumsimulator_tpu.parallel.sharded_layer import (
        make_sharded_bond_expectations,
        make_sharded_gauge,
        make_sharded_site_expectations,
    )

    g = heavy_hexagonal_lattice(3, 3)  # V=68 = 4x17
    chi, S = 2, 4
    sspec = shard_spec(g, S)
    spec = sspec.spec

    psi = random_tensornetworkstate(
        jnp.complex128, g, "S=1/2", bond_dimension=chi
    )
    psi = tnqs.normalize(psi, alg="bp")
    _, state = batched_from_tns(psi, chi=chi, spec=spec)
    state = bp_update(spec, state, maxiter=60, tolerance=1e-12)

    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    sh = NamedSharding(mesh, P("v"))
    sharded = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )

    z = np.asarray(op_matrix("Z", 2))
    ref_site = np.asarray(local_expectations(spec, state, jnp.asarray(z)))
    ref_bond = np.asarray(
        bond_expectations(spec, state, jnp.asarray(z), jnp.asarray(z))
    )
    site_fn = make_sharded_site_expectations(sspec, mesh, z)
    bond_fn = make_sharded_bond_expectations(sspec, mesh, z, z)
    np.testing.assert_allclose(
        np.asarray(site_fn(sharded)), ref_site, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(bond_fn(sharded)), ref_bond, atol=1e-11
    )

    ref_state, ref_ss = batched_symmetric_gauge(spec, state)
    out_state, out_ss = make_sharded_gauge(sspec, mesh)(sharded)
    np.testing.assert_allclose(
        np.asarray(out_ss), np.asarray(ref_ss), atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(out_state.tensors), np.asarray(ref_state.tensors),
        atol=1e-10,
    )


def test_sharded_rdms_match_unsharded_and_generic():
    """Sharded 1-site/2-site RDMs == batched engine == generic bp RDM —
    the full measurement set runs on the sharded state without gathering."""
    from tensornetworkquantumsimulator_tpu.parallel.engine import (
        bond_rdms,
        local_rdms,
    )
    from tensornetworkquantumsimulator_tpu.parallel.sharded_layer import (
        make_sharded_bond_rdms,
        make_sharded_site_rdms,
    )

    nx, ny, chi = 8, 4, 3
    S = 8
    g = named_grid((nx, ny), periodic=True)
    sspec = shard_spec(g, S)
    spec = sspec.spec

    psi = random_tensornetworkstate(
        jnp.complex128, g, "S=1/2", bond_dimension=chi
    )
    psi = tnqs.normalize(psi, alg="bp")
    _, state = batched_from_tns(psi, chi=chi, spec=spec)
    state = bp_update(spec, state, maxiter=40, tolerance=1e-10)

    rho1 = np.asarray(local_rdms(spec, state))
    rho1 = rho1 / np.trace(rho1, axis1=1, axis2=2)[:, None, None]
    rho2 = np.asarray(bond_rdms(spec, state))

    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    sh = NamedSharding(mesh, P("v"))
    sharded = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    np.testing.assert_allclose(
        np.asarray(make_sharded_site_rdms(sspec, mesh)(sharded)), rho1,
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(make_sharded_bond_rdms(sspec, mesh)(sharded)), rho2,
        atol=1e-12,
    )

    # cross-check a couple of edges against the generic-engine bp RDM
    # (named-index oracle, `rdm.jl:49-70`)
    for (iu, iv, _su, _sv) in [spec.edges[0], spec.edges[-1]]:
        u, v = spec.vertices[iu], spec.vertices[iv]
        rho_gen = tnqs.reduced_density_matrix(
            psi, [u, v], alg="bp",
            cache_update_kwargs=dict(maxiter=80, tolerance=1e-12),
        )
        su_, sv_ = psi.siteinds()[u][0], psi.siteinds()[v][0]
        arr = np.asarray(
            rho_gen.array((su_, su_.prime(), sv_, sv_.prime()))
        )
        pos = [p for p, e in enumerate(spec.edges)
               if (e[0], e[1]) == (iu, iv)][0]
        # flooding vs forest-schedule BP approach the same fixed point from
        # different schedules; ~1e-7 entrywise agreement is the convergence
        # level, not roundoff
        np.testing.assert_allclose(rho2[pos], arr, atol=1e-6)


def test_sharded_layer_eagle127_chi4():
    """Flagship Eagle-127 lattice through shard_spec(pad=True) /
    make_sharded_layer at chi=4 on 8 shards (VERDICT r3 item 5: the pod
    story proven on the flagship lattice, not just heavy-hex(3,3)).
    V=127 pads to 128 = 8x16 with one inert row; the sharded evolve +
    measure pipeline matches the single-device engine."""
    from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
    from tensornetworkquantumsimulator_tpu.parallel.engine import (
        local_expectations,
    )
    from tensornetworkquantumsimulator_tpu.parallel.sharded_layer import (
        make_sharded_site_expectations,
    )
    from tensornetworkquantumsimulator_tpu.utils.lattices import (
        ibm_eagle_lattice,
    )

    g = ibm_eagle_lattice()
    chi, S = 4, 8
    sspec = shard_spec(g, S, pad=True)
    spec = sspec.spec
    assert spec.num_vertices == 128  # one pad row

    psi = random_tensornetworkstate(
        jnp.complex128, g, "S=1/2", bond_dimension=chi
    )
    psi = tnqs.normalize(psi, alg="bp")
    _, state = batched_from_tns(psi, chi=chi, spec=spec)

    gate2 = np.asarray(gate_matrix("Rzz", 0.3)).reshape(2, 2, 2, 2)
    gate1 = np.asarray(gate_matrix("Rx", 0.7))
    tol = 1e-10
    ref_state, _ = _unsharded_layer(spec, state, gate2, gate1, chi, 1e-12, tol)

    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    layer = make_sharded_layer(
        sspec, mesh, gate2, gate1, chi, cutoff=1e-12,
        bp_tolerance=tol, one_site_first=True,
    )
    sh = NamedSharding(mesh, P("v"))
    sharded_state = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    out_state, _ = layer(sharded_state)
    np.testing.assert_allclose(
        np.asarray(out_state.tensors), np.asarray(ref_state.tensors),
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(out_state.messages), np.asarray(ref_state.messages),
        atol=1e-9,
    )

    # sharded measurement on the evolved state (pad row's <Z> is ignored)
    z = np.asarray(op_matrix("Z", 2))
    site_fn = make_sharded_site_expectations(sspec, mesh, z)
    got = np.asarray(site_fn(out_state))
    ref = np.asarray(local_expectations(spec, ref_state, jnp.asarray(z)))
    real = [i for i, v in enumerate(spec.vertices) if g.has_vertex(v)]
    np.testing.assert_allclose(got[real], ref[real], atol=1e-9)


def test_sharded_2d_measurement_and_gauge_match_unsharded():
    """2-D block mesh beyond the layer (VERDICT r3 item 7): site/bond
    expectations and the Vidal gauge on Sharded2DSpec match the
    single-device engine on a 4x4 grid over a 2x2 mesh (cross-block
    edges along both axes)."""
    from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
    from tensornetworkquantumsimulator_tpu.parallel.engine import (
        bond_expectations,
        local_expectations,
    )
    from tensornetworkquantumsimulator_tpu.parallel.gauge import (
        batched_symmetric_gauge,
    )
    from tensornetworkquantumsimulator_tpu.parallel.sharding2d import (
        make_sharded_bond_expectations_2d,
        make_sharded_gauge_2d,
        make_sharded_site_expectations_2d,
        shard2d_spec,
    )

    sx, sy, chi = 2, 2, 3
    g = named_grid((4, 4))
    sspec = shard2d_spec(g, sx, sy)
    spec = sspec.spec

    psi = random_tensornetworkstate(
        jnp.complex128, g, "S=1/2", bond_dimension=chi
    )
    psi = tnqs.normalize(psi, alg="bp")
    _, state = batched_from_tns(psi, chi=chi, spec=spec)
    state = bp_update(spec, state, maxiter=40, tolerance=1e-10)

    mesh = Mesh(np.array(jax.devices()[: sx * sy]).reshape(sx, sy),
                ("x", "y"))
    sh = NamedSharding(mesh, P(("x", "y")))
    sharded = BatchedState(
        jax.device_put(state.tensors, sh),
        jax.device_put(state.messages, sh),
    )

    z = np.asarray(op_matrix("Z", 2))
    x = np.asarray(op_matrix("X", 2))

    site_fn = make_sharded_site_expectations_2d(sspec, mesh)
    np.testing.assert_allclose(
        np.asarray(site_fn(sharded, jnp.asarray(z))),
        np.asarray(local_expectations(spec, state, jnp.asarray(z))),
        atol=1e-11,
    )

    bond_fn = make_sharded_bond_expectations_2d(sspec, mesh, z, x)
    np.testing.assert_allclose(
        np.asarray(bond_fn(sharded)),
        np.asarray(
            bond_expectations(spec, state, jnp.asarray(z), jnp.asarray(x))
        ),
        atol=1e-11,
    )

    gauge_fn = make_sharded_gauge_2d(sspec, mesh)
    got_state, got_spectra = gauge_fn(sharded)
    ref_state, ref_spectra = batched_symmetric_gauge(spec, state)
    np.testing.assert_allclose(
        np.asarray(got_spectra), np.asarray(ref_spectra), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(got_state.tensors), np.asarray(ref_state.tensors),
        atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(got_state.messages), np.asarray(ref_state.messages),
        atol=1e-10,
    )
