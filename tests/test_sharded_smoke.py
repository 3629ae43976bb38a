"""FAST-TIER sharded smoke + HLO collective-structure tests (VERDICT r4
items 5a/6).

Every other sharded test lives in the slow tier (conftest SLOW_FILES), so
the default `pytest -q` a builder runs between edits used to execute zero
shard_map/ppermute programs — a sharding regression surfaced only in the
30-min suite or the driver's dryrun.  This file keeps one small grid
equivalence in the fast tier AND asserts the *structure* of the sharded
programs' collectives by inspecting their optimized HLO: an accidental
all-gather that XLA sneaks into a sharded program is caught structurally,
not via tiny-case numerical tolerances (which a gather trivially passes).

Structural claims under test (parallel/sharded_layer.py design):
  - the full Trotter layer moves NO gathered state: zero all-gather /
    all-to-all / reduce-scatter; halo traffic only (collective-permute),
    every payload bounded by halo_rows x max per-vertex row bytes;
  - site expectations are fully collective-free (owner-computes);
  - bond expectations use at most one ppermute per cross-shard bucket.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensornetworkquantumsimulator_tpu import named_grid, random_tensornetworkstate
from tensornetworkquantumsimulator_tpu.models.gates import gate_matrix
from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
from tensornetworkquantumsimulator_tpu.parallel import (
    BatchedState,
    apply_color_group,
    apply_one_site,
    batched_from_tns,
    bp_update,
    local_expectations,
)
from tensornetworkquantumsimulator_tpu.parallel.sharded_layer import (
    make_sharded_bond_expectations,
    make_sharded_layer,
    make_sharded_site_expectations,
)
from tensornetworkquantumsimulator_tpu.parallel.sharding import shard_spec

S = 8
CHI = 2
COLLECTIVES = (
    "all-gather", "collective-permute", "all-reduce", "all-to-all",
    "reduce-scatter",
)


def _counts(txt: str) -> dict:
    """Occurrences of each collective op in optimized HLO text."""
    return {op: txt.count(op + "(") for op in COLLECTIVES}


def _ppermute_payload_bytes(txt: str) -> list:
    """Result-buffer bytes of every collective-permute in the program."""
    dt_bytes = {"c128": 16, "c64": 8, "f64": 8, "f32": 4, "s32": 4,
                "u32": 4, "s8": 1, "pred": 1}
    out = []
    for line in txt.splitlines():
        if "collective-permute(" not in line:
            continue
        m = re.search(r"= (\w+)\[([\d,]*)\]", line)
        assert m, f"unparseable ppermute line: {line[:120]}"
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        out.append(n * dt_bytes[m.group(1)])
    return out


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < S:
        pytest.skip(f"needs {S} virtual devices")
    g = named_grid((8, 2))
    sspec = shard_spec(g, S)
    spec = sspec.spec
    psi = random_tensornetworkstate(jnp.complex128, g, "S=1/2",
                                    bond_dimension=CHI)
    _, state = batched_from_tns(psi, chi=CHI, spec=spec)
    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    sh = NamedSharding(mesh, P("v"))
    sharded = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    return g, sspec, spec, state, mesh, sharded


@pytest.fixture(scope="module")
def layer_and_hlo(setup):
    _, sspec, _, _, mesh, sharded = setup
    gate2 = np.asarray(gate_matrix("Rzz", 0.35)).reshape(2, 2, 2, 2)
    gate1 = np.asarray(gate_matrix("Rx", 0.8))
    layer = make_sharded_layer(
        sspec, mesh, gate2, gate1, CHI, cutoff=1e-12, bp_tolerance=1e-10,
        one_site_first=True,
    )
    compiled = jax.jit(layer).lower(sharded).compile()
    return layer, gate2, gate1, compiled.as_text()


def test_sharded_layer_matches_unsharded_smoke(setup, layer_and_hlo):
    """One full sharded Trotter layer == the unsharded batched layer
    (the fast-tier canary; the 8x4 chi=3 version lives in the slow tier)."""
    _, _, spec, state, _, sharded = setup
    layer, gate2, gate1, _ = layer_and_hlo

    ref = apply_one_site(state, jnp.asarray(gate1))
    for group in spec.color_groups:
        ref = bp_update(spec, ref, maxiter=30, tolerance=1e-10)
        ref, _ = apply_color_group(
            ref, group, jnp.asarray(gate2), CHI, 1e-12, True
        )
    ref = bp_update(spec, ref, maxiter=30, tolerance=1e-10)

    out, _errs = layer(sharded)
    np.testing.assert_allclose(
        np.asarray(out.tensors), np.asarray(ref.tensors), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(out.messages), np.asarray(ref.messages), atol=1e-9
    )
    # and the sharded measurement agrees on the evolved state
    Z = np.asarray(op_matrix("Z", 2))
    ref_z = np.asarray(local_expectations(spec, ref, jnp.asarray(Z)))
    out_z = np.asarray(
        make_sharded_site_expectations(
            shard_spec(named_grid((8, 2)), S), Mesh(
                np.array(jax.devices()[:S]), ("v",)), Z)(out)
    )
    np.testing.assert_allclose(out_z, ref_z, atol=1e-9)


def test_layer_hlo_no_gathers_and_bounded_halo(setup, layer_and_hlo):
    """The layer's optimized HLO contains zero state-gathering
    collectives, and every collective-permute payload is halo-sized —
    at most halo rows of the largest per-vertex row — never a [Vl, ...]
    state buffer."""
    _, sspec, spec, state, _, _ = setup
    txt = layer_and_hlo[3]
    c = _counts(txt)
    assert c["all-gather"] == 0, c
    assert c["all-to-all"] == 0, c
    assert c["reduce-scatter"] == 0, c
    assert c["collective-permute"] > 0, "expected halo exchanges"
    # ceiling: 2 directions x halo exchange per BP stage (one per color
    # group + initial/final) x (messages + tensors + bookkeeping); the
    # 8x2 grid layer measured 36 — a doubling means a schedule regression
    assert c["collective-permute"] <= 48, c
    assert c["all-reduce"] <= 8, c  # scalar tolerances/diagnostics only

    V = state.tensors.shape[0]
    tensor_row = state.tensors.nbytes // V
    message_row = state.messages.nbytes // state.messages.shape[0]
    per_halo_bound = sspec.halo * max(tensor_row, message_row)
    payloads = _ppermute_payload_bytes(txt)
    assert payloads and max(payloads) <= per_halo_bound, (
        max(payloads), per_halo_bound,
    )


def test_site_expectations_hlo_collective_free(setup):
    """Owner-computes site expectations: zero collectives of any kind."""
    _, sspec, _, _, mesh, sharded = setup
    Z = np.asarray(op_matrix("Z", 2))
    fn = make_sharded_site_expectations(sspec, mesh, Z)
    txt = jax.jit(fn).lower(sharded).compile().as_text()
    assert _counts(txt) == {op: 0 for op in COLLECTIVES}


def test_bond_expectations_hlo_one_ppermute_per_bucket(setup):
    """Bond expectations: at most one ppermute per cross-shard color
    bucket (grid rung edges -> <= num color groups), no gathers."""
    _, sspec, spec, _, mesh, sharded = setup
    Z = np.asarray(op_matrix("Z", 2))
    fn = make_sharded_bond_expectations(sspec, mesh, Z, Z)
    txt = jax.jit(fn).lower(sharded).compile().as_text()
    c = _counts(txt)
    assert c["all-gather"] == 0 and c["all-to-all"] == 0, c
    assert c["collective-permute"] <= len(spec.color_groups), c
