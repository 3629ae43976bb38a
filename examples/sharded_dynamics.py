"""Pod-scale SPMD demo: the full op pipeline on a device-sharded state.

Kicked-Ising dynamics on an 8x4 grid with the vertex axis sharded over
every available device (`jax.sharding.Mesh`): evolve (halo-exchange
Trotter layers), gauge (sharded Vidal gauge -> entanglement spectra),
truncate, and measure (sharded BP site/bond expectations + sharded
boundary-MPS norm) — the state is never gathered to one chip.

No reference counterpart (`/root/reference` has no multi-device code);
this is the TPU-native pod story of SURVEY §2's "must introduce" items.
Run on a CPU host it uses 8 virtual devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/sharded_dynamics.py
"""

import os

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensornetworkquantumsimulator_tpu import named_grid
from tensornetworkquantumsimulator_tpu.models.gates import gate_matrix
from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
from tensornetworkquantumsimulator_tpu.parallel import (
    BatchedState,
    batched_product_state,
    make_sharded_bond_expectations,
    make_sharded_gauge,
    make_sharded_layer,
    make_sharded_site_expectations,
    make_sharded_truncate,
    shard_spec,
)
from tensornetworkquantumsimulator_tpu.parallel.sharded_bmps import (
    make_sharded_grid_bmps,
)


def main(n_layers=10, chi=4):
    devices = np.array(jax.devices())
    S = len(devices)
    nx, ny = S, 4
    g = named_grid((nx, ny))
    sspec = shard_spec(g, S)
    spec = sspec.spec
    mesh = Mesh(devices, ("v",))
    sh = NamedSharding(mesh, P("v"))

    print(f"{nx}x{ny} grid over {S} devices ({jax.default_backend()})")

    _, state = batched_product_state(g, chi=chi, spec=spec)
    state = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )

    dt, hx, J = 0.25, 1.0, 0.5
    gate2 = np.asarray(gate_matrix("Rzz", 2 * J * dt)).reshape(2, 2, 2, 2)
    gate1 = np.asarray(gate_matrix("Rx", 2 * hx * dt))
    layer = make_sharded_layer(
        sspec, mesh, gate2, gate1, chi=chi, cutoff=1e-12, bp_maxiter=25
    )
    z = np.asarray(op_matrix("Z", 2))
    site_fn = make_sharded_site_expectations(sspec, mesh, z)
    bond_fn = make_sharded_bond_expectations(sspec, mesh, z, z)

    for l in range(n_layers):
        state, errs = layer(state)
        zs = np.asarray(site_fn(state)).real
        print(f"layer {l + 1:2d}: max trunc err {float(np.max(np.asarray(errs))):.3e}"
              f"  <Z>center {zs[spec.vertex_position((nx // 2, ny // 2))]:+.6f}")

    zz = np.asarray(bond_fn(state)).real
    print(f"<ZZ> over {len(spec.edges)} edges: mean {zz.mean():+.6f}")

    gauge_fn = make_sharded_gauge(sspec, mesh)
    state_g, spectra = gauge_fn(state)
    ent = np.asarray(spectra)
    ent = ent / ent.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        sv = -np.nansum(np.where(ent > 0, ent * np.log(ent), 0.0), axis=1)
    print(f"entanglement entropy across edges: max {sv.max():.4f}")

    trunc = make_sharded_truncate(sspec, mesh, chi=chi, cutoff=1e-8)
    state_t, terrs = trunc(state_g)
    print(f"truncate: max err {float(np.max(np.asarray(terrs))):.3e}")

    norm_fn, _ = make_sharded_grid_bmps(
        spec, nx, ny, Mesh(devices, ("r",)), kmps=4, niters=3
    )
    lz, _ = norm_fn(state_t.tensors)
    print(f"sharded boundary-MPS log|Z| (unnormalized): "
          f"{float(np.asarray(lz).real):.6f}")

    from tensornetworkquantumsimulator_tpu.parallel import (
        make_sharded_loopcorrections,
    )

    zlc_fn = make_sharded_loopcorrections(
        sspec, mesh, g, max_configuration_size=4
    )
    # max size 3 admits no cycle, so that run returns plain Z_BP; the
    # ratio is the plaquette-series correction factor 1 + Σ_configs Π w
    zbp_fn = make_sharded_loopcorrections(
        sspec, mesh, g, max_configuration_size=3
    )
    zlc = complex(np.asarray(zlc_fn(state_t)))
    zbp = complex(np.asarray(zbp_fn(state_t)))
    print(f"sharded loop correction factor Z_lc/Z_BP (plaquette series): "
          f"{zlc / zbp:+.8f}")

    # the flagship Eagle-127 lattice through the same pipeline: V=127
    # does not divide the device count, so shard_spec(pad=True) appends
    # one inert product row (V -> 128 = S x 16) — evolve + measure at
    # chi=4 with the state never gathered
    from tensornetworkquantumsimulator_tpu.utils.lattices import (
        ibm_eagle_lattice,
    )

    g_eg = ibm_eagle_lattice()
    sspec_eg = shard_spec(g_eg, S, pad=True)
    print(f"\nEagle-127 over {S} devices "
          f"(padded to V={sspec_eg.spec.num_vertices})")
    _, st_eg = batched_product_state(g_eg, chi=4, spec=sspec_eg.spec)
    st_eg = BatchedState(
        jax.device_put(st_eg.tensors, sh),
        jax.device_put(st_eg.messages, sh),
    )
    layer_eg = make_sharded_layer(
        sspec_eg, mesh,
        np.asarray(gate_matrix("Rzz", 2 * (3.14159 / 4))).reshape(2, 2, 2, 2),
        np.asarray(gate_matrix("Rx", 0.4)),
        chi=4, cutoff=1e-12, bp_maxiter=25,
    )
    site_eg = make_sharded_site_expectations(sspec_eg, mesh, z)
    for l in range(3):
        st_eg, errs_eg = layer_eg(st_eg)
    zs_eg = np.asarray(site_eg(st_eg)).real
    real_rows = [
        i for i, v in enumerate(sspec_eg.spec.vertices) if g_eg.has_vertex(v)
    ]
    print(f"kicked-Ising <Z> after 3 layers: mean over 127 qubits "
          f"{zs_eg[real_rows].mean():+.6f}")


if __name__ == "__main__":
    main()
