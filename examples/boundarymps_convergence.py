"""Boundary-MPS convergence sweep (mirrors `examples/boundarymps.jl`):
⟨Z⟩ / ⟨ZZ⟩ at increasing MPS rank vs the exact value."""

import jax.numpy as jnp

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    named_grid,
    named_hexagonal_lattice_graph,
    random_tensornetworkstate,
)


def main():
    nx, ny, chi = 5, 5, 2
    tnqs.seed(1634)
    graphs = [
        (named_grid((nx, 1)), "line"),
        (named_hexagonal_lattice_graph(nx - 2, ny - 2), "hexagonal"),
        (named_grid((nx, ny)), "square"),
    ]
    for g, name in graphs:
        print(f"Testing {name} lattice with {g.nv()} vertices")
        psi = random_tensornetworkstate(jnp.complex64, g, "S=1/2", bond_dimension=chi)
        v_centre = g.center()[0]

        sz_bp = tnqs.expect(psi, ("Z", v_centre), alg="bp")
        print(f"  BP value for Z: {sz_bp}")
        for rank in [1, 2, 4, 8, 16]:
            sz = tnqs.expect(
                psi, ("Z", v_centre), alg="boundarymps", mps_bond_dimension=rank
            )
            print(f"  Boundary MPS Z at rank {rank}: {sz}")
        sz_exact = tnqs.expect(psi, ("Z", v_centre), alg="exact")
        print(f"  Exact value for Z: {sz_exact}")

        if not g.is_tree():
            v_n = g.neighbors(v_centre)[0]
            zz_exact = tnqs.expect(psi, ("ZZ", [v_centre, v_n]), alg="exact")
            zz_bmps = tnqs.expect(
                psi, ("ZZ", [v_centre, v_n]), alg="boundarymps",
                mps_bond_dimension=16,
            )
            print(f"  Exact ZZ: {zz_exact}  BMPS ZZ: {zz_bmps}")


if __name__ == "__main__":
    main()
