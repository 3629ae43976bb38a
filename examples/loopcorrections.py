"""Loop-corrected norms vs BP vs exact (mirrors `examples/loopcorrections.jl`)."""

import jax.numpy as jnp

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    named_grid,
    named_hexagonal_lattice_graph,
    random_tensornetworkstate,
)


def main():
    chi = 3
    tnqs.seed(1634)
    graphs = [
        (named_grid((4, 1)), "line", 0),
        (named_hexagonal_lattice_graph(2, 2), "hexagonal", 6),
        (named_grid((4, 4)), "square", 4),
    ]
    for g, name, girth in graphs:
        print(f"Testing {name} lattice with {g.nv()} vertices")
        psi = random_tensornetworkstate(jnp.complex64, g, "S=1/2", bond_dimension=chi)
        psi = tnqs.normalize(psi, alg="bp")
        n_bp = tnqs.norm(psi, alg="bp")
        n_lc = tnqs.norm(
            psi, alg="loopcorrections",
            max_configuration_size=max(2 * girth - 1, 0),
        )
        n_exact = tnqs.norm(psi, alg="exact")
        print(f"  BP norm:             {n_bp}")
        print(f"  Loop-corrected norm: {n_lc}")
        print(f"  Exact norm:          {n_exact}")


if __name__ == "__main__":
    main()
