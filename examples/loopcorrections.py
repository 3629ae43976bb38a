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

    # loop-corrected OBSERVABLES, generic and jitted-batched: both
    # engines evaluate numerator and denominator series at the single
    # norm BP fixed point (op-anchored excitation configurations in the
    # numerator) — BP-error-controlled <Z> without a per-observable BP
    import numpy as np

    from tensornetworkquantumsimulator_tpu.engines.beliefpropagation import (
        BeliefPropagationCache,
    )
    from tensornetworkquantumsimulator_tpu.parallel import (
        make_loopcorrected_expectations,
    )
    from tensornetworkquantumsimulator_tpu.parallel.convert import (
        batched_from_tns,
    )

    g = named_grid((3, 3))
    psi = random_tensornetworkstate(jnp.complex64, g, "S=1/2", bond_dimension=2)
    psi = tnqs.normalize(psi, alg="bp")
    v = list(g.vertices())[4]
    obs = ("Z", [v])
    z_exact = complex(tnqs.expect(psi, obs, alg="exact"))
    z_bp = complex(tnqs.expect(psi, obs, alg="bp"))
    z_lc = complex(
        tnqs.expect(psi, obs, alg="loopcorrections", max_configuration_size=6)
    )
    cache = BeliefPropagationCache(psi).update(maxiter=100, tolerance=1e-7)
    spec, state = batched_from_tns(psi, chi=2, messages=cache.messages())
    fn = make_loopcorrected_expectations(
        spec, g, [obs], max_configuration_size=6
    )
    z_b = complex(np.asarray(fn(state))[0])
    print(f"center <Z> on 3x3: exact {z_exact.real:+.6f}  bp {z_bp.real:+.6f}"
          f"  loop-corrected {z_lc.real:+.6f}  batched {z_b.real:+.6f}")


if __name__ == "__main__":
    main()
