"""Gradient-based variational ground state (parallel/variational.py).

Oracle: exact diagonalization.  On a tree (path graph) BP environments are
exact, so direct energy minimization must reach the true ground energy at
sufficient chi; on a loopy graph the BP energy is approximate but the
optimizer must still converge to within the known BP-environment accuracy.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tensornetworkquantumsimulator_tpu.parallel import (
    batched_product_state,
    ground_state,
    tfim_hamiltonian,
)
from tensornetworkquantumsimulator_tpu.utils import named_grid


def _exact_ground_energy(spec, J, hx):
    """Dense TFIM ground energy on the spec's graph (d=2)."""
    from dense_oracle import exact_tfim_levels

    return float(exact_tfim_levels(spec, J, hx, 1)[0])


def _noised(spec, state, eps, seed):
    """Symmetry-breaking noise restricted to the valid block: dummy slots
    keep bond dimension 1 (noise beyond index 0 there would purify the
    state into a mixture through the identity messages)."""
    rng = np.random.default_rng(seed)
    t = np.asarray(state.tensors)
    noise = rng.normal(size=t.shape)
    if np.iscomplexobj(t):
        noise = noise + 1j * rng.normal(size=t.shape)
    mask = np.asarray(spec.mask_array())  # [V, D]
    for k in range(spec.degree):
        idx = [slice(None)] * t.ndim
        idx[1 + k] = slice(1, None)
        noise[tuple(idx)] *= mask[:, k][
            (slice(None),) + (None,) * (t.ndim - 1)
        ]
    return state._replace(tensors=jnp.asarray((t + eps * noise).astype(t.dtype)))


def test_ground_state_exact_on_tree():
    g = named_grid((4, 1))  # path graph: BP exact, chi=4 exact at N=4
    spec, state = batched_product_state(g, chi=4, dtype=np.float64)
    state = _noised(spec, state, 0.1, seed=0)
    ham = tfim_hamiltonian(J=1.0, hx=2.0)
    state, energies = ground_state(
        spec, state, ham, steps=800, learning_rate=3e-2,
        bp_sweeps_per_eval=10,
    )
    e0 = _exact_ground_energy(spec, J=1.0, hx=2.0)
    e_final = float(energies[-1])
    assert np.all(np.isfinite(np.asarray(energies)))
    assert abs(e_final - e0) / abs(e0) < 2e-3
    # the trajectory is a descent (allowing early adam transients)
    assert e_final < float(energies[0])


def test_ground_state_complex_loopy():
    g = named_grid((2, 2))  # single plaquette: loopy, BP approximate
    spec, state = batched_product_state(g, chi=2, dtype=np.complex64)
    state = _noised(spec, state, 0.1, seed=1)
    ham = tfim_hamiltonian(J=1.0, hx=3.0)
    state, energies = ground_state(
        spec, state, ham, steps=400, learning_rate=3e-2,
        bp_sweeps_per_eval=12, damping=0.1,
    )
    e0 = _exact_ground_energy(spec, J=1.0, hx=3.0)
    e_final = float(energies[-1])
    assert np.all(np.isfinite(np.asarray(energies)))
    # BP-environment accuracy on a 4-cycle at hx=3 is percent-level
    assert abs(e_final - e0) / abs(e0) < 0.05
    assert e_final < float(energies[0])


def test_ensemble_ground_state_matches_single_runs():
    """E disorder realizations (different hx per site) optimized in one
    vmapped program == per-realization ground_state runs."""
    from tensornetworkquantumsimulator_tpu.parallel import (
        Hamiltonian,
        ensemble_ground_state,
    )
    from tensornetworkquantumsimulator_tpu.parallel.ensemble import (
        stack_states,
    )

    g = named_grid((3, 1))  # path: BP exact
    spec, s0 = batched_product_state(g, chi=2, dtype=np.float64)
    s0 = _noised(spec, s0, 0.1, seed=2)
    E, V = 2, spec.num_vertices
    rng = np.random.default_rng(5)
    hx = rng.uniform(1.5, 3.0, (E, V))
    X = np.array([[0.0, 1.0], [1.0, 0.0]])
    Z = np.array([[1.0, 0.0], [0.0, -1.0]])
    ham = Hamiltonian(site_terms=((X, -hx),), bond_terms=((Z, Z, -1.0),))
    kw = dict(steps=120, learning_rate=5e-2, bp_sweeps_per_eval=10)

    estate, energies = ensemble_ground_state(
        spec, stack_states([s0] * E), ham, **kw
    )
    assert energies.shape == (E, 120)

    for i in range(E):
        ham_i = Hamiltonian(
            site_terms=((X, -hx[i]),), bond_terms=((Z, Z, -1.0),)
        )
        _, en_i = ground_state(spec, s0, ham_i, **kw)
        # vmap/XLA may reorder reductions and adam amplifies ULP-level
        # differences over the trajectory — compare loosely, not bitwise
        np.testing.assert_allclose(
            np.asarray(energies[i]), np.asarray(en_i), atol=1e-6
        )

    # different disorder → different energies
    assert abs(float(energies[0, -1]) - float(energies[1, -1])) > 1e-3


def test_ensemble_ground_state_shared_and_ambiguous_coeffs():
    """Shared non-uniform coefficient arrays tile across the ensemble;
    the genuinely ambiguous shape (1-D length E == per-term size) raises."""
    from tensornetworkquantumsimulator_tpu.parallel import (
        Hamiltonian,
        ensemble_ground_state,
    )
    from tensornetworkquantumsimulator_tpu.parallel.ensemble import (
        stack_states,
    )

    g = named_grid((3, 1))
    spec, s0 = batched_product_state(g, chi=2, dtype=np.float64)
    s0 = _noised(spec, s0, 0.1, seed=4)
    X = np.array([[0.0, 1.0], [1.0, 0.0]])
    Z = np.array([[1.0, 0.0], [0.0, -1.0]])
    kw = dict(steps=40, learning_rate=5e-2, bp_sweeps_per_eval=8)

    # shared per-site field [V] with E=2 != V=3: tiled, equals explicit
    hx = np.array([1.5, 2.0, 2.5])
    ham_shared = Hamiltonian(((X, -hx),), ((Z, Z, -1.0),))
    ham_explicit = Hamiltonian(
        ((X, -np.broadcast_to(hx, (2, 3)).copy()),), ((Z, Z, -1.0),)
    )
    est = stack_states([s0] * 2)
    _, en_s = ensemble_ground_state(spec, est, ham_shared, **kw)
    _, en_e = ensemble_ground_state(spec, est, ham_explicit, **kw)
    np.testing.assert_allclose(np.asarray(en_s), np.asarray(en_e))

    # ambiguous: E == V == 3 with a 1-D length-3 coefficient
    est3 = stack_states([s0] * 3)
    ham_amb = Hamiltonian(((X, -hx),), ((Z, Z, -1.0),))
    with pytest.raises(ValueError, match="ambiguous"):
        ensemble_ground_state(spec, est3, ham_amb, **kw)


def test_excited_state_overlap_penalty():
    """Penalty-orthogonalized descent finds the first excited level.

    4-site path TFIM (a tree: BP environments and energies are EXACT, so
    the optimizer's target is faithful — on loopy graphs the BP energy
    functional itself is several % off at excited levels), chi=4 (full
    rank): ground_state -> E0, then excited_state penalized against it
    -> E1 from exact diagonalization; the converged penalty must
    vanish."""
    from tensornetworkquantumsimulator_tpu.parallel import (
        compile_graph,
        excited_state,
    )

    from tensornetworkquantumsimulator_tpu.utils.lattices import (
        named_path_graph,
    )

    g = named_path_graph(4)  # tree: BP environments exact, energy faithful
    J, hx = 1.0, 3.0
    ham = tfim_hamiltonian(J=J, hx=hx)
    spec, s0 = batched_product_state(g, chi=4, dtype=np.complex64)

    gs, energies = ground_state(
        spec, _noised(spec, s0, 0.3, seed=1), ham, steps=400,
        learning_rate=3e-2, bp_sweeps_per_eval=12,
    )
    # exact spectrum
    from dense_oracle import exact_tfim_levels

    w = exact_tfim_levels(spec, J, hx, 2)
    e0_exact, e1_exact = float(w[0]), float(w[1])
    assert abs(float(energies[-1]) - e0_exact) < 2e-2 * abs(e0_exact)

    ex, energies1, penalties = excited_state(
        spec, _noised(spec, s0, 0.3, seed=7), ham, below=[gs],
        weight=20.0, steps=800, learning_rate=2e-2, bp_sweeps_per_eval=12,
    )
    e1 = float(energies1[-1])
    assert float(penalties[-1]) < 1e-2  # orthogonal to the ground state
    assert abs(e1 - e1_exact) < 5e-2 * abs(e1_exact)
    # strictly above the ground level (not re-finding E0)
    assert e1 > e0_exact + 0.3 * (e1_exact - e0_exact)
