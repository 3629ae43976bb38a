"""Examples as integration tests (reference `test/test_examples.jl`):
run each example entry point at reduced size."""

import importlib.util
import pathlib
import sys

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, EXAMPLES / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ising_2d_dynamics_small():
    _load("ising_2d_dynamics").main(nl=2, nx=4, ny=4, chi=3, mps_bond_dimension=3)


def test_ising_3d_dynamics_small():
    _load("ising_3d_dynamics").main(no_trotter_steps=1, chi=2)


def test_heavyhex_small():
    _load("heavyhex_ising_dynamics").main(
        hx=2, hy=2, no_trotter_steps=2, chi=3, nsamples=2
    )


def test_heisenberg_example_small():
    _load("ising_2d_heisenberg").main(no_trotter_steps=1, chi=3)


def test_loopcorrections_example():
    _load("loopcorrections").main()


@pytest.mark.slow
def test_boundarymps_example():
    _load("boundarymps_convergence").main()


def test_batched_gauge_loopcorrections_example():
    _load("batched_gauge_loopcorrections").main(nl=2, nx=3, ny=3, chi=3)


def test_sharded_dynamics_example():
    _load("sharded_dynamics").main(n_layers=2, chi=2)


def test_lindblad_example_small():
    rho = _load("lindblad_dynamics").main(nx=3, ny=3, t_final=0.3, dt=0.05)
    assert rho is not None


def test_noisy_circuit_example():
    rho = _load("noisy_circuit").main(nx=3, ny=3, layers=2)
    assert rho is not None


def test_variational_ground_state_example():
    e = _load("variational_ground_state").main(
        nx=2, ny=2, chi=2, steps=150, lr=5e-2
    )
    assert e < -10.0  # 2x2 TFIM hx=3: descent clearly underway


def test_disorder_ensemble_example():
    zbar = _load("disorder_ensemble").main(
        nx=3, ny=3, chi=2, n_layers=2, n_ensemble=3
    )
    assert zbar.shape == (2,) and 0.5 < zbar[-1] < zbar[0] <= 1.0


def test_correlation_functions_example():
    _load("correlation_functions").main(steps=2, chi=3)


def test_loschmidt_echo_example():
    _load("loschmidt_echo").main(steps=2, chi=3)


def test_excited_states_example():
    e0, e1, pen, levels = _load("excited_states").main(steps=120, chi=4)
    assert e0 < e1  # the penalty keeps the second run off the ground state
    assert pen < 0.3


def test_thermal_states_example():
    """3×3 TFIM cooled to β=0.4: energy must drop below the β=0 value (0)
    and the Rényi-2 entropy density below its β=0 maximum of 1."""
    import numpy as np

    from tensornetworkquantumsimulator_tpu import pauli_expectation, purity

    rho = _load("thermal_states").main(nx=3, ny=3, beta_max=0.4, dtau=0.05,
                                       chi=4)
    g = rho.graph()
    xs = np.real(pauli_expectation(rho, [("X", [v]) for v in g.vertices()]))
    zzs = np.real(pauli_expectation(
        rho, [("ZZ", [e.src, e.dst]) for e in g.edges()]
    ))
    energy = -np.sum(zzs) - np.sum(xs)
    assert energy < -1.0  # cooled below infinite temperature (E=0)
    s2_density = -np.log2(purity(rho)) / 9
    assert 0.0 < s2_density < 1.0  # mixed, but below the beta=0 maximum
