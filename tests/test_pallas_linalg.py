"""Single-kernel Pallas batched Jacobi eigh (interpret mode on CPU;
hardware numbers via scripts/microbench.py jeigh)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tensornetworkquantumsimulator_tpu.parallel.pallas_linalg import (
    default_sweeps,
    jacobi_eigh,
)


def _random_hermitian(rng, B, n, dtype=np.complex64):
    m = rng.standard_normal((B, n, n)) + 1j * rng.standard_normal((B, n, n))
    return ((m + np.conj(np.swapaxes(m, -1, -2))) / 2).astype(dtype)


def _check(a, w, v, tol):
    B, n, _ = a.shape
    w, v = np.asarray(w), np.asarray(v)
    # ascending eigenvalues matching jnp.linalg.eigh
    assert np.all(np.diff(w, axis=-1) >= -tol)
    w_ref = np.linalg.eigvalsh(a.astype(np.complex128))
    scale = np.abs(w_ref).max()
    assert np.max(np.abs(w - w_ref)) / scale < tol
    recon = np.einsum("bij,bj,bkj->bik", v, w.astype(v.dtype), np.conj(v))
    assert np.linalg.norm(recon - a) / np.linalg.norm(a) < tol
    gram = np.einsum("bji,bjk->bik", np.conj(v), v)
    assert np.abs(gram - np.eye(n)).max() < tol


@pytest.mark.parametrize("n", [10, 20, 32, 64])
def test_jacobi_eigh_matches_lapack(n):
    rng = np.random.default_rng(n)
    a = _random_hermitian(rng, 3, n)
    w, v = jacobi_eigh(jnp.asarray(a), interpret=True)
    _check(a, w, v, 2e-4)


def test_jacobi_eigh_rank_deficient_psd():
    """Gram-split / pseudo-root shapes: PSD with large null space."""
    rng = np.random.default_rng(7)
    n, r = 32, 5
    q = rng.standard_normal((4, n, r)) + 1j * rng.standard_normal((4, n, r))
    a = np.einsum("bik,bjk->bij", q, np.conj(q)).astype(np.complex64)
    w, v = jacobi_eigh(jnp.asarray(a), interpret=True)
    _check(a, w, v, 2e-4)


def test_jacobi_eigh_degenerate_and_diagonal():
    """Exactly degenerate spectra and already-diagonal input (all
    rotations identity) — the post-convergence noise regime that
    motivated the scaled-hypot/threshold guard."""
    n = 16
    a = np.stack(
        [
            np.diag(np.arange(n, dtype=np.float32)).astype(np.complex64),
            np.eye(n, dtype=np.complex64) * 2.5,
        ]
    )
    w, v = jacobi_eigh(jnp.asarray(a), interpret=True)
    _check(a, w, v, 1e-5)


def test_jacobi_eigh_odd_n_falls_back():
    rng = np.random.default_rng(9)
    a = _random_hermitian(rng, 2, 9)
    w, v = jacobi_eigh(jnp.asarray(a), interpret=True)
    _check(a, w, v, 1e-4)


def test_jacobi_eigh_blocking_and_padding():
    """Batch not a multiple of the lane block; explicit small block."""
    rng = np.random.default_rng(11)
    a = _random_hermitian(rng, 5, 10)
    w1, v1 = jacobi_eigh(jnp.asarray(a), block=2, interpret=True)
    w2, v2 = jacobi_eigh(jnp.asarray(a), interpret=True)
    _check(a, w1, v1, 1e-4)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)


def test_default_sweeps_monotone():
    assert default_sweeps(10) <= default_sweeps(32) <= default_sweeps(128)


def test_engine_layer_with_jacobi_eigh(monkeypatch):
    """Full batched Trotter layer with every eigh routed through the
    Pallas Jacobi kernel matches the default (QDWH) eigh path."""
    import jax.numpy as jnp

    from tensornetworkquantumsimulator_tpu import (
        edge_color,
        named_grid,
        tensornetworkstate,
    )
    from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
    from tensornetworkquantumsimulator_tpu.parallel import (
        BatchedCircuit,
        batched_from_tns,
        local_expectations,
        make_layer_fn,
    )

    g = named_grid((3, 3))
    chi = 4
    psi0 = tensornetworkstate(jnp.complex64, lambda v: "X+", g, "S=1/2")
    layer = [("Rx", [v], 0.5) for v in g.vertices()]
    layer += [
        ("Rzz", pair, 0.25)
        for group in edge_color(g, 4)
        for pair in group
    ]
    z_op = jnp.asarray(op_matrix("Z", 2))
    x_op = jnp.asarray(op_matrix("X", 2))

    def run(alg, svd_alg="default", qr_alg="default"):
        monkeypatch.setenv("TNQS_EIGH_ALG", alg)
        monkeypatch.setenv("TNQS_SVD_ALG", svd_alg)
        monkeypatch.setenv("TNQS_QR_ALG", qr_alg)
        spec, state = batched_from_tns(psi0, chi=chi)
        circuit = BatchedCircuit(layer, g, spec=spec)
        layer_fn = make_layer_fn(
            circuit, chi=chi, cutoff=1e-8, normalize_tensors=True,
            bp_maxiter=40, bp_tolerance=1e-7,
        )
        for _ in range(2):
            state, _ = layer_fn(state)
        return (
            np.asarray(local_expectations(spec, state, z_op)),
            np.asarray(local_expectations(spec, state, x_op)),
        )

    z_def, x_def = run("default")
    z_jac, x_jac = run("jacobi")
    np.testing.assert_allclose(np.real(z_jac), np.real(z_def), atol=5e-5)
    np.testing.assert_allclose(np.real(x_jac), np.real(x_def), atol=5e-5)

    # full-Pallas factorization path: every eigh is the Jacobi kernel AND
    # the truncated SVD goes through the Gram split (one more Jacobi eigh)
    z_gj, x_gj = run("jacobi", "gram")
    np.testing.assert_allclose(np.real(z_gj), np.real(z_def), atol=5e-5)
    np.testing.assert_allclose(np.real(x_gj), np.real(x_def), atol=5e-5)

    # opt-in: the QR-reduce as a polar split (third Jacobi eigh) — zero
    # XLA factorization kernels left in the layer, but the Gram step
    # cannot resolve directions below √ε·σmax and the QR-reduce RETAINS
    # those (unlike the theta SVD, where they fall in the truncated
    # tail), so accuracy is ~√ε_f32 ≈ 3e-4 per layer (measured 4e-4,
    # and 3e-6 ≈ amplified √ε_f64 on c128).  Documented trade-off for
    # exploratory large-χ runs, NOT the production default.
    z_all, x_all = run("jacobi", "gram", "polar")
    np.testing.assert_allclose(np.real(z_all), np.real(z_def), atol=2e-3)
    np.testing.assert_allclose(np.real(x_all), np.real(x_def), atol=2e-3)


def test_jacobi_eigh_polish_on_ill_conditioned_psd():
    """The two-pass polish (BASELINE.md round-3 gate follow-up) must hold
    eigen-accuracy on the `_pseudo_roots` regime — PSD batches whose small
    eigenvalues sit near the 10·eps cutoff, where 1/sqrt(w) amplifies any
    eigenvalue error ~100x."""
    rng = np.random.default_rng(11)
    B, n = 8, 12
    q, _ = np.linalg.qr(
        rng.standard_normal((B, n, n)) + 1j * rng.standard_normal((B, n, n))
    )
    # spectrum spanning 1 .. 1e-6 (straddles the f32 pseudo-inverse cutoff)
    w_true = np.logspace(0, -6, n)[None, :] * np.ones((B, 1))
    a = (q * w_true[:, None, :]) @ np.conj(np.swapaxes(q, -1, -2))
    a = ((a + np.conj(np.swapaxes(a, -1, -2))) / 2).astype(np.complex64)

    w, v = jacobi_eigh(jnp.asarray(a), interpret=True, polish=True)
    w, v = np.asarray(w), np.asarray(v)
    # unitarity after one Newton-Schulz step: error is squared
    gram = np.einsum("bji,bjk->bik", np.conj(v), v)
    assert np.abs(gram - np.eye(n)).max() < 3e-6
    # Rayleigh-refreshed eigenvalues: absolute error at the f32
    # backward-stable bound, including for the SMALL eigenvalues
    w_ref = np.linalg.eigvalsh(a.astype(np.complex128))
    assert np.max(np.abs(np.sort(w, axis=-1) - w_ref)) < 2e-6

    # the raw kernel is allowed to be (and the polish must not be) worse
    w0, v0 = jacobi_eigh(jnp.asarray(a), interpret=True, polish=False)
    gram0 = np.einsum("bji,bjk->bik", np.conj(np.asarray(v0)), np.asarray(v0))
    assert np.abs(gram - np.eye(n)).max() <= np.abs(gram0 - np.eye(n)).max() + 1e-7
