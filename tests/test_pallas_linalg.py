"""Single-kernel Pallas batched Jacobi eigh (interpret mode on CPU;
hardware numbers via scripts/microbench.py jeigh)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tensornetworkquantumsimulator_tpu.parallel.pallas_linalg import (
    default_sweeps,
    jacobi_eigh,
    jacobi_pseudo_roots,
    roots_kernel_supported,
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

    # cholqr2: pure-MXU QR-reduce (gram → cholesky → triangular solve,
    # twice) — the tall-skinny χ≥64 candidate; same √ε Gram accuracy
    # contract as "polar"
    z_cq, x_cq = run("default", "default", "cholqr2")
    np.testing.assert_allclose(np.real(z_cq), np.real(z_def), atol=2e-3)
    np.testing.assert_allclose(np.real(x_cq), np.real(x_def), atol=2e-3)

    # the full bench `chi10_fast` stack (jacobi eigh + gram SVD +
    # CholeskyQR2 QR-reduce): hardware A/B measured 1.7× over plain
    # auto at chi10 (BASELINE.md round-3 knob A/B); same √ε accuracy
    # contract as the cholqr2 leg above
    z_f, x_f = run("jacobi", "gram", "cholqr2")
    np.testing.assert_allclose(np.real(z_f), np.real(z_def), atol=2e-3)
    np.testing.assert_allclose(np.real(x_f), np.real(x_def), atol=2e-3)

    # defer: CholeskyQR1 re-associated — Q never materializes, the tall
    # matrix is touched twice (gram + rebuild) instead of cholqr2's five
    # passes; same κ²-Gram accuracy class (measured 2.4e-6 vs cholqr2's
    # 2.4e-6 over 10 bench layers, CPU c64)
    z_dfr, x_dfr = run("default", "default", "defer")
    np.testing.assert_allclose(np.real(z_dfr), np.real(z_def), atol=2e-3)
    np.testing.assert_allclose(np.real(x_dfr), np.real(x_def), atol=2e-3)


def test_cholqr2_split_reconstructs_and_is_isometric():
    """TNQS_QR_ALG=cholqr2: A = Q·M with Q†Q = I on the range, including
    rank-deficient inputs (zero-padded bond columns)."""
    import os

    from tensornetworkquantumsimulator_tpu.parallel.engine import _qr_split

    rng = np.random.default_rng(7)
    a = rng.normal(size=(5, 96, 24)) + 1j * rng.normal(size=(5, 96, 24))
    a = a.astype(np.complex128)
    a[2, :, -6:] = 0.0  # rank-deficient batch member
    old = os.environ.get("TNQS_QR_ALG")
    os.environ["TNQS_QR_ALG"] = "cholqr2"
    try:
        q, m = _qr_split(jnp.asarray(a))
    finally:
        if old is None:
            os.environ.pop("TNQS_QR_ALG", None)
        else:
            os.environ["TNQS_QR_ALG"] = old
    q = np.asarray(q)
    m = np.asarray(m)
    np.testing.assert_allclose(q @ m, a, atol=1e-10)
    qhq = np.conj(np.swapaxes(q, -1, -2)) @ q
    # exact isometry on full-rank members; on the rank-deficient member
    # only the range directions must be orthonormal
    eye = np.eye(24)
    for b in range(5):
        if b == 2:
            np.testing.assert_allclose(qhq[b][:18, :18], eye[:18, :18],
                                       atol=1e-8)
        else:
            np.testing.assert_allclose(qhq[b], eye, atol=1e-8)


def test_defer_qr_reduce_reconstructs():
    """TNQS_QR_ALG=defer: `_qr_reduce` returns the RAW matrix + upper
    R with deferred=True, and A·R⁻¹ is an isometry on the range — the
    rebuild t = A·(R⁻¹x) equals the cholqr1 Q·x in exact arithmetic."""
    import os

    import jax

    from tensornetworkquantumsimulator_tpu.parallel.engine import (
        _qr_reduce,
        _rinv_left,
    )

    rng = np.random.default_rng(7)
    a = rng.normal(size=(5, 96, 24)) + 1j * rng.normal(size=(5, 96, 24))
    a = a.astype(np.complex128)
    old = os.environ.get("TNQS_QR_ALG")
    os.environ["TNQS_QR_ALG"] = "defer"
    try:
        q, r, deferred = _qr_reduce(jnp.asarray(a))
        assert deferred
        np.testing.assert_allclose(np.asarray(q), a)  # raw, no tall pass
        # A = (A R^-1) R: check the implied isometry via the solve path
        eye = jnp.broadcast_to(jnp.eye(24, dtype=a.dtype), (5, 24, 24))
        rinv = np.asarray(_rinv_left(r, eye))
        qeff = a @ rinv
    finally:
        if old is None:
            os.environ.pop("TNQS_QR_ALG", None)
        else:
            os.environ["TNQS_QR_ALG"] = old
    np.testing.assert_allclose(qeff @ np.asarray(r), a, atol=1e-9)
    qhq = np.conj(np.swapaxes(qeff, -1, -2)) @ qeff
    np.testing.assert_allclose(
        qhq, np.broadcast_to(np.eye(24), qhq.shape), atol=1e-8
    )


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


def _xla_pseudo_roots(a):
    """The engine's XLA reference path, forced (TNQS_ROOTS_FUSED=0 +
    default eigh) so kernel tests compare against the production math."""
    import os

    from tensornetworkquantumsimulator_tpu.parallel import engine

    old = {
        k: os.environ.get(k) for k in ("TNQS_EIGH_ALG", "TNQS_ROOTS_FUSED")
    }
    os.environ["TNQS_EIGH_ALG"] = "default"
    os.environ["TNQS_ROOTS_FUSED"] = "0"
    try:
        r, s = engine._pseudo_roots(jnp.asarray(a))
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return np.asarray(r), np.asarray(s)


def test_fused_pseudo_roots_matches_xla_path():
    """One-kernel eigh→polish→clip→√M,1/√M vs the engine's XLA stage on
    the `_pseudo_roots` regime: PSD env batches incl. spectra straddling
    the 10·eps cutoff and exact identity (padded-slot) envs."""
    rng = np.random.default_rng(3)
    B, n = 6, 12
    q, _ = np.linalg.qr(
        rng.standard_normal((B, n, n)) + 1j * rng.standard_normal((B, n, n))
    )
    # spectrum ill-conditioned but clear of the 10·ε·λmax ≈ 1.2e-6 clip
    # on BOTH sides: values within f32 noise of the cutoff make the
    # zero-or-keep decision legitimately path-dependent (a rank-1
    # projector flip), which is not what this test checks
    w_true = np.concatenate(
        [np.logspace(0, -5, n - 2), [1e-9, 1e-9]]
    )[None, :] * np.ones((B, 1))
    a = (q * w_true[:, None, :]) @ np.conj(np.swapaxes(q, -1, -2))
    a = ((a + np.conj(np.swapaxes(a, -1, -2))) / 2).astype(np.complex64)
    a[-1] = np.eye(n)  # a padded/dummy slot

    root, inv = jacobi_pseudo_roots(jnp.asarray(a), interpret=True)
    root, inv = np.asarray(root), np.asarray(inv)
    r_ref, s_ref = _xla_pseudo_roots(a)

    # reconstruction agreement: root·root ≈ A.  Element-wise agreement
    # with the XLA path is NOT asserted on this batch: √M amplifies f32
    # eigen-perturbations by ~1/(2√λ) ≈ 500× near the 1e-6 end of the
    # spectrum, so two correct f32 algorithms differ at ~1e-4 there —
    # the well-conditioned batch below pins element-wise agreement.
    assert np.linalg.norm(root @ root - a) / np.linalg.norm(a) < 2e-5
    # inv_root: basis-independent invariants.  (Cross-path element-wise
    # projector agreement is bounded by ε·λmax/λmin_kept ≈ 1e-2 here —
    # the resolved subspace itself is only determined to that angle.)
    p = root @ inv
    assert (
        np.linalg.norm(p @ root - root) / np.linalg.norm(root) < 1e-4
    )  # root·inv acts as identity on the range
    # both paths must make the same keep/zero decisions (rank parity)
    rank = np.real(np.trace(p, axis1=-2, axis2=-1))
    rank_ref = np.real(np.trace(r_ref @ s_ref, axis1=-2, axis2=-1))
    np.testing.assert_allclose(rank, rank_ref, atol=0.05)
    np.testing.assert_allclose(rank[:-1], n - 2, atol=0.05)  # 2 null dirs
    # identity env maps to exact identity roots (mask correctness)
    assert np.abs(root[-1] - np.eye(n)).max() < 1e-6
    assert np.abs(inv[-1] - np.eye(n)).max() < 1e-6

    # well-conditioned batch: element-wise agreement with the XLA path
    w_wc = (0.1 + np.linspace(0, 1, n))[None, :] * np.ones((B, 1))
    a_wc = (q * w_wc[:, None, :]) @ np.conj(np.swapaxes(q, -1, -2))
    a_wc = ((a_wc + np.conj(np.swapaxes(a_wc, -1, -2))) / 2).astype(
        np.complex64
    )
    r_wc, s_wc = jacobi_pseudo_roots(jnp.asarray(a_wc), interpret=True)
    r_wc_ref, s_wc_ref = _xla_pseudo_roots(a_wc)
    assert np.abs(np.asarray(r_wc) - r_wc_ref).max() < 2e-5
    assert np.abs(np.asarray(s_wc) - s_wc_ref).max() < 2e-4


def test_fused_pseudo_roots_rank_deficient():
    """Large null space (bond-dim-1 padded environments): null directions
    must be EXACTLY zeroed in both roots, like the XLA clip."""
    rng = np.random.default_rng(5)
    B, n, r = 4, 10, 3
    q = rng.standard_normal((B, n, r)) + 1j * rng.standard_normal((B, n, r))
    a = np.einsum("bik,bjk->bij", q, np.conj(q)).astype(np.complex64)
    a = (a + np.conj(np.swapaxes(a, -1, -2))) / 2
    root, inv = jacobi_pseudo_roots(jnp.asarray(a), interpret=True)
    root, inv = np.asarray(root), np.asarray(inv)
    assert np.linalg.norm(root @ root - a) / np.linalg.norm(a) < 5e-6
    # pseudo-inverse property on the range: root·inv·root ≈ root
    assert (
        np.linalg.norm(root @ inv @ root - root) / np.linalg.norm(root) < 1e-4
    )
    w_ref = np.linalg.eigvalsh(a.astype(np.complex128))
    assert (w_ref[:, : n - r] < 1e-5).all()  # really rank-deficient


def test_roots_kernel_supported_gate():
    assert roots_kernel_supported(10, 1)
    assert not roots_kernel_supported(9, 1)  # odd n
    assert not roots_kernel_supported(44, 1)  # VMEM/unroll bound
    assert not roots_kernel_supported(10, 0)  # empty batch


def test_engine_layer_with_fused_roots(monkeypatch):
    """Full batched Trotter layer: TNQS_EIGH_ALG=jacobi with the fused
    roots kernel vs the same path with TNQS_ROOTS_FUSED=0 (kernel eigh +
    XLA reconstruction) — the fusion must not move the physics."""
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

    def run(fused):
        monkeypatch.setenv("TNQS_EIGH_ALG", "jacobi")
        monkeypatch.setenv("TNQS_ROOTS_FUSED", "1" if fused else "0")
        spec, state = batched_from_tns(psi0, chi=chi)
        circuit = BatchedCircuit(layer, g, spec=spec)
        layer_fn = make_layer_fn(
            circuit, chi=chi, cutoff=1e-8, normalize_tensors=True,
            bp_maxiter=40, bp_tolerance=1e-7,
        )
        for _ in range(2):
            state, _ = layer_fn(state)
        return np.asarray(local_expectations(spec, state, z_op))

    z_fused = run(True)
    z_split = run(False)
    np.testing.assert_allclose(np.real(z_fused), np.real(z_split), atol=5e-5)


def test_cholqr1_split_reconstructs():
    """TNQS_QR_ALG=cholqr1 (single CholeskyQR pass): A = Q·M exactly; Q
    orthogonality is only ~kappa^2*eps, which the simple update tolerates
    because R cancels in the restored tensor (engine._qr_split note).
    Measured layer drift equals cholqr2's (4.8e-6 over 10 chi10 layers,
    CPU c64)."""
    import os

    from tensornetworkquantumsimulator_tpu.parallel.engine import _qr_split

    rng = np.random.default_rng(11)
    a = rng.normal(size=(4, 80, 20)) + 1j * rng.normal(size=(4, 80, 20))
    a = a.astype(np.complex128)
    old = os.environ.get("TNQS_QR_ALG")
    os.environ["TNQS_QR_ALG"] = "cholqr1"
    try:
        q, m = _qr_split(jnp.asarray(a))
    finally:
        if old is None:
            os.environ.pop("TNQS_QR_ALG", None)
        else:
            os.environ["TNQS_QR_ALG"] = old
    np.testing.assert_allclose(np.asarray(q) @ np.asarray(m), a, atol=1e-9)
