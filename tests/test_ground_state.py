"""Imaginary-time TEBD ground-state search (batched engine) vs exact
diagonalization: BP simple update reaches the 2D TFIM ground energy to the
expected ~1% environment accuracy at small χ."""

import importlib.util
import pathlib

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


def _exact_tfim_energy(nx, ny, hx, J):
    n = nx * ny
    X = sp.csr_matrix(np.array([[0, 1], [1, 0]], float))
    Z = sp.csr_matrix(np.array([[1, 0], [0, -1]], float))
    I = sp.identity(2, format="csr")

    def op1(M, i):
        mats = [I] * n
        mats[i] = M
        out = mats[0]
        for mm in mats[1:]:
            out = sp.kron(out, mm, format="csr")
        return out

    idx = {(x + 1, y + 1): x * ny + y for x in range(nx) for y in range(ny)}
    H = sp.csr_matrix((2**n, 2**n))
    for i in range(n):
        H = H - hx * op1(X, i)
    for (x, y), i in idx.items():
        if x < nx:
            H = H - J * op1(Z, i) @ op1(Z, idx[(x + 1, y)])
        if y < ny:
            H = H - J * op1(Z, i) @ op1(Z, idx[(x, y + 1)])
    return float(
        spla.eigsh(H, k=1, which="SA", return_eigenvectors=False)[0]
    )


def test_imaginary_time_ground_state():
    spec = importlib.util.spec_from_file_location(
        "gs", EXAMPLES / "tfim_ground_state.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    e_tn = m.main(nx=3, ny=3, chi=4, hx=3.0, J=1.0, tau=0.05, nsteps=120)
    e0 = _exact_tfim_energy(3, 3, 3.0, 1.0)
    assert abs(e_tn - e0) / abs(e0) < 0.01
