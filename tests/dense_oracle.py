"""Independent dense-statevector oracle for golden tests.

Implements circuit evolution directly on the 2^n statevector with explicit
Pauli-rotation matrices (scipy expm on 2x2/4x4 blocks only) — sharing no
code with the engines under test, so agreement is evidence of correctness
rather than self-consistency (VERDICT round 1, weak #4).

Gate conventions match the package's qiskit-style zoo
(`/root/reference/src/Apply/gate_definitions.jl:28-57`):
R_P(theta) = exp(-i theta/2 P) for P in {X, Y, Z, XX, YY, ZZ}.
"""

import numpy as np
from scipy.linalg import expm

_P = {
    "I": np.eye(2, dtype=complex),
    "X": np.array([[0, 1], [1, 0]], dtype=complex),
    "Y": np.array([[0, -1j], [1j, 0]], dtype=complex),
    "Z": np.diag([1.0, -1.0]).astype(complex),
}


def gate_matrix(name: str, theta: float) -> np.ndarray:
    """Dense matrix for a rotation-gate tuple entry."""
    paulis = name[1:].upper()
    op = _P[paulis[0]]
    for p in paulis[1:]:
        op = np.kron(op, _P[p])
    return expm(-1j * (theta / 2) * op)


def apply_1q(state: np.ndarray, u: np.ndarray, i: int, n: int) -> np.ndarray:
    psi = state.reshape(2**i, 2, -1)
    return np.einsum("ab,xby->xay", u, psi).reshape(-1)


def apply_2q(state: np.ndarray, u: np.ndarray, i: int, j: int, n: int) -> np.ndarray:
    psi = state.reshape([2] * n)
    psi = np.moveaxis(psi, (i, j), (0, 1)).reshape(4, -1)
    psi = (u @ psi).reshape([2, 2] + [2] * (n - 2))
    psi = np.moveaxis(psi, (0, 1), (i, j))
    return psi.reshape(-1)


def apply_layer(state: np.ndarray, layer, idx: dict, n: int) -> np.ndarray:
    """Apply a tuple-circuit layer [(name, verts, theta), ...]."""
    for name, verts, theta in layer:
        u = gate_matrix(name, theta)
        if hasattr(verts, "src"):  # NamedEdge
            verts = (verts.src, verts.dst)
        if len(verts) == 1:
            state = apply_1q(state, u, idx[verts[0]], n)
        else:
            state = apply_2q(state, u, idx[verts[0]], idx[verts[1]], n)
    return state


def z_expectation(state: np.ndarray, i: int, n: int) -> float:
    psi = state.reshape(2**i, 2, -1)
    w = np.sum(np.abs(psi) ** 2, axis=(0, 2))
    return float(w[0] - w[1])


def dense_z_trajectory(g, layer, nlayers: int, obs_vertex) -> list:
    """<Z_obs> after each of ``nlayers`` applications of ``layer`` to
    |up...up> on graph ``g`` — the independent golden source."""
    vs = g.vertices()
    idx = {v: i for i, v in enumerate(vs)}
    n = len(vs)
    state = np.zeros(2**n, dtype=complex)
    state[0] = 1.0
    out = []
    for _ in range(nlayers):
        state = apply_layer(state, layer, idx, n)
        out.append(z_expectation(state, idx[obs_vertex], n))
    return out


def exact_tfim_levels(spec, J: float, hx: float, n_levels: int = 1):
    """Lowest ``n_levels`` dense eigenvalues of the TFIM
    H = -J Σ_edges Z_i Z_j - hx Σ_i X_i on the batched spec's graph (d=2)
    — the oracle for the variational ground/excited-state tests."""
    n = spec.num_vertices
    X = np.array([[0.0, 1.0], [1.0, 0.0]])
    Z = np.array([[1.0, 0.0], [0.0, -1.0]])

    def op1(M, i):
        out = np.ones((1, 1))
        for k in range(n):
            out = np.kron(out, M if k == i else np.eye(2))
        return out

    H = np.zeros((2**n, 2**n))
    for i in range(n):
        H -= hx * op1(X, i)
    for (iu, iv, _su, _sv) in spec.edges:
        H -= J * op1(Z, iu) @ op1(Z, iv)
    return np.linalg.eigvalsh(H)[:n_levels]
