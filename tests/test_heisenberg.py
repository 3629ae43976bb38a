"""Heisenberg-picture (Pauli transfer matrix) evolution cross-validated
against Schrödinger-picture evolution (reference
`examples/2dIsing_dynamics_Heisenbergpicture.jl` + `gate_definitions.jl:63-86`)."""

import jax.numpy as jnp
import numpy as np

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import (
    edge_color,
    identitytensornetworkstate,
    named_grid,
    paulitensornetworkstate,
    siteinds,
    tensornetworkstate,
)
from tensornetworkquantumsimulator_tpu.models.gates import pauli_transfer_matrix
from scipy.linalg import expm


def test_ptm_single_qubit():
    # Rx(θ): U†ZU = cos θ Z + sin θ Y in the Heisenberg picture
    theta = 0.37
    x = np.array([[0, 1], [1, 0]], dtype=complex)
    u = expm(-1j * theta / 2 * x)
    m = pauli_transfer_matrix(u, heisenberg=True)
    c = m @ np.array([0.0, 0.0, 0.0, 1.0])  # coefficients of Z
    np.testing.assert_allclose(
        c, [0.0, 0.0, np.sin(theta), np.cos(theta)], atol=1e-12
    )


def test_heisenberg_vs_schrodinger():
    g = named_grid((2, 2))
    vz = g.vertices()[0]
    h, J, dt = -1.0, -1.0, 0.08
    layer = []
    layer += [("Rz", [v], h * dt) for v in g.vertices()]
    for colored_edges in edge_color(g, 4):
        layer += [("Rxx", pair, 2 * J * dt) for pair in colored_edges]
    layer += [("Rz", [v], h * dt) for v in g.vertices()]

    # Schrödinger picture
    psi = tensornetworkstate(jnp.complex128, lambda v: "↑", g, "S=1/2")
    nlayers = 3
    for _ in range(nlayers):
        psi, _ = tnqs.apply_circuit(
            layer, psi, apply_kwargs=dict(maxdim=8, cutoff=1e-14, normalize_tensors=False)
        )
    sz_schrod = tnqs.expect(psi, ("Z", [vz]), alg="exact")

    # Heisenberg picture: reversed circuit, PTM gates on Pauli sites
    op = paulitensornetworkstate(
        jnp.complex128, lambda v: "Z" if v == vz else "I", g
    )
    reversed_layer = list(reversed(layer))
    for _ in range(nlayers):
        op, _ = tnqs.apply_circuit(
            reversed_layer, op, apply_kwargs=dict(maxdim=16, cutoff=1e-14, normalize_tensors=False)
        )
    # ⟨O(t)⟩ on |↑...↑⟩: contract coefficients with [1,0,0,1] per site
    w = tensornetworkstate(
        jnp.complex128, lambda v: [1.0, 0.0, 0.0, 1.0], g, op.siteinds()
    )
    val = tnqs.inner(w, op, alg="exact")
    np.testing.assert_allclose(np.real(val), np.real(sz_schrod), atol=1e-8)

    # trace identities from the reference example
    tr_op = tnqs.inner(op, identitytensornetworkstate(g, op.siteinds()), alg="bp")
    assert abs(np.imag(tr_op)) < 1e-10
