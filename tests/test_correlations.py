"""Batched BP path correlators vs the generic Steiner-tree `expect`."""

import jax.numpy as jnp
import numpy as np

import tensornetworkquantumsimulator_tpu as tnqs
from tensornetworkquantumsimulator_tpu import named_grid, random_tensornetworkstate
from tensornetworkquantumsimulator_tpu.models.sites import op_matrix
from tensornetworkquantumsimulator_tpu.parallel import (
    batched_from_tns,
    bond_expectations,
    bp_update,
    make_path_correlation_fn,
    path_correlations,
    shortest_path,
)
from tensornetworkquantumsimulator_tpu.utils.lattices import (
    named_hexagonal_lattice_graph,
)


def _converged(g, dtype=jnp.complex128, chi=3, seed=0):
    import jax

    psi = random_tensornetworkstate(
        dtype, g, bond_dimension=chi, key=jax.random.PRNGKey(seed)
    )
    spec, state = batched_from_tns(psi, chi=chi)
    state = bp_update(spec, state, maxiter=300, tolerance=1e-14)
    return psi, spec, state


def _generic(psi, ops, va, vb):
    return tnqs.expect(
        psi,
        (ops, [va, vb]),
        alg="bp",
        cache_update_kwargs=dict(maxiter=400, tolerance=1e-14),
    )


def _slots_for(spec, verts):
    slots = []
    for i in range(len(verts) - 1):
        s = next(
            k for k in range(spec.degree)
            if spec.slot_mask[verts[i]][k]
            and spec.nbr[verts[i]][k] == verts[i + 1]
        )
        slots.append(s)
    return slots


def _steiner_path(psi, spec, va, vb):
    """The generic engine's own Steiner tree for {va, vb}, as (verts, slots)
    — on a loopy graph the BP value depends on WHICH path is contracted, so
    the comparison must contract the same one."""
    from collections import deque

    t = psi.graph().steiner_tree([va, vb])
    prev = {va: None}
    q = deque([va])
    while q:
        u = q.popleft()
        for w in t.neighbors(u):
            if w not in prev:
                prev[w] = u
                q.append(w)
    names = [vb]
    while prev[names[-1]] is not None:
        names.append(prev[names[-1]])
    names.reverse()
    verts = [spec.vertex_position(v) for v in names]
    return verts, _slots_for(spec, verts)


def test_path_correlations_match_generic_expect():
    g = named_grid((4, 4))
    psi, spec, state = _converged(g)
    z = np.asarray(op_matrix("Z", 2))
    # distances 1, 2, 3 and an L-shaped (diagonal) path
    pairs = [
        ((1, 1), (1, 2)),
        ((1, 1), (1, 3)),
        ((1, 1), (1, 4)),
        ((1, 1), (3, 3)),
        ((2, 1), (4, 4)),
    ]
    paths = [_steiner_path(psi, spec, a, b) for a, b in pairs]
    got = np.asarray(path_correlations(spec, state, pairs, z, paths=paths))
    want = np.asarray([_generic(psi, "ZZ", a, b) for a, b in pairs])
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_distance_one_matches_bond_expectations():
    g = named_grid((3, 3))
    _, spec, state = _converged(g, seed=3)
    z = jnp.asarray(op_matrix("Z", 2))
    bonds = np.asarray(bond_expectations(spec, state, z, z))
    pairs = [(spec.vertices[iu], spec.vertices[iv])
             for iu, iv, _, _ in spec.edges]
    got = np.asarray(path_correlations(spec, state, pairs, z))
    np.testing.assert_allclose(got, bonds, atol=1e-10)


def test_mixed_operators_and_degree3_lattice():
    g = named_hexagonal_lattice_graph(2, 2)
    psi, spec, state = _converged(g, seed=5)
    x = np.asarray(op_matrix("X", 2))
    y = np.asarray(op_matrix("Y", 2))
    vs = list(g.vertices())
    va, vb = vs[0], vs[-1]
    paths = [_steiner_path(psi, spec, va, vb)]
    got = complex(
        path_correlations(spec, state, [(va, vb)], x, y, paths=paths)[0]
    )
    want = complex(_generic(psi, "XY", va, vb))
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_connected_correlator_vanishes_on_product_state():
    from tensornetworkquantumsimulator_tpu.parallel import batched_product_state

    g = named_grid((3, 3))
    spec, state = batched_product_state(g, chi=2, dtype=np.complex64)
    state = bp_update(spec, state, maxiter=50)
    z = np.asarray(op_matrix("Z", 2))
    fn = make_path_correlation_fn(
        spec, [((1, 1), (3, 3)), ((1, 2), (2, 3))], z, connected=True,
        real_output=True,
    )
    np.testing.assert_allclose(np.asarray(fn(state)), 0.0, atol=1e-5)


def test_shortest_path_shape():
    g = named_grid((4, 4))
    spec, _ = __import__(
        "tensornetworkquantumsimulator_tpu.parallel", fromlist=["x"]
    ).batched_product_state(g, chi=2)
    verts, slots = shortest_path(spec, (1, 1), (4, 4))
    assert len(verts) == 7 and len(slots) == 6
    assert verts[0] == spec.vertex_position((1, 1))
    assert verts[-1] == spec.vertex_position((4, 4))
    for i, s in enumerate(slots):
        assert spec.nbr[verts[i]][s] == verts[i + 1]


def test_ensemble_correlations_compose():
    """make_path_correlation_fn output vmaps over the ensemble axis."""
    import jax

    from tensornetworkquantumsimulator_tpu.parallel import (
        ensemble_fn,
        stack_states,
    )

    g = named_grid((3, 3))
    states, specs = [], None
    for seed in (0, 1, 2):
        _, spec, st = _converged(g, dtype=jnp.complex64, seed=seed)
        specs = spec
        states.append(st)
    estate = stack_states(states)
    z = np.asarray(op_matrix("Z", 2))
    pairs = [((1, 1), (3, 3)), ((1, 2), (3, 1))]
    fn = make_path_correlation_fn(specs, pairs, z, jit=False)
    got = np.asarray(ensemble_fn(fn)(estate))
    want = np.stack([np.asarray(fn(s)) for s in states])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_sharded_path_correlations_match_unsharded():
    """SPMD path correlators == single-device chain (state never gathers)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tensornetworkquantumsimulator_tpu import normalize
    from tensornetworkquantumsimulator_tpu.parallel import (
        BatchedState,
        batched_from_tns,
        make_sharded_path_correlations,
        shard_spec,
    )

    nx_, ny_, chi, S = 8, 4, 3, 8
    g = named_grid((nx_, ny_), periodic=True)
    sspec = shard_spec(g, S)
    spec = sspec.spec

    psi = random_tensornetworkstate(
        jnp.complex128, g, bond_dimension=chi, key=__import__("jax").random.PRNGKey(7)
    )
    psi = normalize(psi, alg="bp")
    _, state = batched_from_tns(psi, chi=chi, spec=spec)
    state = bp_update(spec, state, maxiter=60, tolerance=1e-12)

    z = np.asarray(op_matrix("Z", 2))
    x = np.asarray(op_matrix("X", 2))
    # pairs spanning 1, 3 and 7 strips (the last crosses every shard)
    pairs = [((1, 1), (2, 3)), ((2, 2), (5, 1)), ((1, 4), (8, 4))]
    ref_fn = make_path_correlation_fn(spec, pairs, z, x)
    ref = np.asarray(ref_fn(state))

    mesh = Mesh(np.array(jax.devices()[:S]), ("v",))
    sh = NamedSharding(mesh, P("v"))
    sharded = BatchedState(
        jax.device_put(state.tensors, sh), jax.device_put(state.messages, sh)
    )
    fn = make_sharded_path_correlations(sspec, mesh, pairs, z, x)
    got = np.asarray(fn(sharded))
    np.testing.assert_allclose(got, ref, atol=1e-10)

    # connected variant
    conn_ref = np.asarray(
        make_path_correlation_fn(spec, pairs, z, x, connected=True)(state)
    )
    conn = np.asarray(
        make_sharded_path_correlations(
            sspec, mesh, pairs, z, x, connected=True
        )(sharded)
    )
    np.testing.assert_allclose(conn, conn_ref, atol=1e-10)


def test_path_rdms_match_generic():
    from tensornetworkquantumsimulator_tpu.parallel import make_path_rdm_fn
    from tensornetworkquantumsimulator_tpu.utils.lattices import named_comb_tree

    # tree: BP is exact, path unique -> compare against the exact RDM
    g = named_comb_tree((3, 3))
    psi, spec, state = _converged(g, seed=2)
    vs = list(g.vertices())
    pairs = [(vs[0], vs[-1]), (vs[1], vs[4])]
    rho = np.asarray(make_path_rdm_fn(spec, pairs)(state))
    for k, (a, b) in enumerate(pairs):
        rho_gen = tnqs.reduced_density_matrix(psi, [a, b], alg="exact")
        sa, sb = psi.siteinds()[a][0], psi.siteinds()[b][0]
        want = np.asarray(rho_gen.array((sa, sa.prime(), sb, sb.prime())))
        want = want / np.trace(want.reshape(4, 4).reshape(2, 2, 2, 2).transpose(0, 2, 1, 3).reshape(4, 4))
        np.testing.assert_allclose(rho[k], want, atol=1e-9)

    # loopy grid, unique straight-line path: vs the generic bp RDM
    g2 = named_grid((3, 4))
    psi2, spec2, state2 = _converged(g2, seed=4)
    pairs2 = [((2, 1), (2, 3))]
    rho2 = np.asarray(make_path_rdm_fn(spec2, pairs2)(state2))
    rho_gen2 = tnqs.reduced_density_matrix(
        psi2, list(pairs2[0]), alg="bp",
        cache_update_kwargs=dict(maxiter=300, tolerance=1e-13),
    )
    sa, sb = psi2.siteinds()[(2, 1)][0], psi2.siteinds()[(2, 3)][0]
    want2 = np.asarray(rho_gen2.array((sa, sa.prime(), sb, sb.prime())))
    np.testing.assert_allclose(rho2[0], want2, atol=1e-6)

    # RDM consistency with the correlator: tr(rho (Z x Z)) == <ZZ>
    z = np.asarray(op_matrix("Z", 2))
    c = np.asarray(path_correlations(spec2, state2, pairs2, z))
    val = np.einsum("szcx,zs,xc->", rho2[0], z, z)
    np.testing.assert_allclose(val, c[0], atol=1e-8)


def test_mutual_information():
    from tensornetworkquantumsimulator_tpu.parallel import (
        batched_product_state,
        make_mutual_information_fn,
    )
    from tensornetworkquantumsimulator_tpu.utils.lattices import named_comb_tree

    # product state: I(a:b) = 0 for every pair
    g = named_grid((3, 3))
    spec, st = batched_product_state(g, chi=2, dtype=np.complex64)
    st = bp_update(spec, st, maxiter=30)
    fn = make_mutual_information_fn(spec, [((1, 1), (3, 3)), ((1, 2), (2, 3))])
    np.testing.assert_allclose(np.asarray(fn(st)), 0.0, atol=1e-5)

    # tree (BP exact): match MI computed from the generic exact RDMs
    gt = named_comb_tree((3, 3))
    psi, spec_t, st_t = _converged(gt, seed=6)
    vs = list(gt.vertices())
    pair = (vs[0], vs[-1])
    got = float(make_mutual_information_fn(spec_t, [pair])(st_t)[0])

    def _ent(w):
        w = np.clip(np.real(w), 0, None)
        w = w / w.sum()
        return float(-(w[w > 0] * np.log(w[w > 0])).sum())

    sa_i = psi.siteinds()[pair[0]][0]
    sb_i = psi.siteinds()[pair[1]][0]
    rho_ab = tnqs.reduced_density_matrix(psi, list(pair), alg="exact")
    arr = np.asarray(rho_ab.array((sa_i, sa_i.prime(), sb_i, sb_i.prime())))
    m_ab = arr.transpose(0, 2, 1, 3).reshape(4, 4)
    m_ab = m_ab / np.trace(m_ab)
    m_a = np.einsum("szcc->sz", arr); m_a /= np.trace(m_a)
    m_b = np.einsum("ccsz->sz", arr); m_b /= np.trace(m_b)
    want = (_ent(np.linalg.eigvalsh(m_a)) + _ent(np.linalg.eigvalsh(m_b))
            - _ent(np.linalg.eigvalsh(m_ab)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_string_expectations_match_generic_expect():
    """Multi-site Pauli strings along grid rows vs the generic Steiner-tree
    expect: contiguous strings, identity fill-in between distant operator
    vertices, parity strings, and explicit-matrix op lists."""
    from tensornetworkquantumsimulator_tpu.parallel import (
        make_string_expectation_fn,
        string_expectations,
    )

    g = named_grid((4, 4))
    psi, spec, state = _converged(g, seed=11)
    strings = [
        ("ZZ", [(1, 1), (1, 2)]),                      # adjacent pair
        ("ZXZ", [(2, 1), (2, 2), (2, 3)]),             # contiguous 3-site
        ("ZZ", [(3, 1), (3, 4)]),                      # identity fill-in
        ("ZZZZ", [(4, 1), (4, 2), (4, 3), (4, 4)]),    # parity string
        ("XYZX", [(1, 1), (1, 2), (1, 3), (1, 4)]),    # mixed letters
    ]
    got = np.asarray(string_expectations(spec, state, strings))
    want = np.asarray([
        _generic_obs(psi, obs) for obs in strings
    ])
    np.testing.assert_allclose(got, want, atol=1e-8)

    # explicit [d, d] matrices give the same values as the letters
    mats = [np.asarray(op_matrix(c, 2)) for c in "ZXZ"]
    got_m = np.asarray(
        string_expectations(spec, state, [(mats, [(2, 1), (2, 2), (2, 3)])])
    )
    np.testing.assert_allclose(got_m, want[1], atol=1e-10)

    # distance-1 ZZ agrees with the two-point path correlator
    z = np.asarray(op_matrix("Z", 2))
    pc = np.asarray(
        path_correlations(spec, state, [((1, 1), (1, 2))], z)
    )
    np.testing.assert_allclose(got[0], pc[0], atol=1e-10)

    # branching vertex sets are fenced to the generic engine
    import pytest

    with pytest.raises(ValueError, match="revisits"):
        make_string_expectation_fn(
            spec, [("ZZZ", [(1, 2), (2, 1), (1, 2)])]
        )


def _generic_obs(psi, obs):
    ops, verts = obs
    return tnqs.expect(
        psi,
        (ops, list(verts)),
        alg="bp",
        cache_update_kwargs=dict(maxiter=400, tolerance=1e-14),
    )


def test_string_expectations_tree_exact():
    """On a tree BP is exact: string expectations match alg="exact"."""
    from tensornetworkquantumsimulator_tpu.parallel import string_expectations
    from tensornetworkquantumsimulator_tpu.utils.lattices import named_comb_tree

    gt = named_comb_tree((3, 3))
    psi, spec, state = _converged(gt, seed=12)
    verts = [(1, 1), (2, 1), (3, 1)]  # the comb's spine: a path
    got = complex(string_expectations(spec, state, [("ZXZ", verts)])[0])
    want = complex(tnqs.expect(psi, ("ZXZ", verts), alg="exact"))
    np.testing.assert_allclose(got, want, atol=1e-9)
