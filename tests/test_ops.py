"""Tensor-algebra substrate tests (ops layer)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tensornetworkquantumsimulator_tpu.ops import (
    Index,
    Tensor,
    apply_op,
    contract,
    contract_pair,
    contraction_sequence,
    delta,
    dot,
    from_array,
    onehot,
    pseudo_sqrt_inv_sqrt,
    qr_factor,
    random_tensor,
    svd_truncated,
)
import jax


def test_index_identity():
    i = Index(3)
    assert i == i and i.prime() != i
    assert i.prime().noprime() == i
    assert i.sim() != i and i.sim().dim == 3
    assert i.dag() == i


def test_pair_contraction_matches_einsum():
    i, j, k = Index(2), Index(3), Index(4)
    a = random_tensor(jax.random.PRNGKey(0), (i, j))
    b = random_tensor(jax.random.PRNGKey(1), (j, k))
    c = contract_pair(a, b)
    assert set(c.inds) == {i, k}
    np.testing.assert_allclose(
        np.asarray(c.array((i, k))), np.asarray(a.data) @ np.asarray(b.data), rtol=1e-12
    )


def test_outer_product_and_scalars():
    i, j = Index(2), Index(2)
    a = from_array(np.array([1.0, 2.0]), (i,))
    b = from_array(np.array([3.0, 4.0]), (j,))
    c = contract_pair(a, b)
    assert c.shape == (2, 2)
    s = contract_pair(a, from_array(np.array([1.0, 1.0]), (i,)))
    assert s.scalar() == 3.0


def test_contract_list_with_path():
    inds = [Index(2) for _ in range(4)]
    ts = [
        random_tensor(jax.random.PRNGKey(n), (inds[n], inds[(n + 1) % 4]))
        for n in range(4)
    ]
    seq = contraction_sequence(ts, alg="optimal")
    ring = contract(ts, seq).scalar()
    dense = np.einsum(
        "ab,bc,cd,da->",
        *[np.asarray(t.data) for t in ts],
    )
    np.testing.assert_allclose(ring, dense, rtol=1e-10)


def test_delta_and_onehot():
    i, j = Index(3), Index(3)
    d = delta((i, j))
    np.testing.assert_array_equal(np.asarray(d.data), np.eye(3))
    o = onehot(i, 1)
    np.testing.assert_array_equal(np.asarray(o.data), [0, 1, 0])


def test_apply_op():
    s = Index(2)
    x = from_array(np.array([[0.0, 1.0], [1.0, 0.0]]), (s.prime(), s))
    up = onehot(s, 0)
    down = apply_op(x, up)
    assert down.inds == (s,)
    np.testing.assert_array_equal(np.asarray(down.data), [0.0, 1.0])


def test_svd_truncated_roundtrip():
    i, j = Index(6), Index(5)
    t = random_tensor(jax.random.PRNGKey(2), (i, j))
    x, y, s, err, bond = svd_truncated(t, [i])
    assert err < 1e-12
    recon = contract_pair(x, y)
    np.testing.assert_allclose(
        np.asarray(recon.array((i, j))), np.asarray(t.data), rtol=1e-10, atol=1e-12
    )
    # truncation error accounting
    x2, y2, s2, err2, bond2 = svd_truncated(t, [i], maxdim=2)
    assert bond2.dim == 2 and err2 > 0


def test_qr_factor():
    i, j, k = Index(2), Index(3), Index(4)
    t = random_tensor(jax.random.PRNGKey(3), (i, j, k))
    q, r = qr_factor(t, [i, j])
    recon = contract_pair(q, r)
    np.testing.assert_allclose(
        np.asarray(recon.array((i, j, k))), np.asarray(t.data), rtol=1e-10, atol=1e-12
    )


def test_pseudo_sqrt_inv_sqrt():
    i = Index(4)
    m = random_tensor(jax.random.PRNGKey(4), (i, i.prime()))
    arr = np.asarray(m.data)
    psd = arr @ arr.T
    m = from_array(psd, (i, i.prime()))
    ms, mis = pseudo_sqrt_inv_sqrt(m)
    np.testing.assert_allclose(
        np.asarray(ms.data) @ np.asarray(ms.data), psd, rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(ms.data) @ np.asarray(mis.data), np.eye(4), rtol=1e-8, atol=1e-8
    )


def test_dtype_promotion_complex():
    i = Index(2)
    a = random_tensor(jax.random.PRNGKey(5), (i,), dtype=jnp.complex64)
    assert a.dtype == jnp.complex64
    assert a.dag().data.dtype == jnp.complex64
    np.testing.assert_allclose(
        np.asarray(a.dag().data), np.conj(np.asarray(a.data))
    )
