"""Dense named-index tensors.

TPU-native replacement for the dense-`ITensor` subset the reference relies on
(contraction `*`, `dag`, `prime`, `delta`, `onehot`, `random_itensor`,
`replaceinds`, `noprime`, elementwise algebra; see
`/root/reference/src/imports.jl` and usage throughout `/root/reference/src/`).

A :class:`Tensor` is a pytree: the data is an array leaf and the index
tuple is static metadata, so closures over Tensors can be ``jax.jit``-ed and
``vmap``-ed.  All pairwise contractions lower to a single einsum.

Dual backend: numpy data stays on numpy (the generic eager engine — no XLA
compile per op, which matters because evolving bond dimensions would force
a fresh compile for nearly every shape), jax data stays on jax (jitted
contexts).  Mixing promotes to jax.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .index import Index, commoninds, uniqueinds

# numerics-critical contractions want full f32 accumulation on the MXU
_PRECISION = jax.lax.Precision.HIGHEST


def _canonical_dtype(dtype):
    """Map a requested dtype to what JAX will actually produce (x64 gating)."""
    return jnp.zeros((), dtype=dtype).dtype


def _is_np(*arrays) -> bool:
    return all(isinstance(a, np.ndarray) for a in arrays)


def _conj(a):
    return np.conj(a) if isinstance(a, np.ndarray) else jnp.conj(a)


def _weak_scalar(x):
    """Coerce numpy scalars to weakly-typed Python numbers so scalar algebra
    never widens the tensor dtype (np.float64 * complex64 -> complex128).
    Note np.float64/np.complex128 subclass the Python types, so test for
    np.generic explicitly."""
    if isinstance(x, (np.generic, np.ndarray)):
        return x.item()
    return x


@jax.tree_util.register_pytree_node_class
class Tensor:
    """A dense tensor with named indices.

    ``data.shape[k] == inds[k].dim``. Index identity is ``(id, plev)``; two
    tensors sharing an index contract over it.
    """

    __slots__ = ("data", "inds")

    def __init__(self, data, inds: Sequence[Index]):
        if not isinstance(data, (jax.Array, np.ndarray)):
            data = np.asarray(data)
        inds = tuple(inds)
        if data.ndim != len(inds):
            raise ValueError(f"data ndim {data.ndim} != #inds {len(inds)}")
        for d, i in zip(data.shape, inds):
            if d != i.dim:
                raise ValueError(f"shape {data.shape} mismatches inds {inds}")
        if len(set(inds)) != len(inds):
            raise ValueError(f"duplicate index in {inds}")
        self.data = data
        self.inds = inds

    # -- pytree ------------------------------------------------------------
    def tree_flatten(self):
        return (self.data,), self.inds

    @classmethod
    def tree_unflatten(cls, inds, children):
        obj = object.__new__(cls)
        obj.data = children[0]
        obj.inds = inds
        return obj

    # -- basic info ----------------------------------------------------------
    @property
    def ndim(self) -> int:
        return len(self.inds)

    @property
    def shape(self):
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    def __repr__(self):
        return f"Tensor(inds={list(self.inds)}, dtype={self.dtype})"

    def scalar(self):
        """The value of a 0-index tensor (mirrors the reference's ``t[]``)."""
        if self.ndim != 0:
            raise ValueError(f"scalar() on tensor with inds {self.inds}")
        return self.data.item()

    def array(self, inds_order: Sequence[Index] | None = None):
        """Dense array, optionally permuted to the given index order."""
        if inds_order is None:
            return self.data
        inds_order = tuple(inds_order)
        if set(inds_order) != set(self.inds):
            raise ValueError("inds_order must be a permutation of inds")
        perm = tuple(self.inds.index(i) for i in inds_order)
        if isinstance(self.data, np.ndarray):
            return np.transpose(self.data, perm)
        return jnp.transpose(self.data, perm)

    # -- index transformations ---------------------------------------------
    def replaceinds(self, old, new) -> "Tensor":
        old, new = list(old), list(new)
        mapping = dict(zip(old, new))
        for o, n in zip(old, new):
            if o.dim != n.dim:
                raise ValueError(f"replaceinds dim mismatch {o} -> {n}")
        return Tensor(self.data, tuple(mapping.get(i, i) for i in self.inds))

    def replaceind(self, old: Index, new: Index) -> "Tensor":
        return self.replaceinds([old], [new])

    def prime(self, n: int = 1, which=None) -> "Tensor":
        which = set(self.inds if which is None else which)
        return Tensor(
            self.data, tuple(i.prime(n) if i in which else i for i in self.inds)
        )

    def noprime(self) -> "Tensor":
        new = tuple(i.noprime() for i in self.inds)
        if len(set(new)) != len(new):
            raise ValueError(f"noprime collides indices: {self.inds}")
        return Tensor(self.data, new)

    def dag(self) -> "Tensor":
        return Tensor(_conj(self.data), self.inds)

    def conj(self) -> "Tensor":
        return self.dag()

    # -- algebra -------------------------------------------------------------
    def _aligned_data(self, other: "Tensor"):
        if set(self.inds) != set(other.inds):
            raise ValueError(f"index mismatch: {self.inds} vs {other.inds}")
        return self.data, other.array(self.inds)

    def __add__(self, other):
        if isinstance(other, Tensor):
            a, b = self._aligned_data(other)
            return Tensor(a + b, self.inds)
        return NotImplemented

    def __sub__(self, other):
        if isinstance(other, Tensor):
            a, b = self._aligned_data(other)
            return Tensor(a - b, self.inds)
        return NotImplemented

    def __neg__(self):
        return Tensor(-self.data, self.inds)

    def __mul__(self, other):
        if isinstance(other, Tensor):
            return contract_pair(self, other)
        return Tensor(self.data * _weak_scalar(other), self.inds)

    def __rmul__(self, other):
        if isinstance(other, Tensor):
            return contract_pair(other, self)
        return Tensor(self.data * _weak_scalar(other), self.inds)

    def __truediv__(self, other):
        if isinstance(other, Tensor):
            raise TypeError("use contraction with an inverted tensor")
        return Tensor(self.data / _weak_scalar(other), self.inds)

    def norm(self):
        if isinstance(self.data, np.ndarray):
            return float(np.linalg.norm(self.data.reshape(-1)))
        return jnp.linalg.norm(self.data.reshape(-1)).item()

    def normalize(self) -> "Tensor":
        if isinstance(self.data, np.ndarray):
            n = np.linalg.norm(self.data.reshape(-1))
        else:
            n = jnp.linalg.norm(self.data.reshape(-1))
        return Tensor(self.data / n, self.inds)

    def sum_entries(self):
        if isinstance(self.data, np.ndarray):
            return np.sum(self.data).item()
        return jnp.sum(self.data).item()

    def isreal(self) -> bool:
        return not np.iscomplexobj(self.data) if isinstance(
            self.data, np.ndarray
        ) else not jnp.iscomplexobj(self.data)

    def astype(self, dtype) -> "Tensor":
        dtype = _canonical_dtype(dtype)
        data = self.data
        if np.iscomplexobj(data) and not jnp.issubdtype(dtype, jnp.complexfloating):
            data = data.real
        return Tensor(data.astype(dtype), self.inds)


# ---------------------------------------------------------------------------
# contraction
# ---------------------------------------------------------------------------

_EINSUM_LETTERS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"


def contract_pair(a: Tensor, b: Tensor, keep=()) -> Tensor:
    """Contract two tensors over their common indices (ITensor ``*``).

    Indices listed in ``keep`` are not summed even if shared (useful for
    hyper-edges during sequenced contraction).
    """
    keep = set(keep)
    common = [i for i in commoninds(a.inds, b.inds) if i not in keep]
    a_only = uniqueinds(a.inds, common)
    b_only = uniqueinds(b.inds, a.inds)
    letters = {}
    for i in list(a.inds) + list(b.inds):
        if i not in letters:
            letters[i] = _EINSUM_LETTERS[len(letters)]
    sub_a = "".join(letters[i] for i in a.inds)
    sub_b = "".join(letters[i] for i in b.inds)
    out_inds = tuple(a_only) + tuple(b_only)
    sub_out = "".join(letters[i] for i in out_inds)
    eq = f"{sub_a},{sub_b}->{sub_out}"
    if _is_np(a.data, b.data):
        data = np.einsum(eq, a.data, b.data, optimize=True)
    else:
        data = jnp.einsum(eq, a.data, b.data, precision=_PRECISION)
    return Tensor(data, out_inds)


def contract(tensors: Sequence[Tensor], sequence=None) -> Tensor:
    """Contract a list of tensors down to one.

    Assumes every index occurs in at most two tensors (the reference's
    implicit ITensor convention).  ``sequence`` is a pairwise path as
    produced by :func:`tnqs.ops.paths.contraction_sequence`; if ``None``
    a path is computed on the fly.
    """
    tensors = list(tensors)
    if not tensors:
        raise ValueError("empty contraction")
    if len(tensors) == 1:
        return tensors[0]
    if sequence is None:
        from .paths import contraction_sequence

        sequence = contraction_sequence(tensors)
    pool = list(tensors)
    for (i, j) in sequence:
        t = contract_pair(pool[i], pool[j])
        # ssa-style path: contracted operands are replaced by None, result appended
        pool[i] = None
        pool[j] = None
        pool.append(t)
    remaining = [t for t in pool if t is not None]
    out = remaining[0]
    for t in remaining[1:]:
        out = contract_pair(out, t)
    return out


# ---------------------------------------------------------------------------
# constructors
# ---------------------------------------------------------------------------


def delta(inds: Sequence[Index] | Index, dtype=jnp.float64) -> Tensor:
    """Generalized Kronecker delta: 1 where all indices are equal.

    Mirrors ITensors ``delta``/``denseblocks(delta(...))`` used for default BP
    messages (`tensornetwork.jl:62-64`, `tensornetworkstate.jl:64-67`).
    Rectangular deltas run the diagonal up to the smallest dimension.
    """
    if isinstance(inds, Index):
        inds = (inds,)
    inds = tuple(inds)
    dtype = _canonical_dtype(dtype)
    if len(inds) == 0:
        return Tensor(np.ones((), dtype=dtype), ())
    if len(inds) == 1:
        return Tensor(np.ones(inds[0].dim, dtype=dtype), inds)
    shape = tuple(i.dim for i in inds)
    k = min(shape)
    data = np.zeros(shape, dtype=np.float64)
    data[tuple(np.arange(k) for _ in shape)] = 1.0
    return Tensor(data.astype(dtype), inds)


def onehot(ind: Index, pos: int, dtype=jnp.float64) -> Tensor:
    """Basis vector e_pos on ``ind`` (0-based; ITensors ``onehot`` is 1-based)."""
    dtype = _canonical_dtype(dtype)
    data = np.zeros(ind.dim, dtype=dtype)
    data[pos] = 1.0
    return Tensor(data, (ind,))


def random_tensor(key, inds: Sequence[Index], dtype=jnp.float64) -> Tensor:
    """Gaussian random tensor (reference: ``random_itensor``)."""
    inds = tuple(inds)
    shape = tuple(i.dim for i in inds)
    dtype = _canonical_dtype(dtype)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        kr, ki = jax.random.split(key)
        rdt = jnp.float64 if dtype == jnp.complex128 else jnp.float32
        rdt = _canonical_dtype(rdt)
        data = jax.random.normal(kr, shape, rdt) + 1j * jax.random.normal(
            ki, shape, rdt
        )
        data = data.astype(dtype)
    else:
        data = jax.random.normal(key, shape, dtype)
    return Tensor(np.asarray(data), inds)


def from_array(arr, inds: Sequence[Index], dtype=None) -> Tensor:
    if not isinstance(arr, (jax.Array, np.ndarray)):
        arr = np.asarray(arr)
    if dtype is not None:
        arr = arr.astype(_canonical_dtype(dtype))
    return Tensor(arr, tuple(inds))


# ---------------------------------------------------------------------------
# tensor utilities used across the engines
# ---------------------------------------------------------------------------


def dot(a: Tensor, b: Tensor):
    """⟨a, b⟩ = Σ conj(a) b over the full (shared) index set."""
    return contract_pair(a.dag(), b).scalar()


def plev0_inds(t: Tensor):
    return [i for i in t.inds if i.plev == 0]


def trace(t: Tensor):
    """Full trace pairing each plev-0 index with its prime (rdm trace)."""
    out = t
    for i in plev0_inds(t):
        ip = i.prime()
        if ip in out.inds:
            out = contract_pair(out, delta((i, ip), dtype=out.dtype))
    return out.scalar()


def diagonal(t: Tensor):
    """Diagonal of a (i, i') two-index tensor as a 1-d array."""
    if t.ndim != 2:
        raise ValueError("diagonal expects a matrix tensor")
    if isinstance(t.data, np.ndarray):
        return np.diagonal(t.data)
    return jnp.diagonal(t.data)


def map_diag(f, t: Tensor) -> Tensor:
    """Apply f elementwise to the matrix diagonal, keep off-diagonals."""
    if t.ndim != 2:
        raise ValueError("map_diag expects a matrix tensor")
    if isinstance(t.data, np.ndarray):
        d = np.diagonal(t.data)
        return Tensor(t.data + np.diag(f(d) - d), t.inds)
    d = jnp.diagonal(t.data)
    return Tensor(t.data + jnp.diag(f(d) - d), t.inds)


def combiner(inds: Sequence[Index], dtype=jnp.float64, tags=("combined",)):
    """Index-fusing tensor: contracting it with a tensor reshapes the given
    indices into one combined index (ITensors ``combiner``)."""
    inds = tuple(inds)
    dims = tuple(i.dim for i in inds)
    total = int(np.prod(dims))
    comb = Index(total, tags=tags)
    data = np.eye(total, dtype=_canonical_dtype(dtype)).reshape(dims + (total,))
    return Tensor(data, inds + (comb,)), comb


def apply_op(o: Tensor, psi: Tensor) -> Tensor:
    """ITensors.apply(o, ψ): contract o's unprimed legs with ψ, then unprime.

    o carries index pairs (s', s); the result replaces each s with s' and is
    then unprimed back to s (`simple_update.jl:43`).
    """
    out = contract_pair(o, psi)
    return out.noprime()


def make_hermitian(t: Tensor) -> Tensor:
    """(A + A†)/2 for a 2-index message (`beliefpropagationcache.jl:123-127`)."""
    if t.ndim != 2:
        raise ValueError("make_hermitian expects a matrix tensor")
    i, j = t.inds
    swapped = Tensor(_conj(t.data).T, (i, j))
    return Tensor((t.data + swapped.data) / 2, t.inds)
