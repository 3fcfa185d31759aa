"""PackedTT (static-shape device TT algebra) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensor_networks_tpu import Index, TensorNetwork, ttop_rank1, ttop_apply
from tensor_networks_tpu.ops import packed as pk

np.random.seed(21)


def _tt(d, n, r, seed=0):
    np.random.seed(seed)
    indices = [Index(f"x{i}", n) for i in range(d)]
    return TensorNetwork.rand_tt(indices, [r] * (d - 1))


def test_pack_unpack_roundtrip():
    tt = _tt(5, 4, 3)
    p = pk.pack(tt)
    back = pk.unpack(p)
    assert np.allclose(
        np.asarray(back.contract().value),
        np.asarray(tt.contract().value),
        atol=1e-13,
    )


def test_packed_inner_norm_scale():
    a, b = _tt(5, 4, 3, 1), _tt(5, 4, 3, 2)
    pa, pb = pk.pack(a), pk.pack(b)
    assert np.isclose(float(pk.inner(pa, pb)), float(a.inner(b)), rtol=1e-12)
    assert np.isclose(float(pk.norm(pa)), a.norm(), rtol=1e-12)
    assert np.isclose(
        float(pk.inner(pk.scale(pa, 2.5), pb)),
        2.5 * float(a.inner(b)),
        rtol=1e-12,
    )


def test_packed_add():
    a, b, c = _tt(5, 4, 2, 3), _tt(5, 4, 3, 4), _tt(5, 4, 2, 5)
    s = pk.add(pk.pack(a), pk.pack(b), pk.pack(c))
    assert s.rank == 7
    dense = (
        np.asarray(a.contract().value)
        + np.asarray(b.contract().value)
        + np.asarray(c.contract().value)
    )
    got = np.asarray(pk.unpack(s).contract().value)
    assert np.allclose(got, dense, atol=1e-12)


def test_packed_ttop_apply():
    d, n = 4, 5
    indices_in = [Index(f"i{k}", n) for k in range(d)]
    indices_out = [Index(f"o{k}", n) for k in range(d)]
    mats = [np.random.randn(n, n) for _ in range(d)]
    ttop = ttop_rank1(indices_in, indices_out, mats, "A")
    tt = TensorNetwork.rand_tt(indices_in, [3] * (d - 1))
    ref = np.asarray(ttop_apply(ttop, tt).contract().value)

    op = pk.PackedTTOp(
        first=jnp.asarray(mats[0])[:, :, None],
        mids=jnp.stack(
            [jnp.asarray(m)[None, :, :, None] for m in mats[1:-1]]
        ),
        last=jnp.asarray(mats[-1])[None, :, :],
    )
    got = np.asarray(
        pk.unpack(pk.ttop_apply_packed(op, pk.pack(tt))).contract().value
    )
    assert np.allclose(got, ref, atol=1e-12)


def test_packed_hadamard():
    a, b = _tt(5, 4, 2, 11), _tt(5, 4, 3, 12)
    h = pk.hadamard(pk.pack(a), pk.pack(b))
    assert h.rank == 6
    dense = np.asarray(a.contract().value) * np.asarray(b.contract().value)
    got = np.asarray(pk.unpack(h).contract().value)
    assert np.allclose(got, dense, atol=1e-12)


def test_rand_round_recovers_low_rank():
    tt = _tt(6, 4, 3, 6)
    doubled = pk.add(pk.pack(tt), pk.pack(tt))  # rank 6, true rank 3
    key = jax.random.PRNGKey(0)
    rounded = pk.rand_round(doubled, 3, key)
    assert rounded.rank == 3
    dense = 2 * np.asarray(tt.contract().value)
    got = np.asarray(pk.unpack(rounded).contract().value)
    assert np.allclose(got, dense, atol=1e-10)


def test_gmres_packed():
    d, n = 3, 6
    indices_in = [Index(f"i{k}", n) for k in range(d)]
    indices_out = [Index(f"o{k}", n) for k in range(d)]
    # well-conditioned operator: I + 0.1*random on the first mode
    a = np.eye(n) + 0.1 * np.random.randn(n, n)
    mats = [a, np.eye(n), np.eye(n)]
    op = pk.PackedTTOp(
        first=jnp.asarray(mats[0])[:, :, None],
        mids=jnp.stack(
            [jnp.asarray(m)[None, :, :, None] for m in mats[1:-1]]
        ),
        last=jnp.asarray(mats[-1])[None, :, :],
    )
    rhs = pk.pack(_tt(d, n, 3, 7))
    x0 = pk.pack(_tt(d, n, 3, 8))
    x, resid = pk.gmres_packed(op, rhs, x0, eps=1e-8, rank=6, maxiter=25)
    assert resid < 1e-5 * float(pk.norm(rhs))
