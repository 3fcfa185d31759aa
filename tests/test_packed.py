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


def _ragged_tt(d, n, ranks, seed=7):
    np.random.seed(seed)
    indices = [Index(f"x{i}", n) for i in range(d)]
    return TensorNetwork.rand_tt(indices, list(ranks))


def test_pack_ragged_norm_parity():
    """Zero-padded ragged packing represents the same tensor."""
    tt = _ragged_tt(6, 5, [2, 3, 4, 3, 2])
    p = pk.pack_ragged(tt)
    assert p is not None and p.rank == 32  # padded to the bucket floor
    dense = np.asarray(tt.contract().value).reshape(-1)
    assert np.isclose(
        float(pk.norm_exact(p)), np.linalg.norm(dense), rtol=1e-10
    )
    # inner parity against an independently packed second train
    other = _ragged_tt(6, 5, [3, 2, 5, 2, 3], seed=8)
    q = pk.pad_rank(pk.pack_ragged(other), p.rank)
    dense_q = np.asarray(other.contract().value).reshape(-1)
    assert np.isclose(
        float(pk.inner(p, q)), float(dense.dot(dense_q)), rtol=1e-10
    )


def test_pack_ragged_rejects_non_chains():
    indices = [Index(f"x{i}", 4) for i in range(4)]
    assert pk.pack_ragged(TensorNetwork.rand_tucker(indices)) is None
    assert pk.pack_ragged(TensorNetwork.rand_ht(indices, 2)) is None
    # d=2 chains have no middle cores
    short = TensorNetwork.rand_tt([Index("a", 4), Index("b", 4)], [2])
    assert pk.pack_ragged(short) is None


def test_pad_rank_inert():
    tt = _tt(5, 4, 3, seed=11)
    p = pk.pack(tt)
    grown = pk.pad_rank(p, 9)
    assert grown.rank == 9
    assert np.isclose(
        float(pk.norm_exact(grown)), float(pk.norm_exact(p)), rtol=1e-12
    )
    with pytest.raises(ValueError):
        pk.pad_rank(p, 2)


def test_cross_norm_check_uses_packed_path():
    """The cross NORM convergence metric matches the graph computation
    and actually takes the packed fast path for chain iterates."""
    from tensor_networks_tpu.cross.cross import _norm_diff_packed

    a = _ragged_tt(5, 4, [2, 3, 3, 2], seed=3)
    b = _ragged_tt(5, 4, [3, 2, 2, 3], seed=4)
    fast = _norm_diff_packed(a, b)
    assert fast is not None
    graph = float((a - b).norm() / a.norm())
    assert np.isclose(fast, graph, rtol=1e-10)


def test_pack_ragged_mixed_modes_norm():
    """Mode-axis padding is numerically inert: norm_exact of a
    mixed-mode chain equals the densified f64 norm."""
    import numpy as np

    from tensor_networks_tpu import Index, TensorNetwork
    from tensor_networks_tpu.ops.packed import norm_exact, pack_ragged

    np.random.seed(21)
    sizes = [2, 5, 3, 4]
    inds = [Index(f"q{k}", s) for k, s in enumerate(sizes)]
    net = TensorNetwork.rand_tt(inds, [2, 3, 2])
    pk = pack_ragged(net)
    assert pk is not None and pk.mode == 5
    dense = np.asarray(net.contract().value, np.float64)
    assert np.isclose(
        float(norm_exact(pk)), np.linalg.norm(dense), rtol=1e-6
    )


def test_ttop_add_mixed_ranks_matches_separate_applies():
    """ttop_add of operators with DIFFERENT bond ranks: applying the
    sum equals adding the separate applications (exact block algebra)."""
    import jax.numpy as jnp

    from tensor_networks_tpu.ops import packed as pk

    rng = np.random.default_rng(17)
    d, n, r = 5, 3, 4

    def rand_op(R, seed):
        g = np.random.default_rng(seed)
        return pk.PackedTTOp(
            jnp.asarray(g.standard_normal((n, n, R))),
            jnp.asarray(g.standard_normal((d - 2, R, n, n, R))),
            jnp.asarray(g.standard_normal((R, n, n))),
        )

    op_a, op_b = rand_op(2, 1), rand_op(3, 2)
    x = pk.PackedTT(
        jnp.asarray(rng.standard_normal((n, r))),
        jnp.asarray(rng.standard_normal((d - 2, r, n, r))),
        jnp.asarray(rng.standard_normal((r, n))),
    )
    both = pk.ttop_apply_packed(pk.ttop_add(op_a, op_b), x)
    sep = pk.add(
        pk.ttop_apply_packed(op_a, x), pk.ttop_apply_packed(op_b, x)
    )
    # compare by inner products against a third random train
    probe = pk.PackedTT(
        jnp.asarray(rng.standard_normal((n, 2))),
        jnp.asarray(rng.standard_normal((d - 2, 2, n, 2))),
        jnp.asarray(rng.standard_normal((2, n))),
    )
    va = float(pk.inner(both, probe))
    vb = float(pk.inner(sep, probe))
    assert np.isclose(va, vb, rtol=1e-10), (va, vb)

    # shape-mismatch guard
    bad = rand_op(2, 3)
    bad = pk.PackedTTOp(bad.first, bad.mids[:, :, :, : n - 1, :], bad.last)
    with pytest.raises(ValueError):
        pk.ttop_add(op_a, bad)


def test_ttop_round_compresses_inflated_sum():
    """ttop_round must collapse a block-diagonal-inflated operator
    (A + A - A, structural rank 3R) back to at most the rank of A,
    preserving the applied action to roundoff."""
    import jax.numpy as jnp

    from tensor_networks_tpu.ops import packed as pk

    rng = np.random.default_rng(23)
    d, n, r, R = 5, 3, 4, 3
    g = np.random.default_rng(7)
    op = pk.PackedTTOp(
        jnp.asarray(g.standard_normal((n, n, R))),
        jnp.asarray(g.standard_normal((d - 2, R, n, n, R))),
        jnp.asarray(g.standard_normal((R, n, n))),
    )
    neg = pk.PackedTTOp(-op.first, op.mids, op.last)
    big = pk.ttop_add(op, op, neg)  # == A at structural rank 3R
    small = pk.ttop_round(big, 1e-12)
    assert small.first.shape[-1] <= R, small.first.shape

    x = pk.PackedTT(
        jnp.asarray(rng.standard_normal((n, r))),
        jnp.asarray(rng.standard_normal((d - 2, r, n, r))),
        jnp.asarray(rng.standard_normal((r, n))),
    )
    ya = pk.ttop_apply_packed(op, x)
    yb = pk.ttop_apply_packed(small, x)
    rel = float(pk.norm_exact(pk.add(ya, pk.scale(yb, -1.0)))) / float(
        pk.norm_exact(ya)
    )
    assert rel < 1e-10, rel


def test_ttop_compose_and_transpose_oracles():
    """ttop_compose(A, B) applies as A∘B; ttop_transpose is the
    adjoint under the train inner product."""
    import jax.numpy as jnp

    from tensor_networks_tpu.ops import packed as pk

    g = np.random.default_rng(5)
    d, n, r = 5, 3, 4

    def rand_op(R, seed):
        h = np.random.default_rng(seed)
        return pk.PackedTTOp(
            jnp.asarray(h.standard_normal((n, n, R))),
            jnp.asarray(h.standard_normal((d - 2, R, n, n, R))),
            jnp.asarray(h.standard_normal((R, n, n))),
        )

    A, B = rand_op(2, 1), rand_op(3, 2)
    x = pk.PackedTT(
        jnp.asarray(g.standard_normal((n, r))),
        jnp.asarray(g.standard_normal((d - 2, r, n, r))),
        jnp.asarray(g.standard_normal((r, n))),
    )
    y1 = pk.ttop_apply_packed(pk.ttop_compose(A, B), x)
    y2 = pk.ttop_apply_packed(A, pk.ttop_apply_packed(B, x))
    rel = float(pk.norm_exact(pk.add(y1, pk.scale(y2, -1.0)))) / float(
        pk.norm_exact(y2)
    )
    assert rel < 1e-12, rel
    assert pk.ttop_compose(A, B).first.shape[-1] == 6  # ranks multiply

    y = pk.PackedTT(
        jnp.asarray(g.standard_normal((n, 2))),
        jnp.asarray(g.standard_normal((d - 2, 2, n, 2))),
        jnp.asarray(g.standard_normal((2, n))),
    )
    v1 = float(pk.inner(pk.ttop_apply_packed(A, x), y))
    v2 = float(pk.inner(x, pk.ttop_apply_packed(pk.ttop_transpose(A), y)))
    assert abs(v1 - v2) < 1e-10 * abs(v1), (v1, v2)

    bad = rand_op(2, 3)
    bad = pk.PackedTTOp(bad.first, bad.mids[:1], bad.last)
    with pytest.raises(ValueError):
        pk.ttop_compose(A, bad)


def test_pack_ttop_matches_graph_apply():
    """pack_ttop lifts a graph operator network into the packed layout:
    the packed apply densifies identically to the graph ttop_apply,
    including when node axes are arbitrarily permuted (index-identity
    packing) and when summand bond ranks are ragged (zero padding)."""
    import jax.numpy as jnp

    import tensor_networks_tpu as tnt
    from tensor_networks_tpu.ops import packed as pk
    from tensor_networks_tpu.ops.ttop import ttop_apply

    rng = np.random.RandomState(3)
    d, n = 4, 5
    ins = [tnt.Index(f"x{i}", n) for i in range(d)]
    outs = [tnt.Index(f"y{i}", n) for i in range(d)]
    mats = [0.3 * rng.randn(n, n) / np.sqrt(n) for _ in range(d)]
    opn = tnt.ttop_sum(
        ins, outs, [[np.eye(n) for _ in range(d)], mats], "A"
    )
    # scramble node axis orders on a copy: packing must key on index
    # identity (the positional graph ttop_apply keeps the original)
    import copy as _copy

    scrambled = _copy.deepcopy(opn)
    for node in list(scrambled.network.nodes):
        t0 = scrambled.node_tensor(node)
        pm = list(rng.permutation(len(t0.indices)))
        scrambled.set_node_tensor(node, t0.permute(pm))
    P = pk.pack_ttop(scrambled, outs, ins, dtype=jnp.float64)

    x = tnt.TensorNetwork.rand_tt(ins, [3] * (d - 1))
    xp = pk.pack(x, jnp.float64)
    t = ttop_apply(opn, x).contract()
    perm = [t.indices.index(i) for i in ins]
    dense_graph = np.asarray(t.value).transpose(perm).reshape(-1)
    dense_packed = np.asarray(
        pk.unpack(pk.ttop_apply_packed(P, xp)).contract().value
    ).reshape(-1)
    assert (
        np.linalg.norm(dense_graph - dense_packed)
        / np.linalg.norm(dense_graph)
        < 1e-12
    )
