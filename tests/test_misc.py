"""Coverage for the remaining inventory: constructors, function adapters,
fixed-shape rounding modes, serialization files, drawing, profiling."""

import os
import tempfile

import numpy as np
import pytest

from tensor_networks_tpu import (
    Index,
    Tensor,
    TensorNetwork,
    tt_rank1,
    tt_separable,
    vector,
)
from tensor_networks_tpu.cross import FuncData, FuncTensorNetwork
from tensor_networks_tpu.ops.fast import tt_round_fixed
from tensor_networks_tpu.profiling import Timer

np.random.seed(11)


def test_tt_rank1_contracts_to_outer_product():
    indices = [Index("i", 3), Index("j", 4), Index("k", 5)]
    vals = [np.random.randn(3), np.random.randn(4), np.random.randn(5)]
    tt = tt_rank1(indices, vals)
    dense = np.asarray(tt.contract().value)
    expected = np.einsum("i,j,k->ijk", *vals)
    assert np.allclose(dense, expected, atol=1e-14)
    assert tt.ranks() == [1, 1]


def test_tt_separable_is_sum_of_univariates():
    indices = [Index("i", 3), Index("j", 4), Index("k", 5)]
    funcs = [np.random.randn(3), np.random.randn(4), np.random.randn(5)]
    tt = tt_separable(indices, funcs)
    dense = np.asarray(tt.contract().value)
    expected = (
        funcs[0][:, None, None]
        + funcs[1][None, :, None]
        + funcs[2][None, None, :]
    )
    assert np.allclose(dense, expected, atol=1e-14)
    assert tt.ranks() == [2, 2]


def test_vector_network():
    idx = Index("i", 7)
    v = np.random.randn(7)
    net = vector("v", idx, v)
    assert np.allclose(np.asarray(net.contract().value), v)


def test_func_data_and_func_network():
    indices = [
        Index("i", 4, tuple(range(4))),
        Index("j", 5, tuple(range(5))),
    ]
    data = np.random.randn(4, 5)
    f = FuncData(indices, data)
    pts = np.stack(np.meshgrid(range(4), range(5)), -1).reshape(-1, 2)
    assert np.allclose(f(pts), data[pts[:, 0], pts[:, 1]])
    assert f.num_calls() == 20
    assert f.size() == 20
    assert f.shape == [4, 5]
    assert f.cost() == 20

    net = TensorNetwork()
    net.add_node("x", Tensor(data, list(indices)))
    g = FuncTensorNetwork(indices, net)
    assert np.allclose(np.asarray(g(pts)), data[pts[:, 0], pts[:, 1]])
    assert g.cost() == net.cost()

    # mixed mode sizes: an index into the pad region of the smaller
    # mode must fail loudly, never read the 0.0 pad
    import pytest

    with pytest.raises(IndexError):
        f(np.array([[4, 0]]))  # 4 is the pad region of mode "i" (size 4)
    with pytest.raises(IndexError):
        f(np.array([[-1, 0]]))


def test_tt_round_fixed_modes_agree():
    d, n, r = 7, 5, 3
    indices = [Index(f"x{i}", n) for i in range(d)]
    tt = TensorNetwork.rand_tt(indices, [r] * (d - 1))
    tt2 = tt + tt
    dense = np.asarray(tt2.contract().value)
    for method in ("svd", "gram"):
        out, ranks = tt_round_fixed(tt2, 1e-8, method=method)
        got = np.asarray(out.contract().value)
        assert np.allclose(got, dense, atol=1e-10), method
        assert max(ranks) <= r, (method, ranks)


def test_save_load_npz_roundtrip():
    indices = [Index("i", 3), Index("j", 4), Index("k", 5)]
    tt = TensorNetwork.rand_tt(indices, [2, 2])
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "net")
        tt.save_npz(path)
        back = TensorNetwork.load_npz(path)
    assert back.ranks() == tt.ranks()
    assert np.allclose(
        np.asarray(back.contract().value),
        np.asarray(tt.contract().value),
        atol=1e-14,
    )


def test_draw_smoke():
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    indices = [Index("i", 3), Index("j", 4), Index("k", 5)]
    tt = TensorNetwork.rand_tt(indices, [2, 2])
    fig, ax = plt.subplots()
    tt.draw(ax=ax)
    plt.close(fig)


def test_profiling_timer():
    t = Timer()
    with t.section("a"):
        sum(range(1000))
    with t.section("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.summary()


def test_compress_folds_reshape_nodes():
    # a node whose one leg equals the product of its other legs is an
    # exact reshape and must be folded away
    net = TensorNetwork()
    core = np.random.randn(3, 4)
    resh = np.random.randn(12, 3, 4).reshape(12, 12) @ np.eye(12)
    net.add_node("a", Tensor(core.reshape(3, 4), [Index("i", 3), Index("b", 4)]))
    net.add_node(
        "b", Tensor(np.random.randn(4, 2, 2), [Index("b", 4), Index("x", 2), Index("y", 2)])
    )
    net.add_edge("a", "b")
    before = np.asarray(net.contract().value)
    n_before = len(list(net.network.nodes))
    net.compress()
    after = np.asarray(net.contract().value)
    # "b" has leg b of size 4 == 2*2 product -> merged
    assert len(list(net.network.nodes)) < n_before
    free = net.free_indices()
    assert np.allclose(np.sort(before.ravel()), np.sort(after.ravel()))
