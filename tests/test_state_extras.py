"""Coverage for less-traveled search/cross paths: multi-candidate
truncation enumeration, Merge actions, and cross initialization/known."""

import numpy as np

from tensor_networks_tpu import Index, Tensor, TensorNetwork
from tensor_networks_tpu.search import (
    ISplit,
    Merge,
    SearchConfig,
    SearchState,
)


def _single_node(seed=8):
    np.random.seed(seed)
    data = np.random.randn(4, 5, 6)
    net = TensorNetwork()
    net.add_node(
        "G", Tensor(data, [Index("i", 4), Index("j", 5), Index("k", 6)])
    )
    return net


def test_truncate_enumerates_multiple_ranks():
    net = _single_node()
    # generous budget so several tail blocks fit
    st = SearchState(net, net.norm() * 0.9)
    config = SearchConfig()
    config.rank_search.error_split_stepsize = 3

    succs = list(st.take_action(ISplit("G", [0]), config=config))
    assert 1 <= len(succs) <= 3
    ranks = []
    for s in succs:
        bonds = s.network.inner_indices()
        assert len(bonds) == 1
        ranks.append(bonds[0].size)
    # enumerated candidates must be distinct ranks
    assert len(set(ranks)) == len(ranks)
    # all stay within the budget
    target = np.asarray(net.contract().value)
    for s in succs:
        free = net.free_indices()
        got = s.network.contract()
        perm = [got.indices.index(i) for i in free]
        got = np.asarray(got.permute(perm).value)
        assert np.linalg.norm(got - target) <= st.curr_delta * 1.001


def test_merge_action():
    net = _single_node()
    st = SearchState(net, net.norm() * 0.5)
    config = SearchConfig()
    # split first so there is something to merge
    split_states = list(st.take_action(ISplit("G", [0]), config=config))
    st2 = split_states[0]
    nodes = list(st2.network.network.nodes)
    u, v = st2.network.network.edges()[0]

    merged_states = list(st2.take_action(Merge(u, v), config=config))
    assert len(merged_states) == 1
    m = merged_states[0]
    assert len(list(m.network.network.nodes)) == len(nodes) - 1
    # represented tensor unchanged by the merge
    free = net.free_indices()
    got = m.network.contract()
    perm = [got.indices.index(i) for i in free]
    got = np.asarray(got.permute(perm).value)
    ref = st2.network.contract()
    ref = np.asarray(ref.permute([ref.indices.index(i) for i in free]).value)
    assert np.allclose(got, ref, atol=1e-12)


def test_cross_with_initialization_and_known():
    from tensor_networks_tpu.cross import (
        CachedFunc,
        CrossApproximation,
        CrossConfig,
    )

    class Rank1(CachedFunc):
        def _run(self, args):
            return np.exp(np.sum(args, axis=1))

    np.random.seed(5)
    indices = [
        Index("i", 6, tuple(np.linspace(0, 1, 6))),
        Index("j", 6, tuple(np.linspace(0, 1, 6))),
        Index("k", 6, tuple(np.linspace(0, 1, 6))),
    ]
    func = Rank1(indices)
    net = TensorNetwork.rand_tt(func.indices, [1, 1])

    init = np.random.randint(0, 6, size=(2, 3))
    known = np.random.randint(0, 6, size=(50, 3))
    engine = CrossApproximation(func, CrossConfig(kickrank=1))
    res = engine.cross(net, eps=1e-8, initialization=init, known=known)

    grid = np.stack(np.meshgrid(*[range(6)] * 3), -1).reshape(-1, 3)
    real = np.asarray(func(grid))
    approx = np.asarray(res.net.evaluate(func.indices, grid))
    assert np.linalg.norm(real - approx) / np.linalg.norm(real) <= 1e-7
    assert len(res.ranks_and_errors) >= 1
