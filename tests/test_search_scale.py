"""Structure search on larger targets: quality bounds (not state counts)
and the batched-preprocess path."""

import numpy as np

from tensor_networks_tpu import Index, Tensor, TensorNetwork
from tensor_networks_tpu.search import SearchConfig, SearchEngine


def _low_rank_target(sizes, rank, seed):
    """A dense tensor with exact TT ranks ``rank`` plus small noise."""
    np.random.seed(seed)
    indices = [Index(f"I{k}", s) for k, s in enumerate(sizes)]
    tt = TensorNetwork.rand_tt(indices, [rank] * (len(sizes) - 1))
    dense = np.asarray(tt.contract().value)
    dense = dense / np.linalg.norm(dense)
    net = TensorNetwork()
    net.add_node("G", Tensor(dense, indices))
    return net, dense


def _check(stats, net, dense, eps):
    bn = stats["best_network"]
    free = net.free_indices()
    bn_free = bn.free_indices()
    perm = [bn_free.index(i) for i in free]
    got = np.asarray(bn.contract().permute(perm).value)
    assert np.linalg.norm(got - dense) <= eps * np.linalg.norm(dense) * 1.01
    assert bn.cost() <= net.cost()
    return bn


def test_partition_search_5d_low_rank():
    net, dense = _low_rank_target([3, 4, 5, 3, 2], 2, seed=5)
    config = SearchConfig()
    config.engine.eps = 0.2
    config.engine.max_ops = 4
    engine = SearchEngine(config=config)
    stats = engine.partition_search(net)
    bn = _check(stats, net, dense, 0.2)
    # a rank-2-ish structure must compress well below dense storage
    assert stats["cr_core"] > 1.5


def test_dfs_search_4d():
    net, dense = _low_rank_target([3, 4, 3, 2], 2, seed=6)
    config = SearchConfig()
    config.engine.eps = 0.3
    config.engine.max_ops = 3
    stats = SearchEngine(config=config).dfs(net)
    _check(stats, net, dense, 0.3)
