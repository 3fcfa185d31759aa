"""Search pruning-heuristic flags: duplicates and full-rank pruning."""

import numpy as np

from tensor_networks_tpu import Index, Tensor, TensorNetwork
from tensor_networks_tpu.search import SearchConfig, SearchEngine


def _single_node_net(seed=1):
    np.random.seed(seed)
    data = np.random.randn(3, 4, 5)
    indices = [Index("i", 3), Index("j", 4), Index("k", 5)]
    net = TensorNetwork()
    net.add_node("G", Tensor(data, indices))
    return net


def test_bfs_prune_duplicates_reduces_work():
    base = SearchConfig()
    base.engine.eps = 0.5
    stats_all = SearchEngine(config=base).bfs(_single_node_net())

    pruned = SearchConfig()
    pruned.engine.eps = 0.5
    pruned.heuristics.prune_duplicates = True
    pruned.heuristics.prune_by_ranks = False
    stats_pruned = SearchEngine(config=pruned).bfs(_single_node_net())

    assert stats_pruned["count"] <= stats_all["count"]
    # quality preserved
    assert stats_pruned["best_network"].cost() <= _single_node_net().cost()


def test_dfs_prune_full_rank():
    config = SearchConfig()
    config.engine.eps = 1e-12  # nothing truncates -> all splits full rank
    config.heuristics.prune_full_rank = True
    stats = SearchEngine(config=config).dfs(_single_node_net())
    # with every split full-rank and pruned, search terminates quickly
    # and the best network stays the original
    assert stats["best_network"].cost() <= _single_node_net().cost()


def test_bfs_isplit_mode():
    config = SearchConfig()
    config.engine.eps = 0.5
    config.synthesizer.action_type = "isplit"
    config.engine.max_ops = 2
    stats = SearchEngine(config=config).bfs(_single_node_net())
    assert stats["count"] > 0
    assert stats["best_network"].cost() <= _single_node_net().cost()
