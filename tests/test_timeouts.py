"""Engine timeout semantics: searches must respect wall-clock budgets."""

import time

import numpy as np

from tensor_networks_tpu import Index, Tensor, TensorNetwork
from tensor_networks_tpu.search import SearchConfig, SearchEngine


def _net(shape=(4, 5, 6, 3), seed=12):
    np.random.seed(seed)
    data = np.random.randn(*shape)
    indices = [Index(f"i{k}", s) for k, s in enumerate(shape)]
    net = TensorNetwork()
    net.add_node("G", Tensor(data, indices))
    return net


def test_bfs_timeout_cuts_search_short():
    config = SearchConfig()
    config.engine.eps = 0.5
    config.engine.timeout = 0.0  # expire immediately after the first pop
    start = time.time()
    stats = SearchEngine(config=config).bfs(_net())
    elapsed = time.time() - start
    assert elapsed < 30
    # far fewer states than the untimed search would visit
    assert stats["count"] <= 60


def test_partition_timeout_still_returns_stats():
    config = SearchConfig()
    config.engine.eps = 0.5
    config.engine.max_ops = 3
    config.engine.timeout = 0.0
    stats = SearchEngine(config=config).partition_search(_net((3, 4, 5)))
    # cooperative deadline: stats are complete and a network is returned
    assert stats["best_network"] is not None
    assert "reconstruction_error" in stats
