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
    # expired deadline: stats are complete and a network is returned
    assert stats["best_network"] is not None
    assert "reconstruction_error" in stats


def test_watchdog_kills_hung_enumeration(monkeypatch):
    """A hung enumeration/scoring child is terminated at the deadline —
    the watchdog must not wait for cooperation (the hang happens before
    any deadline check could run)."""
    monkeypatch.setenv("TNT_FAULT_HANG_EXPLORE", "1")
    config = SearchConfig()
    config.engine.eps = 0.5
    config.engine.timeout = 2.0
    start = time.time()
    stats = SearchEngine(config=config).partition_search(_net((3, 4, 5)))
    elapsed = time.time() - start
    assert elapsed < 30  # child startup + kill, nowhere near the hang
    assert stats["count"] == 0  # nothing came back from the killed child
    assert stats["best_network"] is not None
    assert "reconstruction_error" in stats


def test_watchdog_returns_full_results_when_fast():
    """With a generous deadline the child completes and the watchdog run
    is equivalent to the in-process one."""
    np.random.seed(1)
    data = np.random.randn(3, 4, 5)
    net = TensorNetwork()
    net.add_node(
        "G",
        Tensor(
            data, [Index("i", 3), Index("j", 4), Index("k", 5)]
        ),
    )

    config = SearchConfig()
    config.engine.eps = 0.5
    config.engine.timeout = 120.0
    stats = SearchEngine(config=config).partition_search(net)
    assert stats["count"] == 7  # same enumeration as the untimed search
    assert stats["best_network"].cost() <= net.cost()
    assert stats["reconstruction_error"] <= 0.5 * 1.01
