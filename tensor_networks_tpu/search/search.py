"""SearchEngine facade: dispatch to a strategy and finish the stats.

Parity reference: ``pytens/search/search.py``.
"""

from __future__ import annotations

import time

import numpy as np

from tensor_networks_tpu.network import TensorNetwork
from tensor_networks_tpu.search.configuration import SearchConfig
from tensor_networks_tpu.search.exhaustive import BFSSearch, DFSSearch
from tensor_networks_tpu.search.partition import PartitionSearch
from tensor_networks_tpu.search.utils import approx_error


class SearchEngine:
    """Tensor-network topology search engine."""

    def __init__(self, config: SearchConfig):
        self.config = config

    def partition_search(self, net: TensorNetwork) -> dict:
        """Output-directed splits + exact rank assignment."""
        engine = PartitionSearch(self.config)
        return engine.search(net)

    def dfs(self, net: TensorNetwork) -> dict:
        """Exhaustive DFS enumeration."""
        runner = DFSSearch(self.config)
        stats = runner.run(net)
        end = time.time()

        stats["time"] = end - runner.start - runner.logging_time
        stats["best_network"] = runner.best_network
        stats["cr_core"] = (
            np.prod([i.size for i in net.free_indices()])
            / runner.best_network.cost()
        )
        stats["cr_start"] = net.cost() / runner.best_network.cost()
        stats["reconstruction_error"] = approx_error(
            runner.target_tensor, runner.best_network
        )
        return stats

    def bfs(self, net: TensorNetwork) -> dict:
        """Exhaustive BFS enumeration."""
        runner = BFSSearch(self.config)
        stats = runner.run(net)

        # a timeout can expire before any candidate is scored; the input
        # network is then the (trivial) best
        best = runner.best_network
        if best is None:
            best = net
            runner.best_network = net
        stats["best_network"] = best
        stats["cr_core"] = (
            np.prod([i.size for i in net.free_indices()]) / best.cost()
        )
        stats["cr_start"] = net.cost() / best.cost()
        stats["reconstruction_error"] = approx_error(
            runner.target_tensor, best
        )
        return stats
