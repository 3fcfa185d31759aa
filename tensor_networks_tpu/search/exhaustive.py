"""Exhaustive structure search: BFS and DFS over split programs.

Enumerate all action sequences up to ``max_ops``, deduplicate by canonical
topology hash, and track the cheapest network within the error budget.
Parity reference: ``pytens/search/exhaustive.py`` (state counts are pinned
by tests).
"""

from __future__ import annotations

import copy
import time
from typing import List, Optional, Set

from tensor_networks_tpu.network import TensorNetwork
from tensor_networks_tpu.search.configuration import SearchConfig
from tensor_networks_tpu.search.state import SearchState
from tensor_networks_tpu.search.utils import EMPTY_SEARCH_STATS, log_stats


class ExhaustiveSearch:
    """Shared state for the exhaustive strategies."""

    def __init__(self, config: SearchConfig):
        self.config = config
        self.delta = 0.0
        self.target_tensor = None
        self.best_network: Optional[TensorNetwork] = None
        self.start = 0.0
        self.logging_time = 0.0
        self.search_stats = copy.deepcopy(EMPTY_SEARCH_STATS)


class BFSSearch(ExhaustiveSearch):
    """Breadth-first enumeration with a worklist."""

    def _add_wodup(
        self,
        best_network: Optional[TensorNetwork],
        new_st: SearchState,
        worked: Set[int],
        worklist: List[SearchState],
    ) -> Optional[TensorNetwork]:
        if (
            best_network is None
            or best_network.cost() > new_st.network.cost()
        ):
            best_network = new_st.network

        h = new_st.network.canonical_structure(
            consider_ranks=self.config.heuristics.prune_by_ranks
        )
        if self.config.heuristics.prune_duplicates:
            if h in worked:
                return best_network
            worked.add(h)

        if len(new_st.past_actions) < self.config.engine.max_ops:
            worklist.append(new_st)
        return best_network

    def run(self, net: TensorNetwork) -> dict:
        """Run BFS from the given network; returns the stats dict."""
        self.target_tensor = net.contract()
        logging_time = 0.0
        start = time.time()

        network = copy.deepcopy(net)
        delta = self.config.engine.eps * net.norm()

        worked: Set[int] = set()
        worklist = [SearchState(network, delta)]
        worked.add(network.canonical_structure())
        best_network = None
        count = 0

        while worklist:
            st = worklist.pop(0)
            if (
                self.config.engine.timeout is not None
                and time.time() - start >= self.config.engine.timeout
            ):
                break

            use_osplits = self.config.synthesizer.action_type == "osplit"
            for ac in st.get_legal_actions(index_actions=use_osplits):
                for new_st in st.take_action(ac, config=self.config):
                    if (
                        self.config.heuristics.prune_full_rank
                        and new_st.is_noop
                    ):
                        continue
                    ts = time.time() - start - logging_time
                    best_network = self._add_wodup(
                        best_network, new_st, worked, worklist
                    )
                    count += 1

                    verbose_start = time.time()
                    if self.config.engine.verbose:
                        log_stats(
                            self.search_stats,
                            self.target_tensor,
                            ts,
                            new_st,
                            best_network,
                        )
                    logging_time += time.time() - verbose_start

        self.search_stats["time"] = time.time() - start - logging_time
        self.search_stats["count"] = count
        self.best_network = best_network
        return self.search_stats


class DFSSearch(ExhaustiveSearch):
    """Depth-first enumeration with last-step error narrowing."""

    def log(self, new_st: SearchState) -> None:
        ts = time.time() - self.start - self.logging_time
        verbose_start = time.time()
        if self.config.engine.verbose:
            log_stats(
                self.search_stats,
                self.target_tensor,
                ts,
                new_st,
                self.best_network,
            )
        self.logging_time += time.time() - verbose_start

    def dfs(self, worked: Set[int], curr_st: SearchState) -> None:
        """One DFS expansion."""
        self.search_stats["count"] += 1
        used_ops = len(curr_st.past_actions)
        if used_ops >= self.config.engine.max_ops:
            return
        if (
            self.config.engine.timeout is not None
            and time.time() - self.start > self.config.engine.timeout
        ):
            return

        use_osplits = self.config.synthesizer.action_type == "osplit"
        for ac in curr_st.get_legal_actions(index_actions=use_osplits):
            # at the final level only the tightest truncation is explored
            if used_ops + 1 >= self.config.engine.max_ops:
                split_errors = 1
            else:
                split_errors = self.config.rank_search.error_split_stepsize
            config = copy.deepcopy(self.config)
            config.rank_search.error_split_stepsize = split_errors

            for new_st in curr_st.take_action(ac, config=config):
                if self.config.heuristics.prune_full_rank and new_st.is_noop:
                    continue
                if new_st.network.cost() < self.best_network.cost():
                    self.best_network = new_st.network
                self.log(new_st)

                if self.config.heuristics.prune_duplicates:
                    h = new_st.network.canonical_structure(
                        consider_ranks=self.config.heuristics.prune_by_ranks
                    )
                    if h in worked:
                        return
                    worked.add(h)

                if used_ops + 1 >= self.config.engine.max_ops:
                    return
                self.dfs(worked, new_st)

    def run(self, net: TensorNetwork) -> dict:
        """Run DFS from the given network; returns the stats dict."""
        self.target_tensor = net.contract()
        self.delta = self.config.engine.eps * net.norm()
        self.best_network = net
        self.logging_time = 0.0
        self.start = time.time()
        self.dfs(set(), SearchState(net, self.delta))
        return self.search_stats
