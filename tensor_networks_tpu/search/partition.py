"""Output-directed-split program synthesis with exact rank assignment.

The flagship search pipeline (parity: ``pytens/search/partition.py``):

1. *Preprocess*: SVD every free-index bipartition of the dense target and
   bin the singular-value tail sums (``ConstraintSearch``).
2. *Enumerate*: all symbolic split programs up to ``max_ops`` — splits are
   data-free graph surgery (``compute_data=False``).
3. *Rank-solve*: per program, the exact branch-and-bound assigns bond
   ranks minimizing total core size within the error budget (replaces the
   reference's Gurobi ILP).
4. *Replay*: re-execute the best programs with real data around the
   solved ranks, then round every node.

Departure from the reference: the enumeration runs in-process with
cooperative wall-clock checks instead of a killable child process — JAX
device state does not survive ``fork``, and a cooperative deadline gives
the same timeout semantics without pickling networks across processes.
"""

from __future__ import annotations

import copy
import pickle
import time
from typing import Dict, List, Optional

import numpy as np

from tensor_networks_tpu.network import TensorNetwork
from tensor_networks_tpu.search.configuration import SearchConfig
from tensor_networks_tpu.search.constraint import BAD_SCORE, ConstraintSearch
from tensor_networks_tpu.search.state import Action, OSplit, SearchState
from tensor_networks_tpu.search.utils import remove_temp_dir
from tensor_networks_tpu.types import SVDConfig


class PartitionSearch:
    """Search by partitioning free indices."""

    def __init__(self, config: SearchConfig):
        self.config = config
        self.stats: Dict = {
            "unique": {},
            "compression": [],
            "count": 0,
            "tic": 0,
            "best_network": None,
        }
        self.constraint_engine = ConstraintSearch(config)
        self.costs: Dict = {}
        self.ranks: Dict = {}
        self.delta = 0.0
        self._deadline: Optional[float] = None

    def _timed_out(self) -> bool:
        return self._deadline is not None and time.time() > self._deadline

    def get_cost(
        self,
        init_st: SearchState,
        new_st: SearchState,
        best_cost: List[int],
    ) -> List[int]:
        """Score one symbolic program with the exact rank solver (topk) or
        by full replay (all)."""
        if self.config.rank_search.fit_mode == "topk":
            rank, cost = self.constraint_engine.get_cost(
                new_st, best_cost[-1]
            )
            if cost != BAD_SCORE:
                best_cost.append(cost)
                best_cost = sorted(best_cost)
                if len(best_cost) > self.config.rank_search.k:
                    best_cost = best_cost[: self.config.rank_search.k]
            self.costs[tuple(new_st.past_actions)] = cost
            self.ranks[tuple(new_st.past_actions)] = rank
            return best_cost

        if self.config.rank_search.fit_mode == "all":
            delta = self.delta / np.sqrt(len(new_st.past_actions))
            for ac in new_st.past_actions:
                ac.delta = delta
            self.replay(init_st, new_st.past_actions, True)
            return best_cost

        return best_cost

    def pseudo_action_execution(
        self, curr_st: SearchState, action: Action
    ) -> SearchState:
        """Apply a split symbolically (graph surgery, no data)."""
        if isinstance(action, OSplit):
            split_ac = action.to_isplit(curr_st.network)
        else:
            split_ac = action

        new_net = copy.deepcopy(curr_st.network)
        (u, s, v), _ = new_net.svd(
            split_ac.node,
            split_ac.left_indices,
            SVDConfig(compute_data=False),
        )
        new_net.merge(v, s, compute_data=False)
        new_st = SearchState(new_net, curr_st.curr_delta)
        new_link = new_net.get_contraction_index(u, v)[0]
        new_st.past_actions = curr_st.past_actions + [action]
        new_st.links = list(curr_st.links)
        new_st.links.append(new_link.name)
        return new_st

    def fill_holes(self, st: SearchState) -> None:
        """Enumerate all split programs up to max_ops, scoring each."""
        sts = [st]
        best_cost = [st.network.cost()]
        for _ in range(1, self.config.engine.max_ops + 1):
            next_sts = []
            for curr_st in sts:
                if self._timed_out():
                    break
                is_osplit = self.config.synthesizer.action_type == "osplit"
                for action in curr_st.get_legal_actions(
                    index_actions=is_osplit
                ):
                    new_st = self.pseudo_action_execution(curr_st, action)
                    self.stats["count"] += 1
                    best_cost = self.get_cost(st, new_st, best_cost)
                    next_sts.append(new_st)
            sts = next_sts

        if self.config.rank_search.fit_mode == "topk":
            costs = sorted([(v, k) for k, v in self.costs.items()])
            for _, acs in costs[: self.config.rank_search.k]:
                for k, ac in enumerate(acs):
                    ac.target_size = self.ranks[acs][k]
                self.stats["best_acs"] = acs
                self.replay(st, list(acs), True)

    def replay(
        self,
        st: SearchState,
        actions: List[Action],
        first_iter: bool = False,
    ) -> None:
        """Re-execute a program with real data around the solved ranks;
        at the leaves, round every node and keep the cheapest result."""
        if not actions:
            for n in st.network.network.nodes:
                net = copy.deepcopy(st.network)
                net.round(n, st.curr_delta)
                if net.cost() < self.stats["best_network"].cost():
                    self.stats["best_network"] = net
            return

        ac = actions[0]
        svd = None
        if first_iter and self.config.rank_search.fit_mode == "all":
            svd_file = self.constraint_engine.first_steps.get(ac, None)
            if svd_file is not None:
                data = np.load(svd_file)
                svd = (data["u"], data["s"], data["v"])

        for new_st in st.take_action(ac, svd=svd, config=self.config):
            self.stats["compression"].append(
                (time.time() - self.stats["tic"], new_st.network.cost())
            )
            ukey = new_st.network.canonical_structure()
            self.stats["unique"][ukey] = (
                self.stats["unique"].get(ukey, 0) + 1
            )
            self.replay(new_st, actions[1:])

    def rank_search_and_replay(
        self, net: TensorNetwork, acs: List[Action]
    ) -> Dict:
        """Resume-by-log: rank-solve and replay a recorded action list."""
        preprocess_end = time.time()
        delta = net.norm() * self.config.engine.eps
        self.delta = delta
        init_st = SearchState(net, delta)
        free_indices = net.free_indices()

        new_st = init_st
        for ac in acs:
            ac.target_size = None
            new_st = self.pseudo_action_execution(new_st, ac)
        self.get_cost(init_st, new_st, [net.cost()])

        self.stats["best_network"] = net
        costs = sorted([(v, k) for k, v in self.costs.items()])
        for _, actions in costs[:1]:
            for k, ac in enumerate(actions):
                ac.target_size = self.ranks[actions][k]
            self.stats["best_acs"] = actions
            self.replay(init_st, list(actions), True)

        self.stats["time"] = time.time() - self.stats["tic"]
        self.stats["preprocess"] = preprocess_end - self.stats["tic"]
        best = self.stats["best_network"]
        self.stats["cr_core"] = (
            float(np.prod([i.size for i in free_indices])) / best.cost()
        )
        self.stats["cr_start"] = net.cost() / best.cost()
        # match free-index order before comparing (splits reorder them;
        # the reference computes this without the permutation and crashes)
        best_tensor = best.contract()
        perm = [best_tensor.indices.index(ind) for ind in free_indices]
        best_tensor = best_tensor.permute(perm)
        target = np.asarray(net.contract().value)
        self.stats["reconstruction_error"] = float(
            np.linalg.norm(np.asarray(best_tensor.value) - target)
            / np.linalg.norm(target)
        )
        return self.stats

    def search(self, net: TensorNetwork) -> Dict:
        """Run the full preprocess -> enumerate -> solve -> replay
        pipeline from the given (usually single-node) network."""
        if self.config.synthesizer.replay_from is not None:
            start = time.time()
            self.stats["tic"] = start
            with open(self.config.synthesizer.replay_from, "rb") as f:
                acs = pickle.load(f)
            self.constraint_engine.preprocess(net.contract(), acs)
            try:
                return self.rank_search_and_replay(net, acs)
            finally:
                if self.config.output.remove_temp_after_run:
                    remove_temp_dir(
                        self.config.output.output_dir,
                        self.constraint_engine.temp_files,
                    )

        self.stats["best_network"] = net
        delta = net.norm() * self.config.engine.eps
        self.delta = delta
        init_st = SearchState(net, delta)
        free_indices = net.free_indices()

        start = time.time()
        self.constraint_engine.preprocess(
            net.contract(),
            compute_uv=self.config.rank_search.fit_mode == "all",
        )
        toc1 = time.time()

        self.stats["tic"] = time.time()
        if self.config.engine.timeout is not None:
            self._deadline = time.time() + self.config.engine.timeout
        try:
            self.fill_holes(init_st)
        finally:
            if self.config.output.remove_temp_after_run:
                remove_temp_dir(
                    self.config.output.output_dir,
                    self.constraint_engine.temp_files,
                )
        toc2 = time.time()

        self.stats["time"] = toc2 - start
        self.stats["preprocess"] = toc1 - start
        best = self.stats["best_network"]
        self.stats["cr_core"] = (
            float(np.prod([i.size for i in free_indices])) / best.cost()
        )
        self.stats["cr_start"] = net.cost() / best.cost()

        best_tensor = best.contract()
        perm = [best_tensor.indices.index(ind) for ind in free_indices]
        best_tensor = best_tensor.permute(perm)
        target = np.asarray(net.contract().value)
        self.stats["reconstruction_error"] = float(
            np.linalg.norm(np.asarray(best_tensor.value) - target)
            / np.linalg.norm(target)
        )
        return self.stats
