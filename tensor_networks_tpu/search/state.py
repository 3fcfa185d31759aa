"""Search-space actions and states.

The search MDP: a state is a tensor network plus its remaining error
budget; actions split one node by an index bipartition — ``ISplit`` by
tensor axis positions, ``OSplit`` by a set of free indices resolved to the
LCA node — or merge two adjacent nodes.  Rank enumeration after a split is
just masked slicing of one SVD, so exploring many rank variants costs no
extra device work.

Action ordering, validity rules, and truncation enumeration are pinned by
count-exact tests (dfs=8 / bfs=7 / partition=7 on the 3x4x5 fixture).
"""

from __future__ import annotations

import copy
import itertools
from typing import Generator, List, Optional, Sequence, Tuple

import numpy as np

from tensor_networks_tpu.network import TensorNetwork
from tensor_networks_tpu.search.configuration import SearchConfig
from tensor_networks_tpu.types import Index, NodeName, SVDConfig


class Action:
    """Base action: ordered and hashed by string form."""

    def __lt__(self, other) -> bool:
        return str(self) < str(other)

    def __hash__(self) -> int:
        return hash(str(self))

    def is_valid(self, _past: Sequence["Action"]) -> bool:
        """Whether the action is allowed given the action history."""
        return True


def _positions_of(all_indices: List[Index], subset: Sequence[Index]) -> List[int]:
    return [all_indices.index(i) for i in subset]


class OSplit(Action):
    """Output-directed split: separate a set of free indices from the rest."""

    def __init__(
        self,
        indices: Sequence[Index],
        target_size: Optional[int] = None,
        delta: Optional[float] = None,
    ):
        self.indices = sorted(indices)
        self.target_size = target_size
        self.delta = delta

    def __str__(self) -> str:
        return f"OSplit({[i.name for i in self.indices]})"

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, OSplit):
            return False
        names_self = [i.name for i in self.indices]
        names_other = [i.name for i in other.indices]
        return names_self == names_other

    def __hash__(self) -> int:
        return hash(str(self))

    def __lt__(self, other: "OSplit") -> bool:
        if len(self.indices) != len(other.indices):
            return len(self.indices) < len(other.indices)
        return sorted(self.indices) < sorted(other.indices)

    def is_valid(self, past_actions: Sequence[Action]) -> bool:
        """No repeated splits; no overlap with an earlier grouped split."""
        if self in past_actions:
            return False
        mine = set(self.indices)
        for ac in past_actions:
            if (
                isinstance(ac, OSplit)
                and len(ac.indices) > 1
                and mine.intersection(ac.indices)
            ):
                return False
        return True

    def _branch_purity(
        self, net: TensorNetwork, start: NodeName
    ) -> Optional[list]:
        """If every branch hanging off ``start`` is pure (all-desired or
        all-undesired free indices), return [(gateway index, free indices
        behind it)] per branch; otherwise None."""
        desired = set(self.indices)
        free_indices = net.free_indices()

        def walk(seen, node):
            seen.add(node)
            branches = []
            for nbr in net.network.neighbors(node):
                if nbr in seen:
                    continue
                sub = walk(seen, nbr)
                if sub is None:
                    return None
                behind: List[Index] = []
                for _, inds in sub:
                    behind.extend(inds)
                wanted = desired.intersection(behind)
                unwanted = set(behind).difference(desired)
                if wanted and unwanted:
                    return None
                gateway = net.get_contraction_index(nbr, node)[0]
                branches.append((gateway, behind))
            for ind in net.node_tensor(node).indices:
                if ind in free_indices:
                    branches.append((ind, [ind]))
            return branches

        return walk(set(), start)

    def to_isplit(self, net: TensorNetwork) -> "ISplit":
        """Resolve to a positional split at the LCA: the node from which
        every incident branch is pure w.r.t. the desired index set."""
        for candidate in net.network.nodes:
            branches = self._branch_purity(net, candidate)
            if branches is None:
                continue
            gateways: List[Index] = []
            for want in self.indices:
                for gateway, behind in branches:
                    if want in behind:
                        gateways.append(gateway)
                        break
            node_indices = net.node_tensor(candidate).indices
            return ISplit(
                candidate, _positions_of(node_indices, gateways)
            )
        raise ValueError(f"Cannot find the lca for indices {self.indices}")

    def execute(self, net: TensorNetwork, svd=None):
        """Execute by lowering to the equivalent ISplit."""
        return self.to_isplit(net).execute(net, svd)


class ISplit(Action):
    """Input-directed split: split one node by tensor axis positions."""

    def __init__(
        self,
        node: NodeName,
        left_indices: Sequence[int],
        target_size: Optional[int] = None,
        delta: Optional[float] = None,
    ):
        self.node = node
        self.left_indices = sorted(left_indices)
        self.target_size = target_size
        self.delta = delta

    def __str__(self) -> str:
        return f"ISplit({self.node}, {self.left_indices})"

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, ISplit)
            and self.node == other.node
            and self.left_indices == other.left_indices
        )

    def __hash__(self) -> int:
        return hash(str(self))

    def execute(
        self, net: TensorNetwork, svd=None
    ) -> Tuple[Tuple[NodeName, NodeName, NodeName], int]:
        """Split the node (environment-orthonormalized SVD), or install a
        precomputed (u, s, v) after a symbolic split."""
        node_indices = net.node_tensor(self.node).indices
        n_axes = len(node_indices)
        left = self.left_indices
        right = [i for i in range(n_axes) if i not in left]
        l_sizes = [node_indices[i].size for i in left]
        r_sizes = [node_indices[i].size for i in right]
        cap = min(int(np.prod(l_sizes)), int(np.prod(r_sizes)))

        if svd is None:
            names, _ = net.svd(
                self.node, left, SVDConfig(with_orthonormal=True)
            )
        else:
            names, _ = net.svd(
                self.node, left, SVDConfig(compute_data=False)
            )
            u, s, v = names
            net.node_tensor(u).update_val_size(
                np.asarray(svd[0]).reshape(*l_sizes, -1)
            )
            net.node_tensor(s).update_val_size(np.diag(np.asarray(svd[1])))
            net.node_tensor(v).update_val_size(
                np.asarray(svd[2]).reshape(-1, *r_sizes)
            )
        return names, cap

    def to_osplit(self, st: "SearchState", idx: int) -> "OSplit":
        """Recover the output-directed form: cut the bond this split
        created and keep the component with fewer free indices."""
        link_name = st.links[idx]
        endpoints = []
        for n in st.network.network.nodes:
            if any(
                ind.name == link_name
                for ind in st.network.node_tensor(n).indices
            ):
                endpoints.append(n)
        if len(endpoints) != 2:
            raise ValueError(
                f"Unusual edge label found in nodes: {endpoints}"
            )

        all_free = st.network.free_indices()
        best = None
        for keep, drop in (endpoints, endpoints[::-1]):
            component = st.network.network.reachable_from(
                keep, blocked={drop}
            )
            sub = TensorNetwork()
            sub.network = st.network.network.subgraph(component)
            frees = [i for i in sub.free_indices() if i in all_free]
            if (
                best is None
                or len(frees) < len(best)
                or (len(frees) == len(best) and frees < best)
            ):
                best = frees
        return OSplit(best)


class Merge(Action):
    """Merge two adjacent nodes."""

    def __init__(self, node1: NodeName, node2: NodeName):
        self.node1 = node1
        self.node2 = node2

    def __str__(self) -> str:
        return f"Merge({self.node1}, {self.node2})"

    def execute(self, network: TensorNetwork) -> TensorNetwork:
        network.merge(self.node1, self.node2)
        return network


def _half_deduped_combinations(items: Sequence, total_axes: int):
    """All sub-bipartitions (the smaller side), dropping mirror halves
    when the set splits evenly."""
    for k in range(1, total_axes // 2 + 1):
        combos = list(itertools.combinations(items, k))
        if total_axes % 2 == 0 and k == total_axes // 2:
            combos = combos[: len(combos) // 2]
        yield from combos


class SearchState:
    """A network + remaining error budget + the actions that built it."""

    def __init__(
        self,
        net: TensorNetwork,
        delta: float,
        threshold: float = 0.1,
        max_ops: int = 5,
    ):
        self.network = net
        self.curr_delta = delta
        self.past_actions: List[Action] = []
        self.max_ops = max_ops
        self.threshold = threshold
        self.is_noop = False
        self.links: List = []

    # -- action enumeration ---------------------------------------------------

    def get_legal_actions(self, index_actions: bool = False) -> List[Action]:
        """All legal splits: positional per node, or free-index directed."""
        if index_actions:
            return self.get_legal_index_actions()
        actions: List[Action] = []
        for n in self.network.network.nodes:
            n_axes = len(self.network.node_tensor(n).indices)
            for combo in _half_deduped_combinations(
                range(n_axes), n_axes
            ):
                actions.append(ISplit(n, combo))
        return actions

    @staticmethod
    def all_index_combs(
        free_indices: Sequence[Index],
    ) -> Generator[Sequence[Index], None, None]:
        """All free-index bipartitions (smaller side, halves deduped)."""
        ordered = sorted(free_indices)
        yield from _half_deduped_combinations(ordered, len(ordered))

    def get_legal_index_actions(self) -> List[Action]:
        """Output-directed splits, canonically ordered after the last
        action and non-conflicting with the history."""
        actions: List[Action] = []
        history = self.past_actions
        for comb in SearchState.all_index_combs(
            self.network.free_indices()
        ):
            ac = OSplit(comb)
            if not history or (
                history[-1] < ac and ac.is_valid(history)
            ):
                actions.append(ac)
        return actions

    # -- truncation enumeration ---------------------------------------------------

    def _spawn(self, net: TensorNetwork, delta: float) -> "SearchState":
        st = SearchState(
            net, delta, max_ops=self.max_ops, threshold=self.threshold
        )
        return st

    def truncate(
        self,
        new_net: TensorNetwork,
        usv: Tuple[Tuple[NodeName, NodeName, NodeName], int],
        config: SearchConfig,
        target_size: Optional[int] = None,
    ) -> Generator["SearchState", None, None]:
        """One successor per candidate rank of the freshly split bond.

        Candidates are tail blocks of the singular spectrum whose squared
        sum fits the budget; each successor inherits whatever budget its
        truncation does not spend.
        """
        (u, s, v), cap = usv
        u_val = new_net.value(u)
        v_val = new_net.value(v)
        spectrum = np.diag(np.asarray(new_net.value(s)))

        # squared tail sums that fit the remaining budget
        tail_sums: List[float] = []
        budget_sq = self.curr_delta**2
        for acc in np.cumsum(spectrum[::-1] ** 2):
            if acc > budget_sq:
                break
            tail_sums.append(acc)

        if not tail_sums:
            # no truncation possible: keep the split at full rank
            if config.heuristics.prune_full_rank and cap == len(spectrum):
                return
            kept = copy.deepcopy(new_net)
            kept.merge(v, s)
            st = self._spawn(kept, self.curr_delta)
            st.links.append(kept.get_contraction_index(u, v)[0].name)
            yield st
            return

        width = config.rank_search.error_split_stepsize
        if target_size is not None:
            keep_until = max(len(spectrum) - target_size + width // 2, 0)
            tail_sums = tail_sums[:keep_until]
        n_variants = 1 if width == 0 else min(width, len(tail_sums))

        spent = tail_sums[-1] if tail_sums else 0
        for variant, _ in enumerate(tail_sums[-n_variants:]):
            rank = max(
                len(spectrum) - len(tail_sums) + n_variants - variant - 1,
                1,
            )
            candidate = copy.deepcopy(new_net)
            candidate.node_tensor(u).update_val_size(u_val[..., :rank])
            candidate.node_tensor(s).update_val_size(
                np.diag(spectrum[:rank])
            )
            candidate.node_tensor(v).update_val_size(v_val[:rank, ...])
            candidate.merge(v, s)

            st = self._spawn(
                candidate, float(np.sqrt(budget_sq - spent))
            )
            st.links.append(
                candidate.get_contraction_index(u, v)[0].name
            )
            yield st

    def take_action(
        self, action: Action, config: SearchConfig, svd=None
    ) -> Generator["SearchState", None, None]:
        """Successor states after applying ``action``."""
        if isinstance(action, Merge):
            merged = copy.deepcopy(self.network)
            action.execute(merged)
            st = self._spawn(merged, self.curr_delta)
            st.past_actions = self.past_actions + [action]
            yield st
            return

        if not isinstance(action, (ISplit, OSplit)):
            raise TypeError("Unrecognized action type")

        working = copy.deepcopy(self.network)
        if not action.is_valid(self.past_actions):
            return
        if action.delta is not None:
            self.curr_delta = action.delta
        try:
            usv = action.execute(working, svd)
        except (np.linalg.LinAlgError, ValueError):
            return
        for st in self.truncate(
            working, usv, config=config, target_size=action.target_size
        ):
            st.past_actions = self.past_actions + [action]
            yield st

    # -- misc ----------------------------------------------------------------------

    def optimize(self) -> None:
        """Re-truncate the current structure within the remaining budget:
        orthonormalize at the node owning the first free index, then run
        a rounding sweep."""
        anchor = self.network.free_indices()[0]
        root = self.network.node_by_free_index(anchor.name)
        root = self.network.orthonormalize(root)
        _, self.curr_delta = self.network.round(root, self.curr_delta)

    def is_terminal(self) -> bool:
        """Flagged no-op, or node budget exhausted."""
        return (
            self.is_noop
            or len(self.network.network.nodes) >= self.max_ops
        )

    def get_result(self, total_cost: float) -> float:
        """1.0 when compressed below the threshold fraction of the dense
        cost."""
        if self.is_noop:
            return 0
        return float(self.network.cost() <= self.threshold * total_cost)

    def __lt__(self, other: "SearchState") -> bool:
        mine = self.curr_delta**2 / self.network.cost()
        theirs = other.curr_delta**2 / other.network.cost()
        return mine < theirs
