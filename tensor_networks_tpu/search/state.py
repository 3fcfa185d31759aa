"""Search-space actions and states.

The search MDP: states are tensor networks with a remaining error budget;
actions split a node by an index bipartition (input-directed ``ISplit`` by
tensor axis positions, output-directed ``OSplit`` by free-index subsets)
or merge adjacent nodes.  ``truncate`` enumerates rank choices within the
delta budget — on device this is just masked slices of one SVD.

Behavioral parity (action ordering, validity rules, truncation
enumeration) with ``pytens/search/state.py`` is pinned by count-exact
tests.
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
    """Base action."""

    def __lt__(self, other) -> bool:
        return str(self) < str(other)

    def __hash__(self) -> int:
        return hash(str(self))

    def is_valid(self, _past: Sequence["Action"]) -> bool:
        """Whether this action is allowed given the action history."""
        return True


class OSplit(Action):
    """Output-directed split: separate a subset of free indices."""

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
        if len(self.indices) != len(other.indices):
            return False
        return all(
            i.name == j.name for i, j in zip(self.indices, other.indices)
        )

    def __hash__(self) -> int:
        return hash(str(self))

    def __lt__(self, other: "OSplit") -> bool:
        if len(self.indices) != len(other.indices):
            return len(self.indices) < len(other.indices)
        return sorted(self.indices) < sorted(other.indices)

    def is_valid(self, past_actions: Sequence[Action]) -> bool:
        """No repeats, and no overlap with an earlier multi-index split."""
        if self in past_actions:
            return False
        for ac in past_actions:
            if not isinstance(ac, OSplit):
                continue
            if len(ac.indices) > 1 and any(
                i in ac.indices for i in self.indices
            ):
                return False
        return True

    def to_isplit(self, net: TensorNetwork) -> "ISplit":
        """Resolve to an input-directed split at the LCA node: the unique
        node from which every incident subtree is pure (contains only
        desired or only undesired free indices)."""
        desired = set(self.indices)

        def subtree_pure(visited, node) -> Tuple[bool, list]:
            """Returns (ok, [(edge-or-free-index, free indices behind it)])
            for each branch at ``node``."""
            visited.add(node)
            results = []
            for m in net.network.neighbors(node):
                if m in visited:
                    continue
                ok, finds = subtree_pure(visited, m)
                if not ok:
                    return False, []
                inds: List[Index] = []
                for _, sub in finds:
                    inds.extend(sub)
                want = desired.intersection(inds)
                dont = set(inds).difference(desired)
                if want and dont:
                    return False, []
                results.append(
                    (net.get_contraction_index(m, node)[0], inds)
                )
            free_indices = net.free_indices()
            for i in net.node_tensor(node).indices:
                if i in free_indices:
                    results.append((i, [i]))
            return True, results

        lca_node = None
        lca_indices: List[Index] = []
        for n in net.network.nodes:
            ok, results = subtree_pure(set(), n)
            if ok:
                lca_node = n
                for i in self.indices:
                    for edge, inds in results:
                        if i in inds:
                            lca_indices.append(edge)
                            break
                break
        if lca_node is None:
            raise ValueError(
                f"Cannot find the lca for indices {self.indices}"
            )

        node_indices = net.node_tensor(lca_node).indices
        left = [node_indices.index(i) for i in lca_indices]
        return ISplit(lca_node, left)

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
        if not isinstance(other, ISplit):
            return False
        return (
            self.node == other.node
            and self.left_indices == other.left_indices
        )

    def __hash__(self) -> int:
        return hash(str(self))

    def execute(
        self, net: TensorNetwork, svd=None
    ) -> Tuple[Tuple[NodeName, NodeName, NodeName], int]:
        """Split the node; optionally inject a precomputed (u, s, v)."""
        node_indices = net.node_tensor(self.node).indices
        l_positions = self.left_indices
        r_positions = [
            i for i in range(len(node_indices)) if i not in l_positions
        ]
        left_szs = [node_indices[i].size for i in l_positions]
        right_szs = [node_indices[i].size for i in r_positions]
        max_sz = min(
            int(np.prod(left_szs)), int(np.prod(right_szs))
        )

        if svd is None:
            (u, s, v), _ = net.svd(
                self.node, l_positions, SVDConfig(with_orthonormal=True)
            )
        else:
            (u, s, v), _ = net.svd(
                self.node, l_positions, SVDConfig(compute_data=False)
            )
            net.node_tensor(u).update_val_size(
                np.asarray(svd[0]).reshape(*left_szs, -1)
            )
            net.node_tensor(s).update_val_size(np.diag(np.asarray(svd[1])))
            net.node_tensor(v).update_val_size(
                np.asarray(svd[2]).reshape(-1, *right_szs)
            )
        return (u, s, v), max_sz

    def to_osplit(self, st: "SearchState", idx: int) -> OSplit:
        """Recover the output-directed form: cut the created bond and take
        the component with fewer free indices."""
        connect_nodes = []
        for n in st.network.network.nodes:
            for ind in st.network.node_tensor(n).indices:
                if ind.name == st.links[idx]:
                    connect_nodes.append(n)
                    break
        if len(connect_nodes) != 2:
            raise ValueError(
                f"Unusual edge label found in nodes: {connect_nodes}"
            )

        all_free = st.network.free_indices()
        curr_indices = None
        for start in connect_nodes:
            other = (
                connect_nodes[1]
                if start == connect_nodes[0]
                else connect_nodes[0]
            )
            component = st.network.network.reachable_from(
                start, blocked={other}
            )
            tn = TensorNetwork()
            tn.network = st.network.network.subgraph(component)
            indices = [i for i in tn.free_indices() if i in all_free]
            if (
                curr_indices is None
                or len(indices) < len(curr_indices)
                or (
                    len(indices) == len(curr_indices)
                    and indices < curr_indices
                )
            ):
                curr_indices = indices
        return OSplit(curr_indices)


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


class SearchState:
    """A network plus its remaining error budget and action history."""

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

    def get_legal_actions(self, index_actions: bool = False) -> List[Action]:
        """All legal split actions in this state."""
        if index_actions:
            return self.get_legal_index_actions()

        actions: List[Action] = []
        for n in self.network.network.nodes:
            n_axes = len(self.network.node_tensor(n).indices)
            positions = range(n_axes)
            for sz in range(1, n_axes // 2 + 1):
                combs = list(itertools.combinations(positions, sz))
                if n_axes % 2 == 0 and sz == n_axes // 2:
                    combs = combs[: len(combs) // 2]
                for comb in combs:
                    actions.append(ISplit(n, comb))
        return actions

    @staticmethod
    def all_index_combs(
        free_indices: Sequence[Index],
    ) -> Generator[Sequence[Index], None, None]:
        """All free-index bipartitions (smaller side, halves deduped)."""
        free_indices = sorted(free_indices)
        for k in range(1, len(free_indices) // 2 + 1):
            combs = list(itertools.combinations(free_indices, k))
            if len(free_indices) % 2 == 0 and k == len(free_indices) // 2:
                combs = combs[: len(combs) // 2]
            yield from combs

    def get_legal_index_actions(self) -> List[Action]:
        """Legal output-directed splits: canonically ordered after the last
        action and non-conflicting with history."""
        actions: List[Action] = []
        free_indices = self.network.free_indices()
        for comb in SearchState.all_index_combs(free_indices):
            ac = OSplit(comb)
            if not self.past_actions or (
                self.past_actions[-1] < ac
                and ac.is_valid(self.past_actions)
            ):
                actions.append(ac)
        return actions

    def truncate(
        self,
        new_net: TensorNetwork,
        usv: Tuple[Tuple[NodeName, NodeName, NodeName], int],
        config: SearchConfig,
        target_size: Optional[int] = None,
    ) -> Generator["SearchState", None, None]:
        """Enumerate one successor state per candidate truncation rank of
        the just-created bond, each inheriting the unspent budget.

        The candidates are slices of a single SVD, so enumerating them
        costs no extra device work.
        """
        [u, s, v], max_sz = usv
        u_val = new_net.value(u)
        v_val = new_net.value(v)
        s_val = np.diag(np.asarray(new_net.value(s)))

        tail = list(s_val * s_val)
        tail.reverse()
        truncpost = []
        for elem in np.cumsum(tail):
            if elem <= self.curr_delta**2:
                truncpost.append(elem)
            else:
                break

        if len(truncpost) == 0:
            if config.heuristics.prune_full_rank and max_sz == len(s_val):
                return
            tmp_net = copy.deepcopy(new_net)
            tmp_net.merge(v, s)
            new_state = SearchState(
                tmp_net,
                self.curr_delta,
                max_ops=self.max_ops,
                threshold=self.threshold,
            )
            new_state.links.append(
                tmp_net.get_contraction_index(u, v)[0].name
            )
            yield new_state
            return

        split_errors = config.rank_search.error_split_stepsize
        if target_size is not None:
            target_trunc = max(
                len(s_val) - target_size + split_errors // 2, 0
            )
            truncpost = truncpost[:target_trunc]

        split_num = 1 if split_errors == 0 else min(
            split_errors, len(truncpost)
        )

        for idx, _elem in enumerate(truncpost[-split_num:]):
            truncation_rank = max(
                len(s_val) - len(truncpost) + split_num - idx - 1, 1
            )
            used_delta = truncpost[-1] if truncpost else 0

            tmp_net = copy.deepcopy(new_net)
            tmp_net.node_tensor(u).update_val_size(
                u_val[..., :truncation_rank]
            )
            tmp_net.node_tensor(s).update_val_size(
                np.diag(s_val[:truncation_rank])
            )
            tmp_net.node_tensor(v).update_val_size(
                v_val[:truncation_rank, ...]
            )
            tmp_net.merge(v, s)

            remaining = float(np.sqrt(self.curr_delta**2 - used_delta))
            new_state = SearchState(
                tmp_net,
                remaining,
                max_ops=self.max_ops,
                threshold=self.threshold,
            )
            new_state.links.append(
                tmp_net.get_contraction_index(u, v)[0].name
            )
            yield new_state

    def take_action(
        self, action: Action, config: SearchConfig, svd=None
    ) -> Generator["SearchState", None, None]:
        """Successor states after applying ``action``."""
        if isinstance(action, (ISplit, OSplit)):
            new_net = copy.deepcopy(self.network)
            if not action.is_valid(self.past_actions):
                return
            if action.delta is not None:
                self.curr_delta = action.delta
            try:
                exec_result = action.execute(new_net, svd)
            except (np.linalg.LinAlgError, ValueError):
                return
            for new_state in self.truncate(
                new_net,
                exec_result,
                config=config,
                target_size=action.target_size,
            ):
                new_state.past_actions = self.past_actions + [action]
                yield new_state

        elif isinstance(action, Merge):
            new_net = copy.deepcopy(self.network)
            action.execute(new_net)
            new_state = SearchState(
                new_net,
                self.curr_delta,
                max_ops=self.max_ops,
                threshold=self.threshold,
            )
            new_state.past_actions = self.past_actions + [action]
            yield new_state
        else:
            raise TypeError("Unrecognized action type")

    def optimize(self) -> None:
        """Re-truncate the current structure within the remaining budget
        (orthonormalize at the node holding the first free index, then a
        rounding sweep)."""
        free_indices = self.network.free_indices()
        root = None
        for n in self.network.network.nodes:
            if free_indices[0] in self.network.node_tensor(n).indices:
                root = n
                break
        assert root is not None
        root = self.network.orthonormalize(root)
        _, self.curr_delta = self.network.round(root, self.curr_delta)

    def is_terminal(self) -> bool:
        """Terminal when flagged or the node budget is exhausted."""
        return (
            self.is_noop
            or len(self.network.network.nodes) >= self.max_ops
        )

    def get_result(self, total_cost: float) -> float:
        """1.0 when the state compresses below the threshold fraction."""
        if self.is_noop:
            return 0
        return float(self.network.cost() <= self.threshold * total_cost)

    def __lt__(self, other: "SearchState") -> bool:
        return (self.curr_delta**2 / self.network.cost()) < (
            other.curr_delta**2 / other.network.cost()
        )
