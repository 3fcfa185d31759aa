"""Core type definitions for the TPU-native tensor-network framework.

Host-side metadata types: named indices, SVD configuration, and the
dimension-tree machinery shared by cross approximation and TT algebra.
These objects never live on device; they describe the *structure* that the
jitted kernels (see :mod:`tensor_networks_tpu.kernels`) operate over.

Parity reference: ``pytens/types.py`` (Index :19, SVDConfig :60,
NodeInfo :69, DimTreeNode :84 in the upstream repo).
"""

from __future__ import annotations

import dataclasses
import logging
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple, Union

import numpy as np

logger = logging.getLogger(__name__)

IntOrStr = Union[str, int]
IndexName = IntOrStr
IndexChain = Union[List[int], Tuple[int, ...]]
NodeName = IntOrStr


@dataclass(frozen=True)
class Index:
    """A named tensor leg.

    Two indices are interchangeable iff they share ``(name, size)``; the
    optional ``value_choices`` grid (used by function tensors in cross
    approximation) does not participate in equality or hashing.

    ``size`` is normally an ``int``; during structure search the rank
    solver temporarily relabels sizes to *tuples* of candidate ranks
    (see ``search/constraint.py``), so the field is intentionally loose.
    """

    name: IntOrStr
    size: Any
    value_choices: Sequence[float] = field(default_factory=tuple)

    def with_new_size(self, new_size: Any) -> "Index":
        """Same name, different size."""
        return Index(self.name, new_size)

    def with_new_name(self, name: IntOrStr) -> "Index":
        """Same size, different name."""
        return Index(name, self.size)

    def with_new_rng(self, rng: Sequence[float]) -> "Index":
        """Same name/size, new value grid for function tensors."""
        return Index(self.name, self.size, rng)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Index):
            return False
        return self.name == other.name and self.size == other.size

    def __lt__(self, other: "Index") -> bool:
        return str(self.name) < str(other.name)

    def __hash__(self) -> int:
        return hash((self.name, self.size))

    def to_dict(self) -> dict:
        """Serialize to a plain dictionary."""
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, data_dict: dict) -> "Index":
        """Reconstruct from :meth:`to_dict` output."""
        return cls(**data_dict)


@dataclass
class SVDConfig:
    """Knobs for a network-level SVD split.

    ``delta``            absolute truncation budget (Frobenius).
    ``with_orthonormal`` orthonormalize the environment first so the local
                         truncation error equals the global one.
    ``compute_data``     when False, perform a *symbolic* split: graph
                         surgery only, node values left empty (used by the
                         structure-search program synthesizer).
    """

    delta: float = 1e-5
    with_orthonormal: bool = True
    compute_data: bool = True


class NodeInfo:
    """Per-direction bookkeeping attached to a dimension-tree node.

    ``nodes``   neighboring tree nodes in this direction,
    ``indices`` the free indices visible in this direction,
    ``vals``    sampled multi-index rows (pivots) for those indices,
    ``rank``    current bond rank toward this direction.
    """

    def __init__(
        self,
        nodes: List["DimTreeNode"],
        indices: List[Index],
        vals: np.ndarray,
    ):
        self.nodes = nodes
        self.indices = indices
        self.vals = vals
        self.rank = 0


class DimTreeNode:
    """A node in a rooted dimension tree over a tree tensor network.

    The dimension tree is the host-side control structure for cross
    approximation sweeps and tree-aligned binary ops.  ``up`` points toward
    the leaves' own subtree sample sets, ``down`` toward the root.
    Parity reference: ``pytens/types.py:84-321``.
    """

    def __init__(
        self,
        node: NodeName,
        indices: List[Index],
        free_indices: List[Index],
        up_info: NodeInfo,
        down_info: NodeInfo,
    ):
        self.node = node
        self.indices = indices
        self.free_indices = free_indices
        self.up_info = up_info
        self.down_info = down_info
        n_axes = len(free_indices) + len(down_info.nodes) + len(up_info.nodes)
        self.perm = list(range(n_axes))

    def __lt__(self, other: "DimTreeNode") -> bool:
        return sorted(self.indices) < sorted(other.indices)

    # -- traversal ---------------------------------------------------------

    def preorder(self) -> List["DimTreeNode"]:
        """All nodes in pre-order (self first, then children subtrees)."""
        out: List[DimTreeNode] = [self]
        for child in self.down_info.nodes:
            out.extend(child.preorder())
        return out

    def locate(self, node: NodeName) -> Optional["DimTreeNode"]:
        """Find a tree node by its network node name."""
        if node == self.node:
            return self
        for child in self.down_info.nodes:
            found = child.locate(node)
            if found is not None:
                return found
        return None

    def leaves(self) -> List["DimTreeNode"]:
        """Leaf nodes of the subtree reachable through ``up`` links."""
        if not self.up_info.nodes:
            return [self]
        out: List[DimTreeNode] = []
        for parent in self.up_info.nodes:
            out.extend(parent.leaves())
        return out

    def height(self) -> int:
        """Height of the tree (1 for a single node)."""
        best = 0
        for parent in self.up_info.nodes:
            best = max(best, parent.height())
        return best + 1

    def path(self, node1: NodeName, node2: NodeName) -> List["DimTreeNode"]:
        """Nodes on the tree path from ``node1`` to ``node2`` inclusive."""
        n1 = self.locate(node1)
        n2 = self.locate(node2)
        assert n1 is not None and n2 is not None

        # climb from n1 until an ancestor covering both index sets is found
        chain1 = [n1]
        anc = n1
        while anc is not None:
            needed = n1.indices + n2.indices
            if all(ind in anc.indices for ind in needed):
                break
            anc = anc.up_info.nodes[0]
            chain1.append(anc)
        if anc is None:
            raise RuntimeError("not a valid tree")

        chain2 = [n2]
        cur = n2
        while cur is not None and cur != anc:
            cur = cur.up_info.nodes[0]
            chain2.append(cur)
        if cur is None:
            raise RuntimeError("not a valid tree")

        return chain1 + list(reversed(chain2[:-1]))

    def distance(self, node1: NodeName, node2: NodeName) -> int:
        """Number of nodes on the path between the two network nodes."""
        return len(self.path(node1, node2))

    def sibling(self, node: "DimTreeNode") -> "DimTreeNode":
        """Any sibling of ``node`` (a node sharing its parent)."""
        if len(node.up_info.nodes) != 1:
            raise ValueError("root node does not have a sibling")
        parent = node.up_info.nodes[0]
        for child in parent.down_info.nodes:
            if child.node != node.node:
                return child
        raise ValueError("No sibling for the given node")

    def is_ancestor(self, other: "DimTreeNode") -> bool:
        """True if ``self`` lies on the path from ``other`` to the root."""
        cur = other
        while cur.up_info.nodes:
            cur = cur.up_info.nodes[0]
            if cur.node == self.node:
                return True
        return False

    def highest_frontier(
        self, indices: Sequence[Index]
    ) -> List["DimTreeNode"]:
        """Highest tree nodes whose index sets are covered by ``indices``."""
        if self.indices and all(ind in indices for ind in self.indices):
            return [self]
        out: List[DimTreeNode] = []
        for child in self.down_info.nodes:
            out.extend(child.highest_frontier(indices))
        return out

    # -- rank bookkeeping --------------------------------------------------

    def increment_ranks(
        self, kickrank: int = 1, max_rank: Optional[int] = None
    ) -> None:
        """Kick every up-rank by ``kickrank``, clamped to ``max_rank``."""
        self.up_info.rank += kickrank
        if max_rank is not None:
            self.up_info.rank = min(max_rank, self.up_info.rank)
        for child in self.down_info.nodes:
            child.increment_ranks(kickrank, max_rank)

    def ranks(self) -> List[int]:
        """All up-ranks in pre-order."""
        out = [self.up_info.rank]
        for child in self.down_info.nodes:
            out.extend(child.ranks())
        return out

    def bound_ranks(self) -> None:
        """Clamp each up-rank by the products of neighboring edge ranks.

        An edge rank can never usefully exceed the product of the other
        ranks/mode sizes on either side of the cut (parity with
        ``pytens/types.py:136-174``).
        """
        rank_up = 1
        for child in self.down_info.nodes:
            if child.up_info.rank != 0:
                rank_up *= child.up_info.rank
        for ind in self.free_indices:
            rank_up *= ind.size

        rank_down = self.up_info.rank
        for parent in self.up_info.nodes:
            rank_down = 1
            if parent.up_info.rank != 0:
                rank_down *= parent.up_info.rank
            for sib in parent.down_info.nodes:
                if sib.node != self.node and sib.up_info.rank != 0:
                    rank_down *= sib.up_info.rank
            for ind in parent.free_indices:
                rank_down *= ind.size

        self.up_info.rank = min([rank_up, rank_down, self.up_info.rank])
        for child in self.down_info.nodes:
            child.bound_ranks()

    def add_values(self, up_vals: np.ndarray) -> None:
        """Distribute new pivot rows down the tree, truncating to rank."""
        for child in self.down_info.nodes:
            cols = [self.indices.index(ind) for ind in child.indices]
            cvals = up_vals[:, cols]
            child.up_info.vals = np.append(
                child.up_info.vals, cvals, axis=0
            )[: child.up_info.rank]
            child.add_values(cvals)

    # -- pivot extraction ----------------------------------------------------

    def entries(self) -> np.ndarray:
        """The up-direction pivot rows of this node."""
        if len(self.up_info.vals) != 0:
            return self.up_info.vals
        return np.empty((0, len(self.up_info.indices)))

    def known_entries(self) -> np.ndarray:
        """All pivot rows known in this subtree, in self's index order."""
        vals = np.empty((0, len(self.indices)))
        if len(self.up_info.vals) != 0:
            vals = np.concatenate(
                [self.down_info.vals, self.up_info.vals], axis=-1
            )
        self_inds = self.down_info.indices + self.up_info.indices
        for child in self.down_info.nodes:
            cvals = child.known_entries()
            cindices = child.down_info.indices + child.up_info.indices
            perm = [self_inds.index(ind) for ind in cindices]
            vals = np.concatenate([vals, cvals[:, perm]], axis=0)
        return vals
