"""TensorNetwork: a host-side graph of named-index tensors.

Topology, index names, and rewrite decisions stay in Python (they are O(d)
metadata); every numerical statement lowers to a jit-compiled XLA kernel
through :mod:`tensor_networks_tpu.planner` and
:mod:`tensor_networks_tpu.kernels`.

Two deliberate departures from the reference (``pytens/algs.py:363-1580``):

* contraction paths are computed from the *edge structure* and cached per
  topology signature (the reference re-searches paths on index names every
  call — the acknowledged cause of its bad dimension scaling), and
* ``copy.deepcopy`` of a network shares the immutable device buffers, so
  the search/GMRES loops that clone networks constantly do no array copies.
"""

from __future__ import annotations

import copy
import logging
import os
from collections import Counter
from dataclasses import dataclass
from typing import (
    Any,
    Dict,
    List,
    Literal,
    Optional,
    Sequence,
    Set,
    Tuple,
    Union,
)

import jax
import jax.numpy as jnp
import numpy as np

from tensor_networks_tpu.graph import Graph
from tensor_networks_tpu.planner import contract_values
from tensor_networks_tpu.tensor import Tensor
from tensor_networks_tpu.dimtree import DimTreeNode, NodeInfo
from tensor_networks_tpu.types import (
    Index,
    IndexName,
    IntOrStr,
    NodeName,
    SVDConfig,
)

logger = logging.getLogger(__name__)

_EVAL_CHUNK = 65536
_EVAL_FNS: Dict[tuple, Any] = {}


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@dataclass
class EinsumArgs:
    """A reusable contraction spec: per-node index lists + output order.

    Functional analogue of the reference's einsum-string cache
    (``pytens/algs.py:348-360``), expressed over Index identities instead
    of characters so arbitrarily large networks work.
    """

    node_order: List[NodeName]
    node_indices: List[List[Index]]
    output_indices: List[Index]


class TensorNetwork:
    """A graph of tensors; contraction driven by shared index identity."""

    def __init__(self) -> None:
        self.network = Graph()

    # -- deepcopy: share immutable device buffers ---------------------------

    def __deepcopy__(self, memo) -> "TensorNetwork":
        new = TensorNetwork()
        for name, attrs in self.network.nodes(data=True):
            t = attrs.get("tensor")
            if t is not None:
                new.network.add_node(
                    name, tensor=Tensor(t.value, list(t.indices))
                )
            else:
                new.network.add_node(name)
        for u, v in self.network.edges():
            new.network.add_edge(u, v)
        return new

    # -- node/edge management -------------------------------------------------

    def add_node(self, name: NodeName, tensor: Tensor) -> None:
        self.network.add_node(name, tensor=tensor)

    def add_edge(self, name1: NodeName, name2: NodeName) -> None:
        self.network.add_edge(name1, name2)

    def node_tensor(self, node_name: NodeName) -> Tensor:
        return self.network.nodes[node_name]["tensor"]

    def set_node_tensor(self, node_name: NodeName, value: Tensor) -> None:
        self.network.nodes[node_name]["tensor"] = value

    def value(self, node_name: NodeName) -> jnp.ndarray:
        return self.network.nodes[node_name]["tensor"].value

    # -- index queries ---------------------------------------------------------

    def all_indices(self) -> Counter:
        indices: List[Index] = []
        for _, data in self.network.nodes(data=True):
            indices += data["tensor"].indices
        return Counter(indices)

    def free_indices(self) -> List[Index]:
        return [i for i, v in self.all_indices().items() if v == 1]

    def inner_indices(self) -> List[Index]:
        return [i for i, v in self.all_indices().items() if v > 1]

    def ranks(self) -> List[int]:
        return [r.size for r in self.inner_indices()]

    def shape(self) -> List[int]:
        return [i.size for i in self.free_indices()]

    def dim(self) -> int:
        return len(self.free_indices())

    def get_contraction_index(
        self, node1: NodeName, node2: NodeName
    ) -> List[Index]:
        inds = list(self.node_tensor(node1).indices) + list(
            self.node_tensor(node2).indices
        )
        cnt = Counter(inds)
        return [i for i, v in cnt.items() if v > 1]

    def rename_indices(
        self, rename_map: Dict[IntOrStr, IntOrStr]
    ) -> "TensorNetwork":
        for _, data in self.network.nodes(data=True):
            data["tensor"].rename_indices(rename_map)
        return self

    def relabel_indices(
        self, relabel_map: Dict[IntOrStr, Any]
    ) -> "TensorNetwork":
        for _, data in self.network.nodes(data=True):
            data["tensor"].relabel_indices(relabel_map)
        return self

    def fresh_index(self) -> str:
        taken = {i.name for i in self.all_indices()}
        i = 0
        while f"s_{i}" in taken:
            i += 1
        return f"s_{i}"

    def fresh_node(self) -> NodeName:
        i = 0
        while f"n{i}" in self.network.nodes:
            i += 1
        return f"n{i}"

    def node_by_free_index(self, index: IndexName) -> NodeName:
        for n in self.network.nodes:
            if index in [ind.name for ind in self.node_tensor(n).indices]:
                return n
        raise KeyError(f"Cannot find index {index} in the network")

    # -- contraction -------------------------------------------------------------

    def einsum_args(self) -> EinsumArgs:
        """Build the reusable contraction spec for this topology."""
        free = self.free_indices()
        node_order = list(self.network.nodes)
        node_indices = [list(self.node_tensor(n).indices) for n in node_order]
        return EinsumArgs(node_order, node_indices, free)

    def contract(self, eargs: Optional[EinsumArgs] = None) -> Tensor:
        """Contract the whole network to a dense tensor on device.

        The contraction path is edge-aware and the compiled executable is
        cached by (structure, shapes, dtype).
        """
        if eargs is None:
            eargs = self.einsum_args()
        values = [self.value(n) for n in eargs.node_order]
        out = contract_values(
            eargs.node_indices, values, eargs.output_indices
        )
        return Tensor(out, list(eargs.output_indices))

    def __getitem__(self, ind) -> Tensor:
        """Contract the network after fixing/slicing its free indices.

        Entries of ``ind`` are positional over ``free_indices()`` order;
        an ``int`` entry drops the axis, a slice keeps it.  Semantics of
        the reference accessor (``pytens/algs.py:487``), realised by
        mapping each free index to its selector once and slicing every
        core through that map.
        """
        selector = {ix: ind[k] for k, ix in enumerate(self.free_indices())}
        sliced = TensorNetwork()
        for node, data in self.network.nodes(data=True):
            tens = data["tensor"]
            sel = tuple(
                selector.get(ix, slice(None)) for ix in tens.indices
            )
            kept = [
                ix
                for ix, s in zip(tens.indices, sel)
                if not isinstance(s, int)
            ]
            sliced.add_node(node, Tensor(tens.value[sel], kept))
        for u, v in self.network.edges():
            sliced.add_edge(u, v)
        return sliced.contract()

    # -- composition ----------------------------------------------------------------

    def attach(
        self, other: "TensorNetwork", rename: Tuple[str, str] = ("G", "H")
    ) -> "TensorNetwork":
        """Union two networks; shared free indices become bonds.

        Semantics of the reference composition (``pytens/algs.py:521``):
        interior indices on each side are prefixed so only the free-index
        overlap connects the two halves.  Built directly into a fresh
        network (no graph-union intermediate): each side's nodes are
        copied in under prefixed names with interior indices renamed,
        original edges carried over, and the halves bonded through an
        index->owner map over the left half (linear, not O(n^2)).
        Device buffers are shared, never copied.
        """
        joined = TensorNetwork()
        for side, prefix in ((self, rename[0]), (other, rename[1])):
            exposed = set(side.free_indices())
            for n, data in side.network.nodes(data=True):
                t = data["tensor"]
                remap = {
                    ix.name: (
                        ix.name if ix in exposed else f"{prefix}{ix.name}"
                    )
                    for ix in t.indices
                }
                joined.add_node(
                    f"{prefix}{n}",
                    Tensor(t.value, list(t.indices)).rename_indices(remap),
                )
            for u, v in side.network.edges():
                joined.add_edge(f"{prefix}{u}", f"{prefix}{v}")

        owners: Dict[Index, List[NodeName]] = {}
        for n in self.network.nodes:
            name = f"{rename[0]}{n}"
            for ix in joined.node_tensor(name).indices:
                owners.setdefault(ix, []).append(name)
        for n in other.network.nodes:
            name = f"{rename[1]}{n}"
            for ix in joined.node_tensor(name).indices:
                for left in owners.get(ix, ()):
                    joined.add_edge(left, name)
        return joined

    def scale(self, scale_factor: float) -> "TensorNetwork":
        """Scale the represented tensor (folds the factor into one core)."""
        first = next(iter(self.network.nodes))
        t = self.node_tensor(first)
        t.value = t.value * scale_factor
        return self

    def inner(self, other: "TensorNetwork") -> jnp.ndarray:
        """Inner product <self, other> over the shared free indices."""
        return self.attach(other).contract().value

    def norm(self) -> float:
        """Frobenius norm of the represented tensor."""
        val = float(self.inner(self))
        return float(np.sqrt(np.abs(val)))

    def integrate(
        self,
        indices: Sequence[Index],
        weights: Sequence[Union[np.ndarray, float]],
    ) -> "TensorNetwork":
        """Contract weight vectors onto the chosen free indices."""
        out = self
        for weight, index in zip(weights, indices):
            if isinstance(weight, float):
                v = jnp.ones(index.size) * weight
            else:
                v = jnp.asarray(weight)
            tens = vector(f"w_{index.name}", index, v)
            out = out.attach(tens, rename=("", ""))
        return out

    # -- structural rewrites -----------------------------------------------------------
    #
    # Graph surgery is organised around three small internal disciplines
    # (instead of per-method ad-hoc loops):
    #   * `_route_neighbors` re-attaches a replaced node's neighbors to
    #     whichever factor inherited the shared index;
    #   * `_rooted_order` produces an iterative preorder + parent map, the
    #     control skeleton for every tree sweep (orthonormalize, round,
    #     canonical_structure, dimension_tree) — explicit stacks, no
    #     recursion, QTT-depth safe;
    #   * sweeps are expressed as schedules over that order with a
    #     `pending` absorption map, not as recursive merge cascades.
    # Semantics match the reference rewrites (``pytens/algs.py:633-955``);
    # the decomposition is this framework's own.

    def _route_neighbors(
        self, nbrs: Sequence[NodeName], parts: Sequence[NodeName]
    ) -> None:
        """Attach each neighbor to every factor it shares an index with.

        ``parts`` are the freshly installed factor nodes replacing one
        removed node; a neighbor sharing indices with none of them is a
        structural inconsistency and raises.
        """
        part_indices = [set(self.node_tensor(p).indices) for p in parts]
        for y in nbrs:
            y_inds = self.node_tensor(y).indices
            hit = False
            for p, p_inds in zip(parts, part_indices):
                if any(ix in p_inds for ix in y_inds):
                    self.add_edge(p, y)
                    hit = True
            if not hit:
                raise ValueError(
                    f"neighbor {y} with indices {y_inds} shares nothing "
                    f"with the installed factors {list(parts)}"
                )

    def _rooted_order(
        self, root: NodeName
    ) -> Tuple[List[NodeName], Dict[NodeName, Optional[NodeName]]]:
        """Iterative preorder + parent map of the tree hanging off ``root``.

        Children appear in neighbor (insertion) order; reversing the
        returned list gives a valid leaves-first schedule.
        """
        parent: Dict[NodeName, Optional[NodeName]] = {root: None}
        order: List[NodeName] = []
        stack: List[NodeName] = [root]
        while stack:
            cur = stack.pop()
            order.append(cur)
            fresh = [
                n
                for n in self.network.neighbors(cur)
                if n not in parent
            ]
            for n in fresh:
                parent[n] = cur
            stack.extend(reversed(fresh))
        return order, parent

    def _shared_with(self, node: NodeName, other: NodeName) -> List[int]:
        """Axis positions of ``node`` whose indices also live on ``other``."""
        other_inds = set(self.node_tensor(other).indices)
        return [
            i
            for i, ix in enumerate(self.node_tensor(node).indices)
            if ix in other_inds
        ]

    def svd(
        self,
        node_name: NodeName,
        lefts: Sequence[int],
        config: SVDConfig = SVDConfig(),
    ) -> Tuple[Tuple[NodeName, NodeName, NodeName], float]:
        """Split a node into a U - S - V chain along an axis bipartition.

        ``with_orthonormal`` first orthonormalizes the node's environment
        so the local truncation error bounds the global one;
        ``compute_data=False`` performs graph surgery only (symbolic mode
        for the structure-search synthesizer).  Reference semantics:
        ``pytens/algs.py:633``.
        """
        if config.compute_data:
            if config.with_orthonormal:
                node_name = self.orthonormalize(node_name)
            [u, s, v], budget = self.node_tensor(node_name).svd(
                lefts, delta=config.delta
            )
        else:
            x = self.node_tensor(node_name)
            rights = [
                i for i in range(len(x.indices)) if i not in lefts
            ]
            hole = jnp.asarray(np.array([]))
            bl, br = Index("r_split_l", -1), Index("r_split_r", -1)
            u = Tensor(hole, [x.indices[i] for i in lefts] + [bl])
            s = Tensor(hole, [bl, br])
            v = Tensor(hole, [br] + [x.indices[i] for i in rights])
            budget = config.delta

        # install order (v, u, s) and fresh-name draw order are part of
        # the pinned behavioral surface: node insertion order drives
        # later traversal orders in the search engine.
        v_name = self.fresh_node()
        bond_r = self.fresh_index()
        self.add_node(v_name, v.rename_indices({"r_split_r": bond_r}))

        bond_l = self.fresh_index()
        nbrs = list(self.network.neighbors(node_name))
        self.network.remove_node(node_name)
        u_name = node_name
        self.add_node(u_name, u.rename_indices({"r_split_l": bond_l}))

        s_name = self.fresh_node()
        self.add_node(
            s_name,
            s.rename_indices({"r_split_l": bond_l, "r_split_r": bond_r}),
        )

        self._route_neighbors(nbrs, (u_name, v_name))
        self.add_edge(u_name, s_name)
        self.add_edge(s_name, v_name)
        return (u_name, s_name, v_name), budget

    def qr(
        self, node_name: NodeName, lefts: Sequence[int]
    ) -> Tuple[NodeName, NodeName]:
        """Split a node into Q - R along the given axis bipartition.

        Reference semantics: ``pytens/algs.py:704``.
        """
        q, r = self.node_tensor(node_name).qr(lefts)

        bond = self.fresh_index()
        nbrs = list(self.network.neighbors(node_name))
        self.network.remove_node(node_name)

        q_name = node_name
        self.add_node(q_name, q.rename_indices({"r_split": bond}))
        r_name = self.fresh_node()
        self.add_node(r_name, r.rename_indices({"r_split": bond}))

        self._route_neighbors(nbrs, (q_name, r_name))
        self.add_edge(q_name, r_name)
        return q_name, r_name

    def merge(
        self, name1: NodeName, name2: NodeName, compute_data: bool = True
    ) -> NodeName:
        """Contract two adjacent nodes into ``name1``.

        Reference semantics: ``pytens/algs.py:735``.
        """
        if not self.network.has_edge(name1, name2):
            raise RuntimeError(
                f"Cannot merge nodes that are not adjacent: {name1}, {name2}"
            )
        t1 = self.node_tensor(name1)
        t2 = self.node_tensor(name2)
        if compute_data:
            result = t1.contract(t2)
        else:
            survivors = [
                ix for ix in t1.indices if ix not in t2.indices
            ] + [ix for ix in t2.indices if ix not in t1.indices]
            result = Tensor(jnp.asarray(np.array([])), survivors)

        inherited = [
            n for n in self.network.neighbors(name2) if n != name1
        ]
        self.network.remove_node(name2)
        self.set_node_tensor(name1, result)
        for n in inherited:
            self.add_edge(name1, n)
        return name1

    def round(
        self, node_name: NodeName, delta: float
    ) -> Tuple[NodeName, float]:
        """Re-truncate every bond of the tree rooted at ``node_name``.

        Reference semantics (``pytens/algs.py:763``): orthonormalize the
        tree toward the root once, then walk the edges depth-first — each
        bond is split off by a budget-threaded truncated SVD on the root
        side, the SV factor is pushed into the far node, the far subtree
        is processed, and orthogonality is restored by a QR whose R
        factor flows back toward the root.

        Implemented as one explicit-stack loop (no recursion, QTT-depth
        safe): a bond is "settled" once truncated or once its replacement
        flowed back from a finished subtree, and each visit to a node
        simply looks for its next unsettled bond.  Returns the root node
        name and the unused error budget.
        """
        self.orthonormalize(node_name)

        settled: Set[Index] = set()
        parent: Dict[NodeName, Optional[NodeName]] = {node_name: None}
        stack: List[NodeName] = [node_name]
        while stack:
            cur = stack[-1]

            nxt = None
            for ax, ix in enumerate(self.node_tensor(cur).indices):
                if ix in settled:
                    continue
                owner = next(
                    (
                        n
                        for n in self.network.neighbors(cur)
                        if ix in self.node_tensor(n).indices
                    ),
                    None,
                )
                if owner is not None:
                    nxt = (ax, owner)
                    break

            if nxt is not None:
                ax, nbr = nxt
                keep = [
                    i
                    for i in range(len(self.node_tensor(cur).indices))
                    if i != ax
                ]
                (cur, s, v), delta = self.svd(
                    cur,
                    keep,
                    SVDConfig(delta=delta, with_orthonormal=False),
                )
                self.merge(v, s)
                self.merge(nbr, v)
                settled.update(self.get_contraction_index(cur, nbr))
                parent[nbr] = cur
                stack.append(nbr)
                continue

            stack.pop()
            par = parent[cur]
            if par is None:
                continue
            # subtree finished: push the R factor back toward the root
            # and settle the bond it rides on
            to_par = self._shared_with(cur, par)
            keep = [
                i
                for i in range(len(self.node_tensor(cur).indices))
                if i not in to_par
            ]
            _, r_name = self.qr(cur, keep)
            settled.update(self.get_contraction_index(cur, r_name))
            self.merge(par, r_name)

        return node_name, delta

    def compress(self) -> None:
        """Remove nodes one of whose legs carries the full product of the
        other legs (the node is an exact reshape): fold each such node
        into the neighbor on that leg.  Reference: ``pytens/algs.py:829``.
        """
        for name in list(self.network.nodes):
            if name not in self.network.nodes:
                continue
            inds = self.node_tensor(name).indices
            reshape_leg = next(
                (
                    ix
                    for ix in inds
                    if ix.size
                    == int(np.prod([j.size for j in inds if j != ix]))
                ),
                None,
            )
            if reshape_leg is None:
                continue
            host = next(
                (
                    nbr
                    for nbr in self.network.neighbors(name)
                    if reshape_leg in self.node_tensor(nbr).indices
                ),
                None,
            )
            if host is not None:
                self.merge(host, name)

    def _absorb_in_place(self, host: NodeName, piece: NodeName) -> None:
        """Merge ``piece`` into ``host``, leaving the freshly created bond
        axis in the position of the index the two shared — so axis
        positions recorded before the merge stay valid on the result."""
        slot = self._shared_with(host, piece)[0]
        self.merge(host, piece)
        t = self.node_tensor(host)
        k = len(t.indices)
        perm = list(range(slot)) + [k - 1] + list(range(slot, k - 1))
        self.set_node_tensor(host, t.permute(perm))

    def orthonormalize(self, name: NodeName) -> NodeName:
        """Make the environment of ``name`` orthonormal via a leaves-first
        QR schedule pushing R factors toward the target node.

        Reference semantics (``pytens/algs.py:850``), rebuilt as a
        two-phase iterative sweep: ``_rooted_order`` fixes the schedule,
        then each node in leaves-first order absorbs the residuals its
        children handed up (position-preserving, see ``_absorb_in_place``)
        and emits its own residual toward its parent — the R factor of a
        QR over its non-parent axes, or the whole node when it is a
        single-leg core too small for QR to pay.  Axis order of every
        surviving node is preserved (each fresh bond lands where the
        index it replaces was) so positional splits computed before the
        sweep stay valid.  Returns the target node.
        """
        order, parent = self._rooted_order(name)
        handed: Dict[NodeName, List[NodeName]] = {}

        for cur in reversed(order):
            # absorb child residuals in original sibling order
            for piece in reversed(handed.pop(cur, [])):
                self._absorb_in_place(cur, piece)
            par = parent[cur]
            if par is None:
                return cur

            to_par = self._shared_with(cur, par)
            inds = self.node_tensor(cur).indices
            keep = [i for i in range(len(inds)) if i not in to_par]
            par_sz = int(np.prod([inds[i].size for i in to_par]))

            if len(keep) == 1 and inds[keep[0]].size <= par_sz:
                # single small leg: QR gains nothing — hand the whole
                # node up instead
                handed.setdefault(par, []).append(cur)
                continue

            q_name, r_name = self.qr(cur, keep)
            # the fresh bond sits last on Q; move it into the slot of the
            # first parent-facing axis it replaced
            t = self.node_tensor(q_name)
            slot = to_par[0]
            nl = len(keep)
            perm = list(range(slot)) + [nl] + list(range(slot, nl))
            self.set_node_tensor(q_name, t.permute(perm))
            handed.setdefault(par, []).append(r_name)

        return name

    # -- cost & canonical structure ------------------------------------------------------

    def cost(self) -> int:
        """Total number of stored entries (sum of core sizes)."""
        return sum(
            int(np.prod([ix.size for ix in data["tensor"].indices]))
            for _, data in self.network.nodes(data=True)
        )

    def __lt__(self, other: "TensorNetwork") -> bool:
        return self.cost() < other.cost()

    def canonical_structure(self, consider_ranks: bool = False) -> int:
        """Topology hash ignoring values: equal hashes for networks that
        differ only by node naming / index order.  Used for search dedup
        (reference: ``pytens/algs.py:970``).

        AHU-style bottom-up combine over the tree rooted at the node
        carrying the smallest free index, folded iteratively over the
        leaves-first schedule from ``_rooted_order``: each node hashes
        (its sorted free indices, [sorted leg sizes,] the multiset of its
        children's hashes).
        """
        anchor = min(self.free_indices())
        root = next(
            n
            for n, data in self.network.nodes(data=True)
            if anchor in data["tensor"].indices
        )
        all_free = set(self.free_indices())

        order, parent = self._rooted_order(root)
        child_hashes: Dict[NodeName, List[int]] = {n: [] for n in order}
        for cur in reversed(order):
            inds = self.node_tensor(cur).indices
            sig: Tuple = (
                tuple(sorted(ix for ix in inds if ix in all_free)),
            )
            if consider_ranks:
                sig += (tuple(sorted(ix.size for ix in inds)),)
            sig += (tuple(sorted(child_hashes[cur])),)
            h = hash(sig)
            if parent[cur] is None:
                return h
            child_hashes[parent[cur]].append(h)
        raise AssertionError("unreachable: root is last in the schedule")

    # -- dimension trees -------------------------------------------------------------------

    def canonicalize_indices(self, tree: DimTreeNode) -> None:
        """Record, per tree node, the permutation from the node tensor's
        axis order to (free, children bonds, parent bond) order.

        Per-node computation is independent, so one iterative pre-order
        pass suffices (reference recursion: ``pytens/algs.py:1012``).
        """
        for tnode in tree.preorder():
            axes = self.node_tensor(tnode.node).indices
            want: List[Index] = list(tnode.free_indices)
            for child in tnode.down_info.nodes:
                want.append(
                    self.get_contraction_index(child.node, tnode.node)[0]
                )
            up = [ix for ix in axes if ix not in want]
            assert len(up) <= 1, (
                f"expected at most one parent bond, got {up}"
            )
            want.extend(up)
            tnode.perm = [axes.index(ix) for ix in want]

    def dimension_tree(self, root: NodeName) -> DimTreeNode:
        """Build the rooted dimension tree (up/down index assignments) for
        this tree network.  Reference semantics: ``pytens/algs.py:1038``.

        Three iterative passes over the ``_rooted_order`` schedule:
        leaves-first construction of the nodes (each node's subtree index
        list is its own free axes followed by its sorted children's), one
        root-first pass filling every node's down-facing index list (the
        complement seen from its parent), then ``canonicalize_indices``
        for the axis permutations.
        """
        free_set = set(self.free_indices())
        order, parent = self._rooted_order(root)

        built: Dict[NodeName, DimTreeNode] = {}
        collected: Dict[NodeName, List[DimTreeNode]] = {n: [] for n in order}
        for name in reversed(order):
            own_free = [
                ix
                for ix in self.node_tensor(name).indices
                if ix in free_set
            ]
            kids = sorted(collected[name], key=lambda c: c.indices)
            subtree: List[Index] = list(own_free)
            for c in kids:
                subtree.extend(c.indices)
            tnode = DimTreeNode(
                node=name,
                indices=subtree,
                free_indices=sorted(own_free),
                down_info=NodeInfo(kids, [], np.empty(0)),
                up_info=NodeInfo(
                    [], list(subtree), np.empty((0, len(subtree)))
                ),
            )
            for c in kids:
                c.up_info.nodes = [tnode]
            built[name] = tnode
            if parent[name] is not None:
                collected[parent[name]].append(tnode)

        tree = built[root]
        for tnode in tree.preorder():
            if not tnode.up_info.nodes:
                continue  # root sees nothing from above
            p = tnode.up_info.nodes[0]
            seen_above = list(p.free_indices)
            seen_above.extend(p.down_info.indices)
            for sib in p.down_info.nodes:
                if sib.node != tnode.node:
                    seen_above.extend(sib.up_info.indices)
            tnode.down_info.indices = seen_above
            tnode.down_info.vals = np.empty((0, len(seen_above)))

        self.canonicalize_indices(tree)
        return tree

    # -- batched evaluation -------------------------------------------------------------------

    def evaluate(
        self, indices: Sequence[Index], values: np.ndarray,
        precision: str = None,
    ) -> np.ndarray:
        """Evaluate the represented tensor at a batch of multi-indices
        without densifying.

        Per-node gathers plus one batched contraction; batch sizes are
        padded to powers of two so XLA compiles O(log N) distinct shapes.

        ``precision="dw"`` (uniform TT chains): run the device
        evaluation in double-word arithmetic (Ozaki split products,
        hi/lo combined to f64 on host) — ~1e-13 relative on f32 cores
        vs ~1e-7 for the plain f32 device paths.  This is the on-chip
        cross loop's fiber precision (VERDICT r4 item 5).  Topologies
        the packed route cannot express fall back to the default path.
        """
        values = np.asarray(values).astype(int)
        n_total = values.shape[0]
        assert values.shape[1] == len(indices)

        # route the WHOLE call host or device, decided on the largest
        # chunk it will see — per-chunk decisions would mix precision
        # (host f64 vs device f32 accumulation) and out-of-range
        # semantics (host raises IndexError, XLA's gather clamps)
        # within one output array
        host = self._host_eval_ok(
            indices, _next_pow2(min(_EVAL_CHUNK, n_total))
        )
        if precision == "dw":
            # dw beats both default routes when the chain packs; when
            # it does not, the host-f64 route (if eligible) is the
            # accurate fallback, then the default device path
            ragged = self._ragged_evaluator(indices, precision="dw")
            if ragged is not None:
                host = False
        else:
            ragged = None if host else self._ragged_evaluator(indices)

        # the dw kernel's Ozaki combine materializes (chunks, seg, B)
        # temporaries — at the default 65536-point chunk that is GBs of
        # HBM (observed OOM); 8192-point chunks are verified exact and
        # fit comfortably
        chunk_cap = 8192 if (precision == "dw" and ragged) else _EVAL_CHUNK
        out = np.empty(n_total)
        start = 0
        while start < n_total:
            batch = min(chunk_cap, n_total - start)
            padded = _next_pow2(batch)
            chunk = values[start : start + batch]
            if padded != batch:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], padded - batch, axis=0)],
                    axis=0,
                )
            got = (
                ragged(chunk)
                if ragged is not None
                else self._evaluate_chunk(indices, chunk, host=host)
            )
            out[start : start + batch] = np.asarray(got)[:batch]
            start += batch
        return out

    def _ragged_evaluator(
        self, indices: Sequence[Index], precision: str = None
    ):
        """Segment-sorted ragged-matmul route for uniform TT chains.

        Device evaluation of a linear chain with one uniform-size free
        index per core goes through :func:`ops.packed.evaluate` (the
        ``lax.ragged_dot`` kernel, ~3.5x the general one-hot einsum at
        d=50 n=32 r=100 — VALIDATION.md round 3).  This is the hot path
        of cross approximation against device-resident network targets:
        every fiber matrix is one such call.  Returns a
        ``chunk -> (B,)`` callable, or None when the topology/backend
        does not qualify (the general evaluator handles those).

        The packed cores are cached on the instance, keyed by the node
        value OBJECTS (held, and compared by identity — holding them is
        what makes ``is`` sound against CPython id reuse) —
        ``update_val_size`` replaces the value array, so mutation
        invalidates the cache without any bookkeeping in the mutators.
        """
        if precision != "dw" and jax.default_backend() != "tpu" and (
            os.environ.get("TNT_FORCE_PALLAS") != "1"
        ):
            # the dw route is plain XLA (no Mosaic) and is requested
            # explicitly for accuracy, so it runs on any backend; the
            # default f32 fast paths stay TPU-gated
            return None
        if len(self.network.nodes) < 3:
            return None
        from tensor_networks_tpu.ops import packed as _pk

        key = tuple(
            self.node_tensor(n).value for n in self.network.nodes
        )
        if precision == "dw":
            # keep the chain in host f64 (pack_ragged would truncate
            # f64 cores to f32 on a no-x64 backend — the 1.6e-7 floor
            # of the round-5 first-pass on-chip cross); the dw kernel
            # word-splits f64 cores so their full values are honored
            from tensor_networks_tpu.kernels.dw_eval import pack_chain_np

            cached = getattr(self, "_ragged_cache_dw", None)
            if (
                cached is not None
                and len(cached[0]) == len(key)
                and all(a is b for a, b in zip(cached[0], key))
            ):
                pk, frees = cached[1], cached[2]
            else:
                packed = pack_chain_np(self)
                if packed is None:
                    return None
                pk = packed[:3]
                frees = packed[3]
                self._ragged_cache_dw = (key, pk, frees)
        else:
            cached = getattr(self, "_ragged_cache", None)
            if (
                cached is not None
                and len(cached[0]) == len(key)
                and all(a is b for a, b in zip(cached[0], key))
            ):
                pk, frees = cached[1], cached[2]
            else:
                extracted = _pk.chain_cores(self)
                if extracted is None:
                    return None
                frees = extracted[2]
                pk = _pk.pack_ragged(self)
                if pk is None:
                    return None
                self._ragged_cache = (key, pk, frees)
        try:
            cols = [list(indices).index(f) for f in frees]
        except ValueError:  # evaluation over different index set
            return None

        # per-dimension upper bounds: mixed mode sizes are padded to the
        # max inside the pack, so each column clamps at its TRUE size
        ub = jnp.asarray(
            [f.size - 1 for f in frees], jnp.int32
        )[None, :]

        def run(chunk: np.ndarray):
            # clamp like XLA's gather so out-of-range points keep the
            # device path's documented semantics (see the routing
            # comment in :meth:`evaluate`); the ragged kernel's sorted
            # groups would otherwise drop them to garbage
            idx = jnp.clip(jnp.asarray(chunk[:, cols], jnp.int32), 0, ub)
            if precision == "dw":
                from tensor_networks_tpu.kernels.dw_eval import (
                    tt_evaluate_dw,
                )

                return tt_evaluate_dw(pk[0], pk[1], pk[2], idx)
            return _pk.evaluate(pk, idx, precision="highest")

        return run

    def _host_eval_ok(
        self, indices: Sequence[Index], batch: int
    ) -> bool:
        """Whether evaluation should run host-side (TPU backend only).

        True when every node value is host-resident NumPy and every
        gathered operand — ``batch x`` the node's non-gathered dims —
        stays below the host-contraction limit, so the host route never
        falls through to a device dispatch carrying multi-megabyte host
        operands.  Each device evaluate batch shape otherwise costs a
        fresh multi-second remote XLA compile; for cross's validation
        checks at ever-growing ranks that is the entire wall time.
        """
        if jax.default_backend() != "tpu":
            return False
        from tensor_networks_tpu.kernels.linalg import _host_svd_threshold

        limit = _host_svd_threshold()
        index_set = set(indices)
        for node in self.network.nodes:
            tensor = self.node_tensor(node)
            if not isinstance(tensor.value, np.ndarray):
                return False
            rest = int(
                np.prod(
                    [i.size for i in tensor.indices if i not in index_set]
                )
            )
            gathered = any(i in index_set for i in tensor.indices)
            if (batch * rest if gathered else tensor.value.size) >= limit:
                return False
        return True

    def _evaluate_chunk(
        self, indices: Sequence[Index], chunk: np.ndarray, host: bool = False
    ) -> jnp.ndarray:
        """One gather + contraction over a padded batch.

        Device (default): fully jitted, one executable cached by
        (structure, shapes, batch size) — eager per-node gathers are far
        too slow, especially on multi-device backends.  ``host``: the
        same plan in NumPy (see :meth:`_host_eval_ok`).
        """
        fn, values = self.evaluator(indices, chunk.shape[0], host=host)
        return fn(values, chunk if host else jnp.asarray(chunk))

    def evaluator(
        self, indices: Sequence[Index], batch_size: int, host: bool = False
    ):
        """The pure batched-evaluation function of this topology.

        Returns ``(fn, values)`` where ``fn(values, cols) -> (B,)``
        evaluates the network whose node values are ``values`` (listed in
        node order) at the ``(batch_size, len(indices))`` integer
        multi-index array ``cols``.  ``fn`` is jitted, cached by
        structure, and **differentiable in ``values``** — it is the
        building block for gradient-based fitting on arbitrary
        topologies (:mod:`tensor_networks_tpu.fit`).

        ``host=True`` returns a NumPy implementation of the same plan
        instead (no jit, no cache) — used to keep small host-resident
        evaluations off the TPU relay entirely.
        """
        batch_ind = Index("_batch", batch_size)
        operand_indices: List[List[Index]] = []
        plans = []  # (perm or None, gathered columns)
        values = []
        col_of = {ind: c for c, ind in enumerate(indices)}
        for node in self.network.nodes:
            tensor = self.node_tensor(node)
            gathered_axes = []
            gathered_cols = []
            rest_axes = []
            for ii, ind in enumerate(tensor.indices):
                col = col_of.get(ind)
                if col is not None:
                    gathered_axes.append(ii)
                    gathered_cols.append(col)
                else:
                    rest_axes.append(ii)
            if gathered_axes:
                plans.append(
                    (tuple(gathered_axes + rest_axes), tuple(gathered_cols))
                )
                operand_indices.append(
                    [batch_ind] + [tensor.indices[i] for i in rest_axes]
                )
            else:
                plans.append((None, ()))
                operand_indices.append(list(tensor.indices))
            values.append(tensor.value)

        def make_run(xp):
            def run(vals, cols):
                operands = []
                for v, (perm, gcols) in zip(vals, plans):
                    if perm is None:
                        operands.append(xp.asarray(v))
                    else:
                        vt = xp.transpose(xp.asarray(v), perm)
                        idx = tuple(cols[:, c] for c in gcols)
                        operands.append(vt[idx])
                return contract_values(
                    operand_indices, operands, [batch_ind]
                )

            return run

        if host:
            return make_run(np), values

        key = (
            tuple(plans),
            tuple(tuple(v.shape) for v in values),
            tuple(
                tuple((i.name, i.size) for i in ids)
                for ids in operand_indices
            ),
            (batch_size, len(list(indices))),
        )
        if len(_EVAL_FNS) > 1024:  # bound executable-cache growth
            _EVAL_FNS.clear()
        fn = _EVAL_FNS.get(key)
        if fn is None:
            fn = jax.jit(make_run(jnp))
            _EVAL_FNS[key] = fn
        return fn, values

    # -- constructors ------------------------------------------------------------------------------

    @staticmethod
    def rand_tt(
        indices: List[Index], ranks: List[int], dtype=None
    ) -> "TensorNetwork":
        """A random tensor train with the given mode indices and bond ranks."""
        dim = len(indices)
        assert len(ranks) + 1 == len(indices)
        tt = TensorNetwork()

        def randn(*shape):
            arr = np.random.randn(*shape)
            return jnp.asarray(arr if dtype is None else arr.astype(dtype))

        bonds = [Index("r1", ranks[0])]
        tt.add_node(
            0,
            Tensor(randn(indices[0].size, ranks[0]), [indices[0], bonds[0]]),
        )
        for ii, index in enumerate(indices[1:-1]):
            bonds.append(Index(f"r{ii + 2}", ranks[ii + 1]))
            tt.add_node(
                ii + 1,
                Tensor(
                    randn(ranks[ii], index.size, ranks[ii + 1]),
                    [bonds[ii], index, bonds[ii + 1]],
                ),
            )
            tt.add_edge(ii, ii + 1)
        tt.add_node(
            dim - 1,
            Tensor(
                randn(ranks[-1], indices[-1].size), [bonds[-1], indices[-1]]
            ),
        )
        tt.add_edge(dim - 2, dim - 1)
        return tt

    @staticmethod
    def rand_ht(
        indices: List[Index], rank: int, child_each_level: int = 2
    ) -> "TensorNetwork":
        """A random hierarchical Tucker tree over a k-ary dimension split."""
        ht = TensorNetwork()

        def build(pid: int, node_id: int, subset: List[Index], r: int) -> int:
            if len(subset) == 1:
                ind = subset[0]
                ht.add_node(
                    f"G{node_id}",
                    Tensor(
                        jnp.asarray(np.random.random((r, ind.size))),
                        [Index(f"R_{pid}_{node_id}", r), ind],
                    ),
                )
                return node_id + 1

            groups = child_each_level
            group_size = len(subset) // groups
            last_size = len(subset) - (groups - 1) * group_size
            next_id = node_id + 1

            if pid == -1:
                val = np.random.random([r] * child_each_level)
                my_indices: List[Index] = []
            else:
                val = np.random.random([r] * (child_each_level + 1))
                my_indices = [Index(f"R_{pid}_{node_id}", r)]

            for i in range(groups - 1):
                child_id = next_id
                my_indices.append(Index(f"R_{node_id}_{child_id}", r))
                next_id = build(
                    node_id,
                    next_id,
                    subset[i * group_size : (i + 1) * group_size],
                    r,
                )
                ht.add_edge(f"G{child_id}", f"G{node_id}")

            child_id = next_id
            my_indices.append(Index(f"R_{node_id}_{child_id}", r))
            next_id = build(node_id, next_id, subset[-last_size:], r)
            ht.add_edge(f"G{child_id}", f"G{node_id}")

            ht.set_node_tensor(
                f"G{node_id}", Tensor(jnp.asarray(val), my_indices)
            )
            return next_id

        build(-1, 0, indices, rank)
        return ht

    @staticmethod
    def rand_tucker(indices: List[Index], rank: int = 1) -> "TensorNetwork":
        """A random Tucker decomposition with uniform core rank."""
        tucker = TensorNetwork()
        root_inds = [Index(f"s_{i}", rank) for i in range(len(indices))]
        tucker.add_node(
            "root",
            Tensor(
                jnp.asarray(np.random.random([rank] * len(indices))),
                root_inds,
            ),
        )
        for i, ind in enumerate(indices):
            tucker.add_node(
                f"G{i}",
                Tensor(
                    jnp.asarray(np.random.random((ind.size, rank))),
                    [ind, root_inds[i]],
                ),
            )
            tucker.add_edge(f"G{i}", "root")
        return tucker

    # -- tree-aligned binary algebra --------------------------------------------------------------------

    def _binary_op(
        self,
        other: "TensorNetwork",
        op: Literal["add", "mul"],
        trees: Tuple[DimTreeNode, DimTreeNode],
        result_net: "TensorNetwork",
    ) -> None:
        tree1, tree2 = trees
        tensor1 = self.node_tensor(tree1.node)
        tensor2 = other.node_tensor(tree2.node)
        assert len(tensor1.indices) == len(tensor2.indices)

        if op == "add":
            res = tensor1.block_diagonal(tensor2, tree1.free_indices)
        elif op == "mul":
            res = tensor1.mult(tensor2, self.free_indices())
        else:
            raise ValueError(f"Unknown operation {op}")
        result_net.set_node_tensor(tree1.node, res)

        for c1, c2 in zip(tree1.down_info.nodes, tree2.down_info.nodes):
            self._binary_op(other, op, (c1, c2), result_net)

    def _aligned_trees(
        self, other: "TensorNetwork"
    ) -> Tuple[DimTreeNode, DimTreeNode]:
        assert self.network.is_isomorphic_tree(other.network)
        root_ind = self.free_indices()[0]
        self_tree = self.dimension_tree(
            self.node_by_free_index(root_ind.name)
        )
        other_tree = other.dimension_tree(
            other.node_by_free_index(root_ind.name)
        )
        return self_tree, other_tree

    def __add__(self, other: "TensorNetwork") -> "TensorNetwork":
        """Exact structured addition of two isomorphic tree networks."""
        trees = self._aligned_trees(other)
        result = copy.deepcopy(self)
        self._binary_op(other, "add", trees, result)
        return result

    def __sub__(self, other: "TensorNetwork") -> "TensorNetwork":
        neg = copy.deepcopy(other)
        a_node = list(neg.network.nodes)[0]
        a_tensor = neg.node_tensor(a_node)
        neg.set_node_tensor(
            a_node, a_tensor.update_val_size(a_tensor.value * -1)
        )
        return self + neg

    def __mul__(self, other: "TensorNetwork") -> "TensorNetwork":
        """Exact structured Hadamard product (ranks multiply)."""
        trees = self._aligned_trees(other)
        result = copy.deepcopy(self)
        self._binary_op(other, "mul", trees, result)
        return result

    def __str__(self) -> str:
        out = "TensorNetwork\n==========\nNodes:\n------\n"
        for node, data in self.network.nodes(data=True):
            out += (
                f"\t{node}: shape = {tuple(data['tensor'].value.shape)},"
                f"indices = {[i.name for i in data['tensor'].indices]}\n"
            )
        out += "Edges:\n------\n"
        for n1, n2 in self.network.edges():
            out += f"\t{n1} -> {n2}\n"
        return out

    # -- visualization -------------------------------------------------------------------------------------

    def draw(self, ax=None):
        """Draw the network with matplotlib: circles for cores, squares for
        free legs, edge labels showing bond dimensions."""
        from tensor_networks_tpu.viz import draw_network

        draw_network(self, ax=ax)

    # -- serialization ---------------------------------------------------------------------------------------

    def to_dict(self) -> dict:
        """Node-link dict with embedded tensor payloads."""
        nodes = []
        for name, data in self.network.nodes(data=True):
            entry: Dict[str, Any] = {"id": name}
            if "tensor" in data:
                entry["tensor_dict"] = data["tensor"].to_dict()
            nodes.append(entry)
        links = [{"source": u, "target": v} for u, v in self.network.edges()]
        return {"directed": False, "nodes": nodes, "links": links}

    @classmethod
    def from_dict(cls, data_dict: dict) -> "TensorNetwork":
        tn = cls()
        for entry in data_dict["nodes"]:
            name = entry["id"]
            tn.network.add_node(name)
            if "tensor_dict" in entry:
                tn.set_node_tensor(name, Tensor.from_dict(entry["tensor_dict"]))
        for link in data_dict.get("links", []):
            tn.add_edge(link["source"], link["target"])
        return tn

    def to_separated_dict(self) -> Tuple[dict, Dict[Any, np.ndarray]]:
        """Split into JSON-safe metadata plus a dict of raw arrays
        (npz/orbax-style checkpointing)."""
        metadata = self.to_dict()
        arrays: Dict[Any, np.ndarray] = {}
        metadata["numpy_arrays_info"] = {}
        for entry in metadata["nodes"]:
            tensor_dict = entry.pop("tensor_dict", None)
            if tensor_dict is None:
                continue
            node_id = entry["id"]
            arr = np.ascontiguousarray(tensor_dict["value"])
            arrays[node_id] = arr
            metadata["numpy_arrays_info"][node_id] = {
                "shape": [int(d) for d in arr.shape],
                "dtype": arr.dtype.name,
            }
            entry["tensor_indices"] = tensor_dict["indices"]
            for elem in entry["tensor_indices"]:
                if not isinstance(elem["size"], int):
                    try:
                        elem["size"] = [int(d) for d in elem["size"]]
                    except TypeError:
                        elem["size"] = int(elem["size"])
        return metadata, arrays

    def save_npz(self, path: str) -> None:
        """Checkpoint to ``path.npz`` (arrays) + ``path.json`` (topology)."""
        import json

        metadata, arrays = self.to_separated_dict()
        np.savez(
            path + ".npz",
            **{f"node_{i}": arr for i, arr in enumerate(arrays.values())},
        )
        metadata["_node_order"] = [str(k) for k in arrays.keys()]
        metadata["_node_keys"] = [
            ("int", k) if isinstance(k, int) else ("str", k)
            for k in arrays.keys()
        ]
        with open(path + ".json", "w", encoding="utf-8") as f:
            json.dump(metadata, f)

    @classmethod
    def load_npz(cls, path: str) -> "TensorNetwork":
        """Restore a network checkpointed by :meth:`save_npz`."""
        import json

        with open(path + ".json", "r", encoding="utf-8") as f:
            metadata = json.load(f)
        data = np.load(path + ".npz")
        keys = [
            int(k) if kind == "int" else k
            for kind, k in metadata.pop("_node_keys")
        ]
        metadata.pop("_node_order", None)
        arrays = {
            k: data[f"node_{i}"] for i, k in enumerate(keys)
        }
        return cls.from_separated_dict(metadata, arrays)

    @classmethod
    def from_separated_dict(
        cls, metadata: dict, arrays: Dict[Any, np.ndarray]
    ) -> "TensorNetwork":
        for entry in metadata["nodes"]:
            node_id = entry["id"]
            if node_id in arrays:
                entry["tensor_dict"] = {
                    "value": arrays[node_id],
                    "indices": entry.pop("tensor_indices"),
                }
        return cls.from_dict(metadata)


def vector(name: IntOrStr, index: Index, value) -> TensorNetwork:
    """Wrap a 1-D array as a single-node network."""
    vec = TensorNetwork()
    vec.add_node(name, Tensor(jnp.asarray(value), [index]))
    return vec
