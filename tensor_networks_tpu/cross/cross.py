"""Rank-adaptive cross approximation over arbitrary dimension trees.

Subsumes TT-cross, HT-cross, and Tucker-cross: the ansatz is whatever tree
the starting network has.  Each sweep selects row/column pivots per tree
edge (maxvol or DEIM), evaluates the target function on the induced fiber
matrices, and updates cores with the interpolation coefficients; ranks are
kicked and re-clamped between sweeps until the iterate (or a validation
set) converges.  Parity reference: ``pytens/cross/cross.py``.
"""

from __future__ import annotations

import copy
import logging
from enum import Enum, auto
from typing import Optional, Sequence, Tuple

import numpy as np
import pydantic

from tensor_networks_tpu import network as ptn
from tensor_networks_tpu.cross.funcs import TensorFunc
from tensor_networks_tpu.cross.maxvol import maxvol_auto
from tensor_networks_tpu.types import DimTreeNode, NodeName

logger = logging.getLogger(__name__)


class CrossAlgo(Enum):
    """Pivot-selection algorithm."""

    MAXVOL = auto()
    DEIM = auto()


class ConvergenceCheck(Enum):
    """Convergence criterion between sweeps."""

    NORM = auto()  # relative change of the iterate's norm
    VALID_ERROR = auto()  # relative error on a validation set


class CrossConfig(pydantic.BaseModel):
    """Configuration for a cross-approximation run."""

    cross_algo: CrossAlgo = pydantic.Field(
        default=CrossAlgo.MAXVOL,
        description="Configure the algorithm for index selection",
    )
    kickrank: int = pydantic.Field(
        default=2,
        description="Configure the rank increment between iterations",
    )
    max_rank: Optional[int] = pydantic.Field(
        default=None,
        description="Configure the maximum rank that is used in cross",
    )
    max_iters: Optional[int] = pydantic.Field(
        default=None,
        description="Limit the maximum number of sweeps over the entire tree",
    )
    validation_size: int = pydantic.Field(
        default=1000,
        description="Configure the number of validation points",
    )
    convergence: ConvergenceCheck = pydantic.Field(
        default=ConvergenceCheck.NORM,
        description="Configure how to check the algorithm convergence",
    )


class CrossResult(pydantic.BaseModel):
    """Output of a cross run: network, pivot tree, and the rank/error
    trajectory."""

    model_config = pydantic.ConfigDict(arbitrary_types_allowed=True)

    net: "ptn.TensorNetwork"
    dim_tree: DimTreeNode
    ranks_and_errors: Sequence[Tuple[int, float]]


def _deim(u: np.ndarray) -> np.ndarray:
    """Discrete Empirical Interpolation: greedy residual-argmax rows."""
    r = u.shape[1]
    indices = np.empty(r, dtype=int)
    indices[0] = np.argmax(np.abs(u[:, 0]))
    for j in range(1, r):
        uselect = u[indices[:j], :j]
        target = u[indices[:j], j]
        try:
            alpha, *_ = np.linalg.lstsq(uselect, target, rcond=None)
        except np.linalg.LinAlgError:
            alpha = np.linalg.pinv(uselect) @ target
        rvec = u[:, j] - (u[:, :j] @ alpha)
        indices[j] = np.argmax(np.abs(rvec))
    return indices


def _select_indices_maxvol(v: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Orthogonalize then run maxvol; returns (rows, coefficients)."""
    q = np.linalg.qr(np.asarray(v))[0]
    return maxvol_auto(q)


def _select_indices_deim(v: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """DEIM row selection; returns (coefficients, rows)."""
    u, _, _ = np.linalg.svd(np.asarray(v), full_matrices=False)
    i = _deim(u)
    g = u @ np.linalg.pinv(u[i])
    return g, i


def _cartesian_product_arrays(*arrays: np.ndarray) -> np.ndarray:
    """Cartesian product of row sets: (n_i, d_i) inputs give
    (prod n_i, sum d_i)."""
    if len(arrays) == 0:
        return np.array([[]])
    ns = [arr.shape[0] for arr in arrays]
    ds = [arr.shape[1] for arr in arrays]
    total = int(np.prod(ns))
    parts = []
    for i, arr in enumerate(arrays):
        shape = [1] * len(arrays) + [ds[i]]
        shape[i] = ns[i]
        parts.append(np.broadcast_to(arr.reshape(shape), ns + [ds[i]]))
    return np.concatenate(parts, axis=-1).reshape(total, sum(ds))


class CrossApproximation:
    """The cross-approximation sweep engine."""

    def __init__(
        self, tensor_func: TensorFunc, config: CrossConfig = CrossConfig()
    ):
        self._config = config
        self._tensor_func = tensor_func

    def _construct_matrix(self, rows, cols) -> np.ndarray:
        """Evaluate the target at the cartesian product of kept row/column
        multi-indices, shaped as a (cols x rows) fiber matrix."""
        row_idx, row_vals = rows
        col_idx, col_vals = cols
        args = _cartesian_product_arrays(col_vals, row_vals).astype(
            int, copy=False
        )
        indices = list(col_idx) + list(row_idx)
        perm = [indices.index(ind) for ind in self._tensor_func.indices]
        args = args[:, perm]
        return np.asarray(self._tensor_func(args)).reshape(
            len(col_vals), len(row_vals)
        )

    def _select_indices(self, v: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        if self._config.cross_algo == CrossAlgo.MAXVOL:
            ind, b = _select_indices_maxvol(v)
        elif self._config.cross_algo == CrossAlgo.DEIM:
            b, ind = _select_indices_deim(v)
        else:
            raise ValueError(f"unsupported algo {self._config.cross_algo}")
        return ind, b

    def _root_to_leaves(self, node: DimTreeNode) -> None:
        """Refine a node's down-pivots using its parent/sibling pivots."""
        if not node.up_info.nodes:
            return
        down_ranges = []
        p = node.up_info.nodes[0]
        for ind in node.down_info.indices:
            if ind in p.free_indices:
                down_ranges.append(np.arange(ind.size)[:, None])
        if p.up_info.nodes:
            down_ranges.append(p.down_info.vals)
        for c in p.down_info.nodes:
            if c.node != node.node:
                down_ranges.append(c.up_info.vals)

        down_vals = _cartesian_product_arrays(*down_ranges)
        v = self._construct_matrix(
            (node.up_info.indices, node.up_info.vals),
            (node.down_info.indices, down_vals),
        )
        ind, _ = self._select_indices(v)
        node.down_info.vals = down_vals[ind, :]
        node.down_info.rank = len(ind)

    def _leaves_to_root(self, node: DimTreeNode, net) -> None:
        """Refine a node's up-pivots and write its interpolation core."""
        up_ranges, up_sizes = [], []
        for ind in node.up_info.indices:
            if ind in node.free_indices:
                up_sizes.append(ind.size)
                up_ranges.append(np.arange(ind.size)[:, None])
        for c in sorted(node.down_info.nodes):
            up_sizes.append(len(c.up_info.vals))
            up_ranges.append(c.up_info.vals)

        up_vals = _cartesian_product_arrays(*up_ranges)
        v = self._construct_matrix(
            (node.down_info.indices, node.down_info.vals),
            (node.up_info.indices, up_vals),
        )
        ind, b = self._select_indices(v)
        node.up_info.vals = up_vals[ind, :]
        node.up_info.rank = len(ind)
        net.node_tensor(node.node).update_val_size(
            b.reshape(*up_sizes, -1).transpose(np.argsort(node.perm))
        )

    def _incr_ranks(
        self, tree: DimTreeNode, known: Optional[np.ndarray] = None
    ) -> None:
        """Kick all ranks, clamp to neighbor products, add fresh pivots."""
        tree.increment_ranks(self._config.kickrank, self._config.max_rank)
        new_ranks = tree.ranks()
        old_ranks = None
        while new_ranks != old_ranks:
            tree.bound_ranks()
            old_ranks = new_ranks
            new_ranks = tree.ranks()

        if known is None:
            up_vals = np.concatenate(
                [
                    np.random.randint(
                        0, ind.size, [self._config.kickrank, 1]
                    )
                    for ind in tree.indices
                ],
                axis=-1,
            )
        else:
            up_vals = known[
                np.random.randint(0, len(known), [self._config.kickrank])
            ]
        tree.add_values(up_vals)

    def _create_validation_set(self) -> np.ndarray:
        return np.stack(
            [
                np.random.randint(
                    0, ind.size, size=self._config.validation_size
                )
                for ind in self._tensor_func.indices
            ],
            axis=-1,
        )

    def _iterate_tree_nodes(
        self, net, tree_nodes: Sequence[DimTreeNode]
    ) -> None:
        for n in tree_nodes:
            if n.up_info.nodes:
                self._root_to_leaves(n)
        for n in reversed(tree_nodes[1:]):
            self._leaves_to_root(n, net)

    def _get_root_value(
        self, tree: DimTreeNode, f_sizes: Sequence[int], f_vals: np.ndarray
    ) -> np.ndarray:
        ordered = sorted(tree.down_info.nodes)
        c_indices = [ind for c in ordered for ind in c.up_info.indices]
        c_vals = [c.up_info.vals for c in ordered]
        up_vals = _cartesian_product_arrays(*c_vals)
        c_sizes = [len(v) for v in c_vals]
        root_matrix = self._construct_matrix(
            (tree.free_indices, f_vals), (c_indices, up_vals)
        )
        return root_matrix.T.reshape(*f_sizes, *c_sizes).transpose(
            np.argsort(tree.perm)
        )

    def cross(
        self,
        net,
        root: Optional[NodeName] = None,
        validation: Optional[np.ndarray] = None,
        eps: float = 0.1,
        initialization: Optional[np.ndarray] = None,
        known: Optional[np.ndarray] = None,
    ) -> CrossResult:
        """Run cross approximation over the given network structure."""
        if root is None:
            root = list(net.network.nodes)[0]

        tree = net.dimension_tree(root)
        if initialization is None:
            tree.increment_ranks(1, self._config.max_rank)
            first = [np.random.randint(0, ind.size) for ind in tree.indices]
            tree.add_values(np.asarray([first]))
        else:
            tree.increment_ranks(
                len(initialization), self._config.max_rank
            )
            tree.add_values(initialization)

        real = None
        if self._config.convergence == ConvergenceCheck.VALID_ERROR:
            if validation is None:
                validation = self._create_validation_set()
            real = np.asarray(self._tensor_func(validation))

        f_sizes = [ind.size for ind in tree.free_indices]
        f_vals = _cartesian_product_arrays(
            *[np.arange(sz)[:, None] for sz in f_sizes]
        )

        tree_nodes = tree.preorder()
        ranks_and_errs = {}
        trial = 0
        while True:
            old_net = copy.deepcopy(net)
            self._iterate_tree_nodes(net, tree_nodes)

            root_val = self._get_root_value(tree, f_sizes, f_vals)
            net.node_tensor(tree.node).update_val_size(root_val)

            if self._config.convergence == ConvergenceCheck.NORM:
                diff_net = net - old_net
                err = diff_net.norm() / net.norm()
            elif self._config.convergence == ConvergenceCheck.VALID_ERROR:
                estimate = np.asarray(
                    net.evaluate(self._tensor_func.indices, validation)
                ).reshape(-1)
                err = float(
                    np.linalg.norm(real - estimate) / np.linalg.norm(real)
                )
            else:
                raise RuntimeError("unknown termination criteria")

            ranks_and_errs[len(tree.up_info.vals)] = float(err)
            logger.debug("sweep %s: error %s", trial, err)
            if err <= eps or (
                self._config.max_iters is not None
                and trial >= self._config.max_iters
            ):
                break

            trial += 1
            self._incr_ranks(tree, known=known)

        return CrossResult(
            net=net,
            dim_tree=tree,
            ranks_and_errors=sorted(ranks_and_errs.items()),
        )
