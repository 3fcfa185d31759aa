"""Rank-adaptive cross approximation over arbitrary dimension trees.

One engine subsumes TT-cross, HT-cross, and Tucker-cross: the ansatz is
whatever tree the starting network has.  A sweep walks the dimension tree
twice (root->leaves refining down-pivots, leaves->root refining up-pivots
and writing interpolation cores); between sweeps every bond rank is
kicked and re-clamped until the iterate — or a validation set — stops
changing.

Pivot selection is pluggable (maxvol / DEIM); fiber matrices come from
batched target-function evaluation, which for network-valued targets is
the jitted gather+contract path.
"""

from __future__ import annotations

import copy
import logging
from enum import Enum, auto
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np
import pydantic

from tensor_networks_tpu import network as ptn
from tensor_networks_tpu.cross.funcs import TensorFunc
from tensor_networks_tpu.cross.maxvol import maxvol_auto
from tensor_networks_tpu.dimtree import DimTreeNode
from tensor_networks_tpu.types import NodeName

logger = logging.getLogger(__name__)


class CrossAlgo(Enum):
    """Which pivot-selection rule drives the sweeps."""

    MAXVOL = auto()
    DEIM = auto()


class ConvergenceCheck(Enum):
    """What decides that the sweeps have converged."""

    NORM = auto()
    VALID_ERROR = auto()


class CrossConfig(pydantic.BaseModel):
    """Knobs for a cross-approximation run (schema-compatible with the
    reference's config)."""

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
    """What a cross run hands back: the fitted network, the pivot tree,
    and the (rank, error) trajectory across sweeps."""

    model_config = pydantic.ConfigDict(arbitrary_types_allowed=True)

    net: "ptn.TensorNetwork"
    dim_tree: DimTreeNode
    ranks_and_errors: Sequence[Tuple[int, float]]


# --------------------------- pivot selection ---------------------------


def _pivots_maxvol(fiber: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Orthogonalize the fiber matrix, then take maxvol rows.

    Returns (row indices, interpolation coefficients B with
    fiber ~= B @ fiber[rows])."""
    basis = np.linalg.qr(np.asarray(fiber))[0]
    return maxvol_auto(basis)


def _pivots_deim(fiber: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Discrete Empirical Interpolation rows of the left singular basis."""
    u = np.linalg.svd(np.asarray(fiber), full_matrices=False)[0]
    r = u.shape[1]
    rows = np.empty(r, dtype=int)
    rows[0] = np.argmax(np.abs(u[:, 0]))
    for j in range(1, r):
        lead = u[rows[:j], :j]
        rhs = u[rows[:j], j]
        try:
            alpha = np.linalg.lstsq(lead, rhs, rcond=None)[0]
        except np.linalg.LinAlgError:
            alpha = np.linalg.pinv(lead) @ rhs
        residual = u[:, j] - u[:, :j] @ alpha
        rows[j] = np.argmax(np.abs(residual))
    coeffs = u @ np.linalg.pinv(u[rows])
    return rows, coeffs


_PIVOT_RULES: Dict[CrossAlgo, Callable] = {
    CrossAlgo.MAXVOL: _pivots_maxvol,
    CrossAlgo.DEIM: _pivots_deim,
}


def _cartesian_product_arrays(*arrays: np.ndarray) -> np.ndarray:
    """Row-wise cartesian product: (n_i, d_i) inputs ->
    (prod n_i, sum d_i)."""
    if not arrays:
        return np.array([[]])
    counts = [a.shape[0] for a in arrays]
    widths = [a.shape[1] for a in arrays]
    total = int(np.prod(counts))
    pieces = []
    for pos, arr in enumerate(arrays):
        view = [1] * len(arrays) + [widths[pos]]
        view[pos] = counts[pos]
        pieces.append(
            np.broadcast_to(arr.reshape(view), counts + [widths[pos]])
        )
    return np.concatenate(pieces, axis=-1).reshape(total, sum(widths))


# ----------------------------- the engine ------------------------------


class CrossApproximation:
    """Dimension-tree cross-approximation sweeps."""

    def __init__(
        self, tensor_func: TensorFunc, config: CrossConfig = CrossConfig()
    ):
        self._config = config
        self._tensor_func = tensor_func

    # -- fiber evaluation --------------------------------------------------

    def _fiber_matrix(self, rows, cols) -> np.ndarray:
        """Target values on the cartesian product of kept pivots, shaped
        (n_cols x n_rows)."""
        row_idx, row_vals = rows
        col_idx, col_vals = cols
        pts = _cartesian_product_arrays(col_vals, row_vals).astype(
            int, copy=False
        )
        ordering = list(col_idx) + list(row_idx)
        take = [ordering.index(ind) for ind in self._tensor_func.indices]
        values = self._tensor_func(pts[:, take])
        return np.asarray(values).reshape(len(col_vals), len(row_vals))

    def _pick(self, fiber: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        rule = _PIVOT_RULES.get(self._config.cross_algo)
        if rule is None:
            raise ValueError(
                f"unsupported algo {self._config.cross_algo}"
            )
        if self._config.cross_algo == CrossAlgo.DEIM:
            rows, coeffs = rule(fiber)
            return rows, coeffs
        return rule(fiber)

    # -- the two half-sweeps -------------------------------------------------

    def _refine_down(self, node: DimTreeNode) -> None:
        """Root->leaves: re-select this node's down pivots against the
        parent's and siblings' current pivot sets."""
        parent = node.up_info.nodes[0]
        ranges = []
        for ind in node.down_info.indices:
            if ind in parent.free_indices:
                ranges.append(np.arange(ind.size)[:, None])
        if parent.up_info.nodes:
            ranges.append(parent.down_info.vals)
        for sibling in parent.down_info.nodes:
            if sibling.node != node.node:
                ranges.append(sibling.up_info.vals)

        candidates = _cartesian_product_arrays(*ranges)
        fiber = self._fiber_matrix(
            (node.up_info.indices, node.up_info.vals),
            (node.down_info.indices, candidates),
        )
        rows, _ = self._pick(fiber)
        node.down_info.vals = candidates[rows, :]
        node.down_info.rank = len(rows)

    def _refine_up(self, node: DimTreeNode, net) -> None:
        """Leaves->root: re-select up pivots and install the node's
        interpolation core."""
        ranges, sizes = [], []
        for ind in node.up_info.indices:
            if ind in node.free_indices:
                sizes.append(ind.size)
                ranges.append(np.arange(ind.size)[:, None])
        for child in sorted(node.down_info.nodes):
            sizes.append(len(child.up_info.vals))
            ranges.append(child.up_info.vals)

        candidates = _cartesian_product_arrays(*ranges)
        fiber = self._fiber_matrix(
            (node.down_info.indices, node.down_info.vals),
            (node.up_info.indices, candidates),
        )
        rows, coeffs = self._pick(fiber)
        node.up_info.vals = candidates[rows, :]
        node.up_info.rank = len(rows)
        core = coeffs.reshape(*sizes, -1).transpose(np.argsort(node.perm))
        net.node_tensor(node.node).update_val_size(core)

    def _sweep(self, net, tree_nodes: Sequence[DimTreeNode]) -> None:
        for node in tree_nodes:
            if node.up_info.nodes:
                self._refine_down(node)
        for node in reversed(tree_nodes[1:]):
            self._refine_up(node, net)

    def _root_core(
        self, tree: DimTreeNode, f_sizes: Sequence[int], f_vals: np.ndarray
    ) -> np.ndarray:
        children = sorted(tree.down_info.nodes)
        c_indices = [i for c in children for i in c.up_info.indices]
        c_vals = [c.up_info.vals for c in children]
        fiber = self._fiber_matrix(
            (tree.free_indices, f_vals),
            (c_indices, _cartesian_product_arrays(*c_vals)),
        )
        c_sizes = [len(v) for v in c_vals]
        return fiber.T.reshape(*f_sizes, *c_sizes).transpose(
            np.argsort(tree.perm)
        )

    # -- rank schedule ----------------------------------------------------------

    def _grow_ranks(
        self, tree: DimTreeNode, known: Optional[np.ndarray]
    ) -> None:
        """Kick every rank, clamp to neighbor products (to fixpoint), and
        seed fresh pivot rows."""
        kick = self._config.kickrank
        tree.increment_ranks(kick, self._config.max_rank)
        prev = None
        while tree.ranks() != prev:
            prev = tree.ranks()
            tree.bound_ranks()

        if known is None:
            fresh = np.concatenate(
                [
                    np.random.randint(0, ind.size, [kick, 1])
                    for ind in tree.indices
                ],
                axis=-1,
            )
        else:
            fresh = known[np.random.randint(0, len(known), [kick])]
        tree.add_values(fresh)

    def _sample_validation(self) -> np.ndarray:
        size = self._config.validation_size
        return np.stack(
            [
                np.random.randint(0, ind.size, size=size)
                for ind in self._tensor_func.indices
            ],
            axis=-1,
        )

    # -- driver ---------------------------------------------------------------------

    def cross(
        self,
        net,
        root: Optional[NodeName] = None,
        validation: Optional[np.ndarray] = None,
        eps: float = 0.1,
        initialization: Optional[np.ndarray] = None,
        known: Optional[np.ndarray] = None,
    ) -> CrossResult:
        """Fit ``net``'s structure to the target function.

        ``initialization`` seeds the starting pivots; ``known`` restricts
        fresh pivots to rows of a known-support set.
        """
        if root is None:
            root = list(net.network.nodes)[0]
        tree = net.dimension_tree(root)

        if initialization is None:
            tree.increment_ranks(1, self._config.max_rank)
            seed = [np.random.randint(0, i.size) for i in tree.indices]
            tree.add_values(np.asarray([seed]))
        else:
            tree.increment_ranks(
                len(initialization), self._config.max_rank
            )
            tree.add_values(initialization)

        check = self._config.convergence
        real = None
        if check == ConvergenceCheck.VALID_ERROR:
            if validation is None:
                validation = self._sample_validation()
            real = np.asarray(self._tensor_func(validation))

        f_sizes = [ind.size for ind in tree.free_indices]
        f_vals = _cartesian_product_arrays(
            *[np.arange(sz)[:, None] for sz in f_sizes]
        )

        tree_nodes = tree.preorder()
        trajectory: Dict[int, float] = {}
        sweep_no = 0
        while True:
            previous = copy.deepcopy(net)
            self._sweep(net, tree_nodes)
            net.node_tensor(tree.node).update_val_size(
                self._root_core(tree, f_sizes, f_vals)
            )

            if check == ConvergenceCheck.NORM:
                err = (net - previous).norm() / net.norm()
            elif check == ConvergenceCheck.VALID_ERROR:
                estimate = np.asarray(
                    net.evaluate(self._tensor_func.indices, validation)
                ).reshape(-1)
                err = float(
                    np.linalg.norm(real - estimate)
                    / np.linalg.norm(real)
                )
            else:
                raise RuntimeError("unknown termination criteria")

            trajectory[len(tree.up_info.vals)] = float(err)
            logger.debug("sweep %s: error %s", sweep_no, err)
            max_iters = self._config.max_iters
            if err <= eps or (
                max_iters is not None and sweep_no >= max_iters
            ):
                break
            sweep_no += 1
            self._grow_ranks(tree, known)

        return CrossResult(
            net=net,
            dim_tree=tree,
            ranks_and_errors=sorted(trajectory.items()),
        )
