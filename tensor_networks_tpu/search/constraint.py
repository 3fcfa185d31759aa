"""Exact rank assignment by branch-and-bound (replaces the reference's
Gurobi ILP, ``pytens/search/constraint.py``).

The problem is tiny — at most ``max_ops`` edges, each with a handful of
binned rank candidates — so an exact host-side search with error-budget
and cost-bound pruning solves it in microseconds, with no closed-source
solver dependency.  Semantics match the ILP: one candidate per edge,
sum of truncation errors <= delta^2, minimize the sum of core sizes,
subject to cost <= upper.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from tensor_networks_tpu.kernels import svd_full
from tensor_networks_tpu.search.configuration import SearchConfig
from tensor_networks_tpu.search.state import Action, OSplit, SearchState
from tensor_networks_tpu.tensor import Tensor
from tensor_networks_tpu.types import Index

BAD_SCORE = 9999999999999


class RankAssignmentSolver:
    """Exact minimizer over per-edge candidate ranks.

    Each variable edge has candidate sizes with associated squared-error
    contributions; each network node costs (product of its fixed index
    sizes) x (product of its variable edges' chosen sizes).
    """

    def __init__(self) -> None:
        self.edges: List[str] = []
        self.candidates: Dict[str, List[int]] = {}
        self.errors: Dict[str, List[float]] = {}
        self.node_terms: List[Tuple[float, List[str]]] = []

    def add_edge(
        self, name: str, sizes: Sequence[int], errs: Sequence[float]
    ) -> None:
        self.edges.append(name)
        self.candidates[name] = list(sizes)
        self.errors[name] = list(errs)

    def add_node_term(self, fixed_cost: float, edge_names: List[str]) -> None:
        self.node_terms.append((fixed_cost, edge_names))

    def solve(
        self, delta: float, upper: float
    ) -> Tuple[Optional[Dict[str, int]], float]:
        """Returns (assignment name->size, cost) or (None, BAD_SCORE)."""
        budget = delta**2
        order = self.edges

        # per-edge minimum possible size (for the cost lower bound) and
        # minimum possible error (for the budget lower bound)
        min_size = {e: min(self.candidates[e]) for e in order}
        min_err = {e: min(self.errors[e]) for e in order}

        def cost_of(assign: Dict[str, int]) -> float:
            total = 0.0
            for fixed, enames in self.node_terms:
                term = fixed
                for e in enames:
                    term *= assign[e]
                total += term
            return total

        def lower_bound(assign: Dict[str, int]) -> float:
            total = 0.0
            for fixed, enames in self.node_terms:
                term = fixed
                for e in enames:
                    term *= assign.get(e, min_size[e])
                total += term
            return total

        best_cost = float(upper)
        best_assign: Optional[Dict[str, int]] = None

        def rec(i: int, assign: Dict[str, int], err: float) -> None:
            nonlocal best_cost, best_assign
            if err > budget:
                return
            if lower_bound(assign) > best_cost:
                return
            if i == len(order):
                c = cost_of(assign)
                if c <= best_cost:
                    best_cost = c
                    best_assign = dict(assign)
                return
            e = order[i]
            remaining_min = sum(min_err[o] for o in order[i + 1 :])
            # try larger sizes first (smaller error) so feasible solutions
            # appear early and tighten the bound
            for sz, er in zip(self.candidates[e], self.errors[e]):
                if err + er + remaining_min > budget:
                    continue
                assign[e] = sz
                rec(i + 1, assign, err + er)
                del assign[e]

        rec(0, {}, 0.0)
        if best_assign is None:
            return None, BAD_SCORE
        return best_assign, best_cost


class ConstraintSearch:
    """Precompute per-bipartition singular values, bin them, and resolve
    candidate ranks exactly."""

    def __init__(self, config: SearchConfig):
        self.config = config
        self.split_actions: Dict[OSplit, Tuple[list, list]] = {}
        self.first_steps: Dict[OSplit, str] = {}
        self.temp_files: List[str] = []
        self.delta = 0.0

    def abstract(self, s: np.ndarray) -> Tuple[List[float], List[int]]:
        """Bin the tail prefix-sums of squared singular values into
        ``bin_size * delta^2`` chunks; returns (error sums, kept sizes)."""
        prev = 0.0
        prev_sum = 0.0
        cnt = 0
        s_sizes = [1]
        s_sums = [float(s[-1] ** 2)]

        chunk = self.config.synthesizer.bin_size * self.delta**2
        truncation_values = [
            x for x in np.cumsum(np.flip(s) ** 2) if x <= self.delta**2
        ]
        for sv in truncation_values[1:]:
            if sv < prev + chunk:
                prev_sum = sv
                cnt += 1
            else:
                prev += chunk
                if cnt != 0:
                    s_sums.append(prev_sum)
                    s_sizes.append(cnt)
                prev_sum = sv
                cnt = 1
        if cnt != 0:
            s_sizes.append(cnt)
            s_sums.append(prev_sum)

        final_sizes = [
            int(len(s) - x) for x in np.cumsum(np.array(s_sizes))
        ]
        return s_sums, final_sizes

    def preprocess_comb(
        self,
        target_tensor: Tensor,
        comb: Sequence[Index],
        compute_uv: bool = False,
    ) -> None:
        """SVD of one free-index bipartition of the dense target; spills
        factors to npz when they are needed for replay."""
        free_indices = target_tensor.indices
        rights = [i for i in free_indices if i not in comb]
        positions = [
            free_indices.index(i) for i in list(comb) + rights
        ]
        tensor_val = np.asarray(target_tensor.value).transpose(positions)
        left_size = int(np.prod([x.size for x in comb]))

        if compute_uv:
            u, s, vt = svd_full(tensor_val.reshape(left_size, -1))
            u, s, vt = np.asarray(u), np.asarray(s), np.asarray(vt)
            os.makedirs(self.config.output.output_dir, exist_ok=True)
            file_name = (
                f"{self.config.output.output_dir}/"
                f"{len(self.first_steps)}.npz"
            )
            np.savez(file_name, u=u, s=s, v=vt)
            self.first_steps[OSplit(comb)] = file_name
            self.temp_files.append(file_name)
        else:
            file_name = (
                f"{self.config.output.output_dir}/"
                f"{len(self.first_steps)}.npz"
            )
            if not self.config.preprocess.force_recompute and os.path.exists(
                file_name
            ):
                s = np.load(file_name)["s"]
                self.first_steps[OSplit(comb)] = file_name
            else:
                _, s, _ = svd_full(tensor_val.reshape(left_size, -1))
                s = np.asarray(s)
            sums, sizes = self.abstract(s)
            self.split_actions[OSplit(comb)] = (sums, sizes)

    def preprocess(
        self,
        target_tensor: Tensor,
        acs: Optional[Sequence[Action]] = None,
        compute_uv: bool = False,
    ) -> None:
        """Precompute binned singular values for every candidate split (or
        only the given actions when replaying).

        When only singular values are needed and no spill cache exists,
        the 2^(d-1)-1 bipartition SVDs are grouped by matricized shape and
        each group runs as ONE vmapped device SVD.
        """
        free_indices = target_tensor.indices
        x_norm = float(np.linalg.norm(np.asarray(target_tensor.value)))
        self.delta = self.config.engine.eps * x_norm
        if acs is not None:
            for ac in acs:
                self.preprocess_comb(target_tensor, ac.indices)
            return

        cache_probe = f"{self.config.output.output_dir}/0.npz"
        if (
            not compute_uv
            and (
                self.config.preprocess.force_recompute
                or not os.path.exists(cache_probe)
            )
        ):
            self._preprocess_batched(target_tensor)
            return

        for comb in SearchState.all_index_combs(free_indices):
            self.preprocess_comb(target_tensor, comb, compute_uv=compute_uv)

    def _preprocess_batched(self, target_tensor: Tensor) -> None:
        """Shape-grouped, vmapped singular-value computation on device."""
        import jax
        import jax.numpy as jnp

        free_indices = target_tensor.indices
        value = jnp.asarray(target_tensor.value)

        groups: Dict[Tuple[int, int], List[Sequence[Index]]] = {}
        mats: Dict[Tuple[int, int], List[jnp.ndarray]] = {}
        for comb in SearchState.all_index_combs(free_indices):
            rights = [i for i in free_indices if i not in comb]
            positions = [
                free_indices.index(i) for i in list(comb) + rights
            ]
            left = int(np.prod([x.size for x in comb]))
            mat = jnp.transpose(value, positions).reshape(left, -1)
            groups.setdefault(mat.shape, []).append(comb)
            mats.setdefault(mat.shape, []).append(mat)

        for shape, combs in groups.items():
            stack = jnp.stack(mats[shape])
            svals = jax.vmap(
                lambda a: jnp.linalg.svd(a, compute_uv=False)
            )(stack)
            svals = np.asarray(svals)
            for comb, s in zip(combs, svals):
                sums, sizes = self.abstract(s)
                self.split_actions[OSplit(comb)] = (sums, sizes)

    def get_cost(
        self, st: SearchState, upper: float
    ) -> Tuple[Dict[int, int], float]:
        """Best rank assignment for the state's symbolic split program.

        Relabels the state's bond indices to candidate tuples, solves the
        assignment exactly, and relabels to the solved ranks (mirroring
        the reference's in-place protocol so downstream cost queries see
        concrete sizes).
        """
        pfsums: Dict[str, list] = {}
        relabel_map: Dict[str, tuple] = {}
        for idx, ac in enumerate(st.past_actions):
            if not isinstance(ac, OSplit):
                index_ac = ac.to_osplit(st, idx)
            else:
                index_ac = ac
            ac_sums, ac_sizes = self.split_actions[index_ac]
            pfsums[st.links[idx]] = ac_sums
            relabel_map[st.links[idx]] = tuple(ac_sizes)

        st.network.relabel_indices(relabel_map)
        indices = st.network.all_indices()
        free_indices = st.network.free_indices()

        solver = RankAssignmentSolver()
        var_indices = []
        for ind in indices:
            if ind not in free_indices:
                var_indices.append(ind)
                solver.add_edge(ind.name, ind.size, pfsums[ind.name])

        for n in st.network.network.nodes:
            node = st.network.node_tensor(n)
            fixed = 1.0
            enames = []
            for ind in node.indices:
                if ind in free_indices:
                    fixed *= ind.size
                else:
                    enames.append(ind.name)
            solver.add_node_term(fixed, enames)

        assignment, cost = solver.solve(self.delta, upper)
        if assignment is None:
            return {}, BAD_SCORE

        st.network.relabel_indices(assignment)
        result = {}
        for ind_name, ind_size in assignment.items():
            for k, link in enumerate(st.links):
                if link == ind_name:
                    result[k] = ind_size
                    break
        return result, st.network.cost()
