"""Edge-aware contraction planning + jit-compiled execution cache.

The reference library rebuilds an einsum string and re-runs opt_einsum's
path search on *every* contraction (``pytens/algs.py:446-485``), and its
README acknowledges the resulting bad dimension scaling.  Here the plan is
a first-class cached artifact:

  * index names are interned to integer ids (no 52-letter einsum limit, so
    d=640 trains work),
  * the contraction path is computed once per (structure, shapes, dtype)
    signature and the whole contraction is compiled to a single XLA
    executable,
  * repeated contractions of the same structure (the hot loop of GMRES,
    norm computations, and structure search) hit the executable cache and
    dispatch in microseconds.

Path quality: for <= 8 operands we let opt_einsum search optimally; above
that a size-greedy search is used, which recovers the O(d n r^3) zipper
order on TT chains/ladders (the exact fix the reference README asks for).
"""

from __future__ import annotations

import threading
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import opt_einsum as oe

_CACHE: Dict[tuple, "CompiledContraction"] = {}
_CACHE_LOCK = threading.Lock()

# opt_einsum path strategy by operand count
_OPTIMAL_MAX_OPERANDS = 8


def _symbols(ids: Sequence[int]) -> str:
    return "".join(oe.get_symbol(i) for i in ids)


class CompiledContraction:
    """A jitted einsum over interned index ids with a frozen path."""

    def __init__(
        self,
        operand_ids: Tuple[Tuple[int, ...], ...],
        out_ids: Tuple[int, ...],
        shapes: Tuple[Tuple[int, ...], ...],
    ):
        self.operand_ids = operand_ids
        self.out_ids = out_ids
        expr = ",".join(_symbols(ids) for ids in operand_ids)
        expr += "->" + _symbols(out_ids)
        self.expression = expr

        n_ops = len(operand_ids)
        self.path = None
        if n_ops >= 2:
            self.path = self._native_path(operand_ids, out_ids, shapes)
        if n_ops >= 2 and self.path is None:
            optimize = (
                "optimal" if n_ops <= _OPTIMAL_MAX_OPERANDS else "greedy"
            )
            self.path, _ = oe.contract_path(
                expr, *shapes, shapes=True, optimize=optimize
            )

        def run(*arrays):
            if self.path is not None:
                return jnp.einsum(expr, *arrays, optimize=self.path)
            return jnp.einsum(expr, *arrays)

        self._fn = jax.jit(run)

    def run_host(self, *arrays: np.ndarray) -> np.ndarray:
        """The same contraction on host NumPy (same frozen path)."""
        if self.path is not None:
            return oe.contract(
                self.expression, *arrays, optimize=self.path
            )
        return np.einsum(self.expression, *arrays)

    @staticmethod
    def _native_path(operand_ids, out_ids, shapes):
        """Exact minimum-flop path from the C++ subset DP, when in range."""
        from tensor_networks_tpu.native import (
            MAX_NATIVE_OPERANDS,
            optimal_path,
        )

        n_ops = len(operand_ids)
        if not (2 < n_ops <= MAX_NATIVE_OPERANDS):
            return None
        dim_of_id: dict = {}
        for ids, shape in zip(operand_ids, shapes):
            for i, sz in zip(ids, shape):
                dim_of_id[i] = float(sz)
        n_ids = max(dim_of_id) + 1 if dim_of_id else 0
        if n_ids >= 64 or len(dim_of_id) != n_ids:
            return None
        dims = [dim_of_id[i] for i in range(n_ids)]
        return optimal_path(operand_ids, out_ids, dims)

    def __call__(self, *arrays):
        return self._fn(*arrays)


# stand-in size for symbolic (shape-polymorphic) dimensions during path
# planning — the batch axis of an exported evaluator is the typical case,
# so plan as if it were large
_SYMBOLIC_PLAN_SIZE = 8192


def get_contraction(
    operand_ids: Sequence[Sequence[int]],
    out_ids: Sequence[int],
    shapes: Sequence[Sequence[int]],
    dtype,
) -> CompiledContraction:
    """Fetch (or build) the compiled contraction for this signature.

    Shapes may carry symbolic dimensions (``jax.export.symbolic_shape``):
    the contraction itself is shape-polymorphic, so symbolic dims only
    matter for path planning, where they are treated as
    ``_SYMBOLIC_PLAN_SIZE``; the cache keys them by name.
    """
    concrete = tuple(
        tuple(
            int(s)
            if isinstance(s, (int, np.integer))
            else _SYMBOLIC_PLAN_SIZE
            for s in shape
        )
        for shape in shapes
    )
    key = (
        tuple(tuple(ids) for ids in operand_ids),
        tuple(out_ids),
        tuple(
            tuple(
                int(s) if isinstance(s, (int, np.integer)) else str(s)
                for s in shape
            )
            for shape in shapes
        ),
        np.dtype(dtype).name,
    )
    with _CACHE_LOCK:
        hit = _CACHE.get(key)
    if hit is not None:
        return hit
    built = CompiledContraction(key[0], key[1], concrete)
    with _CACHE_LOCK:
        _CACHE[key] = built
    return built


def intern_ids(index_lists: Sequence[Sequence]) -> List[List[int]]:
    """Assign a stable integer id to each distinct index object."""
    mapping: Dict[object, int] = {}
    out: List[List[int]] = []
    for indices in index_lists:
        row = []
        for ind in indices:
            if ind not in mapping:
                mapping[ind] = len(mapping)
            row.append(mapping[ind])
        out.append(row)
    return out


def contract_values(
    index_lists: Sequence[Sequence],
    values: Sequence[jnp.ndarray],
    output_indices: Sequence,
) -> jnp.ndarray:
    """Contract arbitrary named-index operands down to ``output_indices``.

    The generic entry point used by ``TensorNetwork.contract`` and friends.
    """
    ids = intern_ids(list(index_lists) + [list(output_indices)])
    operand_ids, out_ids = ids[:-1], ids[-1]
    shapes = [tuple(v.shape) for v in values]
    dtype = np.result_type(*[v.dtype for v in values])
    fn = get_contraction(operand_ids, out_ids, shapes, dtype)

    # TPU backend, small HOST-RESIDENT operands: run on host.  XLA's
    # TPU pipeline pays a fresh multi-second remote compile per new
    # contraction signature, so host BLAS wins for the small one-off
    # shapes search preprocessing generates.  The gate requires every
    # operand to already be NumPy: fetching device arrays through the
    # relay costs far more than a cached-executable dispatch (measured
    # 64-463 s for an 8-state DFS when this path fetched, vs 21 s
    # without), so data is never moved to reach this path.
    if jax.default_backend() == "tpu" and all(
        isinstance(v, np.ndarray) for v in values
    ):
        from tensor_networks_tpu.kernels.linalg import _host_svd_threshold

        limit = _host_svd_threshold()
        out_size = 1
        dim_of: Dict[int, int] = {}
        for ids_row, shape in zip(operand_ids, shapes):
            for i, sz in zip(ids_row, shape):
                dim_of[i] = sz
        for i in out_ids:
            out_size *= dim_of[i]
        if out_size < limit and all(v.size < limit for v in values):
            return fn.run_host(*values)

    return fn(*values)


def clear_cache() -> None:
    """Drop all compiled contractions (mostly for tests/benchmarks)."""
    with _CACHE_LOCK:
        _CACHE.clear()


def cache_size() -> int:
    with _CACHE_LOCK:
        return len(_CACHE)
