"""Target-function abstraction for cross approximation.

A :class:`TensorFunc` maps integer multi-indices to argument values via
each index's ``value_choices`` grid and evaluates a user function in
batch.  :class:`CachedFunc` counts unique evaluations — the key efficiency
metric of cross approximation.  Parity reference: ``pytens/cross/funcs.py``.
"""

from __future__ import annotations

from abc import abstractmethod
from typing import List

import numpy as np

from tensor_networks_tpu.types import Index


class TensorFunc:
    """Abstract tensor function over named indices.

    Subclasses implement ``run(args)`` taking an (n, d) array of argument
    values and returning an (n,) array of function values.
    """

    def __init__(self, indices: List[Index]):
        self.d = len(indices)
        self.indices = indices
        self.name = "_func_"

    def index_to_args(self, indices: np.ndarray) -> np.ndarray:
        """Map integer multi-indices to argument values via the per-index
        ``value_choices`` grids."""
        indices = np.asarray(indices).astype(int)
        args = np.empty_like(indices, dtype=float)
        for i, ind in enumerate(self.indices):
            args[:, i] = np.asarray(ind.value_choices)[indices[:, i]]
        return args

    def size(self) -> int:
        """Total number of tensor entries."""
        res = 1
        for ind in self.indices:
            res *= ind.size
        return res

    @property
    def shape(self) -> List[int]:
        """Mode sizes of the represented tensor."""
        result = [0] * len(self.indices)
        for i, ind in enumerate(self.indices):
            if isinstance(ind.size, int):
                result[i] = ind.size
            elif isinstance(ind.size, tuple):
                result[i] = ind.size[-1]
            else:
                raise TypeError("Unsupported index size type")
        return result

    def cost(self) -> int:
        """Proxy for the cost of storing the dense tensor."""
        return int(np.prod(self.shape))

    def free_indices(self) -> List[Index]:
        """The indices defining this function's domain."""
        return self.indices

    @abstractmethod
    def run(self, args: np.ndarray) -> np.ndarray:
        """Evaluate at a batch of argument values: (n, d) -> (n,)."""
        raise NotImplementedError

    def __call__(self, indices: np.ndarray) -> np.ndarray:
        return self.run(self.index_to_args(indices))


class CachedFunc(TensorFunc):
    """Tensor function that records every evaluated argument row.

    ``num_calls()`` reports *unique* evaluations — the standard measure of
    cross-approximation sample efficiency.
    """

    def __init__(self, indices: List[Index]):
        super().__init__(indices)
        self.calls = np.empty((0, self.d))

    def num_calls(self) -> int:
        """Number of unique argument rows evaluated so far."""
        return len(np.unique(self.calls, axis=0))

    @abstractmethod
    def _run(self, args: np.ndarray) -> np.ndarray:
        """Subclass hook: evaluate at (n, d) argument values."""
        raise NotImplementedError

    def run(self, args: np.ndarray) -> np.ndarray:
        self.calls = np.concatenate([args, self.calls])
        return self._run(args)


class FuncData(CachedFunc):
    """A dense array viewed as a tensor function (fancy-index lookups)."""

    def __init__(self, indices: List[Index], data: np.ndarray):
        super().__init__(indices)
        self.data = data

    def _run(self, args: np.ndarray) -> np.ndarray:
        return self.data[tuple(np.asarray(args).astype(int).T)]


class FuncTensorNetwork(CachedFunc):
    """An existing tensor network viewed as a tensor function; evaluation
    lowers to the network's jitted batched-gather contraction."""

    def __init__(self, indices: List[Index], net):
        super().__init__(indices)
        self.net = net

    def _run(self, args: np.ndarray) -> np.ndarray:
        return self.net.evaluate(self.indices, np.asarray(args).astype(int))

    def cost(self) -> int:
        """Evaluation cost of the underlying network."""
        return self.net.cost()
