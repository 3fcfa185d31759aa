"""One-call cross-approximation entry points per ansatz family.

Each runner builds a rank-1 starting structure of its family and drives
:class:`CrossApproximation` to the requested accuracy.  The families are
table-driven; add a new ansatz by registering a builder.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np

from tensor_networks_tpu.cross.cross import CrossApproximation, CrossConfig
from tensor_networks_tpu.cross.funcs import TensorFunc
from tensor_networks_tpu.network import TensorNetwork
from tensor_networks_tpu.types import NodeName

AnsatzBuilder = Callable[[TensorFunc], Tuple[TensorNetwork, NodeName]]


def _build_tt(f: TensorFunc) -> Tuple[TensorNetwork, NodeName]:
    net = TensorNetwork.rand_tt(f.indices[:], [1] * (len(f.indices) - 1))
    return net, list(net.network.nodes)[0]


def _build_ht(f: TensorFunc) -> Tuple[TensorNetwork, NodeName]:
    net = TensorNetwork.rand_ht(f.indices, 1)
    return net, list(net.network.nodes)[0]


def _build_tucker(f: TensorFunc) -> Tuple[TensorNetwork, NodeName]:
    return TensorNetwork.rand_tucker(f.indices), "root"


_ANSATZ_BUILDERS: Dict[str, AnsatzBuilder] = {
    "tt": _build_tt,
    "ht": _build_ht,
    "tucker": _build_tucker,
}


class CrossRunner:
    """Fit a tensor network of a chosen family to a tensor function.

    Subclasses pin ``ansatz``; alternatively construct directly with
    ``CrossRunner(ansatz="tt")``.
    """

    ansatz: str = "tt"

    def __init__(self, ansatz: Optional[str] = None):
        if ansatz is not None:
            self.ansatz = ansatz
        if self.ansatz not in _ANSATZ_BUILDERS:
            raise ValueError(f"unknown ansatz {self.ansatz!r}")

    def run(
        self,
        f: TensorFunc,
        eps: float,
        kickrank: int = 2,
        validation: Optional[np.ndarray] = None,
    ) -> TensorNetwork:
        """Run cross approximation to relative accuracy ``eps`` and
        return the fitted network."""
        net, root = _ANSATZ_BUILDERS[self.ansatz](f)
        engine = CrossApproximation(f, CrossConfig(kickrank=kickrank))
        engine.cross(net, root, validation, eps=eps)
        return net


class TTCrossRunner(CrossRunner):
    """TT-cross."""

    ansatz = "tt"


class HTCrossRunner(CrossRunner):
    """Hierarchical-Tucker cross."""

    ansatz = "ht"


class TuckerCrossRunner(CrossRunner):
    """Tucker cross."""

    ansatz = "tucker"
