"""One-call cross-approximation runners for the standard ansatz families.

Parity reference: ``pytens/cross/runner.py``.
"""

from __future__ import annotations

from abc import abstractmethod
from typing import Optional

import numpy as np

from tensor_networks_tpu.cross.cross import CrossApproximation, CrossConfig
from tensor_networks_tpu.cross.funcs import TensorFunc
from tensor_networks_tpu.network import TensorNetwork


class CrossRunner:
    """Base class: fit a network of a given family to a tensor function."""

    @abstractmethod
    def run(
        self,
        f: TensorFunc,
        eps: float,
        kickrank: int = 2,
        validation: Optional[np.ndarray] = None,
    ) -> TensorNetwork:
        """Run cross approximation to relative accuracy ``eps``."""
        raise NotImplementedError


class TTCrossRunner(CrossRunner):
    """TT-cross: rank-1 initialized tensor train."""

    def run(
        self,
        f: TensorFunc,
        eps: float,
        kickrank: int = 2,
        validation: Optional[np.ndarray] = None,
    ) -> TensorNetwork:
        indices = f.indices[:]
        net = TensorNetwork.rand_tt(indices, [1] * (len(indices) - 1))
        engine = CrossApproximation(f, CrossConfig(kickrank=kickrank))
        engine.cross(net, list(net.network.nodes)[0], validation, eps=eps)
        return net


class HTCrossRunner(CrossRunner):
    """HT-cross: rank-1 initialized hierarchical Tucker tree."""

    def run(
        self,
        f: TensorFunc,
        eps: float,
        kickrank: int = 2,
        validation: Optional[np.ndarray] = None,
    ) -> TensorNetwork:
        net = TensorNetwork.rand_ht(f.indices, 1)
        engine = CrossApproximation(f, CrossConfig(kickrank=kickrank))
        engine.cross(net, list(net.network.nodes)[0], validation, eps=eps)
        return net


class TuckerCrossRunner(CrossRunner):
    """Tucker-cross: rank-1 initialized Tucker decomposition."""

    def run(
        self,
        f: TensorFunc,
        eps: float,
        kickrank: int = 2,
        validation: Optional[np.ndarray] = None,
    ) -> TensorNetwork:
        tucker = TensorNetwork.rand_tucker(f.indices)
        engine = CrossApproximation(f, CrossConfig(kickrank=kickrank))
        engine.cross(tucker, "root", validation, eps=eps)
        return tucker
