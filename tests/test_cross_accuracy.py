"""The BASELINE 1e-10 cross-accuracy target: maxvol TT-cross of an
analytic (exactly low-rank) function must reach 1e-10 relative error."""

import numpy as np

from tensor_networks_tpu import Index, TensorNetwork
from tensor_networks_tpu.cross import (
    CachedFunc,
    CrossApproximation,
    CrossConfig,
)

np.random.seed(7)


class FuncExpSum(CachedFunc):
    """exp(sum_k x_k) — an exactly rank-1 separable analytic function."""

    def __init__(self, indices):
        inds = [
            ind.with_new_rng(np.linspace(0.0, 1.0, ind.size))
            for ind in indices
        ]
        super().__init__(inds)
        self.name = "ExpSum"

    def _run(self, args):
        return np.exp(np.sum(args, axis=1))


class FuncRankTwo(CachedFunc):
    """sin(sum x) = a genuinely rank-2 trigonometric tensor."""

    def __init__(self, indices):
        inds = [
            ind.with_new_rng(np.linspace(0.0, np.pi / 2, ind.size))
            for ind in indices
        ]
        super().__init__(inds)
        self.name = "SinSum"

    def _run(self, args):
        return np.sin(np.sum(args, axis=1))


def _validate(func, res, indices):
    grid = np.stack(
        np.meshgrid(*[range(ind.size) for ind in indices]), axis=-1
    ).reshape(-1, len(indices))
    real = np.asarray(func(grid))
    approx = np.asarray(res.net.evaluate(func.indices, grid))
    return np.linalg.norm(real - approx) / np.linalg.norm(real)


def test_tt_cross_reaches_1e10_rank1():
    indices = [Index("i", 12), Index("j", 12), Index("k", 12)]
    func = FuncExpSum(indices)
    net = TensorNetwork.rand_tt(func.indices, [1, 1])
    engine = CrossApproximation(func, CrossConfig(kickrank=2))
    res = engine.cross(net, eps=1e-11)
    assert _validate(func, res, indices) <= 1e-10


def test_tt_cross_reaches_1e10_rank2():
    indices = [Index("i", 12), Index("j", 12), Index("k", 12), Index("l", 12)]
    func = FuncRankTwo(indices)
    net = TensorNetwork.rand_tt(func.indices, [1, 1, 1])
    engine = CrossApproximation(func, CrossConfig(kickrank=2))
    res = engine.cross(net, eps=1e-11)
    assert _validate(func, res, indices) <= 1e-10
