"""Cross-approximation tests — parity with the reference suite
(``tests/main_test.py`` TestCross), same 1e-4 accuracy targets."""

from typing import List

import numpy as np
import pytest

from tensor_networks_tpu import Index, TensorNetwork
from tensor_networks_tpu.cross import (
    ConvergenceCheck,
    CrossAlgo,
    CrossApproximation,
    CrossConfig,
    CachedFunc,
)

np.random.seed(4)


class FuncAckley(CachedFunc):
    """Ackley benchmark function (https://www.sfu.ca/~ssurjano/ackley.html)."""

    def __init__(self, indices: List[Index]):
        inds = [
            ind.with_new_rng(np.linspace(-32.768, 32.768, ind.size))
            for ind in indices
        ]
        super().__init__(inds)
        self.name = "Ackley"

    def _run(self, args: np.ndarray):
        y1 = np.sqrt(np.sum(args**2, axis=1) / args.shape[1])
        y1 = -20 * np.exp(-0.2 * y1)
        y2 = np.sum(np.cos(2 * np.pi * args), axis=1)
        y2 = -np.exp(y2 / args.shape[1])
        return y1 + y2 + 20 + np.exp(1.0)


class FuncPathological(CachedFunc):
    """Pathological benchmark (Jamil & Yang 2013, function 87)."""

    def __init__(self, indices: List[Index]):
        inds = [
            ind.with_new_rng(np.linspace(-100, 100, ind.size))
            for ind in indices
        ]
        super().__init__(inds)
        self.name = "Pathological"

    def _run(self, args: np.ndarray):
        x1 = args[:, :-1]
        x2 = args[:, 1:]
        y1 = (np.sin(np.sqrt(100.0 * x1**2 + x2**2))) ** 2 - 0.5
        y2 = 1.0 + 0.001 * (x1**2 - 2.0 * x1 * x2 + x2**2) ** 2
        return np.sum(0.5 + y1 / y2, axis=1)


def _full_grid(indices):
    return np.stack(
        np.meshgrid(*[range(ind.size) for ind in indices]), axis=-1
    ).reshape(-1, len(indices))


def _check(func, res, validation):
    real = np.asarray(func(validation))
    approx = np.asarray(res.net.evaluate(func.indices, validation))
    assert np.linalg.norm(real - approx) / np.linalg.norm(real) <= 1e-4


INDICES_4D = [Index("i", 8), Index("j", 10), Index("k", 12), Index("l", 20)]
INDICES_8D = INDICES_4D + [
    Index("m", 20),
    Index("n", 8),
    Index("o", 8),
    Index("p", 8),
]


def test_cross_two_nodes():
    indices = [Index("i", 8), Index("j", 10)]
    func = FuncAckley(indices)
    net = TensorNetwork.rand_tt(func.indices, [1])
    engine = CrossApproximation(func, CrossConfig(kickrank=2))
    res = engine.cross(net, eps=1e-4)
    validation = np.dstack(
        np.meshgrid(*[range(ind.size) for ind in indices])
    ).reshape(-1, len(indices))
    _check(func, res, validation)


def test_cross_three_nodes():
    indices = [Index("i", 8), Index("j", 10), Index("k", 12)]
    func = FuncAckley(indices)
    net = TensorNetwork.rand_tt(func.indices, [1, 1])
    engine = CrossApproximation(func, CrossConfig(kickrank=2))
    res = engine.cross(net, eps=1e-4)
    _check(func, res, _full_grid(indices))


def test_cross_tt():
    func = FuncAckley(INDICES_4D)
    net = TensorNetwork.rand_tt(func.indices, [1, 1, 1])
    engine = CrossApproximation(func, CrossConfig(kickrank=2))
    res = engine.cross(net, eps=1e-4)
    _check(func, res, _full_grid(INDICES_4D))


def test_cross_ht():
    func = FuncAckley(INDICES_4D)
    net = TensorNetwork.rand_ht(func.indices, 1)
    engine = CrossApproximation(func, CrossConfig(kickrank=2))
    res = engine.cross(net, eps=1e-4)
    _check(func, res, _full_grid(INDICES_4D))


def test_cross_tucker():
    func = FuncAckley(INDICES_4D)
    net = TensorNetwork.rand_tucker(func.indices, 1)
    engine = CrossApproximation(func, CrossConfig(kickrank=2))
    res = engine.cross(net, eps=1e-4)
    _check(func, res, _full_grid(INDICES_4D))


def test_cross_deim():
    func = FuncAckley(INDICES_4D)
    net = TensorNetwork.rand_tt(func.indices, [1] * 3)
    engine = CrossApproximation(
        func, CrossConfig(kickrank=2, cross_algo=CrossAlgo.DEIM)
    )
    res = engine.cross(net, eps=1e-4)
    _check(func, res, _full_grid(INDICES_4D))


def test_cross_tucker_deim():
    func = FuncAckley(INDICES_4D)
    net = TensorNetwork.rand_tucker(func.indices, 1)
    engine = CrossApproximation(
        func, CrossConfig(kickrank=2, cross_algo=CrossAlgo.DEIM)
    )
    res = engine.cross(net, eps=1e-4)
    _check(func, res, _full_grid(INDICES_4D))


def _sampled_grid(indices):
    return np.stack(
        np.meshgrid(
            *[np.random.randint(0, ind.size, size=5) for ind in indices]
        ),
        axis=-1,
    ).reshape(-1, len(indices))


def test_cross_tt_deim_valid_error():
    func = FuncAckley(INDICES_8D)
    net = TensorNetwork.rand_tt(func.indices, [1] * 7)
    engine = CrossApproximation(
        func,
        CrossConfig(
            kickrank=2,
            cross_algo=CrossAlgo.DEIM,
            convergence=ConvergenceCheck.VALID_ERROR,
        ),
    )
    res = engine.cross(net, eps=1e-4)
    _check(func, res, _sampled_grid(INDICES_8D))


@pytest.mark.slow
def test_cross_tt_maxvol_valid_error():
    func = FuncPathological(INDICES_8D)
    net = TensorNetwork.rand_tt(func.indices, [1] * 7)
    engine = CrossApproximation(
        func,
        CrossConfig(
            kickrank=2,
            cross_algo=CrossAlgo.DEIM,
            convergence=ConvergenceCheck.VALID_ERROR,
        ),
    )
    res = engine.cross(net, eps=1e-4)
    _check(func, res, _sampled_grid(INDICES_8D))


def test_cross_tt_provided_validation():
    func = FuncAckley(INDICES_4D)
    net = TensorNetwork.rand_tt(func.indices, [1, 1, 1])
    engine = CrossApproximation(func, CrossConfig(kickrank=2))
    validation = _full_grid(INDICES_4D)
    res = engine.cross(net, eps=1e-4, validation=validation)
    _check(func, res, validation)


def test_maxvol_device_matches_host():
    from tensor_networks_tpu.cross.maxvol import maxvol, maxvol_device

    a = np.random.randn(200, 8)
    rows_h, b_h = maxvol(a)
    rows_d, b_d = maxvol_device(a)
    # both must satisfy the interpolation property A = B A[rows]
    assert np.allclose(b_h @ a[rows_h], a, atol=1e-10)
    assert np.allclose(np.asarray(b_d) @ a[np.asarray(rows_d)], a, atol=1e-10)
    # and dominance: |B| <= 1 + tol
    assert np.max(np.abs(b_h)) <= 1.05 + 1e-8
    assert np.max(np.abs(np.asarray(b_d))) <= 1.05 + 1e-8
