"""Krylov solvers in TT arithmetic.

:func:`gmres` runs Arnoldi with TT-rounding after every operator
application and vector update; the (tiny) Hessenberg least-squares solve
stays on host.  Parity reference: ``pytens/algs.py:2700-2793``.
"""

from __future__ import annotations

import copy
from typing import Callable, Tuple

import numpy as np

from tensor_networks_tpu.network import TensorNetwork
from tensor_networks_tpu.ops.rounding import tt_svd_round


def gmres(
    op: Callable[[TensorNetwork], TensorNetwork],
    rhs: TensorNetwork,
    x0: TensorNetwork,
    eps: float = 1e-5,
    round_eps: float = 1e-10,
    maxiter: int = 100,
) -> Tuple[TensorNetwork, float]:
    """Solve ``op(x) = rhs`` by GMRES in TT format.

    Every Krylov vector is rounded to ``round_eps`` to keep ranks bounded.
    Returns the solution and the final residual norm.
    """
    r0 = rhs + op(x0).scale(-1.0)
    r0 = tt_svd_round(r0, round_eps)
    beta = r0.norm()
    r0.scale(1.0 / beta)

    v = [r0]
    y = []
    h = None
    for jj in range(maxiter):
        w = op(v[-1])
        w = tt_svd_round(w, round_eps)

        if h is None:
            h = np.zeros((jj + 2, jj + 1))
        else:
            m, n = h.shape
            new_h = np.zeros((m + 1, n + 1))
            new_h[:m, :n] = h
            h = new_h

        for ii in range(jj + 1):
            h[ii, jj] = float(w.inner(v[ii]))
            vv = copy.deepcopy(v[ii])
            vv.scale(-h[ii, jj])
            w = w + vv

        w = tt_svd_round(w, round_eps)
        h[jj + 1, jj] = w.norm()
        v.append(w.scale(1.0 / h[jj + 1, jj]))

        e = np.zeros((h.shape[0],))
        e[0] = beta
        yy, resid, _, _ = np.linalg.lstsq(h, e, rcond=None)
        y.append(yy)
        if resid.size > 0 and float(np.abs(resid[0])) < eps:
            break

    x = copy.deepcopy(x0)
    for vv, yy in zip(v, y[-1]):
        x = x + vv.scale(float(yy))
    x = tt_svd_round(x, round_eps)
    r0 = rhs + op(x).scale(-1.0)
    return x, r0.norm()
