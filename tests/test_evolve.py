"""Theta-method time integration (ops/evolve.py) against dense
trajectories.  No reference counterpart (pytens has no time
integration)."""

import numpy as np
import pytest

from tensor_networks_tpu.ops import packed as pk
from tensor_networks_tpu.ops.evolve import evolve_theta
from tensor_networks_tpu.ops.qtt import qtt_exponential, qtt_tridiagonal


def _dense_vec(p):
    d = p.mids.shape[0] + 2
    cs = (
        [np.asarray(p.first)[None]]
        + [np.asarray(p.mids[i]) for i in range(d - 2)]
        + [np.asarray(p.last)[..., None]]
    )
    v = cs[0]
    for k in range(1, d):
        v = np.einsum("...r,rjs->...js", v, cs[k])
    return v.reshape(-1)


def _lin_perm(K):
    n = 2**K
    lin = np.zeros(n, dtype=int)
    for pos in range(n):
        rem, bits = pos, []
        for _ in range(K):
            bits.append(rem % 2)
            rem //= 2
        bits = bits[::-1]
        lin[pos] = sum(b << k for k, b in enumerate(bits))
    return lin


@pytest.mark.parametrize("theta", [1.0, 0.5])
def test_evolve_matches_dense_trajectory(theta):
    """Implicit Euler and Crank-Nicolson on the 1D heat equation
    reproduce the dense 20-step trajectory (per-step ALS warm starts
    at fixed rank)."""
    K = 6
    n = 2**K
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    u0 = pk.pad_rank(qtt_exponential(K, c=3.0), 8)
    dt, steps = 0.1, 20
    u, res = evolve_theta(A, u0, dt, steps, theta=theta, spd=True)
    assert res[-1] < 1e-10

    Ad = 2 * np.eye(n)
    Ad -= np.diag(np.ones(n - 1), 1)
    Ad -= np.diag(np.ones(n - 1), -1)
    lin = _lin_perm(K)
    ud = np.zeros(n)
    ud[lin] = _dense_vec(u0)
    L = np.eye(n) + theta * dt * Ad
    R = np.eye(n) - (1 - theta) * dt * Ad
    for _ in range(steps):
        ud = np.linalg.solve(L, R @ ud)
    uf = np.zeros(n)
    uf[lin] = _dense_vec(u)
    assert np.linalg.norm(uf - ud) / np.linalg.norm(ud) < 1e-6


def test_evolve_with_fem_mass():
    """Generalized step operator (M + theta dt A) with the FEM mass
    matrix, against the dense generalized trajectory."""
    K = 5
    n = 2**K
    h = 1.0 / (n + 1)
    A = qtt_tridiagonal(K, 2.0 / h, -1.0 / h, -1.0 / h)
    M = qtt_tridiagonal(K, 4.0 * h / 6, h / 6, h / 6)
    u0 = pk.pad_rank(qtt_exponential(K, c=2.0), 8)
    dt, steps = 1e-4, 10
    u, res = evolve_theta(A, u0, dt, steps, theta=0.5, mass=M, spd=True)
    assert res[-1] < 1e-10

    Ad = (2 / h) * np.eye(n) + (-1 / h) * (
        np.diag(np.ones(n - 1), 1) + np.diag(np.ones(n - 1), -1)
    )
    Md = (4 * h / 6) * np.eye(n) + (h / 6) * (
        np.diag(np.ones(n - 1), 1) + np.diag(np.ones(n - 1), -1)
    )
    lin = _lin_perm(K)
    ud = np.zeros(n)
    ud[lin] = _dense_vec(u0)
    L = Md + 0.5 * dt * Ad
    R = Md - 0.5 * dt * Ad
    for _ in range(steps):
        ud = np.linalg.solve(L, R @ ud)
    uf = np.zeros(n)
    uf[lin] = _dense_vec(u)
    assert np.linalg.norm(uf - ud) / np.linalg.norm(ud) < 1e-6


def test_evolve_rejects_explicit():
    A = qtt_tridiagonal(4, 2.0, -1.0, -1.0)
    u0 = qtt_exponential(4)
    with pytest.raises(ValueError):
        evolve_theta(A, u0, 0.1, 1, theta=0.0)
    with pytest.raises(ValueError):
        evolve_theta(A, u0, 0.1, 1, theta=1.5)
