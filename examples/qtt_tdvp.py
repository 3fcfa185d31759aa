"""Solve-free time integration: projector-splitting TDVP on a QTT grid.

The heat equation ``du/dt = -A u`` on a 2^K-point grid, with A the
exact QTT of the 1D stiffness tridiagonal (`ops/qtt.py`) and a rank-1
exponential initial condition.  Unlike `qtt_heat.py` (theta stepping:
one ALS linear SOLVE per step), TDVP evolves each core/pair EXACTLY
under its projected operator — no linear systems at all — and the
two-site form (`evolve_tdvp2`) grows the bond ranks toward the
dynamics up to a static ``max_rank``, so the whole trajectory runs
through executables compiled once.

The oracle is spectral and exact at any grid size: the discrete
Dirichlet Laplacian diagonalizes in the type-I sine basis, so
``u(T) = DST^-1[ exp(-T lam) DST[u0] ]`` in O(N log N).

No reference counterpart (``pytens`` has no time integration).
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

# f64 accuracy study: CPU by default (opt into the chip with
# TNT_QTT_DEVICE=1; checking the backend first would hang when the
# relay is down, so the knob is explicit)
if os.environ.get("TNT_QTT_DEVICE", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
from scipy.fft import dst, idst


def _lin_perm(K):
    """QTT (bit-major) position -> linear grid index."""
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


def main():
    from tensor_networks_tpu.ops.evolve import evolve_tdvp2
    from tensor_networks_tpu.ops.qtt import (
        qtt_exponential,
        qtt_tridiagonal,
    )

    K = int(os.environ.get("TNT_TDVP_K", "12"))
    n = 2**K
    T, steps = 0.5, 25
    dt = T / steps
    max_rank = 16

    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    u0 = qtt_exponential(K, c=4.0)
    print(f"heat equation on 2^{K} = {n} points, rank-1 start, "
          f"dt={dt}, {steps} steps, max_rank={max_rank}")

    t0 = time.perf_counter()
    # the energy <u, A u> is recorded INSIDE the fused trajectory
    # program (one extra env scan per step) — no callback round-trips
    u, norms, ranks, obs = evolve_tdvp2(
        A, u0, dt, steps, max_rank=max_rank, eps=1e-10, dense_limit=256,
        observables=(A,),
    )
    wall = time.perf_counter() - t0
    energies = [e[0] for e in obs]
    assert all(b < a for a, b in zip(energies, energies[1:])), (
        "heat-flow energy must decay monotonically"
    )

    # exact spectral oracle: DST-I diagonalizes the Dirichlet tridiagonal
    lin = _lin_perm(K)
    ud0 = np.zeros(n)
    ud0[lin] = _dense_vec(u0)
    lam = 2.0 - 2.0 * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))
    ref = idst(np.exp(-T * lam) * dst(ud0, type=1), type=1)

    got = np.zeros(n)
    got[lin] = _dense_vec(u)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)

    print(f"rank history (max effective per step): {ranks}")
    print(f"norm decay: {norms[0]:.6f} -> {norms[-1]:.6f}; "
          f"energy decay (in-program observable): "
          f"{energies[0]:.4f} -> {energies[-1]:.4f}")
    print(f"rel error vs spectral oracle: {rel:.3e}")
    print(f"wall: {wall:.1f}s ({wall / steps * 1e3:.0f} ms/step, "
          f"no linear solves)")
    assert rel < 1e-6, rel
    print("OK")


if __name__ == "__main__":
    main()
