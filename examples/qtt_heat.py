"""Heat equation on a 2^22-point grid, integrated in QTT form.

``du/dt = -A u`` with ``A`` the 4-million-point discrete Laplacian
(exact rank-3 QTT) and exponential initial data (exact rank 1), stepped
by Crank-Nicolson (`ops/evolve.py`): the step operators are assembled
once with the packed operator algebra, and each step is one
warm-started ALS solve at rank 8 — every executable in the trajectory
is compiled exactly once.

There is no dense oracle at this size, so the run validates itself two
ways: (1) each step's ALS residual is exact and tiny, and (2) a
Richardson study — the distance between trajectories at dt and dt/2
must shrink ~4x per halving (Crank-Nicolson is second order), which
checks the INTEGRATOR, not just the solver.

No reference counterpart (``pytens`` has no time integration and its
dense paths cannot represent 2^22 points).
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

if os.environ.get("TNT_QTT_DEVICE", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from tensor_networks_tpu.ops import packed as pk
    from tensor_networks_tpu.ops.evolve import evolve_theta
    from tensor_networks_tpu.ops.qtt import (
        qtt_exponential,
        qtt_tridiagonal,
    )

    K = 22
    N = 2**K
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)  # unit-h discrete Laplacian
    u0 = pk.pad_rank(qtt_exponential(K, c=3.0), 8)
    T = 4.0

    finals = {}
    for steps in (8, 16, 32):
        t0 = time.time()
        u, res = evolve_theta(
            A, u0, T / steps, steps, theta=0.5, spd=True
        )
        wall = time.time() - t0
        finals[steps] = u
        print(
            f"[qtt-heat] N=2^{K}, {steps:3d} CN steps in {wall:5.1f}s: "
            f"max ALS resid {max(res):.1e}",
            file=sys.stderr,
        )
        assert max(res) < 1e-8

    def dist(a, b):
        return float(pk.norm_exact(pk.add(a, pk.scale(b, -1.0))))

    d1 = dist(finals[8], finals[16])
    d2 = dist(finals[16], finals[32])
    ratio = d1 / d2
    print(
        f"[qtt-heat] Richardson: |u_8 - u_16| = {d1:.3e}, "
        f"|u_16 - u_32| = {d2:.3e}, ratio {ratio:.2f} "
        f"(Crank-Nicolson => ~4)",
        file=sys.stderr,
    )
    assert 3.0 < ratio < 5.0, ratio
    print(f"[qtt-heat] OK ratio={ratio:.2f} d2={d2:.2e}")


if __name__ == "__main__":
    main()
