"""Ground and excited states of the 3D screened Laplacian in QTT form.

The eigenvalue analogue of ``qtt_screened_poisson.py``: the operator is
the exact rank-9 interleaved-bit QTT of ``-Lap + delta`` on a (2^K)^3
grid (`ops/qtt.py`), and the DMRG eigensolver (`ops/eigen.py`) finds
the lowest eigenpairs by one-site Rayleigh sweeps with Gram-whitened
generalized local solves.  The Kronecker-sum spectrum gives an exact
analytic oracle at ANY grid size: the eigenvalues of the 1D free
tridiagonal are ``2 - 2 cos(k pi / (N+1))``, so the 3D ground energy is
``delta + 3 * (2 - 2 cos(pi/(N+1)))`` and the first excited level is
three-fold degenerate.

At K=5 this is a 32^3 = 32768-point grid; the eigenvector train has
rank <= 8 (the ground state is a product of per-axis sine modes —
exactly rank 1 per axis before interleaving).  No reference
counterpart: ``pytens`` has no eigensolver.
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


def main():
    from tensor_networks_tpu.ops import packed as pk
    from tensor_networks_tpu.ops.eigen import als_eigsh, als_eigsh_k
    from tensor_networks_tpu.ops.qtt import (
        qtt_exponential_nd,
        qtt_screened_laplacian_nd,
    )

    from tensor_networks_tpu.ops.qtt import qtt_exponential, \
        qtt_screened_laplacian

    # warm-up act: the 1D operator at 2^30 points (1.07e9) — the
    # analytic ground energy is delta + 2 - 2 cos(pi/(N+1)) ~ delta
    K1 = 30
    op1 = qtt_screened_laplacian(K1, delta=1.0)
    x1 = pk.pad_rank(qtt_exponential(K1, c=3.0), 8)
    t0 = time.time()
    _, lam1, h1 = als_eigsh(op1, x1, sweeps=8)
    ref1 = 1.0 + 2 - 2 * np.cos(np.pi / (2.0**K1 + 1))
    print(
        f"[qtt-eigen] 1D 2^30-point ground state in "
        f"{time.time() - t0:.1f}s: lam {lam1:.12f} "
        f"(analytic {ref1:.12f}, err {abs(lam1 - ref1):.1e})",
        file=sys.stderr,
    )
    assert abs(lam1 - ref1) < 1e-9

    K, delta = 5, 1.0
    N = 2**K
    op = qtt_screened_laplacian_nd(K, 3, delta=delta)
    x0 = pk.pad_rank(qtt_exponential_nd(K, (1.0, 2.0, 3.0)), 8)

    lap1 = lambda k: 2.0 - 2.0 * np.cos(k * np.pi / (N + 1))
    ref0 = delta + 3 * lap1(1)
    ref1 = delta + 2 * lap1(1) + lap1(2)

    t0 = time.time()
    x, lam, hist = als_eigsh(op, x0, sweeps=8)
    wall = time.time() - t0
    print(
        f"[qtt-eigen] 3D ({N}^3) ground state in {wall:.1f}s: "
        f"lam {lam:.12f} (analytic {ref0:.12f}, err {abs(lam - ref0):.1e}) "
        f"after {len(hist)} half-sweeps",
        file=sys.stderr,
    )
    assert abs(lam - ref0) < 1e-9, abs(lam - ref0)

    # first excited level (3-fold degenerate): deflate the ground state
    t0 = time.time()
    vecs, vals = als_eigsh_k(op, x0, 2, sweeps=8)
    wall = time.time() - t0
    print(
        f"[qtt-eigen] first excited in {wall:.1f}s: lam {vals[1]:.12f} "
        f"(analytic {ref1:.12f}, err {abs(vals[1] - ref1):.1e}); "
        f"<v0,v1> = {float(pk.inner(vecs[0], vecs[1])):.1e}",
        file=sys.stderr,
    )
    assert abs(vals[1] - ref1) < 1e-8, abs(vals[1] - ref1)
    print(
        f"[qtt-eigen] OK ground_err={abs(lam - ref0):.2e} "
        f"excited_err={abs(vals[1] - ref1):.2e}"
    )


if __name__ == "__main__":
    main()
