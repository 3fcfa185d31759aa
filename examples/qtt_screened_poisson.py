"""Screened-Poisson solve on a 2^K grid in QTT form — a billion-unknown
linear system through the packed ALS solver.

The 1D screened Poisson operator ``A = (2 + delta) I - S - S^T`` (S =
shift-by-one, Dirichlet ends) has an exact rank-3 quantized-tensor-train
representation over K binary modes: a three-state carry automaton
(done / need +1 / need -1) whose per-bit transitions are the 2x2
matrices I, J (=[[0,1],[0,0]]) and J^T.  With ``delta > 0`` the spectrum
sits in ``[delta, 4 + delta]`` — condition ~(4 + delta)/delta
independent of K — so the solve is numerically meaningful even at
K = 30 (2^30 ~ 1.07e9 unknowns), unlike the raw Laplacian whose
condition grows as 4^K.

The right-hand side ``f_i = exp(-c i / 2^K)`` is an exact *rank-1* QTT
(exponentials factor over bits: exp(a i) = prod_k exp(a b_k 2^k)).

No reference counterpart at any scale: ``pytens``'s GMRES examples top
out at dense-verifiable sizes (reference ``tests/main_test.py:428-448``).
The constructors live in :mod:`tensor_networks_tpu.ops.qtt` (dense
oracles: ``tests/test_qtt_solve.py``); this script is just the driver.

Run (CPU f64 is fine — the point is representation, not the chip):
    python3 examples/qtt_screened_poisson.py [K] [chi]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import sys
import time

import numpy as np

import jax

# representation demo: f64 host math unless the user asks for the chip
# (under the single-client relay, backend init can hang when the relay
# is down — CPU keeps the example self-contained)
if _os.environ.get("TNT_QTT_DEVICE", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from tensor_networks_tpu.ops.packed import norm_exact, pad_rank
from tensor_networks_tpu.ops.qtt import (
    qtt_exponential,
    qtt_exponential_2d,
    qtt_exponential_nd,
    qtt_screened_laplacian,
    qtt_screened_laplacian_2d,
    qtt_screened_laplacian_nd,
)


def main():
    from tensor_networks_tpu.ops.als import als_solve

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    chi = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    if K < 4:
        sys.exit(
            "K must be >= 4 (the packed train needs middle cores and "
            "the 2D section needs K//2 >= 2 bits per axis)"
        )
    print(
        f"[qtt-solve] screened Poisson, 2^{K} = {2**K:.3g} unknowns, "
        f"solution rank {chi}",
        file=sys.stderr,
    )

    op = qtt_screened_laplacian(K, delta=1.0)
    rhs = qtt_exponential(K, c=3.0)
    x0 = pad_rank(rhs, chi)
    b_norm = float(norm_exact(rhs))

    t0 = time.time()
    x, resid, hist = als_solve(op, rhs, x0, sweeps=8, tol=1e-10)
    wall = time.time() - t0
    print(
        f"[qtt-solve] ALS {len(hist)} sweeps in {wall:.1f}s: "
        f"rel residual {resid / b_norm:.2e} "
        f"(history {[f'{h / b_norm:.1e}' for h in hist]})",
        file=sys.stderr,
    )
    assert resid / b_norm < 1e-6, "ALS did not converge"

    # same system through the all-device Krylov solver (every op one
    # fused program; fixed-rank randomized rounding between cycles)
    from tensor_networks_tpu.ops.packed import gmres_packed

    t0 = time.time()
    xg, rg = gmres_packed(op, rhs, pad_rank(rhs, 4), eps=1e-8, rank=chi)
    wall_g = time.time() - t0
    print(
        f"[qtt-solve] GMRES in {wall_g:.1f}s: rel residual "
        f"{rg / b_norm:.2e}",
        file=sys.stderr,
    )
    assert rg / b_norm < 1e-6, "GMRES did not converge"

    # 2D screened Poisson on a 2^(K/2) x 2^(K/2) grid — same unknown
    # count, rank-6 operator from two interleaved 1D automata
    K2 = K // 2
    op2 = qtt_screened_laplacian_2d(K2, delta=1.0)
    rhs2 = qtt_exponential_2d(K2)
    b2 = float(norm_exact(rhs2))
    # the 2D solution's interleaved-QTT spectrum decays slower than the
    # 1D one (measured at K2=7: rank 12 -> 1.8e-6, 16 -> 3e-8,
    # 24 -> 1.7e-12); double the rank and solve the larger local
    # systems densely
    t0 = time.time()
    x2, r2, h2 = als_solve(op2, rhs2, pad_rank(rhs2, 2 * chi), sweeps=8,
                           tol=1e-10, dense_limit=8192)
    wall2 = time.time() - t0
    print(
        f"[qtt-solve] 2D ({2**K2}x{2**K2}) ALS {len(h2)} sweeps in "
        f"{wall2:.1f}s: rel residual {r2 / b2:.2e}",
        file=sys.stderr,
    )
    assert r2 / b2 < 1e-6, "2D solve did not converge"

    # 3D screened Poisson on a 16^3 grid — rank-9 operator from three
    # interleaved 1D automata, separable per-axis exponential rhs.  The
    # interleaved 3D solution spectrum decays much slower than 1D/2D
    # (zero-pad ladder at K3=4: rank 16 -> 4.1e-3, 24 -> 3.2e-4,
    # 32 -> 3.5e-5; the exact middle-bond rank at 1e-6 is 39 of a
    # structural 64), so the demo stops at the ~3e-4 level to stay
    # interactive.  AMEn enrichment (the adaptive default) reaches
    # 2.9e-4 at rank 24 in ~32 s where zero padding took ~87 s
    K3 = 4
    op3 = qtt_screened_laplacian_nd(K3, 3, delta=1.0)
    rhs3 = qtt_exponential_nd(K3, (3.0, 2.0, 1.5))
    b3 = float(norm_exact(rhs3))
    from tensor_networks_tpu.ops.als import als_solve_adaptive

    t0 = time.time()
    x3, r3, h3 = als_solve_adaptive(
        op3, rhs3, eps=5e-4, rank=8, max_rank=24, dense_limit=8192
    )
    wall3 = time.time() - t0
    print(
        f"[qtt-solve] 3D ({2**K3}^3) adaptive ALS in {wall3:.1f}s: "
        f"rel residual {r3 / b3:.2e} at rank {x3.rank}",
        file=sys.stderr,
    )
    assert r3 / b3 < 1e-3, "3D solve did not converge"
    print(
        f"[qtt-solve] OK als_rel={resid / b_norm:.2e} "
        f"gmres_rel={rg / b_norm:.2e} als2d_rel={r2 / b2:.2e} "
        f"als3d_rel={r3 / b3:.2e}"
    )


if __name__ == "__main__":
    main()
