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
The small-K dense-oracle check for this construction lives in
``tests/test_qtt_solve.py``.

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

from tensor_networks_tpu.ops.packed import (
    PackedTT,
    PackedTTOp,
    norm_exact,
    pad_rank,
)


def qtt_screened_laplacian(K: int, delta: float = 1.0, dtype=jnp.float64):
    """Rank-3 QTT cores of ``(2 + delta) I - S - S^T`` on 2^K points.

    Little-endian bit order (core 0 = least significant bit).  Carry
    automaton states over the bond: 0 = done, 1 = a pending +1 shift
    (the -S term), 2 = a pending -1 shift (the -S^T term).  Dirichlet
    ends come out naturally: the all-carries (wraparound) path is
    dropped by the last core.
    """
    eye = np.eye(2)
    J = np.array([[0.0, 1.0], [0.0, 0.0]])  # out bit 0 <- in bit 1
    Jt = J.T

    diag = (2.0 + delta) * eye - J - Jt
    # first core: (n_out, n_in, R) — emits the automaton state
    first = np.zeros((2, 2, 3))
    first[:, :, 0] = diag
    first[:, :, 1] = -Jt  # start the -S carry chain
    first[:, :, 2] = -J  # start the -S^T carry chain
    # middle cores: (R, n_out, n_in, R)
    mid = np.zeros((3, 2, 2, 3))
    mid[0, :, :, 0] = eye  # done stays done
    mid[1, :, :, 0] = J  # +1 lands here
    mid[1, :, :, 1] = Jt  # +1 keeps carrying
    mid[2, :, :, 0] = Jt  # -1 lands here
    mid[2, :, :, 2] = J  # -1 keeps carrying
    # last core: (R, n_out, n_in) — unfinished carries (wraparound) drop
    last = np.zeros((3, 2, 2))
    last[0] = eye
    last[1] = J
    last[2] = Jt
    return PackedTTOp(
        jnp.asarray(first, dtype),
        jnp.asarray(np.broadcast_to(mid, (K - 2, 3, 2, 2, 3)), dtype),
        jnp.asarray(last, dtype),
    )


def _interleave_1d_op(op1d, K, phase, dtype=jnp.float64):
    """Extend a rank-R 1D QTT operator over 2K interleaved bits.

    The 1D cores sit at global positions with ``pos % 2 == phase``
    (phase 0 = x bits, 1 = y bits); every other position carries a
    rank-diagonal identity core, so the automaton state rides across
    the foreign axis untouched.  Boundary embeddings keep the packed
    uniform-rank layout: the 1D first/last cores become mids with the
    foreign rank slots zeroed at channel 0.
    """
    R = op1d.first.shape[-1]
    eyeRC = np.zeros((R, 2, 2, R))
    for a in range(R):
        eyeRC[a, :, :, a] = np.eye(2)
    first1 = np.asarray(op1d.first)
    mids1 = [np.asarray(c) for c in op1d.mids]
    last1 = np.asarray(op1d.last)

    # 1D cores as uniform (R, 2, 2, R) mids with boundary embeddings
    as_mid_first = np.zeros((R, 2, 2, R))
    as_mid_first[0] = first1  # enter at channel 0
    as_mid_last = np.zeros((R, 2, 2, R))
    as_mid_last[:, :, :, 0] = last1  # exit into channel 0
    own = [as_mid_first] + mids1 + [as_mid_last]

    cores = []
    for pos in range(2 * K):
        cores.append(own[pos // 2] if pos % 2 == phase else eyeRC)
    # global boundaries: squeeze the outer rank at channel 0
    gfirst = cores[0][0]  # (2, 2, R)
    glast = cores[-1][:, :, :, 0]  # (R, 2, 2)
    gmids = np.stack(cores[1:-1])
    return PackedTTOp(
        jnp.asarray(gfirst, dtype),
        jnp.asarray(gmids, dtype),
        jnp.asarray(glast, dtype),
    )


def qtt_screened_laplacian_2d(K: int, delta: float = 1.0,
                              dtype=jnp.float64):
    """Rank-6 QTT operator of the 2D screened Laplacian on a
    2^K x 2^K grid with interleaved bits (x at even positions):
    ``(4 + delta) I - Sx - Sx^T - Sy - Sy^T`` via two interleaved 1D
    automata summed with :func:`ops.packed.ttop_add`."""
    from tensor_networks_tpu.ops.packed import ttop_add

    op_x = _interleave_1d_op(
        qtt_screened_laplacian(K, delta=delta, dtype=dtype), K, 0, dtype
    )
    op_y = _interleave_1d_op(
        qtt_screened_laplacian(K, delta=0.0, dtype=dtype), K, 1, dtype
    )
    return ttop_add(op_x, op_y)


def _rank1_from_weights(ws, dtype) -> PackedTT:
    """Rank-1 binary-mode train with per-position mode weights
    ``[1, ws[p]]`` — the shared layout of the exponential RHS builders."""
    first = jnp.asarray([[1.0], [ws[0]]], dtype)  # (n, r)
    mids = jnp.stack(
        [jnp.asarray([[[1.0]], [[w]]], dtype).transpose(2, 0, 1)
         for w in ws[1:-1]]
    )  # (d-2, 1, 2, 1)
    last = jnp.asarray([[1.0, ws[-1]]], dtype)  # (r, n)
    return PackedTT(first, mids, last)


def qtt_exponential_2d(
    K: int, cx: float = 3.0, cy: float = 2.0, dtype=jnp.float64
) -> PackedTT:
    """Rank-1 QTT of ``f(x, y) = exp(-cx x / 2^K) exp(-cy y / 2^K)``
    over 2K interleaved bits."""
    ws = [
        float(np.exp(-(cx if p % 2 == 0 else cy) * (2.0 ** (p // 2))
                     / 2.0**K))
        for p in range(2 * K)
    ]
    return _rank1_from_weights(ws, dtype)


def qtt_exponential(K: int, c: float = 3.0, dtype=jnp.float64) -> PackedTT:
    """Rank-1 QTT of ``f_i = exp(-c i / 2^K)`` (exact: exponentials
    factor over bits)."""
    ws = [float(np.exp(-c * (2.0**k) / 2.0**K)) for k in range(K)]
    return _rank1_from_weights(ws, dtype)


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
    print(
        f"[qtt-solve] OK als_rel={resid / b_norm:.2e} "
        f"gmres_rel={rg / b_norm:.2e} als2d_rel={r2 / b2:.2e}"
    )


if __name__ == "__main__":
    main()
