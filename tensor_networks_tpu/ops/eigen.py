"""One-site DMRG eigensolver for symmetric TT-operators.

Finds the smallest eigenpair of a symmetric (typically SPD) uniform
TT-operator by sweeping over the cores of the iterate and replacing
each with the lowest eigenvector of the Galerkin-projected local
operator ``H_k = frame_k^T A frame_k`` — with orthonormal frames the
local metric is the identity, so every local step is a plain symmetric
eigenproblem and the Rayleigh quotient is monotonically nonincreasing
across local solves (textbook DMRG).  The environment algebra is
shared with the ALS linear solver (:mod:`tensor_networks_tpu.ops.als`).

Overparameterized bonds (rank above the mode product on one side — the
norm for uniform packed trains at the end bonds) give the local frame
structurally ZERO columns, so ``H_k`` carries zero rows/cols whose
spurious 0 eigenvalue would beat any positive ground state.  Those
coordinates are detected from the diagonal of ``H_k`` (zero diagonal
on an SPD projection iff the frame column is zero) and shifted out of
the spectral window — the eigensolver analogue of the ALS CG
warm-start gate (see ``als._solve_core``).

No reference counterpart (``pytens`` has no eigensolver; its only
solver is GMRES, ``pytens/algs.py:2700``).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from tensor_networks_tpu.ops.als import (
    _adv_left,
    _adv_right,
    _left_orth,
    _local_dense,
    _right_orth,
)
from tensor_networks_tpu.ops.packed import (
    PackedTT,
    PackedTTOp,
    add,
    norm_exact,
    scale,
    ttop_apply_packed,
)

__all__ = ["als_eigsh", "als_eigsh_adaptive"]


@jax.jit
def _local_ground_state(L, ak, R):
    """Smallest eigenpair of the projected local operator, with
    structurally-zero frame coordinates shifted out of the window."""
    H = _local_dense(L, ak, R)
    H = 0.5 * (H + H.T)  # symmetrize roundoff
    diag = jnp.diag(H)
    dead = jnp.abs(diag) <= 1e-12 * jnp.max(jnp.abs(diag))
    big = 2.0 * jnp.sum(jnp.abs(H))  # > any Rayleigh quotient of H
    H = H + jnp.diag(jnp.where(dead, big, 0.0).astype(H.dtype))
    w, v = jnp.linalg.eigh(H)
    return w[0], v[:, 0]


def als_eigsh(
    op: PackedTTOp,
    x0: PackedTT,
    sweeps: int = 10,
    tol: float = 1e-10,
) -> Tuple[PackedTT, float, List[float]]:
    """Smallest eigenpair of a symmetric TT-operator at the ranks of
    ``x0`` by one-site DMRG.

    Returns ``(x, lam, history)`` — the unit-norm eigenvector train,
    the Rayleigh quotient, and its value after each half-sweep; the
    sweep loop stops when the per-sweep improvement drops below
    ``tol * |lam|``.  Grow ranks with :func:`als_eigsh_adaptive`.
    """
    dt = x0.first.dtype
    xs = [x0.first[None]] + list(x0.mids) + [x0.last[..., None]]
    as_ = (
        [op.first[None].astype(dt)]
        + list(op.mids.astype(dt))
        + [op.last[..., None].astype(dt)]
    )
    d = len(xs)

    # canonicalize: all cores right-orthogonal (R factors absorbed
    # left so the represented train is unchanged)
    for k in range(d - 1, 0, -1):
        r1, nn, r2 = xs[k].shape
        q, rmat = jnp.linalg.qr(xs[k].reshape(r1, nn * r2).T)
        if q.shape[1] < r1:
            q = jnp.pad(q, ((0, 0), (0, r1 - q.shape[1])))
            rmat = jnp.pad(rmat, ((0, r1 - rmat.shape[0]), (0, 0)))
        xs[k] = q.T.reshape(r1, nn, r2)
        xs[k - 1] = jnp.einsum(
            "anb,cb->anc", xs[k - 1], rmat, precision="highest"
        )

    one3 = jnp.ones((1, 1, 1), dt)
    history: List[float] = []
    lam = float("inf")

    rev_rs = [one3]
    for k in range(d - 1, 0, -1):
        rev_rs.append(_adv_right(rev_rs[-1], xs[k], as_[k]))

    for _sweep in range(sweeps):
        rs = rev_rs[::-1]

        ls = [one3]
        for k in range(d):
            lam_k, vec = _local_ground_state(ls[-1], as_[k], rs[k])
            xs[k] = vec.reshape(xs[k].shape)
            if k < d - 1:
                xs[k] = _left_orth(xs[k])
                ls.append(_adv_left(ls[-1], xs[k], as_[k]))
        history.append(float(lam_k))

        rev_rs = [one3]
        for k in range(d - 1, -1, -1):
            lam_k, vec = _local_ground_state(ls[k], as_[k], rev_rs[-1])
            xs[k] = vec.reshape(xs[k].shape)
            if k > 0:
                xs[k] = _right_orth(xs[k])
                rev_rs.append(_adv_right(rev_rs[-1], xs[k], as_[k]))
        new_lam = float(lam_k)
        history.append(new_lam)
        if abs(lam - new_lam) <= tol * max(abs(new_lam), 1e-300):
            lam = new_lam
            break
        lam = new_lam

    # after the right-to-left pass core 0 is the open core and holds
    # the whole norm; the local eigenvector is unit, so x is unit-norm
    x = PackedTT(xs[0][0], jnp.stack(xs[1:-1]), xs[-1][..., 0])
    return x, lam, history


def als_eigsh_adaptive(
    op: PackedTTOp,
    x0: PackedTT,
    eps: float = 1e-8,
    max_rank: int = None,
    sweeps_per_rank: int = 4,
    enrich: bool = True,
    **kw,
) -> Tuple[PackedTT, float, List[float]]:
    """Rank-adaptive smallest eigenpair: run :func:`als_eigsh` at the
    current rank and, while the exact residual ``|A x - lam x|`` stays
    above ``eps * |lam|``, double the rank up to ``max_rank``.

    With ``enrich=True`` the new bond directions span the eps-rounded
    eigen-residual train (coefficient zero — the AMEn move of
    :func:`als.als_solve_adaptive` applied to the eigenproblem);
    otherwise inert zero padding.  Returns ``(x, lam, concatenated
    history)``.
    """
    from tensor_networks_tpu.ops.packed import pad_rank, svd_round

    rank = x0.rank
    ceiling = int(max_rank) if max_rank is not None else 8 * rank
    x = x0
    hist_all: List[float] = []
    while True:
        x, lam, hist = als_eigsh(op, x, sweeps=sweeps_per_rank, **kw)
        hist_all += hist
        resid_train = add(ttop_apply_packed(op, x), scale(x, -lam))
        resid = float(norm_exact(resid_train))
        if resid <= eps * max(abs(lam), 1e-300) or rank >= ceiling:
            return x, lam, hist_all
        new_rank = min(2 * rank, ceiling)
        kick = new_rank - x.rank
        if enrich and kick > 0:
            z = svd_round(resid_train, kick)
            span = PackedTT(
                jnp.zeros(z.first.shape, x.first.dtype),
                z.mids.astype(x.first.dtype),
                z.last.astype(x.first.dtype),
            )
            x = add(x, span)
        else:
            x = pad_rank(x, new_rank)
        rank = new_rank
