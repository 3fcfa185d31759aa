"""ALS (one-site DMRG-style) linear solver for TT systems.

Solves ``A x = b`` with ``A`` a uniform TT-operator and ``b``, ``x``
uniform trains, by sweeping over the cores of ``x`` and replacing each
with the solution of the small projected system

    (frame_k^T A frame_k) x_k = frame_k^T b,

where ``frame_k`` is the (orthonormalized) rest of the train.  Per
sweep this is d tiny solves plus O(d) environment GEMMs — for systems
where the Galerkin projection is well-posed (symmetric positive
definite, or diagonally dominant like discretized elliptic operators)
it converges in a handful of sweeps at fixed rank, where GMRES needs a
Krylov basis of rounded trains per digit.

Everything is static-shape jitted einsums (environments, local
operator, local solves), so one problem size compiles once and sweeps
reuse the executables — the TPU-native shape of the classic ALS/DMRG
linear solver.  No reference counterpart (``pytens`` only has GMRES,
``pytens/algs.py:2700``).

Scope: the local systems are solved densely below
``dense_limit`` unknowns and by conjugate gradients on the normal
equations above it (general ``A``; squares the local condition
number).  Rank adaptivity is by restart: solve at rank r, and if the
residual stalls, warm-start from ``pad_rank(x, 2 r)``.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp

from tensor_networks_tpu.ops.packed import (
    PackedTT,
    PackedTTOp,
    add,
    norm_exact,
    scale,
    ttop_apply_packed,
)

__all__ = ["als_solve"]


# -- environment advances ------------------------------------------------------
# Index conventions: ket core X (a, j, a2); the SAME core is the bra
# test frame with the output physical index (p, i, p2); operator core
# A (s, i, j, t); rhs core B (beta, i, beta2).  Left environment
# L (p, s, a); right environment R (q, t, c); rhs environments
# Lb (p, beta) / Rb (q, beta2).


@jax.jit
def _adv_left(L, xk, ak):
    t1 = jnp.einsum("psa,ajb->psjb", L, xk)
    t2 = jnp.einsum("psjb,sijt->pitb", t1, ak)
    return jnp.einsum("pitb,piq->qtb", t2, xk)


@jax.jit
def _adv_right(R, xk, ak):
    u1 = jnp.einsum("ajc,qtc->ajqt", xk, R)
    u2 = jnp.einsum("ajqt,sijt->asiq", u1, ak)
    return jnp.einsum("asiq,piq->psa", u2, xk)


@jax.jit
def _adv_left_b(Lb, xk, bk):
    t = jnp.einsum("pb,bif->pif", Lb, bk)
    return jnp.einsum("pif,piq->qf", t, xk)


@jax.jit
def _adv_right_b(Rb, xk, bk):
    t = jnp.einsum("bif,qf->biq", bk, Rb)
    return jnp.einsum("biq,piq->pb", t, xk)


# -- the local system ----------------------------------------------------------


@jax.jit
def _local_rhs(Lb, bk, Rb):
    return jnp.einsum("pb,bif,qf->piq", Lb, bk, Rb)


@jax.jit
def _local_dense(L, ak, R):
    h1 = jnp.einsum("psa,sijt->paijt", L, ak)
    H = jnp.einsum("paijt,qtc->piqajc", h1, R)
    m = H.shape[0] * H.shape[1] * H.shape[2]
    return H.reshape(m, m)


def _matvec(L, ak, R, v):
    v1 = jnp.einsum("psa,ajc->psjc", L, v)
    v2 = jnp.einsum("psjc,sijt->pitc", v1, ak)
    return jnp.einsum("pitc,qtc->piq", v2, R)


def _matvec_t(L, ak, R, u):
    u1 = jnp.einsum("psa,piq->saiq", L, u)
    u2 = jnp.einsum("saiq,sijt->ajqt", u1, ak)
    return jnp.einsum("ajqt,qtc->ajc", u2, R)


@partial(jax.jit, static_argnames=("iters",))
def _local_cg(L, ak, R, rhs, v0, lam, iters):
    """CG on the normal equations of the projected system (general A)."""

    def nmat(v):
        return _matvec_t(L, ak, R, _matvec(L, ak, R, v)) + lam * v

    b = _matvec_t(L, ak, R, rhs)
    x, _ = jax.scipy.sparse.linalg.cg(
        nmat, b, x0=v0, maxiter=iters, tol=1e-12
    )
    return x


@jax.jit
def _left_orth(core):
    r1, n, r2 = core.shape
    q, _ = jnp.linalg.qr(core.reshape(r1 * n, r2))
    if q.shape[1] < r2:
        q = jnp.pad(q, ((0, 0), (0, r2 - q.shape[1])))
    return q.reshape(r1, n, r2)


@jax.jit
def _right_orth(core):
    r1, n, r2 = core.shape
    q, _ = jnp.linalg.qr(core.reshape(r1, n * r2).T)
    if q.shape[1] < r1:
        q = jnp.pad(q, ((0, 0), (0, r1 - q.shape[1])))
    return q.T.reshape(r1, n, r2)


def _solve_core(L, R, Lb, Rb, ak, bk, vk, lam, dense_limit, cg_iters):
    rhs = _local_rhs(Lb, bk, Rb)
    m = rhs.size
    if m <= dense_limit:
        H = _local_dense(L, ak, R)
        H = H + lam * jnp.eye(m, dtype=H.dtype)
        # lstsq, not solve: frames of overparameterized bonds (rank >
        # rows of an end unfolding) have structurally zero directions,
        # making H singular — the minimum-norm solution zeroes them
        sol = jnp.linalg.lstsq(H, rhs.reshape(m))[0]
        return sol.reshape(rhs.shape)
    return _local_cg(L, ak, R, rhs, vk, lam, cg_iters)


def _residual(op: PackedTTOp, rhs: PackedTT, x: PackedTT) -> float:
    return float(
        norm_exact(add(rhs, scale(ttop_apply_packed(op, x), -1.0)))
    )


def als_solve(
    op: PackedTTOp,
    rhs: PackedTT,
    x0: PackedTT,
    sweeps: int = 10,
    tol: float = 1e-8,
    lam: float = 0.0,
    dense_limit: int = 1024,
    cg_iters: int = 200,
) -> Tuple[PackedTT, float, List[float]]:
    """Solve ``op @ x = rhs`` by one-site ALS at the ranks of ``x0``.

    Returns ``(x, residual, history)`` where ``history`` is the true
    residual norm after each sweep (measured exactly via
    :func:`~tensor_networks_tpu.ops.packed.norm_exact`) and the sweep
    loop stops once it drops below ``tol``.

    The projected local systems are solved densely up to
    ``dense_limit`` unknowns, else by ``cg_iters`` CG steps on the
    normal equations (warm-started from the current core).  ``lam``
    regularizes the local solves (useful when the Galerkin projection
    of a strongly nonsymmetric ``A`` is near-singular).  Grow ranks by
    restarting from ``packed.pad_rank(x, r2)``.
    """
    dt = x0.first.dtype
    # uniform 3D/4D core lists with explicit size-1 end bonds
    xs = [x0.first[None]] + list(x0.mids) + [x0.last[..., None]]
    bs = (
        [rhs.first[None].astype(dt)]
        + list(rhs.mids.astype(dt))
        + [rhs.last[..., None].astype(dt)]
    )
    as_ = (
        [op.first[None].astype(dt)]
        + list(op.mids.astype(dt))
        + [op.last[..., None].astype(dt)]
    )
    d = len(xs)

    # canonicalize: all cores right-orthogonal so the first sweep's
    # right frames are orthonormal
    for k in range(d - 1, 0, -1):
        xs[k] = _right_orth(xs[k])

    one3 = jnp.ones((1, 1, 1), dt)
    one2 = jnp.ones((1, 1), dt)

    history: List[float] = []
    res = float("inf")
    for _sweep in range(sweeps):
        # right environments from the current cores
        Rs, Rbs = [one3], [one2]
        for k in range(d - 1, 0, -1):
            Rs.append(_adv_right(Rs[-1], xs[k], as_[k]))
            Rbs.append(_adv_right_b(Rbs[-1], xs[k], bs[k]))
        Rs.reverse()
        Rbs.reverse()  # [k] = env to the right of core k

        L, Lb = one3, one2
        for k in range(d):
            xs[k] = _solve_core(
                L, Rs[k], Lb, Rbs[k], as_[k], bs[k], xs[k],
                jnp.asarray(lam, dt), dense_limit, cg_iters,
            )
            if k < d - 1:
                xs[k] = _left_orth(xs[k])
            L = _adv_left(L, xs[k], as_[k])
            Lb = _adv_left_b(Lb, xs[k], bs[k])

        # right-to-left, mirrored
        Ls, Lbs = [one3], [one2]
        for k in range(d - 1):
            Ls.append(_adv_left(Ls[-1], xs[k], as_[k]))
            Lbs.append(_adv_left_b(Lbs[-1], xs[k], bs[k]))
        R, Rb = one3, one2
        for k in range(d - 1, -1, -1):
            xs[k] = _solve_core(
                Ls[k], R, Lbs[k], Rb, as_[k], bs[k], xs[k],
                jnp.asarray(lam, dt), dense_limit, cg_iters,
            )
            if k > 0:
                xs[k] = _right_orth(xs[k])
            R = _adv_right(R, xs[k], as_[k])
            Rb = _adv_right_b(Rb, xs[k], bs[k])

        x = PackedTT(xs[0][0], jnp.stack(xs[1:-1]), xs[-1][..., 0])
        res = _residual(op, rhs, x)
        history.append(res)
        if res < tol:
            break

    x = PackedTT(xs[0][0], jnp.stack(xs[1:-1]), xs[-1][..., 0])
    return x, res, history
