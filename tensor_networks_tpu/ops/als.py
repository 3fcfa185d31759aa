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
``dense_limit`` unknowns and by conjugate gradients above it — on the
normal equations for general ``A`` (squares the local condition
number), or directly on the projected operator with ``spd=True``.
Rank adaptivity is by restart (:func:`als_solve_adaptive`): solve at
rank r, then grow geometrically — by default enriching the new bond
directions with the rounded residual train (AMEn-style) rather than
zero padding.
"""

from __future__ import annotations

import warnings
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensor_networks_tpu.ops.packed import (
    PackedTT,
    PackedTTOp,
    add,
    norm_exact,
    scale,
    ttop_apply_packed,
)

__all__ = ["als_solve", "als_solve_adaptive"]

_STALL_MSG = (
    "ALS sweep reduced the residual <2% (now {res:.2e}) with local "
    "systems of {size} unknowns above dense_limit={dense_limit} "
    "({path}); if it stays flat, raise dense_limit or cg_iters, or "
    "lower the rank{spd_hint}"
)


# -- environment advances ------------------------------------------------------
# Index conventions: ket core X (a, j, a2); the SAME core is the bra
# test frame with the output physical index (p, i, p2); operator core
# A (s, i, j, t); rhs core B (beta, i, beta2).  Left environment
# L (p, s, a); right environment R (q, t, c); rhs environments
# Lb (p, beta) / Rb (q, beta2).


@jax.jit
def _adv_left(L, xk, ak):
    t1 = jnp.einsum("psa,ajb->psjb", L, xk, precision="highest")
    t2 = jnp.einsum("psjb,sijt->pitb", t1, ak, precision="highest")
    return jnp.einsum("pitb,piq->qtb", t2, xk, precision="highest")


@jax.jit
def _adv_right(R, xk, ak):
    u1 = jnp.einsum("ajc,qtc->ajqt", xk, R, precision="highest")
    u2 = jnp.einsum("ajqt,sijt->asiq", u1, ak, precision="highest")
    return jnp.einsum("asiq,piq->psa", u2, xk, precision="highest")


@jax.jit
def _adv_left_b(Lb, xk, bk):
    t = jnp.einsum("pb,bif->pif", Lb, bk, precision="highest")
    return jnp.einsum("pif,piq->qf", t, xk, precision="highest")


@jax.jit
def _adv_right_b(Rb, xk, bk):
    t = jnp.einsum("bif,qf->biq", bk, Rb, precision="highest")
    return jnp.einsum("biq,piq->pb", t, xk, precision="highest")


# -- the local system ----------------------------------------------------------


@jax.jit
def _local_rhs(Lb, bk, Rb):
    return jnp.einsum("pb,bif,qf->piq", Lb, bk, Rb, precision="highest")


@jax.jit
def _local_dense(L, ak, R):
    h1 = jnp.einsum("psa,sijt->paijt", L, ak, precision="highest")
    H = jnp.einsum("paijt,qtc->piqajc", h1, R, precision="highest")
    m = H.shape[0] * H.shape[1] * H.shape[2]
    return H.reshape(m, m)


def _matvec(L, ak, R, v):
    v1 = jnp.einsum("psa,ajc->psjc", L, v, precision="highest")
    v2 = jnp.einsum("psjc,sijt->pitc", v1, ak, precision="highest")
    return jnp.einsum("pitc,qtc->piq", v2, R, precision="highest")


def _matvec_t(L, ak, R, u):
    u1 = jnp.einsum("psa,piq->saiq", L, u, precision="highest")
    u2 = jnp.einsum("saiq,sijt->ajqt", u1, ak, precision="highest")
    return jnp.einsum("ajqt,qtc->ajc", u2, R, precision="highest")


@partial(jax.jit, static_argnames=("iters", "spd"))
def _local_cg(L, ak, R, rhs, v0, lam, iters, spd):
    """CG on the regularized projected system (H + lam I).

    ``spd=False`` (general ``A``): CG on the normal equations — always
    applicable, but squares the local condition number.  ``spd=True``
    (symmetric positive definite ``A``; the Galerkin projection through
    orthonormal frames is then SPD too): plain CG on H directly — the
    same iteration count buys twice the digits."""

    def hmat(v):
        return _matvec(L, ak, R, v) + lam * v

    if spd:
        x, _ = jax.scipy.sparse.linalg.cg(
            hmat, rhs, x0=v0, maxiter=iters, tol=1e-12
        )
        return x

    def hmat_t(u):
        return _matvec_t(L, ak, R, u) + lam * u

    def nmat(v):
        return hmat_t(hmat(v))

    b = hmat_t(rhs)
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


def _solve_core(L, R, Lb, Rb, ak, bk, vk, lam, dense_limit, cg_iters,
                spd, warm):
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
    # warm-start ONLY structurally nonsingular locals.  On a singular
    # local (overparameterized bond: rank > the mode product on one
    # side), CG preserves the warm start's null(H) component — the
    # represented tensor is unchanged (null(H) = null(frame)) but the
    # junk enters the bond basis at the orthogonalization step and the
    # sweep stalls orders of magnitude above the dense path (observed:
    # 1.4e-2 vs 1e-13 on a K=6 QTT system; every LOCAL residual at
    # 1e-15).  From x0 = 0 the Krylov space lives in range(H), so CG
    # returns the same minimum-norm solution lstsq does.  ``warm`` may
    # be a Python bool (host path) or a traced scalar (fused sweep).
    v0 = jnp.where(warm, vk, jnp.zeros_like(vk))
    return _local_cg(L, ak, R, rhs, v0, lam, cg_iters, spd)


# -- fused sweep ----------------------------------------------------------------
# The host loop below dispatches ~10 d kernels per sweep (2d local
# solves, 2(d-2) orthogonalizations, ~4d env advances) — seconds per
# sweep through a ~25 ms/dispatch TPU relay at QTT depths.  Packed
# trains are uniform, so the whole sweep fuses into ONE program:
# boundary cores explicit, mid cores as lax.scan sweeps.  Arithmetic is
# identical to the host loop call for call (the env chains recomputed
# at the top of the program equal the ones the previous backward half
# recorded, because they are functions of the same right-canonical
# cores); on structurally full-rank trains the two paths agree to
# roundoff (pinned by tests).  On PADDED trains the cores are rank-
# deficient, so the QR null-space gauge is arbitrary and XLA picks it
# differently inside the fused program — the paths then converge
# equally well but are not bitwise-comparable.


def _als_renv_body(carry, inp):
    """Right-env scan body (operator + rhs chains), emitting the
    PRE-absorb envs — entry j is what mid j consumes."""
    R, Rb = carry
    xk, ak, bk = inp
    return (
        (_adv_right(R, xk, ak), _adv_right_b(Rb, xk, bk)),
        (R, Rb),
    )


def _als_fwd_body_of(lam, dense_limit, cg_iters, spd):
    """Forward mid-core half-sweep body.  Emits (orthogonal core,
    PRE-update operator/rhs left envs — the return half's ls/lbs).
    Module-level builder so the DISTRIBUTED sweep (parallel/als.py)
    runs the same arithmetic by construction."""

    def fwd(carry, inp):
        L, Lb = carry
        xk, ak, bk, Rk, Rbk, wk = inp
        zk = _solve_core(L, Rk, Lb, Rbk, ak, bk, xk,
                         lam, dense_limit, cg_iters, spd, wk)
        qk = _left_orth(zk)
        Ln = _adv_left(L, qk, ak)
        Lbn = _adv_left_b(Lb, qk, bk)
        return (Ln, Lbn), (qk, L, Lb)

    return fwd


def _als_bwd_body_of(lam, dense_limit, cg_iters, spd):
    """Backward mid-core half-sweep body (mirror of the forward one)."""

    def bwd(carry, inp):
        R, Rb = carry
        qk, ak, bk, Lk, Lbk, wk = inp
        zk = _solve_core(Lk, R, Lbk, Rb, ak, bk, qk,
                         lam, dense_limit, cg_iters, spd, wk)
        vk = _right_orth(zk)
        Rn = _adv_right(R, vk, ak)
        Rbn = _adv_right_b(Rb, vk, bk)
        return (Rn, Rbn), vk

    return bwd


def _als_sweep_impl(x0c, X, xlc, a0, Am, al, b0, Bm, bl, lam,
                    warm_first, warm_mid, warm_last,
                    dense_limit, cg_iters, spd):
    """One full ALS sweep (left->right, right->left) as a single program.

    ``x0c (1, n, r)``, ``X (m, r, n, r)``, ``xlc (r, n, 1)`` — right-
    canonical with the mass in core 0 on entry and on exit.  ``warm_*``
    are the per-position CG warm-start gates (traced booleans;
    ``warm_mid`` is a ``(m,)`` vector).
    """
    dt = x0c.dtype
    one3 = jnp.ones((1, 1, 1), dt)
    one2 = jnp.ones((1, 1), dt)

    # right-env chains of the current cores, emitted pre-absorb so
    # entry j is what mid j consumes (env of cores j+2..d-1)
    r_last = _adv_right(one3, xlc, al)
    rb_last = _adv_right_b(one2, xlc, bl)

    (r_front, rb_front), (rs_mid, rbs_mid) = jax.lax.scan(
        _als_renv_body, (r_last, rb_last), (X[::-1], Am[::-1], Bm[::-1])
    )
    rs_mid, rbs_mid = rs_mid[::-1], rbs_mid[::-1]

    # left -> right half: core 0 explicit, mids as one scan
    z0 = _solve_core(one3, r_front, one2, rb_front, a0, b0, x0c,
                     lam, dense_limit, cg_iters, spd, warm_first)
    q0 = _left_orth(z0)
    lenv = _adv_left(one3, q0, a0)
    lbenv = _adv_left_b(one2, q0, b0)

    (l_back, lb_back), (Q, ls_mid, lbs_mid) = jax.lax.scan(
        _als_fwd_body_of(lam, dense_limit, cg_iters, spd),
        (lenv, lbenv), (X, Am, Bm, rs_mid, rbs_mid, warm_mid)
    )

    # last core: solved by the forward half (no orth), then again
    # first thing in the return half — the host loop's exact order
    zl = _solve_core(l_back, one3, lb_back, one2, al, bl, xlc,
                     lam, dense_limit, cg_iters, spd, warm_last)
    zl = _solve_core(l_back, one3, lb_back, one2, al, bl, zl,
                     lam, dense_limit, cg_iters, spd, warm_last)
    vl = _right_orth(zl)
    renv2 = _adv_right(one3, vl, al)
    rbenv2 = _adv_right_b(one2, vl, bl)

    (r_back, rb_back), v_rev = jax.lax.scan(
        _als_bwd_body_of(lam, dense_limit, cg_iters, spd),
        (renv2, rbenv2),
        (Q[::-1], Am[::-1], Bm[::-1], ls_mid[::-1], lbs_mid[::-1],
         warm_mid[::-1]),
    )
    V = v_rev[::-1]

    z0 = _solve_core(one3, r_back, one2, rb_back, a0, b0, q0,
                     lam, dense_limit, cg_iters, spd, warm_first)
    return z0, V, vl


_als_sweep_fused = jax.jit(
    _als_sweep_impl,
    static_argnames=("dense_limit", "cg_iters", "spd"),
)


def _als_loop_impl(x0c, X, xlc, a0, Am, al, b0, Bm, bl, op, rhs,
                   lam, warm_first, warm_mid, warm_last, sweeps, tol,
                   cap, dense_limit, cg_iters, spd):
    """The whole fused sweep LOOP as one program: up to ``cap`` sweeps,
    the true residual (``norm_exact`` of the residual train) and the
    ``res < tol`` stop computed ON DEVICE — a multi-sweep solve costs
    zero host round-trips between sweeps (the per-sweep host residual
    was worth more relay time than the sweep's compute).  ``op``/``rhs``
    are the ORIGINAL packed operands (the residual is measured exactly
    as the host loop measures it).  ``sweeps`` and ``tol`` are device
    scalars; ``cap`` is bucketed to powers of two by the caller so
    nearby sweep budgets share one compile.  Returns the final cores
    plus a ``(cap + 1,)`` record: per-sweep residuals (NaN past the
    executed count) with the executed sweep count in the tail."""
    dt = x0c.dtype

    def cond(c):
        _, _, _, _, i, done = c
        return jnp.logical_and(i < sweeps, jnp.logical_not(done))

    def body(c):
        z0, Vm, vlq, hist, i, _ = c
        z0n, Vmn, vlqn = _als_sweep_impl(
            z0, Vm, vlq, a0, Am, al, b0, Bm, bl, lam,
            warm_first, warm_mid, warm_last,
            dense_limit, cg_iters, spd,
        )
        x = PackedTT(z0n[0], Vmn, vlqn[..., 0])
        res = norm_exact(_residual_train(op, rhs, x)).astype(dt)
        hist = jax.lax.dynamic_update_slice(hist, res[None], (i,))
        return (z0n, Vmn, vlqn, hist, i + 1, res < tol)

    c0 = (
        x0c, X, xlc, jnp.full((cap,), jnp.nan, dt),
        jnp.asarray(0, jnp.int32), jnp.asarray(False),
    )
    z0, Vm, vlq, hist, i, _ = jax.lax.while_loop(cond, body, c0)
    return z0, Vm, vlq, jnp.concatenate([hist, i.astype(dt)[None]])


_als_loop_fused = jax.jit(
    _als_loop_impl,
    static_argnames=("cap", "dense_limit", "cg_iters", "spd"),
)


def _residual_train(op: PackedTTOp, rhs: PackedTT, x: PackedTT) -> PackedTT:
    return add(rhs, scale(ttop_apply_packed(op, x), -1.0))


def _enrich_span(x: PackedTT, resid_train: PackedTT, kick: int) -> PackedTT:
    """AMEn rank growth: direct-sum the rank-``kick`` rounding of the
    residual train with coefficient zero — the represented iterate is
    unchanged, but every bond frame gains the steepest-descent
    subspace the next sweep needs.  Shared by the adaptive linear
    solver and the adaptive eigensolver."""
    from tensor_networks_tpu.ops.packed import svd_round

    z = svd_round(resid_train, kick)
    dt = x.first.dtype
    span = PackedTT(
        jnp.zeros(z.first.shape, dt),
        z.mids.astype(dt),
        z.last.astype(dt),
    )
    return add(x, span)


def _residual(op: PackedTTOp, rhs: PackedTT, x: PackedTT) -> float:
    return float(norm_exact(_residual_train(op, rhs, x)))


def als_solve(
    op: PackedTTOp,
    rhs: PackedTT,
    x0: PackedTT,
    sweeps: int = 10,
    tol: float = 1e-8,
    lam: float = 0.0,
    dense_limit: int = 1024,
    cg_iters: int = 200,
    spd: bool = False,
    fused: bool = None,
) -> Tuple[PackedTT, float, List[float]]:
    """Solve ``op @ x = rhs`` by one-site ALS at the ranks of ``x0``.

    Returns ``(x, residual, history)`` where ``history`` is the true
    residual norm after each sweep (measured exactly via
    :func:`~tensor_networks_tpu.ops.packed.norm_exact`) and the sweep
    loop stops once it drops below ``tol``.  On the fused path the
    history buffer lives on device in the TRAIN dtype — for f32 trains
    the returned ``history``/``residual`` values carry ~1e-7 relative
    resolution even though they arrive as Python floats (the host loop
    records full-precision values; use ``fused=False`` when comparing
    history against tolerances tighter than the train dtype's eps).

    The projected local systems are solved densely up to
    ``dense_limit`` unknowns, else by ``cg_iters`` CG steps — on the
    normal equations for general ``A``, or directly on the projected
    operator when ``spd=True`` (``A`` symmetric positive definite:
    twice the digits per iteration, no condition-number squaring;
    elliptic operators like the screened Laplacian qualify).  ``lam``
    regularizes the local solves (useful when the Galerkin projection
    of a strongly nonsymmetric ``A`` is near-singular).  Grow ranks by
    restarting from ``packed.pad_rank(x, r2)``.

    ``fused`` (default on) runs the WHOLE sweep loop as ONE jitted
    program (boundary cores explicit, mid cores as ``lax.scan``
    sweeps, residual + ``res < tol`` stop on device via
    ``lax.while_loop``) instead of ~10 d separate dispatches per sweep
    plus a host residual fetch between sweeps — arithmetic identical
    to the host loop, which ``fused=False`` keeps for debugging.
    """
    if fused is None:
        fused = True
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
    # right frames are orthonormal.  The R factor is absorbed into the
    # left neighbor — discarding it would change the represented
    # tensor and destroy warm starts
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

    # structural nonsingularity of each local system (CG warm-start
    # gate, see _solve_core): bond ranks within the mode products on
    # both sides of the core
    caps_l, cap = [], 1
    for k in range(d):
        caps_l.append(cap)
        cap = min(cap * xs[k].shape[1], 1 << 40)
    caps_r, cap = [0] * d, 1
    for k in range(d - 1, -1, -1):
        caps_r[k] = cap
        cap = min(cap * xs[k].shape[1], 1 << 40)
    warm_ok = [
        xs[k].shape[0] <= caps_l[k] and xs[k].shape[2] <= caps_r[k]
        for k in range(d)
    ]

    one3 = jnp.ones((1, 1, 1), dt)
    one2 = jnp.ones((1, 1), dt)

    history: List[float] = []
    res = float("inf")
    warned_stall = False
    lam_d = jnp.asarray(lam, dt)
    # sweeps=0 returns the (canonicalized) start unchanged
    x = PackedTT(xs[0][0], jnp.stack(xs[1:-1]), xs[-1][..., 0])

    if fused:
        if sweeps <= 0:
            return x, res, history
        # stacked operands for the single-program sweep LOOP: the
        # whole multi-sweep solve (residual + convergence test
        # included) runs as one device program, fetched once
        fz = (xs[0], jnp.stack(xs[1:-1]), xs[-1])
        a_stk = (as_[0], op.mids.astype(dt), as_[-1])
        b_stk = (bs[0], rhs.mids.astype(dt), bs[-1])
        warm_f = jnp.asarray(warm_ok[0])
        warm_m = jnp.asarray(warm_ok[1:-1])
        warm_l = jnp.asarray(warm_ok[-1])
        cap = 1 << max(sweeps - 1, 1).bit_length()
        z0, Vm, vlq, rec = _als_loop_fused(
            *fz, *a_stk, *b_stk, op, rhs, lam_d,
            warm_f, warm_m, warm_l,
            jnp.asarray(sweeps, jnp.int32), jnp.asarray(tol, dt),
            cap=cap, dense_limit=dense_limit,
            cg_iters=cg_iters, spd=spd,
        )
        rec = np.asarray(rec)  # ONE host fetch for the whole loop
        n_done = int(rec[-1])
        history = [float(v) for v in rec[:n_done]]
        if history:
            res = history[-1]
        x = PackedTT(z0[0], Vm, vlq[..., 0])
        # post-hoc stall warning — the same between-sweep condition
        # the host loop checks (see the comment there)
        size = x0.rank * x0.mode * x0.rank
        if size > dense_limit:
            for i in range(1, len(history)):
                if history[i] >= tol and history[i] > 0.98 * history[i - 1]:
                    warnings.warn(_STALL_MSG.format(
                        res=history[i], size=size,
                        dense_limit=dense_limit,
                        path=("plain CG on the SPD projection" if spd
                              else "CG on normal equations"),
                        spd_hint=("" if spd
                                  else "; for SPD operators pass "
                                       "spd=True"),
                    ), RuntimeWarning, stacklevel=2)
                    break
        return x, res, history

    # host-loop path: right-environment prefixes for the first
    # left-to-right pass; subsequent passes get them from the
    # preceding right-to-left pass (each half-sweep records the
    # prefixes the next consumes)
    rev_rs, rev_rbs = [one3], [one2]
    for k in range(d - 1, 0, -1):
        rev_rs.append(_adv_right(rev_rs[-1], xs[k], as_[k]))
        rev_rbs.append(_adv_right_b(rev_rbs[-1], xs[k], bs[k]))

    for _sweep in range(sweeps):
        rs = rev_rs[::-1]  # rs[k] = env right of core k
        rbs = rev_rbs[::-1]

        # left -> right, recording left prefixes for the return pass
        ls, lbs = [one3], [one2]
        for k in range(d):
            xs[k] = _solve_core(
                ls[-1], rs[k], lbs[-1], rbs[k], as_[k], bs[k], xs[k],
                lam_d, dense_limit, cg_iters, spd, warm_ok[k],
            )
            if k < d - 1:
                xs[k] = _left_orth(xs[k])
                ls.append(_adv_left(ls[-1], xs[k], as_[k]))
                lbs.append(_adv_left_b(lbs[-1], xs[k], bs[k]))

        # right -> left, recording right prefixes for the next sweep
        rev_rs, rev_rbs = [one3], [one2]
        for k in range(d - 1, -1, -1):
            xs[k] = _solve_core(
                ls[k], rev_rs[-1], lbs[k], rev_rbs[-1],
                as_[k], bs[k], xs[k],
                lam_d, dense_limit, cg_iters, spd, warm_ok[k],
            )
            if k > 0:
                xs[k] = _right_orth(xs[k])
                rev_rs.append(_adv_right(rev_rs[-1], xs[k], as_[k]))
                rev_rbs.append(
                    _adv_right_b(rev_rbs[-1], xs[k], bs[k])
                )

        x = PackedTT(xs[0][0], jnp.stack(xs[1:-1]), xs[-1][..., 0])

        res = _residual(op, rhs, x)
        history.append(res)
        if res < tol:
            break
        if (
            not warned_stall
            and len(history) >= 2
            and history[-1] > 0.98 * history[-2]
        ):
            # a stalled sweep above tol on the CG path can be a
            # LOCAL-solve failure, not a rank limit: r*n*r past
            # dense_limit routes to CG on the normal equations, whose
            # squared condition number can defeat cg_iters.  (The
            # historically observed hard stall — rank 24 on a mode-2
            # train stuck at rel 0.26 while the dense path solved
            # exactly — was warm-start null-space junk on singular
            # locals, fixed by the warm_ok gate in _solve_core.)
            # Warn once but honor the requested sweeps — slow
            # legitimate convergence must not be cut short.
            size = x0.rank * x0.mode * x0.rank
            if size > dense_limit:
                warned_stall = True
                warnings.warn(_STALL_MSG.format(
                    res=res, size=size, dense_limit=dense_limit,
                    path=("plain CG on the SPD projection" if spd
                          else "CG on normal equations"),
                    spd_hint=("" if spd
                              else "; for SPD operators pass spd=True"),
                ), RuntimeWarning, stacklevel=2)

    return x, res, history


def als_solve_adaptive(
    op: PackedTTOp,
    rhs: PackedTT,
    x0: PackedTT = None,
    eps: float = 1e-8,
    rank: int = None,
    max_rank: int = None,
    sweeps_per_rank: int = 4,
    enrich: bool = True,
    **kw,
) -> Tuple[PackedTT, float, List[float]]:
    """Rank-adaptive ALS: solve at the current rank and, while the
    exact relative residual stays above ``eps``, double the rank (warm
    restart) up to ``max_rank``.

    With ``enrich=True`` (default) the rank growth is AMEn-style: the
    new bond directions are the leading basis of the current residual
    train ``b - A x`` (rounded to the kick rank and direct-summed with
    coefficient zero — the represented iterate is unchanged, but every
    bond's frame now spans the steepest-descent subspace the next sweep
    needs; Dolgov & Savostyanov's enrichment, done globally at restart
    so every shape stays static between restarts).  ``enrich=False``
    falls back to inert zero padding.

    The same geometric restart schedule as
    :func:`ops.packed.gmres_packed` — compilation amortizes over the
    (few) rank levels, and the caller no longer has to guess the
    solution rank.  Returns ``(x, absolute residual, concatenated
    per-sweep history)``.

    Compile note: every rank level is a new shape, so the (default)
    fused sweep traces one whole-sweep program per level; on a TPU
    whose remote compiles cost minutes, pass ``fused=False`` (in
    ``**kw``) when the ladder is deep and sweeps-per-level are few.
    """
    from tensor_networks_tpu.ops.packed import norm_exact, pad_rank

    def _grow(x: PackedTT, target: int) -> PackedTT:
        kick = target - x.rank
        if kick <= 0:
            return x
        if not enrich:
            return pad_rank(x, target)
        return _enrich_span(x, _residual_train(op, rhs, x), kick)

    if x0 is None:
        x0 = rhs
    rank = int(rank) if rank is not None else max(2 * x0.rank, 2)
    ceiling = int(max_rank) if max_rank is not None else 8 * rank
    b_norm = float(norm_exact(rhs))
    x = _grow(x0, rank)
    hist_all: List[float] = []
    while True:
        x, res, hist = als_solve(
            op, rhs, x, sweeps=sweeps_per_rank, tol=eps * b_norm, **kw
        )
        hist_all += hist
        if res <= eps * b_norm or rank >= ceiling:
            return x, res, hist_all
        rank = min(2 * rank, ceiling)
        x = _grow(x, rank)
