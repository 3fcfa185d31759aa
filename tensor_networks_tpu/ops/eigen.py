"""One-site DMRG eigensolver for symmetric TT-operators.

Finds the smallest eigenpair of a symmetric (typically SPD) uniform
TT-operator by sweeping over the cores of the iterate and replacing
each with the lowest eigenvector of the Galerkin-projected local
operator ``H_k = frame_k^T A frame_k`` — with orthonormal frames the
local metric is the identity, so every local step is a plain symmetric
eigenproblem and the Rayleigh quotient is monotonically nonincreasing
across local solves (textbook DMRG).  The environment algebra is
shared with the ALS linear solver (:mod:`tensor_networks_tpu.ops.als`).

Uniform packed trains overparameterize end bonds (rank above the mode
product on one side), and a rank-deficient core CANNOT be made
orthonormal — zero-padded QR leaves the chained frame non-isometric,
so the honest local problem is the GENERALIZED one ``H v = lam B v``
with ``B`` the frame Gram (treating ``B = I`` lets the frame's null
space, spurious eigenvalue 0, capture the sweep — observed as a
Rayleigh quotient oscillating over half the spectrum).  The solver
therefore carries Gram environments alongside the operator
environments; ``B``'s Kronecker structure ``Lg (x) I (x) Rg`` makes
the whitening two bond-sized eighs per local solve, and whitened
coordinates outside range(B) are shifted out of the spectral window —
the eigensolver analogue of the ALS CG warm-start gate
(``als._solve_core``), where the same overparameterization shows up as
singular local systems.

No reference counterpart (``pytens`` has no eigensolver; its only
solver is GMRES, ``pytens/algs.py:2700``).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensor_networks_tpu.ops.als import (
    _adv_left,
    _enrich_span,
    _adv_left_b,
    _adv_right,
    _adv_right_b,
    _left_orth,
    _local_dense,
    _local_rhs,
    _matvec,
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

__all__ = ["als_eigsh", "als_eigsh_adaptive", "als_eigsh_k"]


@jax.jit
def _adv_left_g(Lg, xk):
    return jnp.einsum(
        "aA,ajb,AjB->bB", Lg, xk, xk, precision="highest"
    )


@jax.jit
def _adv_right_g(Rg, xk):
    return jnp.einsum(
        "bB,ajb,AjB->aA", Rg, xk, xk, precision="highest"
    )


def _whitener(G):
    """(W, valid): eigenbasis whitener of a PSD bond Gram — W maps
    whitened coordinates to bond coordinates, with rank-deficient
    directions zeroed.

    The rank cutoff must scale with the DTYPE: Gram eigenvalue noise
    is ~eps relative, and a noise direction passing the gate gets
    amplified by 1/sqrt(e) — a hard-coded 1e-12 let f32 noise (~1e-7)
    through and the spurious directions captured the sweep (lam
    1.2999998 vs true 0.302336 on the K=6 regression config in f32).
    """
    e, U = jnp.linalg.eigh(0.5 * (G + G.T))
    cut = 100.0 * jnp.finfo(G.dtype).eps
    valid = e > cut * jnp.max(jnp.abs(e))
    inv_sqrt = jnp.where(valid, 1.0 / jnp.sqrt(jnp.where(valid, e, 1.0)), 0.0)
    return U * inv_sqrt[None, :], valid


@jax.jit
def _local_ground_state(L, ak, R, Lg, Rg, pens, shift):
    """Smallest eigenpair of the projected local GENERALIZED problem
    ``H v = lam B v`` with ``B = Lg (x) I (x) Rg`` the frame Gram.

    Uniform packed trains overparameterize end bonds, so a chain of
    per-core orthogonalized (zero-padded) cores is NOT an isometry —
    treating the local metric as the identity lets the frame's null
    space (spurious eigenvalue 0) capture the sweep.  The Kronecker
    structure of B makes the whitening two bond-sized eighs instead of
    one local-sized one; whitened coordinates outside range(B) are
    shifted out of the spectral window.  Deflated directions (``pens``:
    (k, m) local projections of already-computed eigenvectors — exact
    inner products regardless of frame conditioning, since both trains
    are contracted) are pushed up by ``shift``.
    """
    h1 = jnp.einsum("psa,sijt->paijt", L, ak, precision="highest")
    H6 = jnp.einsum("paijt,qtc->piqajc", h1, R, precision="highest")
    wl, ml = _whitener(Lg)
    wr, mr = _whitener(Rg)
    Ht = jnp.einsum(
        "piqajc,pm,qn,ak,cl->minkjl",
        H6, wl, wr, wl, wr,
        precision="highest",
    )
    p, n, q = H6.shape[:3]
    m = wl.shape[1] * n * wr.shape[1]
    Ht = Ht.reshape(m, m)
    Ht = 0.5 * (Ht + Ht.T)
    alive = jnp.broadcast_to(
        ml[:, None, None] & mr[None, None, :],
        (wl.shape[1], n, wr.shape[1]),
    ).reshape(m)
    big = 2.0 * jnp.sum(jnp.abs(Ht)) + shift
    Ht = Ht + jnp.diag(jnp.where(alive, 0.0, big).astype(Ht.dtype))
    if pens.shape[0]:
        pw = jnp.einsum(
            "zaic,am,cn->zmin",
            pens.reshape(pens.shape[0], p, n, q),
            wl, wr,
            precision="highest",
        ).reshape(pens.shape[0], m)
        Ht = Ht + shift * (pw.T @ pw)
    w, y = jnp.linalg.eigh(Ht)
    v = jnp.einsum(
        "min,am,cn->aic",
        y[:, 0].reshape(wl.shape[1], n, wr.shape[1]),
        wl, wr,
        precision="highest",
    )
    return w[0], v.reshape(-1)


@lru_cache(maxsize=32)
def _lanczos_seed_np(m: int):
    """Deterministic dense start vector for the matrix-free local
    solve (host rng at trace time — a compile-time constant; generic
    direction, nonzero overlap with the ground state a.s.)."""
    rng = np.random.default_rng(13)
    v = rng.standard_normal(m)
    return v / np.linalg.norm(v)


def _local_ground_state_lanczos(L, ak, R, Lg, Rg, pens, shift, iters,
                                warm=None):
    """Matrix-free local ground state for LARGE local problems.

    Same generalized problem as :func:`_local_ground_state` (whitened
    frame-Gram metric, penalty deflation), but never materializes the
    ``(m, m)`` local matrix: a Lanczos process with full (CGS2)
    reorthogonalization runs on the whitened operator apply — the same
    rank-r einsum contractions the ALS CG local solve uses
    (``als._matvec``) — and one ``(iters, iters)`` eigh extracts the
    Ritz ground pair.  The dense path's dead-coordinate up-shift is
    unnecessary here: dead whitened coordinates are masked out of the
    start vector and out of every apply, so the Krylov space never
    leaves the alive subspace and no spurious eigenvalue can enter.

    TPU rationale (VERDICT r4 item 8): ``jnp.linalg.eigh`` neither
    batches nor pipelines on TPU (the K=22 r=8 eigsh sweep is 95%
    sequential 128-dim eighs at the ~465 us latency floor) and costs
    ~m^3 — at r=64 QTT shapes the local problem is m = 8192, where a
    dense eigh is minutes-slow while these applies are rank-r GEMMs
    that run on the MXU.  Breakdown (happy or numerical) is handled
    in-program: steps past a vanishing beta are masked out of the
    tridiagonal with a large diagonal so they cannot contaminate the
    minimum Ritz pair.
    """
    dt = L.dtype
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)
    wl, ml = _whitener(Lg)
    wr, mr = _whitener(Rg)
    m1, m2 = wl.shape[1], wr.shape[1]
    n = ak.shape[2]
    alive = jnp.broadcast_to(
        ml[:, None, None] & mr[None, None, :], (m1, n, m2)
    ).astype(dt)
    mflat = m1 * n * m2
    npen = pens.shape[0]
    if npen:
        pw = jnp.einsum(
            "zajc,am,cn->zmjn",
            pens.reshape(npen, wl.shape[0], n, wr.shape[0]),
            wl, wr, precision="highest",
        ).reshape(npen, mflat)

    def apply(vflat):
        v = vflat.reshape(m1, n, m2) * alive
        x = jnp.einsum("mjn,am,cn->ajc", v, wl, wr, precision="highest")
        y = _matvec(L, ak, R, x)
        z = jnp.einsum("piq,pm,qn->min", y, wl, wr, precision="highest")
        z = (z * alive).reshape(mflat)
        if npen:
            z = z + shift * (pw.T @ (pw @ vflat))
        return z

    K = int(iters)
    seed = jnp.asarray(_lanczos_seed_np(mflat), dt) * alive.reshape(-1)
    if warm is not None:
        # Warm-start from the current core: as the sweep converges the
        # core approaches the local ground state, so each visit REFINES
        # instead of re-converging from a cold Krylov space (without
        # this the global Rayleigh error plateaus at the fixed-budget
        # Lanczos residual — measured 1.2e-4 on the K=6 f64 regression
        # config vs ~1e-10 warm).  Whitened coordinates of a raw core
        # x are W^+ x = W^T G x (W whitens the Gram: W^T G W = I on
        # valid directions).  A small fixed perturbation guarantees
        # nonzero ground-state overlap even from a pathological core.
        wlg = wl.T @ (0.5 * (Lg + Lg.T))
        grw = (0.5 * (Rg + Rg.T)) @ wr
        v0w = jnp.einsum(
            "ma,ajc,cn->mjn", wlg, warm.reshape(wl.shape[0], n,
                                                wr.shape[0]), grw,
            precision="highest",
        ).reshape(mflat) * alive.reshape(-1)
        v0 = v0w + 1e-4 * jnp.linalg.norm(v0w) * seed
        v0 = jnp.where(jnp.linalg.norm(v0) > tiny, v0, seed)
    else:
        v0 = seed
    v0 = v0 / jnp.maximum(jnp.linalg.norm(v0), tiny)
    Vb = jnp.zeros((K, mflat), dt).at[0].set(v0)
    alphas = jnp.zeros((K,), dt)
    betas = jnp.zeros((K,), dt)
    valid = jnp.zeros((K,), bool).at[0].set(True)

    def body(j, c):
        Vb, alphas, betas, valid, amax = c
        vj = Vb[j]
        w = apply(vj)
        a_j = vj @ w
        amax = jnp.maximum(amax, jnp.abs(a_j))
        alphas = alphas.at[j].set(a_j)
        # full reorthogonalization, two CGS passes (numerically MGS-
        # equivalent with the second pass; all matmul-shaped)
        w = w - Vb.T @ (Vb @ w)
        w = w - Vb.T @ (Vb @ w)
        b_j = jnp.linalg.norm(w)
        # breakdown gate at the ROUND-OFF scale, not sqrt(eps): with
        # full reorthogonalization, continuing past a small beta only
        # appends another orthonormal direction (harmless expansion),
        # while a sqrt(eps) gate truncates the Krylov space as soon as
        # the residual reaches ~sqrt(eps)*|H| — measured as a 5e-4
        # Rayleigh stall at f32 r=64 (and a 1e-8 stall at f64) before
        # this fix.  50*eps*amax keeps true happy breakdown detected.
        ok = b_j > 50.0 * jnp.asarray(jnp.finfo(dt).eps, dt) * amax
        betas = betas.at[j].set(jnp.where(ok, b_j, 0.0))
        # .at[] drops the out-of-bounds write at j = K-1
        Vb = Vb.at[j + 1].set(
            jnp.where(ok, w / jnp.maximum(b_j, tiny), 0.0)
        )
        valid = valid.at[j + 1].set(valid[j] & ok)
        return Vb, alphas, betas, valid, amax

    Vb, alphas, betas, valid, amax = jax.lax.fori_loop(
        0, K, body, (Vb, alphas, betas, valid, jnp.asarray(0.0, dt))
    )
    big = 10.0 * (amax + jnp.abs(shift) + 1.0)
    diag = jnp.where(valid, alphas, big)
    off = betas[:-1] * valid[1:].astype(dt)
    T = jnp.diag(diag) + jnp.diag(off, 1) + jnp.diag(off, -1)
    wv, Y = jnp.linalg.eigh(T)
    u = Vb.T @ Y[:, 0]
    vraw = jnp.einsum(
        "mjn,am,cn->ajc", u.reshape(m1, n, m2), wl, wr,
        precision="highest",
    )
    return wv[0], vraw.reshape(-1)


@jax.jit
def _adv_left_mb(L, xk, mk, vk):
    """Left env of the three-train sandwich x^T M v (bra ``xk``, ket
    ``vk``) — the deflation projections in the mass metric."""
    t1 = jnp.einsum("psb,bjc->psjc", L, vk, precision="highest")
    t2 = jnp.einsum("psjc,sijt->pitc", t1, mk, precision="highest")
    return jnp.einsum("pitc,piq->qtc", t2, xk, precision="highest")


@jax.jit
def _adv_right_mb(R, xk, mk, vk):
    u1 = jnp.einsum("bjc,qtc->bjqt", vk, R, precision="highest")
    u2 = jnp.einsum("bjqt,sijt->bsiq", u1, mk, precision="highest")
    return jnp.einsum("bsiq,piq->psb", u2, xk, precision="highest")


@jax.jit
def _local_mb(L, mk, R, vk):
    t1 = jnp.einsum("psb,bjc->psjc", L, vk, precision="highest")
    t2 = jnp.einsum("psjc,sijt->pitc", t1, mk, precision="highest")
    return jnp.einsum("pitc,qtc->piq", t2, R, precision="highest")


@jax.jit
def _local_ground_state_mass(L, ak, R, Lm, mk, Rm, pens, shift):
    """Generalized local solve ``H v = lam B v`` with ``B`` the
    Galerkin projection of an SPD mass operator (full local whitening;
    no Kronecker shortcut since ``M`` couples the modes)."""
    H = _local_dense(L, ak, R)
    m = H.shape[0]
    H = 0.5 * (H + H.T)
    B = _local_dense(Lm, mk, Rm)
    B = 0.5 * (B + B.T)
    e, U = jnp.linalg.eigh(B)
    # dtype-scaled rank cutoff — see _whitener
    cut = 100.0 * jnp.finfo(B.dtype).eps
    alive = e > cut * jnp.max(jnp.abs(e))
    W = U * jnp.where(
        alive, 1.0 / jnp.sqrt(jnp.where(alive, e, 1.0)), 0.0
    )[None, :]
    Ht = W.T @ H @ W
    Ht = 0.5 * (Ht + Ht.T)
    big = 2.0 * jnp.sum(jnp.abs(Ht)) + shift
    Ht = Ht + jnp.diag(jnp.where(alive, 0.0, big).astype(Ht.dtype))
    if pens.shape[0]:
        pw = pens @ W
        Ht = Ht + shift * (pw.T @ pw)
    w, y = jnp.linalg.eigh(Ht)
    return w[0], W @ y[:, 0]


# -- fused sweep ----------------------------------------------------------------
# Same single-program treatment as ops.als._als_sweep_impl: boundary
# cores explicit, mid cores as lax.scan sweeps.  The carries add the
# metric env (frame Gram, or the Galerkin projection of the mass
# operator) and, when deflating, a J-stacked penalty env advanced by
# vmapped sandwich contractions (requires the deflation trains to share
# one rank — als_eigsh falls back to the host loop otherwise).  On
# padded (rank-deficient) trains the local eigenbases match the host
# loop only up to whitener gauge; the pinned contract is identical
# Rayleigh descent on full-rank trains and equal convergence otherwise.

_adv_left_b_v = jax.vmap(_adv_left_b, in_axes=(0, None, 0))
_adv_right_b_v = jax.vmap(_adv_right_b, in_axes=(0, None, 0))
_local_rhs_v = jax.vmap(_local_rhs, in_axes=(0, 0, 0))
_adv_left_mb_v = jax.vmap(_adv_left_mb, in_axes=(0, None, None, 0))
_adv_right_mb_v = jax.vmap(_adv_right_mb, in_axes=(0, None, None, 0))
_local_mb_v = jax.vmap(_local_mb, in_axes=(0, None, 0, 0))


class _EigHelpers:
    """The metric/deflation plumbing of the eigensolver sweep, bundled
    so the fused single-device sweep (:func:`_eig_sweep_impl`) and the
    DISTRIBUTED sweep (``parallel/eigen.py``) run the same arithmetic
    by construction.  ``use_mass`` switches the local metric from the
    frame Gram to the Galerkin projection of the mass operator;
    ``use_pen`` carries J-stacked deflation environments.  ``mk``/``vk``
    operands are ignored (dummy zeros) when the corresponding feature
    is off."""

    def __init__(self, use_mass: bool, use_pen: bool, dt, J: int = 0,
                 dense_limit: int = 1024, lanczos_iters: int = 64):
        self.use_mass = use_mass
        self.use_pen = use_pen
        self.dt = dt
        self.J = J
        self.dense_limit = dense_limit
        self.lanczos_iters = lanczos_iters
        self.one3 = jnp.ones((1, 1, 1), dt)
        self.one2 = jnp.ones((1, 1), dt)

    def g_seed(self):
        return self.one3 if self.use_mass else self.one2

    def g_adv_l(self, Lg, xk, mk):
        if self.use_mass:
            return _adv_left(Lg, xk, mk)
        return _adv_left_g(Lg, xk)

    def g_adv_r(self, Rg, xk, mk):
        if self.use_mass:
            return _adv_right(Rg, xk, mk)
        return _adv_right_g(Rg, xk)

    def p_seed(self):
        if not self.use_pen:
            return None
        seed = self.one3 if self.use_mass else self.one2
        return jnp.broadcast_to(seed, (self.J,) + seed.shape)

    def p_adv_l(self, Lb, xk, mk, vk):
        if not self.use_pen:
            return None
        if self.use_mass:
            return _adv_left_mb_v(Lb, xk, mk, vk)
        return _adv_left_b_v(Lb, xk, vk)

    def p_adv_r(self, Rb, xk, mk, vk):
        if not self.use_pen:
            return None
        if self.use_mass:
            return _adv_right_mb_v(Rb, xk, mk, vk)
        return _adv_right_b_v(Rb, xk, vk)

    def pens_of(self, Lb, Rb, mk, vk, size):
        if not self.use_pen:
            return jnp.zeros((0, size), self.dt)
        if self.use_mass:
            out = _local_mb_v(Lb, mk, Rb, vk)
        else:
            out = _local_rhs_v(Lb, vk, Rb)
        return out.reshape(out.shape[0], -1)

    def solve(self, L, R, Lg, Rg, ak, mk, pens, shift, warm=None):
        if self.use_mass:
            # the mass metric keeps the dense local path (its whitening
            # needs the full Galerkin-projected metric, not a Kronecker
            # bond pair) — raise dense_limit-scale mass problems via
            # rank splitting instead
            return _local_ground_state_mass(L, ak, R, Lg, mk, Rg, pens,
                                            shift)
        m = L.shape[2] * ak.shape[2] * R.shape[2]
        if m > self.dense_limit:
            return _local_ground_state_lanczos(
                L, ak, R, Lg, Rg, pens, shift, self.lanczos_iters,
                warm=warm,
            )
        return _local_ground_state(L, ak, R, Lg, Rg, pens, shift)


def _eig_renv_body_of(h: _EigHelpers):
    """Right-env scan body (operator + metric + deflation chains),
    emitting the PRE-absorb envs — entry j is what mid j consumes."""

    def renv(carry, inp):
        R, Rg, Rb = carry
        xk, ak, mk, vk = inp
        nxt = (
            _adv_right(R, xk, ak),
            h.g_adv_r(Rg, xk, mk),
            h.p_adv_r(Rb, xk, mk, vk),
        )
        return nxt, carry

    return renv


def _eig_fwd_body_of(h: _EigHelpers, shift):
    """Forward mid-core half-sweep body.  Emits (orthogonal core,
    PRE-update left envs — the return half's inputs)."""

    def fwd(carry, inp):
        L, Lg, Lb = carry
        (xk, ak, mk, vk), (Rk, Rgk, Rbk) = inp
        pens_k = h.pens_of(Lb, Rbk, mk, vk, xk.size)
        _, vec_k = h.solve(L, Rk, Lg, Rgk, ak, mk, pens_k, shift,
                           warm=xk)
        qk = _left_orth(vec_k.reshape(xk.shape))
        nxt = (
            _adv_left(L, qk, ak),
            h.g_adv_l(Lg, qk, mk),
            h.p_adv_l(Lb, qk, mk, vk),
        )
        return nxt, (qk, carry)

    return fwd


def _eig_bwd_body_of(h: _EigHelpers, shift):
    """Backward mid-core half-sweep body (mirror of the forward one)."""

    def bwd(carry, inp):
        R, Rg, Rb = carry
        (qk, (Lk, Lgk, Lbk)), (ak, mk, vk) = inp
        pens_k = h.pens_of(Lbk, Rb, mk, vk, qk.size)
        _, vec_k = h.solve(Lk, R, Lgk, Rg, ak, mk, pens_k, shift,
                           warm=qk)
        vk_new = _right_orth(vec_k.reshape(qk.shape))
        nxt = (
            _adv_right(R, vk_new, ak),
            h.g_adv_r(Rg, vk_new, mk),
            h.p_adv_r(Rb, vk_new, mk, vk),
        )
        return nxt, vk_new

    return bwd


def _eig_sweep_impl(x0c, X, xlc, a0, Am, al, mstk, vstk, shift,
                    dense_limit: int = 1024, lanczos_iters: int = 64):
    """One full eigensolver sweep (left->right, right->left) as a
    single program.

    ``mstk`` is ``(m0, Mm, ml)`` for the generalized problem or None
    (frame-Gram metric).  ``vstk`` is ``(V0 (J,1,n,rv), VM (mm,J,rv,n,rv),
    VL (J,rv,n,1))`` stacked deflation trains or None.  Returns the
    updated cores plus the Rayleigh values closing each half-sweep.
    """
    dt = x0c.dtype
    one3 = jnp.ones((1, 1, 1), dt)
    use_mass = mstk is not None
    use_pen = vstk is not None
    if use_mass:
        m0, Mm, ml = mstk
    if use_pen:
        V0, VM, VL = vstk
        J = V0.shape[0]

    h = _EigHelpers(use_mass, use_pen, dt, J if use_pen else 0,
                    dense_limit, lanczos_iters)

    # per-position operator/mass/deflation cores, bundled for the scans
    mk0 = m0 if use_mass else None
    mkl = ml if use_mass else None
    v0 = V0 if use_pen else None
    vl = VL if use_pen else None

    def mids_inp(reverse, with_state=True):
        sl = slice(None, None, -1) if reverse else slice(None)
        parts = [X[sl]] if with_state else []
        parts.append(Am[sl])
        parts.append(Mm[sl] if use_mass else jnp.zeros((X.shape[0],), dt)[sl])
        parts.append(VM[sl] if use_pen else jnp.zeros((X.shape[0],), dt)[sl])
        return tuple(parts)

    # right-env chains of the current cores, emitted pre-absorb
    r_last = _adv_right(one3, xlc, al)
    rg_last = h.g_adv_r(h.g_seed(), xlc, mkl)
    rb_last = h.p_adv_r(h.p_seed(), xlc, mkl, vl)

    (r_front, rg_front, rb_front), (rs_mid, rgs_mid, rbs_mid) = (
        jax.lax.scan(
            _eig_renv_body_of(h),
            (r_last, rg_last, rb_last), mids_inp(reverse=True)
        )
    )
    rs_mid = jax.tree_util.tree_map(lambda a: a[::-1], rs_mid)
    rgs_mid = jax.tree_util.tree_map(lambda a: a[::-1], rgs_mid)
    rbs_mid = jax.tree_util.tree_map(lambda a: a[::-1], rbs_mid)

    # left -> right half
    pens = h.pens_of(h.p_seed(), rb_front, mk0, v0, x0c.size)
    _, vec = h.solve(one3, r_front, h.g_seed(), rg_front, a0, mk0,
                     pens, shift, warm=x0c)
    q0 = _left_orth(vec.reshape(x0c.shape))
    lenv = _adv_left(one3, q0, a0)
    lg = h.g_adv_l(h.g_seed(), q0, mk0)
    lb = h.p_adv_l(h.p_seed(), q0, mk0, v0)

    (l_back, lg_back, lb_back), (Q, ls_mid) = jax.lax.scan(
        _eig_fwd_body_of(h, shift), (lenv, lg, lb),
        (mids_inp(reverse=False), (rs_mid, rgs_mid, rbs_mid)),
    )

    pens = h.pens_of(lb_back, h.p_seed(), mkl, vl, xlc.size)
    lam_f, vec = h.solve(l_back, one3, lg_back, h.g_seed(), al, mkl,
                         pens, shift, warm=xlc)

    # right -> left half.  The host loop re-solves the last core here,
    # but the eigen local solve does not depend on the current core
    # value (no warm start), so the re-solve is bit-identical to the
    # forward one — skipped
    vlq = _right_orth(vec.reshape(xlc.shape))
    renv2 = _adv_right(one3, vlq, al)
    rg2 = h.g_adv_r(h.g_seed(), vlq, mkl)
    rb2 = h.p_adv_r(h.p_seed(), vlq, mkl, vl)

    rev = lambda t: jax.tree_util.tree_map(lambda a: a[::-1], t)  # noqa: E731
    (r_back, rg_back, rb_back), v_rev = jax.lax.scan(
        _eig_bwd_body_of(h, shift), (renv2, rg2, rb2),
        (rev((Q, ls_mid)), mids_inp(reverse=True, with_state=False)),
    )
    V = v_rev[::-1]

    pens = h.pens_of(h.p_seed(), rb_back, mk0, v0, q0.size)
    lam_b, vec = h.solve(one3, r_back, h.g_seed(), rg_back, a0, mk0,
                         pens, shift, warm=q0)
    z0 = vec.reshape(q0.shape)
    return z0, V, vlq, lam_f, lam_b


_eig_sweep_fused = jax.jit(
    _eig_sweep_impl, static_argnames=("dense_limit", "lanczos_iters")
)


def _eig_loop_impl(x0c, X, xlc, a0, Am, al, mstk, vstk, shift,
                   sweeps, tol, cap, dense_limit: int = 1024,
                   lanczos_iters: int = 64):
    """The whole fused sweep LOOP as one program: up to ``cap`` sweeps
    with the convergence test on device, so a multi-sweep solve costs
    zero host round-trips between sweeps (each ``float()`` through the
    relay is ~25 ms — more than a full sweep's compute, measured
    2026-08-20: pure sweep 21.6 ms at K=22 r=8 f32).  ``sweeps`` and
    ``tol`` are device scalars — one compiled program serves every
    sweep budget up to ``cap`` (cap is bucketed to powers of two by the
    caller, bounding recompiles).  Returns the final cores plus a
    ``(2 cap + 1,)`` record: per-half-sweep Rayleigh values (NaN past
    the executed count) with the executed sweep count in the tail."""
    dt = x0c.dtype
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)

    def cond(c):
        _, _, _, _, _, i, done = c
        return jnp.logical_and(i < sweeps, jnp.logical_not(done))

    def body(c):
        z0, Vm, vlq, lam_prev, hist, i, _ = c
        z0n, Vmn, vlqn, lam_f, lam_b = _eig_sweep_impl(
            z0, Vm, vlq, a0, Am, al, mstk, vstk, shift,
            dense_limit, lanczos_iters,
        )
        hist = jax.lax.dynamic_update_slice(
            hist, jnp.stack([lam_f, lam_b]), (2 * i,)
        )
        conv = jnp.abs(lam_prev - lam_b) <= tol * jnp.maximum(
            jnp.abs(lam_b), tiny
        )
        return (z0n, Vmn, vlqn, lam_b, hist, i + 1, conv)

    c0 = (
        x0c, X, xlc, jnp.asarray(jnp.inf, dt),
        jnp.full((2 * cap,), jnp.nan, dt),
        jnp.asarray(0, jnp.int32), jnp.asarray(False),
    )
    z0, Vm, vlq, _, hist, i, _ = jax.lax.while_loop(cond, body, c0)
    return z0, Vm, vlq, jnp.concatenate([hist, i.astype(dt)[None]])


_eig_loop_fused = jax.jit(
    _eig_loop_impl,
    static_argnames=("cap", "dense_limit", "lanczos_iters"),
)


def _op_fro_norm(op: PackedTTOp) -> float:
    """Frobenius norm of the represented operator (an upper bound on
    |lam_max|) — the fused-mode operator viewed as a train."""
    no, ni, R = op.first.shape
    dm = op.mids.shape[0]
    t = PackedTT(
        op.first.reshape(no * ni, R),
        op.mids.reshape(dm, R, no * ni, R),
        op.last.reshape(R, no * ni),
    )
    return float(norm_exact(t))


def _default_shift(op: PackedTTOp, x0: PackedTT, mass: PackedTTOp,
                   eigsh=None) -> float:
    """Default deflation penalty: an upper bound on the (generalized)
    spectral range — 2 |A|_F, divided by a 2-sweep DMRG estimate of
    lam_min(M) when a mass matrix widens the range.  ``eigsh`` lets the
    DISTRIBUTED solver estimate lam_min(M) with itself (one shift rule,
    two solvers)."""
    shift = 2.0 * _op_fro_norm(op)
    if mass is not None:
        solver = als_eigsh if eigsh is None else eigsh
        _, mu_min, _ = solver(mass, x0, sweeps=2)
        shift = shift / max(abs(mu_min), 1e-12)
    return shift


def als_eigsh(
    op: PackedTTOp,
    x0: PackedTT,
    sweeps: int = 10,
    tol: float = 1e-10,
    deflate: Tuple[PackedTT, ...] = (),
    shift: float = None,
    mass: PackedTTOp = None,
    fused: bool = None,
    dense_limit: int = 1024,
    lanczos_iters: int = 64,
) -> Tuple[PackedTT, float, List[float]]:
    """Smallest eigenpair of a symmetric TT-operator at the ranks of
    ``x0`` by one-site DMRG.

    Local problems up to ``dense_limit`` unknowns are solved by one
    dense whitened eigh; above it (MXU-scale ranks: r=64 QTT locals
    are 8192 unknowns) a matrix-free Lanczos with ``lanczos_iters``
    steps runs rank-r GEMM applies instead — TPU eigh is sequential
    and ~m^3 while the applies batch onto the MXU
    (:func:`_local_ground_state_lanczos`).  The ``mass`` metric always
    uses the dense path.

    Returns ``(x, lam, history)`` — the unit-norm eigenvector train,
    the Rayleigh quotient, and its value after each half-sweep; the
    sweep loop stops when the per-sweep improvement drops below
    ``tol * |lam|``.  Grow ranks with :func:`als_eigsh_adaptive`.  On
    the fused path the history buffer lives on device in the TRAIN
    dtype — f32 trains return ``history``/``lam`` values at ~1e-7
    relative resolution (the host loop records full-precision floats;
    use ``fused=False`` for comparisons tighter than the train eps).

    ``deflate`` lists already-computed (unit-norm) eigenvector trains:
    each local solve adds the penalty ``shift * p p^T`` for their
    frame projections ``p``, pushing those directions above the window
    so the sweep converges to the NEXT eigenpair (penalty deflation;
    :func:`als_eigsh_k` drives this).  ``shift`` defaults to twice the
    operator Frobenius norm, an upper bound on the spectral range.

    ``mass``: an SPD TT-operator turns the problem into the
    GENERALIZED one ``A v = lam M v`` — the local metric becomes the
    Galerkin projection of ``M`` (full local whitening instead of the
    Kronecker-factored frame Gram), deflation penalties use M-inner
    products, and the returned eigenvector is M-normalized
    (``<v, M v> = 1``).

    ``fused`` (default on) runs the WHOLE sweep loop as ONE jitted
    program (:func:`_eig_sweep_impl` under ``lax.while_loop`` with the
    convergence test on device — zero host round-trips between
    sweeps).  It needs the deflation trains to share one rank: the
    DEFAULT (``fused=None``) auto-falls-back to the host loop on mixed
    ranks, while an explicit ``fused=True`` raises.  ``fused=False``
    keeps the host loop for debugging.
    """
    dt = x0.first.dtype
    xs = [x0.first[None]] + list(x0.mids) + [x0.last[..., None]]
    as_ = (
        [op.first[None].astype(dt)]
        + list(op.mids.astype(dt))
        + [op.last[..., None].astype(dt)]
    )
    d = len(xs)
    ms_ = None
    if mass is not None:
        ms_ = (
            [mass.first[None].astype(dt)]
            + list(mass.mids.astype(dt))
            + [mass.last[..., None].astype(dt)]
        )
    vs = [
        [v.first[None].astype(dt)]
        + list(v.mids.astype(dt))
        + [v.last[..., None].astype(dt)]
        for v in deflate
    ]
    if deflate and shift is None:
        shift = _default_shift(op, x0, mass)
    shift_d = jnp.asarray(0.0 if shift is None else shift, dt)

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
    one2 = jnp.ones((1, 1), dt)
    history: List[float] = []
    lam = float("inf")

    if fused is None:
        fused = not deflate or len({v.rank for v in deflate}) == 1
    if fused:
        fz = (xs[0], jnp.stack(xs[1:-1]), xs[-1])
        a0f, amf, alf = as_[0], op.mids.astype(dt), as_[-1]
        mstk = None
        if mass is not None:
            mstk = (ms_[0], mass.mids.astype(dt), ms_[-1])
        vstk = None
        if deflate:
            if len({v.rank for v in deflate}) != 1:
                raise ValueError(
                    "fused=True needs deflation trains of one shared "
                    "rank; pad them or pass fused=False"
                )
            vstk = (
                jnp.stack([v[0] for v in vs]),
                jnp.stack([jnp.stack(v[1:-1]) for v in vs], axis=1),
                jnp.stack([v[-1] for v in vs]),
            )
        if sweeps <= 0:
            return PackedTT(fz[0][0], fz[1], fz[2][..., 0]), lam, history
        # one program for the whole sweep loop — no host syncs between
        # sweeps; cap bucketed to powers of two so nearby sweep budgets
        # share a compile
        cap = 1 << max(sweeps - 1, 1).bit_length()
        z0, Vm, vlq, rec = _eig_loop_fused(
            *fz, a0f, amf, alf, mstk, vstk, shift_d,
            jnp.asarray(sweeps, jnp.int32), jnp.asarray(tol, dt),
            cap=cap, dense_limit=int(dense_limit),
            lanczos_iters=int(lanczos_iters),
        )
        rec = np.asarray(rec)  # ONE host fetch for the whole loop
        n_done = int(rec[-1])
        history = [float(v) for v in rec[: 2 * n_done]]
        if history:
            lam = history[-1]
        x = PackedTT(z0[0], Vm, vlq[..., 0])
        return x, lam, history

    def local_pens(lbs_k, rbs_k, k):
        if not vs:
            m = xs[k].size
            return jnp.zeros((0, m), dt)
        if ms_ is not None:
            return jnp.stack(
                [
                    _local_mb(
                        lbs_k[j], ms_[k], rbs_k[j], vs[j][k]
                    ).reshape(-1)
                    for j in range(len(vs))
                ]
            )
        return jnp.stack(
            [
                _local_rhs(lbs_k[j], vs[j][k], rbs_k[j]).reshape(-1)
                for j in range(len(vs))
            ]
        )

    use_mass = ms_ is not None
    pen0 = one3 if use_mass else one2

    def pen_adv_l(env, k, j):
        if use_mass:
            return _adv_left_mb(env, xs[k], ms_[k], vs[j][k])
        return _adv_left_b(env, xs[k], vs[j][k])

    def pen_adv_r(env, k, j):
        if use_mass:
            return _adv_right_mb(env, xs[k], ms_[k], vs[j][k])
        return _adv_right_b(env, xs[k], vs[j][k])

    def solve_local(k, L, R, Lg_or_Lm, Rg_or_Rm, pens):
        if use_mass:
            return _local_ground_state_mass(
                L, as_[k], R, Lg_or_Lm, ms_[k], Rg_or_Rm, pens, shift_d
            )
        if xs[k].size > dense_limit:
            return _local_ground_state_lanczos(
                L, as_[k], R, Lg_or_Lm, Rg_or_Rm, pens, shift_d,
                int(lanczos_iters), warm=xs[k],
            )
        return _local_ground_state(
            L, as_[k], R, Lg_or_Lm, Rg_or_Rm, pens, shift_d
        )

    g0 = one3 if use_mass else one2  # metric env seed

    def metric_adv_l(env, k):
        if use_mass:
            return _adv_left(env, xs[k], ms_[k])
        return _adv_left_g(env, xs[k])

    def metric_adv_r(env, k):
        if use_mass:
            return _adv_right(env, xs[k], ms_[k])
        return _adv_right_g(env, xs[k])

    rev_rs, rev_rgs = [one3], [g0]
    rev_rbs = [[pen0] for _ in vs]
    for k in range(d - 1, 0, -1):
        rev_rs.append(_adv_right(rev_rs[-1], xs[k], as_[k]))
        rev_rgs.append(metric_adv_r(rev_rgs[-1], k))
        for j in range(len(vs)):
            rev_rbs[j].append(pen_adv_r(rev_rbs[j][-1], k, j))

    for _sweep in range(sweeps):
        rs, rgs = rev_rs[::-1], rev_rgs[::-1]
        rbs = [e[::-1] for e in rev_rbs]

        ls, lgs = [one3], [g0]
        lbs = [[pen0] for _ in vs]
        for k in range(d):
            pens = local_pens(
                [lbs[j][-1] for j in range(len(vs))],
                [rbs[j][k] for j in range(len(vs))],
                k,
            )
            lam_k, vec = solve_local(k, ls[-1], rs[k], lgs[-1], rgs[k],
                                     pens)
            xs[k] = vec.reshape(xs[k].shape)
            if k < d - 1:
                xs[k] = _left_orth(xs[k])
                ls.append(_adv_left(ls[-1], xs[k], as_[k]))
                lgs.append(metric_adv_l(lgs[-1], k))
                for j in range(len(vs)):
                    lbs[j].append(pen_adv_l(lbs[j][-1], k, j))
        history.append(float(lam_k))

        rev_rs, rev_rgs = [one3], [g0]
        rev_rbs = [[pen0] for _ in vs]
        for k in range(d - 1, -1, -1):
            pens = local_pens(
                [lbs[j][k] for j in range(len(vs))],
                [rev_rbs[j][-1] for j in range(len(vs))],
                k,
            )
            lam_k, vec = solve_local(k, ls[k], rev_rs[-1], lgs[k],
                                     rev_rgs[-1], pens)
            xs[k] = vec.reshape(xs[k].shape)
            if k > 0:
                xs[k] = _right_orth(xs[k])
                rev_rs.append(_adv_right(rev_rs[-1], xs[k], as_[k]))
                rev_rgs.append(metric_adv_r(rev_rgs[-1], k))
                for j in range(len(vs)):
                    rev_rbs[j].append(pen_adv_r(rev_rbs[j][-1], k, j))
        new_lam = float(lam_k)
        history.append(new_lam)
        if abs(lam - new_lam) <= tol * max(abs(new_lam), 1e-300):
            lam = new_lam
            break
        lam = new_lam

    # after the right-to-left pass core 0 is the open core and holds
    # the whole norm; the local eigenvector is unit in the (whitened)
    # metric, so x is unit-norm (M-normalized when mass is given)
    x = PackedTT(xs[0][0], jnp.stack(xs[1:-1]), xs[-1][..., 0])
    return x, lam, history


def als_eigsh_k(
    op: PackedTTOp,
    x0: PackedTT,
    k: int,
    sweeps: int = 10,
    shift: float = None,
    mass: PackedTTOp = None,
    slots: bool = True,
    **kw,
) -> Tuple[List[PackedTT], List[float]]:
    """The ``k`` lowest eigenpairs by sequential penalty deflation.

    Each eigenpair is computed by :func:`als_eigsh` with all previously
    found eigenvectors deflated; the reported eigenvalue is the clean
    Rayleigh quotient ``<v, A v> / <v, M v>`` (penalty leakage
    removed).  Returns ``(vectors, values)`` sorted ascending.

    ``slots`` (default on) fixes the deflation count at ``k - 1`` (+
    caller-supplied trains) from the FIRST eigenpair, filling unfound
    slots with zero trains at a shared rank: a zero train's penalty
    projections are exactly zero (``pw^T pw = 0``, bit-exact), so the
    result is unchanged while every eigenpair reuses ONE fused-sweep
    program shape — k compiles become 1 on a TPU whose remote compiles
    cost minutes.  ``slots=False`` grows the deflation stack per pair
    (one trace per J; marginally fewer FLOPs per sweep on CPU).
    """
    from tensor_networks_tpu.ops.packed import inner, pad_rank

    # compute the default penalty shift ONCE (it involves a QR-sweep
    # norm and, with a mass matrix, a cheap DMRG on M) instead of once
    # per excited state inside als_eigsh
    if k > 1 and shift is None:
        shift = _default_shift(op, x0, mass)

    # merge a caller-supplied deflate (find pairs ABOVE known
    # eigenvectors) with the ones found here
    base_deflate = tuple(kw.pop("deflate", ()))

    nslots = 0
    zero_slot = None
    if slots:
        rv = max([x0.rank] + [v.rank for v in base_deflate])
        base_deflate = tuple(
            pad_rank(v, rv) if v.rank < rv else v for v in base_deflate
        )
        if x0.rank < rv:
            x0 = pad_rank(x0, rv)
        nslots = len(base_deflate) + k - 1
        dtz = x0.first.dtype
        d, n = x0.d, x0.mode
        zero_slot = PackedTT(
            jnp.zeros((n, rv), dtz),
            jnp.zeros((d - 2, rv, n, rv), dtz),
            jnp.zeros((rv, n), dtz),
        )
        if nslots and shift is None:
            # non-empty deflate makes als_eigsh derive a default shift
            # per call; pin it once here instead (zero slots need no
            # penalty, but the shape-stable path still passes one)
            shift = _default_shift(op, x0, mass)

    found: List[PackedTT] = []
    vals: List[float] = []
    for _ in range(k):
        defl = base_deflate + tuple(found)
        if slots and len(defl) < nslots:
            defl = defl + (zero_slot,) * (nslots - len(defl))
        v, _, _ = als_eigsh(
            op, x0, sweeps=sweeps,
            deflate=defl, shift=shift,
            mass=mass, **kw,
        )
        denom = float(
            inner(v, ttop_apply_packed(mass, v))
            if mass is not None
            else inner(v, v)
        )
        lam = float(inner(v, ttop_apply_packed(op, v))) / denom
        found.append(v)
        vals.append(lam)
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    return [found[i] for i in order], [vals[i] for i in order]


def als_eigsh_adaptive(
    op: PackedTTOp,
    x0: PackedTT,
    eps: float = 1e-8,
    max_rank: int = None,
    sweeps_per_rank: int = 4,
    enrich: bool = True,
    mass: PackedTTOp = None,
    **kw,
) -> Tuple[PackedTT, float, List[float]]:
    """Rank-adaptive smallest eigenpair: run :func:`als_eigsh` at the
    current rank and, while the exact residual (``|A x - lam x|``, or
    ``|A x - lam M x|`` for a generalized problem) stays above
    ``eps * |lam|``, double the rank up to ``max_rank``.

    With ``enrich=True`` the new bond directions span the eps-rounded
    eigen-residual train (coefficient zero — the AMEn move of
    :func:`als.als_solve_adaptive` applied to the eigenproblem);
    otherwise inert zero padding.  Returns ``(x, lam, concatenated
    history)``.
    """
    from tensor_networks_tpu.ops.packed import pad_rank

    rank = x0.rank
    ceiling = int(max_rank) if max_rank is not None else 8 * rank
    x = x0
    hist_all: List[float] = []
    while True:
        x, lam, hist = als_eigsh(
            op, x, sweeps=sweeps_per_rank, mass=mass, **kw
        )
        hist_all += hist
        lam_x = (
            scale(x, -lam)
            if mass is None
            else scale(ttop_apply_packed(mass, x), -lam)
        )
        resid_train = add(ttop_apply_packed(op, x), lam_x)
        resid = float(norm_exact(resid_train))
        if resid <= eps * max(abs(lam), 1e-300) or rank >= ceiling:
            return x, lam, hist_all
        new_rank = min(2 * rank, ceiling)
        kick = new_rank - x.rank
        if enrich and kick > 0:
            x = _enrich_span(x, resid_train, kick)
        else:
            x = pad_rank(x, new_rank)
        rank = new_rank
