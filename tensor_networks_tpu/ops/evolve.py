"""Time integration for TT/QTT states.

Two integrators for ``M du/dt = -A u`` in TT format:

* :func:`evolve_theta` — the one-parameter theta family

      (M + theta dt A) u_{n+1} = (M - (1 - theta) dt A) u_n

  (``theta=1`` implicit Euler, L-stable; ``theta=0.5`` Crank-Nicolson,
  second order).  Both step operators are assembled once with the
  packed operator algebra and every step is one :func:`ops.als.als_solve`
  warm-started from the previous state, so steps typically converge in
  1-2 sweeps through already-compiled executables.

* :func:`evolve_tdvp2` — the two-site variant: each ADJACENT PAIR of
  cores is merged, evolved exactly, and re-split by a truncated SVD,
  so bond ranks GROW toward the dynamics (up to a static ``max_rank``)
  instead of being frozen by the initial state.  The compute shapes
  stay static at ``max_rank`` — the TPU-native form of adaptivity:
  rank growth costs zero recompiles, and the split reports effective
  ranks for observability.  Like the other members of the family it
  runs each step (whole trajectories, when unobserved) as ONE jitted
  program by default.

* :func:`evolve_tdvp` — the one-site projector-splitting integrator
  (TDVP / KSL, Lubich-Oseledets): instead of solving a linear system
  per step, each core is evolved EXACTLY under its projected effective
  operator (matrix exponential) and each bond factor backward — the
  splitting of the tangent-space projector.  Second order (symmetric
  two-half-sweep form), unconditionally stable, exactly
  rank-preserving by construction, and EXACT whenever the true
  solution stays on the rank manifold.  Local exponentials run dense
  (``jax.scipy.linalg.expm``) below ``dense_limit`` unknowns and by a
  jitted Lanczos ``expm @ v`` above it (symmetric ``A`` assumed, the
  TDVP regime) — all static shapes, so one problem size compiles once
  for the whole trajectory.

No reference counterpart (``pytens`` has no time integration).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensor_networks_tpu.ops.als import (
    _adv_left,
    _adv_right,
    _local_dense,
    _matvec,
    als_solve,
)
from tensor_networks_tpu.ops.packed import (
    PackedTT,
    PackedTTOp,
    add,
    norm_exact,
    pad_rank,
    scale,
    svd_round,
    ttop_add,
    ttop_apply_packed,
    ttop_identity,
    ttop_round,
    ttop_scale,
)

__all__ = [
    "evolve_theta",
    "evolve_tdvp",
    "evolve_tdvp2",
    "tdvp_trajectory",
]


def evolve_theta(
    A: PackedTTOp,
    u0: PackedTT,
    dt: float,
    steps: int,
    theta: float = 1.0,
    mass: PackedTTOp = None,
    source=None,
    rank: int = None,
    sweeps: int = 4,
    tol: float = 1e-10,
    op_eps: float = 1e-13,
    callback: Optional[Callable[[int, PackedTT], None]] = None,
    observables: Tuple[PackedTTOp, ...] = (),
    **solve_kw,
) -> Tuple[PackedTT, List[float]]:
    """Integrate ``M du/dt = -A u + f`` for ``steps`` steps of size ``dt``.

    Returns ``(u_final, residuals)`` with one ALS residual per step.
    ``source`` is the forcing ``f``: a :class:`PackedTT` for a constant
    source, or a callable ``t -> PackedTT`` evaluated at the theta
    quadrature points (``dt (theta f(t_{n+1}) + (1-theta) f(t_n))``
    joins the right-hand side each step; a callable with constant bond
    rank keeps every shape in the loop static).  ``rank`` bounds the
    solution rank (default: ``u0``'s rank); the right-hand side
    ``(M - (1-theta) dt A) u_n [+ source]`` is rounded back to it each
    step, so every shape in the loop is static.  ``callback(n, u)``
    observes the trajectory.  ``observables``: TT-operators whose raw
    expectations ``<u, O u>`` are recorded after every step (same
    convention as :func:`evolve_tdvp`); when given, the return gains a
    third element with the per-step value tuples.  Extra keyword
    arguments reach :func:`als_solve` (e.g. ``spd=True`` for symmetric
    ``A``/``M`` — the step operator of a parabolic problem is SPD).
    """
    if not 0.0 <= theta <= 1.0:
        raise ValueError(f"theta must be in [0, 1], got {theta}")
    if theta == 0.0:
        raise ValueError(
            "theta=0 (explicit Euler) needs no solver — apply "
            "ttop_add(M_inv-weighted ...) directly; this integrator "
            "covers the implicit family theta in (0, 1]"
        )
    d, n = u0.d, u0.mode
    M = mass if mass is not None else ttop_identity(d, n, u0.first.dtype)
    lhs = ttop_round(ttop_add(M, ttop_scale(A, theta * dt)), op_eps)
    if theta < 1.0:
        rhs_op = ttop_round(
            ttop_add(M, ttop_scale(A, -(1.0 - theta) * dt)), op_eps
        )
    else:
        rhs_op = M
    rank = int(rank) if rank is not None else u0.rank

    g_const = None
    if source is not None and not callable(source):
        # constant f: theta dt f + (1-theta) dt f = dt f
        g_const = scale(source, dt)

    # theta=1 with no mass makes the RHS operator the bare identity:
    # applying it (and re-rounding the result) would burn a full
    # operator apply + d-core sweep per step to reproduce u
    identity_rhs = mass is None and theta == 1.0

    u = svd_round(u0, rank) if u0.rank != rank else u0
    residuals: List[float] = []
    obs: List[Tuple[float, ...]] = []
    for step in range(steps):
        b = u if identity_rhs else ttop_apply_packed(rhs_op, u)
        if source is not None:
            if g_const is not None:
                g = g_const
            else:
                f1 = scale(source((step + 1) * dt), theta * dt)
                if theta < 1.0:
                    g = add(
                        f1, scale(source(step * dt), (1.0 - theta) * dt)
                    )
                else:
                    g = f1
            b = add(b, g)
        if b is not u:
            b = svd_round(b, rank)
        u, res, _ = als_solve(
            lhs, b, u, sweeps=sweeps,
            tol=tol * float(norm_exact(b)), **solve_kw,
        )
        residuals.append(res)
        if observables:
            obs.append(_obs_host(observables, u))
        if callback is not None:
            callback(step, u)
    if observables:
        return u, residuals, obs
    return u, residuals


# -- TDVP (one-site projector splitting) -----------------------------------------
# Index conventions follow ops.als: ket core (a, j, b); operator core
# (s, i, j, t); left env L (p, s, a); right env R (q, t, c).  The bond
# (zero-site) effective operator between adjacent cores contracts the
# two environments over the shared operator bond.


@jax.jit
def _bond_dense(L, R):
    K = jnp.einsum("psa,qsc->pqac", L, R, precision="highest")
    m = K.shape[0] * K.shape[1]
    return K.reshape(m, m)


def _bond_mv(operands, v):
    L, R = operands
    t = jnp.einsum("psa,ac->psc", L, v, precision="highest")
    return jnp.einsum("psc,qsc->pq", t, R, precision="highest")


def _site_mv(operands, v):
    L, ak, R = operands
    return _matvec(L, ak, R, v)


@jax.jit
def _expm_apply_dense(H, v, coef):
    E = jax.scipy.linalg.expm(coef * H)
    return (E @ v.reshape(-1)).reshape(v.shape)


@partial(jax.jit, static_argnames=("mv", "kdim"))
def _lanczos_expm_apply(mv, operands, v, coef, kdim):
    """``expm(coef * H) @ v`` from a ``kdim``-step Lanczos space.

    ``H`` is the SYMMETRIC operator ``x -> mv(operands, x)``.  Fully
    reorthogonalized (kdim is small); on breakdown (the Krylov space
    closes) the off-diagonal is zeroed, which makes the small
    exponential exact on the closed subspace.
    """
    dt = v.dtype
    shape, m = v.shape, v.size
    eps = jnp.asarray(np.finfo(np.dtype(dt)).eps, dt)
    v0 = v.reshape(-1)
    nrm = jnp.linalg.norm(v0)
    safe = jnp.maximum(nrm, jnp.asarray(1e-300 if dt == jnp.float64 else 1e-30, dt))
    q0 = v0 / safe

    # derive the zero initializers from v so they inherit its
    # varying-axes type under shard_map (fresh zeros would make the
    # scan carry types mismatch inside the sharded TDVP sweep)
    V0 = jnp.broadcast_to(v0 * 0.0, (kdim, m))

    def body(carry, j):
        V, q, q_prev, beta_prev = carry
        V = V.at[j].set(q)
        w = mv(operands, q.reshape(shape)).reshape(-1)
        alpha = w @ q
        w = w - alpha * q - beta_prev * q_prev
        w = w - V.T @ (V @ w)  # rows > j are zero: reorth is exact
        beta = jnp.linalg.norm(w)
        ok = beta > 100.0 * eps * jnp.maximum(jnp.abs(alpha), 1.0)
        q_next = jnp.where(
            ok, w / jnp.maximum(beta, eps * eps), jnp.zeros_like(w)
        )
        beta = jnp.where(ok, beta, jnp.zeros_like(beta))
        return (V, q_next, q, beta), (alpha, beta)

    (V, _, _, _), (alphas, betas) = jax.lax.scan(
        body, (V0, q0, jnp.zeros_like(q0), v0[0] * 0.0),
        jnp.arange(kdim),
    )
    T = (
        jnp.diag(alphas)
        + jnp.diag(betas[:-1], 1)
        + jnp.diag(betas[:-1], -1)
    )
    E = jax.scipy.linalg.expm(coef * T)
    return (nrm * (V.T @ E[:, 0])).reshape(shape)


def _site_evolve(L, ak, R, v, coef, dense_limit, kdim):
    if v.size <= dense_limit:
        return _expm_apply_dense(_local_dense(L, ak, R), v, coef)
    return _lanczos_expm_apply(_site_mv, (L, ak, R), v, coef, kdim)


def _bond_evolve(L, R, s, coef, dense_limit, kdim):
    if s.size <= dense_limit:
        return _expm_apply_dense(_bond_dense(L, R), s, coef)
    return _lanczos_expm_apply(_bond_mv, (L, R), s, coef, kdim)


@jax.jit
def _split_left(core):
    """``core = Q S`` with Q left-orthogonal; zero-padded if deficient."""
    r1, n, r2 = core.shape
    q, smat = jnp.linalg.qr(core.reshape(r1 * n, r2))
    if q.shape[1] < r2:
        smat = jnp.pad(smat, ((0, r2 - q.shape[1]), (0, 0)))
        q = jnp.pad(q, ((0, 0), (0, r2 - q.shape[1])))
    return q.reshape(r1, n, r2), smat


@jax.jit
def _split_right(core):
    """``core = S Q`` with Q right-orthogonal; zero-padded if deficient."""
    r1, n, r2 = core.shape
    q, rmat = jnp.linalg.qr(core.reshape(r1, n * r2).T)
    if q.shape[1] < r1:
        rmat = jnp.pad(rmat, ((0, r1 - q.shape[1]), (0, 0)))
        q = jnp.pad(q, ((0, 0), (0, r1 - q.shape[1])))
    return q.T.reshape(r1, n, r2), rmat.T


def _unpack_state(u0: PackedTT) -> List[jnp.ndarray]:
    """Core list with explicit boundary bonds: (1,n,r), (r,n,r)*, (r,n,1)."""
    return [u0.first[None]] + list(u0.mids) + [u0.last[..., None]]


def _unpack_op(A: PackedTTOp, dtp) -> List[jnp.ndarray]:
    return (
        [A.first[None].astype(dtp)]
        + list(A.mids.astype(dtp))
        + [A.last[..., None].astype(dtp)]
    )


def _right_canonicalize(xs: List[jnp.ndarray]) -> None:
    """In-place right-to-left QR gauge; the represented state is unchanged
    (each R factor folds into the left neighbor)."""
    for k in range(len(xs) - 1, 0, -1):
        xs[k], rmat = _split_right(xs[k])
        xs[k - 1] = jnp.einsum(
            "anb,bc->anc", xs[k - 1], rmat, precision="highest"
        )


def _repack(xs: List[jnp.ndarray]) -> PackedTT:
    if len(xs) > 2:
        mids = jnp.stack(xs[1:-1])
    else:  # d=2: no mid cores — (0, r, n, r) placeholder
        _, n, r = xs[0].shape
        mids = jnp.zeros((0, r, n, r), xs[0].dtype)
    return PackedTT(xs[0][0], mids, xs[-1][..., 0])


def _right_envs(xs, as_, one3) -> List[jnp.ndarray]:
    """Reversed right-environment prefixes: ``[I, env(d-1), ..., env(d-1..1)]``."""
    rev_rs = [one3]
    for k in range(len(xs) - 1, 0, -1):
        rev_rs.append(_adv_right(rev_rs[-1], xs[k], as_[k]))
    return rev_rs


def _sandwich_fused(x0, X, xl, o0, Om, ol):
    """``<x, O x>`` on the stacked layout — one left-env scan over the
    train (the observable hook of the fused trajectories)."""
    one3 = jnp.ones((1, 1, 1), x0.dtype)
    env = _adv_left(one3, x0, o0)

    def body(L, inp):
        xk, ok = inp
        return _adv_left(L, xk, ok), None

    env, _ = jax.lax.scan(body, env, (X, Om))
    env = _adv_left(env, xl, ol)
    return env[0, 0, 0]


def _obs_stacks(observables, dtp):
    """Per-observable stacked cores ``(o0, Om, ol)`` for the fused paths."""
    return tuple(
        (
            o.first[None].astype(dtp),
            o.mids.astype(dtp),
            o.last[..., None].astype(dtp),
        )
        for o in observables
    )


def _obs_host(observables, u: PackedTT) -> Tuple[float, ...]:
    """Host-path observable values ``<u, O u>`` (parity with the fused
    hook at roundoff)."""
    from tensor_networks_tpu.ops.packed import inner

    return tuple(
        float(inner(u, ttop_apply_packed(o, u))) for o in observables
    )


def evolve_tdvp(
    A: PackedTTOp,
    u0: PackedTT,
    dt: float,
    steps: int,
    krylov: int = 24,
    dense_limit: int = 1024,
    callback: Optional[Callable[[int, PackedTT], None]] = None,
    fused: Optional[bool] = None,
    observables: Tuple[PackedTTOp, ...] = (),
) -> Tuple[PackedTT, List[float]]:
    """Integrate ``du/dt = -A u`` by one-site projector-splitting TDVP.

    ``A`` must be symmetric (the Lanczos local exponentials assume it;
    below ``dense_limit`` local unknowns the dense path tolerates any
    ``A``).  Every step is two half-sweeps of exact local exponentials
    — no linear solves, no rank rounding: the bond ranks of ``u0`` are
    preserved by construction, and the integrator is exact whenever
    the true solution stays on that rank manifold (the
    Lubich-Oseledets exactness property).  Returns ``(u_final,
    norms)`` with the state norm after each step (free: after the
    backward half-sweep all mass sits in the first core).

    ``krylov`` bounds the Lanczos space of the large local
    exponentials; 20-30 is plenty for the dt*||A|| regimes where TDVP
    makes sense.  ``callback(n, u)`` observes the trajectory.

    ``fused`` (default on) runs each step — the whole trajectory, when
    no callback observes it — as ONE jitted program (boundary cores
    explicit, mid cores as ``lax.scan`` sweeps; arithmetic identical to
    the host-loop form, which ``fused=False`` keeps for debugging).
    Through a ~25 ms/dispatch TPU relay this is the difference between
    ~6 d dispatches per step and one per trajectory.

    ``observables``: TT-operators ``O`` whose raw expectations
    ``<u, O u>`` are recorded after every step — INSIDE the fused
    trajectory program (one extra env scan each per step), so tracking
    e.g. the energy costs no callback round-trips.  When given, the
    return gains a third element: a list of per-step value tuples.
    """
    if fused is None:
        fused = True
    if fused:
        dtp = u0.first.dtype
        x0, X, xl, a0, Am, al = _fused_operands(A, u0)
        h = jnp.asarray(float(dt), dtp)
        obs_stk = _obs_stacks(observables, dtp)
        if callback is None:
            x0, X, xl, norms_dev, obs_dev = _tdvp_traj_fused(
                x0, X, xl, a0, Am, al, h, obs_stk,
                steps, dense_limit, krylov,
            )
            norms = [float(v) for v in np.asarray(norms_dev)]
            u = PackedTT(x0[0], X, xl[..., 0])
            if observables:
                obs = [tuple(row) for row in np.asarray(obs_dev).tolist()]
                return u, norms, obs
            return u, norms
        norms = []
        obs: List[Tuple[float, ...]] = []
        for step in range(steps):
            x0, X, xl = _tdvp_step_fused(
                x0, X, xl, a0, Am, al, h, dense_limit, krylov
            )
            norms.append(float(jnp.linalg.norm(x0)))
            if observables:
                obs.append(tuple(
                    float(_sandwich_jit(x0, X, xl, *stk))
                    for stk in obs_stk
                ))
            callback(step, PackedTT(x0[0], X, xl[..., 0]))
        u = PackedTT(x0[0], X, xl[..., 0])
        return (u, norms, obs) if observables else (u, norms)
    dtp = u0.first.dtype
    xs = _unpack_state(u0)
    as_ = _unpack_op(A, dtp)
    d = len(xs)
    h = float(dt)

    _right_canonicalize(xs)

    one3 = jnp.ones((1, 1, 1), dtp)
    norms: List[float] = []
    obs: List[Tuple[float, ...]] = []
    # the backward half-sweep of each step leaves exactly the right-env
    # chain the next forward pass needs (cores k..d-1 are final and
    # right-canonical when env k is recorded), so it is built once here
    # and thereafter reused across steps
    rev_rs = _right_envs(xs, as_, one3)

    for step in range(steps):
        rs = rev_rs[::-1]

        # left -> right half step: site forward h/2, bond backward h/2
        ls = [one3]
        for k in range(d):
            xs[k] = _site_evolve(
                ls[-1], as_[k], rs[k], xs[k], -0.5 * h, dense_limit, krylov
            )
            if k < d - 1:
                xs[k], smat = _split_left(xs[k])
                ls.append(_adv_left(ls[-1], xs[k], as_[k]))
                smat = _bond_evolve(
                    ls[-1], rs[k], smat, +0.5 * h, dense_limit, krylov
                )
                xs[k + 1] = jnp.einsum(
                    "ab,bnc->anc", smat, xs[k + 1], precision="highest"
                )

        # right -> left half step (mirror)
        rev_rs = [one3]
        for k in range(d - 1, -1, -1):
            xs[k] = _site_evolve(
                ls[k], as_[k], rev_rs[-1], xs[k], -0.5 * h,
                dense_limit, krylov,
            )
            if k > 0:
                xs[k], smat = _split_right(xs[k])
                rev_rs.append(_adv_right(rev_rs[-1], xs[k], as_[k]))
                smat = _bond_evolve(
                    ls[k], rev_rs[-1], smat, +0.5 * h, dense_limit, krylov
                )
                xs[k - 1] = jnp.einsum(
                    "anb,bc->anc", xs[k - 1], smat, precision="highest"
                )

        norms.append(float(jnp.linalg.norm(xs[0])))
        if observables:
            obs.append(_obs_host(observables, _repack(xs)))
        if callback is not None:
            callback(step, _repack(xs))

    if observables:
        return _repack(xs), norms, obs
    return _repack(xs), norms


# -- fused one-site TDVP ------------------------------------------------------------
# The host-loop form above dispatches ~6 d kernels per step (site/bond
# exponentials, QR splits, env advances) — seconds per step through a
# ~25 ms/dispatch TPU relay at QTT depths.  Packed trains are uniform
# (mid cores (r, n, r), operator mids (s, n, n, s)), so the whole
# symmetric step fuses into ONE program: boundary cores explicit, mid
# cores as lax.scan sweeps, all static shapes.  Arithmetic is identical
# to the host loop call for call (pinned by parity tests at 1e-12), so
# the dense/Lanczos decision rule is shared too.
#
# The scan bodies are module-level builders (not closures of the step)
# so the DISTRIBUTED step (parallel/evolve.py) runs the SAME arithmetic
# by construction — its per-device scans import these.


def _tdvp_renv_body(R, inp):
    """Right-env scan body, emitting the PRE-absorb env at each core."""
    xk, ak = inp
    return _adv_right(R, xk, ak), R


def _tdvp_fwd_body_of(h, dense_limit, kdim):
    """Forward mid-core half-sweep body: absorb the bond factor, evolve
    the site forward, split left, evolve the new bond backward.  Emits
    (orthogonal core, PRE-update left env — the backward sweep's ls[k])."""

    def fwd_body(carry, inp):
        L, s = carry
        xk, ak, Rk = inp
        zk = jnp.einsum("ab,bnc->anc", s, xk, precision="highest")
        zk = _site_evolve(L, ak, Rk, zk, -0.5 * h, dense_limit, kdim)
        q, s2 = _split_left(zk)
        Ln = _adv_left(L, q, ak)
        s2 = _bond_evolve(Ln, Rk, s2, +0.5 * h, dense_limit, kdim)
        return (Ln, s2), (q, L)

    return fwd_body


def _tdvp_bwd_body_of(h, dense_limit, kdim):
    """Backward mid-core half-sweep body (mirror of the forward one)."""

    def bwd_body(carry, inp):
        R, s = carry
        qk, ak, Lk = inp
        zk = jnp.einsum("anb,bc->anc", qk, s, precision="highest")
        zk = _site_evolve(Lk, ak, R, zk, -0.5 * h, dense_limit, kdim)
        vk, s2 = _split_right(zk)
        Rn = _adv_right(R, vk, ak)
        s2 = _bond_evolve(Lk, Rn, s2, +0.5 * h, dense_limit, kdim)
        return (Rn, s2), vk

    return bwd_body


def _tdvp_step_impl(x0, X, xl, a0, Am, al, h, dense_limit, kdim):
    """One symmetric one-site TDVP step; inputs right-canonical.

    ``x0 (1, n, r)``, ``X (m, r, n, r)``, ``xl (r, n, 1)``; operator
    cores ``a0 (1, n, n, s)``, ``Am (m, s, n, n, s)``, ``al (s, n, n, 1)``.
    Returns the same layout, right-canonical again.
    """
    dtp = x0.dtype
    one3 = jnp.ones((1, 1, 1), dtp)

    # right-env chain (rs[k] = env of cores k+1..d-1): emit the carry
    # BEFORE absorbing mid j, so Rs_mid[j] is exactly what mid j needs
    r_last = _adv_right(one3, xl, al)

    r_front, rs_rev = jax.lax.scan(
        _tdvp_renv_body, r_last, (X[::-1], Am[::-1])
    )
    rs_mid = rs_rev[::-1]

    # forward half-sweep: core 0 explicit, mids as one scan
    z = _site_evolve(one3, a0, r_front, x0, -0.5 * h, dense_limit, kdim)
    x0q, smat = _split_left(z)
    lenv = _adv_left(one3, x0q, a0)
    smat = _bond_evolve(lenv, r_front, smat, +0.5 * h, dense_limit, kdim)

    (l_back, smat), (Q, ls_mid) = jax.lax.scan(
        _tdvp_fwd_body_of(h, dense_limit, kdim), (lenv, smat),
        (X, Am, rs_mid),
    )

    zl = jnp.einsum("ab,bnc->anc", smat, xl, precision="highest")
    zl = _site_evolve(l_back, al, one3, zl, -0.5 * h, dense_limit, kdim)

    # backward half-sweep (mirror): last core explicit, mids reversed
    zl = _site_evolve(l_back, al, one3, zl, -0.5 * h, dense_limit, kdim)
    xlq, smat = _split_right(zl)
    renv = _adv_right(one3, xlq, al)
    smat = _bond_evolve(l_back, renv, smat, +0.5 * h, dense_limit, kdim)

    (r_back, smat), v_rev = jax.lax.scan(
        _tdvp_bwd_body_of(h, dense_limit, kdim), (renv, smat),
        (Q[::-1], Am[::-1], ls_mid[::-1]),
    )
    V = v_rev[::-1]

    z0 = jnp.einsum("anb,bc->anc", x0q, smat, precision="highest")
    z0 = _site_evolve(one3, a0, r_back, z0, -0.5 * h, dense_limit, kdim)
    return z0, V, xlq


_tdvp_step_fused = jax.jit(
    _tdvp_step_impl, static_argnames=("dense_limit", "kdim")
)


_sandwich_jit = jax.jit(_sandwich_fused)


@partial(jax.jit, static_argnames=("steps", "dense_limit", "kdim"))
def _tdvp_traj_fused(
    x0, X, xl, a0, Am, al, h, obs_stk, steps, dense_limit, kdim
):
    """A whole TDVP trajectory as one XLA program (scan over steps).

    ``obs_stk``: stacked observable cores; each contributes one
    ``<u, O u>`` env scan per step, emitted alongside the norm."""

    def body(carry, _):
        c0, cm, cl = carry
        c0, cm, cl = _tdvp_step_impl(
            c0, cm, cl, a0, Am, al, h, dense_limit, kdim
        )
        vals = jnp.stack(
            [_sandwich_fused(c0, cm, cl, *stk) for stk in obs_stk]
        ) if obs_stk else jnp.zeros((0,), c0.dtype)
        return (c0, cm, cl), (jnp.linalg.norm(c0), vals)

    (x0, X, xl), (norms, obs) = jax.lax.scan(
        body, (x0, X, xl), None, length=steps
    )
    return x0, X, xl, norms, obs


def tdvp_trajectory(
    A: PackedTTOp,
    u0: PackedTT,
    dt,
    steps: int,
    observables: Tuple[PackedTTOp, ...] = (),
    krylov: int = 24,
    dense_limit: int = 1024,
) -> Tuple[PackedTT, jnp.ndarray, jnp.ndarray]:
    """The fused one-site TDVP trajectory as a PURE TRACED function.

    Same integrator as :func:`evolve_tdvp` (fused path), but nothing
    is fetched to the host: returns ``(u_final, norms (steps,),
    obs (steps, n_obs))`` as device arrays, so the whole trajectory
    composes with jax transforms — in particular it is
    DIFFERENTIABLE: reverse-mode gradients w.r.t. the operator cores,
    the initial state, and ``dt`` flow through the scan-of-steps
    (adjoint sensitivities for parameter fitting / optimal control;
    validated against central finite differences at ~5e-9 rel).

    Caveats: ``A`` symmetric (the TDVP regime); for reverse mode every
    bond rank must not exceed the mode product on either side — the QR
    pullback is unimplemented for wide matrices, so OVERPARAMETERIZED
    (padded) trains raise under ``jax.grad``.
    """
    dtp = u0.first.dtype
    x0, X, xl, a0, Am, al = _fused_operands(A, u0)
    x0, X, xl, norms, obs = _tdvp_traj_fused(
        x0, X, xl, a0, Am, al, jnp.asarray(dt, dtp),
        _obs_stacks(observables, dtp),
        steps, dense_limit, krylov,
    )
    return PackedTT(x0[0], X, xl[..., 0]), norms, obs


def _fused_operands(A, u0):
    """Right-canonicalized stacked state + operator stacks for the fused path."""
    dtp = u0.first.dtype
    xs = _unpack_state(u0)
    _right_canonicalize(xs)
    x0, xl = xs[0], xs[-1]
    X = jnp.stack(xs[1:-1]) if len(xs) > 2 else u0.mids.astype(dtp)
    a0 = A.first[None].astype(dtp)
    Am = A.mids.astype(dtp)
    al = A.last[..., None].astype(dtp)
    return x0, X, xl, a0, Am, al


# -- two-site TDVP (rank-adaptive up to a static max_rank) -------------------------
# Two-site block theta (a, j, l, c); operator pair a1 (s, i, j, m),
# a2 (m, k, l, t); environments L (p, s, a) / R (q, t, c).


@jax.jit
def _theta2_dense(L, a1, a2, R):
    h1 = jnp.einsum("psa,sijm->paijm", L, a1, precision="highest")
    h2 = jnp.einsum("paijm,mklt->paijklt", h1, a2, precision="highest")
    H = jnp.einsum("paijklt,qtc->pikqajlc", h2, R, precision="highest")
    m = H.shape[0] * H.shape[1] * H.shape[2] * H.shape[3]
    return H.reshape(m, m)


def _theta2_mv(operands, v):
    L, a1, a2, R = operands
    v1 = jnp.einsum("psa,ajlc->psjlc", L, v, precision="highest")
    v2 = jnp.einsum("psjlc,sijm->pimlc", v1, a1, precision="highest")
    v3 = jnp.einsum("pimlc,mklt->piktc", v2, a2, precision="highest")
    return jnp.einsum("piktc,qtc->pikq", v3, R, precision="highest")


def _theta_evolve(L, a1, a2, R, theta, coef, dense_limit, kdim):
    if theta.size <= dense_limit:
        return _expm_apply_dense(_theta2_dense(L, a1, a2, R), theta, coef)
    return _lanczos_expm_apply(_theta2_mv, (L, a1, a2, R), theta, coef, kdim)


@partial(jax.jit, static_argnames=("rank",))
def _split_theta(theta, rank, eps):
    """Truncated SVD of a two-site block at STATIC output rank.

    Keeps the top ``rank`` singular triplets (zero-padded when the
    block is thinner than ``rank``), zeroes singular values below
    ``eps * ||s||`` (numerical hygiene — the compute stays static), and
    reports the effective rank.  Returns ``(u3, s, v3, keff)`` with
    ``u3 (a, n1, rank)`` column-orthonormal and ``v3 (rank, n2, c)``
    row-orthonormal; the caller folds ``s`` into whichever side the
    sweep direction requires.
    """
    a, n1, n2, c = theta.shape
    u, s, vt = jnp.linalg.svd(
        theta.reshape(a * n1, n2 * c), full_matrices=False
    )
    keep = s > eps * jnp.linalg.norm(s)
    keff = jnp.sum(keep.astype(jnp.int32))
    s = jnp.where(keep, s, jnp.zeros_like(s))
    k = s.shape[0]
    if k >= rank:
        u, s, vt = u[:, :rank], s[:rank], vt[:rank]
    else:
        u = jnp.pad(u, ((0, 0), (0, rank - k)))
        s = jnp.pad(s, ((0, rank - k),))
        vt = jnp.pad(vt, ((0, rank - k), (0, 0)))
    return (
        u.reshape(a, n1, rank),
        s,
        vt.reshape(rank, n2, c),
        jnp.minimum(keff, rank),
    )


@jax.jit
def _merge2(x1, x2):
    return jnp.einsum("ajb,blc->ajlc", x1, x2, precision="highest")


def _tdvp2_fwd_body_of(h, eps, dense_limit, kdim, rank):
    """Forward mid-pair half-sweep body: merge the carried (evolved)
    core with the next one, evolve the pair, split at the static rank,
    back-evolve the new bond-carrying core.  The carry is ``(left env,
    evolved core)`` — the working core travels WITH the carry, which is
    what lets the DISTRIBUTED sweep (parallel/evolve.py) stage it with
    one ppermute hop per device boundary.  Emits ``(q, PRE-update env,
    effective rank)``."""

    def fwd_body(carry, inp):
        L, c = carry
        xk1, a1, a2, Rk = inp
        th = _merge2(c, xk1)
        th = _theta_evolve(L, a1, a2, Rk, th, -0.5 * h, dense_limit, kdim)
        q, sk, vk, keff = _split_theta(th, rank, eps)
        Ln = _adv_left(L, q, a1)
        svk = sk[:, None, None] * vk
        svk = _site_evolve(Ln, a2, Rk, svk, +0.5 * h, dense_limit, kdim)
        # emit the PRE-update env: the backward sweep needs ls[k]
        # (cores 0..k-1) at this pair
        return (Ln, svk), (q, L, keff)

    return fwd_body


def _tdvp2_bwd_body_of(h, eps, dense_limit, kdim, rank):
    """Backward mid-pair half-sweep body (mirror of the forward one)."""

    def bwd_body(carry, inp):
        R, c2 = carry
        qk, a1, a2, Lk = inp
        th = _merge2(qk, c2)
        th = _theta_evolve(Lk, a1, a2, R, th, -0.5 * h, dense_limit, kdim)
        uk, sk, vk, keff = _split_theta(th, rank, eps)
        Rn = _adv_right(R, vk, a2)
        usk = uk * sk[None, None, :]
        usk = _site_evolve(Lk, a1, Rn, usk, +0.5 * h, dense_limit, kdim)
        return (Rn, usk), (vk, keff)

    return bwd_body


def _tdvp2_step_impl(x0, X, xl, a0, Am, al, h, eps, dense_limit, kdim, rank):
    """One symmetric two-site TDVP step; inputs right-canonical, d >= 3.

    ``x0 (1, n, r)``, ``X (m, r, n, r)``, ``xl (r, n, 1)`` with
    ``r == rank`` static; operator cores ``a0 (1, n, n, s)``,
    ``Am (m, s, n, n, s)``, ``al (s, n, n, 1)``.  Same layout out,
    right-canonical again, plus the effective bond ranks of all
    ``2 (d-1)`` splits.  Arithmetic is the host loop's call for call
    (three theta shape classes — first/mid/last pair — each sharing
    the host's dense-vs-Lanczos decision rule).
    """
    dtp = x0.dtype
    one3 = jnp.ones((1, 1, 1), dtp)

    # right-env chain: rs_mid[j] = env right of core j+1 (cores j+2..d-1)
    r_last = _adv_right(one3, xl, al)
    _, rs_rev = jax.lax.scan(_tdvp_renv_body, r_last, (X[::-1], Am[::-1]))
    rs_mid = rs_rev[::-1]

    # forward half-sweep: pair (0,1) explicit, pairs (k,k+1) k=1..d-3
    # as one scan, pair (d-2,d-1) explicit
    theta = _merge2(x0, X[0])
    theta = _theta_evolve(
        one3, a0, Am[0], rs_mid[0], theta, -0.5 * h, dense_limit, kdim
    )
    u0q, s, v3, k0 = _split_theta(theta, rank, eps)
    lenv = _adv_left(one3, u0q, a0)
    sv = s[:, None, None] * v3
    sv = _site_evolve(
        lenv, Am[0], rs_mid[0], sv, +0.5 * h, dense_limit, kdim
    )

    (l_back, c), (Q, ls_mid, kf_mid) = jax.lax.scan(
        _tdvp2_fwd_body_of(h, eps, dense_limit, kdim, rank),
        (lenv, sv), (X[1:], Am[:-1], Am[1:], rs_mid[1:])
    )

    theta = _merge2(c, xl)
    theta = _theta_evolve(
        l_back, Am[-1], al, one3, theta, -0.5 * h, dense_limit, kdim
    )
    ulq, s, vl, kl = _split_theta(theta, rank, eps)
    svl = s[:, None, None] * vl  # not back-evolved: the last pair ends
    # the forward half-sweep, and the backward one re-merges it first

    # backward half-sweep (mirror): pair (d-2,d-1) explicit first
    theta = _merge2(ulq, svl)
    theta = _theta_evolve(
        l_back, Am[-1], al, one3, theta, -0.5 * h, dense_limit, kdim
    )
    ub, s, xln, kl2 = _split_theta(theta, rank, eps)
    renv = _adv_right(one3, xln, al)
    us = ub * s[None, None, :]
    us = _site_evolve(l_back, Am[-1], renv, us, +0.5 * h, dense_limit, kdim)

    (r_back, c2), (V_rev, kb_mid) = jax.lax.scan(
        _tdvp2_bwd_body_of(h, eps, dense_limit, kdim, rank),
        (renv, us),
        (Q[::-1], Am[:-1][::-1], Am[1:][::-1], ls_mid[::-1]),
    )

    # final pair (0,1): no backward site evolve on the new first core
    theta = _merge2(u0q, c2)
    theta = _theta_evolve(
        one3, a0, Am[0], r_back, theta, -0.5 * h, dense_limit, kdim
    )
    z0, s, v1, k0b = _split_theta(theta, rank, eps)
    z0 = z0 * s[None, None, :]

    Xn = jnp.concatenate([v1[None], V_rev[::-1]])
    keffs = jnp.concatenate([
        jnp.stack([k0, kl, kl2, k0b]), kf_mid, kb_mid,
    ])
    return z0, Xn, xln, keffs


_tdvp2_step_fused = jax.jit(
    _tdvp2_step_impl, static_argnames=("dense_limit", "kdim", "rank")
)


@partial(
    jax.jit, static_argnames=("steps", "dense_limit", "kdim", "rank")
)
def _tdvp2_traj_fused(
    x0, X, xl, a0, Am, al, h, eps, obs_stk, steps, dense_limit, kdim, rank
):
    """A whole two-site trajectory as one XLA program (scan over steps)."""

    def body(carry, _):
        c0, cm, cl = carry
        c0, cm, cl, keffs = _tdvp2_step_impl(
            c0, cm, cl, a0, Am, al, h, eps, dense_limit, kdim, rank
        )
        vals = jnp.stack(
            [_sandwich_fused(c0, cm, cl, *stk) for stk in obs_stk]
        ) if obs_stk else jnp.zeros((0,), c0.dtype)
        return (c0, cm, cl), (jnp.linalg.norm(c0), jnp.max(keffs), vals)

    (x0, X, xl), (norms, kmax, obs) = jax.lax.scan(
        body, (x0, X, xl), None, length=steps
    )
    return x0, X, xl, norms, kmax, obs


def evolve_tdvp2(
    A: PackedTTOp,
    u0: PackedTT,
    dt: float,
    steps: int,
    max_rank: Optional[int] = None,
    eps: float = 0.0,
    krylov: int = 24,
    dense_limit: int = 4096,
    callback: Optional[Callable[[int, PackedTT], None]] = None,
    fused: Optional[bool] = None,
    observables: Tuple[PackedTTOp, ...] = (),
) -> Tuple[PackedTT, List[float], List[int]]:
    """Integrate ``du/dt = -A u`` by two-site projector-splitting TDVP.

    Like :func:`evolve_tdvp` but each substep evolves a MERGED pair of
    adjacent cores and re-splits it with a truncated SVD, so the bond
    ranks follow the dynamics instead of staying frozen at ``u0``'s —
    the rank-adaptive member of the family.  TPU-native adaptivity:
    every bond is padded to the static ``max_rank`` (default: ``u0``'s
    rank) up front, so growth never changes a shape or triggers a
    recompile; ``eps`` zeroes singular values below ``eps * ||s||`` at
    each split (``0.0`` keeps everything the static rank admits).

    ``A`` must be symmetric above ``dense_limit`` local unknowns (the
    Lanczos exponentials assume it).  Returns ``(u_final, norms,
    ranks)``: the state norm and the maximum effective bond rank seen
    in each step.  Second order in ``dt`` (symmetric half-sweeps); at
    ``max_rank`` large enough to hold the exact solution and
    ``eps=0`` it inherits the one-site exactness property.

    ``fused`` (default on) runs each step — the whole trajectory, when
    no callback observes it — as ONE jitted program (boundary pairs
    explicit, mid pairs as ``lax.scan`` sweeps; arithmetic identical
    to the host-loop form, pinned at roundoff by the parity tests).
    The static-``max_rank`` split makes this possible: rank adaptivity
    lives INSIDE the fused program as masking, not as shape changes.
    The DEFAULT (``fused=None``) falls back to the host loop below
    3 cores (no mid pairs to scan); an explicit ``fused=True`` raises
    there, and ``fused=False`` keeps the host loop for debugging.

    ``observables``: TT-operators whose raw expectations ``<u, O u>``
    are recorded after every step inside the trajectory program (see
    :func:`evolve_tdvp`); when given, the return gains a FOURTH
    element: a list of per-step value tuples.
    """
    if max_rank is None:
        max_rank = u0.rank
    if max_rank > u0.rank:
        u0 = pad_rank(u0, max_rank)
    elif max_rank < u0.rank:
        raise ValueError(
            f"max_rank {max_rank} below the initial rank {u0.rank}; "
            "round u0 first"
        )
    dtp = u0.first.dtype
    if fused is None:
        fused = u0.d >= 3
    elif fused and u0.d < 3:
        raise ValueError(
            "fused two-site TDVP needs >= 3 cores; pass fused=False"
        )
    if fused:
        x0, X, xl, a0, Am, al = _fused_operands(A, u0)
        h = jnp.asarray(float(dt), dtp)
        ej = jnp.asarray(eps, dtp)
        r = int(max_rank)
        obs_stk = _obs_stacks(observables, dtp)
        if callback is None:
            x0, X, xl, norms_dev, kmax_dev, obs_dev = _tdvp2_traj_fused(
                x0, X, xl, a0, Am, al, h, ej, obs_stk, steps,
                dense_limit, krylov, r,
            )
            out = (
                PackedTT(x0[0], X, xl[..., 0]),
                [float(v) for v in np.asarray(norms_dev)],
                [int(v) for v in np.asarray(kmax_dev)],
            )
            if observables:
                obs = [tuple(row) for row in np.asarray(obs_dev).tolist()]
                return out + (obs,)
            return out
        norms2: List[float] = []
        ranks2: List[int] = []
        obs2: List[Tuple[float, ...]] = []
        for step in range(steps):
            x0, X, xl, keffs = _tdvp2_step_fused(
                x0, X, xl, a0, Am, al, h, ej, dense_limit, krylov, r
            )
            norms2.append(float(jnp.linalg.norm(x0)))
            ranks2.append(int(jnp.max(keffs)))
            if observables:
                obs2.append(tuple(
                    float(_sandwich_jit(x0, X, xl, *stk))
                    for stk in obs_stk
                ))
            callback(step, PackedTT(x0[0], X, xl[..., 0]))
        u = PackedTT(x0[0], X, xl[..., 0])
        if observables:
            return u, norms2, ranks2, obs2
        return u, norms2, ranks2
    xs = _unpack_state(u0)
    as_ = _unpack_op(A, dtp)
    d = len(xs)
    h = float(dt)
    r = max_rank
    eps_j = jnp.asarray(eps, dtp)

    _right_canonicalize(xs)

    one3 = jnp.ones((1, 1, 1), dtp)
    norms: List[float] = []
    ranks: List[int] = []
    obs: List[Tuple[float, ...]] = []
    # as in evolve_tdvp: the backward half-sweep records env k+1 after
    # core k+1's final split, so its chain is exactly the next step's
    rev_rs = _right_envs(xs, as_, one3)

    for step in range(steps):
        keffs = []
        rs = rev_rs[::-1]

        # left -> right: pair forward h/2, right core backward h/2
        ls = [one3]
        for k in range(d - 1):
            theta = _merge2(xs[k], xs[k + 1])
            theta = _theta_evolve(
                ls[-1], as_[k], as_[k + 1], rs[k + 1], theta,
                -0.5 * h, dense_limit, krylov,
            )
            u3, s, v3, keff = _split_theta(theta, r, eps_j)
            keffs.append(keff)
            xs[k] = u3
            ls.append(_adv_left(ls[-1], xs[k], as_[k]))
            sv = s[:, None, None] * v3
            if k < d - 2:
                sv = _site_evolve(
                    ls[-1], as_[k + 1], rs[k + 1], sv,
                    +0.5 * h, dense_limit, krylov,
                )
            xs[k + 1] = sv

        # right -> left (mirror): pair forward h/2, left core backward h/2
        rev_rs = [one3]
        for k in range(d - 2, -1, -1):
            theta = _merge2(xs[k], xs[k + 1])
            theta = _theta_evolve(
                ls[k], as_[k], as_[k + 1], rev_rs[-1], theta,
                -0.5 * h, dense_limit, krylov,
            )
            u3, s, v3, keff = _split_theta(theta, r, eps_j)
            keffs.append(keff)
            xs[k + 1] = v3
            rev_rs.append(_adv_right(rev_rs[-1], xs[k + 1], as_[k + 1]))
            us = u3 * s[None, None, :]
            if k > 0:
                us = _site_evolve(
                    ls[k], as_[k], rev_rs[-1], us,
                    +0.5 * h, dense_limit, krylov,
                )
            xs[k] = us

        norms.append(float(jnp.linalg.norm(xs[0])))
        ranks.append(int(np.max(np.asarray(jnp.stack(keffs)))))
        if observables:
            obs.append(_obs_host(observables, _repack(xs)))
        if callback is not None:
            callback(
                step,
                _repack(xs),
            )

    if observables:
        return _repack(xs), norms, ranks, obs
    return _repack(xs), norms, ranks
