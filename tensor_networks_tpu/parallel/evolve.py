"""Distributed (train-sharded) TDVP: time integration past one chip's HBM.

Same placement as :mod:`tensor_networks_tpu.parallel.sweeps` — core
block k on device k, the pipeline placement — applied to the one-site
projector-splitting integrator (:mod:`ops.evolve`).  The per-core
ENVIRONMENT chains are the memory hog of DMRG-style algorithms
(``d x r x s x r`` against the state's ``d x r x n x r``); here each
device stores only its block's environments, so the integrator's
working set scales as ``1/P`` per chip while the sweep's carries — an
``(r, s, r)`` operator environment plus an ``(r, r)`` bond factor —
hop between neighbors over ICI via ``lax.ppermute``.  The initial
right-canonicalization is distributed too
(:func:`sweeps.tt_right_orth_sharded`), so no step materializes the
full train on one device.

The sweep is inherently sequential along the train (one device active
per stage, as in :func:`sweeps.tt_gram_round_sharded`): the win is
CAPACITY, not wall-clock.  The per-device scans run the scan bodies of
the fused single-device step (``ops.evolve._tdvp_fwd_body_of`` etc.)
— the same arithmetic BY CONSTRUCTION, pinned by parity tests at
roundoff.

No reference counterpart (``pytens`` has neither time integration nor
multi-device execution).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensor_networks_tpu.ops.evolve import (
    _adv_left,
    _adv_right,
    _bond_evolve,
    _site_evolve,
    _split_left,
    _split_right,
    _tdvp_bwd_body_of,
    _tdvp_fwd_body_of,
    _tdvp_renv_body,
)
from tensor_networks_tpu.ops.packed import PackedTT, PackedTTOp
from tensor_networks_tpu.parallel.sweeps import (
    _replicate_from,
    _staged_sweep,
    tt_right_orth_sharded,
)

__all__ = [
    "add_sharded",
    "evolve_tdvp2_sharded",
    "evolve_tdvp_sharded",
    "evolve_theta_sharded",
    "place_tdvp_sharded",
    "tdvp_step_sharded",
    "ttop_apply_sharded",
]


@lru_cache(maxsize=16)
def _tdvp_sharded_fn(mesh: Mesh, dense_limit: int, kdim: int):
    """Jitted shard_map program for one sharded TDVP step, cached per
    (mesh, dense_limit, kdim) — ``h`` is a traced operand so one
    executable serves every step size at fixed shapes."""
    n_stages = mesh.shape["model"]

    def body(x0, X_local, xl, a0, Am_local, al, h):
        my = jax.lax.axis_index("model")
        dtp = x0.dtype
        one3 = jnp.ones((1, 1, 1), dtp)
        m_local = X_local.shape[0]

        def tuple_emit(body_fn):
            # wrap a body emitting one array into the pytree shape the
            # staged sweep's passive_outs builders use (1-tuples)
            def wrapped(c, inp):
                nc, em = body_fn(c, inp)
                return nc, (em,)

            return wrapped

        # ---- right-env chain (staged right-to-left), envs stay local --
        r_last = _adv_right(one3, xl, al)
        carry = jax.lax.pcast(r_last, ("model",), to="varying")
        r_front_dev, (rs_local,) = _staged_sweep(
            my, n_stages, True, carry, (X_local, Am_local),
            tuple_emit(_tdvp_renv_body),
            lambda c, blk: (
                jnp.broadcast_to(c * 0.0, (m_local,) + c.shape),
            ),
        )
        r_front = _replicate_from(r_front_dev, my, 0)

        # ---- forward half-sweep: boundary replicated, mids staged -----
        z = _site_evolve(one3, a0, r_front, x0, -0.5 * h, dense_limit, kdim)
        x0q, smat = _split_left(z)
        lenv = _adv_left(one3, x0q, a0)
        smat = _bond_evolve(lenv, r_front, smat, +0.5 * h, dense_limit, kdim)

        carryL = jax.lax.pcast(lenv, ("model",), to="varying")
        carryS = jax.lax.pcast(smat, ("model",), to="varying")
        (l_back, smat), (Q_local, ls_local) = _staged_sweep(
            my, n_stages, False, (carryL, carryS),
            (X_local, Am_local, rs_local),
            _tdvp_fwd_body_of(h, dense_limit, kdim),
            lambda c, blk: (
                blk[0] * 0.0,
                jnp.broadcast_to(c[0] * 0.0, (m_local,) + c[0].shape),
            ),
        )
        l_back = _replicate_from(l_back, my, n_stages - 1)
        smat = _replicate_from(smat, my, n_stages - 1)

        # ---- last core (replicated; evolved twice = a full -h step,
        # matching the fused single-device form) ------------------------
        zl = jnp.einsum("ab,bnc->anc", smat, xl, precision="highest")
        zl = _site_evolve(l_back, al, one3, zl, -0.5 * h, dense_limit, kdim)
        zl = _site_evolve(l_back, al, one3, zl, -0.5 * h, dense_limit, kdim)
        xlq, smat = _split_right(zl)
        renv = _adv_right(one3, xlq, al)
        smat = _bond_evolve(l_back, renv, smat, +0.5 * h, dense_limit, kdim)

        # ---- backward half-sweep (staged right-to-left) ----------------
        carryR = jax.lax.pcast(renv, ("model",), to="varying")
        carryS = jax.lax.pcast(smat, ("model",), to="varying")
        (r_back, smat), (V_local,) = _staged_sweep(
            my, n_stages, True, (carryR, carryS),
            (Q_local, Am_local, ls_local),
            tuple_emit(_tdvp_bwd_body_of(h, dense_limit, kdim)),
            lambda c, blk: (blk[0] * 0.0,),
        )
        r_back = _replicate_from(r_back, my, 0)
        smat = _replicate_from(smat, my, 0)

        # ---- first core (replicated) -----------------------------------
        z0 = jnp.einsum("anb,bc->anc", x0q, smat, precision="highest")
        z0 = _site_evolve(one3, a0, r_back, z0, -0.5 * h, dense_limit, kdim)
        return z0, V_local, xlq, jnp.linalg.norm(z0)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None, None, None),
            P("model", None, None, None),
            P(None, None, None),
            P(None, None, None, None),
            P("model", None, None, None, None),
            P(None, None, None, None),
            P(),
        ),
        out_specs=(
            P(None, None, None),
            P("model", None, None, None),
            P(None, None, None),
            P(),
        ),
    )
    return jax.jit(fn), fn


def tdvp_step_sharded(
    mesh: Mesh,
    x0: jnp.ndarray,
    X: jnp.ndarray,
    xl: jnp.ndarray,
    a0: jnp.ndarray,
    Am: jnp.ndarray,
    al: jnp.ndarray,
    h,
    dense_limit: int = 1024,
    kdim: int = 24,
):
    """One sharded symmetric one-site TDVP step on the stacked layout
    (``ops.evolve._tdvp_step_impl`` shapes; ``X``/``Am`` sharded along
    the train — see :func:`place_tdvp_sharded`).  Returns
    ``(x0', X', xl', norm)``."""
    return _tdvp_sharded_fn(mesh, int(dense_limit), int(kdim))[0](
        x0, X, xl, a0, Am, al, h
    )


@lru_cache(maxsize=16)
def _tdvp_traj_sharded_fn(mesh: Mesh, dense_limit: int, kdim: int,
                          cap: int):
    """The whole sharded TDVP trajectory as ONE program: a
    ``lax.while_loop`` up to ``cap`` steps with the actual step count a
    device scalar, norms recorded into a NaN-padded ``(cap,)`` buffer
    in-program — zero host round-trips between steps (the per-step
    ``float(nrm)`` was a cross-host sync per step on a real pod).
    ``cap`` is bucketed to powers of two by the caller, like the
    solver loops (``_eig_loop_sharded_fn``), so nearby step counts
    share one compiled program — a scan of raw length ``steps`` would
    recompile the whole trajectory per distinct count (relay compiles
    of nested-scan programs cost 20-60 s+).  The while_loop exits at
    ``steps`` exactly, so padded capacity costs no compute."""
    smfn = _tdvp_sharded_fn(mesh, dense_limit, kdim)[1]

    def traj(x0, X, xl, a0, Am, al, h, steps):
        dt = x0.dtype

        def cond(c):
            return c[4] < steps

        def body(c):
            z0, Xc, zl, norms, i = c
            z0n, Xn, zln, nrm = smfn(z0, Xc, zl, a0, Am, al, h)
            norms = jax.lax.dynamic_update_slice(norms, nrm[None], (i,))
            return (z0n, Xn, zln, norms, i + 1)

        c0 = (x0, X, xl, jnp.full((cap,), jnp.nan, dt),
              jnp.asarray(0, jnp.int32))
        z0, Xo, zl, norms, _ = jax.lax.while_loop(cond, body, c0)
        return z0, Xo, zl, norms

    return jax.jit(traj)


def place_tdvp_sharded(mesh: Mesh, X: jnp.ndarray, Am: jnp.ndarray):
    """Shard the state and operator mid-stacks along the train."""
    n_stages = mesh.shape["model"]
    if X.shape[0] % n_stages != 0:
        raise ValueError(
            f"train sharding needs the middle-core count ({X.shape[0]}) "
            f"divisible by the model axis ({n_stages}); pad the train or "
            "choose a different mesh"
        )
    spec4 = NamedSharding(mesh, P("model", None, None, None))
    spec5 = NamedSharding(mesh, P("model", None, None, None, None))
    return jax.device_put(X, spec4), jax.device_put(Am, spec5)


def evolve_tdvp_sharded(
    mesh: Mesh,
    A: PackedTTOp,
    u0: PackedTT,
    dt: float,
    steps: int,
    krylov: int = 24,
    dense_limit: int = 1024,
) -> Tuple[PackedTT, List[float]]:
    """Integrate ``du/dt = -A u`` by one-site TDVP with the train (and
    its environment chains) sharded along the mesh's ``model`` axis.

    Same integrator and contracts as :func:`ops.evolve.evolve_tdvp`
    (symmetric ``A``, rank-preserving, exact on the rank manifold);
    per-chip memory scales as ``1/P``, including the initial
    right-canonicalization (distributed QR sweep — the full train is
    never materialized on one device).  Needs ``d - 2`` divisible by
    the model-axis size.  Returns ``(u_final, norms)``; the whole
    trajectory runs as ONE scanned program and the norms are fetched
    once at the end.
    """
    dtp = u0.first.dtype
    X, Am = place_tdvp_sharded(mesh, u0.mids, A.mids.astype(dtp))
    carry, X, last_q = tt_right_orth_sharded(mesh, X, u0.last)
    x0 = jnp.matmul(u0.first, carry, precision="highest")[None]
    xl = last_q[..., None]
    a0 = A.first[None].astype(dtp)
    al = A.last[..., None].astype(dtp)
    h = jnp.asarray(float(dt), dtp)
    if steps <= 0:
        return PackedTT(x0[0], X, xl[..., 0]), []
    # the whole trajectory is ONE program (while_loop up to a pow2-
    # bucketed cap) — no host syncs between steps; the norms come back
    # as one NaN-padded array, trimmed to the executed step count
    cap = 1 << max(steps - 1, 1).bit_length()
    x0, X, xl, norms = _tdvp_traj_sharded_fn(
        mesh, int(dense_limit), int(krylov), cap
    )(x0, X, xl, a0, Am, al, h, jnp.asarray(steps, jnp.int32))
    norms = [float(v) for v in np.asarray(norms)[:steps]]
    return PackedTT(x0[0], X, xl[..., 0]), norms


# -- theta-method time integration (implicit Euler / Crank-Nicolson) -------------
# Composition of the packed operator algebra (step operators assembled
# once, replicated — operator cores are small) with the distributed ALS
# solver: every implicit step is an `als_solve_sharded` call, and the
# right-hand side is assembled core-locally so the train sharding
# propagates (batched-einsum operator apply — ttop_apply_packed's
# lax.scan over the train axis would serialize a sharded array).
# Unlike the fused `evolve_theta`, the rhs is NOT rounded back to the
# iterate rank: the exact rhs train (rank R_rhs * r) feeds the solver
# directly — slightly larger rhs environments, one fewer sweep per
# step, and no rounding bias in the step.


def ttop_apply_sharded(mesh: Mesh, op: PackedTTOp, x: PackedTT) -> PackedTT:
    """Apply a uniform TT-operator to a train-sharded iterate with ONE
    batched einsum over the middle-core axis (fused bonds in
    ``ttop_apply_packed``'s (x-rank major, op-rank minor) layout on
    both sides — core-for-core identical to the fused apply)."""
    dtp = x.first.dtype
    first = jnp.einsum(
        "oik,il->olk", op.first.astype(dtp), x.first,
        precision="highest",
    )
    first = first.reshape(first.shape[0], -1)
    out = jnp.einsum(
        "kaoib,kmir->kmaorb", op.mids.astype(dtp), x.mids,
        precision="highest",
    )
    s = out.shape
    mids = out.reshape(s[0], s[1] * s[2], s[3], s[4] * s[5])
    last = jnp.einsum(
        "aoi,mi->mao", op.last.astype(dtp), x.last, precision="highest"
    )
    last = last.reshape(-1, last.shape[2])
    spec = NamedSharding(mesh, P("model"))
    return PackedTT(first, jax.device_put(mids, spec), last)


def add_sharded(mesh: Mesh, a: PackedTT, b: PackedTT) -> PackedTT:
    """Exact direct sum (bond ranks add) built by CONCATENATION so the
    leading-axis train sharding propagates (``packed._add2``'s
    scatter-into-zeros would not)."""
    dtp = a.first.dtype
    m, ra, n, _ = a.mids.shape
    rb = b.rank
    first = jnp.concatenate([a.first, b.first.astype(dtp)], axis=1)
    top = jnp.concatenate(
        [a.mids, jnp.zeros((m, ra, n, rb), dtp)], axis=3
    )
    bot = jnp.concatenate(
        [jnp.zeros((m, rb, n, ra), dtp), b.mids.astype(dtp)], axis=3
    )
    mids = jnp.concatenate([top, bot], axis=1)
    last = jnp.concatenate([a.last, b.last.astype(dtp)], axis=0)
    spec = NamedSharding(mesh, P("model"))
    return PackedTT(first, jax.device_put(mids, spec), last)


def evolve_theta_sharded(
    mesh: Mesh,
    A: PackedTTOp,
    u0: PackedTT,
    dt: float,
    steps: int,
    theta: float = 1.0,
    mass: PackedTTOp = None,
    source=None,
    sweeps: int = 4,
    tol: float = 1e-10,
    op_eps: float = 1e-13,
    observables: Tuple[PackedTTOp, ...] = (),
    callback=None,
    **solve_kw,
):
    """Integrate ``M du/dt = -A u + f`` with the train sharded along
    the mesh's ``model`` axis: every implicit step is a distributed ALS
    solve (:func:`parallel.als.als_solve_sharded`), the rhs operator
    apply and source direct sum are core-local (sharding-preserving),
    and the step tolerance uses the distributed backward-stable norm.

    Same contracts as :func:`ops.evolve.evolve_theta` (theta in (0,1],
    constant or callable ``source``, ``observables`` recorded as
    ``<u, O u>`` after every step, extra kwargs reach the ALS solver)
    EXCEPT the rhs is kept exact instead of rounded to the iterate
    rank (see module note).  Needs ``d - 2`` divisible by the
    model-axis size.  Returns ``(u_final, residuals[, observable
    values])``.
    """
    from tensor_networks_tpu.ops.packed import (
        add as packed_add,
        scale,
        ttop_add,
        ttop_identity,
        ttop_round,
        ttop_scale,
    )
    from tensor_networks_tpu.parallel.als import (
        _norm_sharded,
        als_solve_sharded,
    )
    from tensor_networks_tpu.parallel.sweeps import tt_inner_train_sharded

    if not 0.0 < theta <= 1.0:
        raise ValueError(
            f"theta must be in (0, 1] (theta=0 needs no solver), "
            f"got {theta}"
        )
    d, n = u0.d, u0.mode
    dtp = u0.first.dtype
    M = mass if mass is not None else ttop_identity(d, n, dtp)
    lhs = ttop_round(ttop_add(M, ttop_scale(A, theta * dt)), op_eps)
    if theta < 1.0:
        rhs_op = ttop_round(
            ttop_add(M, ttop_scale(A, -(1.0 - theta) * dt)), op_eps
        )
    else:
        rhs_op = M
    identity_rhs = mass is None and theta == 1.0

    g_const = None
    if source is not None and not callable(source):
        g_const = scale(source, dt)

    def _obs(u: PackedTT) -> Tuple[float, ...]:
        vals = []
        for o in observables:
            ou = ttop_apply_sharded(mesh, o, u)
            vals.append(float(tt_inner_train_sharded(
                mesh, u.first, u.mids, u.last,
                ou.first, ou.mids, ou.last,
            )))
        return tuple(vals)

    spec = NamedSharding(mesh, P("model"))
    u = PackedTT(u0.first, jax.device_put(u0.mids, spec), u0.last)
    residuals: List[float] = []
    obs: List[Tuple[float, ...]] = []
    for step in range(steps):
        b = u if identity_rhs else ttop_apply_sharded(mesh, rhs_op, u)
        if source is not None:
            if g_const is not None:
                g = g_const
            else:
                f1 = scale(source((step + 1) * dt), theta * dt)
                if theta < 1.0:
                    g = packed_add(
                        f1, scale(source(step * dt), (1.0 - theta) * dt)
                    )
                else:
                    g = f1
            b = add_sharded(mesh, b, g)
        bn = _norm_sharded(mesh, b.first, b.mids, b.last)
        u, res, _ = als_solve_sharded(
            mesh, lhs, b, u, sweeps=sweeps, tol=tol * bn, **solve_kw,
        )
        residuals.append(res)
        if observables:
            obs.append(_obs(u))
        if callback is not None:
            callback(step, u)
    if observables:
        return u, residuals, obs
    return u, residuals


# -- two-site (rank-adaptive) distributed TDVP -----------------------------------
# The fused two-site sweep's carry is (env, evolved core) — the working
# core travels WITH the carry (ops.evolve._tdvp2_fwd_body_of), so the
# staged-pipeline skeleton applies directly: one ppermute hop moves the
# (r, s, r) env plus the (r, n, r) core between neighbors.  Block
# alignment: the mid-pair scans cover pairs j = 1..m-1 while the blocks
# hold m rows, so global row 0 is a masked DUMMY item (computed on real
# operands, discarded by a `where` — static shapes, no NaN risk, one
# wasted theta-evolve per sweep).


@lru_cache(maxsize=16)
def _tdvp2_sharded_fn(mesh: Mesh, dense_limit: int, kdim: int, rank: int):
    """Jitted shard_map program for one sharded two-site TDVP step,
    cached per (mesh, dense_limit, krylov, static rank) — ``h`` and
    ``eps`` are traced operands."""
    from tensor_networks_tpu.ops.evolve import (
        _merge2,
        _site_evolve,
        _split_theta,
        _tdvp2_bwd_body_of,
        _tdvp2_fwd_body_of,
        _theta_evolve,
    )

    n_stages = mesh.shape["model"]

    def body(x0, X_local, xl, a0, Am_local, A1_local, al, h, eps):
        my = jax.lax.axis_index("model")
        dtp = x0.dtype
        one3 = jnp.ones((1, 1, 1), dtp)
        m_local = X_local.shape[0]

        def bcast(c):
            return jnp.broadcast_to(c * 0.0, (m_local,) + c.shape)

        def vary(tree):
            return jax.tree_util.tree_map(
                lambda c: jax.lax.pcast(c, ("model",), to="varying"),
                tree,
            )

        def repl(tree, src):
            return jax.tree_util.tree_map(
                lambda c: _replicate_from(c, my, src), tree
            )

        # global row index -> pair validity (row 0 is the dummy)
        valid_local = (
            my * m_local + jnp.arange(m_local, dtype=jnp.int32)
        ) >= 1

        # ---- right-env chain (staged right-to-left) --------------------
        from tensor_networks_tpu.ops.evolve import (
            _adv_left as adv_l,
            _adv_right as adv_r,
            _tdvp_renv_body,
        )

        r_last = adv_r(one3, xl, al)
        _, rs_local = _staged_sweep(
            my, n_stages, True, vary(r_last), (X_local, Am_local),
            _tdvp_renv_body,
            lambda c, blk: bcast(c),
        )

        Am0 = _replicate_from(Am_local[0], my, 0)
        AmL = _replicate_from(Am_local[-1], my, n_stages - 1)
        X0 = _replicate_from(X_local[0], my, 0)
        rs0 = _replicate_from(rs_local[0], my, 0)

        # ---- first pair (replicated) -----------------------------------
        theta = _merge2(x0, X0)
        theta = _theta_evolve(
            one3, a0, Am0, rs0, theta, -0.5 * h, dense_limit, kdim
        )
        u0q, s, v3, k0 = _split_theta(theta, rank, eps)
        lenv = adv_l(one3, u0q, a0)
        sv = s[:, None, None] * v3
        sv = _site_evolve(
            lenv, Am0, rs0, sv, +0.5 * h, dense_limit, kdim
        )

        # ---- forward mid pairs (staged, dummy row masked) --------------
        fwd = _tdvp2_fwd_body_of(h, eps, dense_limit, kdim, rank)

        def fwd_masked(carry, inp):
            xk1, a1, a2, Rk, val = inp
            new_carry, (q, Lpre, keff) = fwd(carry, (xk1, a1, a2, Rk))
            carry_out = jax.tree_util.tree_map(
                lambda n, o: jnp.where(val, n, o), new_carry, carry
            )
            return carry_out, (
                jnp.where(val, q, q * 0.0),
                jnp.where(val, Lpre, Lpre * 0.0),
                jnp.where(val, keff, 0).astype(jnp.int32),
            )

        carry = vary((lenv, sv))
        lcarry, (Q_local, ls_local, kf_local) = _staged_sweep(
            my, n_stages, False, carry,
            (X_local, A1_local, Am_local, rs_local, valid_local),
            fwd_masked,
            lambda c, blk: (
                blk[0] * 0.0,
                bcast(c[0]),
                blk[4].astype(jnp.int32) * 0,
            ),
        )
        l_back, c = repl(lcarry, n_stages - 1)

        # ---- last pair (replicated): close the forward half, then open
        # the backward one (fused sweep's exact order) --------------------
        theta = _merge2(c, xl)
        theta = _theta_evolve(
            l_back, AmL, al, one3, theta, -0.5 * h, dense_limit, kdim
        )
        ulq, s, vl, kl = _split_theta(theta, rank, eps)
        svl = s[:, None, None] * vl

        theta = _merge2(ulq, svl)
        theta = _theta_evolve(
            l_back, AmL, al, one3, theta, -0.5 * h, dense_limit, kdim
        )
        ub, s, xln, kl2 = _split_theta(theta, rank, eps)
        renv = adv_r(one3, xln, al)
        us = ub * s[None, None, :]
        us = _site_evolve(
            l_back, AmL, renv, us, +0.5 * h, dense_limit, kdim
        )

        # ---- backward mid pairs (staged right-to-left) -----------------
        bwd = _tdvp2_bwd_body_of(h, eps, dense_limit, kdim, rank)

        def bwd_masked(carry, inp):
            qk, a1, a2, Lk, val = inp
            new_carry, (vk, keff) = bwd(carry, (qk, a1, a2, Lk))
            carry_out = jax.tree_util.tree_map(
                lambda n, o: jnp.where(val, n, o), new_carry, carry
            )
            return carry_out, (
                jnp.where(val, vk, vk * 0.0),
                jnp.where(val, keff, 0).astype(jnp.int32),
            )

        carry = vary((renv, us))
        rcarry, (V_local, kb_local) = _staged_sweep(
            my, n_stages, True, carry,
            (Q_local, A1_local, Am_local, ls_local, valid_local),
            bwd_masked,
            lambda c, blk: (
                blk[0] * 0.0,
                blk[4].astype(jnp.int32) * 0,
            ),
        )
        r_back, c2 = repl(rcarry, 0)

        # ---- final pair (replicated); its right factor is mid 0 --------
        theta = _merge2(u0q, c2)
        theta = _theta_evolve(
            one3, a0, Am0, r_back, theta, -0.5 * h, dense_limit, kdim
        )
        z0, s, v1, k0b = _split_theta(theta, rank, eps)
        z0 = z0 * s[None, None, :]
        row0 = (
            (jnp.arange(m_local) == 0)[:, None, None, None]
            & (my == 0)
        )
        V_local = jnp.where(row0, v1[None], V_local)

        k_bound = jnp.stack([k0, kl, kl2, k0b])
        return z0, V_local, xln, k_bound, kf_local, kb_local

    shd = P("model")
    rep = P()
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(rep, shd, rep, rep, shd, shd, rep, rep, rep),
        out_specs=(rep, shd, rep, rep, shd, shd),
    )
    return jax.jit(fn), fn


@lru_cache(maxsize=16)
def _tdvp2_traj_sharded_fn(mesh: Mesh, dense_limit: int, kdim: int,
                           rank: int, cap: int):
    """The whole sharded two-site trajectory as ONE program: a
    ``lax.while_loop`` up to ``cap`` steps (pow2-bucketed by the
    caller, exact ``steps`` a device scalar — one compiled program per
    bucket instead of one per distinct step count), per-step norm and
    max effective bond rank recorded into NaN/-1-padded ``(cap,)``
    buffers in-program, so a multi-step run costs zero host
    round-trips between steps (the per-step norm + three rank fetches
    were four cross-host syncs per step on a real pod)."""
    smfn = _tdvp2_sharded_fn(mesh, dense_limit, kdim, rank)[1]

    def traj(x0, X, xl, a0, Am, A1, al, h, ej, steps):
        dt = x0.dtype

        def cond(c):
            return c[5] < steps

        def body(c):
            z0, Xc, zl, norms, rks, i = c
            z0n, Xn, zln, kb, kf, kbk = smfn(
                z0, Xc, zl, a0, Am, A1, al, h, ej
            )
            nrm = jnp.linalg.norm(z0n)
            rk = jnp.maximum(
                jnp.max(kb), jnp.maximum(jnp.max(kf), jnp.max(kbk))
            )
            norms = jax.lax.dynamic_update_slice(norms, nrm[None], (i,))
            rks = jax.lax.dynamic_update_slice(
                rks, rk.astype(jnp.int32)[None], (i,)
            )
            return (z0n, Xn, zln, norms, rks, i + 1)

        c0 = (x0, X, xl, jnp.full((cap,), jnp.nan, dt),
              jnp.full((cap,), -1, jnp.int32), jnp.asarray(0, jnp.int32))
        z0, Xo, zl, norms, rks, _ = jax.lax.while_loop(cond, body, c0)
        return z0, Xo, zl, norms, rks

    return jax.jit(traj)


def evolve_tdvp2_sharded(
    mesh: Mesh,
    A: PackedTTOp,
    u0: PackedTT,
    dt: float,
    steps: int,
    max_rank: int = None,
    eps: float = 0.0,
    krylov: int = 24,
    dense_limit: int = 4096,
) -> Tuple[PackedTT, List[float], List[int]]:
    """Two-site (rank-adaptive) projector-splitting TDVP with the
    train sharded along the mesh's ``model`` axis.

    Same integrator and contracts as :func:`ops.evolve.evolve_tdvp2`
    (ranks breathe toward the dynamics inside the static ``max_rank``
    padding, ``eps`` zeroes split singular values, symmetric ``A``
    above ``dense_limit``); the mid-pair sweeps run the fused step's
    own scan bodies staged across devices — the evolved working core
    rides the ppermute carry, so per-chip memory scales as ``1/P``.
    Needs ``d - 2`` divisible by the model-axis size.  Returns
    ``(u_final, norms, max effective bond rank per step)``.
    """
    import numpy as np

    if max_rank is None:
        max_rank = u0.rank
    if max_rank > u0.rank:
        from tensor_networks_tpu.ops.packed import pad_rank

        u0 = pad_rank(u0, max_rank)
    elif max_rank < u0.rank:
        raise ValueError(
            f"max_rank {max_rank} below the initial rank {u0.rank}; "
            "round u0 first"
        )
    dtp = u0.first.dtype
    Am_full = A.mids.astype(dtp)
    A1_full = jnp.concatenate([Am_full[:1], Am_full[:-1]])
    X, Am = place_tdvp_sharded(mesh, u0.mids, Am_full)
    (A1,) = (jax.device_put(
        A1_full, NamedSharding(mesh, P("model"))
    ),)
    carry, X, last_q = tt_right_orth_sharded(mesh, X, u0.last)
    x0 = jnp.matmul(u0.first, carry, precision="highest")[None]
    xl = last_q[..., None]
    a0 = A.first[None].astype(dtp)
    al = A.last[..., None].astype(dtp)
    h = jnp.asarray(float(dt), dtp)
    ej = jnp.asarray(eps, dtp)
    if steps <= 0:
        return PackedTT(x0[0], X, xl[..., 0]), [], []
    # the whole trajectory is ONE program (while_loop up to a pow2-
    # bucketed cap) — norms and the per-step max effective ranks come
    # back as padded arrays, trimmed to the executed step count
    cap = 1 << max(steps - 1, 1).bit_length()
    x0, X, xl, nrm_arr, rk_arr = _tdvp2_traj_sharded_fn(
        mesh, int(dense_limit), int(krylov), int(max_rank), cap
    )(x0, X, xl, a0, Am, A1, al, h, ej, jnp.asarray(steps, jnp.int32))
    norms = [float(v) for v in np.asarray(nrm_arr)[:steps]]
    ranks = [int(v) for v in np.asarray(rk_arr)[:steps]]
    return PackedTT(x0[0], X, xl[..., 0]), norms, ranks
