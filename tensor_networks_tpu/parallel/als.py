"""Distributed (train-sharded) ALS: linear solves past one chip's HBM.

The one-site ALS solver (:func:`ops.als.als_solve`) with the iterate,
the operator, the right-hand side, AND the operator/rhs environment
chains sharded along the mesh's ``model`` axis — the same pipeline
placement and staged ``ppermute`` carry schedule as the distributed
rounding sweeps and :mod:`parallel.evolve`.  Per-chip working set
scales as ``1/P``; the carries are an ``(r, s, r)`` operator
environment and an ``(r, rb)`` rhs environment.

The per-device scans run the scan bodies of the fused single-device
sweep (``ops.als._als_fwd_body_of`` etc.) — the same arithmetic BY
CONSTRUCTION.  The per-sweep TRUE residual is computed distributed as
well: the residual train ``b - A x`` is assembled core-locally (the
operator apply and the direct sum touch no bonds), and its norm comes
from the distributed right-orthogonalization sweep — the backward-
stable ``norm_exact`` contract, never the cancelling zipper inner
product (CLAUDE.md numerics trap).

Reference counterpart: ``pytens``'s only solver is a single-process
GMRES (``pytens/algs.py:2700``); it has no multi-device execution.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensor_networks_tpu.ops.als import (
    _adv_left,
    _adv_left_b,
    _adv_right,
    _adv_right_b,
    _als_bwd_body_of,
    _als_fwd_body_of,
    _als_renv_body,
    _left_orth,
    _right_orth,
    _solve_core,
)
from tensor_networks_tpu.ops.packed import PackedTT, PackedTTOp
from tensor_networks_tpu.parallel.sweeps import (
    _replicate_from,
    _staged_sweep,
    tt_right_orth_sharded,
)

__all__ = [
    "als_solve_adaptive_sharded",
    "als_solve_sharded",
    "als_sweep_sharded",
    "place_als_sharded",
]


@lru_cache(maxsize=16)
def _als_sharded_raw(mesh: Mesh, dense_limit: int, cg_iters: int,
                     spd: bool):
    """UNJITTED shard_map program for one sharded ALS sweep, cached per
    (mesh, dense_limit, cg_iters, spd) — ``lam`` and the warm gates are
    traced operands.  Left unjitted so the multi-sweep loop program can
    trace it inside ``lax.while_loop``
    (:func:`_als_loop_sharded_fn`)."""
    n_stages = mesh.shape["model"]

    def body(x0, X_local, xl, a0, Am_local, al, b0, Bm_local, bl,
             lam, warm_f, warm_m_local, warm_l):
        my = jax.lax.axis_index("model")
        dtp = x0.dtype
        one3 = jnp.ones((1, 1, 1), dtp)
        one2 = jnp.ones((1, 1), dtp)
        m_local = X_local.shape[0]

        def bcast(c):
            return jnp.broadcast_to(c * 0.0, (m_local,) + c.shape)

        # ---- right-env chains (staged right-to-left), envs local ------
        r_last = _adv_right(one3, xl, al)
        rb_last = _adv_right_b(one2, xl, bl)
        carry = jax.tree_util.tree_map(
            lambda c: jax.lax.pcast(c, ("model",), to="varying"),
            (r_last, rb_last),
        )
        (rf_dev, rbf_dev), (rs_local, rbs_local) = _staged_sweep(
            my, n_stages, True, carry, (X_local, Am_local, Bm_local),
            _als_renv_body,
            lambda c, blk: (bcast(c[0]), bcast(c[1])),
        )
        r_front = _replicate_from(rf_dev, my, 0)
        rb_front = _replicate_from(rbf_dev, my, 0)

        # ---- forward half: core 0 replicated, mids staged --------------
        z0 = _solve_core(one3, r_front, one2, rb_front, a0, b0, x0,
                         lam, dense_limit, cg_iters, spd, warm_f)
        q0 = _left_orth(z0)
        lenv = _adv_left(one3, q0, a0)
        lbenv = _adv_left_b(one2, q0, b0)

        carry = jax.tree_util.tree_map(
            lambda c: jax.lax.pcast(c, ("model",), to="varying"),
            (lenv, lbenv),
        )
        (l_back, lb_back), (Q_local, ls_local, lbs_local) = _staged_sweep(
            my, n_stages, False, carry,
            (X_local, Am_local, Bm_local, rs_local, rbs_local,
             warm_m_local),
            _als_fwd_body_of(lam, dense_limit, cg_iters, spd),
            lambda c, blk: (blk[0] * 0.0, bcast(c[0]), bcast(c[1])),
        )
        l_back = _replicate_from(l_back, my, n_stages - 1)
        lb_back = _replicate_from(lb_back, my, n_stages - 1)

        # ---- last core (replicated; solved twice = the host loop's
        # exact order: forward half end, then return half start) ---------
        zl = _solve_core(l_back, one3, lb_back, one2, al, bl, xl,
                         lam, dense_limit, cg_iters, spd, warm_l)
        zl = _solve_core(l_back, one3, lb_back, one2, al, bl, zl,
                         lam, dense_limit, cg_iters, spd, warm_l)
        vl = _right_orth(zl)
        renv2 = _adv_right(one3, vl, al)
        rbenv2 = _adv_right_b(one2, vl, bl)

        # ---- backward half (staged right-to-left) ----------------------
        carry = jax.tree_util.tree_map(
            lambda c: jax.lax.pcast(c, ("model",), to="varying"),
            (renv2, rbenv2),
        )

        bwd = _als_bwd_body_of(lam, dense_limit, cg_iters, spd)

        def bwd_tupled(c, inp):
            nc, em = bwd(c, inp)
            return nc, (em,)

        (r_back, rb_back), (V_local,) = _staged_sweep(
            my, n_stages, True, carry,
            (Q_local, Am_local, Bm_local, ls_local, lbs_local,
             warm_m_local),
            bwd_tupled,
            lambda c, blk: (blk[0] * 0.0,),
        )
        r_back = _replicate_from(r_back, my, 0)
        rb_back = _replicate_from(rb_back, my, 0)

        # ---- first core (replicated) -----------------------------------
        z0 = _solve_core(one3, r_back, one2, rb_back, a0, b0, q0,
                         lam, dense_limit, cg_iters, spd, warm_f)
        return z0, V_local, vl

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
            P(None, None, None),
            P("model", None, None, None),
            P(None, None, None),
            P(),
            P(),
            P("model"),
            P(),
        ),
        out_specs=(
            P(None, None, None),
            P("model", None, None, None),
            P(None, None, None),
        ),
    )
    return fn


@lru_cache(maxsize=16)
def _als_sharded_fn(mesh: Mesh, dense_limit: int, cg_iters: int,
                    spd: bool):
    """Jitted single-sweep form of :func:`_als_sharded_raw`."""
    return jax.jit(_als_sharded_raw(mesh, dense_limit, cg_iters, spd))


@lru_cache(maxsize=16)
def _als_loop_sharded_fn(mesh: Mesh, dense_limit: int, cg_iters: int,
                         spd: bool, cap: int):
    """The whole distributed sweep LOOP as one program — the sharded
    mirror of :func:`ops.als._als_loop_impl`: up to ``cap`` sweeps with
    the TRUE residual (distributed orthogonalization-sweep norm) and
    the ``res < tol`` stop computed on device, so a multi-sweep solve
    costs zero host round-trips between sweeps.  Returns the final
    cores plus a ``(cap + 1,)`` record: per-sweep residuals with the
    executed sweep count in the tail."""
    smfn = _als_sharded_raw(mesh, dense_limit, cg_iters, spd)

    def loop(x0c, X, xl, a0, Am, al, b0, Bm, bl, lam,
             warm_f, warm_m, warm_l, sweeps, tol):
        dt = x0c.dtype

        def cond(c):
            _, _, _, _, i, done = c
            return jnp.logical_and(i < sweeps, jnp.logical_not(done))

        def body(c):
            z0, Xc, vlq, hist, i, _ = c
            z0n, Xn, vlqn = smfn(
                z0, Xc, vlq, a0, Am, al, b0, Bm, bl, lam,
                warm_f, warm_m, warm_l,
            )
            res = _residual_sharded_val(
                mesh, a0, Am, al, b0, Bm, bl, z0n, Xn, vlqn
            ).astype(dt)
            hist = jax.lax.dynamic_update_slice(hist, res[None], (i,))
            return (z0n, Xn, vlqn, hist, i + 1, res < tol)

        c0 = (
            x0c, X, xl, jnp.full((cap,), jnp.nan, dt),
            jnp.asarray(0, jnp.int32), jnp.asarray(False),
        )
        z0, Xo, vlq, hist, i, _ = jax.lax.while_loop(cond, body, c0)
        return z0, Xo, vlq, jnp.concatenate([hist, i.astype(dt)[None]])

    return jax.jit(loop)


def als_sweep_sharded(
    mesh: Mesh, x0, X, xl, a0, Am, al, b0, Bm, bl, lam,
    warm_f, warm_m, warm_l,
    dense_limit: int = 1024, cg_iters: int = 200, spd: bool = False,
):
    """One sharded ALS sweep on the stacked layout (``X``/``Am``/``Bm``
    and ``warm_m`` sharded along the train).  Returns
    ``(x0', X', xl')`` right-canonical with the mass in core 0."""
    return _als_sharded_fn(
        mesh, int(dense_limit), int(cg_iters), bool(spd)
    )(x0, X, xl, a0, Am, al, b0, Bm, bl, lam, warm_f, warm_m, warm_l)


def place_als_sharded(mesh: Mesh, X, Am, Bm):
    """Shard the iterate, operator, and rhs mid-stacks along the train."""
    n_stages = mesh.shape["model"]
    if X.shape[0] % n_stages != 0:
        raise ValueError(
            f"train sharding needs the middle-core count ({X.shape[0]}) "
            f"divisible by the model axis ({n_stages}); pad the train or "
            "choose a different mesh"
        )
    s4 = NamedSharding(mesh, P("model", None, None, None))
    s5 = NamedSharding(mesh, P("model", None, None, None, None))
    return (
        jax.device_put(X, s4),
        jax.device_put(Am, s5),
        jax.device_put(Bm, s4),
    )


def _norm_sharded_val(mesh: Mesh, first, mids, last) -> jnp.ndarray:
    """Backward-stable train norm with the mids sharded: distributed
    right-orthogonalization, then the norm of the folded first core
    (the ``packed.norm_exact`` contract — never the cancelling zipper
    inner product).  Traceable (returns a device scalar) so the fused
    sweep loop can evaluate it in-program."""
    carry, _, _ = tt_right_orth_sharded(mesh, mids, last)
    return jnp.linalg.norm(
        jnp.matmul(first, carry, precision="highest")
    )


def _norm_sharded(mesh: Mesh, first, mids, last) -> float:
    return float(_norm_sharded_val(mesh, first, mids, last))


def _residual_sharded_val(
    mesh, a0, Am, al, b0, Bm, bl, x0, X, xl
) -> jnp.ndarray:
    """``|b - A x|`` with every train sharded: the operator apply and
    the direct-sum difference are core-local (leading-axis maps, no
    bond traffic — GSPMD keeps the train sharding), the norm is the
    distributed orthogonalization sweep.  Traceable (device scalar)."""
    dtp = x0.dtype

    # apply: op core (s, i, j, t) x state core (r, j, q) -> fused
    # (s r)-major bonds, matching on every core
    ax_first = jnp.einsum(
        "ijt,jq->itq", a0[0], x0[0], precision="highest"
    ).reshape(x0.shape[1], -1)
    ax_mids = jnp.einsum(
        "msijt,mrjq->msritq", Am, X, precision="highest"
    ).reshape(
        X.shape[0], Am.shape[1] * X.shape[1], Am.shape[3],
        Am.shape[4] * X.shape[3],
    )
    ax_last = jnp.einsum(
        "sij,rj->sri", al[..., 0], xl[..., 0], precision="highest"
    ).reshape(-1, xl.shape[1])

    # difference train b - A x: block-diagonal direct sum per core,
    # built by concatenation so the leading-axis sharding propagates
    rb = bl.shape[0]
    ra = ax_last.shape[0]
    first_d = jnp.concatenate([b0[0], -ax_first], axis=1)
    m, _, n_, _ = X.shape
    top = jnp.concatenate(
        [Bm, jnp.zeros((m, rb, n_, ra), dtp)], axis=3
    )
    bot = jnp.concatenate(
        [jnp.zeros((m, ra, n_, rb), dtp), ax_mids], axis=3
    )
    mids_d = jnp.concatenate([top, bot], axis=1)
    last_d = jnp.concatenate([bl[..., 0], ax_last], axis=0)

    spec4 = NamedSharding(mesh, P("model", None, None, None))
    mids_d = jax.device_put(mids_d, spec4)
    return _norm_sharded_val(mesh, first_d, mids_d, last_d)


def _residual_sharded(mesh, a0, Am, al, b0, Bm, bl, x0, X, xl) -> float:
    return float(_residual_sharded_val(
        mesh, a0, Am, al, b0, Bm, bl, x0, X, xl
    ))


def als_solve_sharded(
    mesh: Mesh,
    op: PackedTTOp,
    rhs: PackedTT,
    x0: PackedTT,
    sweeps: int = 10,
    tol: float = 1e-8,
    lam: float = 0.0,
    dense_limit: int = 1024,
    cg_iters: int = 200,
    spd: bool = False,
) -> Tuple[PackedTT, float, List[float]]:
    """Solve ``op @ x = rhs`` by one-site ALS with the trains AND the
    environment chains sharded along the mesh's ``model`` axis.

    Same contracts as :func:`ops.als.als_solve` (dense-lstsq/CG local
    solves, ``spd=True`` for SPD projections, CG warm starts gated on
    structural nonsingularity); per-chip memory scales as ``1/P``,
    including the initial right-canonicalization and the per-sweep
    TRUE residual (both distributed sweeps).  Needs ``d - 2``
    divisible by the model-axis size.  Returns
    ``(x, residual, history)``.
    """
    dtp = x0.first.dtype
    d = x0.d
    X, Am, Bm = place_als_sharded(
        mesh, x0.mids, op.mids.astype(dtp), rhs.mids.astype(dtp)
    )
    carry, X, last_q = tt_right_orth_sharded(mesh, X, x0.last)
    x0c = jnp.matmul(x0.first, carry, precision="highest")[None]
    xl = last_q[..., None]
    a0 = op.first[None].astype(dtp)
    al = op.last[..., None].astype(dtp)
    b0 = rhs.first[None].astype(dtp)
    bl = rhs.last[..., None].astype(dtp)

    # CG warm-start gates: structural nonsingularity of each local
    # system (ops.als.als_solve's rule on the uniform packed layout)
    n = x0.mode
    r = x0.rank
    caps_l = [min(n ** k, 1 << 40) for k in range(d)]
    caps_r = [min(n ** (d - 1 - k), 1 << 40) for k in range(d)]
    ranks_l = [1] + [r] * (d - 1)   # bond left of core k
    ranks_r = [r] * (d - 1) + [1]   # bond right of core k
    warm_ok = [
        ranks_l[k] <= caps_l[k] and ranks_r[k] <= caps_r[k]
        for k in range(d)
    ]
    warm_f = jnp.asarray(warm_ok[0])
    warm_l = jnp.asarray(warm_ok[-1])
    warm_m = jax.device_put(
        jnp.asarray(warm_ok[1:-1]), NamedSharding(mesh, P("model"))
    )
    lam_d = jnp.asarray(lam, dtp)

    history: List[float] = []
    res = float("inf")
    if sweeps <= 0:
        return PackedTT(x0c[0], X, xl[..., 0]), res, history
    # one program for the whole sweep loop (residual + stop on device)
    # — no host syncs between sweeps; cap bucketed to powers of two so
    # nearby budgets share a compile (mirrors ops.als.als_solve)
    cap = 1 << max(sweeps - 1, 1).bit_length()
    z0, X, xl, rec = _als_loop_sharded_fn(
        mesh, int(dense_limit), int(cg_iters), bool(spd), cap
    )(
        x0c, X, xl, a0, Am, al, b0, Bm, bl, lam_d,
        warm_f, warm_m, warm_l,
        jnp.asarray(sweeps, jnp.int32), jnp.asarray(tol, dtp),
    )
    rec = np.asarray(rec)  # ONE host fetch for the whole loop
    n_done = int(rec[-1])
    history = [float(v) for v in rec[:n_done]]
    if history:
        res = history[-1]
    return PackedTT(z0[0], X, xl[..., 0]), res, history


# -- rank-adaptive distributed solves --------------------------------------------


def _round_fixed_sharded(mesh: Mesh, t: PackedTT, kick: int) -> PackedTT:
    """Fixed-rank truncation of a train-sharded packed train via the
    distributed Gram-SVD sweep: with a zero budget and per-bond bounds
    pinned to ``kick``, every bond keeps its leading
    ``min(kick, structural)`` directions in the LEADING slots
    (zero-masked static shapes), so slicing yields the rank-``kick``
    truncation without gathering the train."""
    from tensor_networks_tpu.parallel.sweeps import tt_gram_round_sharded

    bounds = [kick] * (t.d - 1)
    f, m, l, _, _ = tt_gram_round_sharded(
        mesh, t.first, t.mids, t.last, 0.0, bounds=bounds
    )
    return PackedTT(f[:, :kick], m[:, :kick, :, :kick], l[:kick])


def _enrich_span_sharded(
    mesh: Mesh, op: PackedTTOp, rhs: PackedTT, x: PackedTT, kick: int
) -> PackedTT:
    """AMEn rank growth, fully distributed: the residual train
    ``b - A x`` is assembled core-locally (sharding-preserving apply +
    concatenation direct sum), truncated to the kick rank by the
    distributed Gram sweep, and direct-summed at coefficient zero —
    the represented iterate is unchanged, every bond frame gains the
    steepest-descent subspace (ops.als._enrich_span's contract without
    materializing the train on one device)."""
    from tensor_networks_tpu.ops.packed import scale
    from tensor_networks_tpu.parallel.evolve import (
        add_sharded,
        ttop_apply_sharded,
    )

    ax = ttop_apply_sharded(mesh, op, x)
    resid = add_sharded(mesh, rhs, scale(ax, -1.0))
    z = _round_fixed_sharded(mesh, resid, kick)
    span = PackedTT(jnp.zeros_like(z.first), z.mids, z.last)
    return add_sharded(mesh, x, span)


def als_solve_adaptive_sharded(
    mesh: Mesh,
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
    """Rank-adaptive distributed ALS: solve at the current rank with
    :func:`als_solve_sharded` and, while the exact relative residual
    stays above ``eps``, double the rank (warm restart) up to
    ``max_rank`` — the schedule of :func:`ops.als.als_solve_adaptive`
    with every piece distributed: the restarts' AMEn enrichment rounds
    the residual train with the distributed Gram sweep
    (``enrich=False`` falls back to inert zero padding), and the
    reference norm uses the distributed orthogonalization sweep.
    Returns ``(x, absolute residual, concatenated history)``."""
    from tensor_networks_tpu.ops.packed import pad_rank

    spec = NamedSharding(mesh, P("model", None, None, None))
    rhs = PackedTT(
        rhs.first, jax.device_put(rhs.mids, spec), rhs.last
    )

    def _grow(x: PackedTT, target: int) -> PackedTT:
        kick = target - x.rank
        if kick <= 0:
            return x
        if not enrich:
            z = pad_rank(x, target)
            return PackedTT(
                z.first, jax.device_put(z.mids, spec), z.last
            )
        return _enrich_span_sharded(mesh, op, rhs, x, kick)

    if x0 is None:
        x0 = rhs
    rank = int(rank) if rank is not None else max(2 * x0.rank, 2)
    ceiling = int(max_rank) if max_rank is not None else 8 * rank
    b_norm = _norm_sharded(mesh, rhs.first, rhs.mids, rhs.last)
    x = _grow(x0, rank)
    hist_all: List[float] = []
    while True:
        x, res, hist = als_solve_sharded(
            mesh, op, rhs, x, sweeps=sweeps_per_rank,
            tol=eps * b_norm, **kw,
        )
        hist_all += hist
        if res <= eps * b_norm or rank >= ceiling:
            return x, res, hist_all
        rank = min(2 * rank, ceiling)
        x = _grow(x, rank)
