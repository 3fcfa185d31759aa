"""Distributed (train-sharded) DMRG eigensolver: ground and excited
states past one chip's HBM.

The one-site eigensolver (:func:`ops.eigen.als_eigsh`) with the
iterate, the operator, the optional mass operator, the deflation
trains, and ALL environment chains (operator, metric, deflation)
sharded along the mesh's ``model`` axis — the same pipeline placement
and staged ``ppermute`` carry schedule as the distributed rounding
sweeps, :mod:`parallel.evolve`, and :mod:`parallel.als`.  Per-chip
working set scales as ``1/P``; the carries are the ``(r, s, r)``
operator environment, the bond-sized metric environment, and (when
deflating) a J-stacked penalty environment.

The per-device scans run the scan bodies of the fused single-device
sweep (``ops.eigen._eig_renv_body_of`` etc.) — the same arithmetic BY
CONSTRUCTION, including the generalized (mass-matrix) local solves and
penalty deflation.  The Rayleigh values come from the replicated
boundary-core solves, exactly where the fused sweep reads them.

Reference counterpart: none (``pytens`` has no eigensolver; its only
solver is a single-process GMRES, ``pytens/algs.py:2700``).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensor_networks_tpu.ops.eigen import (
    _adv_left,
    _adv_right,
    _default_shift,
    _EigHelpers,
    _eig_bwd_body_of,
    _eig_fwd_body_of,
    _eig_renv_body_of,
    _left_orth,
    _right_orth,
)
from tensor_networks_tpu.ops.packed import PackedTT, PackedTTOp
from tensor_networks_tpu.parallel.sweeps import (
    _replicate_from,
    _staged_sweep,
    tt_right_orth_sharded,
)

__all__ = [
    "als_eigsh_adaptive_sharded",
    "als_eigsh_k_sharded",
    "als_eigsh_sharded",
    "place_eigsh_sharded",
]


@lru_cache(maxsize=16)
def _eig_sharded_raw(mesh: Mesh, use_mass: bool, use_pen: bool):
    """UNJITTED shard_map program for one sharded eigensolver sweep,
    cached per (mesh, mass?, deflation?) — ``shift`` is a traced
    operand.  ``Mm``/``VM`` (and the matching boundary cores) are
    dummy zeros when the feature is off; the shared helpers ignore
    them.  Left unjitted so the multi-sweep loop program can trace it
    inside ``lax.while_loop`` (:func:`_eig_loop_sharded_fn`)."""
    n_stages = mesh.shape["model"]

    def body(x0, X_local, xl, a0, Am_local, al, mk0, Mm_local, mkl,
             v0, VM_local, vl, shift):
        my = jax.lax.axis_index("model")
        dt = x0.dtype
        J = v0.shape[0] if use_pen else 0
        h = _EigHelpers(use_mass, use_pen, dt, J)
        one3 = jnp.ones((1, 1, 1), dt)
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

        mids = (X_local, Am_local, Mm_local, VM_local)

        # ---- right-env chains (staged right-to-left), envs local ------
        r_last = _adv_right(one3, xl, al)
        rg_last = h.g_adv_r(h.g_seed(), xl, mkl)
        rb_last = h.p_adv_r(h.p_seed(), xl, mkl, vl)
        carry = vary((r_last, rg_last, rb_last))
        (rf, rgf, rbf), rstash = _staged_sweep(
            my, n_stages, True, carry, mids,
            _eig_renv_body_of(h),
            lambda c, blk: jax.tree_util.tree_map(bcast, c),
        )
        r_front, rg_front, rb_front = repl((rf, rgf, rbf), 0)

        # ---- first core (replicated) -----------------------------------
        pens = h.pens_of(h.p_seed(), rb_front, mk0, v0, x0.size)
        _, vec = h.solve(one3, r_front, h.g_seed(), rg_front, a0, mk0,
                         pens, shift)
        q0 = _left_orth(vec.reshape(x0.shape))
        lenv = _adv_left(one3, q0, a0)
        lg = h.g_adv_l(h.g_seed(), q0, mk0)
        lb = h.p_adv_l(h.p_seed(), q0, mk0, v0)

        # ---- forward half: mids staged ---------------------------------
        carry = vary((lenv, lg, lb))
        lcarry, (Q_local, ls_local) = _staged_sweep(
            my, n_stages, False, carry, (mids, rstash),
            _eig_fwd_body_of(h, shift),
            lambda c, blk: (
                blk[0][0] * 0.0,
                jax.tree_util.tree_map(bcast, c),
            ),
        )
        l_back, lg_back, lb_back = repl(lcarry, n_stages - 1)

        # ---- last core (replicated; the host loop's re-solve here is
        # bit-identical — no warm start — and skipped, matching the
        # fused sweep) ---------------------------------------------------
        pens = h.pens_of(lb_back, h.p_seed(), mkl, vl, xl.size)
        lam_f, vec = h.solve(l_back, one3, lg_back, h.g_seed(), al,
                             mkl, pens, shift)
        vlq = _right_orth(vec.reshape(xl.shape))
        renv2 = _adv_right(one3, vlq, al)
        rg2 = h.g_adv_r(h.g_seed(), vlq, mkl)
        rb2 = h.p_adv_r(h.p_seed(), vlq, mkl, vl)

        # ---- backward half (staged right-to-left) ----------------------
        carry = vary((renv2, rg2, rb2))
        rcarry, V_local = _staged_sweep(
            my, n_stages, True, carry,
            ((Q_local, ls_local), (Am_local, Mm_local, VM_local)),
            _eig_bwd_body_of(h, shift),
            lambda c, blk: blk[0][0] * 0.0,
        )
        r_back, rg_back, rb_back = repl(rcarry, 0)

        # ---- first core (replicated) -----------------------------------
        pens = h.pens_of(h.p_seed(), rb_back, mk0, v0, q0.size)
        lam_b, vec = h.solve(one3, r_back, h.g_seed(), rg_back, a0,
                             mk0, pens, shift)
        z0 = vec.reshape(q0.shape)
        return z0, V_local, vlq, lam_f, lam_b

    shd = P("model")
    rep = P()
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(rep, shd, rep, rep, shd, rep,
                  rep, shd, rep, rep, shd, rep, rep),
        out_specs=(rep, shd, rep, rep, rep),
    )
    return fn


@lru_cache(maxsize=16)
def _eig_sharded_fn(mesh: Mesh, use_mass: bool, use_pen: bool):
    """Jitted single-sweep form of :func:`_eig_sharded_raw`."""
    return jax.jit(_eig_sharded_raw(mesh, use_mass, use_pen))


@lru_cache(maxsize=16)
def _eig_loop_sharded_fn(mesh: Mesh, use_mass: bool, use_pen: bool,
                         cap: int):
    """The whole distributed sweep LOOP as one program — the sharded
    mirror of :func:`ops.eigen._eig_loop_impl`: up to ``cap`` sweeps
    with the Rayleigh convergence test on device, so a multi-sweep
    solve costs zero host round-trips between sweeps (each per-sweep
    ``float()`` is a cross-host sync on a real pod).  ``sweeps`` and
    ``tol`` are device scalars; ``cap`` is bucketed to powers of two
    by the caller.  Returns the final cores plus a ``(2 cap + 1,)``
    record: per-half-sweep Rayleigh values with the executed sweep
    count in the tail."""
    smfn = _eig_sharded_raw(mesh, use_mass, use_pen)

    def loop(x0c, X, xl, a0, Am, al, mk0, Mm, mkl, v0, VM, vl,
             shift, sweeps, tol):
        dt = x0c.dtype
        tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)

        def cond(c):
            _, _, _, _, _, i, done = c
            return jnp.logical_and(i < sweeps, jnp.logical_not(done))

        def body(c):
            z0, Xc, vlq, lam_prev, hist, i, _ = c
            z0n, Xn, vlqn, lam_f, lam_b = smfn(
                z0, Xc, vlq, a0, Am, al, mk0, Mm, mkl, v0, VM, vl,
                shift,
            )
            hist = jax.lax.dynamic_update_slice(
                hist, jnp.stack([lam_f, lam_b]), (2 * i,)
            )
            conv = jnp.abs(lam_prev - lam_b) <= tol * jnp.maximum(
                jnp.abs(lam_b), tiny
            )
            return (z0n, Xn, vlqn, lam_b, hist, i + 1, conv)

        c0 = (
            x0c, X, xl, jnp.asarray(jnp.inf, dt),
            jnp.full((2 * cap,), jnp.nan, dt),
            jnp.asarray(0, jnp.int32), jnp.asarray(False),
        )
        z0, Xo, vlq, _, hist, i, _ = jax.lax.while_loop(cond, body, c0)
        return z0, Xo, vlq, jnp.concatenate([hist, i.astype(dt)[None]])

    return jax.jit(loop)


def place_eigsh_sharded(mesh: Mesh, X, Am, Mm=None, VM=None):
    """Shard the iterate / operator / mass / deflation mid-stacks along
    the train (leading middle-core axis)."""
    n_stages = mesh.shape["model"]
    if X.shape[0] % n_stages != 0:
        raise ValueError(
            f"train sharding needs the middle-core count ({X.shape[0]}) "
            f"divisible by the model axis ({n_stages}); pad the train or "
            "choose a different mesh"
        )
    spec = NamedSharding(mesh, P("model"))
    out = [jax.device_put(X, spec), jax.device_put(Am, spec)]
    out.append(None if Mm is None else jax.device_put(Mm, spec))
    out.append(None if VM is None else jax.device_put(VM, spec))
    return tuple(out)


def als_eigsh_sharded(
    mesh: Mesh,
    op: PackedTTOp,
    x0: PackedTT,
    sweeps: int = 10,
    tol: float = 1e-10,
    deflate: Tuple[PackedTT, ...] = (),
    shift: float = None,
    mass: PackedTTOp = None,
) -> Tuple[PackedTT, float, List[float]]:
    """Smallest eigenpair of a symmetric TT-operator by one-site DMRG
    with the trains AND every environment chain sharded along the
    mesh's ``model`` axis.

    Same contracts as :func:`ops.eigen.als_eigsh` (generalized local
    solves under ``mass``, penalty deflation via ``deflate``/``shift``,
    stop when the per-sweep Rayleigh improvement drops below
    ``tol * |lam|``); per-chip memory scales as ``1/P``, including the
    initial right-canonicalization (a distributed sweep).  Needs
    ``d - 2`` divisible by the model-axis size and, when deflating,
    deflation trains of one shared rank (the fused-sweep stacking).
    Returns ``(x, lam, history)``.
    """
    dt = x0.first.dtype
    use_mass = mass is not None
    use_pen = bool(deflate)

    if use_pen and len({v.rank for v in deflate}) != 1:
        raise ValueError(
            "als_eigsh_sharded needs deflation trains of one shared "
            "rank; pad them with ops.packed.pad_rank"
        )
    if use_pen and shift is None:
        shift = _default_shift(
            op, x0, mass,
            eigsh=lambda m, x, sweeps: als_eigsh_sharded(
                mesh, m, x, sweeps=sweeps
            ),
        )
    shift_d = jnp.asarray(0.0 if shift is None else shift, dt)

    m = x0.mids.shape[0]
    Mm = mass.mids.astype(dt) if use_mass else jnp.zeros((m,), dt)
    if use_pen:
        VM = jnp.stack(
            [v.mids.astype(dt) for v in deflate], axis=1
        )
        v0 = jnp.stack([v.first[None].astype(dt) for v in deflate])
        vl = jnp.stack([v.last[..., None].astype(dt) for v in deflate])
    else:
        VM = jnp.zeros((m,), dt)
        v0 = jnp.zeros((0, 1, 1, 1), dt)
        vl = jnp.zeros((0, 1, 1, 1), dt)

    X, Am, Mm, VM = place_eigsh_sharded(
        mesh, x0.mids, op.mids.astype(dt), Mm, VM
    )

    # distributed right-canonicalization (R factors absorbed left)
    carry, X, last_q = tt_right_orth_sharded(mesh, X, x0.last)
    x0c = jnp.matmul(x0.first, carry, precision="highest")[None]
    xl = last_q[..., None]
    a0 = op.first[None].astype(dt)
    al = op.last[..., None].astype(dt)
    mk0 = mass.first[None].astype(dt) if use_mass else jnp.zeros((), dt)
    mkl = (
        mass.last[..., None].astype(dt) if use_mass
        else jnp.zeros((), dt)
    )

    history: List[float] = []
    lam = float("inf")
    if sweeps <= 0:
        return PackedTT(x0c[0], X, xl[..., 0]), lam, history
    # one program for the whole sweep loop — no host syncs between
    # sweeps; cap bucketed to powers of two so nearby budgets share a
    # compile (mirrors ops.eigen.als_eigsh's fused path)
    cap = 1 << max(sweeps - 1, 1).bit_length()
    z0, X, xl, rec = _eig_loop_sharded_fn(mesh, use_mass, use_pen, cap)(
        x0c, X, xl, a0, Am, al, mk0, Mm, mkl, v0, VM, vl, shift_d,
        jnp.asarray(sweeps, jnp.int32), jnp.asarray(tol, dt),
    )
    rec = np.asarray(rec)  # ONE host fetch for the whole loop
    n_done = int(rec[-1])
    history = [float(v) for v in rec[: 2 * n_done]]
    if history:
        lam = history[-1]
    return PackedTT(z0[0], X, xl[..., 0]), lam, history


def _inner_sharded(mesh: Mesh, a: PackedTT, b: PackedTT) -> float:
    """Distributed zipper inner product of two train-sharded packed
    trains (fine for expectations; NOT for near-cancelling differences
    — those go through the orthogonalization-sweep norm)."""
    from tensor_networks_tpu.parallel.sweeps import tt_inner_train_sharded

    return float(tt_inner_train_sharded(
        mesh, a.first, a.mids, a.last, b.first, b.mids, b.last
    ))


def als_eigsh_k_sharded(
    mesh: Mesh,
    op: PackedTTOp,
    x0: PackedTT,
    k: int,
    sweeps: int = 10,
    shift: float = None,
    mass: PackedTTOp = None,
    **kw,
) -> Tuple[List[PackedTT], List[float]]:
    """Lowest ``k`` eigenpairs with the trains sharded: each pair is an
    :func:`als_eigsh_sharded` run with all previously found pairs
    deflated — compile-once slot semantics of
    :func:`ops.eigen.als_eigsh_k` (the deflation stack is filled with
    zero trains at a shared rank from the first pair, so all ``k``
    solves share ONE shard_map program), with the clean Rayleigh
    quotients computed distributed.  Returns ``(vectors, values)``
    sorted ascending."""
    from tensor_networks_tpu.ops.packed import pad_rank
    from tensor_networks_tpu.parallel.evolve import ttop_apply_sharded

    if k > 1 and shift is None:
        shift = _default_shift(
            op, x0, mass,
            eigsh=lambda m, x, sweeps: als_eigsh_sharded(
                mesh, m, x, sweeps=sweeps
            ),
        )
    base_deflate = tuple(kw.pop("deflate", ()))

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

    found: List[PackedTT] = []
    vals: List[float] = []
    for _ in range(k):
        defl = base_deflate + tuple(found)
        if len(defl) < nslots:
            defl = defl + (zero_slot,) * (nslots - len(defl))
        v, _, _ = als_eigsh_sharded(
            mesh, op, x0, sweeps=sweeps, deflate=defl, shift=shift,
            mass=mass, **kw,
        )
        mv = (
            ttop_apply_sharded(mesh, mass, v) if mass is not None else v
        )
        lam = (
            _inner_sharded(
                mesh, v, ttop_apply_sharded(mesh, op, v)
            ) / _inner_sharded(mesh, v, mv)
        )
        found.append(v)
        vals.append(lam)
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    return [found[i] for i in order], [vals[i] for i in order]


def als_eigsh_adaptive_sharded(
    mesh: Mesh,
    op: PackedTTOp,
    x0: PackedTT,
    eps: float = 1e-8,
    max_rank: int = None,
    sweeps_per_rank: int = 4,
    enrich: bool = True,
    mass: PackedTTOp = None,
    **kw,
) -> Tuple[PackedTT, float, List[float]]:
    """Rank-adaptive distributed smallest eigenpair: the geometric
    ladder of :func:`ops.eigen.als_eigsh_adaptive` with every piece
    distributed — the eigen-residual train ``A x - lam (M) x`` is
    assembled core-locally, its norm comes from the distributed
    orthogonalization sweep, and the AMEn kick basis from the
    distributed Gram truncation.  Returns ``(x, lam, history)``."""
    from tensor_networks_tpu.ops.packed import pad_rank, scale
    from tensor_networks_tpu.parallel.als import (
        _norm_sharded,
        _round_fixed_sharded,
    )
    from tensor_networks_tpu.parallel.evolve import (
        add_sharded,
        ttop_apply_sharded,
    )

    spec = NamedSharding(mesh, P("model"))
    rank = x0.rank
    ceiling = int(max_rank) if max_rank is not None else 8 * rank
    x = PackedTT(x0.first, jax.device_put(x0.mids, spec), x0.last)
    hist_all: List[float] = []
    while True:
        x, lam, hist = als_eigsh_sharded(
            mesh, op, x, sweeps=sweeps_per_rank, mass=mass, **kw
        )
        hist_all += hist
        lam_x = (
            scale(x, -lam)
            if mass is None
            else scale(ttop_apply_sharded(mesh, mass, x), -lam)
        )
        resid_train = add_sharded(
            mesh, ttop_apply_sharded(mesh, op, x), lam_x
        )
        resid = _norm_sharded(
            mesh, resid_train.first, resid_train.mids, resid_train.last
        )
        if resid <= eps * max(abs(lam), 1e-300) or rank >= ceiling:
            return x, lam, hist_all
        new_rank = min(2 * rank, ceiling)
        kick = new_rank - x.rank
        if enrich and kick > 0:
            z = _round_fixed_sharded(mesh, resid_train, kick)
            span = PackedTT(jnp.zeros_like(z.first), z.mids, z.last)
            x = add_sharded(mesh, x, span)
        else:
            z = pad_rank(x, new_rank)
            x = PackedTT(
                z.first, jax.device_put(z.mids, spec), z.last
            )
        rank = new_rank
