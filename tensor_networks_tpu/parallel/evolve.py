"""Distributed (train-sharded) TDVP: time integration past one chip's HBM.

Same placement as :mod:`tensor_networks_tpu.parallel.sweeps` — core
block k on device k, the pipeline placement — applied to the one-site
projector-splitting integrator (:mod:`ops.evolve`).  The per-core
ENVIRONMENT chains are the memory hog of DMRG-style algorithms
(``d x r x s x r`` against the state's ``d x r x n x r``); here each
device stores only its block's environments, so the integrator's
working set scales as ``1/P`` per chip while the sweep's carries — an
``(r, s, r)`` operator environment plus an ``(r, r)`` bond factor —
hop between neighbors over ICI via ``lax.ppermute``.

The sweep is inherently sequential along the train (one device active
per stage, as in :func:`sweeps.tt_gram_round_sharded`): the win is
CAPACITY, not wall-clock.  Arithmetic is the fused single-device step
(:func:`ops.evolve._tdvp_step_impl`) call for call, pinned by parity
tests at roundoff.

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
    _fused_operands,
    _site_evolve,
    _split_left,
    _split_right,
)
from tensor_networks_tpu.ops.packed import PackedTT, PackedTTOp

__all__ = ["evolve_tdvp_sharded", "tdvp_step_sharded"]


def _replicate_from(x, my, src):
    """psum-replicate a value only device ``src`` holds."""
    return jax.lax.psum(
        jnp.where(my == src, x, jnp.zeros_like(x)), "model"
    )


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

        # ---- right-env chain (staged right-to-left), envs stay local --
        r_last = _adv_right(one3, xl, al)
        carry = jax.lax.pcast(r_last, ("model",), to="varying")
        rs_local = jnp.zeros(
            (X_local.shape[0],) + r_last.shape, dtp
        )

        def renv_body(R, inp):
            xk, ak = inp
            return _adv_right(R, xk, ak), R

        for stage in range(n_stages - 1, -1, -1):
            def active(args):
                c, bx, ba = args
                # reverse scan emitting the PRE-absorb env at each core:
                # rs[j] = env of everything right of local core j
                return jax.lax.scan(
                    renv_body, c, (bx, ba), reverse=True
                )

            def passive(args):
                c, bx, _ = args
                # derive zeros from the (varying) carry so the cond
                # branches agree on shard_map's varying-axes types
                return c, jnp.broadcast_to(
                    c * 0.0, (bx.shape[0],) + c.shape
                )

            new_carry, rs_blk = jax.lax.cond(
                my == stage, active, passive, (carry, X_local, Am_local)
            )
            rs_local = jnp.where(my == stage, rs_blk, rs_local)
            if stage > 0:
                perm = [(s, (s - 1) % n_stages) for s in range(n_stages)]
                carry = jax.lax.ppermute(new_carry, "model", perm)
            else:
                carry = new_carry
        r_front = _replicate_from(carry, my, 0)

        # ---- forward half-sweep: boundary replicated, mids staged -----
        z = _site_evolve(one3, a0, r_front, x0, -0.5 * h, dense_limit, kdim)
        x0q, smat = _split_left(z)
        lenv = _adv_left(one3, x0q, a0)
        smat = _bond_evolve(lenv, r_front, smat, +0.5 * h, dense_limit, kdim)

        def fwd_body(c, inp):
            L, s = c
            xk, ak, Rk = inp
            zk = jnp.einsum("ab,bnc->anc", s, xk, precision="highest")
            zk = _site_evolve(L, ak, Rk, zk, -0.5 * h, dense_limit, kdim)
            q, s2 = _split_left(zk)
            Ln = _adv_left(L, q, ak)
            s2 = _bond_evolve(Ln, Rk, s2, +0.5 * h, dense_limit, kdim)
            return (Ln, s2), (q, L)  # emit the PRE-update env

        carryL = jax.lax.pcast(lenv, ("model",), to="varying")
        carryS = jax.lax.pcast(smat, ("model",), to="varying")
        Q_local = jnp.zeros_like(X_local)
        ls_local = jnp.zeros((X_local.shape[0],) + lenv.shape, dtp)
        for stage in range(n_stages):
            def active_f(args):
                cl, cs, bx, ba, brs = args
                (cl2, cs2), (qs, lss) = jax.lax.scan(
                    fwd_body, (cl, cs), (bx, ba, brs)
                )
                return cl2, cs2, qs, lss

            def passive_f(args):
                cl, cs, bx, _, _ = args
                return (
                    cl, cs, bx * 0.0,
                    jnp.broadcast_to(
                        cl * 0.0, (bx.shape[0],) + cl.shape
                    ),
                )

            ncl, ncs, qs, lss = jax.lax.cond(
                my == stage, active_f, passive_f,
                (carryL, carryS, X_local, Am_local, rs_local),
            )
            Q_local = jnp.where(my == stage, qs, Q_local)
            ls_local = jnp.where(my == stage, lss, ls_local)
            if stage < n_stages - 1:
                perm = [(s, (s + 1) % n_stages) for s in range(n_stages)]
                carryL = jax.lax.ppermute(ncl, "model", perm)
                carryS = jax.lax.ppermute(ncs, "model", perm)
            else:
                carryL, carryS = ncl, ncs
        l_back = _replicate_from(carryL, my, n_stages - 1)
        smat = _replicate_from(carryS, my, n_stages - 1)

        # ---- last core (replicated; evolved twice = a full -h step,
        # matching the fused single-device form) ------------------------
        zl = jnp.einsum("ab,bnc->anc", smat, xl, precision="highest")
        zl = _site_evolve(l_back, al, one3, zl, -0.5 * h, dense_limit, kdim)
        zl = _site_evolve(l_back, al, one3, zl, -0.5 * h, dense_limit, kdim)
        xlq, smat = _split_right(zl)
        renv = _adv_right(one3, xlq, al)
        smat = _bond_evolve(l_back, renv, smat, +0.5 * h, dense_limit, kdim)

        # ---- backward half-sweep (staged right-to-left) ----------------
        def bwd_body(c, inp):
            R, s = c
            qk, ak, Lk = inp
            zk = jnp.einsum("anb,bc->anc", qk, s, precision="highest")
            zk = _site_evolve(Lk, ak, R, zk, -0.5 * h, dense_limit, kdim)
            vk, s2 = _split_right(zk)
            Rn = _adv_right(R, vk, ak)
            s2 = _bond_evolve(Lk, Rn, s2, +0.5 * h, dense_limit, kdim)
            return (Rn, s2), vk

        carryR = jax.lax.pcast(renv, ("model",), to="varying")
        carryS = jax.lax.pcast(smat, ("model",), to="varying")
        V_local = jnp.zeros_like(X_local)
        for stage in range(n_stages - 1, -1, -1):
            def active_b(args):
                cr, cs, bq, ba, bls = args
                (cr2, cs2), vs = jax.lax.scan(
                    bwd_body, (cr, cs), (bq, ba, bls), reverse=True
                )
                return cr2, cs2, vs

            def passive_b(args):
                cr, cs, bq, _, _ = args
                return cr, cs, bq * 0.0

            ncr, ncs, vs = jax.lax.cond(
                my == stage, active_b, passive_b,
                (carryR, carryS, Q_local, Am_local, ls_local),
            )
            V_local = jnp.where(my == stage, vs, V_local)
            if stage > 0:
                perm = [(s, (s - 1) % n_stages) for s in range(n_stages)]
                carryR = jax.lax.ppermute(ncr, "model", perm)
                carryS = jax.lax.ppermute(ncs, "model", perm)
            else:
                carryR, carryS = ncr, ncs
        r_back = _replicate_from(carryR, my, 0)
        smat = _replicate_from(carryS, my, 0)

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
    return jax.jit(fn)


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
    the train).  Returns ``(x0', X', xl', norm)``."""
    return _tdvp_sharded_fn(mesh, int(dense_limit), int(kdim))(
        x0, X, xl, a0, Am, al, h
    )


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
    per-chip memory scales as ``1/P``.  Needs ``d - 2`` divisible by
    the model-axis size.  Returns ``(u_final, norms)``; the per-step
    norm fetch is the step barrier (one scalar per step).
    """
    dtp = u0.first.dtype
    x0, X, xl, a0, Am, al = _fused_operands(A, u0)
    X, Am = place_tdvp_sharded(mesh, X, Am)
    h = jnp.asarray(float(dt), dtp)
    norms: List[float] = []
    for _ in range(steps):
        x0, X, xl, nrm = tdvp_step_sharded(
            mesh, x0, X, xl, a0, Am, al, h,
            dense_limit=dense_limit, kdim=krylov,
        )
        norms.append(float(nrm))
    return PackedTT(x0[0], X, xl[..., 0]), norms
