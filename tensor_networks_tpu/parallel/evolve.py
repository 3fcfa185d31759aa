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
    "evolve_tdvp_sharded",
    "place_tdvp_sharded",
    "tdvp_step_sharded",
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
    the train — see :func:`place_tdvp_sharded`).  Returns
    ``(x0', X', xl', norm)``."""
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
    per-chip memory scales as ``1/P``, including the initial
    right-canonicalization (distributed QR sweep — the full train is
    never materialized on one device).  Needs ``d - 2`` divisible by
    the model-axis size.  Returns ``(u_final, norms)``; the per-step
    norm fetch is the step barrier (one scalar per step).
    """
    dtp = u0.first.dtype
    X, Am = place_tdvp_sharded(mesh, u0.mids, A.mids.astype(dtp))
    carry, X, last_q = tt_right_orth_sharded(mesh, X, u0.last)
    x0 = jnp.matmul(u0.first, carry, precision="highest")[None]
    xl = last_q[..., None]
    a0 = A.first[None].astype(dtp)
    al = A.last[..., None].astype(dtp)
    h = jnp.asarray(float(dt), dtp)
    norms: List[float] = []
    for _ in range(steps):
        x0, X, xl, nrm = tdvp_step_sharded(
            mesh, x0, X, xl, a0, Am, al, h,
            dense_limit=dense_limit, kdim=krylov,
        )
        norms.append(float(nrm))
    return PackedTT(x0[0], X, xl[..., 0]), norms
