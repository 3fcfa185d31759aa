"""Theta-method time integration for TT/QTT states.

Steps ``M du/dt = -A u`` with the one-parameter theta family

    (M + theta dt A) u_{n+1} = (M - (1 - theta) dt A) u_n

— ``theta=1`` is implicit Euler (L-stable), ``theta=0.5`` is
Crank-Nicolson (second order).  Both step operators are assembled once
with the packed operator algebra (:func:`ops.packed.ttop_add` /
``ttop_scale`` / ``ttop_round``) and every step is one
:func:`ops.als.als_solve` warm-started from the previous state — after
the first step the iterate is an excellent initial guess, so steps
typically converge in 1-2 sweeps through already-compiled executables
(static shapes across the whole trajectory: the TPU-native shape of a
time loop).

No reference counterpart (``pytens`` has no time integration).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

from tensor_networks_tpu.ops.als import als_solve
from tensor_networks_tpu.ops.packed import (
    PackedTT,
    PackedTTOp,
    norm_exact,
    svd_round,
    ttop_add,
    ttop_apply_packed,
    ttop_identity,
    ttop_round,
    ttop_scale,
)

__all__ = ["evolve_theta"]


def evolve_theta(
    A: PackedTTOp,
    u0: PackedTT,
    dt: float,
    steps: int,
    theta: float = 1.0,
    mass: PackedTTOp = None,
    rank: int = None,
    sweeps: int = 4,
    tol: float = 1e-10,
    op_eps: float = 1e-13,
    callback: Optional[Callable[[int, PackedTT], None]] = None,
    **solve_kw,
) -> Tuple[PackedTT, List[float]]:
    """Integrate ``M du/dt = -A u`` for ``steps`` steps of size ``dt``.

    Returns ``(u_final, residuals)`` with one ALS residual per step.
    ``rank`` bounds the solution rank (default: ``u0``'s rank); the
    right-hand side ``(M - (1-theta) dt A) u_n`` is rounded back to it
    each step, so every shape in the loop is static.  ``callback(n, u)``
    observes the trajectory.  Extra keyword arguments reach
    :func:`als_solve` (e.g. ``spd=True`` for symmetric ``A``/``M`` —
    the step operator of a parabolic problem is SPD).
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

    u = svd_round(u0, rank) if u0.rank != rank else u0
    residuals: List[float] = []
    for step in range(steps):
        b = svd_round(ttop_apply_packed(rhs_op, u), rank)
        u, res, _ = als_solve(
            lhs, b, u, sweeps=sweeps,
            tol=tol * float(norm_exact(b)), **solve_kw,
        )
        residuals.append(res)
        if callback is not None:
            callback(step, u)
    return u, residuals
