"""Maxvol pivot selection: dominant-submatrix row search.

Given a tall matrix A (n x r), find r rows I such that the submatrix A[I]
is (quasi-)dominant, and return the interpolation coefficients
B = A @ A[I]^{-1} (so A == B @ A[I] up to the maxvol tolerance).

Two implementations with identical semantics:

* :func:`maxvol` — host NumPy; LU-pivot initialization plus rank-1 swap
  updates.  Robust default for the small fiber matrices cross
  approximation produces.
* :func:`maxvol_device` — jit-compiled JAX (``lax.while_loop`` over
  argmax + rank-1 updates); keeps large fiber matrices on device.

Replaces the reference's foreign dependency ``tntorch.py_maxvol``
(``pytens/cross/cross.py:80-94``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_DEVICE_SIZE_THRESHOLD = 64 * 1024  # entries; below this, host wins


def _q(mag: np.ndarray) -> np.ndarray:
    """Decision-hardened magnitudes: values within 1e-6 relative of
    each other TIE (argmax then picks the first index).

    Pivot selection is a chain of argmax decisions; a near-tie flipped
    by sub-1e-13 evaluation noise (e.g. the TPU vs CPU rounding
    residuals of the double-word fiber path — both exact to ~1e-14,
    but with different low-bit patterns) sends the whole cross down a
    different pivot trajectory — measured round 5: ONE flipped row of
    a (288, 9) fiber at sweep 2 of a rank-24 fixture was the entire
    difference between a 5e-14 and a 1.6e-7 final model, and each
    platform broke that fixed tie its own way in every seed (10/10 vs
    0/5).  The rank-1 update chain amplifies input noise, so the tie
    window must sit far above it: 1e-6 relative.  That granularity is
    quality-neutral — maxvol runs at tol 1.05, and candidates within
    1e-6 of each other are volume-equivalent; only the DECISION is
    quantized, never the arithmetic.
    """
    m = np.max(mag) if mag.size else 0.0
    if m <= 0:
        return mag
    return np.round(mag * (1e6 / m))


def _lu_row_pivots(a: np.ndarray) -> np.ndarray:
    """Rows chosen by partially-pivoted Gaussian elimination: a cheap,
    well-conditioned starting set for the maxvol iteration."""
    a = np.array(a, dtype=np.float64)
    n, r = a.shape
    piv = np.arange(n)
    for k in range(r):
        i = k + int(np.argmax(_q(np.abs(a[k:, k]))))
        if i != k:
            a[[k, i]] = a[[i, k]]
            piv[[k, i]] = piv[[i, k]]
        if a[k, k] != 0.0:
            a[k + 1 :, k] /= a[k, k]
            a[k + 1 :, k + 1 :] -= np.outer(a[k + 1 :, k], a[k, k + 1 :])
    return piv[:r]


def maxvol(
    a, tol: float = 1.05, max_iters: int = 200
) -> Tuple[np.ndarray, np.ndarray]:
    """Host maxvol.  Returns (row indices I, coefficients B = A A[I]^-1)."""
    a = np.asarray(a, dtype=np.float64)
    n, r = a.shape
    if n <= r:
        return np.arange(n), np.eye(n)

    rows = _lu_row_pivots(a)
    b = np.linalg.solve(a[rows].T, a.T).T  # A @ inv(A[rows])
    for _ in range(max_iters):
        flat = int(np.argmax(_q(np.abs(b))))
        i, j = divmod(flat, r)
        if abs(b[i, j]) <= tol:
            break
        # replace pivot row j by row i; rank-1 update of B
        bj = b[:, j].copy()
        bi = b[i, :].copy()
        bi[j] -= 1.0
        b -= np.outer(bj, bi) / b[i, j]
        rows[j] = i
    return rows, b


@partial(jax.jit, static_argnames=("max_iters",))
def _maxvol_kernel(a: jnp.ndarray, tol: float, max_iters: int):
    n, r = a.shape
    lu, piv = jax.scipy.linalg.lu_factor(a)
    perm = jax.lax.linalg.lu_pivots_to_permutation(piv, n)
    rows = perm[:r]
    b = jnp.linalg.solve(a[rows].T, a.T).T

    def cond(state):
        b, _, it = state
        return jnp.logical_and(
            it < max_iters, jnp.max(jnp.abs(b)) > tol
        )

    def body(state):
        b, rows, it = state
        flat = jnp.argmax(jnp.abs(b))
        i = flat // r
        j = flat % r
        bj = b[:, j]
        bi = b[i, :] - jax.nn.one_hot(j, r, dtype=b.dtype)
        b = b - jnp.outer(bj, bi) / b[i, j]
        rows = rows.at[j].set(i.astype(rows.dtype))
        return b, rows, it + 1

    b, rows, _ = jax.lax.while_loop(cond, body, (b, rows, 0))
    return rows, b


def maxvol_device(
    a, tol: float = 1.05, max_iters: int = 200
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device maxvol: the same algorithm as :func:`maxvol`, compiled to a
    single XLA while-loop so big fiber matrices never leave HBM."""
    a = jnp.asarray(a)
    n, r = a.shape
    if n <= r:
        return jnp.arange(n), jnp.eye(n, dtype=a.dtype)
    return _maxvol_kernel(a, tol, max_iters)


def maxvol_auto(a, tol: float = 1.05, max_iters: int = 200):
    """Pick host or device maxvol by problem size AND precision.

    An f64 fiber on a no-x64 backend (TPU) must stay on host: the
    device path's ``jnp.asarray`` silently truncates it to f32, and
    the interpolation coefficients it returns become the approximant's
    cores — this put a 1.6e-7 floor under the whole on-chip cross
    even after the fibers themselves were made ~1e-13-faithful
    (round 5; the CPU-x64 run of the same fixture reaches 3.9e-15).
    """
    a_np = np.asarray(a)
    if a_np.size >= _DEVICE_SIZE_THRESHOLD:
        import jax

        if a_np.dtype == np.float64 and not jax.config.jax_enable_x64:
            return maxvol(a_np, tol, max_iters)
        rows, b = maxvol_device(a_np, tol, max_iters)
        return np.asarray(rows), np.asarray(b)
    return maxvol(a_np, tol, max_iters)
