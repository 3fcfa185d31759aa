"""Core linear-algebra kernels (jit-compiled XLA, host-side rank decisions).

Design: XLA cannot produce dynamically-shaped outputs, so every truncation
decision follows the same protocol —

  1. a jitted kernel computes the full (static-shape) factorization on
     device,
  2. the (tiny) singular/eigen-value vector is pulled to host,
  3. the host picks the truncation rank, and
  4. the factors are sliced on device (slice shapes are static per call
     site, so XLA caches one executable per observed shape).

Parity reference: ``pytens/utils.py:19-100`` (delta_svd truncation rule),
``pytens/algs.py:1707-1763`` (eps_to_rank, gram_eig_and_svd).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class TruncSVD:
    """A delta-truncated SVD plus the unused part of the error budget."""

    u: jnp.ndarray
    s: jnp.ndarray
    v: jnp.ndarray
    remaining_delta: float
    delta: Optional[float] = None


@partial(jax.jit, static_argnames=("tall",))
def _svd_kernel(a: jnp.ndarray, tall: bool):
    """Full thin SVD.  For very tall matrices go through QR first so the
    SVD runs on a small square matrix (MXU-friendly)."""
    if tall:
        q, r = jnp.linalg.qr(a, mode="reduced")
        u, s, vt = jnp.linalg.svd(r, full_matrices=False)
        return q @ u, s, vt
    u, s, vt = jnp.linalg.svd(a, full_matrices=False)
    return u, s, vt


def _host_svd_threshold() -> int:
    """Below this element count, TPU-backend SVDs run on the host.

    On TPU, XLA's SVD is an iterative custom lowering that costs a fresh
    multi-second compile per matrix shape (minutes through a remote
    relay) — for the small, shape-diverse matrices of structure search
    and graph rounding, host LAPACK wins on wall-clock and accuracy.
    Large matrices still go to the device.  Tune with
    ``TNT_DEVICE_SVD_MIN`` (elements); CPU/GPU backends are unaffected.
    """
    import os

    return int(os.environ.get("TNT_DEVICE_SVD_MIN", 1 << 20))


def svd_full(a) -> Tuple:
    """Thin SVD ``a = u @ diag(s) @ vt``.

    Device by default; small **host-resident** matrices on the TPU
    backend run on host LAPACK and return **NumPy** factors (device
    round trips through the relay cost more than the math — convert at
    your boundary if you need device arrays).  Device-resident inputs
    always stay on device: fetching them here would be a blocking
    relay round trip per call, breaking the packed sweeps'
    "nothing leaves the device" contract.
    """
    if not hasattr(a, "shape"):
        a = np.asarray(a)
    m, n = a.shape
    if (
        isinstance(a, np.ndarray)
        and jax.default_backend() == "tpu"
        and a.size < _host_svd_threshold()
    ):
        # np.asarray is free for host inputs; do NOT device_put first —
        # a put-then-fetch round trip through the relay costs seconds
        # (measured 43 s/array in one session) for zero work
        a_np = np.asarray(a)
        try:
            u, s, vt = np.linalg.svd(a_np, full_matrices=False)
        except np.linalg.LinAlgError:
            # LAPACK reports failure by raising (unlike JAX's NaN
            # convention that delta_svd handles); QR + SVD of the small
            # R factor is the reference's recovery (pytens/utils.py:62)
            q, r = np.linalg.qr(a_np, mode="reduced")
            u_r, s, vt = np.linalg.svd(r, full_matrices=False)
            u = q @ u_r
        # return HOST arrays: pushing factors back to the device and
        # re-fetching them costs relay round trips that dwarf the math
        # for search-sized tensors; consumers that need device arrays
        # convert exactly once at their boundary
        return u, s, vt
    return _svd_kernel(jnp.asarray(a), bool(m > 10 * n))


@jax.jit
def _qr_kernel(a: jnp.ndarray):
    return jnp.linalg.qr(a, mode="reduced")


def qr_reduced(a):
    """Reduced QR (device; small-host-resident-on-TPU → host NumPy, same
    contract and rationale as :func:`svd_full` — graph rewrites produce
    many one-off host shapes, while device operands never leave the
    device)."""
    if not hasattr(a, "shape"):
        a = np.asarray(a)
    if (
        isinstance(a, np.ndarray)
        and jax.default_backend() == "tpu"
        and a.size < _host_svd_threshold()
    ):
        # host arrays out, no device_put first — same rationale as
        # svd_full
        q, r = np.linalg.qr(np.asarray(a), mode="reduced")
        return q, r
    return _qr_kernel(jnp.asarray(a))


def qr_reduced_padded(a, r: int):
    """Reduced QR of ``a`` (m x k) zero-padded so that q has exactly ``r``
    columns and R has ``r`` rows.

    Used by right-orthogonalization when a core is rank-deficient
    (k < r); parity with ``pytens/algs.py:1679-1685``.
    """
    q, rr = qr_reduced(a)
    cols = q.shape[1]
    if cols < r:
        xp = np if isinstance(q, np.ndarray) else jnp
        q = xp.pad(q, ((0, 0), (0, r - cols)))
        rr = xp.pad(rr, ((0, r - cols), (0, 0)))
    return q, rr


def _trunc_rank(s_host: np.ndarray, delta: float) -> Tuple[int, float]:
    """The TT-SVD truncation rule.

    Drop the largest trailing block of singular values whose squared sum
    stays within ``delta**2``; keep at least rank 1.  Returns the kept rank
    and the squared error actually spent.
    """
    tail = np.cumsum(s_host[::-1] ** 2)
    k = int(np.searchsorted(tail, delta**2, side="right"))
    rank = max(len(s_host) - k, 1)
    used = float(tail[k - 1]) if k > 0 else 0.0
    return rank, used


def delta_svd(data, delta: float, with_normalizing: bool = False) -> TruncSVD:
    """Delta-truncated SVD of a matrix.

    If ``with_normalizing`` is set the budget is first scaled by the
    Frobenius norm of ``data`` (relative truncation) and the scaled delta
    is reported back in the result.

    Resilience: a diverged SVD (NaN singular values — JAX reports failure
    through values, not exceptions) falls back to QR + SVD of the small
    R factor, mirroring the reference's LinAlgError fallback
    (``pytens/utils.py:62-68``).
    """
    u, s, vt = svd_full(data)
    s_host = np.asarray(s)
    if not np.all(np.isfinite(s_host)):
        q, r = qr_reduced(data)
        lin = np.linalg if isinstance(r, np.ndarray) else jnp.linalg
        u_small, s, vt = lin.svd(r, full_matrices=False)
        u = q @ u_small
        s_host = np.asarray(s)

    if with_normalizing:
        norm = float(np.sqrt(np.sum(s_host**2)))
        delta = delta * norm

    rank, used = _trunc_rank(s_host, delta)
    remaining = float(np.sqrt(max(delta**2 - used, 0.0)))
    return TruncSVD(
        u[:, :rank],
        s[:rank],
        vt[:rank, :],
        remaining,
        delta if with_normalizing else None,
    )


def eps_to_rank(s, eps: float) -> int:
    """Smallest kept rank whose dropped tail has norm at most ``eps``."""
    s = np.asarray(s)
    ok = np.sqrt(np.cumsum(s[::-1] ** 2))[::-1] <= eps
    pos = int(np.argmax(ok))
    if pos == 0 and not ok[0]:
        return int(s.shape[0])
    if pos == 0 and ok[0]:
        return 1
    return pos


@jax.jit
def _gram_weighted_cross(gl: jnp.ndarray, gr: jnp.ndarray):
    """Eigendecompose both Gram matrices and form the weighted cross
    matrix  diag(l^1/2) Vl^T Vr diag(r^1/2)  plus its SVD."""
    eigl, vl = jnp.linalg.eigh(gl)
    eigr, vr = jnp.linalg.eigh(gr)
    eigl = jnp.abs(eigl)
    eigr = jnp.abs(eigr)
    l12 = jnp.sqrt(eigl)
    r12 = jnp.sqrt(eigr)
    # zero out numerically-null directions (relative 1e-8 threshold)
    l12 = jnp.where(l12 <= jnp.max(l12) * 1e-8, 0.0, l12)
    r12 = jnp.where(r12 <= jnp.max(r12) * 1e-8, 0.0, r12)
    lm12 = jnp.where(l12 == 0.0, 0.0, 1.0 / jnp.where(l12 == 0.0, 1.0, l12))
    rm12 = jnp.where(r12 == 0.0, 0.0, 1.0 / jnp.where(r12 == 0.0, 1.0, r12))
    tmp = (l12[:, None] * vl.T) @ (vr * r12[None, :])
    u, s, vt = jnp.linalg.svd(tmp, full_matrices=False)
    return vl, vr, l12, r12, lm12, rm12, u, s, vt


def gram_eig_and_svd(gl, gr, delta: float):
    """Gram-SVD factor pair for one TT-rounding step.

    Given left/right Gram matrices of the bond, returns ``(curr, next)``
    such that contracting ``curr`` into the current core and ``next`` into
    the next core truncates the bond to the delta-determined rank.
    TPU-friendly: eigh + GEMMs + one small SVD, no pivoting.
    Parity reference: ``pytens/algs.py:1719-1763``.
    """
    gl = jnp.asarray(gl)
    gr = jnp.asarray(gr)
    vl, vr, _l12, _r12, lm12, rm12, u, s, vt = _gram_weighted_cross(gl, gr)
    s_host = np.asarray(s)
    rk = min(s_host.shape[0], eps_to_rank(s_host, delta))

    u = u[:, :rk]
    s_kept = s[:rk]
    vt = vt[:rk, :]
    curr = vl @ (lm12[:, None] * u)
    nxt = (s_kept[:, None] * vt * rm12[None, :]) @ vr.T
    return curr, nxt
