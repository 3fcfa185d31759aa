"""Fused fixed-shape TT kernels for uniform trains.

The generic graph engine handles arbitrary topologies and ranks; when a
train is *uniform* (all middle cores share (r, n, r)), the hot operations
collapse into single ``lax.scan`` sweeps compiled to one XLA executable:

* :func:`tt_inner_fn` — the O(d n r^3) inner-product zipper, the headline
  benchmark (reference harness: ``examples/inner_product_scaling.py``),
* :func:`tt_round_fixed` — orthogonalization + truncation sweep with
  static shapes (truncated directions are zero-masked on device; bonds are
  compacted on host afterwards).

These are the kernels the multi-chip sharded paths in
:mod:`tensor_networks_tpu.parallel` build on.
"""

from __future__ import annotations

import os
import warnings
from functools import lru_cache
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensor_networks_tpu.kernels.ozaki import _pow2_exact, two_sum
from tensor_networks_tpu.network import TensorNetwork


def stack_tt_cores(
    tn: TensorNetwork,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Extract (first, stacked middles, last) from a uniform TT.

    ``first`` is (n, r), ``mids`` is (d-2, r, n, r) or None when d == 2,
    ``last`` is (r, n).  Raises ValueError if the train is not uniform.
    """
    nodes = list(tn.network.nodes)
    # insertion order must BE chain order: consecutive cores share a
    # bond index.  A shuffled uniform train would pass the shape check
    # and stack silently wrong — raise so callers take the
    # order-discovering padded path (:func:`_chain_padded`) instead.
    tensors = [tn.node_tensor(n) for n in nodes]
    for a, b in zip(tensors, tensors[1:]):
        if len(set(a.indices) & set(b.indices)) != 1:
            raise ValueError(
                "node insertion order is not chain order (consecutive "
                "cores share no unique bond)"
            )
    first = tn.value(nodes[0])
    last = tn.value(nodes[-1])
    mids = [tn.value(n) for n in nodes[1:-1]]
    if mids:
        shapes = {m.shape for m in mids}
        if len(shapes) != 1:
            raise ValueError(f"non-uniform TT cores: {sorted(shapes)}")
        return first, jnp.stack(mids), last
    return first, None, last


def _chain_padded(tn: TensorNetwork):
    """Canonicalize + zero-pad ANY linear chain for the fused sweeps.

    ``chain_cores`` handles arbitrary node layouts (axes are permuted
    into (left bond, mode, right bond) from the index metadata); ragged
    bond ranks pad to the largest rank and mixed mode sizes to the
    largest mode.  Zero padding is numerically inert for every sweep
    (zero directions carry zero spectral mass; the Cholesky modes'
    adaptive shifts tolerate the exact rank deficiency it introduces).

    Returns ``(first, mids, last, emit)`` where ``emit`` carries what
    :func:`tt_round_fixed` needs to write results back into the
    original layout: ``(order, true core shapes, perms)``.  None when
    the network is not a chain of >= 3 single-free-index cores.
    """
    from tensor_networks_tpu.ops.packed import chain_cores

    extracted = chain_cores(tn)
    if extracted is None:
        return None
    order, cores, frees, perms = extracted
    nmax = max(f.size for f in frees)
    # pow2 rank bucket (same economics as packed.pack_ragged): adaptive
    # loops round at ever-growing ranks, and each distinct padded shape
    # is a fresh multi-10s sweep compile through the relay — a bucket
    # costs a little zero-padded GEMM work and buys executable reuse
    rmax = max(
        [c.shape[-1] for c in cores[:-1]]
        + [c.shape[0] for c in cores[1:]]
    )
    rmax = max(8, 1 << (rmax - 1).bit_length())
    first = jnp.pad(
        cores[0],
        ((0, nmax - cores[0].shape[0]), (0, rmax - cores[0].shape[1])),
    )
    mids = jnp.stack(
        [
            jnp.pad(
                c,
                (
                    (0, rmax - c.shape[0]),
                    (0, nmax - c.shape[1]),
                    (0, rmax - c.shape[2]),
                ),
            )
            for c in cores[1:-1]
        ]
    )
    last = jnp.pad(
        cores[-1],
        ((0, rmax - cores[-1].shape[0]), (0, nmax - cores[-1].shape[1])),
    )
    shapes = [c.shape for c in cores]
    return first, mids, last, (order, shapes, perms)


def _bond_bounds(modes, bonds, r_pad: int) -> np.ndarray:
    """Static per-bond structural rank bounds of a (possibly padded) chain.

    ``bound_k = min(prod of true modes left of bond k, prod of true
    modes right of it, true bond dim)`` — the rank the exact bond
    matricization cannot exceed (a host SVD structurally cannot return
    more; reference semantics ``pytens/utils.py:74-84``).  The Gram
    modes' squaring noise can inflate spectra past this on padded or
    thin-ended chains, so the fast sweeps clamp kept ranks here.
    Products are capped at ``r_pad`` (where the clamp is a no-op).
    """
    nb = len(bonds)
    left = []
    p = 1
    for k in range(nb):
        p = min(p * int(modes[k]), r_pad)
        left.append(p)
    right = [0] * nb
    p = 1
    for k in range(nb - 1, -1, -1):
        p = min(p * int(modes[k + 1]), r_pad)
        right[k] = p
    return np.asarray(
        [
            min(left[k], right[k], int(bonds[k]), r_pad)
            for k in range(nb)
        ],
        np.int32,
    )


@lru_cache(maxsize=64)
def tt_inner_fn(has_mids: bool, precision: str = "highest"):
    """The jitted TT inner-product zipper.

    W_0 = A_0^T B_0;  W_k = sum_n A_k(n)^T W_{k-1} B_k(n);
    result = <W_{d-2}, A_last B_last^T>.
    Two MXU matmuls per scan step carrying an (r_a x r_b) state.

    ``precision`` defaults to full f32 MXU passes — the library's accuracy
    contract matters more than the last 2x of MXU throughput (the zipper
    is usually HBM-bound anyway); pass "default" for raw bf16 speed.
    """

    def mm(x, y):
        return jnp.matmul(x, y, precision=precision)

    def inner(first_a, mids_a, last_a, first_b, mids_b, last_b):
        w = mm(first_a.T, first_b)  # (r_a, r_b)

        if has_mids:

            def step(w, cores):
                a, b = cores  # (r_a, n, r_a2), (r_b, n, r_b2)
                ra, n, ra2 = a.shape
                rb, _, rb2 = b.shape
                # t[(b1 n), a2] = sum_a1 w[a1, b1] a[a1, n, a2]
                t = mm(w.T, a.reshape(ra, n * ra2)).reshape(rb * n, ra2)
                # w2[a2, b2] = sum_{b1, n} t[(b1 n), a2] b[(b1 n), b2]
                return mm(t.T, b.reshape(rb * n, rb2)), None

            w, _ = jax.lax.scan(step, w, (mids_a, mids_b))

        return jnp.sum(w * mm(last_a, last_b.T))

    return jax.jit(inner)


def pallas_inner_eligible(ma, mb) -> bool:
    """Route to the pallas zipper: on TPU (or when TNT_FORCE_PALLAS=1,
    which runs the kernel in interpret mode for testing), f32/bf16 cores,
    and bonds in [64, 128] — below that the bond padding wastes more
    bandwidth than the scan's carry staging costs; above the 128 lane
    width the double-buffered (rp, n, rp) core-pair blocks exceed the
    16 MB scoped-VMEM budget (measured: rp=256 n=32 needs 32 MB), and a
    doomed compile attempt costs ~20 s through the relay before the
    fallback fires."""
    import os

    backend_ok = (
        jax.default_backend() == "tpu"
        or os.environ.get("TNT_FORCE_PALLAS") == "1"
    )
    return (
        backend_ok
        and ma is not None
        and ma.dtype in (jnp.float32, jnp.bfloat16)
        and mb.dtype == ma.dtype
        and min(
            ma.shape[1], ma.shape[3], mb.shape[1], mb.shape[3]
        ) >= 64
        and max(
            ma.shape[1], ma.shape[3], mb.shape[1], mb.shape[3]
        ) <= 128
    )


def pallas_inner(fa, ma, la, fb, mb, lb, precision: str = "highest"):
    """The pallas zipper with observable fallback: a failure is logged
    and counted (kernels.pallas_ops.PATH_STATS), never swallowed
    silently — a silent fallback is an invisible ~2x perf cliff.

    ``precision``: "highest" (full f32, default), "bf16x3" (3-pass
    split, ~1e-6 relative at ~2x the speed), "default" (raw bf16).
    """
    from tensor_networks_tpu.kernels import pallas_ops as pk

    def prepadded(f, m):
        return m.shape[1] % pk.LANE == 0 and f.shape[1] == m.shape[1]

    try:
        # the fused single-dispatch kernel needs BOTH trains prepadded;
        # a mixed pair goes to the on-the-fly-padding kernel instead of
        # failing into the ~2x-slower scan
        if prepadded(fa, ma) and prepadded(fb, mb):
            out = pk.tt_inner_pallas_fused(
                fa, ma, la, fb, mb, lb, precision=precision
            )
        else:
            out = pk.tt_inner_pallas(
                fa, ma, la, fb, mb, lb, precision=precision
            )
        pk.PATH_STATS["pallas"] += 1
        return out
    except Exception as exc:
        pk.PATH_STATS["fallback"] += 1
        pk.logger.warning(
            "pallas zipper failed (%s: %s); falling back to the scan "
            "zipper — expect ~2x slower inner products",
            type(exc).__name__,
            exc,
        )
        return None


def tt_inner_fast(
    a: TensorNetwork, b: TensorNetwork, precision: str = "highest"
) -> jnp.ndarray:
    """Inner product of two uniform TTs through the fused zipper.

    On TPU with f32/bf16 cores the Pallas HBM-roof kernel is used —
    one dispatch when the train is prepadded (`kernels.pallas_ops.pad_train`),
    otherwise with an on-the-fly padding pass; elsewhere the ``lax.scan``
    zipper.  Falls back to the generic graph contraction for non-uniform
    trains.
    """
    try:
        fa, ma, la = stack_tt_cores(a)
        fb, mb, lb = stack_tt_cores(b)
    except ValueError:
        return a.inner(b)
    if (ma is None) != (mb is None):
        return a.inner(b)

    if pallas_inner_eligible(ma, mb):
        out = pallas_inner(fa, ma, la, fb, mb, lb, precision=precision)
        if out is not None:
            return out

    # the XLA scan zipper has no 3-pass mode; map to full f32
    fn = tt_inner_fn(
        ma is not None,
        "highest" if precision == "bf16x3" else precision,
    )
    if ma is None:
        ma = mb = jnp.zeros((0,))
    return fn(fa, ma, la, fb, mb, lb)


# Machine-readable rounding telemetry (PATH_STATS analogue): how many
# times each sweep mode ran, and how many NaN-detected fallbacks to the
# Householder sweep fired.  bench.py embeds this in the JSON so the
# headline number is self-reporting about whether the fast mode
# actually produced it.
ROUND_STATS = {
    "svd": 0,
    "gram": 0,
    "cholqr2": 0,
    "twosided": 0,
    "prefix": 0,
    "fallback_nan": 0,
}


def _sign_newton_schulz(a0, alpha, max_iters: int):
    """Batched matrix-sign of symmetric ``a0`` by Newton-Schulz.

    Self-terminating: iterates until ``||x @ x - I||_max`` falls under
    ~50 machine-eps (every eigenvalue pinned at +-1) or ``max_iters``.
    The iteration grows the smallest |eigenvalue| by 1.5x per step then
    converges quadratically, so the count adapts to the actual spectral
    gap instead of paying a worst-case static 100 (VERDICT r2 #8 asked
    for a log(alpha/threshold) schedule; the while-loop form is tighter
    — benign spectra stop in ~20 iterations).
    """
    dt = a0.dtype
    r = a0.shape[-1]
    eye = jnp.eye(r, dtype=dt)
    tol = 50.0 * jnp.finfo(dt).eps

    def cond(state):
        _, err, i = state
        return jnp.logical_and(i < max_iters, err > tol)

    def body(state):
        x, _, i = state
        x2 = jnp.einsum("kab,kbc->kac", x, x, precision="highest")
        x3 = jnp.einsum("kab,kbc->kac", x, x2, precision="highest")
        err = jnp.max(jnp.abs(x2 - eye[None]))
        return 1.5 * x - 0.5 * x3, err, i + jnp.int32(1)

    x0 = a0 / alpha[:, None, None]
    # derive the error init from a0 so its type (incl. shard_map
    # varying-axes) matches the body's data-dependent err
    big = jnp.max(x0) * 0.0 + jnp.asarray(jnp.finfo(dt).max, dt)
    x, _, _ = jax.lax.while_loop(cond, body, (x0, big, jnp.int32(0)))
    return x


@lru_cache(maxsize=16)
def _orth_probe_np(r: int):
    """Fixed orthonormal probe (host QR of a seeded Gaussian).

    The truncation sweeps sample each spectral projector's range as
    ``P @ probe``.  With a raw Gaussian probe the kept block's
    conditioning is the probe's (unbounded heavy tail for square
    Gaussians), which is why they needed a second CholQR pass; for any
    orthogonal projector P and ORTHONORMAL probe Qp the kept block of
    ``P @ Qp`` satisfies ``sigma in [sigma_min(Qp), sigma_max(Qp)] =
    {1}``, so one CholQR pass leaves an orthogonality defect at the
    eps level and a two-step GEMM polish reaches the dtype floor.
    Computed on host at trace time (it is a compile-time constant).
    """
    rng = np.random.default_rng(7)
    q, _ = np.linalg.qr(rng.standard_normal((r, r)))
    return q


def _proj_basis_cols(proj, masks, mach):
    """Orthonormal column bases for batched spectral projectors.

    Returns ``Q`` (same batch as ``proj``) whose first ``k_bond``
    columns (the others are zeroed by ``masks``) orthonormally span
    each projector's range: one batched CholQR pass on ``P @ Qp``
    (``Qp`` the fixed orthonormal probe above) followed by a two-step
    Newton-Schulz orthonormality polish ``Q <- Q (3I - Q^T Q)/2``.

    The polish replaces the previous second CholQR pass: it squares
    the ~eps-level defect per step using two GEMMs, where the second
    batched cholesky + triangular solve cost ~0.75 ms of panel latency
    at (49,128,128) on TPU (measured, tools/prefix_dw_profile.py) for
    identical output quality.

    The masks are applied BETWEEN the CholQR pass and the polish: the
    triangular solve never mixes later (ghost) columns into earlier
    (kept) ones, but a global polish would — on rank-deficient bonds
    the jitter-normalized ghost columns sit only ~eps/sqrt(shift)
    away from orthogonal to the kept block, and one polish step leaks
    that into the kept columns (measured 1.6e-11 f64 value error on a
    doubled train vs <1e-12 for CholQR2).  Zeroed columns stay exactly
    zero through the polish (their Gram row/column is zero), so the
    kept block polishes in isolation.
    """
    r = proj.shape[-1]
    dt = proj.dtype
    probe = jnp.asarray(_orth_probe_np(r), dt)
    c0 = jnp.einsum("kab,bc->kac", proj, probe, precision="highest")
    g = jnp.einsum("kab,kac->kbc", c0, c0, precision="highest")
    jit = (jnp.einsum("kaa->k", g) / r + 1e-30) * (20.0 * mach)
    l, _ = _chol_adaptive(g, jit)
    q = jax.lax.linalg.triangular_solve(
        l, c0, left_side=False, lower=True, transpose_a=True
    )
    q = q * masks[:, None, :]
    eye = jnp.eye(r, dtype=dt)

    # The NS polish only converges while the kept-block orthogonality
    # defect is < 1 (quadratic basin); that premise holds when the sign
    # iteration converged (kept singular values of P @ Qp ~ 1) but an
    # under-converged / near-breakdown projector can land outside it,
    # where the old CholQR2 path degraded gracefully and NS diverges.
    # Guard: measure the defect from the first Gram and, when any batch
    # entry exceeds 0.1, re-CholQR those entries before polishing
    # (lax.cond — the recovery GEMMs cost nothing on the common path).
    gq = jnp.einsum("kab,kac->kbc", q, q, precision="highest")
    tgt = eye[None] * masks[:, None, :]  # diag(mask): kept cols -> 1
    defect = jnp.max(jnp.abs(gq - tgt), axis=(-2, -1))
    bad = defect > 0.1

    def _recover(args):
        qc, gqc = args
        jit2 = (jnp.einsum("kaa->k", gqc) / r + 1e-30) * (20.0 * mach)
        l2, _ = _chol_adaptive(gqc, jit2)
        q2 = jax.lax.linalg.triangular_solve(
            l2, qc, left_side=False, lower=True, transpose_a=True
        )
        q2 = q2 * masks[:, None, :]
        q2 = jnp.where(bad[:, None, None], q2, qc)
        gq2 = jnp.einsum("kab,kac->kbc", q2, q2, precision="highest")
        return q2, gq2

    q, gq = jax.lax.cond(
        jnp.any(bad), _recover, lambda args: args, (q, gq)
    )
    for step in range(2):
        q = jnp.einsum(
            "kab,kbc->kac",
            q,
            1.5 * eye[None] - 0.5 * gq,
            precision="highest",
        )
        if step == 0:
            gq = jnp.einsum("kab,kac->kbc", q, q, precision="highest")
    return q


def _chol_adaptive(g, jit0):
    """Batched/unbatched Cholesky with per-matrix escalating shift.

    TPU Gram matmuls round differently from CPU f32 (multi-pass bf16
    accumulation, autotuned layouts), and on exactly rank-deficient
    trains that noise can exceed a mean-diagonal-scaled shift, giving a
    negative pivot -> NaN.  ``tools/nan_repro.py`` showed the round-2
    "nondeterministic miscompile" is this: the backward CholeskyQR2
    chain NaNs *deterministically* on a 2x rank-deficient train on TPU
    while the identical program is clean on CPU f32; per-process
    nondeterminism at other deficiency levels is consistent with
    autotune picking different matmul algorithms (different rounding)
    per process, flipping a borderline pivot.  Escalating the shift 32x
    per retry on exactly the matrices that failed keeps the common-case
    ghost floor at the documented ~sqrt(20 eps) while self-healing the
    deficient case.  Returns ``(L, shift_used)`` — callers must deflate
    ghosts with the *returned* shift.
    """
    eye = jnp.eye(g.shape[-1], dtype=g.dtype)
    bshape = g.shape[:-2]

    def chol(mult):
        shift = jit0 * mult
        return jnp.linalg.cholesky(
            g + shift[..., None, None] * eye
        )

    def cond(state):
        mult, l = state
        bad = jnp.any(~jnp.isfinite(l), axis=(-2, -1))
        return jnp.any(jnp.logical_and(bad, mult < 2.0**25))

    def body(state):
        mult, l = state
        bad = jnp.any(~jnp.isfinite(l), axis=(-2, -1))
        mult = jnp.where(bad, mult * 32.0, mult)
        l2 = chol(mult)
        l = jnp.where(bad[..., None, None], l2, l)
        return mult, l

    # derive the multiplier from g (not a fresh constant) so its type
    # — including shard_map varying-axes — matches the loop body's
    mult0 = g[..., 0, 0] * 0.0 + 1.0
    assert mult0.shape == bshape
    jit0 = jnp.asarray(jit0, g.dtype)
    l0 = chol(mult0)
    mult, l = jax.lax.while_loop(cond, body, (mult0, l0))
    return l, jit0 * mult


def _trunc_count(s: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Kept rank under the TT-SVD tail rule (traced, static shapes).

    Integer work stays int32: the TPU backend has no s64 path and the
    counts fit trivially.
    """
    tail = jnp.cumsum(jnp.flip(s) ** 2)
    drop = jnp.sum((tail <= delta**2).astype(jnp.int32))
    return jnp.maximum(jnp.int32(s.shape[0]) - drop, jnp.int32(1))


@lru_cache(maxsize=8)
def _tt_round_gram_sweep_fn(relative: bool):
    """Gram/CholQR rounding sweep: the all-GEMM fast mode.

    Same structure as :func:`_tt_round_sweep_fn` but orthogonalization
    uses Cholesky-QR (one Gram GEMM + triangular solve per core) and
    truncation uses the eigendecomposition of the r x r Gram matrix
    instead of a tall SVD — an order of magnitude fewer FLOPs per bond,
    all of them MXU-friendly.  Numerics: squares the condition number
    (the IPDPS'22 Gram-SVD trade-off), so singular values below
    sqrt(dtype eps) of the norm are unresolvable — only use for
    tolerances eps >> sqrt(finfo(dtype).eps) (f32: eps >= ~1e-3,
    f64: eps >= ~1e-7); otherwise use the SVD sweep.
    """

    def sweep(first, mids, last, eps, bounds=None):
        d = mids.shape[0] + 2
        r = last.shape[0]
        if bounds is None:
            bounds = jnp.full((d - 1,), r, jnp.int32)
        eps_floor = jnp.asarray(1e-30, first.dtype)

        def chol_right_orth(cur):
            # rows of cur (r, m) -> L^{-1} cur with orthonormal rows
            g = jnp.matmul(
                cur, cur.T, precision="highest"
            )
            jitter = (jnp.trace(g) / g.shape[0] + eps_floor) * (
                10.0 * jnp.finfo(g.dtype).eps
            )
            l, _ = _chol_adaptive(g, jitter)
            q = jax.scipy.linalg.solve_triangular(l, cur, lower=True)
            return l, q

        # ---- backward CholQR sweep -----------------------------------
        l, last_q = chol_right_orth(last)
        carry = l

        def back_step(carry, core):
            rr, n, rc = core.shape
            cur = jnp.einsum(
                "rnk,kc->rnc", core, carry, precision="highest"
            )
            l, q = chol_right_orth(cur.reshape(rr, n * rc))
            return l, q.reshape(rr, n, rc)

        carry, mids_q = jax.lax.scan(back_step, carry, mids, reverse=True)
        first_c = first @ carry

        # ---- forward Gram-eigh truncation sweep -----------------------
        norm = jnp.linalg.norm(first_c)
        eps = jnp.asarray(eps, first.dtype)
        budget = (eps * norm if relative else eps) / jnp.sqrt(
            jnp.asarray(d - 1.0, first.dtype)
        )

        def gram_trunc(cur, kmax):
            # cur (m, r): orthonormal-basis truncation via eigh(cur^T cur)
            # kmax = structural rank bound of the bond matricization —
            # eigenvalues past it are Gram-squaring noise (the sqrt(eps)
            # floor) and must never be kept, whatever the budget (the
            # reference's host SVD structurally cannot return them;
            # observed: k0=103 ghosts on a (32, 256) first bond)
            g = jnp.matmul(cur.T, cur, precision="highest")
            w, v = jnp.linalg.eigh(g)  # ascending
            w = jnp.flip(w, 0)
            v = jnp.flip(v, 1)
            s = jnp.sqrt(jnp.maximum(w, 0.0))
            k = jnp.minimum(_trunc_count(s, budget), kmax)
            m = (
                jnp.arange(s.shape[0], dtype=jnp.int32) < k
            ).astype(s.dtype)
            inv_s = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
            u = jnp.matmul(
                cur, v * (m * inv_s)[None, :], precision="highest"
            )
            carry_next = (m * s)[:, None] * v.T
            return u, carry_next, k

        u0, carry_sv, k0 = gram_trunc(
            first_c,
            jnp.minimum(
                jnp.int32(min(first.shape[0], first_c.shape[1])),
                bounds[0],
            ),
        )
        if u0.shape[1] < r:  # first bond can be thinner than r
            pad = r - u0.shape[1]
            u0 = jnp.pad(u0, ((0, 0), (0, pad)))
            carry_sv = jnp.pad(carry_sv, ((0, pad), (0, 0)))
        first_out = u0

        def fwd_step(carry, inputs):
            core, bound = inputs
            carry_sv, kprev = carry
            rr, n, rc = core.shape
            cur = jnp.einsum(
                "ak,knc->anc", carry_sv, core, precision="highest"
            )
            u, nxt, k = gram_trunc(
                cur.reshape(rr * n, rc),
                jnp.minimum(jnp.minimum(kprev * n, jnp.int32(rc)), bound),
            )
            return (nxt, k), (u.reshape(rr, n, -1), k)

        (carry_sv, _), (mids_out, mid_ranks) = jax.lax.scan(
            fwd_step, (carry_sv, k0), (mids_q, bounds[1:])
        )
        last_out = carry_sv @ last_q
        return first_out, mids_out, last_out, k0, mid_ranks

    return jax.jit(sweep)


@lru_cache(maxsize=8)
def _tt_round_cholqr2_sweep_fn(relative: bool):
    """Accurate all-GEMM rounding sweep: CholeskyQR2 orthogonalization +
    exact SVD truncation of the small R factors.

    CholeskyQR squares the condition number, but a *second* pass restores
    orthogonality to the eps level whenever the first pass survives —
    and a trace-scaled jitter keeps the Cholesky alive on exactly
    rank-deficient bonds (TT+TT).  The jitter inflates null-direction
    singular values to ~sqrt(jitter) ("ghosts"); truncation decisions
    deflate it back out (sqrt(s^2 - jitter)), so compaction matches the
    Householder sweep (verified at d=50 r=100 on chip).  Speed: ~32 vs
    39 ms full-sweep at d=50 r=100 on a v5e — both are dominated by
    the 48 sequential per-bond (r x r) SVDs, which on TPU cost ~700 us
    each and neither batch nor pipeline; for the fast accurate mode
    use ``method="twosided"`` (~10 ms, no eigensolvers).  An earlier
    "0.56 ms" figure timed only the backward half (the benchmark body
    did not consume the forward outputs, so XLA dead-code-eliminated
    the truncation sweep).  Scope: the ghost floor (~sqrt(40 eps)
    relative, f32 ~2e-3) limits how finely the *kept factors* resolve
    structure — use the Householder sweep for precision-critical chains
    (GMRES Krylov rounding); this sweep for tolerance-based compaction.
    Everything is GEMM + (r x r) Cholesky/SVD — no Householder panels.
    """

    def chol_rows(mat):
        """Row-orthonormalize: returns (L, Q, jitter) with mat = L @ Q."""
        g = jnp.matmul(mat, mat.T, precision="highest")
        jitter = (
            jnp.trace(g) / g.shape[0] + jnp.asarray(1e-30, mat.dtype)
        ) * (20.0 * jnp.finfo(mat.dtype).eps)
        l1, jitter = _chol_adaptive(g, jitter)
        q = jax.scipy.linalg.solve_triangular(l1, mat, lower=True)
        return l1, q, jitter

    def chol2_rows(mat):
        """Two CholQR passes; also returns the total jitter mass the R
        factor's singular values were inflated by (rank-deficient rows
        come out at ~sqrt(jitter) — *ghosts* that must not survive
        truncation decisions)."""
        l1, q1, j1 = chol_rows(mat)
        l2, q2, j2 = chol_rows(q1)
        # q1 rows are ~unit, so l2's scale is ~1: the second pass
        # inflates absolute singular values by ~j2 * ||l1 row||^2;
        # bounding with the first-pass trace scale is conservative
        scale1 = jnp.trace(l1 @ l1.T) / l1.shape[0]
        return l1 @ l2, q2, j1 + j2 * scale1

    def sweep(first, mids, last, eps, bounds=None):
        d = mids.shape[0] + 2
        r = last.shape[0]
        if bounds is None:
            bounds = jnp.full((d - 1,), r, jnp.int32)

        # ---- backward CholQR2 sweep --------------------------------
        carry, last_q, _ = chol2_rows(last)

        def back_step(carry, core):
            rr, n, rc = core.shape
            cur = jnp.einsum(
                "rnk,kc->rnc", core, carry, precision="highest"
            )
            l_tot, q, _ = chol2_rows(cur.reshape(rr, n * rc))
            return l_tot, q.reshape(rr, n, rc)

        carry, mids_q = jax.lax.scan(back_step, carry, mids, reverse=True)
        first_c = first @ carry

        # ---- forward truncation: SVD of the r x r R factor -----------
        norm = jnp.linalg.norm(first_c)
        eps = jnp.asarray(eps, first.dtype)
        budget = (eps * norm if relative else eps) / jnp.sqrt(
            jnp.asarray(d - 1.0, first.dtype)
        )

        def trunc_cols(cur, bound):
            """cur (m, rc): orthonormalize columns by CholQR2, SVD the
            R factor, mask by the budget.  The truncation decision uses
            jitter-deflated singular values (sqrt(s^2 - j)) so the
            ghost directions the regularization injects on
            rank-deficient bonds are compacted away; the kept factors
            use the exact s (the representation stays exact).  ``bound``
            is the static structural rank cap (see _bond_bounds)."""
            r_tot, qt, j_tot = chol2_rows(cur.T)  # cur = q @ r_tot.T
            u_s, s, vt = jnp.linalg.svd(r_tot.T, full_matrices=False)
            s_true = jnp.sqrt(jnp.maximum(s * s - j_tot, 0.0))
            k = jnp.minimum(_trunc_count(s_true, budget), bound)
            m = (
                jnp.arange(s.shape[0], dtype=jnp.int32) < k
            ).astype(s.dtype)
            left = jnp.matmul(
                qt.T, u_s * m[None, :], precision="highest"
            )
            return left, (m * s)[:, None] * vt, k

        u0, carry_sv, k0 = trunc_cols(first_c, bounds[0])
        if u0.shape[1] < r:
            pad = r - u0.shape[1]
            u0 = jnp.pad(u0, ((0, 0), (0, pad)))
            carry_sv = jnp.pad(carry_sv, ((0, pad), (0, 0)))
        first_out = u0

        def fwd_step(carry_sv, inputs):
            core, bound = inputs
            rr, n, rc = core.shape
            cur = jnp.einsum(
                "ak,knc->anc", carry_sv, core, precision="highest"
            )
            left, nxt, k = trunc_cols(cur.reshape(rr * n, rc), bound)
            return nxt, (left.reshape(rr, n, -1), k)

        carry_sv, (mids_out, mid_ranks) = jax.lax.scan(
            fwd_step, carry_sv, (mids_q, bounds[1:])
        )
        last_out = carry_sv @ last_q
        return first_out, mids_out, last_out, k0, mid_ranks

    return jax.jit(sweep)


@lru_cache(maxsize=8)
def _tt_round_twosided_sweep_fn(relative: bool, sign_iters: int = 100):
    """Two-sided rounding with matmul-only spectral-projector truncation.

    The classic forward truncation sweep interleaves an (r x r) SVD per
    bond into the sequential carry chain — and iterative SVD/eigh on
    TPU costs ~700 us at r=128 *and does not batch* (a vmapped SVD of
    (49,128,128) measures 33 ms — XLA unrolls it), so 48 such SVDs ARE
    the rounding wall time.  This sweep removes eigensolvers entirely:

    1. right-orthogonalize (CholeskyQR2 — GEMM/cholesky/triangular),
    2. a forward CholeskyQR2 chain collecting the bond matrices L_k
       with X = U_1..U_k L_k V_{k+1}..V_d for EVERY k (the single-chip
       form of Al Daas/Ballard-style parallel TT-rounding),
    3. per-bond truncation projectors P_k onto the above-threshold
       eigenspace of G_k = L_k^T L_k, computed for ALL bonds at once by
       a batched Newton-Schulz **matrix-sign iteration** (pure GEMMs;
       power-iteration spectral scaling) — the projector of eigenvalues
       of G_k - tau^2 I, with an orthonormal basis via one batched QR
       of P_k applied to a fixed random probe,
    4. project the cores: W_k = Q_{k-1}^T U_k Q_k (pure GEMMs).

    Truncation rule: drop directions with sigma^2 < budget^2 / r — a
    per-direction threshold whose total dropped mass is <= budget^2, so
    the error contract holds, but it can keep a few more ranks than the
    SVD sweep's maximal-tail rule on slowly-decaying spectra (exact
    rank recovery on rank-deficient inputs is identical).  Accuracy
    scope matches the cholqr2 sweep (jitter-deflated ghost handling,
    ~sqrt(40 eps) kept-factor floor); thresholds below ~1.5^-sign_iters
    of the spectral radius do not resolve — at the default 100
    iterations that is ~1e-17, i.e. never the binding constraint.
    """

    def chol_rows(mat):
        g = jnp.matmul(mat, mat.T, precision="highest")
        jitter = (
            jnp.trace(g) / g.shape[0] + jnp.asarray(1e-30, mat.dtype)
        ) * (20.0 * jnp.finfo(mat.dtype).eps)
        l1, jitter = _chol_adaptive(g, jitter)
        q = jax.scipy.linalg.solve_triangular(l1, mat, lower=True)
        return l1, q, jitter

    def chol2_rows(mat):
        l1, q1, j1 = chol_rows(mat)
        l2, q2, j2 = chol_rows(q1)
        scale1 = jnp.trace(l1 @ l1.T) / l1.shape[0]
        return l1 @ l2, q2, j1 + j2 * scale1

    def sweep(first, mids, last, eps, bounds=None):
        d = mids.shape[0] + 2
        r = last.shape[0]
        if bounds is None:
            bounds = jnp.full((d - 1,), r, jnp.int32)

        # ---- backward CholQR2: right-orthogonalize ------------------
        carry, last_q, _ = chol2_rows(last)

        def back_step(carry, core):
            rr, n, rc = core.shape
            cur = jnp.einsum(
                "rnk,kc->rnc", core, carry, precision="highest"
            )
            l_tot, q, _ = chol2_rows(cur.reshape(rr, n * rc))
            return l_tot, q.reshape(rr, n, rc)

        carry, mids_q = jax.lax.scan(back_step, carry, mids, reverse=True)
        first_c = first @ carry  # (n, r) = U_1 L_1

        # ---- forward CholQR2 chain: collect U_k and bond matrices ---
        lt1, u1t, j1 = chol2_rows(first_c.T)  # first_c = u1t.T @ lt1.T
        u_first = u1t.T  # (n, r), ~orthonormal kept columns
        l_bond = lt1.T  # (r, r)

        def fwd_step(l_prev, core):
            rr, n, rc = core.shape
            cur = jnp.einsum(
                "ak,knc->anc", l_prev, core, precision="highest"
            )
            lt, qt, j = chol2_rows(cur.reshape(rr * n, rc).T)
            return lt.T, (qt.T.reshape(rr, n, rc), lt.T, j)

        l_end, (u_mids, l_mids, j_mids) = jax.lax.scan(
            fwd_step, l_bond, mids_q
        )
        l_all = jnp.concatenate([l_bond[None], l_mids], axis=0)
        j_all = jnp.concatenate([jnp.reshape(j1, (1,)), j_mids], axis=0)

        # ---- truncation projectors for ALL bonds at once ------------
        dt = first.dtype
        # G_k = L_k L_k^T: the projector must span L's COLUMN space
        # (it is inserted as Q Q^T L_k — left singular subspace).
        # precision="highest" throughout: TPU einsum defaults to bf16,
        # which breaks the Gershgorin/NS containment (observed NaNs)
        gram = jnp.einsum(
            "kab,kcb->kac", l_all, l_all, precision="highest"
        )
        # ||X||^2 = ||L_k||_F^2 at any bond (orthogonal environments);
        # deflate the CholQR jitter mass (r directions inflated by ~j)
        norm2 = jnp.maximum(
            jnp.sum(l_all[-1] ** 2) - r * j_all[-1], 0.0
        )
        eps_b = jnp.asarray(eps, dt)
        budget2 = (
            (eps_b**2 * norm2 if relative else eps_b**2)
            / jnp.asarray(d - 1.0, dt)
        )
        # per-direction threshold: dropping every sigma^2 < budget2/r
        # drops at most budget2 of mass; +j compensates the jitter
        # inflation of G's eigenvalues
        tau2 = budget2 / r + j_all  # (d-1,)

        eye = jnp.eye(r, dtype=dt)
        a0 = gram - tau2[:, None, None] * eye[None]
        # spectral-norm bound per bond: Gershgorin row sums — GUARANTEED
        # >= |lambda|_max (an underestimate makes Newton-Schulz diverge
        # for |x| > sqrt(3); a power-iteration estimate is not safe when
        # top eigenvalues cluster), at worst sqrt(r)x loose, which only
        # costs ~log_1.5(sqrt(r)) extra iterations
        alpha = jnp.max(
            jnp.sum(jnp.abs(a0), axis=2), axis=1
        ) + jnp.asarray(1e-30, dt)

        sign = _sign_newton_schulz(a0, alpha, sign_iters)
        proj = 0.5 * (eye[None] + sign)  # (d-1, r, r)

        ks = jnp.minimum(
            jnp.clip(
                jnp.round(jnp.einsum("kaa->k", proj)).astype(jnp.int32),
                1,
                r,
            ),
            bounds,
        )
        masks = (
            jnp.arange(r, dtype=jnp.int32)[None, :] < ks[:, None]
        ).astype(dt)

        # orthonormal range basis: CholQR + Newton-Schulz polish on the
        # fixed orthonormal probe (batched QR at (49,128,128) costs
        # ~2.2 ms of panel latency on TPU; the shared GEMM-only helper
        # measures ~0.6 ms for the same masked-column contract)
        um = _proj_basis_cols(
            proj, masks, jnp.asarray(jnp.finfo(dt).eps, dt)
        )  # (d-1, r, r), masked columns

        # ---- project: W_k = Q_{k-1}^T U_k Q_k (pure GEMMs) ----------
        first_out = jnp.matmul(u_first, um[0], precision="highest")
        mids_out = jnp.einsum(
            "kam,kanb,kbp->kmnp",
            um[:-1],
            u_mids,
            um[1:],
            precision="highest",
        )
        last_out = jnp.matmul(
            um[-1].T,
            jnp.matmul(l_end, last_q, precision="highest"),
            precision="highest",
        )
        return first_out, mids_out, last_out, ks[0], ks[1:]

    return jax.jit(sweep)


@lru_cache(maxsize=8)
def _tt_round_prefix_sweep_fn(
    relative: bool,
    sign_iters: int = 100,
    unroll: int = 1,
    chain_precision: str = "high",
):
    """Batched two-sided Gram rounding: the parallel-prefix mode.

    Every other sweep in this module threads a Cholesky/QR/SVD through
    the sequential d-step carry chain — 48 small factorizations whose
    per-step latency (not FLOPs) is the rounding floor on TPU.  This
    mode restructures the Al Daas/Ballard-style Gram rounding
    (reference semantics: ``pytens/algs.py:1766-1838``) so the chains
    carry **only GEMMs** and every factorization is batched over all
    bonds at once:

    1. left Grams ``H_k`` (forward) and right Grams ``G_k`` (backward)
       of every bond matricization, two GEMMs per scan step, fused into
       ONE scan (step i advances H over core i and G over core d-1-i);
       carries are trace-rescaled each step (log-scales tracked) so
       48-step products never over/underflow,
    2. batched Cholesky whitening of all bonds: ``H = E^T E``,
       ``G = F^T F``; the bond matricization then reads
       ``M_k = Q_L (E_k F_k^T) Q_R^T`` with orthonormal Q's, so the
       singular values of the small ``W_k = E_k F_k^T`` are those of
       the bond,
    3. batched Newton-Schulz sign projectors ``P_k`` onto the
       above-threshold left singular subspace of W_k (pure GEMMs, as in
       the twosided sweep), orthonormal bases by batched CholQR2,
    4. oblique bond insertions ``a_k = E_k^{-1} Q_k``,
       ``b_k^T = Q_k^T E_k`` (batched triangular solves): inserting
       ``a_k b_k^T`` at bond k projects M_k onto its dominant subspace
       exactly (``L a b^T R^T = Q_L P W Q_R^T``); cores update in one
       batched einsum ``B_k = b_{k-1}^T A_k a_k``.

    Error rule: per-direction threshold tau^2 = budget^2 / r per bond
    (total dropped mass <= eps^2 ||X||^2, the same contract as the
    twosided sweep).  ||X||^2 = tr(H_k G_k) in each bond's own
    normalized units, so the relative threshold needs no un-scaling.

    Accuracy scope (round-4 rework): singular values down to
    ~sqrt(c * mach_eps) of the bond's sigma_max resolve — the same
    Gram-squaring class as the twosided sweep — provided the chain is
    accurate, via three mechanisms replacing round 3's trace-product
    ghost deflation (which over-truncated at ~sqrt(40 * eps * r), the
    measured rank floor of this mode):

    * ``chain_precision="dw"``: double-word carries advance both words
      through the (linear) congruence and TwoSum-renormalize each step;
      rescaling is exact powers of two, so only the final f32
      representation rounding remains.  Single-word chains instead
      accumulate ~sqrt(d n r) eps of GEMM noise, which the trust floor
      must cover — their fidelity matches the round-3 mode.
    * spectral trust filters: one extra batched sign call identifies
      the directions of H/G below the cholesky-jitter/chain-noise trust
      floor and removes them from the decision operator
      ``W = E (P_h P_g) F^T`` — exact nulls and noise ghosts die inside
      the projectors instead of inflating the threshold.
    * a per-bond noise clamp on tau^2 (~2 eps lambda_max(WW), the
      twosided sweep's "+j" analogue) pins tight-eps decisions at the
      floor instead of letting sub-noise budgets keep junk rank.

    Measured on planted spectra (d=50 n=32 r=100 f32, sigma_j =
    10^(-j/8) at the middle bond): dw resolves to sigma ~ 5.5e-4 vs the
    twosided sweep's 2.4e-4 and round 3's 7.5e-3; decisions are stable
    as eps tightens past the floor (``tests/test_prefix_round.py``).
    Value-correctness (error <= eps) holds whenever eps is above the
    mode's floor; f64 behavior is unchanged (floors ~1e-8).
    """

    def sweep(first, mids, last, eps, bounds=None):
        d = mids.shape[0] + 2
        r = last.shape[0]
        dt = first.dtype
        mach = jnp.asarray(jnp.finfo(dt).eps, dt)
        nb = d - 1  # bonds
        if bounds is None:
            bounds = jnp.full((nb,), r, jnp.int32)

        # ---- fused H/G chains: GEMM-only scan -----------------------
        h0 = jnp.matmul(first.T, first, precision="highest")
        s0 = jnp.trace(h0) / r + jnp.asarray(1e-30, dt)
        h0n = h0 / s0
        g0 = jnp.matmul(last, last.T, precision="highest")
        t0 = jnp.trace(g0) / r + jnp.asarray(1e-30, dt)
        g0n = g0 / t0

        # The H and G updates share one algebraic form,
        #   out[c, C] = sum_{a, b, n} M[a, b] X[a, n, c] X[b, n, C],
        # with X = core for H and X = core reversed end-for-end for G
        # (check by renaming: out = sum core[c,n,a] G[a,b] core[C,n,b]).
        # Stacking [core, rev(core_back)] lets ONE batched GEMM pair per
        # scan step advance both chains — half the dispatches of the
        # naive 4-einsum step, which matters because the chain is
        # per-step-latency-bound, not FLOP-bound.
        xs = jnp.stack(
            [mids, jnp.transpose(jnp.flip(mids, 0), (0, 3, 2, 1))],
            axis=1,
        )  # (d-2, 2, r, n, r)

        # chain precision: the H/G products steer truncation DECISIONS
        # (the kept factors are re-derived from them through whitening,
        # but any projector of the right rank keeps the error contract).
        # "high" (bf16x3) / "highest": single-word carries, per-step GEMM
        # noise ~sqrt(n r) eps accumulating over the d steps — covered by
        # the trust filter's chain-noise term below.  "dw": double-word
        # carries (both words advanced through the same congruence — the
        # update is linear in the carry — and renormalized by TwoSum
        # each step), which removes the accumulation term entirely and
        # leaves only the final f32 representation rounding; rescaling
        # uses exact powers of two so the compensation word survives the
        # normalization.  ~2x the chain GEMMs of "highest".
        cprec = (
            jax.lax.Precision.HIGHEST
            if chain_precision in ("highest", "dw")
            else chain_precision
        )

        def _renorm(hi, lo):
            # power-of-two trace rescale: exact on both words
            tr = jnp.einsum("yaa->y", hi) / r + jnp.asarray(1e-30, dt)
            _, e = jnp.frexp(tr)
            s = _pow2_exact(e).astype(dt)
            return hi / s[:, None, None], lo / s[:, None, None], s

        if chain_precision == "dw":

            def chain_step(m, x):
                # words ride the batch axis: ONE batched GEMM per stage
                # for all four (chain, word) products — measured faster
                # on chip than word-split einsums even when the split
                # lets the lo word run at bf16 (7.3 vs 8.1 ms; XLA's
                # one-big-GEMM schedule beats the pass savings)
                t = jnp.einsum("ywab,yanc->ywbnc", m, x, precision=cprec)
                m2 = jnp.einsum(
                    "ywbnc,ybnC->ywcC", t, x, precision=cprec
                )
                hi2, lo2 = two_sum(m2[:, 0], m2[:, 1])
                hi2, lo2, s = _renorm(hi2, lo2)
                return (
                    jnp.stack([hi2, lo2], axis=1),
                    (hi2 + lo2, s),
                )

            m0 = jnp.stack(
                [
                    jnp.stack([h0n, g0n]),
                    jnp.zeros((2, r, r), dt),
                ],
                axis=1,
            )
        else:

            def chain_step(m, x):
                # keep the sequential body pure-GEMM + rescale; the log
                # of the per-step scales is summed OUTSIDE the chain
                t = jnp.einsum("yab,yanc->ybnc", m, x, precision=cprec)
                m2 = jnp.einsum("ybnc,ybnC->ycC", t, x, precision=cprec)
                s = jnp.einsum("yaa->y", m2) / r + jnp.asarray(
                    1e-30, dt
                )
                m2 = m2 / s[:, None, None]
                return m2, (m2, s)

            m0 = jnp.stack([h0n, g0n])

        _, (m_seq, s_seq) = jax.lax.scan(
            chain_step, m0, xs, unroll=unroll
        )
        ls_seq = jnp.cumsum(jnp.log(s_seq), axis=0)  # (d-2, 2)
        h_seq, g_seq = m_seq[:, 0], m_seq[:, 1]
        lh_seq, lg_seq = ls_seq[:, 0], ls_seq[:, 1]
        # Bond k sits between cores k and k+1 (k = 0..nb-1).  The scan's
        # step i advances H over core i+1 (h_seq[i] = H at bond i+1) and
        # G over core d-2-i (g_seq[i] = G at bond d-3-i), so G comes out
        # in reverse bond order.
        h_all = jnp.concatenate([h0n[None], h_seq], axis=0)  # (nb, r, r)
        g_all = jnp.concatenate([jnp.flip(g_seq, 0), g0n[None]], axis=0)
        one0 = jnp.zeros((1,), dt)
        lh_all = jnp.log(s0) + jnp.concatenate([one0, lh_seq])
        lg_all = jnp.log(t0) + jnp.concatenate([jnp.flip(lg_seq, 0), one0])

        # ---- batched whitening ---------------------------------------
        eye = jnp.eye(r, dtype=dt)
        hg_all = jnp.concatenate([h_all, g_all], axis=0)  # (2 nb, r, r)
        jit_hg = (jnp.einsum("kaa->k", hg_all) / r + 1e-30) * (20.0 * mach)
        # ONE batched cholesky over both chains (each extra batched
        # factorization call costs ~0.5 ms of dispatch+panel latency);
        # adaptive shift escalation on rank-deficient chains
        l_hg, jit_hg = _chol_adaptive(hg_all, jit_hg)
        jit_h, jit_g = jit_hg[:nb], jit_hg[nb:]
        e_all = jnp.swapaxes(l_hg[:nb], 1, 2)  # upper: H = E^T E
        f_all = jnp.swapaxes(l_hg[nb:], 1, 2)  # upper: G = F^T F
        # the decision operator W = E F^T (sigma(W) = bond sigmas in
        # normalized units) is built AFTER the trust filters below

        # ---- thresholds ---------------------------------------------
        norm2 = jnp.einsum(
            "kab,kba->k", h_all, g_all, precision="highest"
        )  # ||X||^2 in bond-k normalized units
        eps_b = jnp.asarray(eps, dt)
        if relative:
            tau2 = eps_b**2 * norm2 / jnp.asarray((d - 1.0) * r, dt)
        else:
            tau2 = (
                eps_b**2
                / jnp.asarray((d - 1.0) * r, dt)
                * jnp.exp(-(lh_all + lg_all))
            )

        # ---- spectral trust filters ----------------------------------
        # Null-ish directions of H/G are unreliable in E/F: the cholesky
        # jitter inflates exact nulls to sqrt(jit)-norm rows of E (the
        # "ghosts"), and single-word chains add ~sqrt(d n r) eps of
        # accumulated GEMM noise on top.  Round 3 deflated these by
        # inflating tau^2 with the trace-product bound jit*tr(G)+..., a
        # bound ~r times too conservative on decaying spectra — it was
        # the measured rank-decision floor of this mode (over-truncating
        # at sigma ~ 9e-3 where the twosided sweep resolves 2.4e-4).
        # Instead, identify the untrusted subspaces spectrally — one
        # extra batched sign call over [H; G] stacked — and remove them
        # from the decision operator W = E (P_h P_g) F^T.  Exact nulls
        # and chain-noise ghosts die inside the projectors; trusted
        # directions pass through untouched, so tau^2 needs no
        # inflation at all.
        # The trust machinery costs ~1.5 ms of extra batched sign +
        # power iterations on chip; it only pays when the chain itself
        # is compensated — single-word chains keep round 3's cheap
        # trace-bound deflation (same fidelity class either way, and
        # that mode's job is being the fastest loose-tolerance sweep).
        hg_sym = 0.5 * (hg_all + jnp.swapaxes(hg_all, 1, 2))
        if chain_precision != "dw":
            # round-3 deflation: tau^2 inflated by the trace-product
            # ghost bound (conservative; floor ~sqrt(40 eps r))
            ghost = jit_h * jnp.einsum(
                "kaa->k", g_all
            ) + jit_g * jnp.einsum("kaa->k", h_all)
            tau2 = tau2 + 2.0 * ghost
            w_all = jnp.einsum(
                "kab,kcb->kac", e_all, f_all, precision="highest"
            )
            ww = jnp.einsum(
                "kab,kcb->kac", w_all, w_all, precision="highest"
            )
            ww = 0.5 * (ww + jnp.swapaxes(ww, 1, 2))  # see below
        else:
            # spectral-norm estimate per chain matrix (3 batched power
            # steps on a fixed probe — Gershgorin overestimates by up
            # to sqrt(r) on decaying spectra, which would inflate the
            # trust floor by the same factor)
            pv = jax.random.normal(jax.random.PRNGKey(3), (r,), dt)
            pv = pv / jnp.linalg.norm(pv)
            v = jnp.broadcast_to(pv, hg_all.shape[:1] + (r,))
            for _ in range(3):
                v = jnp.einsum(
                    "kab,kb->ka", hg_all, v, precision="highest"
                )
                v = v / (
                    jnp.linalg.norm(v, axis=1, keepdims=True)
                    + jnp.asarray(1e-30, dt)
                )
            lmax = jnp.abs(
                jnp.einsum(
                    "ka,kab,kb->k", v, hg_all, v, precision="highest"
                )
            ) + jnp.asarray(1e-30, dt)
            mach_f = float(jnp.finfo(dt).eps)
            chain_eta = 2.0 * mach_f  # f32 representation floor only
            theta = 2.0 * jit_hg + chain_eta * lmax
            # explicit symmetrization before every sign iteration:
            # fused einsums leave ulp-level asymmetry, which puts the
            # near-zero eigenvalues of the shifted matrix just OFF the
            # real axis — Newton-Schulz diverges (NaN) for eigenvalues
            # near the imaginary axis.  The ghost-inflated tau^2 above
            # masks this by shifting the null block far below zero;
            # with trust filters the shift is tiny, so symmetry must
            # be restored explicitly.
            a_t = hg_sym - theta[:, None, None] * eye[None]
            alpha_t = jnp.max(
                jnp.sum(jnp.abs(a_t), axis=2), axis=1
            ) + jnp.asarray(1e-30, dt)
            # the trust projector tolerates ~1e-2 leakage (a half-kept
            # boundary direction enters ww at 0.25x, still under the
            # noise clamp), so cap its growth phase well below the
            # decision projector's budget
            sign_t = _sign_newton_schulz(
                a_t, alpha_t, min(sign_iters, 40)
            )
            trust = 0.5 * (eye[None] + sign_t)  # (2 nb, r, r)
            ep = jnp.einsum(
                "kab,kbc->kac", e_all, trust[:nb], precision="highest"
            )
            pf = jnp.einsum(
                "kab,kcb->kac", trust[nb:], f_all, precision="highest"
            )
            w_all = jnp.einsum(
                "kab,kbc->kac", ep, pf, precision="highest"
            )
            ww = jnp.einsum(
                "kab,kcb->kac", w_all, w_all, precision="highest"
            )
            ww = 0.5 * (ww + jnp.swapaxes(ww, 1, 2))

            # noise-floor clamp on the threshold (the twosided sweep's
            # "+j" analogue): W's entries are f32, so ww carries
            # ~eps * lambda_max of eigenvalue noise in the trusted
            # subspace — budgets below that would keep every noise
            # direction.  Clamping tau^2 there pins the tight-eps floor
            # at sigma ~ sqrt(eps_f32) * sigma_max, the same resolution
            # class as the twosided sweep.
            vw = jnp.broadcast_to(pv, ww.shape[:1] + (r,))
            for _ in range(3):
                vw = jnp.einsum(
                    "kab,kb->ka", ww, vw, precision="highest"
                )
                vw = vw / (
                    jnp.linalg.norm(vw, axis=1, keepdims=True)
                    + jnp.asarray(1e-30, dt)
                )
            lmax_ww = jnp.abs(
                jnp.einsum(
                    "ka,kab,kb->k", vw, ww, vw, precision="highest"
                )
            ) + jnp.asarray(1e-30, dt)
            tau2 = tau2 + 2.0 * mach * lmax_ww

        # ---- batched sign projectors (pure GEMMs) --------------------
        a0 = ww - tau2[:, None, None] * eye[None]
        alpha = jnp.max(
            jnp.sum(jnp.abs(a0), axis=2), axis=1
        ) + jnp.asarray(1e-30, dt)

        sign = _sign_newton_schulz(a0, alpha, sign_iters)
        proj = 0.5 * (eye[None] + sign)  # (nb, r, r)
        # static structural clamp: Gram-squaring noise on padded /
        # thin-ended chains can push the projector trace past the rank
        # the exact matricization can hold (see _bond_bounds)
        ks = jnp.minimum(
            jnp.clip(
                jnp.round(jnp.einsum("kaa->k", proj)).astype(jnp.int32),
                1,
                r,
            ),
            bounds,
        )
        masks = (
            jnp.arange(r, dtype=jnp.int32)[None, :] < ks[:, None]
        ).astype(dt)

        # ---- orthonormal bases: CholQR + Newton-Schulz polish ---------
        q_all = _proj_basis_cols(proj, masks, mach)

        # ---- oblique insertions a = E^{-1} Q, b^T = Q^T E ------------
        a_ins = jax.lax.linalg.triangular_solve(
            e_all, q_all, left_side=True, lower=False
        )  # E a = Q
        bt_ins = jnp.einsum(
            "kca,kcb->kab", q_all, e_all, precision="highest"
        )  # b^T = Q^T E

        # ---- project cores: one batched einsum -----------------------
        first_out = jnp.matmul(first, a_ins[0], precision="highest")
        mids_out = jnp.einsum(
            "kma,kanb,kbp->kmnp",
            bt_ins[:-1],
            mids,
            a_ins[1:],
            precision="highest",
        )
        last_out = jnp.matmul(bt_ins[-1], last, precision="highest")
        return first_out, mids_out, last_out, ks[0], ks[1:]

    return jax.jit(sweep)


@lru_cache(maxsize=8)
def _tt_round_sweep_fn(relative: bool, reorth: bool = False):
    """Fused right-orthogonalization + forward truncation sweep.

    Static shapes throughout: instead of shrinking bonds on device,
    truncated directions are zeroed (same represented tensor as hard
    truncation); the kept ranks are returned for host-side compaction.

    ``reorth`` runs every orthogonalization twice (QR-twice, the CGS2
    analogue): the chained single-QR sweep on TPU lifts null-direction
    singular values to ~1e-5 of the norm for d~30 f32 trains, which
    blocks tight truncation budgets; the second pass restores them to
    the eps level at ~2x the QR cost.
    """

    def qr_clean(mat):
        q, rmat = jnp.linalg.qr(mat)
        if reorth:
            q, r2 = jnp.linalg.qr(q)
            rmat = r2 @ rmat
        return q, rmat

    def sweep(first, mids, last, eps):
        d = mids.shape[0] + 2
        r = last.shape[0]

        # ---- backward sweep: right-orthogonalize cores d-1 .. 1 ----------
        # rank-deficient bonds (n < r) are zero-padded so every scan step
        # carries a full (r, r) state; the zero directions are inert.
        ql, rl = qr_clean(last.T)
        if ql.shape[1] < r:
            ql = jnp.pad(ql, ((0, 0), (0, r - ql.shape[1])))
            rl = jnp.pad(rl, ((0, r - rl.shape[0]), (0, 0)))
        last_q = ql.T  # (r, n), orthonormal (or zero) rows
        carry = rl.T

        def back_step(carry, core):
            rr, n, rc = core.shape
            cur = jnp.einsum(
                "rnk,kc->rnc", core, carry, precision="highest"
            )
            q, rmat = qr_clean(cur.reshape(rr, n * rc).T)
            return rmat.T, q.T.reshape(rr, n, rc)

        carry, mids_q = jax.lax.scan(back_step, carry, mids, reverse=True)
        first_c = first @ carry  # (n, r)

        # ---- forward sweep: masked truncated SVD -------------------------
        norm = jnp.linalg.norm(first_c)
        eps = jnp.asarray(eps, first.dtype)
        budget = (eps * norm if relative else eps) / jnp.sqrt(
            jnp.asarray(d - 1.0, first.dtype)
        )

        u, s, vt = jnp.linalg.svd(first_c, full_matrices=False)
        if s.shape[0] < r:
            pad = r - s.shape[0]
            u = jnp.pad(u, ((0, 0), (0, pad)))
            s = jnp.pad(s, (0, pad))
            vt = jnp.pad(vt, ((0, pad), (0, 0)))
        k0 = _trunc_count(s, budget)
        mask = (
            jnp.arange(s.shape[0], dtype=jnp.int32) < k0
        ).astype(s.dtype)
        first_out = u * mask[None, :]
        carry_sv = (mask * s)[:, None] * vt

        def fwd_step(carry_sv, core):
            rr, n, rc = core.shape
            cur = jnp.einsum(
                "ak,knc->anc", carry_sv, core, precision="highest"
            )
            # tall SVD via QR + small SVD: same factors, far cheaper than
            # the iterative SVD of the (r*n, r) unfolding
            q, rmat = qr_clean(cur.reshape(rr * n, rc))
            u_s, s, vt = jnp.linalg.svd(rmat, full_matrices=False)
            k = _trunc_count(s, budget)
            m = (
                jnp.arange(s.shape[0], dtype=jnp.int32) < k
            ).astype(s.dtype)
            core_out = (q @ (u_s * m[None, :])).reshape(rr, n, -1)
            return (m * s)[:, None] * vt, (core_out, k)

        carry_sv, (mids_out, mid_ranks) = jax.lax.scan(
            fwd_step, carry_sv, mids_q
        )
        last_out = carry_sv @ last_q
        return first_out, mids_out, last_out, k0, mid_ranks

    return jax.jit(sweep)


def sweep_noise_floor(dtype, d: int) -> float:
    """Measured relative noise floor of a d-core chained-QR sweep.

    Null-direction singular values come out at roughly this fraction of
    the train norm (TPU f32 measurements; the fused sweep measured a
    factor better than the round-1 graph-path observations, so this is
    deliberately conservative); truncation budgets below it may not
    engage.
    """
    return 10.0 * float(jnp.finfo(dtype).eps) * float(np.sqrt(d))


def tt_round_fixed(
    tn: TensorNetwork,
    eps: float,
    relative: bool = True,
    method: str = "svd",
    reorth: bool = False,
) -> Tuple[TensorNetwork, List[int]]:
    """Round a uniform TT with the fused static-shape sweep.

    ``method="svd"`` is the Householder-QR accurate default;
    ``method="cholqr2"`` is the all-GEMM accurate mode (CholeskyQR2 +
    exact R-factor SVDs — same truncation quality, MXU-bound instead of
    QR-panel-bound); ``method="twosided"`` removes the sequential
    per-bond eigensolvers entirely (two-sided orthogonalization +
    batched matrix-sign spectral projectors — the fastest accurate mode
    on TPU, where iterative SVDs neither batch nor pipeline, at the
    cost of a per-direction threshold that can keep a few more ranks
    on slowly-decaying spectra); ``method="prefix"`` is the fastest
    mode: GEMM-only Gram chains with every factorization batched over
    bonds (no cholesky/QR/SVD in any sequential chain), at gram-mode
    accuracy scope (sqrt(mach-eps) resolution floor); ``method="gram"``
    is the loose-tolerance single-pass CholQR + Gram-eigh mode (squared
    condition number).  ``reorth`` orthogonalizes twice per bond for
    tight budgets near the dtype noise floor.  Returns the rounded
    network (bonds compacted to the discovered ranks on host) and the
    kept rank per bond.

    Any linear chain qualifies: ragged bond ranks, mixed mode sizes,
    and non-canonical core layouts are zero-padded into the uniform
    sweep (:func:`_chain_padded`) and sliced/un-permuted on emit; only
    non-chain topologies raise (use the graph ``round`` /
    ``tt_svd_round`` for those).

    Resilience: the Cholesky-based modes can break down (NaN) on
    heavily rank-deficient trains in f32 on TPU (observed at ~6x
    rank deficiency); a NaN result is detected and the call falls back
    to the Householder sweep with a warning.
    """
    emit = None
    try:
        first, mids, last = stack_tt_cores(tn)
    except ValueError:
        # ragged ranks / mixed modes / non-canonical layouts: pad into
        # the uniform sweep and slice + unpermute on the way out
        packed = _chain_padded(tn)
        if packed is None:
            raise
        first, mids, last, emit = packed
    if mids is None:
        raise ValueError("tt_round_fixed needs d >= 3")

    d = mids.shape[0] + 2
    prefix_chain = os.environ.get("TNT_PREFIX_CHAIN_PREC", "high")
    if method == "prefix" and prefix_chain == "dw":
        # compensated chains + trust filters resolve ~2 sqrt(mach eps)
        # (measured 5.5e-4 f32 on planted spectra, VALIDATION.md r4)
        floor = 2.0 * float(np.sqrt(jnp.finfo(first.dtype).eps))
    elif method in ("gram", "prefix"):
        # Gram chains square the condition number: singular values below
        # ~sqrt(mach eps) of the norm are unresolvable regardless of d
        floor = 4.0 * float(np.sqrt(jnp.finfo(first.dtype).eps))
    else:
        floor = sweep_noise_floor(first.dtype, d) / (
            2.0 if reorth else 1.0
        )
    if relative and eps < floor:
        if method in ("gram", "prefix"):
            # the Gram floor is sqrt(mach eps) — independent of dtype
            # upgrades within the mode and of reorth; only an accurate
            # method (or f64 + an accurate method for eps < ~1e-7) helps
            remedy = (
                "Use an accurate method (svd/cholqr2/twosided), or "
                "ops.tight.tt_round_tight for tight budgets on device."
            )
        else:
            remedy = (
                "Use float64, reorth=True for a ~2x-cost sweep with an "
                "eps-level floor, or ops.tight.tt_round_tight on device."
            )
        warnings.warn(
            f"requested relative eps={eps:.1e} is below the ~{floor:.1e} "
            f"noise floor of a {d}-core {first.dtype} {method} rounding "
            f"sweep; truncation may not engage. {remedy}",
            RuntimeWarning,
            stacklevel=2,
        )

    if method == "gram":
        fn = _tt_round_gram_sweep_fn(relative)
    elif method == "cholqr2":
        fn = _tt_round_cholqr2_sweep_fn(relative)
    elif method == "twosided":
        fn = _tt_round_twosided_sweep_fn(relative)
    elif method == "prefix":
        # chain-scan unroll and chain matmul precision, probed on the
        # real chip 2026-08-19 (tools/prefix_unroll_probe.py, d=50 n=32
        # r=100): unroll is a wash (5.52/5.56/5.47/5.36 ms at 1/2/4/8 —
        # the chain is GEMM-latency-bound, not scan-boundary-bound), so
        # it stays 1; chain "high" (bf16x3) measured 4.97 ms vs 5.52 ms
        # for "highest" with IDENTICAL kept ranks at eps=1e-3, and its
        # ~3e-5 matmul noise sits an order below this mode's
        # sqrt(mach_eps) ~ 3e-4 f32 resolution floor -> default
        # (TNT_PREFIX_UNROLL / TNT_PREFIX_CHAIN_PREC override)
        fn = _tt_round_prefix_sweep_fn(
            relative,
            unroll=int(os.environ.get("TNT_PREFIX_UNROLL", "1")),
            chain_precision=os.environ.get(
                "TNT_PREFIX_CHAIN_PREC", "high"
            ),
        )
    else:
        fn = _tt_round_sweep_fn(relative, reorth)

    if method in ("gram", "cholqr2", "twosided", "prefix"):
        # static structural rank caps from the TRUE shapes: on padded
        # or thin-ended chains the Gram/jitter noise of these modes can
        # inflate spectra past the rank the exact matricization holds
        if emit is not None:
            _, true_shapes, _ = emit
            modes = (
                [true_shapes[0][0]]
                + [s[1] for s in true_shapes[1:-1]]
                + [true_shapes[-1][1]]
            )
            bond_dims = [true_shapes[0][1]] + [
                s[2] for s in true_shapes[1:-1]
            ]
        else:
            modes = (
                [first.shape[0]]
                + [mids.shape[2]] * (d - 2)
                + [last.shape[1]]
            )
            bond_dims = [last.shape[0]] * (d - 1)
        bounds = jnp.asarray(
            _bond_bounds(modes, bond_dims, int(last.shape[0]))
        )
        f, m, l, k0, mid_ranks = fn(first, mids, last, eps, bounds)
    else:
        f, m, l, k0, mid_ranks = fn(first, mids, last, eps)
    ROUND_STATS[method if method in ROUND_STATS else "svd"] += 1

    # breakdown detection must cover EVERY core: a NaN confined to a
    # middle bond never reaches the last core's projection, and the
    # sign iteration exits early on NaN leaving other bonds unconverged
    if method in ("gram", "cholqr2", "twosided", "prefix") and not bool(
        jnp.isfinite(jnp.sum(f) + jnp.sum(m) + jnp.sum(l))
    ):
        ROUND_STATS["fallback_nan"] += 1
        warnings.warn(
            f"{method} rounding sweep broke down (NaN — Cholesky on a "
            "heavily rank-deficient train); falling back to the "
            "Householder sweep",
            RuntimeWarning,
            stacklevel=2,
        )
        f, m, l, k0, mid_ranks = _tt_round_sweep_fn(relative, reorth)(
            first, mids, last, eps
        )

    ranks = [int(k0)] + [int(x) for x in np.asarray(mid_ranks)]
    return emit_chain(tn, f, m, l, ranks, emit)


def emit_chain(tn, first_out, mids_out, last_out, ranks, emit=None):
    """Write swept cores back into a copy of ``tn``: slice the kept
    ranks (and, for padded entries, the true modes) and un-permute into
    each node's original axis layout.  The single emit path shared by
    :func:`tt_round_fixed` and :mod:`tensor_networks_tpu.ops.tight`."""
    out = tn.__deepcopy__({})
    if emit is not None:
        # padded entry (see _chain_padded): slice true modes + kept
        # ranks, un-permute into each node's original axis layout
        order, shapes, perms = emit

        def put(node, core, perm):
            out.node_tensor(node).update_val_size(
                jnp.transpose(
                    core, tuple(int(a) for a in np.argsort(perm))
                )
            )

        put(order[0], first_out[: shapes[0][0], : ranks[0]], perms[0])
        for k in range(1, len(order) - 1):
            put(
                order[k],
                mids_out[k - 1][
                    : ranks[k - 1], : shapes[k][1], : ranks[k]
                ],
                perms[k],
            )
        put(order[-1], last_out[: ranks[-1], : shapes[-1][1]], perms[-1])
        return out, ranks
    nodes = list(tn.network.nodes)
    out.node_tensor(nodes[0]).update_val_size(first_out[:, : ranks[0]])
    for i, node in enumerate(nodes[1:-1]):
        out.node_tensor(node).update_val_size(
            mids_out[i][: ranks[i], :, : ranks[i + 1]]
        )
    out.node_tensor(nodes[-1]).update_val_size(last_out[: ranks[-1], :])
    return out, ranks
