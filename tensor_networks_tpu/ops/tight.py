"""Tight-truncation-budget TT rounding on device (compensated f32).

Any pure-f32 rounding sweep floors at ~1e-5 relative on null-direction
singular values (VALIDATION.md round 2): each orthogonalization step
contributes ~``c * eps_f32 * norm`` of backward error, and the per-bond
truncation budget ``eps * norm / sqrt(d-1)`` drops below that floor
already at eps ~ 1e-5.  The reference sidesteps this with host float64
(``pytens/utils.py:74-84`` truncates correctly at 1e-13); TPUs have no
f64, so this module rebuilds the precision out of exact chunked f32
GEMMs (:mod:`tensor_networks_tpu.kernels.ozaki`):

* **Backward sweep (one jitted scan).**  Right-orthogonalization with a
  double-word (~48-bit) carry and double-word panels.  Each step
  orthonormalizes with a plain f32 Cholesky-QR *preconditioner*
  (adaptive-shift, so exact rank deficiency cannot NaN it) refined by
  two double-word Newton-Schulz iterations — pure GEMMs, no
  high-precision factorization needed, quadratic convergence from the
  f32 seed.  Null rows stay null (no ghost directions, unlike the
  jittered f32 CholQR sweeps).
* **Forward sweep.**  Per bond, the Gram of the double-word
  carry-times-panel matrix is computed on device at TRIPLE-word
  (~76-bit) resolution — the extra word is what beats the classic
  Gram-squaring floor — and only the tiny ``(r, r)`` words are fetched.
  The rank rule runs in float64 on host (the same
  device-compute/host-rank-rule split as ``kernels.linalg.delta_svd``),
  threading the reference's remaining-budget bookkeeping
  (``pytens/utils.py:85-100``).  Two variants:

  - ``sweep="batched"`` (default): ALL bond Grams of the untruncated
    right-orthogonal train come out of ONE jitted scan (the forward
    Gram chain is a pure triple-word congruence chain — the carry's
    Gram equals the previous bond's Gram, so no factorization is
    needed inside the scan), the host runs every rank rule on the one
    fetched stack, and every output core is built by ONE batched
    device program from the uploaded carries/projectors (no
    sequential dependency: the carries come from the host rule, not
    from the device).  This is the Al Daas/Ballard projector form
    (same scheme as ``tt_round_fixed(method="prefix")``): truncation
    decisions read the *untruncated* spectra, so dropped mass can be
    double-counted across bonds — strictly conservative (never
    exceeds the budget, can keep marginally more rank).  3 device
    programs + 1 Gram fetch + 1 projector upload for the WHOLE train.
  - ``sweep="sequential"``: the reference's exact truncate-then-carry
    recursion, ~4 relay round-trips per bond (a few ms each on bare
    TPU runtimes; ~25 ms each through this container's relay).

This is the correctness mode for tight budgets — use the fused f32
sweeps (:func:`tensor_networks_tpu.ops.fast.tt_round_fixed`) for eps
above their documented floors.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensor_networks_tpu.kernels.ozaki import (
    dw_add,
    dw_collapse,
    oz_matmul,
    two_sum,
)
from tensor_networks_tpu.network import TensorNetwork
from tensor_networks_tpu.ops.fast import _chol_adaptive, stack_tt_cores


def _dw_z(y_words, g_words):
    """Z = Y G Y^T at triple-word (~76-bit) precision.

    Triple-word is load-bearing, not luxury: the whitening passes
    compose to an eigenvalue amplification of ~(20 eps_f32)^-passes
    (~6e16 at 3 passes), so a double-word Z floor of 2**-48 would lift
    Gram noise — and every structurally-null direction of a
    rank-deficient train — to O(1), resurrecting it past the ghost
    mask (observed: QQ^T off by 1e2 on a 5x4 last core).  At 76 bits
    the amplified noise stays ~1e-6, far under the 0.25 mask.
    """
    t = oz_matmul(y_words, g_words, 76, 3)
    return oz_matmul(t, y_words, 76, 3, transpose_b=True)


def _f32_whiten_pass(y_words, z_hi):
    """One mixed-precision whitening pass: Y <- chol(Z.hi)^-1 Y.

    The f32 Cholesky resolves the current Z's spectrum down to its
    jitter scale (~20 eps of the trace); because Z is recomputed from
    the EXACT multiword Gram after each pass, passes compose — k
    passes resolve singular values down to ~(20 eps_f32)^(k/2) of the
    norm.

    The solve is refined once with a double-word residual.  A plain
    f32 solve leaves ``eps_f32``-relative junk in Y's amplified rows,
    which the exact congruence turns into ~``(eps_f32 * |Y_null|)^2``
    null-space residue (measured 1.4e-11 after one pass on a 5x4
    rank-4 core); two further passes amplify that junk past the 0.25
    ghost mask and a structurally-null direction comes back as a
    garbage row.  One dw-residual refinement drops the solve error to
    ~eps^2 and the residue below 1e-20, keeping nulls null.
    """
    r = z_hi.shape[0]
    dt = z_hi.dtype
    jit0 = (jnp.trace(z_hi) / r + jnp.asarray(1e-30, dt)) * (
        20.0 * jnp.finfo(dt).eps
    )
    l, _ = _chol_adaptive(z_hi, jit0)

    def solve(w):
        return jax.scipy.linalg.solve_triangular(l, w, lower=True)

    x0 = [solve(w) for w in y_words]
    lx = oz_matmul([l], x0, 48, 2)
    resid = dw_add(list(y_words), [-w for w in lx])
    corr = solve(dw_collapse(resid))
    return dw_add(x0, [corr])


def _ns_polish(y_words, g_words, iters: int):
    """Newton-Schulz polish: Y <- (3I - Y G Y^T)/2 @ Y, double-word.

    Quadratic on a spectrum already near {0, 1}; the 1.5I - Z/2 matrix
    is kept double-word (a plain f32 subtract would throw away Z's low
    word exactly where it matters)."""
    eye = jnp.eye(y_words[0].shape[0], dtype=y_words[0].dtype)
    for _ in range(iters):
        z = _dw_z(y_words, g_words)
        m_hi, m_err = two_sum(1.5 * eye, -0.5 * z[0])
        m_words = [m_hi, m_err - 0.5 * z[1], -0.5 * z[2]]
        y_words = oz_matmul(m_words, y_words, 48, 2)
    return y_words


def _dw_orth_rows(cur_words, passes: int = 3):
    """Row-orthonormalize a double-word matrix: ``cur = R @ Q``.

    Returns ``(Q_words, R_words)`` with ``Q`` row-orthonormal-or-zero
    to ~2^-48 and ``R = cur @ Q^T`` double-word.  Pipeline:

    1. ``passes`` iterated mixed-precision whitening passes (f32
       Cholesky of the double-word-exact Gram, composing to ~1e-9
       resolution at 3 passes) seed Y;
    2. two double-word Newton-Schulz polishes push the resolved
       directions to ~eps_dw orthonormality;
    3. directions still unresolved (squared row norm of Y@cur below
       1/4 — singular values under the composed whitening floor) are
       MASKED TO ZERO rather than kept as jitter ghosts, and the kept
       rows get one more chol+polish round on the masked Gram.

    The masking drops train content below the whitening floor
    (~1e-9 * norm per step at 3 passes) — far under any budget this
    sweep is used for, and far cleaner than the f32 sweeps' ghost
    directions.
    """
    g_words = oz_matmul(cur_words, cur_words, 76, 3, transpose_b=True)

    y_words = None
    z_hi = g_words[0]
    for _ in range(passes):
        if y_words is None:
            y_words = _f32_whiten_pass(
                [
                    jnp.eye(z_hi.shape[0], dtype=z_hi.dtype),
                    jnp.zeros_like(z_hi),
                ],
                z_hi,
            )
        else:
            y_words = _f32_whiten_pass(y_words, z_hi)
        z_hi = _dw_z(y_words, g_words)[0]
    y_words = _ns_polish(y_words, g_words, 2)

    # mask unresolved directions to zero, then re-polish the kept rows
    z = _dw_z(y_words, g_words)
    keep = (jnp.diagonal(z[0]) > 0.25).astype(z[0].dtype)
    y_words = [keep[:, None] * w for w in y_words]
    zm_hi = keep[:, None] * keep[None, :] * z[0]
    y_words = _f32_whiten_pass(y_words, zm_hi)
    y_words = [keep[:, None] * w for w in y_words]
    y_words = _ns_polish(y_words, g_words, 2)
    y_words = [keep[:, None] * w for w in y_words]

    q_words = oz_matmul(y_words, cur_words, 48, 2)
    r_words = oz_matmul(cur_words, q_words, 48, 2, transpose_b=True)
    return q_words, r_words


@lru_cache(maxsize=4)
def _backward_orth_fn():
    """Jitted backward right-orthogonalization with double-word state.

    ``(first, mids, last) -> (first_c words, mid Q words, last Q
    words)`` where every Q has orthonormal (or zero) rows and
    ``first_c`` carries all the train's non-orthogonal content.
    """

    def run(first, mids, last):
        r = last.shape[0]

        q_last, carry = _dw_orth_rows([last, jnp.zeros_like(last)])

        def step(carry_words, core):
            rr, n, rc = core.shape
            ch, cl = carry_words
            cur = oz_matmul(
                [core.reshape(rr * n, rc)], [ch, cl], 48, 2
            )
            cur = [w.reshape(rr, n * rc) for w in cur]
            q, r_new = _dw_orth_rows(cur)
            return tuple(r_new), (
                q[0].reshape(rr, n, rc),
                q[1].reshape(rr, n, rc),
            )

        carry, mids_q = jax.lax.scan(
            step, tuple(carry), mids, reverse=True
        )
        first_c = oz_matmul([first], list(carry), 48, 2)
        return first_c, mids_q, q_last

    return jax.jit(run)


@lru_cache(maxsize=4)
def _bond_gram_fn():
    """Jitted per-bond program: advance the dw carry through a dw panel
    and emit the triple-word Gram of the bond matricization."""

    def run(carry_h, carry_l, panel_h, panel_l):
        rr, n, rc = panel_h.shape
        cur = oz_matmul(
            [carry_h, carry_l],
            [panel_h.reshape(rr, n * rc), panel_l.reshape(rr, n * rc)],
            48,
            2,
        )
        cur = [w.reshape(rr * n, rc) for w in cur]
        gram = oz_matmul(cur, cur, 76, 3, transpose_a=True)
        return cur[0], cur[1], gram[0], gram[1], gram[2]

    return jax.jit(run)


@jax.jit
def _apply_proj(cur_h, cur_l, w):
    """Output core = (collapsed dw matrix) @ W on device."""
    return jnp.matmul(dw_collapse([cur_h, cur_l]), w, precision="highest")


@lru_cache(maxsize=4)
def _gram_chain_fn():
    """Jitted forward Gram chain: the triple-word Gram of EVERY bond
    matricization of the untruncated right-orthogonal train, one scan.

    The carry of an untruncated forward sweep satisfies
    ``carry^T carry = G_k`` whatever orthogonal factorization produced
    it, so the chain needs no factorizations at all:
    ``G_{k+1}[c,e] = sum_{r,x,s} P[r,x,c] G_k[r,s] P[s,x,e]`` — two
    triple-word GEMMs per step over the double-word panels.
    """

    def run(f_h, f_l, p_h, p_l):
        g0 = oz_matmul([f_h, f_l], [f_h, f_l], 76, 3, transpose_a=True)

        def step(g, panel):
            ph, pl = panel
            r, n, rc = ph.shape
            q = oz_matmul(
                list(g),
                [ph.reshape(r, n * rc), pl.reshape(r, n * rc)],
                76,
                3,
            )
            q2 = [w.reshape(r * n, rc) for w in q]
            g2 = oz_matmul(
                [ph.reshape(r * n, rc), pl.reshape(r * n, rc)],
                q2,
                76,
                3,
                transpose_a=True,
            )
            return tuple(g2), tuple(g2)

        _, grams = jax.lax.scan(step, tuple(g0), (p_h, p_l))
        return g0, grams

    return jax.jit(run)


@lru_cache(maxsize=4)
def _apply_all_fn():
    """One batched device program building every output core from the
    uploaded per-bond carries (double-word) and projectors (f32).

    No sequential dependency: core_k = collapse(C_{k-1} @ panel_k) @
    W_k with C from the host rank rule.  Same per-core numerics as the
    sequential :func:`_apply_proj` path (double-word product, collapse,
    full-f32 projector matmul).
    """

    def run(f_h, f_l, w0, p_h, p_l, c_h, c_l, w_st, ql_h, ql_l, ce_h, ce_l):
        first_out = jnp.matmul(
            dw_collapse([f_h, f_l]), w0, precision="highest"
        )

        def one(ch, cl, ph, pl, w):
            r, n, rc = ph.shape
            cur = oz_matmul(
                [ch, cl],
                [ph.reshape(r, n * rc), pl.reshape(r, n * rc)],
                48,
                2,
            )
            cur2 = dw_collapse(cur).reshape(r * n, rc)
            core = jnp.matmul(cur2, w, precision="highest")
            return core.reshape(r, n, rc)

        mids_out = jax.vmap(one)(c_h, c_l, p_h, p_l, w_st)
        last_out = jnp.matmul(
            dw_collapse([ce_h, ce_l]),
            dw_collapse([ql_h, ql_l]),
            precision="highest",
        )
        return first_out, mids_out, last_out

    return jax.jit(run)


@lru_cache(maxsize=4)
def _first_gram_fn():
    """Jitted triple-word Gram of the (n, r) first-bond matrix."""

    def run(fh, fl):
        g = oz_matmul([fh, fl], [fh, fl], 76, 3, transpose_a=True)
        return g[0], g[1], g[2]

    return jax.jit(run)


@jax.jit
def _last_apply(ch, cl, qh, ql):
    """Output last core = (dw carry) @ (dw Q_last), collapsed to f32."""
    return jnp.matmul(
        dw_collapse([ch, cl]), dw_collapse([qh, ql]), precision="highest"
    )


def _host_truncate(m_words, budget2_remaining, bonds_left, max_rank):
    """float64 rank rule on a fetched triple-word Gram.

    Equal-split of the remaining squared budget across unprocessed
    bonds (the reference's remaining-delta bookkeeping,
    ``pytens/utils.py:85-100``): bond k may drop tail mass up to
    ``remaining / bonds_left``; whatever it does not use stays in the
    pool.  ``max_rank`` is the structural rank bound of the bond
    matricization (rows of the underlying matrix) — eigenvalues past it
    are orthogonalization-floor noise and are never kept, whatever the
    budget.  Returns (sigma, V, kept rank, dropped mass).
    """
    m64 = sum(np.asarray(w, np.float64) for w in m_words)
    m64 = 0.5 * (m64 + m64.T)
    lam, vec = np.linalg.eigh(m64)  # ascending
    lam = np.maximum(lam, 0.0)
    allow2 = budget2_remaining / max(bonds_left, 1)
    tail = np.cumsum(lam)
    drop = int(np.searchsorted(tail, allow2, side="right"))
    k = max(lam.shape[0] - drop, 1)
    k = min(k, max_rank)
    drop = lam.shape[0] - k
    dropped = float(tail[drop - 1]) if drop > 0 else 0.0
    # descending order, kept block first
    lam = lam[::-1]
    vec = vec[:, ::-1]
    sigma = np.sqrt(lam[:k])
    return sigma, vec[:, :k], k, dropped


def _dw_split64(a64: np.ndarray, dtype) -> Tuple[np.ndarray, np.ndarray]:
    """Exact float64 -> (hi, lo) f32 pair on host."""
    hi = a64.astype(np.float32)
    lo = (a64 - hi.astype(np.float64)).astype(np.float32)
    return (np.asarray(hi, dtype), np.asarray(lo, dtype))


def _wc(sigma, v, k, dim):
    """(W = V Sigma^-1, C = Sigma V^T) zero-padded to (dim, dim) f64.

    The shared per-bond construction of both forward sweeps: W maps the
    current matricization to its orthonormal-U core, C is the carry
    into the next bond.
    """
    w64 = np.zeros((dim, dim), np.float64)
    w64[:, :k] = np.asarray(v) / np.maximum(sigma, 1e-300)[None, :]
    c64 = np.zeros((dim, dim), np.float64)
    c64[:k, :] = sigma[:, None] * np.asarray(v).T[:k, :]
    return w64, c64


def tt_round_tight(
    tn: TensorNetwork,
    eps: float,
    relative: bool = True,
    sweep: str = "batched",
) -> Tuple[TensorNetwork, List[int]]:
    """Round a uniform TT at tight budgets (eps down to ~1e-7 in f32).

    Matches the semantics of ``tt_svd_round``
    (``/root/reference/pytens/algs.py:1841-1901``) with the
    remaining-budget rule of ``delta_svd``
    (``/root/reference/pytens/utils.py:74-100``), at budgets far below
    the f32 sweep noise floor.  See the module docstring for the
    device/host split, the two forward-sweep variants
    (``sweep="batched"`` — default, ~4 relay trips total — vs
    ``"sequential"`` — the reference's exact recursion, ~4 trips per
    bond), and the cost model.
    """
    if sweep not in ("batched", "sequential"):
        raise ValueError(f"unknown sweep {sweep!r}")
    emit = None
    try:
        first, mids, last = stack_tt_cores(tn)
    except ValueError:
        # ragged ranks / mixed modes / non-canonical layouts: same
        # chain padding as tt_round_fixed (zero padding is inert for
        # the multiword sweeps too)
        from tensor_networks_tpu.ops.fast import _chain_padded

        packed = _chain_padded(tn)
        if packed is None:
            raise
        first, mids, last, emit = packed
    if mids is None:
        raise ValueError("tt_round_tight needs d >= 3")
    dt = first.dtype

    first_c, mids_q, q_last = _backward_orth_fn()(first, mids, last)

    if sweep == "batched":
        return _forward_batched(
            tn,
            first,
            mids,
            last,
            first_c,
            mids_q,
            q_last,
            eps,
            relative,
            emit=emit,
        )

    # ---- bond 0: Gram of first_c directly -----------------------------
    g0 = _first_gram_fn()(*first_c)
    norm2 = float(
        sum(np.trace(np.asarray(w, np.float64)) for w in g0)
    )
    delta2 = (
        (eps**2) * norm2 if relative else float(eps) ** 2
    )
    nb = mids.shape[0] + 1  # bonds
    remaining = delta2

    sigma, v, k, used = _host_truncate(
        g0, remaining, nb, min(first.shape[0], first.shape[1])
    )
    remaining -= used
    r = last.shape[0]
    ranks = [k]
    # first core = first_c V Sigma^-1 (orthonormal U); carry = Sigma V^T
    # — same split as the mid-bond step, so the chain reproduces first_c
    w64, carry64 = _wc(sigma, v, k, r)
    first_out = _apply_proj(*first_c, jnp.asarray(w64, dt))
    # carry exactly split to a double word on host
    ch, cl = _dw_split64(carry64, dt)
    ch, cl = jnp.asarray(ch), jnp.asarray(cl)

    bond_fn = _bond_gram_fn()
    mids_out = []
    for i in range(mids.shape[0]):
        cur_h, cur_l, m0, m1, m2 = bond_fn(
            ch, cl, mids_q[0][i], mids_q[1][i]
        )
        rc_i = mids_q[0][i].shape[2]
        sigma, v, k, used = _host_truncate(
            (m0, m1, m2),
            remaining,
            nb - 1 - i,
            min(ranks[-1] * mids_q[0][i].shape[1], rc_i),
        )
        remaining -= used
        ranks.append(k)
        rc = mids_q[0][i].shape[2]
        # core = cur @ V Sigma^-1 (orthonormal U), carry = Sigma V^T
        w64, carry64 = _wc(sigma, v, k, rc)
        core = _apply_proj(cur_h, cur_l, jnp.asarray(w64, dt))
        rr = mids_q[0][i].shape[0]
        n = mids_q[0][i].shape[1]
        mids_out.append(core.reshape(rr, n, rc))
        ch_np, cl_np = _dw_split64(carry64, dt)
        ch, cl = jnp.asarray(ch_np), jnp.asarray(cl_np)

    last_out = _last_apply(ch, cl, q_last[0], q_last[1])

    return _emit(tn, first_out, mids_out, last_out, ranks, emit)


def _emit(tn, first_out, mids_out, last_out, ranks, emit=None):
    from tensor_networks_tpu.ops.fast import emit_chain

    return emit_chain(tn, first_out, mids_out, last_out, ranks, emit)


def _forward_batched(
    tn, first, mids, last, first_c, mids_q, q_last, eps, relative, emit=None
):
    """Batched forward sweep: one Gram-chain scan, one fetch, every
    rank rule on host, one batched apply.  See the module docstring."""
    dt = first.dtype
    r = last.shape[0]
    nb = mids.shape[0] + 1  # bonds
    n = mids_q[0].shape[2]

    g0, grams = _gram_chain_fn()(
        first_c[0], first_c[1], mids_q[0], mids_q[1]
    )
    # ONE fetch: every bond's triple-word Gram
    g0_np = tuple(np.asarray(w, np.float64) for w in g0)
    grams_np = tuple(np.asarray(w, np.float64) for w in grams)

    norm2 = float(sum(np.trace(w) for w in g0_np))
    delta2 = (eps**2) * norm2 if relative else float(eps) ** 2
    remaining = delta2

    sigma, v, k, used = _host_truncate(
        g0_np, remaining, nb, min(first.shape[0], first.shape[1])
    )
    remaining -= used
    ranks = [k]
    w0_64, c64 = _wc(sigma, v, k, r)
    carries64 = [c64]
    wmids64 = []
    for i in range(mids.shape[0]):
        gi = tuple(w[i] for w in grams_np)
        sigma, v, k, used = _host_truncate(
            gi, remaining, nb - 1 - i, min(ranks[-1] * n, r)
        )
        remaining -= used
        ranks.append(k)
        w64, c64 = _wc(sigma, v, k, r)
        wmids64.append(w64)
        carries64.append(c64)

    # ONE upload batch: carries as double words, projectors as f32
    c_h, c_l = zip(*(_dw_split64(c, dt) for c in carries64[:-1]))
    ce_h, ce_l = _dw_split64(carries64[-1], dt)
    first_out, mids_out, last_out = _apply_all_fn()(
        first_c[0],
        first_c[1],
        jnp.asarray(w0_64, dt),
        mids_q[0],
        mids_q[1],
        jnp.asarray(np.stack(c_h)),
        jnp.asarray(np.stack(c_l)),
        jnp.asarray(np.stack(wmids64), dt),
        q_last[0],
        q_last[1],
        jnp.asarray(ce_h),
        jnp.asarray(ce_l),
    )
    return _emit(tn, first_out, mids_out, last_out, ranks, emit)
