"""Distributed TT sweeps: train sharded across devices, carries over ICI.

The scaling axis of this framework is not batch size but *train length*
(many dimensions — the QTT regime) and *bond width*.  For trains whose
cores exceed one chip's HBM, the cores are sharded along the train
(core block k on device k — the pipeline-parallel placement) and the
orthogonalization sweep passes its (r x r) carry between neighboring
devices with ``lax.ppermute`` — structurally the ring-attention neighbor
pipeline, but carrying bond matrices.

Implemented with ``shard_map`` so the collective schedule is explicit:
stage s is active on device s; everyone else forwards.  The sweep is
inherently sequential across the train, so wall-clock matches the fused
single-chip scan — the win is memory capacity (d x r x n x r / P per
chip) with only (P-1) r x r hops of ICI traffic.
"""

from __future__ import annotations

import os
import warnings
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _replicate_from(x, my, src):
    """psum-replicate a value only device ``src`` holds."""
    return jax.lax.psum(
        jnp.where(my == src, x, jnp.zeros_like(x)), "model"
    )


def _staged_sweep(my, n_stages, reverse, carry, blocks, scan_fn,
                  passive_outs):
    """The staged-pipeline skeleton shared by the sharded sweeps:
    device ``stage`` runs ``lax.scan(scan_fn)`` over its local blocks
    while everyone else forwards, then the carry hops to the neighbor
    via ppermute.  ``passive_outs(carry, blocks)`` builds the zero
    emitted blocks for inactive devices — derived from varying operands
    so the cond branches agree on shard_map's varying-axes types.
    Returns ``(carry on the boundary device, per-device emitted
    blocks)``."""
    stages = (
        range(n_stages - 1, -1, -1) if reverse else range(n_stages)
    )
    last_stage = 0 if reverse else n_stages - 1
    shift = -1 if reverse else 1
    outs = passive_outs(carry, blocks)
    for stage in stages:
        def active(args):
            c, blk = args
            return jax.lax.scan(scan_fn, c, blk, reverse=reverse)

        def passive(args):
            c, blk = args
            return c, passive_outs(c, blk)

        new_carry, emitted = jax.lax.cond(
            my == stage, active, passive, (carry, blocks)
        )
        outs = jax.tree_util.tree_map(
            lambda o, e: jnp.where(my == stage, e, o), outs, emitted
        )
        if stage != last_stage:
            perm = [
                (s, (s + shift) % n_stages) for s in range(n_stages)
            ]
            carry = jax.tree_util.tree_map(
                lambda c: jax.lax.ppermute(c, "model", perm), new_carry
            )
        else:
            carry = new_carry
    return carry, outs


def _local_right_orth_block(block: jnp.ndarray, carry: jnp.ndarray):
    """Right-orthogonalize a local block of middle cores given the carry
    entering from the right; returns (new carry, orthogonalized block)."""

    def step(c, core):
        rr, n, rc = core.shape
        cur = jnp.einsum("rnk,kc->rnc", core, c, precision="highest")
        q, rmat = jnp.linalg.qr(cur.reshape(rr, n * rc).T)
        return rmat.T, q.T.reshape(rr, n, rc)

    carry, out = jax.lax.scan(step, carry, block, reverse=True)
    return carry, out


def tt_right_orth_sharded(
    mesh: Mesh, mids: jnp.ndarray, last: jnp.ndarray
):
    """Right-orthogonalize a uniform TT whose middle cores are sharded
    along the train over the mesh's ``model`` axis.

    ``mids`` is (d-2, r, n, r) with the leading axis sharded; ``last`` is
    (r, n) replicated.  Returns (carry for the first core, orthogonalized
    mids with the same sharding, orthogonalized last).

    Stage p runs its local scan while the carry travels right-to-left via
    ``ppermute``; each hop moves only an (r x r) matrix over ICI.
    """
    n_stages = mesh.shape["model"]
    r = last.shape[0]

    def body(mids_local, last_rep):
        my = jax.lax.axis_index("model")

        # last core: QR on every device (replicated, cheap), zero-padded
        # for rank-deficient bonds
        ql, rl = jnp.linalg.qr(last_rep.T)
        if ql.shape[1] < r:
            ql = jnp.pad(ql, ((0, 0), (0, r - ql.shape[1])))
            rl = jnp.pad(rl, ((0, r - rl.shape[0]), (0, 0)))
        last_q = ql.T
        carry = rl.T
        # the carry starts replicated but becomes device-varying once the
        # staged scan runs; mark it varying for shard_map's type system
        carry = jax.lax.pcast(carry, ("model",), to="varying")

        out_block = jnp.zeros_like(mids_local)
        # stages run right-to-left along the train
        for stage in range(n_stages - 1, -1, -1):
            def active(args):
                c, blk = args
                return _local_right_orth_block(blk, c)

            def passive(args):
                c, blk = args
                return c, jnp.zeros_like(blk)

            new_carry, new_block = jax.lax.cond(
                my == stage, active, passive, (carry, mids_local)
            )
            out_block = jnp.where(my == stage, new_block, out_block)
            if stage > 0:
                # hand the carry from device `stage` to `stage - 1`
                perm = [(s, (s - 1) % n_stages) for s in range(n_stages)]
                carry = jax.lax.ppermute(new_carry, "model", perm)
            else:
                carry = new_carry

        # replicate the final carry (only device 0 holds the true value)
        carry = jax.lax.psum(
            jnp.where(my == 0, carry, jnp.zeros_like(carry)), "model"
        )
        return carry, out_block, last_q

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("model", None, None, None), P(None, None)),
        out_specs=(P(), P("model", None, None, None), P(None, None)),
    )
    return jax.jit(fn)(mids, last)


def place_train_sharded(mesh: Mesh, mids: jnp.ndarray, last: jnp.ndarray):
    """Shard the middle cores along the train over the model axis."""
    n_stages = mesh.shape["model"]
    if mids.shape[0] % n_stages != 0:
        raise ValueError(
            f"train sharding needs the middle-core count ({mids.shape[0]}) "
            f"divisible by the model axis ({n_stages}); pad the train or "
            "choose a different mesh"
        )
    mids = jax.device_put(
        mids, NamedSharding(mesh, P("model", None, None, None))
    )
    last = jax.device_put(last, NamedSharding(mesh, P(None, None)))
    return mids, last


def tt_inner_train_sharded(
    mesh: Mesh,
    first_a: jnp.ndarray,
    mids_a: jnp.ndarray,
    last_a: jnp.ndarray,
    first_b: jnp.ndarray,
    mids_b: jnp.ndarray,
    last_b: jnp.ndarray,
):
    """Inner product of two TTs whose middle cores are sharded along the
    train (pipeline placement): each device zips its local block, the
    (r_a x r_b) carry hops to the next device via ppermute."""
    n_stages = mesh.shape["model"]

    def body(fa, ma, la, fb, mb, lb):
        my = jax.lax.axis_index("model")
        w = jnp.matmul(fa.T, fb, precision="highest")
        w = jax.lax.pcast(w, ("model",), to="varying")

        def zip_step(w, cores):
            ca, cb = cores
            ra, n, ra2 = ca.shape
            rb, _, rb2 = cb.shape
            t = jnp.matmul(
                w.T, ca.reshape(ra, n * ra2), precision="highest"
            ).reshape(rb * n, ra2)
            return (
                jnp.matmul(t.T, cb.reshape(rb * n, rb2), precision="highest"),
                None,
            )

        for stage in range(n_stages):
            def active(args):
                c, ba, bb = args
                c_out, _ = jax.lax.scan(zip_step, c, (ba, bb))
                return c_out

            def passive(args):
                c, _, _ = args
                return c

            new_w = jax.lax.cond(
                my == stage, active, passive, (w, ma, mb)
            )
            if stage < n_stages - 1:
                perm = [(s, (s + 1) % n_stages) for s in range(n_stages)]
                w = jax.lax.ppermute(new_w, "model", perm)
            else:
                w = new_w

        w_final = jax.lax.psum(
            jnp.where(
                my == n_stages - 1, w, jnp.zeros_like(w)
            ),
            "model",
        )
        return jnp.sum(
            w_final * jnp.matmul(la, lb.T, precision="highest")
        )

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None, None),
            P("model", None, None, None),
            P(None, None),
            P(None, None),
            P("model", None, None, None),
            P(None, None),
        ),
        out_specs=P(),
    )
    return jax.jit(fn)(first_a, mids_a, last_a, first_b, mids_b, last_b)


# ---------------------- distributed Gram rounding ----------------------


def _trunc_count(s: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    tail = jnp.cumsum(jnp.flip(s) ** 2)
    drop = jnp.sum((tail <= delta**2).astype(jnp.int32))
    return jnp.maximum(jnp.int32(s.shape[0]) - drop, jnp.int32(1)).astype(
        jnp.int32
    )


def _gram_truncate(gl, gr, budget, kmax):
    """Masked static-shape Gram-SVD bond truncation (IPDPS'22 step).

    ``kmax`` is the structural rank cap of the bond (dynamic
    ``kprev * n`` plus the static :func:`ops.fast._bond_bounds` cap) —
    Gram-squaring noise past it must never be kept, matching the
    single-device gram sweep's clamp exactly (rank parity is asserted
    by the driver dryrun).  Returns (curr (r, r) to fold into the left
    core, nxt (r, r) to fold into the right core, kept rank)."""
    eigl, vl = jnp.linalg.eigh(gl)
    eigr, vr = jnp.linalg.eigh(gr)
    l12 = jnp.sqrt(jnp.abs(eigl))
    r12 = jnp.sqrt(jnp.abs(eigr))
    l12 = jnp.where(l12 <= jnp.max(l12) * 1e-8, 0.0, l12)
    r12 = jnp.where(r12 <= jnp.max(r12) * 1e-8, 0.0, r12)
    lm12 = jnp.where(l12 == 0.0, 0.0, 1.0 / jnp.where(l12 == 0.0, 1.0, l12))
    rm12 = jnp.where(r12 == 0.0, 0.0, 1.0 / jnp.where(r12 == 0.0, 1.0, r12))
    cross = (l12[:, None] * vl.T) @ (vr * r12[None, :])
    u, s, vt = jnp.linalg.svd(cross, full_matrices=False)
    k = jnp.minimum(_trunc_count(s, budget), kmax)
    m = (jnp.arange(s.shape[0], dtype=jnp.int32) < k).astype(s.dtype)
    curr = vl @ (lm12[:, None] * (u * m[None, :]))
    nxt = ((m * s)[:, None] * vt * rm12[None, :]) @ vr.T
    return curr, nxt, k


def _train_shard_meta(mesh, first, mids, last, bounds):
    """Validated ``(n_stages, per-bond bounds)`` for a train-sharded
    sweep: the shared entry logic of the distributed rounding forms."""
    n_stages = mesh.shape["model"]
    r = last.shape[0]
    d_total = mids.shape[0] + 2
    if mids.shape[0] % n_stages != 0:
        raise ValueError(
            f"middle-core count ({mids.shape[0]}) must be divisible by "
            f"the model axis ({n_stages})"
        )
    if bounds is None:
        from tensor_networks_tpu.ops.fast import _bond_bounds

        modes = (
            [first.shape[0]]
            + [mids.shape[2]] * (d_total - 2)
            + [last.shape[1]]
        )
        bounds = _bond_bounds(modes, [r] * (d_total - 1), r)
    return n_stages, np.asarray(bounds, np.int32)


def tt_gram_round_sharded(
    mesh: Mesh,
    first: jnp.ndarray,
    mids: jnp.ndarray,
    last: jnp.ndarray,
    eps: float,
    bounds=None,
):
    """Distributed TT rounding (Gram-SVD, IPDPS'22) with the train sharded
    along the mesh's ``model`` axis.

    No orthogonalization sweep at all: a backward Gram-accumulation scan
    (pure GEMMs) and a forward eigh-based truncation scan, each staged
    across devices with an (r x r) ``ppermute`` carry per hop.  Truncated
    directions are zero-masked (static shapes); kept ranks are returned
    per bond.  Resolution floor: singular values below sqrt(dtype eps) of
    the norm (the Gram trade-off).
    """
    n_stages, bounds = _train_shard_meta(mesh, first, mids, last, bounds)
    fn = _gram_sharded_fn(mesh)
    return fn(
        first,
        mids,
        last,
        jnp.asarray(bounds[1:]),
        jnp.asarray(eps, first.dtype),
        jnp.asarray(bounds[0]),
    )


@lru_cache(maxsize=16)
def _gram_sharded_fn(mesh: Mesh):
    """Jitted shard_map program for :func:`tt_gram_round_sharded`,
    cached per mesh (a fresh closure per call would re-trace the whole
    staged program every time; eps and the bounds are traced operands
    so one executable serves every tolerance at fixed shapes)."""
    n_stages = mesh.shape["model"]

    def body(first_rep, mids_local, last_rep, bounds_local, eps_s, b0):
        my = jax.lax.axis_index("model")
        r = last_rep.shape[0]
        d_total = n_stages * mids_local.shape[0] + 2

        # ---- stage A (right-to-left): local gram chains ----------------
        g_last = jnp.matmul(last_rep, last_rep.T, precision="highest")

        def gram_step(g, core):
            s = core.shape
            tmp = (core.reshape(-1, s[-1]) @ g).reshape(-1, s[-2] * s[-1])
            g_new = tmp @ core.reshape(-1, s[-2] * s[-1]).T
            return g_new, g_new

        carry = jax.lax.pcast(g_last, ("model",), to="varying")
        gr_local = jnp.zeros(
            (mids_local.shape[0], r, r), dtype=first_rep.dtype
        )
        for stage in range(n_stages - 1, -1, -1):
            def active(args):
                # the forward step at local core j needs the gram of all
                # cores strictly to its right: the backward scan's output
                # at j+1, with the stage-entry carry for the block's end
                c, blk = args
                c_out, grams = jax.lax.scan(
                    gram_step, c, blk, reverse=True
                )
                gr_for_fwd = jnp.concatenate(
                    [grams[1:], c[None]], axis=0
                )
                return c_out, gr_for_fwd

            def passive(args):
                c, blk = args
                # derive zeros from blk so the varying-axes type matches
                return c, blk[:, :, 0, :] * 0.0

            new_carry, grams = jax.lax.cond(
                my == stage, active, passive, (carry, mids_local)
            )
            gr_local = jnp.where(my == stage, grams, gr_local)
            if stage > 0:
                perm = [(s, (s - 1) % n_stages) for s in range(n_stages)]
                carry = jax.lax.ppermute(new_carry, "model", perm)
            else:
                carry = new_carry

        # gram entering bond 0 (of everything right of the first core)
        g_bond0 = jax.lax.psum(
            jnp.where(my == 0, carry, jnp.zeros_like(carry)), "model"
        )
        norm_sq = jnp.sum((first_rep @ g_bond0) * first_rep)
        norm = jnp.sqrt(jnp.abs(norm_sq))
        budget = (
            eps_s.astype(first_rep.dtype)
            * norm
            / jnp.sqrt(jnp.asarray(d_total - 1.0, first_rep.dtype))
        )

        # ---- stage B (left-to-right): truncation sweep ------------------
        gl0 = jnp.matmul(first_rep.T, first_rep, precision="highest")
        kmax0 = jnp.minimum(
            jnp.int32(min(first_rep.shape[0], r)), b0.astype(jnp.int32)
        )
        curr0, nxt0, k0 = _gram_truncate(gl0, g_bond0, budget, kmax0)
        first_out = first_rep @ curr0

        def fwd_step(carry, inputs):
            carry_nxt, kprev = carry
            core, gr, bound = inputs
            rr, n, rc = core.shape
            cur = jnp.einsum(
                "ak,knc->anc", carry_nxt, core, precision="highest"
            )
            mat = cur.reshape(-1, rc)
            gl = jnp.matmul(mat.T, mat, precision="highest")
            kmax = jnp.minimum(
                jnp.minimum(kprev * n, jnp.int32(rc)), bound
            )
            curr, nxt, k = _gram_truncate(gl, gr, budget, kmax)
            core_out = (mat @ curr).reshape(rr, n, rc)
            return (nxt, k), (core_out, k)

        carry_fwd = jax.lax.pcast(nxt0, ("model",), to="varying")
        carry_k = jax.lax.pcast(k0, ("model",), to="varying")
        mids_out = jnp.zeros_like(mids_local)
        ranks_local = jnp.zeros(
            (mids_local.shape[0],), dtype=jnp.int32
        )
        for stage in range(n_stages):
            def active_f(args):
                c, ck, blk, grs, bnds = args
                (c_out, ck_out), (cores, ks) = jax.lax.scan(
                    fwd_step, (c, ck), (blk, grs, bnds)
                )
                return c_out, ck_out, cores, ks

            def passive_f(args):
                c, ck, blk, _, _ = args
                ks = (blk[:, 0, 0, 0] * 0).astype(jnp.int32)
                return c, ck, blk * 0.0, ks

            new_carry, new_k, cores, ks = jax.lax.cond(
                my == stage,
                active_f,
                passive_f,
                (carry_fwd, carry_k, mids_local, gr_local, bounds_local),
            )
            mids_out = jnp.where(my == stage, cores, mids_out)
            ranks_local = jnp.where(my == stage, ks, ranks_local)
            if stage < n_stages - 1:
                perm = [(s, (s + 1) % n_stages) for s in range(n_stages)]
                carry_fwd = jax.lax.ppermute(new_carry, "model", perm)
                carry_k = jax.lax.ppermute(new_k, "model", perm)
            else:
                carry_fwd = new_carry
                carry_k = new_k

        nxt_last = jax.lax.psum(
            jnp.where(
                my == n_stages - 1,
                carry_fwd,
                jnp.zeros_like(carry_fwd),
            ),
            "model",
        )
        last_out = nxt_last @ last_rep
        return first_out, mids_out, last_out, k0, ranks_local

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None, None),
            P("model", None, None, None),
            P(None, None),
            P("model"),
            P(),
            P(),
        ),
        out_specs=(
            P(None, None),
            P("model", None, None, None),
            P(None, None),
            P(),
            P("model"),
        ),
    )
    return jax.jit(fn)


def tt_prefix_round_sharded(
    mesh: Mesh,
    first: jnp.ndarray,
    mids: jnp.ndarray,
    last: jnp.ndarray,
    eps: float,
    sign_iters: int = 100,
    bounds=None,
    chain_precision: str | None = None,
):
    """Distributed parallel-prefix rounding (relative eps): the GEMM-only
    Gram-chain mode of ``ops.fast.tt_round_fixed(method="prefix")`` with
    the train sharded along the mesh's ``model`` axis.

    Structure (single-device semantics: `_tt_round_prefix_sweep_fn`):

    * the left (H) and right (G) Gram chains run *simultaneously* in one
      staged loop — at loop step t, device t advances H over its local
      block while device P-1-t advances G, each carry an (r x r)
      ``ppermute`` hop — so both chains finish in P stages (the gram
      sharded sweep needs 2 sequential staged loops),
    * everything after the chains (whitening Cholesky, Newton-Schulz
      sign projectors, CholQR2 bases, oblique insertions) is batched
      over each device's L+1 local bonds with NO communication,
    * boundary bonds are single-source: the device owning a block's
      right-boundary bond computes that bond's insertion pair and ships
      ``b^T`` (one more (r x r) ppermute) to its right neighbor, so the
      inserted ``a_k b_k^T`` at every bond comes from ONE device's
      projector — bit-consistent ranks and factors across the cut.

    Per-bond per-direction threshold tau^2 = (eps^2 ||X||^2) / ((d-1) r)
    — the same error contract as the single-device prefix sweep, same
    accuracy scope (Gram squaring: ~sqrt(mach eps) resolution floor).
    ``chain_precision`` (default: the TNT_PREFIX_CHAIN_PREC env var,
    then "highest") selects the H/G chain matmul passes, mirroring the
    single-device knob.  A Cholesky breakdown (NaN output) falls back
    to the eigh-based :func:`tt_gram_round_sharded` with a warning and
    a ``ROUND_STATS["fallback_nan"]`` count, matching the single-device
    contract.  Returns (first_out, mids_out (sharded), last_out, k0,
    local ranks).
    """
    n_stages, bounds = _train_shard_meta(mesh, first, mids, last, bounds)
    blk = mids.shape[0] // n_stages
    if chain_precision is None:
        chain_precision = os.environ.get(
            "TNT_PREFIX_CHAIN_PREC", "highest"
        )
    # device s needs bonds [s*blk, s*blk + blk] inclusive
    b_ext = np.stack(
        [bounds[s * blk : s * blk + blk + 1] for s in range(n_stages)]
    )  # (n_stages, blk + 1)
    fn = _prefix_sharded_fn(mesh, sign_iters, chain_precision)
    out = fn(
        first,
        mids,
        last,
        jnp.asarray(b_ext),
        jnp.asarray(eps, first.dtype),
    )
    f, m, l, k0, ranks = out
    if not bool(jnp.isfinite(jnp.sum(f) + jnp.sum(m) + jnp.sum(l))):
        from tensor_networks_tpu.ops.fast import ROUND_STATS

        ROUND_STATS["fallback_nan"] += 1
        warnings.warn(
            "distributed prefix rounding broke down (NaN — Cholesky on "
            "a heavily rank-deficient train); falling back to the "
            "eigh-based distributed gram sweep",
            RuntimeWarning,
            stacklevel=2,
        )
        return tt_gram_round_sharded(mesh, first, mids, last, eps, bounds)
    return out


@lru_cache(maxsize=16)
def _prefix_sharded_fn(
    mesh: Mesh, sign_iters: int, chain_precision: str
):
    """Jitted shard_map program for :func:`tt_prefix_round_sharded`,
    cached per (mesh, sign_iters, chain precision); eps and the bond
    bounds are traced operands, so one executable serves every
    tolerance at fixed shapes."""
    from tensor_networks_tpu.kernels.ozaki import _pow2_exact, two_sum
    from tensor_networks_tpu.ops.fast import (
        _chol_adaptive,
        _proj_basis_cols,
        _sign_newton_schulz,
    )

    n_stages = mesh.shape["model"]
    dw = chain_precision == "dw"
    cprec = (
        jax.lax.Precision.HIGHEST
        if chain_precision in ("highest", "dw")
        else chain_precision
    )

    def body(first_rep, mids_local, last_rep, bounds_loc, eps_s):
        my = jax.lax.axis_index("model")
        dt = first_rep.dtype
        r = last_rep.shape[0]
        d_total = n_stages * mids_local.shape[0] + 2
        mach = jnp.asarray(jnp.finfo(dt).eps, dt)
        tiny = jnp.asarray(1e-30, dt)
        L = mids_local.shape[0]
        bounds_loc = bounds_loc[0]  # (L + 1,)

        # ---- chain inits (replicated ends: identical everywhere) ------
        h0 = jnp.matmul(first_rep.T, first_rep, precision="highest")
        h0 = h0 / (jnp.trace(h0) / r + tiny)
        g0 = jnp.matmul(last_rep, last_rep.T, precision="highest")
        g0 = g0 / (jnp.trace(g0) / r + tiny)

        def _renorm2(hi, lo):
            # exact power-of-two rescale so the compensation word
            # survives (mirrors _tt_round_prefix_sweep_fn's dw chain)
            tr = jnp.trace(hi) / r + tiny
            _, e = jnp.frexp(tr)
            s = _pow2_exact(e).astype(dt)
            return hi / s, lo / s

        if dw:

            def h_step(m, x):
                t = jnp.einsum("wab,anc->wbnc", m, x, precision=cprec)
                m2 = jnp.einsum("wbnc,bnC->wcC", t, x, precision=cprec)
                hi, lo = two_sum(m2[0], m2[1])
                hi, lo = _renorm2(hi, lo)
                return jnp.stack([hi, lo]), hi + lo

            def g_step(m, x):
                t = jnp.einsum("anc,wcC->wanC", x, m, precision=cprec)
                m2 = jnp.einsum("wanC,bnC->wab", t, x, precision=cprec)
                hi, lo = two_sum(m2[0], m2[1])
                hi, lo = _renorm2(hi, lo)
                return jnp.stack([hi, lo]), hi + lo

            zero_w = jnp.zeros((r, r), dt)
            h_carry = jax.lax.pcast(
                jnp.stack([h0, zero_w]), ("model",), to="varying"
            )
            g_carry = jax.lax.pcast(
                jnp.stack([g0, zero_w]), ("model",), to="varying"
            )
        else:

            def h_step(m, x):
                t = jnp.einsum("ab,anc->bnc", m, x, precision=cprec)
                m2 = jnp.einsum("bnc,bnC->cC", t, x, precision=cprec)
                m2 = m2 / (jnp.trace(m2) / r + tiny)
                return m2, m2

            def g_step(m, x):
                t = jnp.einsum("anc,cC->anC", x, m, precision=cprec)
                m2 = jnp.einsum("anC,bnC->ab", t, x, precision=cprec)
                m2 = m2 / (jnp.trace(m2) / r + tiny)
                return m2, m2

            h_carry = jax.lax.pcast(h0, ("model",), to="varying")
            g_carry = jax.lax.pcast(g0, ("model",), to="varying")

        def _collapse(c):
            return c[0] + c[1] if dw else c
        zero_b = jnp.zeros((L, r, r), dt)
        h_in = jnp.zeros((r, r), dt)
        g_in = jnp.zeros((r, r), dt)
        h_loc = zero_b
        g_loc = zero_b

        # ---- both chains in ONE staged loop ---------------------------
        for t in range(n_stages):
            def h_active(args):
                c, b = args
                return jax.lax.scan(h_step, c, b)

            def g_active(args):
                c, b = args
                return jax.lax.scan(g_step, c, b, reverse=True)

            def passive(args):
                c, b = args
                return c, b[:, :, 0, :] * 0.0

            h_out, hs = jax.lax.cond(
                my == t, h_active, passive, (h_carry, mids_local)
            )
            g_out, gs = jax.lax.cond(
                my == n_stages - 1 - t,
                g_active,
                passive,
                (g_carry, mids_local),
            )
            h_in = jnp.where(my == t, _collapse(h_carry), h_in)
            h_loc = jnp.where(my == t, hs, h_loc)
            g_in = jnp.where(
                my == n_stages - 1 - t, _collapse(g_carry), g_in
            )
            g_loc = jnp.where(my == n_stages - 1 - t, gs, g_loc)
            if t < n_stages - 1:
                fwd = [(s, (s + 1) % n_stages) for s in range(n_stages)]
                bwd = [(s, (s - 1) % n_stages) for s in range(n_stages)]
                h_carry = jax.lax.ppermute(h_out, "model", fwd)
                g_carry = jax.lax.ppermute(g_out, "model", bwd)

        # local bonds base..base+L: H from [carry-in, local scans],
        # G from [local scans, carry-in]
        h_b = jnp.concatenate([h_in[None], h_loc], axis=0)
        g_b = jnp.concatenate([g_loc, g_in[None]], axis=0)
        nl = L + 1

        # ---- batched whitening (local bonds only) ---------------------
        eye = jnp.eye(r, dtype=dt)
        hg = jnp.concatenate([h_b, g_b], axis=0)
        jit_hg = (jnp.einsum("kaa->k", hg) / r + 1e-30) * (20.0 * mach)
        l_hg, jit_hg = _chol_adaptive(hg, jit_hg)
        jit_h, jit_g = jit_hg[:nl], jit_hg[nl:]
        e_b = jnp.swapaxes(l_hg[:nl], 1, 2)  # upper: H = E^T E
        f_b = jnp.swapaxes(l_hg[nl:], 1, 2)  # upper: G = F^T F

        # ---- thresholds (relative): tau^2 = eps^2 ||X||^2 / ((d-1) r) -
        norm2 = jnp.einsum("kab,kba->k", h_b, g_b, precision="highest")
        eps_b = eps_s.astype(dt)
        tau2 = eps_b**2 * norm2 / jnp.asarray((d_total - 1.0) * r, dt)

        if not dw:
            # round-3 trace-bound ghost deflation (loose mode)
            w_b = jnp.einsum(
                "kab,kcb->kac", e_b, f_b, precision="highest"
            )
            ww = jnp.einsum(
                "kab,kcb->kac", w_b, w_b, precision="highest"
            )
            ww = 0.5 * (ww + jnp.swapaxes(ww, 1, 2))
            ghost = jit_h * jnp.einsum(
                "kaa->k", g_b
            ) + jit_g * jnp.einsum("kaa->k", h_b)
            tau2 = tau2 + 2.0 * ghost
        else:
            # spectral trust filters + tau^2 noise clamp — the dw
            # decision stage of ops.fast._tt_round_prefix_sweep_fn,
            # applied to this device's local bonds (batched, no comm)
            hg_sym = 0.5 * (hg + jnp.swapaxes(hg, 1, 2))
            pv = jax.random.normal(jax.random.PRNGKey(3), (r,), dt)
            pv = pv / jnp.linalg.norm(pv)
            v = jnp.broadcast_to(pv, hg.shape[:1] + (r,))
            for _ in range(3):
                v = jnp.einsum(
                    "kab,kb->ka", hg, v, precision="highest"
                )
                v = v / (
                    jnp.linalg.norm(v, axis=1, keepdims=True) + tiny
                )
            lmax = jnp.abs(
                jnp.einsum("ka,kab,kb->k", v, hg, v, precision="highest")
            ) + tiny
            theta = 2.0 * jit_hg + 2.0 * mach * lmax
            a_t = hg_sym - theta[:, None, None] * eye[None]
            alpha_t = jnp.max(
                jnp.sum(jnp.abs(a_t), axis=2), axis=1
            ) + tiny
            sign_t = _sign_newton_schulz(
                a_t, alpha_t, min(sign_iters, 40)
            )
            trust = 0.5 * (eye[None] + sign_t)
            ep = jnp.einsum(
                "kab,kbc->kac", e_b, trust[:nl], precision="highest"
            )
            pf = jnp.einsum(
                "kab,kcb->kac", trust[nl:], f_b, precision="highest"
            )
            w_b = jnp.einsum(
                "kab,kbc->kac", ep, pf, precision="highest"
            )
            ww = jnp.einsum(
                "kab,kcb->kac", w_b, w_b, precision="highest"
            )
            ww = 0.5 * (ww + jnp.swapaxes(ww, 1, 2))
            vw = jnp.broadcast_to(pv, ww.shape[:1] + (r,))
            for _ in range(3):
                vw = jnp.einsum(
                    "kab,kb->ka", ww, vw, precision="highest"
                )
                vw = vw / (
                    jnp.linalg.norm(vw, axis=1, keepdims=True) + tiny
                )
            lmax_ww = jnp.abs(
                jnp.einsum(
                    "ka,kab,kb->k", vw, ww, vw, precision="highest"
                )
            ) + tiny
            tau2 = tau2 + 2.0 * mach * lmax_ww

        # ---- batched sign projectors + bases + insertions -------------
        a0 = ww - tau2[:, None, None] * eye[None]
        alpha = jnp.max(jnp.sum(jnp.abs(a0), axis=2), axis=1) + tiny
        sign = _sign_newton_schulz(a0, alpha, sign_iters)
        proj = 0.5 * (eye[None] + sign)
        ks = jnp.minimum(
            jnp.clip(
                jnp.round(jnp.einsum("kaa->k", proj)).astype(jnp.int32),
                1,
                r,
            ),
            bounds_loc,
        )
        masks = (
            jnp.arange(r, dtype=jnp.int32)[None, :] < ks[:, None]
        ).astype(dt)

        # shared with the fused sweep: CholQR + Newton-Schulz polish on
        # the fixed orthonormal probe (bond-local, no communication)
        q_b = _proj_basis_cols(proj, masks, mach)
        a_ins = jax.lax.linalg.triangular_solve(
            e_b, q_b, left_side=True, lower=False
        )  # E a = Q
        bt_ins = jnp.einsum("kca,kcb->kab", q_b, e_b, precision="highest")

        # ---- single-source boundary bonds ------------------------------
        # bond s*blk is computed on BOTH device s-1 (as its right
        # boundary, index L) and device s (as its left boundary, index
        # 0); their Newton-Schulz iteration counts can differ, so the
        # inserted pair must come from ONE projector: ship b^T from the
        # left neighbor and use it on every device but 0.
        fwd = [(s, (s + 1) % n_stages) for s in range(n_stages)]
        bt_recv = jax.lax.ppermute(bt_ins[L], "model", fwd)
        bt0 = jnp.where(my == 0, bt_ins[0], bt_recv)
        bt_use = jnp.concatenate([bt0[None], bt_ins[1:L]], axis=0)

        # ---- project cores (all local GEMMs) ---------------------------
        first_out = jax.lax.psum(
            jnp.where(
                my == 0,
                jnp.matmul(first_rep, a_ins[0], precision="highest"),
                jnp.zeros((first_rep.shape[0], r), dt),
            ),
            "model",
        )
        mids_out = jnp.einsum(
            "kma,kanb,kbp->kmnp",
            bt_use,
            mids_local,
            a_ins[1:],
            precision="highest",
        )
        last_out = jax.lax.psum(
            jnp.where(
                my == n_stages - 1,
                jnp.matmul(bt_ins[L], last_rep, precision="highest"),
                jnp.zeros((r, last_rep.shape[1]), dt),
            ),
            "model",
        )
        k0 = jax.lax.psum(
            jnp.where(my == 0, ks[0], jnp.int32(0)), "model"
        )
        return first_out, mids_out, last_out, k0, ks[1:]

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None, None),
            P("model", None, None, None),
            P(None, None),
            P("model", None),
            P(),
        ),
        out_specs=(
            P(None, None),
            P("model", None, None, None),
            P(None, None),
            P(),
            P("model"),
        ),
    )
    return jax.jit(fn)
