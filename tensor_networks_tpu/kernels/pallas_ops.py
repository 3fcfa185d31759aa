"""Pallas TPU kernels for the hot TT sweeps.

The inner-product zipper is HBM-bandwidth-bound: each core is read once
and the (r x r) carry is tiny.  The XLA ``lax.scan`` version re-stages the
carry through HBM every step and pipelines poorly; this kernel keeps the
carry in VMEM scratch across sequential grid steps while Pallas
double-buffers the core blocks, so the sweep runs near the HBM roof.

Layout contract: bond dimensions are zero-padded to a multiple of 128
(the MXU/lane width) by :func:`pad_bond`.  That makes every in-kernel
reshape lane-aligned (Mosaic requirement) and every matmul a full-tile
MXU op.  Zero padding is numerically inert for the zipper.

Grid semantics: TPU grid steps execute sequentially on a core — exactly
the dependency structure of a carry sweep.
"""

from __future__ import annotations

import logging
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas import is cheap but keep the fallback explicit
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False

LANE = 128

logger = logging.getLogger(__name__)

#: observability: how often the pallas path ran vs fell back (tests and
#: perf debugging read these; a silent fallback is a perf cliff)
PATH_STATS = {"pallas": 0, "fallback": 0, "ragged": 0}


def pad_bond(mids: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad the bond axes of stacked middle cores (d, r, n, r) to the
    next multiple of the 128-wide MXU lane."""
    d, r, n, r2 = mids.shape
    rp = -(-r // LANE) * LANE
    rp2 = -(-r2 // LANE) * LANE
    if rp == r and rp2 == r2:
        return mids
    return jnp.pad(mids, ((0, 0), (0, rp - r), (0, 0), (0, rp2 - r2)))


def _pick_dot(precision: str):
    """Matmul for the zipper kernels at the chosen accuracy/speed point.

    Mosaic lowers only single-pass (DEFAULT, raw bf16) and 6-pass
    (HIGHEST, full f32) matmuls — Precision.HIGH (3-pass) raises
    NotImplementedError.  "bf16x3" recovers the 3-pass point manually
    (hi*hi + hi*lo + lo*hi over split mantissas, :func:`_split_dot`):
    ~1e-6 relative accuracy at ~half the HIGHEST cost.
    """
    if precision == "bf16x3":
        return _split_dot
    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
    }[precision]

    def dot(x, y):
        return jax.lax.dot_general(
            x,
            y,
            (((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32,
        )

    return dot


def _make_zipper_kernel(precision: str):
    dot = _pick_dot(precision)

    def _zipper_kernel(a_ref, b_ref, w0_ref, out_ref, w_scratch):
        """One grid step: w <- sum_n A_i(n)^T w B_i(n).

        Blocks are (1, rp, n, rp) with rp a lane multiple, so the reshapes
        below are pure sublane/lane regroupings.
        """
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            w_scratch[:] = w0_ref[:]

        rp = a_ref.shape[1]
        n = a_ref.shape[2]
        rp2 = a_ref.shape[3]

        a = a_ref[0].reshape(rp, n * rp2)  # (rp, n*rp2), lane-aligned
        w = w_scratch[:]
        # t[b1, (n a2)] = sum_a1 w[a1, b1] a[a1, (n a2)]
        t = dot(w.T, a)
        t = t.reshape(rp * n, rp2)  # regroup (b1, n) into rows
        b = b_ref[0].reshape(rp * n, rp2)
        # w'[a2, b2] = sum_(b1 n) t[(b1 n), a2] b[(b1 n), b2]
        w_scratch[:] = dot(t.T, b)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = w_scratch[:]

    return _zipper_kernel


@lru_cache(maxsize=16)
def _zipper_call(
    d_mid: int, rp: int, n: int, interpret: bool, precision: str
):
    def run(mids_a, mids_b, w0):
        return pl.pallas_call(
            _make_zipper_kernel(precision),
            grid=(d_mid,),
            in_specs=[
                pl.BlockSpec(
                    (1, rp, n, rp),
                    lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, rp, n, rp),
                    lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rp, rp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((rp, rp), jnp.float32)],
            interpret=interpret,
        )(mids_a, mids_b, w0)

    return jax.jit(run)


def pad_train(first, mids, last):
    """Zero-pad a packed train's bonds to the 128 lane width: first
    (n, rp), mids (d-2, rp, n, rp), last (rp, n).  Padding is inert for
    inner products, adds, and scales; store hot trains prepadded so the
    fused zipper needs no per-call padding pass."""
    r = first.shape[1]
    rp = -(-r // LANE) * LANE
    if rp != r:
        first = jnp.pad(first, ((0, 0), (0, rp - r)))
        last = jnp.pad(last, ((0, rp - last.shape[0]), (0, 0)))
    return first, pad_bond(mids), last


def _make_fused_kernel(precision: str):
    """The whole inner product in one kernel: step 0 seeds the carry from
    the first cores, every step zips one middle core pair, the final step
    contracts the last cores down to the scalar."""
    dot = _pick_dot(precision)

    def kernel(
        fa_ref, fb_ref, la_ref, lb_ref, a_ref, b_ref, out_ref, w_scratch
    ):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            # w0[a1, b1] = sum_n fa[n, a1] fb[n, b1]
            w_scratch[:] = dot(fa_ref[:].T, fb_ref[:])

        rp = a_ref.shape[1]
        n = a_ref.shape[2]
        rp2 = a_ref.shape[3]
        a = a_ref[0].reshape(rp, n * rp2)
        t = dot(w_scratch[:].T, a).reshape(rp * n, rp2)
        b = b_ref[0].reshape(rp * n, rp2)
        w_scratch[:] = dot(t.T, b)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            # out = sum_ab w[a, b] (la lb^T)[a, b]; Mosaic cannot store
            # scalars to VMEM, so reduce with keepdims to a (1, 1) tile
            lab = dot(la_ref[:], lb_ref[:].T)
            out_ref[:, :] = jnp.sum(
                w_scratch[:] * lab, axis=(0, 1), keepdims=True
            )

    return kernel


@lru_cache(maxsize=16)
def _fused_call(d_mid: int, rp: int, n: int, interpret: bool, precision: str):
    def run(first_a, first_b, last_a, last_b, mids_a, mids_b):
        return pl.pallas_call(
            _make_fused_kernel(precision),
            grid=(d_mid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, rp, n, rp),
                    lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, rp, n, rp),
                    lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((rp, rp), jnp.float32)],
            interpret=interpret,
        )(first_a, first_b, last_a, last_b, mids_a, mids_b)

    return jax.jit(run)


def tt_inner_pallas_fused(
    first_a,
    mids_a,
    last_a,
    first_b,
    mids_b,
    last_b,
    precision: str = "highest",
):
    """The whole TT inner product as ONE pallas dispatch.

    Requires prepadded trains (:func:`pad_train`): bond dims already a
    multiple of the 128 lane width.  First/last contractions run inside
    the kernel's first/last grid steps, so loops dominated by inner
    products (GMRES recurrences, norms, cross validation) pay a single
    ~25 ms relay dispatch per call instead of three.
    """
    if not PALLAS_AVAILABLE:
        raise RuntimeError("pallas unavailable")
    interpret = jax.default_backend() != "tpu"
    d_mid, rp, n, _ = mids_a.shape
    if rp % LANE or first_a.shape[1] != rp or last_a.shape[0] != rp:
        raise ValueError(
            "tt_inner_pallas_fused needs pad_train()-prepadded inputs"
        )
    fn = _fused_call(d_mid, rp, n, interpret, precision)
    out = fn(
        first_a.astype(jnp.float32),
        first_b.astype(jnp.float32),
        last_a.astype(jnp.float32),
        last_b.astype(jnp.float32),
        mids_a.astype(jnp.float32),
        mids_b.astype(jnp.float32),
    )
    return out[0, 0]


# ---------------- batched point evaluation ----------------


def _split_dot(x, y):
    """f32-accurate matmul from three bf16 MXU passes (the bf16x3 split:
    hi*hi + hi*lo + lo*hi covers the f32 mantissa)."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    yh = y.astype(jnp.bfloat16)
    yl = (y - yh.astype(jnp.float32)).astype(jnp.bfloat16)

    def bf16_dot(a, b):
        return jax.lax.dot_general(
            a,
            b,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    return bf16_dot(xh, yh) + bf16_dot(xh, yl) + bf16_dot(xl, yh)


def _make_evaluate_kernel(precision: str):
    split = precision == "bf16x3"

    def bf16_dot(a, b):
        return jax.lax.dot_general(
            a,
            b,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    def dot(v, core_hi, core_lo):
        if split:
            # cores arrive pre-split in bf16 (hi + lo halves of the f32
            # mantissa); only the small carry splits per step
            vh = v.astype(jnp.bfloat16)
            vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
            return (
                bf16_dot(vh, core_hi)
                + bf16_dot(vh, core_lo)
                + bf16_dot(vl, core_hi)
            )
        prec = {
            "highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT,
        }[precision]
        return jax.lax.dot_general(
            v,
            core_hi,
            (((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32,
        )

    def kernel(v0_ref, hi_ref, lo_ref, cols_ref, out_ref, v_scratch):
        """Grid (batch tiles, fused step blocks), steps innermost: the
        carry tile stays in VMEM across the whole train while core
        blocks stream from HBM — no (B, n, r) intermediate ever exists.
        Each grid step advances ``fuse`` train steps (amortizing the
        per-step pipeline overhead); the train is identity-padded to a
        multiple of ``fuse`` by the caller."""
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            v_scratch[:] = v0_ref[:]

        fuse = hi_ref.shape[0]
        rp = hi_ref.shape[1]
        n = hi_ref.shape[2]
        for s in range(fuse):
            core_hi = hi_ref[s].reshape(rp, n * rp)
            # the lo stream exists only for the split mode; other
            # precisions get a tiny dummy block that is never read
            core_lo = (
                lo_ref[s].reshape(rp, n * rp) if split else None
            )
            u = dot(v_scratch[:], core_hi, core_lo).reshape(-1, n, rp)
            # row select via one-hot mask-reduce: Mosaic's dynamic
            # gather cannot cross vregs along the gather dim, so a
            # (TB, n*rp)-wide take_along_axis does not lower; the
            # masked reduce is VPU-cheap
            cols = cols_ref[pl.dslice(j * fuse + s, 1), :][0]
            picked = jax.lax.broadcasted_iota(
                jnp.int32, (u.shape[0], n), 1
            ) == cols[:, None]
            v_scratch[:] = jnp.sum(
                u * picked.astype(u.dtype)[:, :, None], axis=1
            )

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = v_scratch[:]

    return kernel


@lru_cache(maxsize=16)
def _evaluate_call(
    d_blocks: int,
    fuse: int,
    rp: int,
    n: int,
    n_tiles: int,
    tile: int,
    interpret: bool,
    precision: str,
):
    split = precision == "bf16x3"
    lo_spec = (
        pl.BlockSpec(
            (fuse, rp, n, rp),
            lambda i, j: (j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        if split
        else pl.BlockSpec(
            (1, 8, LANE), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM
        )
    )

    def run(v0, mids_hi, mids_lo, cols):
        return pl.pallas_call(
            _make_evaluate_kernel(precision),
            grid=(n_tiles, d_blocks),
            in_specs=[
                pl.BlockSpec(
                    (tile, rp), lambda i, j: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (fuse, rp, n, rp),
                    lambda i, j: (j, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                lo_spec,
                pl.BlockSpec(
                    (d_blocks * fuse, tile),
                    lambda i, j: (0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (tile, rp), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n_tiles * tile, rp), jnp.float32
            ),
            scratch_shapes=[pltpu.VMEM((tile, rp), jnp.float32)],
            interpret=interpret,
        )(v0, mids_hi, mids_lo, cols)

    return jax.jit(run)


def tt_evaluate_pallas(
    first,
    mids,
    last,
    idx,
    precision: str = "bf16x3",
    tile: int = 256,
    fuse: Optional[int] = None,
):
    """Evaluate a uniform TT at (B, d) integer multi-indices with the
    batch carry resident in VMEM.

    The XLA form materializes a (B, n, r) intermediate per step in HBM
    (the throughput ceiling); here each batch tile's (TB, r) carry lives
    in VMEM scratch for the whole train while core blocks stream in.
    ``precision="bf16x3"`` (default) uses the three-pass bf16 split for
    f32-level accuracy at ~3x the bf16 rate.
    """
    if not PALLAS_AVAILABLE:
        raise RuntimeError("pallas unavailable")
    interpret = jax.default_backend() != "tpu"

    mids_p = pad_bond(mids)
    d_mid, rp, n, _ = mids_p.shape
    r = first.shape[1]
    b = idx.shape[0]

    # identity-pad the train to a multiple of the fusion factor: an
    # identity core (every mode slice = I) advances the carry unchanged
    # for any column choice.  bf16x3 holds 4 core blocks (hi/lo x double
    # buffer) so fusing blows the 16 MB scoped-VMEM budget; the 1-pass
    # modes profit from 2-step fusion (+14% measured)
    if fuse is None:
        fuse = 1 if precision == "bf16x3" else 2
    fuse = max(1, min(int(fuse), d_mid))
    d_pad = -(-d_mid // fuse) * fuse
    if d_pad != d_mid:
        eye_core = jnp.broadcast_to(
            jnp.eye(rp, dtype=mids_p.dtype)[:, None, :], (rp, n, rp)
        )
        mids_p = jnp.concatenate(
            [
                mids_p,
                jnp.broadcast_to(
                    eye_core, (d_pad - d_mid, rp, n, rp)
                ),
            ],
            axis=0,
        )

    v0 = jnp.zeros((b, rp), jnp.float32)
    v0 = v0.at[:, :r].set(first[idx[:, 0], :].astype(jnp.float32))
    bp = -(-b // tile) * tile
    if bp != b:
        v0 = jnp.pad(v0, ((0, bp - b), (0, 0)))
    cols = jnp.pad(
        idx[:, 1:-1].T.astype(jnp.int32),
        ((0, d_pad - d_mid), (0, bp - b)),
    )

    fn = _evaluate_call(
        d_pad // fuse, fuse, rp, n, bp // tile, tile, interpret, precision
    )
    mids_f32 = mids_p.astype(jnp.float32)
    if precision == "bf16x3":
        mids_hi = mids_f32.astype(jnp.bfloat16)
        mids_lo = (
            mids_f32 - mids_hi.astype(jnp.float32)
        ).astype(jnp.bfloat16)
    else:
        mids_hi = mids_f32
        # never read by the kernel; a tiny dummy keeps VMEM free
        mids_lo = jnp.zeros((1, 8, LANE), jnp.float32)
    v = fn(v0.astype(jnp.float32), mids_hi, mids_lo, cols)[:b, :r]
    sel_last = last[:, idx[:, -1]].astype(jnp.float32)  # (r, B)
    return jnp.sum(v * sel_last.T, axis=-1)


def tt_inner_pallas(
    first_a,
    mids_a,
    last_a,
    first_b,
    mids_b,
    last_b,
    prepadded: bool = False,
    precision: str = "highest",
):
    """TT inner product with the Pallas zipper over the middle cores.

    First/last contractions are tiny and stay in plain XLA.  When
    ``prepadded`` is False the middle cores are bond-padded on the fly
    (one extra HBM pass); store trains with :func:`pad_bond` applied to
    amortize that in inner-product-heavy loops (GMRES, norms, cross).
    ``precision="highest"`` gives full-f32 MXU passes (the default;
    measured ~2x the HBM-roof time), "default" runs at the roof in bf16.
    Off-TPU this runs in interpret mode (tests only).
    """
    if not PALLAS_AVAILABLE:
        raise RuntimeError("pallas unavailable")
    interpret = jax.default_backend() != "tpu"

    if not prepadded:
        mids_a = pad_bond(mids_a)
        mids_b = pad_bond(mids_b)
    d_mid, rp, n, _ = mids_a.shape
    r_a = first_a.shape[1]
    r_b = first_b.shape[1]

    w0 = jnp.matmul(first_a.T, first_b, precision="highest").astype(
        jnp.float32
    )
    w0 = jnp.pad(w0, ((0, rp - r_a), (0, rp - r_b)))
    fn = _zipper_call(d_mid, rp, n, interpret, precision)
    w = fn(
        mids_a.astype(jnp.float32), mids_b.astype(jnp.float32), w0
    )
    w = w[: last_a.shape[0], : last_b.shape[0]]
    return jnp.sum(
        w
        * jnp.matmul(last_a, last_b.T, precision="highest").astype(
            jnp.float32
        )
    )
