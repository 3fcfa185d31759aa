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

from functools import lru_cache

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


def pad_bond(mids: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad the bond axes of stacked middle cores (d, r, n, r) to the
    next multiple of the 128-wide MXU lane."""
    d, r, n, r2 = mids.shape
    rp = -(-r // LANE) * LANE
    rp2 = -(-r2 // LANE) * LANE
    if rp == r and rp2 == r2:
        return mids
    return jnp.pad(mids, ((0, 0), (0, rp - r), (0, 0), (0, rp2 - r2)))


def _make_zipper_kernel(precision: str):
    # Mosaic supports only single-pass (DEFAULT) and 6-pass (HIGHEST)
    # f32 matmuls; Precision.HIGH raises NotImplementedError in lowering
    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
    }[precision]

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
        t = jax.lax.dot_general(
            w.T,
            a,
            (((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32,
        )
        t = t.reshape(rp * n, rp2)  # regroup (b1, n) into rows
        b = b_ref[0].reshape(rp * n, rp2)
        # w'[a2, b2] = sum_(b1 n) t[(b1 n), a2] b[(b1 n), b2]
        w_scratch[:] = jax.lax.dot_general(
            t.T,
            b,
            (((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32,
        )

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
