"""Double-word (compensated) batched TT evaluation on device.

The f32 device evaluation paths (ragged / pallas / XLA matmul) carry
~1e-7 relative noise per call — fine for training lookups, but it is
the floor of the on-chip cross loop: fiber matrices sampled at f32
noise put a ~1e-6 error floor under the whole approximation
(BENCH r04: ``cross_device_rel_err = 4.9e-6``).  This kernel evaluates
the SAME f32 cores in double-word arithmetic: the point value rides
the scan as an unevaluated hi+lo pair, every per-step product runs
through the Ozaki split-matmul (:func:`kernels.ozaki.oz_matmul`,
~2^-48 absolute per product), and the pair is combined to f64 on the
host — so fibers come back at ~1e-13 relative, well under the 1e-8
target (VERDICT r4 item 5).  Reference hot loop being replaced:
``pytens/cross/cross.py:177-201`` (its fibers are f64 NumPy; ours are
device-resident f32 trains sampled at f64-class fidelity).

The device program stays pure f32 (the TPU compiler SIGABRTs on f64);
only the final host combine widens.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tensor_networks_tpu.kernels.ozaki import oz_matmul

__all__ = ["tt_evaluate_dw_words", "tt_evaluate_dw"]


@partial(jax.jit, static_argnames=())
def tt_evaluate_dw_words(first, mids, last, idx):
    """Batched evaluation, returning ``(hi, lo)`` f32 arrays whose sum
    is the value at ~2^-48 relative.

    Shapes: ``first (n, r)``, ``mids (d-2, r, n, r)``, ``last (r, n)``,
    ``idx (B, d)`` int32.  The per-step contraction is the same
    ``(B, r) @ (r, n*r)`` + row-select as the XLA matmul form
    (``parallel.sharded.tt_evaluate_batched``); each matmul runs as an
    Ozaki split product so the carry pair stays accurate end to end
    (gathers and row-selects are exact).
    """
    idx = idx.astype(jnp.int32)
    vh = first[idx[:, 0], :]  # exact gather
    vl = jnp.zeros_like(vh)

    def step(carry, inputs):
        ch, cl = carry
        core, cols = inputs  # core (r, n, r2); cols (B,)
        r, n, r2 = core.shape
        uh, ul = oz_matmul(
            [ch, cl], [core.reshape(r, n * r2)],
            target_bits=48, out_words=2,
        )
        b = ch.shape[0]
        uh = jnp.take_along_axis(
            uh.reshape(b, n, r2), cols[:, None, None], axis=1
        )[:, 0, :]
        ul = jnp.take_along_axis(
            ul.reshape(b, n, r2), cols[:, None, None], axis=1
        )[:, 0, :]
        return (uh, ul), None

    if mids.shape[0] > 0:
        (vh, vl), _ = jax.lax.scan(step, (vh, vl), (mids, idx[:, 1:-1].T))

    # final bond contraction: (B, r) @ (r, n) then per-sample column
    # select (exact)
    oh, ol = oz_matmul([vh, vl], [last], target_bits=48, out_words=2)
    cols = idx[:, -1]
    b = oh.shape[0]
    oh = jnp.take_along_axis(oh, cols[:, None], axis=1)[:, 0]
    ol = jnp.take_along_axis(ol, cols[:, None], axis=1)[:, 0]
    return oh, ol


def tt_evaluate_dw(first, mids, last, idx) -> np.ndarray:
    """Host-combined f64 values of the double-word evaluation.

    One device program, two f32 outputs, combined in f64 on the host —
    the device program never touches f64 (TPU-safe)."""
    hi, lo = tt_evaluate_dw_words(first, mids, last, jnp.asarray(idx))
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
