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


@partial(jax.jit, static_argnames=())
def tt_evaluate_dw2_words(f_hi, f_lo, m_hi, m_lo, l_hi, l_lo, idx):
    """Double-word evaluation of DOUBLE-WORD cores.

    f64 host cores are split into hi/lo f32 word pairs (exactly:
    hi = f32(x), lo = f32(x - hi), |lo| <= 2^-24 |hi|) and every
    per-step product contracts BOTH word pairs through the Ozaki
    split-matmul — the device program stays pure f32 while the
    evaluation is faithful to the f64 values at ~2^-48.  This is how
    the on-chip cross approximant (host-assembled f64 cores) is
    sampled without the f32 pack truncation that floored the round-5
    first-pass cross at 1.6e-7.
    """
    idx = idx.astype(jnp.int32)
    vh = f_hi[idx[:, 0], :]
    vl = f_lo[idx[:, 0], :]

    def step(carry, inputs):
        ch, cl = carry
        mh, ml, cols = inputs
        r, n, r2 = mh.shape
        uh, ul = oz_matmul(
            [ch, cl], [mh.reshape(r, n * r2), ml.reshape(r, n * r2)],
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

    if m_hi.shape[0] > 0:
        (vh, vl), _ = jax.lax.scan(
            step, (vh, vl), (m_hi, m_lo, idx[:, 1:-1].T)
        )

    oh, ol = oz_matmul(
        [vh, vl], [l_hi, l_lo], target_bits=48, out_words=2
    )
    cols = idx[:, -1]
    oh = jnp.take_along_axis(oh, cols[:, None], axis=1)[:, 0]
    ol = jnp.take_along_axis(ol, cols[:, None], axis=1)[:, 0]
    return oh, ol


def split_words_np(x):
    """Exact hi/lo f32 word pair of an f64 array (hi + lo == x up to
    f64 round-off of the residual; |lo| <= ulp(hi)/2)."""
    x64 = np.asarray(x, np.float64)
    hi = x64.astype(np.float32)
    lo = (x64 - hi).astype(np.float32)
    return hi, lo


def pack_chain_np(tn):
    """Chain extraction + pack_ragged's padding, kept in NumPy f64.

    Mirrors ``ops.packed.pack_ragged`` (pow2 rank bucket >= 32, mode
    padding to the max) but never converts through jnp — so f64 host
    cores survive to the word split.  Returns
    ``(first, mids, last, frees)`` f64 arrays or None when the network
    is not a uniform chain.
    """
    from tensor_networks_tpu.ops.packed import chain_cores

    extracted = chain_cores(tn)
    if extracted is None:
        return None
    _, cores, frees, _ = extracted
    # keep f32 chains f32 (the single-word kernel is ~2x cheaper and
    # exact for them); anything wider stays f64 for the word split
    all_f32 = all(
        np.dtype(getattr(c, "dtype", np.float64)) == np.float32
        for c in cores
    )
    dt = np.float32 if all_f32 else np.float64
    cores = [np.asarray(c, dt) for c in cores]
    nmax = max(f.size for f in frees)
    rmax = max(
        [c.shape[-1] for c in cores[:-1]]
        + [c.shape[0] for c in cores[1:]]
    )
    r = max(32, 1 << (rmax - 1).bit_length())
    first = np.pad(
        cores[0],
        ((0, nmax - cores[0].shape[0]), (0, r - cores[0].shape[1])),
    )
    mids = np.stack(
        [
            np.pad(
                c,
                (
                    (0, r - c.shape[0]),
                    (0, nmax - c.shape[1]),
                    (0, r - c.shape[2]),
                ),
            )
            for c in cores[1:-1]
        ]
    )
    last = np.pad(
        cores[-1],
        ((0, r - cores[-1].shape[0]), (0, nmax - cores[-1].shape[1])),
    )
    return first, mids, last, frees


def tt_evaluate_dw(first, mids, last, idx) -> np.ndarray:
    """Host-combined f64 values of the double-word evaluation.

    One device program, two f32 outputs, combined in f64 on the host —
    the device program never touches f64 (TPU-safe).  f64 inputs are
    word-split so the full f64 core values are honored; f32 inputs use
    the single-word-core kernel."""
    if np.asarray(first).dtype == np.float64:
        fh, fl = split_words_np(first)
        mh, ml = split_words_np(mids)
        lh, ll = split_words_np(last)
        hi, lo = tt_evaluate_dw2_words(
            fh, fl, mh, ml, lh, ll, jnp.asarray(idx)
        )
    else:
        hi, lo = tt_evaluate_dw_words(
            first, mids, last, jnp.asarray(idx)
        )
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
