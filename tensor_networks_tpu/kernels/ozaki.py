"""Exact chunked f32 matmuls (Ozaki-style) for compensated precision.

TPU has no float64, and plain f32 matmuls accumulate ~``K * eps_f32``
rounding error over a length-``K`` contraction — the wall that floors
every f32 rounding sweep at ~1e-5 relative on null directions
(VALIDATION.md round 2).  This module buys back precision the way the
Ozaki splitting scheme does, shaped for the MXU:

1. **Chunking.**  Each f32 operand word is split into 8-bit-significand
   chunks on a power-of-two grid aligned to the *matrix-global* max
   exponent.  Chunk significands are integers with ``|c| <= 2**7``, so
   a product of two chunks is an exact 15-bit-significand float and a
   sum of up to 512 such products stays below ``2**23`` — exactly
   representable in f32.  Every partial matmul is therefore EXACT on
   any IEEE f32 accumulator (TPU MXU accumulates f32; the 8-bit chunks
   are also exactly representable in bf16, so even single-pass bf16
   MXU input conversion is lossless).
2. **Batched partials.**  All kept chunk pairs are stacked and run as
   ONE batched matmul; contractions longer than 512 are segmented so
   in-segment accumulation stays exact.
3. **Compensated combine.**  The exact partials are summed smallest-
   to-largest with TwoSum cascades into a double-word (hi, lo) or
   triple-word f32 result — ~48 / ~76 meaningful bits relative to the
   matrix norm.

Global alignment gives *absolute* (backward-error-style) precision: an
entry much smaller than the matrix max keeps only its bits above
``max * 2**-target_bits``.  That is the right contract for rounding
sweeps, whose thresholds are relative to the train norm.

The reference has no analogue (it runs LAPACK f64 on host for
everything, ``pytens/utils.py:19-100``); this is the TPU-native
construction that lets tight truncation budgets (VERDICT r2 #6) run
on-device in f32.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

_W = 8  # chunk significand bits; 2*_W + log2(_SEG) <= 24 keeps sums exact
_SEG = 256  # max contraction length per exact segment

_DEFAULT = jax.lax.Precision.DEFAULT


def two_sum(a, b):
    """Knuth branch-free exact addition: a + b = s + e with fl(s)."""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def fast_two_sum(a, b):
    """Exact addition assuming |a| >= |b| elementwise."""
    s = a + b
    e = b - (s - a)
    return s, e


def _pow2_exact(e):
    """Exact f32 ``2**e`` for int exponents via exponent-field assembly.

    ``jnp.exp2`` lowers to a polynomial approximation that can be a
    full ulp off even on integer inputs (observed: ``exp2(32.0)`` =
    2**32 + 512 on CPU XLA) — which silently breaks every "divide by a
    power of two is exact" step downstream.  Building the float from
    its exponent bits is exact by construction.
    """
    e = jnp.clip(e, -126, 127).astype(jnp.int32)
    return jax.lax.bitcast_convert_type((e + 127) << 23, jnp.float32)


def _axis_scale(a, axis):
    """Smallest power of two >= max|a| along ``axis`` (1 where zero).

    Per-row (for the left operand) / per-column (for the right operand)
    scales give each output entry its own absolute-precision window —
    essential for strongly row-imbalanced matrices like whitening
    preconditioners, whose row scales span many orders of magnitude
    (a single global scale would truncate the small rows at the big
    rows' granularity).
    """
    m = jnp.max(jnp.abs(a), axis=axis, keepdims=True)
    _, e = jnp.frexp(jnp.where(m > 0, m, 1.0))
    return _pow2_exact(e).astype(a.dtype)


def chunk_word(a, scale, n_chunks: int, first_offset: int):
    """Split ``a`` into ``n_chunks`` exact 8-bit chunks.

    Chunk ``j`` holds the bits of ``a / scale`` in the window
    ``[first_offset + j*_W, first_offset + (j+1)*_W)`` below the
    leading bit; returned chunks are f32 arrays on the grid
    ``scale * 2**-(first_offset + (j+1)*_W)`` whose significands are
    integers ``|c| <= 2**(_W-1)``.  The splits use the round-to-grid
    trick ``(r + K) - K`` (exact in IEEE round-to-nearest); the running
    residual is exact at every step, so ``sum(chunks)`` equals ``a``
    truncated at ``first_offset + n_chunks*_W`` bits below ``scale``.

    The intermediate ``r + K`` is wrapped in an optimization barrier:
    K is a compile-time constant, and XLA's algebraic simplifier folds
    ``(r + K) - K -> r`` under jit, silently flattening every chunk
    into the first (observed on CPU XLA; eager mode was exact, which
    is why it escaped the interactive checks).
    """
    dt = a.dtype
    r = a / scale  # exact: scale is a power of two
    out = []
    for j in range(n_chunks):
        bits = first_offset + (j + 1) * _W
        k = jnp.asarray(1.5 * 2.0 ** (24 - bits), dt)
        p = jax.lax.optimization_barrier(r + k) - k
        out.append(p)
        r = r - p
    return out


def _chunks_with_offsets(
    words: Sequence[jnp.ndarray],
    word_offsets: Sequence[int],
    target_bits: int,
    axis: int,
) -> Tuple[List[jnp.ndarray], List[int], jnp.ndarray]:
    """Chunk a multiword value ``sum(words)`` to ``target_bits``.

    ``words[w]`` carries bits starting ``word_offsets[w]`` below the
    value's scale (0 for hi, 24 for a dw lo word, ...); the offsets are
    STATIC so chunk pair filtering stays compile-time.  Word w's
    entries must satisfy ``|words[w]| <= scale * 2**-word_offsets[w]``
    entrywise along ``axis`` — true by construction for normalized
    double/triple-word values.  The scale is per-row (``axis=1``) or
    per-column (``axis=0``), broadcastable against the words.
    """
    scale = _axis_scale(words[0], axis)
    chunks, offsets = [], []
    for word, off in zip(words, word_offsets):
        n = max((target_bits - off + _W - 1) // _W, 0)
        if n == 0:
            continue
        # chunk in scale units: bit windows start at the word's static
        # offset, so every chunk is directly on the per-row/col grid
        for j, c in enumerate(chunk_word(word, scale, n, off)):
            chunks.append(c)
            offsets.append(off + j * _W)
    return chunks, offsets, scale


def _combine_partials(parts, offsets, out_words: int):
    """Sum exact partials (sorted small-to-large) into a multiword f32.

    ``parts[i]`` has magnitude ~``2**-offsets[i]`` relative to the
    common scale; the cascade keeps ``out_words`` compensation words, so
    the result resolves ~``24 * out_words`` bits.

    The cascade runs as a ``lax.scan`` over the stacked partials (the
    static sort permutation becomes one gather): an unrolled cascade is
    ~6 HLOs per partial x hundreds of partials per matmul, which blew
    jit compile time of the tight-rounding sweeps into minutes.
    """
    order = sorted(range(len(parts)), key=lambda i: -offsets[i])
    if isinstance(parts, (list, tuple)):
        stacked = jnp.stack([parts[i] for i in order])
    else:
        stacked = parts[jnp.asarray(order)]

    def body(acc, p):
        # cascaded compensated accumulation: the part merges into the
        # leading word; each TwoSum's exact error flows DOWN the chain
        carry = p
        acc = list(acc)
        for w in range(out_words):
            acc[w], carry = two_sum(acc[w], carry)
        # the final carry is below the representable precision — dropped
        return tuple(acc), None

    init = tuple(jnp.zeros_like(stacked[0]) for _ in range(out_words))
    acc, _ = jax.lax.scan(body, init, stacked)
    return _normalize_words(list(acc))


def _normalize_words(words):
    """Renormalize so ``|word w+1| <= ulp(word w)`` (two full sweeps)."""
    out = list(words)
    for _ in range(2):
        for w in range(len(out) - 1, 0, -1):
            out[w - 1], out[w] = two_sum(out[w - 1], out[w])
    return out


def oz_matmul(
    a_words: Sequence[jnp.ndarray],
    b_words: Sequence[jnp.ndarray],
    target_bits: int = 48,
    out_words: int = 2,
    a_offsets: Sequence[int] = None,
    b_offsets: Sequence[int] = None,
    transpose_a: bool = False,
    transpose_b: bool = False,
):
    """``(sum a_words) @ (sum b_words)`` to ~``target_bits`` precision.

    Multiword operands are lists of f32 arrays (an unevaluated sum, hi
    first); a plain f32 operand is ``[a]``.  Returns ``out_words`` f32
    arrays whose sum is the product, accurate to roughly
    ``norm(A) * norm(B) * 2**-target_bits`` absolute — independent of
    the contraction length, unlike a plain f32 matmul.
    """
    a_offsets = a_offsets or [24 * w for w in range(len(a_words))]
    b_offsets = b_offsets or [24 * w for w in range(len(b_words))]
    if transpose_a:
        a_words = [w.T for w in a_words]
    if transpose_b:
        b_words = [w.T for w in b_words]
    ca, oa, sa = _chunks_with_offsets(a_words, a_offsets, target_bits, 1)
    cb, ob, sb = _chunks_with_offsets(b_words, b_offsets, target_bits, 0)

    # keep chunk pairs that contribute above the target precision
    pairs = [
        (i, j)
        for i in range(len(ca))
        for j in range(len(cb))
        if oa[i] + ob[j] <= target_bits + _W
    ]
    m, k = ca[0].shape
    _, n = cb[0].shape
    n_seg = -(-k // _SEG)
    kp = n_seg * _SEG

    a_stack = jnp.stack([ca[i] for i, _ in pairs])
    b_stack = jnp.stack([cb[j] for _, j in pairs])
    if kp != k:
        a_stack = jnp.pad(a_stack, ((0, 0), (0, 0), (0, kp - k)))
        b_stack = jnp.pad(b_stack, ((0, 0), (0, kp - k), (0, 0)))
    a_stack = a_stack.reshape(len(pairs), m, n_seg, _SEG)
    b_stack = b_stack.reshape(len(pairs), n_seg, _SEG, n)
    # ONE batched matmul for every (pair, segment): each output entry is
    # a <=512-term sum of exact 15-bit products — exact in f32, so
    # DEFAULT precision is lossless here (and 3x cheaper than highest)
    parts = jnp.einsum(
        "pmsk,pskn->spmn", a_stack, b_stack, precision=_DEFAULT
    ).reshape(n_seg * len(pairs), m, n)
    offs = [
        oa[pairs[p][0]] + ob[pairs[p][1]]
        for _ in range(n_seg)
        for p in range(len(pairs))
    ]
    out = _combine_partials(parts, offs, out_words)
    return [w * (sa * sb) for w in out]


def dw_add(x_words, y_words, out_words: int = 2):
    """Multiword sum of two multiword values (error ~2**-48 relative)."""
    parts = list(x_words) + list(y_words)
    offs = [24 * w for w in range(len(x_words))] + [
        24 * w for w in range(len(y_words))
    ]
    return _combine_partials(
        [p for p in parts], [o for o in offs], out_words
    )


def dw_collapse(words):
    """Round a multiword value to a single f32 array."""
    out = words[0]
    for w in words[1:]:
        out = out + w
    return out


@partial(jax.jit, static_argnames=("target_bits", "out_words"))
def _oz_mm_jit(a_words, b_words, target_bits, out_words):
    return oz_matmul(
        list(a_words), list(b_words), target_bits, out_words
    )


def oz_mm(a_words, b_words, target_bits: int = 48, out_words: int = 2):
    """Jitted convenience wrapper (tuples for static hashing)."""
    return _oz_mm_jit(
        tuple(a_words), tuple(b_words), target_bits, out_words
    )
