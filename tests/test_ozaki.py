"""Exact chunked f32 matmul kernels (kernels/ozaki.py).

The compensated tight-rounding path (ops/tight.py) rests entirely on
these invariants: exact power-of-two scales, exact chunking, and
double/triple-word products accurate to ~2**-48 / ~2**-76 of the
operand norms, independent of row imbalance.  The row-imbalance cases
pin the round-3 regression where an inexact XLA ``exp2`` (one ulp off
on integer inputs) broke the "divide by a power of two is exact"
assumption and silently floored precision at f32 level.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tensor_networks_tpu.kernels.ozaki import (
    _pow2_exact,
    dw_add,
    dw_collapse,
    oz_mm,
    two_sum,
)


def _f64(words):
    return sum(np.asarray(w, np.float64) for w in words)


def test_pow2_exact_is_exact():
    es = jnp.arange(-126, 128, dtype=jnp.int32)
    got = np.asarray(_pow2_exact(es), np.float64)
    want = 2.0 ** np.arange(-126, 128, dtype=np.float64)
    assert (got == want).all()


def test_two_sum_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(512), jnp.float32)
    b = jnp.asarray(rng.standard_normal(512) * 1e-6, jnp.float32)
    s, e = two_sum(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    assert (got == exact).all()


@pytest.mark.parametrize("k", [96, 700])
def test_dw_matmul_balanced(k):
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((64, k)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((k, 48)), jnp.float32)
    got = _f64(oz_mm([a], [b], 48, 2))
    want = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 2.0**-44


def test_dw_matmul_row_imbalanced():
    """Rows spanning 8 orders of magnitude keep PER-ROW precision."""
    rng = np.random.default_rng(2)
    row_scale = 10.0 ** rng.uniform(-8, 0, size=(64, 1))
    a = jnp.asarray(rng.standard_normal((64, 96)) * row_scale, jnp.float32)
    b = jnp.asarray(rng.standard_normal((96, 48)), jnp.float32)
    got = _f64(oz_mm([a], [b], 48, 2))
    want = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    row_norm = np.abs(want).max(axis=1, keepdims=True) + 1e-300
    assert (np.abs(got - want) / row_norm).max() < 2.0**-40


def test_dw_input_words_resolved():
    """Double-word INPUTS contribute their low words to the product."""
    rng = np.random.default_rng(3)
    a64 = rng.standard_normal((32, 64))
    b64 = rng.standard_normal((64, 32))
    ah = a64.astype(np.float32)
    al = (a64 - ah.astype(np.float64)).astype(np.float32)
    bh = b64.astype(np.float32)
    bl = (b64 - bh.astype(np.float64)).astype(np.float32)
    got = _f64(
        oz_mm(
            [jnp.asarray(ah), jnp.asarray(al)],
            [jnp.asarray(bh), jnp.asarray(bl)],
            48,
            2,
        )
    )
    want = a64 @ b64
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 2.0**-44


def test_tw_gram_beats_dw_floor():
    """Triple-word (76-bit) Gram resolves below the 48-bit dw floor."""
    rng = np.random.default_rng(4)
    a64 = rng.standard_normal((128, 16))
    a = jnp.asarray(a64, jnp.float32)
    a64 = np.asarray(a, np.float64)
    # oz_mm has no transpose args; emulate A^T A via explicit transpose
    got_t = _f64(oz_mm([a.T], [a], 76, 3))
    want_t = a64.T @ a64
    st = np.abs(want_t).max()
    assert np.abs(got_t - want_t).max() / st < 2.0**-50


def test_dw_add_and_collapse():
    rng = np.random.default_rng(5)
    x64 = rng.standard_normal((16, 16))
    y64 = rng.standard_normal((16, 16)) * 1e-5
    xh = x64.astype(np.float32)
    xl = (x64 - xh.astype(np.float64)).astype(np.float32)
    yh = y64.astype(np.float32)
    yl = (y64 - yh.astype(np.float64)).astype(np.float32)
    s = dw_add(
        [jnp.asarray(xh), jnp.asarray(xl)],
        [jnp.asarray(yh), jnp.asarray(yl)],
    )
    want = x64 + y64
    assert np.abs(_f64(s) - want).max() < 2.0**-44
    c = np.asarray(dw_collapse(s), np.float64)
    assert np.abs(c - want).max() < 1e-6
