"""Pallas kernel tests (interpret mode on the CPU backend)."""

import jax.numpy as jnp
import numpy as np

from tensor_networks_tpu.kernels.pallas_ops import (
    pad_bond,
    tt_inner_pallas,
)
from tensor_networks_tpu.ops.fast import tt_inner_fn


def _mk(shape, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def test_pallas_zipper_matches_scan():
    d, n, r = 6, 8, 5
    args = (
        _mk((n, r), 0),
        _mk((d - 2, r, n, r), 1),
        _mk((r, n), 2),
        _mk((n, r), 3),
        _mk((d - 2, r, n, r), 4),
        _mk((r, n), 5),
    )
    ref = float(tt_inner_fn(True)(*args))
    got = float(tt_inner_pallas(*args))
    assert np.isclose(got, ref, rtol=1e-4)


def test_pad_bond_roundtrip():
    mids = _mk((3, 5, 4, 5), 6)
    padded = pad_bond(mids)
    assert padded.shape == (3, 128, 4, 128)
    assert np.allclose(np.asarray(padded[:, :5, :, :5]), np.asarray(mids))
    assert np.isclose(
        float(jnp.sum(jnp.abs(padded))),
        float(jnp.sum(jnp.abs(mids))),
        rtol=1e-6,
    )


def test_pallas_prepadded_path():
    d, n, r = 5, 4, 3
    fa, ma, la = _mk((n, r), 7), _mk((d - 2, r, n, r), 8), _mk((r, n), 9)
    ref = float(tt_inner_fn(True)(fa, ma, la, fa, ma, la))
    mp = pad_bond(ma)
    got = float(tt_inner_pallas(fa, mp, la, fa, mp, la, prepadded=True))
    assert np.isclose(got, ref, rtol=1e-4)
