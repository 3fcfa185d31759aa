"""Ensemble evaluation (ops/packed.py::evaluate_ensemble): B same-shape
trains folded into ONE program by mapping the ensemble axis into the
mode-symbol axis.  Parity against per-train evaluation on the XLA and
forced-ragged routes, per-train clamp semantics, shared-point
broadcast, and shape validation.  No reference counterpart (pytens
evaluates one network at a time)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tensor_networks_tpu.ops import packed as pk


def _train(d=7, n=5, r=4, seed=0):
    rng = np.random.default_rng(seed)
    return pk.PackedTT(
        jnp.asarray(rng.standard_normal((n, r)), jnp.float32),
        jnp.asarray(
            rng.standard_normal((d - 2, r, n, r)) / np.sqrt(r),
            jnp.float32,
        ),
        jnp.asarray(rng.standard_normal((r, n)), jnp.float32),
    )


def test_ensemble_matches_per_train():
    trains = [_train(seed=s) for s in range(3)]
    rng = np.random.default_rng(10)
    idx = jnp.asarray(rng.integers(0, 5, (3, 41, 7)), jnp.int32)
    got = np.asarray(pk.evaluate_ensemble(trains, idx, "highest"))
    assert got.shape == (3, 41)
    for b, t in enumerate(trains):
        ref = np.asarray(pk.evaluate(t, idx[b], "highest"))
        assert np.allclose(got[b], ref, rtol=1e-5, atol=1e-6)


def test_ensemble_shared_points_broadcast():
    trains = [_train(seed=s) for s in (5, 6)]
    rng = np.random.default_rng(11)
    idx = jnp.asarray(rng.integers(0, 5, (29, 7)), jnp.int32)
    got = np.asarray(pk.evaluate_ensemble(trains, idx, "highest"))
    assert got.shape == (2, 29)
    for b, t in enumerate(trains):
        ref = np.asarray(pk.evaluate(t, idx, "highest"))
        assert np.allclose(got[b], ref, rtol=1e-5, atol=1e-6)


def test_ensemble_routes_ragged_as_one_call(monkeypatch):
    """The fold runs through the ragged kernel as a SINGLE routed
    evaluation (one PATH_STATS tick for the whole ensemble)."""
    from tensor_networks_tpu.kernels import pallas_ops as po

    monkeypatch.setenv("TNT_FORCE_PALLAS", "1")
    trains = [_train(seed=s) for s in (7, 8, 9, 10)]
    rng = np.random.default_rng(12)
    idx = jnp.asarray(rng.integers(0, 5, (4, 17, 7)), jnp.int32)
    before = po.PATH_STATS["ragged"]
    got = np.asarray(pk.evaluate_ensemble(trains, idx, "highest"))
    assert po.PATH_STATS["ragged"] == before + 1
    monkeypatch.delenv("TNT_FORCE_PALLAS")
    for b, t in enumerate(trains):
        ref = np.asarray(pk.evaluate(t, idx[b], "highest"))
        assert np.allclose(got[b], ref, rtol=1e-5, atol=1e-6)


def test_ensemble_clamps_within_each_train():
    """Out-of-range indices clamp to THIS train's mode range — they
    must never leak into a neighboring train's symbol block."""
    trains = [_train(seed=s) for s in (1, 2)]
    idx = np.zeros((2, 8, 7), np.int64)
    idx[0, 3, 2] = 99   # clamps to n-1 = 4 within train 0
    idx[1, 5, 0] = -7   # clamps to 0 within train 1
    got = np.asarray(pk.evaluate_ensemble(trains, idx, "highest"))
    clamped = np.clip(idx, 0, 4)
    for b, t in enumerate(trains):
        ref = np.asarray(
            pk.evaluate(t, jnp.asarray(clamped[b], jnp.int32), "highest")
        )
        assert np.allclose(got[b], ref, rtol=1e-5, atol=1e-6)


def test_ensemble_rejects_mismatched_shapes():
    with pytest.raises(ValueError):
        pk.evaluate_ensemble(
            [_train(r=4), _train(r=5)], jnp.zeros((3, 7), jnp.int32)
        )
    with pytest.raises(ValueError):
        pk.evaluate_ensemble([], jnp.zeros((3, 7), jnp.int32))
    with pytest.raises(ValueError):
        pk.evaluate_ensemble(
            [_train()], jnp.zeros((2, 3, 7), jnp.int32)
        )  # B mismatch
