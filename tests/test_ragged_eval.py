"""Segment-sorted ragged-matmul evaluation (kernels/ragged_eval.py).

Parity against an exact per-point f64 chain and against the XLA batched
form, on every precision mode, including duplicate/degenerate index
patterns (all points in one mode group; empty groups) that stress the
sort/ragged-group bookkeeping.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tensor_networks_tpu.kernels.ragged_eval import tt_evaluate_ragged
from tensor_networks_tpu.parallel.sharded import tt_evaluate_batched


def _train(d=9, n=7, r=5, seed=0):
    rng = np.random.default_rng(seed)
    first = jnp.asarray(rng.standard_normal((n, r)), jnp.float32)
    mids = jnp.asarray(
        rng.standard_normal((d - 2, r, n, r)) / np.sqrt(r), jnp.float32
    )
    last = jnp.asarray(rng.standard_normal((r, n)), jnp.float32)
    return first, mids, last


def _ref(first, mids, last, idx):
    f = np.asarray(first, np.float64)
    m = np.asarray(mids, np.float64)
    l = np.asarray(last, np.float64)
    i = np.asarray(idx)
    out = np.empty(i.shape[0])
    for b in range(i.shape[0]):
        v = f[i[b, 0]]
        for k in range(m.shape[0]):
            v = v @ m[k][:, i[b, k + 1], :]
        out[b] = v @ l[:, i[b, -1]]
    return out


@pytest.mark.parametrize("precision", ["highest", "bf16x3", "default"])
def test_ragged_matches_f64_chain(precision):
    first, mids, last = _train()
    rng = np.random.default_rng(1)
    idx = jnp.asarray(rng.integers(0, 7, (257, 9)), jnp.int32)
    got = np.asarray(
        tt_evaluate_ragged(first, mids, last, idx, precision), np.float64
    )
    ref = _ref(first, mids, last, idx)
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < (3e-2 if precision == "default" else 1e-5), rel


def test_ragged_matches_xla_form():
    first, mids, last = _train(seed=3)
    rng = np.random.default_rng(2)
    idx = jnp.asarray(rng.integers(0, 7, (64, 9)), jnp.int32)
    got = np.asarray(tt_evaluate_ragged(first, mids, last, idx, "highest"))
    ref = np.asarray(tt_evaluate_batched(first, mids, last, idx))
    assert np.allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_ragged_degenerate_groups():
    """All points share one mode value at some steps -> n-1 empty
    groups; also B=1 and points identical."""
    first, mids, last = _train(d=6, n=4, r=3, seed=5)
    idx = np.zeros((16, 6), np.int32)
    idx[:, 2] = 3  # every point in the LAST group at step 1
    idx[:, 3] = np.arange(16) % 4
    idx_j = jnp.asarray(idx)
    got = np.asarray(tt_evaluate_ragged(first, mids, last, idx_j, "highest"))
    ref = _ref(first, mids, last, idx_j)
    assert np.allclose(got, ref, rtol=1e-5, atol=1e-7)

    one = jnp.asarray(idx[:1])
    got1 = np.asarray(tt_evaluate_ragged(first, mids, last, one, "highest"))
    assert np.allclose(got1, ref[:1], rtol=1e-5, atol=1e-7)


def test_ragged_rejects_short_trains():
    first, mids, last = _train(d=3, n=4, r=3)
    with pytest.raises(ValueError):
        tt_evaluate_ragged(first, mids[:0], last, jnp.zeros((4, 2), jnp.int32))


def test_routed_evaluate_uses_ragged(monkeypatch):
    """TNT_FORCE_PALLAS=1 routes packed.evaluate through the ragged
    kernel and counts it (never a silent path change)."""
    from tensor_networks_tpu.kernels import pallas_ops as po
    from tensor_networks_tpu.ops import packed as pk

    monkeypatch.setenv("TNT_FORCE_PALLAS", "1")
    first, mids, last = _train(seed=8)
    rng = np.random.default_rng(4)
    idx = jnp.asarray(rng.integers(0, 7, (32, 9)), jnp.int32)
    before = dict(po.PATH_STATS)
    got = np.asarray(pk._eval_routed(first, mids, last, idx, "highest"))
    assert po.PATH_STATS["ragged"] == before["ragged"] + 1
    ref = _ref(first, mids, last, idx)
    assert np.allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_network_evaluate_routes_ragged(monkeypatch):
    """TensorNetwork.evaluate on a uniform chain routes through the
    ragged kernel (TNT_FORCE_PALLAS drives the TPU-only gate on CPU),
    matches the general evaluator, and the packing cache invalidates
    when a core value is replaced."""
    from tensor_networks_tpu import Index, TensorNetwork
    from tensor_networks_tpu.kernels import pallas_ops as po

    np.random.seed(5)
    inds = [Index(f"x{k}", 6) for k in range(7)]
    net = TensorNetwork.rand_tt(inds, [4] * 6, dtype=np.float32)
    rng = np.random.default_rng(6)
    pts = rng.integers(0, 6, (128, 7))

    ref = net.evaluate(inds, pts)  # CPU backend: general path

    monkeypatch.setenv("TNT_FORCE_PALLAS", "1")
    before = po.PATH_STATS["ragged"]
    got = net.evaluate(inds, pts)
    assert po.PATH_STATS["ragged"] > before
    tol = 1e-5 * np.abs(ref).max()  # f32 accumulation-order noise
    assert np.abs(got - ref).max() < tol

    # permuted index argument order must be honored
    perm = [3, 0, 6, 2, 5, 1, 4]
    got_p = net.evaluate([inds[p] for p in perm], pts[:, perm])
    assert np.abs(got_p - ref).max() < tol

    # replacing a core's value invalidates the cached packing
    t = net.node_tensor(3)
    t.update_val_size(jnp.asarray(2.0, jnp.float32) * t.value)
    got2 = net.evaluate(inds, pts)
    assert np.abs(got2 - 2.0 * ref).max() < 2 * tol


def test_network_evaluate_nonchain_falls_through(monkeypatch):
    """Non-chain topologies skip the ragged route and still evaluate."""
    from tensor_networks_tpu import Index, TensorNetwork

    monkeypatch.setenv("TNT_FORCE_PALLAS", "1")
    np.random.seed(7)
    inds = [Index(f"y{k}", 4) for k in range(4)]
    net = TensorNetwork.rand_tucker(inds, 3)
    assert net._ragged_evaluator(inds) is None
    rng = np.random.default_rng(8)
    pts = rng.integers(0, 4, (33, 4))
    got = net.evaluate(inds, pts)
    assert got.shape == (33,)


def test_network_evaluate_ragged_clamps_like_xla(monkeypatch):
    """Out-of-range indices follow the device path's gather-clamp
    semantics on the ragged route too."""
    from tensor_networks_tpu import Index, TensorNetwork

    np.random.seed(9)
    inds = [Index(f"z{k}", 5) for k in range(6)]
    net = TensorNetwork.rand_tt(inds, [3] * 5, dtype=np.float32)
    rng = np.random.default_rng(10)
    pts = rng.integers(0, 5, (64, 6))
    pts[7, 2] = 99  # out of range: clamps to 4
    pts[11, 0] = -3  # clamps to 0

    monkeypatch.setenv("TNT_FORCE_PALLAS", "1")
    got = net.evaluate(inds, pts)
    ref = net.evaluate(inds, np.clip(pts, 0, 4))
    assert np.abs(got - ref).max() < 1e-5 * np.abs(ref).max()


def test_network_evaluate_mixed_modes(monkeypatch):
    """Mixed mode sizes pack with mode-axis zero padding: the ragged
    route still matches the general evaluator, clamping per dimension."""
    from tensor_networks_tpu import Index, TensorNetwork

    np.random.seed(13)
    sizes = [3, 7, 4, 6, 5]
    inds = [Index(f"m{k}", s) for k, s in enumerate(sizes)]
    net = TensorNetwork.rand_tt(inds, [3] * 4, dtype=np.float32)
    rng = np.random.default_rng(14)
    pts = np.stack(
        [rng.integers(0, s, 200) for s in sizes], axis=1
    )
    ref = net.evaluate(inds, pts)  # CPU: general path

    monkeypatch.setenv("TNT_FORCE_PALLAS", "1")
    got = net.evaluate(inds, pts)
    assert np.abs(got - ref).max() < 1e-5 * np.abs(ref).max()

    # per-dimension clamp: an index valid for the largest mode but out
    # of range for a smaller one must clamp at THAT dimension's bound
    pts2 = pts.copy()
    pts2[0, 0] = 6  # mode size 3 -> clamps to 2 (but < nmax=7)
    got2 = net.evaluate(inds, pts2)
    pts2c = pts2.copy()
    pts2c[0, 0] = 2
    ref2 = net.evaluate(inds, pts2c)
    assert abs(got2[0] - ref2[0]) < 1e-5 * np.abs(ref).max()


def test_out_of_range_indices_clamp_at_packed_boundary(monkeypatch):
    """packed._eval_routed clamps indices before routing, so every
    backend (ragged's group partition would otherwise leave unmatched
    rows undefined; the one-hot kernel would zero them) behaves like
    the XLA gather: out-of-range values evaluate at the clamped point."""
    monkeypatch.setenv("TNT_FORCE_PALLAS", "1")
    from tensor_networks_tpu.ops import packed as pk

    first, mids, last = _train()
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 7, (64, 9))
    idx[3, 0] = 99      # above range in the first mode
    idx[7, 4] = 7       # == n in a middle mode
    idx[11, -1] = -3    # negative in the last mode
    idx = jnp.asarray(idx, jnp.int32)
    clamped = jnp.clip(idx, 0, 6)
    got = np.asarray(
        pk._eval_routed(first, mids, last, idx, "highest"), np.float64
    )
    ref = _ref(first, mids, last, clamped)
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 1e-5, rel
