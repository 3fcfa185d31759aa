"""AOT serving artifacts: jax.export round-trips of network evaluators.

The reference only serializes network *state* (pickle/dict/npz,
``pytens/algs.py:1487-1580``); these tests pin the compiled-program
export this framework adds on top: shape-polymorphic batch, file
round-trip, weight hot-swap, and clamp semantics.
"""

import numpy as np
import pytest

from tensor_networks_tpu import Index, TensorNetwork
from tensor_networks_tpu.export import export_evaluator, load

np.random.seed(23)


def _points(indices, n):
    return np.stack(
        [np.random.randint(0, i.size, size=n) for i in indices], axis=-1
    )


@pytest.fixture(scope="module")
def tt_net():
    indices = [Index(f"x{i}", 7) for i in range(6)]
    return TensorNetwork.rand_tt(indices, [3, 4, 5, 4, 3]), indices


def test_export_matches_evaluate_any_batch(tt_net):
    net, indices = tt_net
    ev = export_evaluator(net, indices)
    for n in (1, 5, 64, 257):
        pts = _points(indices, n)
        got = ev(pts)
        ref = np.asarray(net.evaluate(indices, pts))
        assert got.shape == (n,)
        np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


def test_export_tree_topology():
    indices = [Index(f"y{i}", 5) for i in range(4)]
    net = TensorNetwork.rand_ht(indices, rank=3)
    free = net.free_indices()
    ev = export_evaluator(net)  # defaults to free_indices order
    assert ev.index_names == [i.name for i in free]
    pts = _points(free, 40)
    ref = np.asarray(net.evaluate(free, pts))
    np.testing.assert_allclose(ev(pts), ref, rtol=1e-12, atol=1e-12)


def test_save_load_roundtrip(tt_net, tmp_path):
    net, indices = tt_net
    ev = export_evaluator(net, indices)
    path = str(tmp_path / "model.npz")
    ev.save(path)
    back = load(path)
    assert back.index_names == [i.name for i in indices]
    assert back.index_sizes == [i.size for i in indices]
    pts = _points(indices, 33)
    np.testing.assert_allclose(back(pts), ev(pts), rtol=0, atol=0)


def test_save_load_extensionless_path(tt_net, tmp_path):
    """np.savez appends .npz to extension-less paths; save/load must
    agree on the final name instead of silently diverging."""
    net, indices = tt_net
    ev = export_evaluator(net, indices)
    bare = str(tmp_path / "model")
    written = ev.save(bare)
    assert written == bare + ".npz"
    pts = _points(indices, 9)
    for p in (bare, written):  # both spellings load the same artifact
        np.testing.assert_allclose(load(p)(pts), ev(pts), rtol=0, atol=0)


def test_bucket_batches_persisted(tt_net, tmp_path):
    net, indices = tt_net
    ev = export_evaluator(net, indices)
    ev.bucket_batches = False
    path = ev.save(str(tmp_path / "exact.npz"))
    assert load(path).bucket_batches is False
    ev.bucket_batches = True
    path = ev.save(str(tmp_path / "bucketed.npz"))
    assert load(path).bucket_batches is True


def test_duplicate_indices_rejected(tt_net):
    """A duplicated column must not pass for the full free-index set
    (the omitted index would be silently summed over)."""
    net, indices = tt_net
    with pytest.raises(ValueError):
        export_evaluator(net, [indices[0]] + indices[:-1])


def test_update_values_hot_swap(tt_net):
    net, indices = tt_net
    ev = export_evaluator(net, indices)
    pts = _points(indices, 16)
    base = ev(pts)

    import copy

    scaled = copy.deepcopy(net)
    first = list(scaled.network.nodes)[0]
    t = scaled.node_tensor(first)
    t.update_val_size(np.asarray(t.value) * 2.0)
    ev.update_values(scaled)
    np.testing.assert_allclose(ev(pts), 2.0 * base, rtol=1e-12)

    # wrong shape refused
    bad = [np.zeros((2, 2))] * len(list(net.network.nodes))
    with pytest.raises(ValueError):
        ev.update_values(bad)


def test_out_of_range_clamps_like_device_path(tt_net):
    net, indices = tt_net
    ev = export_evaluator(net, indices)
    pts = _points(indices, 8)
    pts[0, 0] = indices[0].size + 50  # out of range -> clamp to size-1
    clamped = pts.copy()
    clamped[0, 0] = indices[0].size - 1
    np.testing.assert_allclose(ev(pts), ev(clamped), rtol=0, atol=0)


def test_rejects_bad_inputs(tt_net):
    net, indices = tt_net
    ev = export_evaluator(net, indices)
    with pytest.raises(ValueError):
        ev(_points(indices, 4)[:, :-1])  # wrong column count
    with pytest.raises(ValueError):
        export_evaluator(net, indices[:-1])  # not all free indices
    assert ev(np.empty((0, len(indices)))).shape == (0,)


def test_batch_bucketing(tt_net):
    """Pow2 bucketing pads requests (results unchanged, including at
    exact powers of two and N=1) and can be disabled."""
    net, indices = tt_net
    ev = export_evaluator(net, indices)
    assert ev.bucket_batches
    for n in (1, 2, 3, 64, 65, 100):
        pts = _points(indices, n)
        got = ev(pts)
        assert got.shape == (n,)
        ev.bucket_batches = False
        exact = ev(pts)
        ev.bucket_batches = True
        np.testing.assert_allclose(got, exact, rtol=0, atol=0)


def test_dtype_cast_for_tpu_serving(tt_net):
    net, indices = tt_net
    ev = export_evaluator(net, indices, dtype=np.float32)
    pts = _points(indices, 32)
    ref = np.asarray(net.evaluate(indices, pts))
    got = ev(pts)
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    assert "tpu" in ev.platforms and "cpu" in ev.platforms
