"""Double-word batched evaluation (kernels/dw_eval.py): f32 cores
sampled at ~f64 fidelity — the fiber precision of the on-chip cross
loop (VERDICT r4 item 5; reference hot loop pytens/cross/cross.py:177).
"""

import jax.numpy as jnp
import numpy as np

from tensor_networks_tpu import Index, TensorNetwork


def _dense_f64(first, mids, last):
    v = np.asarray(first, np.float64)  # (n, r)
    cores = [np.asarray(m, np.float64) for m in mids]
    out = v
    for c in cores:
        out = np.einsum("...r,rns->...ns", out, c)
    return np.einsum("...r,rn->...n", out, np.asarray(last, np.float64))


def test_dw_evaluate_reaches_f64_fidelity():
    d, n, r = 8, 6, 10
    rng = np.random.default_rng(3)
    inds = [Index(f"i{k}", n) for k in range(d)]
    net = TensorNetwork.rand_tt(inds, [r] * (d - 1))
    # force f32 node values (the on-chip regime) regardless of x64
    for node in list(net.network.nodes):
        v = np.asarray(net.value(node), np.float32)
        net.node_tensor(node).update_val_size(jnp.asarray(v))

    from tensor_networks_tpu.ops import packed as pk

    packed = pk.pack_ragged(net)
    dense = _dense_f64(packed.first, packed.mids, packed.last)

    idx = rng.integers(0, n, size=(512, d))
    truth = np.array([dense[tuple(p)] for p in idx])

    got_dw = net.evaluate(inds, idx, precision="dw")
    scale = np.max(np.abs(truth))
    err_dw = np.max(np.abs(got_dw - truth)) / scale
    assert err_dw < 1e-11, err_dw

    # the plain path on the same f32 cores carries f32-level noise —
    # the dw route must be orders of magnitude tighter (on CPU x64 the
    # default path is f64-accurate already, so only pin dw here and
    # check the words API directly)
    from tensor_networks_tpu.kernels.dw_eval import tt_evaluate_dw_words

    hi, lo = tt_evaluate_dw_words(
        packed.first, packed.mids, packed.last,
        jnp.asarray(idx, jnp.int32),
    )
    combined = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    assert np.max(np.abs(combined - truth)) / scale < 1e-11
    # the lo word is a genuine correction, not zero padding
    assert np.max(np.abs(np.asarray(lo))) > 0


def test_dw_evaluate_clamps_out_of_range():
    d, n, r = 5, 4, 6
    rng = np.random.default_rng(5)
    inds = [Index(f"j{k}", n) for k in range(d)]
    net = TensorNetwork.rand_tt(inds, [r] * (d - 1))
    for node in list(net.network.nodes):
        v = np.asarray(net.value(node), np.float32)
        net.node_tensor(node).update_val_size(jnp.asarray(v))
    idx = rng.integers(0, n, size=(64, d))
    wild = idx.copy()
    wild[0, 0] = n + 7  # out of range -> clamps to n-1
    ref = net.evaluate(inds, np.clip(wild, 0, n - 1), precision="dw")
    got = net.evaluate(inds, wild, precision="dw")
    assert np.allclose(got, ref)


def test_dw_evaluate_honors_f64_cores():
    """Approximant nets assembled on host carry f64 cores; the dw
    route must word-split them (hi/lo f32 pairs) rather than truncate
    to f32 at pack time — the 1.6e-7 floor of the round-5 first-pass
    on-chip cross."""
    d, n, r = 6, 5, 8
    rng = np.random.default_rng(11)
    inds = [Index(f"k{k}", n) for k in range(d)]
    net = TensorNetwork.rand_tt(inds, [r] * (d - 1))
    # f64 values with sub-f32 detail: f32 truncation would lose ~1e-8
    for node in list(net.network.nodes):
        v = np.asarray(net.value(node), np.float64)
        v = v + 1e-4 * rng.standard_normal(v.shape)  # break f32 grid
        net.node_tensor(node).update_val_size(v)

    from tensor_networks_tpu.kernels.dw_eval import pack_chain_np

    first, mids, last, _ = pack_chain_np(net)
    assert first.dtype == np.float64
    dense = _dense_f64(first, mids, last)

    idx = rng.integers(0, n, size=(256, d))
    truth = np.array([dense[tuple(p)] for p in idx])
    got = net.evaluate(inds, idx, precision="dw")
    scale = np.max(np.abs(truth))
    assert np.max(np.abs(got - truth)) / scale < 1e-12

    # the f32-truncated evaluation of the same cores is measurably
    # worse — proves the dw route is not silently truncating
    f32_dense = _dense_f64(
        first.astype(np.float32), mids.astype(np.float32),
        last.astype(np.float32),
    )
    f32_vals = np.array([f32_dense[tuple(p)] for p in idx])
    assert np.max(np.abs(f32_vals - truth)) / scale > 1e-9
