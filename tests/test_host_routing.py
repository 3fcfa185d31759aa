"""TPU-backend host-routing gates, exercised on the CPU mesh by
monkeypatching ``jax.default_backend``.

The library keeps search-sized tensors host-resident on the TPU backend
(host SVD/QR/contract/evaluate) because relay round trips dwarf the
math; these tests pin (a) numerical parity of every host path with the
device path and (b) the gates that keep large/device-resident work on
the device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tensor_networks_tpu as tnt
from tensor_networks_tpu.kernels import linalg as kl
from tensor_networks_tpu.planner import contract_values


@pytest.fixture
def fake_tpu(monkeypatch):
    """Pretend the default backend is TPU (gates only; math runs where
    the routed implementation says, which on this mesh is host NumPy or
    CPU-jax)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    yield


def test_svd_qr_host_branches_return_numpy(fake_tpu):
    a = np.random.default_rng(0).standard_normal((12, 7))
    u, s, vt = kl.svd_full(a)
    assert isinstance(u, np.ndarray)
    assert np.allclose(u * s @ vt, a, atol=1e-12)
    q, r = kl.qr_reduced(a)
    assert isinstance(q, np.ndarray)
    assert np.allclose(q @ r, a, atol=1e-12)
    # array-likes still accepted
    u2, s2, vt2 = kl.svd_full([[1.0, 2.0], [3.0, 4.0]])
    assert np.allclose(u2 * s2 @ vt2, [[1.0, 2.0], [3.0, 4.0]])


def test_contract_values_host_route_parity(fake_tpu):
    rng = np.random.default_rng(1)
    ia, ib, ic = (
        tnt.Index("a", 4),
        tnt.Index("b", 5),
        tnt.Index("c", 6),
    )
    x = rng.standard_normal((4, 5))
    y = rng.standard_normal((5, 6))
    out = contract_values([[ia, ib], [ib, ic]], [x, y], [ia, ic])
    assert isinstance(out, np.ndarray)  # took the host route
    assert np.allclose(out, x @ y, atol=1e-12)


def test_update_val_size_keeps_small_numpy_and_copies(fake_tpu):
    ind = tnt.Index("i", 3)
    t = tnt.Tensor(np.zeros((3,)), [ind])
    src = np.arange(3.0)
    t.update_val_size(src)
    assert isinstance(t.value, np.ndarray)
    src[:] = -1.0  # installed value must not alias caller memory
    assert np.allclose(np.asarray(t.value), [0.0, 1.0, 2.0])

    # large arrays still go to the device path
    big = np.zeros((1 << 21,)).reshape(1 << 11, 1 << 10)
    t2 = tnt.Tensor(np.zeros((1 << 11, 1 << 10)), [
        tnt.Index("r", 1 << 11), tnt.Index("s", 1 << 10)
    ])
    t2.update_val_size(big)
    assert not isinstance(t2.value, np.ndarray)


def _rand_net(seed=5, d=4, n=6, r=3):
    np.random.seed(seed)
    ins = [tnt.Index(f"x{i}", n) for i in range(d)]
    return tnt.TensorNetwork.rand_tt(ins, [r] * (d - 1)), ins


def test_evaluator_host_matches_device_plan():
    """The host=True evaluator is the same gather+contract plan in
    NumPy; parity holds on any backend."""
    net, ins = _rand_net()
    idx = np.random.randint(0, 6, (32, 4))
    fn, values = net.evaluator(ins, 32)
    host_fn, _ = net.evaluator(ins, 32, host=True)
    dev = np.asarray(fn(values, jnp.asarray(idx)))
    host = np.asarray(host_fn(values, idx))
    assert np.allclose(dev, host, atol=1e-10)


def test_host_eval_gate(fake_tpu):
    net, ins = _rand_net()
    # device-resident values: gate must refuse
    assert not net._host_eval_ok(ins, 32)
    for node in net.network.nodes:
        t = net.node_tensor(node)
        t.value = np.asarray(t.value)
    assert net._host_eval_ok(ins, 32)
    # a batch big enough to blow the per-operand limit must refuse:
    # gathered operand is batch x r x r
    assert not net._host_eval_ok(ins, 1 << 20)

    # end to end through evaluate(): host route, full parity
    idx = np.random.randint(0, 6, (50, 4))
    got = net.evaluate(ins, idx)
    dense = np.asarray(net.contract().value)
    want = dense[tuple(idx.T)]
    assert np.allclose(got, want, atol=1e-10)
