"""Pallas zipper routing: the fast path must be observable (VERDICT
round-1 item 8 — a silent fallback is an invisible perf cliff).

TNT_FORCE_PALLAS=1 routes eligible inner products through the pallas
kernels in interpret mode off-TPU, so the full routing + kernel logic is
exercised on the CPU test mesh; the on-chip numbers live in
VALIDATION.md.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import tensor_networks_tpu as tnt
from tensor_networks_tpu.kernels import pallas_ops as po
from tensor_networks_tpu.ops import packed as pk
from tensor_networks_tpu.ops.fast import tt_inner_fast


@pytest.fixture
def force_pallas(monkeypatch):
    monkeypatch.setenv("TNT_FORCE_PALLAS", "1")
    before = dict(po.PATH_STATS)
    yield before


def _pair(r, d=5, n=8, seed=0):
    np.random.seed(seed)
    ins = [tnt.Index(f"x{i}", n) for i in range(d)]
    a = tnt.TensorNetwork.rand_tt(ins, [r] * (d - 1))
    b = tnt.TensorNetwork.rand_tt(ins, [r] * (d - 1))
    for net in (a, b):
        for node in list(net.network.nodes):
            net.node_tensor(node).update_val_size(
                jnp.asarray(net.value(node) / r, jnp.float32)
            )
    return a, b


def test_pallas_path_taken_and_counted(force_pallas):
    a, b = _pair(r=96)
    ref = float(a.inner(b))
    got = float(tt_inner_fast(a, b))
    assert abs(got - ref) <= 1e-4 * abs(ref)
    assert po.PATH_STATS["pallas"] == force_pallas["pallas"] + 1
    assert po.PATH_STATS["fallback"] == force_pallas["fallback"]


def test_prepadded_train_single_fused_call(force_pallas):
    a, b = _pair(r=96)
    ap, bp = pk.pad(pk.pack(a)), pk.pad(pk.pack(b))
    assert ap.rank % po.LANE == 0
    ref = float(a.inner(b))
    got = float(pk.inner(ap, bp))
    assert abs(got - ref) <= 1e-4 * abs(ref)
    assert po.PATH_STATS["pallas"] == force_pallas["pallas"] + 1


def test_mixed_padded_unpadded_pair_stays_on_pallas(force_pallas):
    """One prepadded + one raw train must route to the on-the-fly-padding
    kernel, not fail out of the fused kernel into the scan."""
    a, b = _pair(r=96, seed=11)
    ap = pk.pad(pk.pack(a))  # rank 128, lane-aligned
    bp = pk.pack(b)  # rank 96, unpadded
    ref = float(a.inner(b))
    got = float(pk.inner(ap, bp))
    assert abs(got - ref) <= 1e-4 * abs(ref)
    assert po.PATH_STATS["pallas"] == force_pallas["pallas"] + 1
    assert po.PATH_STATS["fallback"] == force_pallas["fallback"]


def test_small_bonds_stay_on_scan(force_pallas):
    a, b = _pair(r=8)
    ref = float(a.inner(b))
    got = float(tt_inner_fast(a, b))
    assert abs(got - ref) <= 1e-5 * abs(ref)
    # below the 64-bond gate: no pallas attempt at all
    assert po.PATH_STATS["pallas"] == force_pallas["pallas"]


def test_large_bonds_stay_on_scan(force_pallas):
    """Bonds above the 128 lane width would pad to blocks exceeding the
    16 MB scoped-VMEM budget — the gate must refuse up front (a doomed
    compile attempt costs ~20 s through the relay)."""
    a, b = _pair(r=160, d=4, n=4, seed=13)
    ref = float(a.inner(b))
    got = float(tt_inner_fast(a, b))
    assert abs(got - ref) <= 1e-4 * abs(ref)
    assert po.PATH_STATS["pallas"] == force_pallas["pallas"]
    assert po.PATH_STATS["fallback"] == force_pallas["fallback"]


def test_fallback_is_logged_not_swallowed(force_pallas, caplog, monkeypatch):
    a, b = _pair(r=96)

    def boom(*args, **kwargs):
        raise RuntimeError("injected kernel failure")

    monkeypatch.setattr(po, "tt_inner_pallas", boom)
    monkeypatch.setattr(po, "tt_inner_pallas_fused", boom)
    with caplog.at_level("WARNING"):
        got = float(tt_inner_fast(a, b))
    ref = float(a.inner(b))
    assert abs(got - ref) <= 1e-5 * abs(ref)  # scan fallback correct
    assert po.PATH_STATS["fallback"] == force_pallas["fallback"] + 1
    assert any("falling back" in r.message for r in caplog.records)


def test_evaluate_fast_custom_vjp(force_pallas):
    """tt_evaluate_fast: pallas forward, exact XLA-form gradients."""
    import jax

    from tensor_networks_tpu.parallel.sharded import tt_evaluate_batched

    np.random.seed(5)
    d, n, r, batch = 6, 8, 96, 64
    first = jnp.asarray(np.random.randn(n, r) / r, jnp.float32)
    mids = jnp.asarray(
        np.random.randn(d - 2, r, n, r) / r, jnp.float32
    )
    last = jnp.asarray(np.random.randn(r, n) / r, jnp.float32)
    idx = jnp.asarray(np.random.randint(0, n, (batch, d)))
    y = jnp.asarray(np.random.randn(batch), jnp.float32)

    def loss_fast(f, m, l):
        p = pk.tt_evaluate_fast(f, m, l, idx)
        return jnp.mean((p - y) ** 2)

    def loss_ref(f, m, l):
        p = tt_evaluate_batched(f, m, l, idx)
        return jnp.mean((p - y) ** 2)

    val, grads = jax.value_and_grad(loss_fast, argnums=(0, 1, 2))(
        first, mids, last
    )
    val_ref, grads_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(
        first, mids, last
    )
    # forward took a fast kernel (segment-sorted ragged since round 3)
    assert po.PATH_STATS["ragged"] > force_pallas.get("ragged", 0)
    # bf16x3 forward: f32-level loss agreement
    assert abs(float(val) - float(val_ref)) <= 1e-4 * abs(float(val_ref))
    # backward is the exact XLA VJP
    for g, gr in zip(grads, grads_ref):
        assert np.allclose(np.asarray(g), np.asarray(gr), atol=1e-5)


def test_train_step_fast_eval(force_pallas):
    """A single-device training step with fast_eval converges like the
    XLA-form step."""
    import jax
    from jax.sharding import Mesh

    from tensor_networks_tpu.parallel.training import (
        init_tt_params,
        make_train_step,
    )

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    step_fast, place_p, place_b = make_train_step(mesh, fast_eval=True)
    step_ref, _, _ = make_train_step(mesh, fast_eval=False)

    np.random.seed(9)
    params = init_tt_params(d=5, n=8, r=96, seed=1)
    idx = np.random.randint(0, 8, (128, 5))
    target = init_tt_params(d=5, n=8, r=96, seed=2)
    from tensor_networks_tpu.parallel.sharded import tt_evaluate_batched

    y = tt_evaluate_batched(target.first, target.mids, target.last, idx)
    idx_d, y_d = place_b(idx, y)

    p_fast, loss_fast = step_fast(place_p(params), idx_d, y_d, 1e-2)
    p_ref, loss_ref = step_ref(place_p(params), idx_d, y_d, 1e-2)
    assert abs(float(loss_fast) - float(loss_ref)) <= 1e-3 * abs(
        float(loss_ref)
    )
    for a, b in zip(p_fast, p_ref):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # multi-device meshes must reject the pallas path
    if len(jax.devices()) >= 2:
        mesh8 = Mesh(
            np.array(jax.devices()).reshape(-1, 1), ("data", "model")
        )
        with pytest.raises(ValueError):
            make_train_step(mesh8, fast_eval=True)


def test_inner_custom_vjp(force_pallas):
    """packed.inner: pallas forward, exact XLA scan-zipper gradients."""
    import jax

    from tensor_networks_tpu.ops.fast import tt_inner_fn

    a, b = _pair(r=96, seed=7)
    ap, bp = pk.pad(pk.pack(a)), pk.pad(pk.pack(b))

    def loss_fast(f, m, l):
        return pk.inner(pk.PackedTT(f, m, l), bp)

    def loss_ref(f, m, l):
        return tt_inner_fn(True)(f, m, l, bp.first, bp.mids, bp.last)

    val, grads = jax.value_and_grad(loss_fast, argnums=(0, 1, 2))(
        ap.first, ap.mids, ap.last
    )
    val_ref, grads_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(
        ap.first, ap.mids, ap.last
    )
    assert po.PATH_STATS["pallas"] > force_pallas["pallas"]
    assert abs(float(val) - float(val_ref)) <= 1e-5 * abs(float(val_ref))
    for g, gr in zip(grads, grads_ref):
        assert np.allclose(np.asarray(g), np.asarray(gr), atol=1e-6)

    # norm (inner-backed) differentiates too
    gn = jax.grad(
        lambda f: pk.norm(pk.PackedTT(f, ap.mids, ap.last))
    )(ap.first)
    assert np.all(np.isfinite(np.asarray(gn)))


def test_zipper_bf16x3_precision_option(force_pallas):
    """The 3-pass split zipper: plumbed end-to-end, ~1e-5-accurate."""
    a, b = _pair(r=96, seed=3)
    ref = float(a.inner(b))
    got = float(tt_inner_fast(a, b, precision="bf16x3"))
    assert abs(got - ref) <= 1e-3 * abs(ref)
    assert po.PATH_STATS["pallas"] > force_pallas["pallas"]

    ap, bp = pk.pad(pk.pack(a)), pk.pad(pk.pack(b))
    got_packed = float(pk.inner(ap, bp, precision="bf16x3"))
    assert abs(got_packed - ref) <= 1e-3 * abs(ref)
