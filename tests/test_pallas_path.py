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


def test_small_bonds_stay_on_scan(force_pallas):
    a, b = _pair(r=8)
    ref = float(a.inner(b))
    got = float(tt_inner_fast(a, b))
    assert abs(got - ref) <= 1e-5 * abs(ref)
    # below the 64-bond gate: no pallas attempt at all
    assert po.PATH_STATS["pallas"] == force_pallas["pallas"]


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
