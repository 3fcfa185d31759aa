"""Tight-truncation-budget behavior (VERDICT round-1 item 7).

A d-core chained-QR sweep has a dtype-dependent noise floor on the null
directions; budgets below it silently stop truncating.  The library must
(a) warn when a requested eps is below the floor, (b) truncate correctly
at feasible budgets, and (c) offer the reorthogonalized (QR-twice) sweep
for budgets near the floor.
"""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

import tensor_networks_tpu as tnt
from tensor_networks_tpu.ops import tt_sum
from tensor_networks_tpu.ops.fast import sweep_noise_floor, tt_round_fixed


def _unit_rank1(ins, rng):
    vecs = [rng.standard_normal(i.size) for i in ins]
    return tnt.tt_rank1(ins, [v / np.linalg.norm(v) for v in vecs])


def _flat_spectrum_train(d=30, n=8, k=8, noise=1e-8, dtype=jnp.float32):
    """Sum of k unit rank-1 terms (flat spectrum at every bond) plus one
    term at ``noise`` — rounding must keep exactly k directions."""
    rng = np.random.default_rng(0)
    ins = [tnt.Index(f"x{i}", n) for i in range(d)]
    tiny = _unit_rank1(ins, rng)
    tiny.scale(noise)
    s = tt_sum([_unit_rank1(ins, rng) for _ in range(k)] + [tiny])
    for node in list(s.network.nodes):
        s.node_tensor(node).update_val_size(
            jnp.asarray(s.value(node), dtype)
        )
    return s, k


def test_noise_floor_scale():
    assert 1e-6 < sweep_noise_floor(jnp.float32, 30) < 1e-4
    assert sweep_noise_floor(jnp.float64, 30) < 1e-13


def test_f32_truncates_at_feasible_eps():
    s, k = _flat_spectrum_train()
    out, ranks = tt_round_fixed(s.__deepcopy__({}), 1e-4)
    assert max(ranks) == k
    out, ranks = tt_round_fixed(s.__deepcopy__({}), 1e-4, reorth=True)
    assert max(ranks) == k


def test_warning_below_f32_floor():
    s, _ = _flat_spectrum_train()
    with pytest.warns(RuntimeWarning, match="noise floor"):
        tt_round_fixed(s.__deepcopy__({}), 1e-8)


def test_no_warning_for_f64():
    s, _ = _flat_spectrum_train(dtype=jnp.float64)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        tt_round_fixed(s.__deepcopy__({}), 1e-8)


def test_graph_svd_round_warns_below_floor():
    s, _ = _flat_spectrum_train(d=12, n=4, k=3)
    with pytest.warns(RuntimeWarning, match="noise floor"):
        tnt.tt_svd_round(s, 1e-8)
