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


# ---------------------------------------------------------------------------
# Compensated (double-word f32) tight rounding: ops/tight.py
# ---------------------------------------------------------------------------


def _graded_train(d=10, n=6, scales=(1.0, 1e-2, 1e-4, 1e-6)):
    """f32 TT whose bond spectra are the given graded scales."""
    rng = np.random.default_rng(7)
    ins = [tnt.Index(f"x{i}", n) for i in range(d)]
    s = tt_sum([_scaled_rank1(ins, rng, sc) for sc in scales])
    for node in list(s.network.nodes):
        s.node_tensor(node).update_val_size(
            jnp.asarray(s.value(node), jnp.float32)
        )
    return s, ins


def _scaled_rank1(ins, rng, scale):
    t = _unit_rank1(ins, rng)
    t.scale(scale)
    return t


def _to64(tn):
    out = tn.__deepcopy__({})
    for node in list(out.network.nodes):
        out.node_tensor(node).update_val_size(
            jnp.asarray(out.value(node), jnp.float64)
        )
    return out


@pytest.mark.slow
def test_tight_round_tracks_eps_below_f32_floor():
    """eps=1e-6 on an f32 train: correct ranks AND error <= eps.

    This is exactly the regime where the plain f32 sweeps stop
    truncating (their per-bond budget falls under the chained-QR noise
    floor); the compensated sweep must keep working.
    """
    from tensor_networks_tpu.ops.packed import norm_exact, pack_ragged
    from tensor_networks_tpu.ops.tight import tt_round_tight

    s, _ = _graded_train()
    s64 = _to64(s)
    nrm = float(norm_exact(pack_ragged(s64)))
    for eps, want_rank in [(1e-1, 1), (1e-3, 2), (1e-5, 3), (3e-7, 4)]:
        out, ranks = tt_round_tight(s.__deepcopy__({}), eps)
        assert max(ranks) == want_rank, (eps, ranks)
        diff = _to64(out) - s64
        rel = float(norm_exact(pack_ragged(diff))) / nrm
        assert rel <= 2.0 * eps, (eps, rel)


@pytest.mark.slow
def test_tight_round_rank_deficient_last_core():
    """Structural deficiency (bond rank > mode size) must not produce
    ghost directions or NaNs — the round-2 failure mode."""
    from tensor_networks_tpu.ops.packed import norm_exact, pack_ragged
    from tensor_networks_tpu.ops.tight import tt_round_tight

    rng = np.random.default_rng(3)
    ins = [tnt.Index(f"x{i}", 4) for i in range(8)]
    # 6 terms -> rank-6 bonds against mode size 4: last core is 6x4
    s = tt_sum([_scaled_rank1(ins, rng, 1.0) for _ in range(6)])
    s64 = _to64(s)
    for node in list(s.network.nodes):
        s.node_tensor(node).update_val_size(
            jnp.asarray(s.value(node), jnp.float32)
        )
    nrm = float(norm_exact(pack_ragged(s64)))
    out, ranks = tt_round_tight(s, 1e-5)
    assert all(np.isfinite(np.asarray(out.value(n))).all()
               for n in out.network.nodes)
    assert max(ranks) <= 6
    diff = _to64(out) - s64
    rel = float(norm_exact(pack_ragged(diff))) / nrm
    assert rel <= 2e-5, rel


def test_chol_adaptive_rank_deficient_no_nan():
    """Escalating-shift Cholesky self-heals exact rank deficiency."""
    from tensor_networks_tpu.ops.fast import _chol_adaptive

    rng = np.random.default_rng(0)
    a = rng.standard_normal((8, 3)).astype(np.float32)
    g = jnp.asarray(a @ a.T)  # exactly rank 3, 8x8
    jit0 = (jnp.trace(g) / 8 + 1e-30) * (20.0 * jnp.finfo(g.dtype).eps)
    l, shift = _chol_adaptive(g, jit0)
    assert bool(jnp.isfinite(l).all())
    # batched: one clean, one deficient
    gb = jnp.stack([g + jnp.eye(8, dtype=g.dtype), g])
    jb = jnp.full((2,), jit0, g.dtype)
    lb, sb = _chol_adaptive(gb, jb)
    assert bool(jnp.isfinite(lb).all())
    # the clean matrix must keep the base shift
    assert float(sb[0]) == pytest.approx(float(jb[0]))


def test_tight_batched_matches_sequential():
    """The batched forward sweep (one Gram-chain scan + one batched
    apply) reproduces the sequential reference recursion: same ranks,
    same error class, on graded and rank-deficient trains."""
    from tensor_networks_tpu.ops.packed import norm_exact, pack_ragged
    from tensor_networks_tpu.ops.tight import tt_round_tight

    s, _ = _graded_train()
    s64 = _to64(s)
    nrm = float(norm_exact(pack_ragged(s64)))
    for eps in (1e-3, 1e-6):
        out_b, ranks_b = tt_round_tight(
            s.__deepcopy__({}), eps, sweep="batched"
        )
        out_s, ranks_s = tt_round_tight(
            s.__deepcopy__({}), eps, sweep="sequential"
        )
        assert ranks_b == ranks_s, (eps, ranks_b, ranks_s)
        rel_b = float(norm_exact(pack_ragged(_to64(out_b) - s64))) / nrm
        rel_s = float(norm_exact(pack_ragged(_to64(out_s) - s64))) / nrm
        assert rel_b <= 2.0 * eps, (eps, rel_b)
        assert rel_b <= 4.0 * max(rel_s, eps / 10), (eps, rel_b, rel_s)


def test_tight_batched_rejects_unknown_sweep():
    import pytest as _pytest

    from tensor_networks_tpu.ops.tight import tt_round_tight

    s, _ = _graded_train(d=6)
    with _pytest.raises(ValueError):
        tt_round_tight(s, 1e-3, sweep="nope")


@pytest.mark.slow
def test_tight_batched_minimum_train():
    """d=3 (single mid core): the Gram-chain scan and batched apply
    handle length-1 stacks."""
    from tensor_networks_tpu.ops.tight import tt_round_tight

    s, _ = _graded_train(d=3, scales=(1.0, 1e-3))
    s64 = _to64(s)
    out, ranks = tt_round_tight(s, 1e-2, sweep="batched")
    assert len(ranks) == 2 and max(ranks) == 1
    from tensor_networks_tpu.ops.packed import norm_exact, pack_ragged

    rel = float(
        norm_exact(pack_ragged(_to64(out) - s64))
    ) / float(norm_exact(pack_ragged(s64)))
    assert rel <= 2e-2, rel


@pytest.mark.slow
def test_tight_ragged_mixed_chain():
    """Ragged ranks + mixed mode sizes route through chain padding in
    the tight sweep too: exact rank recovery on a doubled f32 train."""
    from tensor_networks_tpu.ops.tight import tt_round_tight

    np.random.seed(33)
    sizes = [3, 5, 4, 6]
    ins = [tnt.Index(f"u{k}", s) for k, s in enumerate(sizes)]
    a = tnt.TensorNetwork.rand_tt(ins, [2, 4, 3], dtype=np.float32)
    s = a + a  # ragged doubled ranks [4, 8, 6]
    dense = 2.0 * np.asarray(a.contract().value, np.float64)
    for sweep in ("batched", "sequential"):
        out, ranks = tt_round_tight(s.__deepcopy__({}), 1e-5, sweep=sweep)
        assert ranks == [2, 4, 3], (sweep, ranks)
        got = np.asarray(out.contract().value, np.float64)
        rel = np.linalg.norm(got - dense) / np.linalg.norm(dense)
        assert rel < 2e-5, (sweep, rel)
