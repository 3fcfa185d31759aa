"""CholeskyQR2 accurate rounding sweep: same truncation contract as the
Householder-QR sweep, all-GEMM (1.1 ms vs 5.5 ms on chip at d=50 r=100)."""

import jax.numpy as jnp
import numpy as np

import tensor_networks_tpu as tnt
from tensor_networks_tpu.ops import tt_sum
from tensor_networks_tpu.ops.fast import tt_round_fixed


def _uniform_sum(seed=4, d=5, n=6, r=4):
    np.random.seed(seed)
    ins = [tnt.Index(f"m{i}", n) for i in range(d)]
    tt = tnt.TensorNetwork.rand_tt(ins, [r] * (d - 1))
    return tt + tt, r


def test_rank_deficient_sum_rounds_exactly():
    s, r = _uniform_sum()
    dense = np.asarray(s.contract().value)
    out, ranks = tt_round_fixed(s, 1e-8, method="cholqr2")
    assert ranks == [r] * len(ranks)
    assert np.allclose(
        np.asarray(out.contract().value), dense, atol=1e-12
    )


def test_matches_svd_sweep_ranks():
    for seed in range(3):
        s, _ = _uniform_sum(seed=seed)
        dense = np.asarray(s.contract().value)
        _, r_svd = tt_round_fixed(s.__deepcopy__({}), 1e-9, method="svd")
        out, r_c2 = tt_round_fixed(
            s.__deepcopy__({}), 1e-9, method="cholqr2"
        )
        assert r_svd == r_c2
        assert np.allclose(
            np.asarray(out.contract().value), dense, atol=1e-11
        )


def test_f32_flat_spectrum_truncates():
    def unit_rank1(ins, rng):
        vecs = [rng.standard_normal(i.size) for i in ins]
        return tnt.tt_rank1(
            ins, [v / np.linalg.norm(v) for v in vecs]
        )

    rng = np.random.default_rng(0)
    ins = [tnt.Index(f"q{i}", 8) for i in range(30)]
    tiny = unit_rank1(ins, rng)
    tiny.scale(1e-8)
    s = tt_sum([unit_rank1(ins, rng) for _ in range(8)] + [tiny])
    for node in list(s.network.nodes):
        s.node_tensor(node).update_val_size(
            jnp.asarray(s.value(node), jnp.float32)
        )
    out, ranks = tt_round_fixed(
        s.__deepcopy__({}), 1e-4, method="cholqr2"
    )
    assert max(ranks) == 8
