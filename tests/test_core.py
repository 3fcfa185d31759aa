"""Core TT tests — behavioral parity with the reference suite
(``tests/main_test.py`` TestIndex/TestTT in gorodetsky-umich/tensor_networks),
at the same tolerances."""

import copy
import os
import pickle
import tempfile

import numpy as np
import pytest

from tensor_networks_tpu import (
    Index,
    TensorNetwork,
    gmres,
    tt_gramsvd_round,
    tt_randomized_round,
    tt_right_orth,
    tt_sum,
    tt_sum_gramsvd_round,
    tt_sum_randomized_round,
    tt_rand_precond_svd_round,
    tt_svd_round,
    ttop_apply,
    ttop_rank1,
    ttop_rank2,
    ttop_sum_apply,
)

np.random.seed(4)


def A(x):
    return np.asarray(x)


class TestIndex:
    def test_equality(self):
        x = Index("x", 5)
        y = Index("x", 5)
        z = Index("z", 5)
        assert x == y
        assert x != z


@pytest.fixture
def tts():
    x = Index("t", 5)
    u = Index("u", 10)
    v = Index("v", 20)
    tt_ranks = [2, 2]
    tt1 = TensorNetwork.rand_tt([x, u, v], tt_ranks)
    tt_ranks2 = [3, 4]
    tt2 = TensorNetwork.rand_tt([x, u, v], tt_ranks2)
    return x, u, v, tt_ranks, tt1, tt_ranks2, tt2


class TestTT:
    def test_save(self, tts):
        _, _, _, tt_ranks, TT, _, _ = tts
        with tempfile.TemporaryDirectory() as td:
            fname = os.path.join(td, "test")
            with open(fname, "wb") as fp:
                pickle.dump(TT, fp, pickle.HIGHEST_PROTOCOL)
            with open(fname, "rb") as f:
                new_tt = pickle.load(f)
        assert new_tt.ranks() == tt_ranks
        err = np.abs(A(new_tt[0, 2, 4].value) - A(TT[0, 2, 4].value))
        assert err < 1e-14

    def test_to_dict(self, tts):
        _, _, _, tt_ranks, TT, _, _ = tts
        new_tt = TensorNetwork.from_dict(TT.to_dict())
        assert new_tt.ranks() == tt_ranks
        err = np.abs(A(new_tt[0, 2, 4].value) - A(TT[0, 2, 4].value))
        assert err < 1e-14

    def test_to_separated_dict(self, tts):
        _, _, _, tt_ranks, TT, _, _ = tts
        metadata, arrays = TT.to_separated_dict()
        new_tt = TensorNetwork.from_separated_dict(metadata, arrays)
        assert new_tt.ranks() == tt_ranks
        err = np.abs(A(new_tt[0, 2, 4].value) - A(TT[0, 2, 4].value))
        assert err < 1e-14

    def test_ranks(self, tts):
        _, _, _, tt_ranks, TT, tt_ranks2, TT2 = tts
        assert TT.ranks() == tt_ranks
        assert TT2.ranks() == tt_ranks2

    def test_contraction_and_index(self, tts):
        x, u, v, _, TT, _, _ = tts
        ttcon = TT.contract()
        ttarr = A(ttcon.value)
        assert ttarr.ndim == 3
        assert ttarr.shape == (x.size, u.size, v.size)
        assert ttcon.indices == [x, u, v]

        val = A(TT[2:4, 5:7, 3].value)
        assert np.allclose(ttarr[2:4, 5:7, 3], val, atol=1e-14, rtol=1e-14)

    def test_inner(self, tts):
        _, _, _, _, TT, _, TT2 = tts
        inner_val = A(TT.inner(TT2))
        out1 = A(TT.contract().value)
        out2 = A(TT2.contract().value)
        assert np.allclose(
            inner_val, np.sum(out1 * out2), atol=1e-14, rtol=1e-14
        )

    def test_integrate(self, tts):
        x, u, v, _, TT, _, _ = tts
        integral = A(TT.integrate([x, u, v], np.ones(3)).contract().value)
        ttarr = A(TT.contract().value)
        assert np.allclose(integral, np.sum(ttarr), atol=1e-13, rtol=1e-13)

        int_partial = A(TT.integrate([v], np.ones(1)).contract().value)
        assert int_partial.shape == (x.size, u.size)
        assert np.allclose(
            int_partial, np.sum(ttarr, axis=2), atol=1e-13, rtol=1e-13
        )

    def test_addition(self, tts):
        _, _, _, tt_ranks, TT, tt_ranks2, TT2 = tts
        tt_add = TT + TT2
        sum1 = A(tt_add.contract().value)
        out1 = A(TT.contract().value)
        out2 = A(TT2.contract().value)
        assert np.allclose(sum1, out1 + out2, atol=1e-14, rtol=1e-14)
        ranks = tt_add.ranks()
        assert ranks[0] == tt_ranks[0] + tt_ranks2[0]
        assert ranks[1] == tt_ranks[1] + tt_ranks2[1]

    def test_sum_multiple_tt(self, tts):
        x, u, v = tts[0], tts[1], tts[2]
        tt1 = TensorNetwork.rand_tt([x, u, v], [2, 2])
        tt2 = TensorNetwork.rand_tt([x, u, v], [4, 3])
        tt3 = TensorNetwork.rand_tt([x, u, v], [8, 12])
        tt4 = TensorNetwork.rand_tt([x, u, v], [3, 4])

        tt_sum_1 = tt_sum([tt1, tt2, tt3, tt4])
        tt_sum_2 = tt1 + tt2 + tt3 + tt4
        out1 = A(tt_sum_1.contract().value)
        out2 = A(tt_sum_2.contract().value)
        assert np.allclose(out1, out2, atol=1e-14, rtol=1e-14)
        ranks = tt_sum_1.ranks()
        assert ranks[0] == 2 + 4 + 8 + 3
        assert ranks[1] == 2 + 3 + 12 + 4

    def test_multiplication(self, tts):
        _, _, _, tt_ranks, TT, tt_ranks2, TT2 = tts
        tt_mult = TT * TT2
        mult1 = A(tt_mult.contract().value)
        out1 = A(TT.contract().value)
        out2 = A(TT2.contract().value)
        assert np.allclose(mult1, out1 * out2, atol=1e-14, rtol=1e-14)
        ranks = tt_mult.ranks()
        assert len(ranks) == 2
        assert ranks[0] == tt_ranks[0] * tt_ranks2[0]
        assert ranks[1] == tt_ranks[1] * tt_ranks2[1]

    def test_right_orthogonalization(self, tts):
        _, _, _, tt_ranks, TT, _, _ = tts
        TTc = copy.deepcopy(TT)
        arr1 = A(TTc.contract().value)

        TTc = tt_right_orth(TTc, 2)
        node = A(TTc.value(2))
        assert np.allclose(
            node @ node.T, np.eye(tt_ranks[1]), atol=1e-14, rtol=1e-14
        )
        arr2 = A(TTc.contract().value)
        assert np.allclose(arr1, arr2, atol=1e-14, rtol=1e-14)

        TTc = tt_right_orth(TTc, 1)
        node = A(TTc.value(1))
        check = sum(
            node[:, ii, :] @ node[:, ii, :].T for ii in range(node.shape[1])
        )
        assert np.allclose(
            check, np.eye(tt_ranks[0]), atol=1e-14, rtol=1e-14
        )
        arr2 = A(TTc.contract().value)
        assert np.allclose(arr1, arr2, atol=1e-14, rtol=1e-14)

    def test_rounding(self, tts):
        _, _, _, _, TT, _, _ = tts
        TTadd = TT + TT
        dense = A(TTadd.contract().value)
        TTadd = tt_svd_round(TTadd, 1e-5)
        assert TTadd.ranks() == [2, 2]
        assert np.allclose(
            A(TTadd.contract().value), dense, atol=1e-13, rtol=1e-13
        )

    def test_gramsvd_rounding(self, tts):
        _, _, _, _, TT, _, _ = tts
        TTadd = TT + TT
        dense = A(TTadd.contract().value)
        TTadd = tt_gramsvd_round(TTadd, 1e-5)
        assert TTadd.ranks() == [2, 2]
        assert np.allclose(
            A(TTadd.contract().value), dense, atol=1e-13, rtol=1e-13
        )

    def test_gram_rounding_ttsum(self, tts):
        _, _, _, _, TT, _, _ = tts
        s = 3
        TTadd = TT
        for _ in range(s - 1):
            TTadd = TTadd + TT
        sum_list = [copy.deepcopy(TT) for _ in range(s)]
        dense = A(TTadd.contract().value)
        rounded = tt_sum_gramsvd_round(sum_list, 1e-5)
        assert np.allclose(
            A(rounded.contract().value), dense, atol=1e-13, rtol=1e-13
        )

    def test_rand_rounding(self, tts):
        _, _, _, _, TT, _, _ = tts
        TTadd = TT + TT
        dense = A(TTadd.contract().value)
        TTadd = tt_randomized_round(y=TTadd, target_ranks=[2, 2])
        assert np.allclose(
            A(TTadd.contract().value), dense, atol=1e-13, rtol=1e-13
        )

    def test_rand_rounding_ttsum(self, tts):
        _, _, _, _, TT, _, _ = tts
        s = 3
        TTadd = TT
        for _ in range(s - 1):
            TTadd = TTadd + TT
        sum_list = [copy.deepcopy(TT) for _ in range(s)]
        dense = A(TTadd.contract().value)
        rounded = tt_sum_randomized_round(y=sum_list, target_ranks=[2, 2])
        assert np.allclose(
            A(rounded.contract().value), dense, atol=1e-13, rtol=1e-13
        )

    def test_rand_precond_svd_round(self, tts):
        _, _, _, _, TT, _, _ = tts
        TTadd = TT + TT
        dense = A(TTadd.contract().value)
        rounded = tt_rand_precond_svd_round(TTadd, 1e-10, [4, 4])
        assert np.allclose(
            A(rounded.contract().value), dense, atol=1e-10, rtol=1e-10
        )

    def test_scale(self, tts):
        _, _, _, _, TT, _, _ = tts
        TTc = copy.deepcopy(TT)
        TTc.scale(2.0)
        assert np.allclose(
            2 * A(TT.contract().value),
            A(TTc.contract().value),
            atol=1e-14,
            rtol=1e-14,
        )

    def test_ttop(self):
        x = Index("x", 10)
        xp = Index("xp", 10)
        y = Index("y", 5)
        yp = Index("yp", 5)
        z = Index("z", 3)
        zp = Index("zp", 3)
        indices_in = [x, y, z]
        indices_out = [xp, yp, zp]

        mat = np.random.randn(10, 10)
        ttop = ttop_rank1(
            indices_in, indices_out, [mat, np.eye(5), np.eye(3)], "A"
        )
        ttop_arr = A(ttop.contract().value)
        tt = TensorNetwork.rand_tt([x, y, z], [3, 2])
        tt_arr = A(tt.contract().value)
        should_be = np.einsum("ijklmn,jln->ikm", ttop_arr, tt_arr)
        check = A(ttop_apply(ttop, tt).contract().value)
        assert np.allclose(check, should_be, atol=1e-14, rtol=1e-14)

        a1 = np.random.randn(10, 10)
        a2 = np.random.randn(10, 10)
        e1 = np.eye(5)
        e2 = np.random.randn(5, 5)
        f1 = np.eye(3)
        f2 = np.random.randn(3, 3)
        ttop = ttop_rank2(
            indices_in, indices_out, [a1, e1, f1], [a2, e2, f2], "A"
        )
        ttop_arr = A(ttop.contract().value)
        tt = TensorNetwork.rand_tt([x, y, z], [3, 2])
        tt_arr = A(tt.contract().value)
        should_be = np.einsum("ijklmn,jln->ikm", ttop_arr, tt_arr)
        check = A(ttop_apply(ttop, tt).contract().value)
        assert np.allclose(check, should_be, atol=1e-13, rtol=1e-13)

        out = ttop_sum_apply(
            tt,
            indices_in,
            indices_out,
            [
                [
                    lambda v: np.dot(a1, A(v)),
                    lambda v: np.einsum("jk,mkp->mjp", e1, A(v)),
                    lambda v: np.einsum("ij,mj->mi", f1, A(v)),
                ],
                [
                    lambda v: np.dot(a2, A(v)),
                    lambda v: np.einsum("jk,mkp->mjp", e2, A(v)),
                    lambda v: np.einsum("ij,mj->mi", f2, A(v)),
                ],
            ],
            "A",
        )
        check2 = A(out.contract().value)
        assert np.allclose(check2, should_be, atol=1e-13, rtol=1e-13)

    @pytest.mark.slow
    def test_gmres(self):
        x = Index("x", 10)
        xp = Index("xp", 10)
        y = Index("y", 5)
        yp = Index("yp", 5)
        z = Index("z", 3)
        zp = Index("zp", 3)
        indices_in = [x, y, z]
        indices_out = [xp, yp, zp]
        mat = np.random.randn(10, 10)
        ttop = ttop_rank1(
            indices_in, indices_out, [mat, np.eye(5), np.eye(3)], "A"
        )
        tt = TensorNetwork.rand_tt([x, y, z], [3, 2])
        x0 = TensorNetwork.rand_tt([x, y, z], [3, 2])
        _, resid = gmres(
            lambda ttin: ttop_apply(ttop, ttin), tt, x0, 1e-5, 1e-10,
            maxiter=30,
        )
        assert resid < 1e-5

    def test_optimize(self, tts):
        _, _, _, _, TT, _, _ = tts
        TTadd = TT + TT
        indices = TTadd.free_indices()
        dense = A(TTadd.contract().value)
        TTadd.round(0, 1e-5)
        rounded = TTadd.contract()
        rounded_indices = TTadd.free_indices()
        perm = [rounded.indices.index(ind) for ind in indices]
        rounded = rounded.permute(perm)
        assert np.allclose(A(rounded.value), dense, atol=1e-12, rtol=1e-12)
