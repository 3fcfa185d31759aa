"""The two-sided matmul-only rounding sweep (batched sign-projector
truncation): parity with the Householder sweep where the SVD rule and
the per-direction threshold rule agree, and the error contract
everywhere."""

import numpy as np
import pytest

from tensor_networks_tpu import Index, TensorNetwork
from tensor_networks_tpu.ops.fast import tt_round_fixed


def _train(d=7, n=5, r=3, seed=0):
    np.random.seed(seed)
    indices = [Index(f"x{i}", n) for i in range(d)]
    return TensorNetwork.rand_tt(indices, [r] * (d - 1)), indices


def test_twosided_exact_rank_recovery():
    """a + a doubles every bond; all modes must compact back exactly."""
    tt, _ = _train()
    tt2 = tt + tt
    dense = np.asarray(tt2.contract().value)
    for method in ("svd", "cholqr2", "twosided"):
        out, ranks = tt_round_fixed(tt2, 1e-8, method=method)
        assert ranks == [3] * 6, (method, ranks)
        got = np.asarray(out.contract().value)
        rel = np.linalg.norm(got - dense) / np.linalg.norm(dense)
        assert rel < 1e-12, (method, rel)


def test_twosided_error_contract():
    """Truncation error stays within the requested relative budget and
    small components below eps are removed."""
    a, indices = _train(seed=2)
    b = TensorNetwork.rand_tt(indices, [4] * 6)
    for node in list(b.network.nodes):
        t = b.node_tensor(node)
        t.update_val_size(np.asarray(t.value) * 1e-6)
    s = a + b  # rank 7, second component carries ~1e-6 relative mass
    dense = np.asarray(s.contract().value)
    out, ranks = tt_round_fixed(s, 1e-3, method="twosided")
    assert ranks == [3] * 6, ranks
    got = np.asarray(out.contract().value)
    rel = np.linalg.norm(got - dense) / np.linalg.norm(dense)
    assert rel < 1e-3


def test_twosided_keeps_structure_above_threshold():
    """Nothing is dropped when the budget cannot afford it."""
    tt, _ = _train(d=6, n=4, r=4, seed=5)
    dense = np.asarray(tt.contract().value)
    out, ranks = tt_round_fixed(tt, 1e-10, method="twosided")
    got = np.asarray(out.contract().value)
    rel = np.linalg.norm(got - dense) / np.linalg.norm(dense)
    assert rel < 1e-10
    # random full-rank train: nothing compressible at 1e-10
    assert ranks == [int(x) for x in tt.ranks()]


def test_cholesky_breakdown_falls_back():
    """A NaN from a Cholesky-based sweep is detected and rerouted to
    the Householder sweep, not returned."""
    import warnings as warnings_mod

    from tensor_networks_tpu.ops import fast as fast_mod

    tt, _ = _train()
    tt2 = tt + tt
    dense = np.asarray(tt2.contract().value)

    real = fast_mod._tt_round_twosided_sweep_fn

    def poisoned(relative):
        fn = real(relative)

        def wrapper(first, mids, last, eps, *a, **k):
            f, m, l, k0, ks = fn(first, mids, last, eps, *a, **k)
            return f, m, l * np.nan, k0, ks

        return wrapper

    fast_mod._tt_round_twosided_sweep_fn = poisoned
    try:
        with pytest.warns(RuntimeWarning, match="broke down"):
            out, ranks = tt_round_fixed(tt2, 1e-8, method="twosided")
    finally:
        fast_mod._tt_round_twosided_sweep_fn = real
    got = np.asarray(out.contract().value)
    rel = np.linalg.norm(got - dense) / np.linalg.norm(dense)
    assert rel < 1e-12 and ranks == [3] * 6
