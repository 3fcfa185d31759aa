"""The parallel-prefix rounding mode (GEMM-only chains + batched
factorizations): parity with the Householder sweep, the error contract,
and the machine-readable fallback counter."""

import warnings

import numpy as np
import pytest

from tensor_networks_tpu import Index, TensorNetwork
from tensor_networks_tpu.ops.fast import ROUND_STATS, tt_round_fixed


def _train(d=7, n=5, r=3, seed=0):
    np.random.seed(seed)
    indices = [Index(f"x{i}", n) for i in range(d)]
    return TensorNetwork.rand_tt(indices, [r] * (d - 1)), indices


def test_prefix_exact_rank_recovery():
    """a + a doubles every bond; prefix compacts back exactly."""
    tt, _ = _train()
    tt2 = tt + tt
    dense = np.asarray(tt2.contract().value)
    out, ranks = tt_round_fixed(tt2, 1e-8, method="prefix")
    assert ranks == [3] * 6, ranks
    got = np.asarray(out.contract().value)
    rel = np.linalg.norm(got - dense) / np.linalg.norm(dense)
    assert rel < 1e-12, rel


def test_prefix_error_contract():
    a, indices = _train(seed=2)
    b = TensorNetwork.rand_tt(indices, [4] * 6)
    for node in list(b.network.nodes):
        t = b.node_tensor(node)
        t.update_val_size(np.asarray(t.value) * 1e-6)
    s = a + b
    dense = np.asarray(s.contract().value)
    out, ranks = tt_round_fixed(s, 1e-3, method="prefix")
    assert ranks == [3] * 6, ranks
    got = np.asarray(out.contract().value)
    rel = np.linalg.norm(got - dense) / np.linalg.norm(dense)
    assert rel < 1e-3


def test_prefix_keeps_structure_above_threshold():
    tt, _ = _train(d=6, n=4, r=4, seed=5)
    dense = np.asarray(tt.contract().value)
    with pytest.warns(RuntimeWarning, match="noise floor"):
        out, ranks = tt_round_fixed(tt, 1e-10, method="prefix")
    got = np.asarray(out.contract().value)
    rel = np.linalg.norm(got - dense) / np.linalg.norm(dense)
    assert rel < 1e-10
    assert ranks == [int(x) for x in tt.ranks()]


def test_prefix_value_parity_with_householder():
    """Value parity with the svd sweep at eps=1e-6 on a doubled d=8
    train (VERDICT r2 #1 done-criterion)."""
    np.random.seed(11)
    indices = [Index(f"y{i}", 6) for i in range(8)]
    t1 = TensorNetwork.rand_tt(indices, [6] * 7)
    t2 = t1 + t1
    dense = np.asarray(t2.contract().value)
    o1, r1 = tt_round_fixed(t2, 1e-6, method="svd")
    o2, r2 = tt_round_fixed(t2, 1e-6, method="prefix")
    assert r1 == r2 == [6] * 7
    g1 = np.asarray(o1.contract().value)
    g2 = np.asarray(o2.contract().value)
    nrm = np.linalg.norm(dense)
    assert np.linalg.norm(g1 - g2) / nrm < 1e-12
    assert np.linalg.norm(g2 - dense) / nrm < 1e-12


def test_round_stats_counters():
    """ROUND_STATS counts mode runs and NaN fallbacks machine-readably."""
    from tensor_networks_tpu.ops import fast as fast_mod

    tt, _ = _train()
    tt2 = tt + tt
    before = dict(ROUND_STATS)
    tt_round_fixed(tt2, 1e-8, method="prefix")
    assert ROUND_STATS["prefix"] == before["prefix"] + 1
    assert ROUND_STATS["fallback_nan"] == before["fallback_nan"]

    real = fast_mod._tt_round_prefix_sweep_fn

    def poisoned(relative, **kw):
        fn = real(relative, **kw)

        def wrapper(first, mids, last, eps, *a, **k):
            f, m, l, k0, ks = fn(first, mids, last, eps, *a, **k)
            # poison a MIDDLE core only: a breakdown confined to an
            # interior bond never reaches the last core's projection,
            # so detection must cover every output
            return f, m.at[1].set(np.nan), l, k0, ks

        return wrapper

    fast_mod._tt_round_prefix_sweep_fn = poisoned
    try:
        with pytest.warns(RuntimeWarning, match="broke down"):
            out, ranks = tt_round_fixed(tt2, 1e-8, method="prefix")
    finally:
        fast_mod._tt_round_prefix_sweep_fn = real
    assert ROUND_STATS["fallback_nan"] == before["fallback_nan"] + 1
    assert ranks == [3] * 6


def test_round_fixed_ragged_mixed_chain():
    """Ragged bond ranks + mixed mode sizes + summed (block) layouts go
    through the fused sweep via chain padding: exact rank recovery on a
    doubled train and dense parity with 2x the original."""
    np.random.seed(31)
    sizes = [3, 5, 4, 6]
    inds = [Index(f"w{k}", s) for k, s in enumerate(sizes)]
    a = TensorNetwork.rand_tt(inds, [2, 4, 3])
    s = a + a  # ranks double to [4, 8, 6]
    dense = 2.0 * np.asarray(a.contract().value, np.float64)

    for method in ("svd", "prefix"):
        out, ranks = tt_round_fixed(s.__deepcopy__({}), 1e-10, method=method)
        assert ranks == [2, 4, 3], (method, ranks)
        got = np.asarray(out.contract().value, np.float64)
        # align axes by index identity: axis j of the reference is
        # a.free_indices()[j]; find it among out's free indices
        perm = [out.free_indices().index(i) for i in a.free_indices()]
        got = np.transpose(got, perm)
        assert np.allclose(got, dense, atol=1e-8), method


def test_padded_chain_structural_clamp():
    """Kept ranks on a padded thin-ended chain must respect the exact
    matricization's structural bound (_bond_bounds) for every fast mode.

    The failure this guards against is TPU-only (device eigh noise on
    rank-deficient Grams inflated k0 to 103 on a (32, 256) first bond —
    the 066709b class; CPU zero padding is exact, so this test pins the
    clamped semantics rather than reproducing the inflation), plus
    value parity of the padded path at a budget below the noise floor."""
    np.random.seed(37)
    sizes = [2, 7, 6, 7]  # thin first mode << padded nmax
    inds = [Index(f"g{k}", s) for k, s in enumerate(sizes)]
    a = TensorNetwork.rand_tt(inds, [2, 6, 5])  # ragged -> padded path
    dense = np.asarray(a.contract().value, np.float64)

    for method in ("gram", "prefix", "twosided", "cholqr2"):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            out, ranks = tt_round_fixed(
                a.__deepcopy__({}), 1e-12, method=method
            )
        assert ranks[0] <= 2 and ranks[1] <= 6 and ranks[2] <= 5, (
            method,
            ranks,
        )
        got = np.asarray(out.contract().value, np.float64)
        perm = [out.free_indices().index(i) for i in a.free_indices()]
        got = np.transpose(got, perm)
        rel = np.linalg.norm(got - dense) / np.linalg.norm(dense)
        assert rel < 1e-6, (method, rel)


def test_round_fixed_nonchain_still_raises():
    """Non-chain topologies keep the loud ValueError."""
    np.random.seed(32)
    inds = [Index(f"v{k}", 3) for k in range(4)]
    tucker = TensorNetwork.rand_tucker(inds, 2)
    with pytest.raises(ValueError):
        tt_round_fixed(tucker, 1e-6)


def test_round_fixed_shuffled_node_order():
    """Nodes added out of chain order must not stack silently wrong —
    the padded path re-discovers the chain from the bond metadata."""
    np.random.seed(34)
    inds = [Index(f"s{k}", 4) for k in range(5)]
    a = TensorNetwork.rand_tt(inds, [3] * 4)
    # rebuild with shuffled insertion order
    sh = TensorNetwork()
    names = list(a.network.nodes)
    for n in [names[2], names[0], names[4], names[1], names[3]]:
        sh.add_node(n, a.node_tensor(n))
    for u, v in a.network.edges():
        sh.add_edge(u, v)
    dense = np.asarray(a.contract().value, np.float64)
    out, ranks = tt_round_fixed(sh, 1e-10)
    got = np.asarray(out.contract().value, np.float64)
    perm = [out.free_indices().index(i) for i in a.free_indices()]
    got = np.transpose(got, perm)
    assert np.allclose(got, dense, atol=1e-8)


def test_prefix_unroll_env_parity(monkeypatch):
    """TNT_PREFIX_UNROLL changes XLA scheduling only — ranks and values
    must match the unroll=1 default bit-for-bit semantics-wise."""
    tt, _ = _train(seed=9)
    tt2 = tt + tt
    out0, ranks0 = tt_round_fixed(tt2.__deepcopy__({}), 1e-8, method="prefix")
    monkeypatch.setenv("TNT_PREFIX_UNROLL", "4")
    out4, ranks4 = tt_round_fixed(tt2.__deepcopy__({}), 1e-8, method="prefix")
    assert ranks4 == ranks0 == [3] * 6
    d0 = np.asarray(out0.contract().value)
    # axis j of the comparison target is out0.free_indices()[j]
    perm = [out4.free_indices().index(i) for i in out0.free_indices()]
    d4 = np.transpose(np.asarray(out4.contract().value), perm)
    assert np.allclose(d4, d0, atol=1e-12)


def test_prefix_chain_precision_env_parity(monkeypatch):
    """TNT_PREFIX_CHAIN_PREC trades MXU passes in the H/G chain GEMMs
    (a TPU-only distinction — CPU matmuls ignore precision), so on CPU
    the 'high' variant must match the default exactly; this pins the
    knob's plumbing and its decision-only blast radius."""
    tt, _ = _train(seed=13)
    tt2 = tt + tt
    out0, ranks0 = tt_round_fixed(tt2.__deepcopy__({}), 1e-8, method="prefix")
    monkeypatch.setenv("TNT_PREFIX_CHAIN_PREC", "high")
    outh, ranksh = tt_round_fixed(tt2.__deepcopy__({}), 1e-8, method="prefix")
    assert ranksh == ranks0 == [3] * 6
    d0 = np.asarray(out0.contract().value)
    perm = [outh.free_indices().index(i) for i in out0.free_indices()]
    dh = np.transpose(np.asarray(outh.contract().value), perm)
    assert np.allclose(dh, d0, atol=1e-12)


@pytest.mark.slow
def test_all_modes_randomized_chain_sweep():
    """Randomized consistency sweep: for a spread of chain geometries
    (ragged ranks, mixed modes, thin ends, rank-deficient sums), every
    fast mode must (a) respect the error contract, (b) never emit a
    bond above the input's, and (c) agree with the Householder sweep's
    ranks at a comfortably-resolved eps."""
    rng = np.random.default_rng(123)
    geometries = [
        ([4, 4, 4, 4, 4], [3, 3, 3, 3]),
        ([2, 9, 3, 8], [2, 5, 3]),
        ([6, 2, 2, 2, 6], [4, 4, 4, 4]),
        ([5, 5, 5], [4, 4]),
        ([3, 7, 4, 6, 5, 2], [2, 6, 5, 4, 2]),
    ]
    for sizes, ranks_in in geometries:
        inds = [Index(f"m{k}", s) for k, s in enumerate(sizes)]
        a = TensorNetwork.rand_tt(inds, ranks_in)
        s = a + a  # doubled ranks, exact true ranks = ranks_in (capped)
        dense = 2.0 * np.asarray(a.contract().value, np.float64)
        ref_out, ref_ranks = tt_round_fixed(
            s.__deepcopy__({}), 1e-8, method="svd"
        )
        for method in ("cholqr2", "twosided", "gram", "prefix"):
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)
                out, ranks = tt_round_fixed(
                    s.__deepcopy__({}), 1e-8, method=method
                )
            assert ranks == ref_ranks, (sizes, method, ranks, ref_ranks)
            got = np.asarray(out.contract().value, np.float64)
            perm = [out.free_indices().index(i) for i in a.free_indices()]
            got = np.transpose(got, perm)
            rel = np.linalg.norm(got - dense) / np.linalg.norm(dense)
            assert rel < 1e-7, (sizes, method, rel)


# ---- f32 fidelity floor: planted spectra (round-4 trust filters) ------


def _planted_f32(d=20, n=16, r=32, decay_bits=4.0, seed=0):
    """f32 train with sigma_j = 10^(-j/decay_bits) planted at the middle
    bond: left-orthonormal random cores, the middle core row-scaled."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)

    def rand_orth(a, b):
        m = rng.standard_normal((a, b))
        q, _ = np.linalg.qr(m if a >= b else m.T)
        return q if a >= b else q.T

    sig = 10.0 ** (-np.arange(r) / decay_bits)
    first = rand_orth(n, r)
    mids = np.stack(
        [rand_orth(r * n, r).reshape(r, n, r) for _ in range(d - 2)]
    )
    last = rand_orth(r, n)
    mids[d // 2 - 1] = sig[:, None, None] * mids[d // 2 - 1]
    return (
        jnp.asarray(first, jnp.float32),
        jnp.asarray(mids, jnp.float32),
        jnp.asarray(last, jnp.float32),
        d // 2 - 2,  # planted bond position within the ks vector
    )


def test_prefix_dw_fidelity_floor_f32():
    """The dw chain + spectral trust filters must resolve planted f32
    spectra to within 3 ranks of the twosided sweep (round 3's
    trace-bound ghost deflation over-truncated ~4 ranks deeper), with
    decisions STABLE as eps tightens past the floor (no ghost
    resurrection, no NaN) — the failure modes this rework fixed."""
    import jax.numpy as jnp

    from tensor_networks_tpu.ops.fast import (
        _tt_round_prefix_sweep_fn,
        _tt_round_twosided_sweep_fn,
    )

    first, mids, last, kpos = _planted_f32()
    dw = _tt_round_prefix_sweep_fn(True, chain_precision="dw")
    ts = _tt_round_twosided_sweep_fn(True)

    mids_ranks = {}
    for eps in (1e-3, 1e-4, 1e-5):
        f, m, l, k0, ks = dw(first, mids, last, eps)
        for x in (f, m, l):
            assert bool(jnp.all(jnp.isfinite(x))), eps
        mids_ranks[eps] = int(ks[kpos])
    # stability: decisions at/below the floor must not drift (ghost
    # resurrection showed up as rank jumps 12 -> 22 -> 60 pre-fix)
    vals = sorted(set(mids_ranks.values()))
    assert vals[-1] - vals[0] <= 1, mids_ranks

    _, _, _, _, ks_ts = ts(first, mids, last, 1e-4)
    got, ref = mids_ranks[1e-4], int(ks_ts[kpos])
    assert ref - 3 <= got <= ref + 1, (got, ref)


def test_prefix_dw_doubled_train_exact_recovery_f32():
    """Exact rank recovery on a doubled train in f32: the trust filters
    must kill the exact nulls the cholesky jitter inflates (the ghosts
    the old trace bound deflated), recovering rank r at every bond."""
    import jax
    import jax.numpy as jnp

    from tensor_networks_tpu.ops.fast import (
        _bond_bounds,
        _tt_round_prefix_sweep_fn,
    )

    d, n, r = 8, 6, 3
    rng = np.random.default_rng(3)
    first = np.linalg.qr(rng.standard_normal((n, r)))[0]
    mids = np.stack(
        [
            np.linalg.qr(rng.standard_normal((r * n, r)))[0].reshape(
                r, n, r
            )
            for _ in range(d - 2)
        ]
    )
    last = rng.standard_normal((r, n)) / np.sqrt(n)
    # doubled representation: rank-2r block-diagonal train representing
    # the same tensor (2r - r exact nulls at every bond)
    first2 = np.concatenate([first, first], axis=1)
    mids2 = np.zeros((d - 2, 2 * r, n, 2 * r))
    mids2[:, :r, :, :r] = mids
    mids2[:, r:, :, r:] = mids
    last2 = np.concatenate([0.5 * last, 0.5 * last], axis=0)

    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    bounds = jnp.asarray(
        _bond_bounds([n] * d, [2 * r] * (d - 1), 2 * r)
    )
    dw = _tt_round_prefix_sweep_fn(True, chain_precision="dw")
    f, m, l, k0, ks = dw(f32(first2), f32(mids2), f32(last2), 1e-4, bounds)
    ranks = [int(k0)] + [int(x) for x in np.asarray(ks)]
    assert ranks == [r] * (d - 1), ranks
    for x in (f, m, l):
        assert bool(jax.numpy.all(jnp.isfinite(x)))
