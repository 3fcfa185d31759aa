"""Distributed (train-sharded) sweep tests on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensor_networks_tpu import Index, TensorNetwork
from tensor_networks_tpu.ops.fast import stack_tt_cores
from tensor_networks_tpu.parallel import make_mesh
from tensor_networks_tpu.parallel.sweeps import (
    place_train_sharded,
    tt_right_orth_sharded,
)


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8
    return make_mesh((1, 8), ("data", "model"))


def test_sharded_right_orth_matches_reference(mesh8):
    d, n, r = 10, 4, 5  # d-2 = 8 middle cores over 8 devices
    np.random.seed(0)
    indices = [Index(f"x{i}", n) for i in range(d)]
    tt = TensorNetwork.rand_tt(indices, [r] * (d - 1))
    dense = np.asarray(tt.contract().value)

    first, mids, last = stack_tt_cores(tt)
    mids32 = jnp.asarray(np.asarray(mids))
    last32 = jnp.asarray(np.asarray(last))

    mids_sh, last_sh = place_train_sharded(mesh8, mids32, last32)
    carry, mids_q, last_q = tt_right_orth_sharded(mesh8, mids_sh, last_sh)

    # 1. orthogonality: every middle core is right-orthonormal
    mq = np.asarray(mids_q)
    for k in range(mq.shape[0]):
        mat = mq[k].reshape(r, -1)
        assert np.allclose(mat @ mat.T, np.eye(r), atol=1e-10)
    # last core: first min(r, n) rows orthonormal, padded rows zero
    lq = np.asarray(last_q)
    k = min(r, n)
    gram = lq @ lq.T
    assert np.allclose(gram[:k, :k], np.eye(k), atol=1e-10)
    assert np.allclose(gram[k:, :], 0.0, atol=1e-10)

    # 2. invariance: rebuilding the train reproduces the dense tensor
    out = TensorNetwork.rand_tt(indices, [r] * (d - 1))
    nodes = list(out.network.nodes)
    out.node_tensor(nodes[0]).update_val_size(
        jnp.asarray(np.asarray(first)) @ carry
    )
    for i, node in enumerate(nodes[1:-1]):
        out.node_tensor(node).update_val_size(mids_q[i])
    out.node_tensor(nodes[-1]).update_val_size(last_q)
    dense2 = np.asarray(out.contract().value)
    assert np.allclose(dense, dense2, atol=1e-9)


def _rebuild(indices, first, mids, last, d, r):
    out = TensorNetwork.rand_tt(indices, [r] * (d - 1))
    nodes = list(out.network.nodes)
    out.node_tensor(nodes[0]).update_val_size(jnp.asarray(first))
    for i, node in enumerate(nodes[1:-1]):
        out.node_tensor(node).update_val_size(mids[i])
    out.node_tensor(nodes[-1]).update_val_size(jnp.asarray(last))
    return out


def test_train_sharded_inner(mesh8):
    from tensor_networks_tpu.parallel.sweeps import tt_inner_train_sharded

    d, n, r = 10, 4, 5
    np.random.seed(4)
    indices = [Index(f"x{i}", n) for i in range(d)]
    a = TensorNetwork.rand_tt(indices, [r] * (d - 1))
    b = TensorNetwork.rand_tt(indices, [r] * (d - 1))
    expected = float(a.inner(b))

    fa, ma, la = stack_tt_cores(a)
    fb, mb, lb = stack_tt_cores(b)
    ma_sh, la_j = place_train_sharded(mesh8, jnp.asarray(ma), jnp.asarray(la))
    mb_sh, lb_j = place_train_sharded(mesh8, jnp.asarray(mb), jnp.asarray(lb))
    got = float(
        tt_inner_train_sharded(
            mesh8, jnp.asarray(fa), ma_sh, la_j, jnp.asarray(fb), mb_sh, lb_j
        )
    )
    assert np.isclose(got, expected, rtol=1e-10)


def test_distributed_gram_rounding(mesh8):
    """Distributed Gram-SVD rounding == the single-device result."""
    from tensor_networks_tpu import tt_gramsvd_round
    from tensor_networks_tpu.parallel.sweeps import tt_gram_round_sharded

    d, n, r = 10, 4, 6
    np.random.seed(3)
    indices = [Index(f"x{i}", n) for i in range(d)]
    base = TensorNetwork.rand_tt(indices, [3] * (d - 1))
    tt = base + base  # rank 6, true rank 3
    dense = np.asarray(tt.contract().value)

    first, mids, last = stack_tt_cores(tt)
    mids_sh, last_sh = place_train_sharded(
        mesh8, jnp.asarray(np.asarray(mids)), jnp.asarray(np.asarray(last))
    )
    f_out, m_out, l_out, k0, ranks = tt_gram_round_sharded(
        mesh8, jnp.asarray(np.asarray(first)), mids_sh, last_sh, 1e-10
    )

    # masked result represents the same tensor
    rebuilt = _rebuild(indices, f_out, m_out, l_out, d, r)
    dense2 = np.asarray(rebuilt.contract().value)
    assert np.allclose(dense, dense2, atol=1e-8)

    # kept ranks match the single-device Gram rounding
    ref = tt_gramsvd_round(base + base, 1e-10)
    ref_ranks = ref.ranks()
    got_ranks = [int(k0)] + [int(x) for x in np.asarray(ranks)]
    assert got_ranks == ref_ranks, (got_ranks, ref_ranks)


def test_distributed_prefix_rounding(mesh8):
    """Distributed parallel-prefix rounding: exact rank parity with the
    single-device prefix sweep, value parity with the dense tensor, and
    consistent single-source boundary bonds across device cuts."""
    from tensor_networks_tpu.ops.fast import (
        _bond_bounds,
        _tt_round_prefix_sweep_fn,
    )
    from tensor_networks_tpu.parallel.sweeps import tt_prefix_round_sharded

    d, n, r = 10, 4, 6
    np.random.seed(7)
    indices = [Index(f"x{i}", n) for i in range(d)]
    base = TensorNetwork.rand_tt(indices, [3] * (d - 1))
    tt = base + base  # rank 6, true rank 3
    dense = np.asarray(tt.contract().value)

    first, mids, last = stack_tt_cores(tt)
    first = jnp.asarray(np.asarray(first))
    mids = jnp.asarray(np.asarray(mids))
    last = jnp.asarray(np.asarray(last))
    mids_sh, last_sh = place_train_sharded(mesh8, mids, last)

    f_o, m_o, l_o, k0, ranks = tt_prefix_round_sharded(
        mesh8, first, mids_sh, last_sh, 1e-8
    )

    # value parity: the masked train still represents 2*base
    rebuilt = _rebuild(indices, f_o, m_o, l_o, d, r)
    dense2 = np.asarray(rebuilt.contract().value)
    assert np.allclose(dense, dense2, atol=1e-7)

    # exact rank parity with the fused single-device prefix sweep
    bounds = _bond_bounds([n] * d, [r] * (d - 1), r)
    f_r, m_r, l_r, k0_r, ranks_r = _tt_round_prefix_sweep_fn(True)(
        first, mids, last, 1e-8, jnp.asarray(bounds)
    )
    got = [int(k0)] + [int(x) for x in np.asarray(ranks)]
    ref = [int(k0_r)] + [int(x) for x in np.asarray(ranks_r)]
    assert got == ref == [3] * (d - 1), (got, ref)


def test_distributed_prefix_error_contract(mesh8):
    """A full-rank random train rounded at loose eps keeps the error
    within the contract, with ranks never above the input's."""
    from tensor_networks_tpu.parallel.sweeps import tt_prefix_round_sharded

    d, n, r = 10, 4, 6
    np.random.seed(9)
    indices = [Index(f"x{i}", n) for i in range(d)]
    tt = TensorNetwork.rand_tt(indices, [r] * (d - 1))
    dense = np.asarray(tt.contract().value)

    first, mids, last = stack_tt_cores(tt)
    mids_sh, last_sh = place_train_sharded(
        mesh8, jnp.asarray(np.asarray(mids)), jnp.asarray(np.asarray(last))
    )
    f_o, m_o, l_o, k0, ranks = tt_prefix_round_sharded(
        mesh8, jnp.asarray(np.asarray(first)), mids_sh, last_sh, 1e-2
    )
    rebuilt = _rebuild(indices, f_o, m_o, l_o, d, r)
    dense2 = np.asarray(rebuilt.contract().value)
    rel = np.linalg.norm(dense2 - dense) / np.linalg.norm(dense)
    assert rel < 1e-2, rel
    assert int(k0) <= r and all(int(x) <= r for x in np.asarray(ranks))


def test_distributed_prefix_nan_fallback(mesh8):
    """A NaN breakdown in the distributed prefix program falls back to
    the eigh-based distributed gram sweep with a warning and a
    ROUND_STATS count — the single-device contract, distributed."""
    import warnings as _w

    from tensor_networks_tpu.ops.fast import ROUND_STATS
    from tensor_networks_tpu.parallel import sweeps as sw

    d, n, r = 10, 4, 6
    np.random.seed(11)
    indices = [Index(f"x{i}", n) for i in range(d)]
    base = TensorNetwork.rand_tt(indices, [3] * (d - 1))
    tt = base + base
    dense = np.asarray(tt.contract().value)
    first, mids, last = stack_tt_cores(tt)
    first = jnp.asarray(np.asarray(first))
    mids_sh, last_sh = place_train_sharded(
        mesh8, jnp.asarray(np.asarray(mids)), jnp.asarray(np.asarray(last))
    )

    real = sw._prefix_sharded_fn

    def poisoned(mesh, sign_iters, chain_precision):
        fn = real(mesh, sign_iters, chain_precision)

        def wrapper(f, m, l, b, e):
            f2, m2, l2, k0, ks = fn(f, m, l, b, e)
            return f2, m2.at[1].set(np.nan), l2, k0, ks

        return wrapper

    before = ROUND_STATS["fallback_nan"]
    sw._prefix_sharded_fn = poisoned
    try:
        with pytest.warns(RuntimeWarning, match="broke down"):
            f_o, m_o, l_o, k0, ranks = sw.tt_prefix_round_sharded(
                mesh8, first, mids_sh, last_sh, 1e-8
            )
    finally:
        sw._prefix_sharded_fn = real
    assert ROUND_STATS["fallback_nan"] == before + 1
    got = [int(k0)] + [int(x) for x in np.asarray(ranks)]
    assert got == [3] * (d - 1), got
    rebuilt = _rebuild(indices, f_o, m_o, l_o, d, r)
    assert np.allclose(np.asarray(rebuilt.contract().value), dense, atol=1e-7)


def test_distributed_programs_are_cached(mesh8):
    """Repeated sharded rounding calls must reuse the jitted program
    (a fresh closure per call would re-trace the full staged pipeline
    each time — 20-60 s per remote compile)."""
    from tensor_networks_tpu.parallel import sweeps as sw

    d, n, r = 10, 4, 5
    np.random.seed(13)
    indices = [Index(f"x{i}", n) for i in range(d)]
    tt = TensorNetwork.rand_tt(indices, [r] * (d - 1))
    first, mids, last = stack_tt_cores(tt)
    first = jnp.asarray(np.asarray(first))
    mids_sh, last_sh = place_train_sharded(
        mesh8, jnp.asarray(np.asarray(mids)), jnp.asarray(np.asarray(last))
    )
    h0 = sw._prefix_sharded_fn.cache_info().hits
    sw.tt_prefix_round_sharded(mesh8, first, mids_sh, last_sh, 1e-6)
    sw.tt_prefix_round_sharded(mesh8, first, mids_sh, last_sh, 1e-3)
    assert sw._prefix_sharded_fn.cache_info().hits >= h0 + 1
    g0 = sw._gram_sharded_fn.cache_info().hits
    sw.tt_gram_round_sharded(mesh8, first, mids_sh, last_sh, 1e-6)
    sw.tt_gram_round_sharded(mesh8, first, mids_sh, last_sh, 1e-3)
    assert sw._gram_sharded_fn.cache_info().hits >= g0 + 1


def test_sharded_tdvp_matches_fused(mesh8):
    """Train-sharded one-site TDVP (pipeline placement, ppermute
    carries, per-device environment blocks) reproduces the fused
    single-device trajectory at roundoff — norms AND the represented
    state — on both the dense and Lanczos local-exponential paths."""
    from tensor_networks_tpu.ops import packed as pk
    from tensor_networks_tpu.ops.evolve import evolve_tdvp
    from tensor_networks_tpu.ops.qtt import qtt_exponential, qtt_tridiagonal
    from tensor_networks_tpu.parallel.evolve import evolve_tdvp_sharded

    K = 10  # d - 2 = 8 middle cores over 8 devices
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    u0 = pk.pad_rank(qtt_exponential(K, c=3.0), 4)

    def dense_vec(u):
        cs = (
            [np.asarray(u.first)[None]]
            + [np.asarray(u.mids[i]) for i in range(K - 2)]
            + [np.asarray(u.last)[..., None]]
        )
        v = cs[0]
        for c in cs[1:]:
            v = np.einsum("...r,rjs->...js", v, c)
        return v.reshape(-1)

    for kw in ({}, {"dense_limit": 0, "krylov": 20}):
        u_sh, n_sh = evolve_tdvp_sharded(mesh8, A, u0, 0.03, 3, **kw)
        u_rf, n_rf = evolve_tdvp(A, u0, 0.03, 3, **kw)
        np.testing.assert_allclose(n_sh, n_rf, rtol=1e-10)
        ref = dense_vec(u_rf)
        got = dense_vec(u_sh)
        assert (
            np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-10
        )


def test_sharded_tdvp_program_cached(mesh8):
    """Step executable reused across steps AND step sizes (h is a
    traced operand; self-contained — calls the step itself)."""
    from tensor_networks_tpu.ops import packed as pk
    from tensor_networks_tpu.ops.qtt import qtt_exponential, qtt_tridiagonal
    from tensor_networks_tpu.parallel import evolve as pe

    K = 10
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    u0 = pk.pad_rank(qtt_exponential(K, c=2.0), 4)
    dtp = u0.first.dtype
    X, Am = pe.place_tdvp_sharded(mesh8, u0.mids, A.mids.astype(dtp))
    x0 = u0.first[None]
    xl = u0.last[..., None]
    a0 = A.first[None].astype(dtp)
    al = A.last[..., None].astype(dtp)
    h0 = pe._tdvp_sharded_fn.cache_info().hits
    pe.tdvp_step_sharded(mesh8, x0, X, xl, a0, Am, al, 0.01)
    pe.tdvp_step_sharded(mesh8, x0, X, xl, a0, Am, al, 0.02)
    assert pe._tdvp_sharded_fn.cache_info().hits >= h0 + 1


def test_sharded_als_matches_fused(mesh8):
    """Train-sharded ALS (envs sharded, staged local solves, ppermute
    carries, distributed residual) reproduces the fused single-device
    solver: residual histories at roundoff and the same solution, on
    the K=10 screened-Poisson QTT system."""
    from tensor_networks_tpu.ops import packed as pk
    from tensor_networks_tpu.ops.als import als_solve
    from tensor_networks_tpu.ops.qtt import (
        qtt_exponential,
        qtt_screened_laplacian,
    )
    from tensor_networks_tpu.parallel.als import als_solve_sharded

    K = 10  # d - 2 = 8 middle cores over 8 devices
    op = qtt_screened_laplacian(K, delta=1.0)
    rhs = qtt_exponential(K, c=3.0)
    x0 = pk.pad_rank(rhs, 6)

    x_sh, res_sh, hist_sh = als_solve_sharded(
        mesh8, op, rhs, x0, sweeps=2, tol=0.0, spd=True
    )
    x_rf, res_rf, hist_rf = als_solve(
        op, rhs, x0, sweeps=2, tol=0.0, spd=True
    )
    # both reach the deep-converged regime and agree
    assert res_sh < 1e-11 * float(pk.norm_exact(rhs))
    np.testing.assert_allclose(hist_sh, hist_rf, rtol=1e-6, atol=1e-14)

    def dense_vec(u):
        cs = (
            [np.asarray(u.first)[None]]
            + [np.asarray(u.mids[i]) for i in range(K - 2)]
            + [np.asarray(u.last)[..., None]]
        )
        v = cs[0]
        for c in cs[1:]:
            v = np.einsum("...r,rjs->...js", v, c)
        return v.reshape(-1)

    ref = dense_vec(x_rf)
    got = dense_vec(x_sh)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-9


def test_sharded_eigsh_matches_fused(mesh8):
    """Train-sharded DMRG eigensolver (operator/metric/deflation env
    chains sharded, staged local eigen-solves, ppermute carries)
    reproduces the fused single-device solver bit-for-bit on the
    ground state, the generalized (mass-matrix) problem, and penalty
    deflation."""
    from tensor_networks_tpu.ops import packed as pk
    from tensor_networks_tpu.ops.eigen import als_eigsh
    from tensor_networks_tpu.ops.qtt import (
        qtt_exponential,
        qtt_screened_laplacian,
        qtt_tridiagonal,
    )
    from tensor_networks_tpu.parallel.eigen import als_eigsh_sharded

    K = 10  # d - 2 = 8 middle cores over 8 devices
    x0 = pk.pad_rank(qtt_exponential(K, c=2.0), 6)

    # ground state, frame-Gram metric
    op = qtt_screened_laplacian(K, delta=0.5)
    x_sh, lam_sh, hist_sh = als_eigsh_sharded(mesh8, op, x0, sweeps=4)
    x_rf, lam_rf, hist_rf = als_eigsh(op, x0, sweeps=4)
    np.testing.assert_allclose(hist_sh, hist_rf, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(x_sh.mids), np.asarray(x_rf.mids), atol=1e-12
    )

    # penalty deflation toward the second eigenpair
    e_sh, mu1_sh, _ = als_eigsh_sharded(
        mesh8, op, x0, sweeps=5, deflate=(x_sh,)
    )
    e_rf, mu1_rf, _ = als_eigsh(op, x0, sweeps=5, deflate=(x_rf,))
    np.testing.assert_allclose(mu1_sh, mu1_rf, rtol=1e-10)
    assert mu1_sh > lam_sh

    # generalized problem (FEM stiffness/mass pair)
    h = 1.0 / (2**K + 1)
    A = qtt_tridiagonal(K, 2.0 / h, -1.0 / h, -1.0 / h)
    M = qtt_tridiagonal(K, 4.0 * h / 6, h / 6, h / 6)
    _, mu_sh, hg_sh = als_eigsh_sharded(mesh8, A, x0, sweeps=4, mass=M)
    _, mu_rf, hg_rf = als_eigsh(A, x0, sweeps=4, mass=M)
    np.testing.assert_allclose(hg_sh, hg_rf, rtol=1e-12)
    # pi^2 to discretization accuracy
    np.testing.assert_allclose(mu_sh, np.pi**2, rtol=1e-4)


def test_sharded_theta_integrator(mesh8):
    """Train-sharded theta-method integration: the sharding-preserving
    operator apply is core-exact vs the fused apply; backward Euler
    (identity rhs) matches the fused integrator at roundoff; full
    Crank-Nicolson with a FEM mass matrix and a constant source matches
    the dense implicit recursion at truncation level; observables are
    recorded per step."""
    from tensor_networks_tpu.ops import packed as pk
    from tensor_networks_tpu.ops.evolve import evolve_theta
    from tensor_networks_tpu.ops.qtt import (
        qtt_exponential,
        qtt_screened_laplacian,
        qtt_tridiagonal,
    )
    from tensor_networks_tpu.parallel.evolve import (
        evolve_theta_sharded,
        ttop_apply_sharded,
    )

    K = 10
    op = qtt_screened_laplacian(K, delta=1.0)
    u0 = pk.pad_rank(qtt_exponential(K, c=3.0), 6)

    au_sh = ttop_apply_sharded(mesh8, op, u0)
    au_rf = pk.ttop_apply_packed(op, u0)
    np.testing.assert_array_equal(
        np.asarray(au_sh.mids), np.asarray(au_rf.mids)
    )

    def dense_vec(u):
        d = u.mids.shape[0] + 2
        cs = (
            [np.asarray(u.first)[None]]
            + [np.asarray(u.mids[i]) for i in range(d - 2)]
            + [np.asarray(u.last)[..., None]]
        )
        v = cs[0]
        for c in cs[1:]:
            v = np.einsum("...r,rjs->...js", v, c)
        return v.reshape(-1)

    # backward Euler, no mass: identity rhs, so the sharded and fused
    # integrators run the same arithmetic step for step
    u_sh, res_sh = evolve_theta_sharded(
        mesh8, op, u0, 0.01, 3, theta=1.0, spd=True
    )
    u_rf, res_rf = evolve_theta(op, u0, 0.01, 3, theta=1.0, spd=True)
    np.testing.assert_allclose(res_sh, res_rf, atol=1e-13)
    ref, got = dense_vec(u_rf), dense_vec(u_sh)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-10
    assert len(u_sh.mids.sharding.device_set) == 8

    # Crank-Nicolson, FEM mass + constant source + observable, vs the
    # dense implicit recursion
    h = 1.0 / (2**K + 1)
    A = qtt_tridiagonal(K, 2.0 / h, -1.0 / h, -1.0 / h)
    M = qtt_tridiagonal(K, 4.0 * h / 6, h / 6, h / 6)
    u0b = pk.pad_rank(qtt_exponential(K, c=1.0), 8)
    src = pk.pad_rank(qtt_exponential(K, c=-2.0), 8)
    dt, steps, theta = 1e-5, 3, 0.5
    u_m, res_m, obs = evolve_theta_sharded(
        mesh8, A, u0b, dt, steps, theta=theta, mass=M, source=src,
        sweeps=6, spd=True, observables=(M,),
    )
    assert len(obs) == steps and len(obs[0]) == 1

    def dense_mat(O):
        d = O.mids.shape[0] + 2
        cs = (
            [np.asarray(O.first)[None]]
            + [np.asarray(O.mids[i]) for i in range(d - 2)]
            + [np.asarray(O.last)[..., None]]
        )
        v = cs[0]
        for c in cs[1:]:
            v = np.tensordot(v, c, axes=(v.ndim - 1, 0))
        v = np.squeeze(v, axis=(0, v.ndim - 1))
        perm = list(range(0, 2 * d, 2)) + list(range(1, 2 * d, 2))
        return v.transpose(perm).reshape(2**d, 2**d)

    Ad, Md = dense_mat(A), dense_mat(M)
    ud = dense_vec(u0b)
    sd = dense_vec(src)
    for _ in range(steps):
        rhs = (Md - (1 - theta) * dt * Ad) @ ud + dt * sd
        ud = np.linalg.solve(Md + theta * dt * Ad, rhs)
    got_m = dense_vec(u_m)
    assert np.linalg.norm(got_m - ud) / np.linalg.norm(ud) < 1e-12


def test_sharded_als_adaptive(mesh8):
    """Rank-adaptive distributed ALS: AMEn enrichment assembled and
    truncated fully distributed (sharding-preserving residual train +
    distributed Gram kick basis) converges through the rank ladder to
    the requested tolerance; inert zero-padding growth does too."""
    from tensor_networks_tpu.ops import packed as pk
    from tensor_networks_tpu.ops.qtt import (
        qtt_exponential,
        qtt_screened_laplacian,
    )
    from tensor_networks_tpu.parallel.als import als_solve_adaptive_sharded

    K = 10
    op = qtt_screened_laplacian(K, delta=1.0)
    rhs = qtt_exponential(K, c=3.0)
    bn = float(pk.norm_exact(rhs))

    x, res, hist = als_solve_adaptive_sharded(
        mesh8, op, rhs, eps=1e-10, rank=2, max_rank=16, spd=True
    )
    assert res <= 1e-10 * bn
    assert 2 < x.rank <= 16  # the ladder actually grew
    assert hist[0] > 1e-10 * bn  # and needed to
    assert len(x.mids.sharding.device_set) == 8

    x2, res2, _ = als_solve_adaptive_sharded(
        mesh8, op, rhs, eps=1e-10, rank=2, max_rank=16, spd=True,
        enrich=False,
    )
    assert res2 <= 1e-10 * bn


def test_sharded_eigsh_k_and_adaptive(mesh8):
    """Distributed excited-states driver (compile-once deflation
    slots, distributed Rayleigh cleanup) and the rank-adaptive
    distributed eigensolver reproduce their fused single-device
    counterparts."""
    from tensor_networks_tpu.ops import packed as pk
    from tensor_networks_tpu.ops.eigen import als_eigsh_adaptive, als_eigsh_k
    from tensor_networks_tpu.ops.qtt import (
        qtt_exponential,
        qtt_screened_laplacian,
    )
    from tensor_networks_tpu.parallel.eigen import (
        als_eigsh_adaptive_sharded,
        als_eigsh_k_sharded,
    )

    K = 10
    op = qtt_screened_laplacian(K, delta=0.5)
    x0 = pk.pad_rank(qtt_exponential(K, c=2.0), 6)

    vecs_sh, vals_sh = als_eigsh_k_sharded(mesh8, op, x0, 3, sweeps=6)
    _, vals_rf = als_eigsh_k(op, x0, 3, sweeps=6)
    np.testing.assert_allclose(vals_sh, vals_rf, rtol=1e-12)
    assert vals_sh[0] < vals_sh[1] < vals_sh[2]
    assert all(len(v.mids.sharding.device_set) == 8 for v in vecs_sh)

    # adaptive ladder from a rank-1 start: grows (the sine ground
    # state is not rank-1) and matches the fused ladder
    x1 = qtt_exponential(K, c=2.0)
    xa, lam_a, _ = als_eigsh_adaptive_sharded(
        mesh8, op, x1, eps=1e-10, max_rank=8
    )
    xr, lam_r, _ = als_eigsh_adaptive(op, x1, eps=1e-10, max_rank=8)
    assert xa.rank == xr.rank > 1
    np.testing.assert_allclose(lam_a, lam_r, rtol=1e-12)


def test_sharded_tdvp2_matches_fused(mesh8):
    """Train-sharded two-site TDVP (the evolved working core rides the
    ppermute carry; mid-pair scans are the fused step's own bodies with
    a masked dummy row for block alignment) is bit-exact vs the fused
    single-device integrator, including the reported effective bond
    ranks."""
    from tensor_networks_tpu.ops import packed as pk
    from tensor_networks_tpu.ops.evolve import evolve_tdvp2
    from tensor_networks_tpu.ops.qtt import (
        qtt_exponential,
        qtt_screened_laplacian,
    )
    from tensor_networks_tpu.parallel.evolve import evolve_tdvp2_sharded

    K = 10
    A = qtt_screened_laplacian(K, delta=1.0)
    u0 = pk.pad_rank(qtt_exponential(K, c=3.0), 4)

    u_sh, n_sh, r_sh = evolve_tdvp2_sharded(
        mesh8, A, u0, 0.01, 3, max_rank=6
    )
    u_rf, n_rf, r_rf = evolve_tdvp2(A, u0, 0.01, 3, max_rank=6)
    np.testing.assert_allclose(n_sh, n_rf, rtol=1e-13)
    assert r_sh == r_rf
    np.testing.assert_allclose(
        np.asarray(u_sh.mids), np.asarray(u_rf.mids), atol=1e-13
    )
    assert len(u_sh.mids.sharding.device_set) == 8

    # rank growth from a rank-1 start inside the static max_rank padding
    u1 = qtt_exponential(K, c=3.0)
    u_g, n_g, r_g = evolve_tdvp2_sharded(
        mesh8, A, u1, 0.05, 3, max_rank=8, eps=1e-10
    )
    _, n_gr, r_gr = evolve_tdvp2(A, u1, 0.05, 3, max_rank=8, eps=1e-10)
    assert r_g == r_gr and max(r_g) > 1
    np.testing.assert_allclose(n_g, n_gr, rtol=1e-13)


def test_distributed_prefix_dw_rank_parity(mesh8):
    """The compensated (dw-chain + trust-filter) distributed prefix
    reproduces the fused dw sweep's kept ranks exactly and the
    represented tensor to f64 accuracy — the round-4 fidelity mode,
    distributed."""
    from tensor_networks_tpu.ops.fast import (
        _bond_bounds,
        _tt_round_prefix_sweep_fn,
    )
    from tensor_networks_tpu.parallel.sweeps import tt_prefix_round_sharded

    d, n, r = 10, 4, 6
    np.random.seed(11)
    indices = [Index(f"x{i}", n) for i in range(d)]
    base = TensorNetwork.rand_tt(indices, [3] * (d - 1))
    tt = base + base  # rank 6, true rank 3
    dense = np.asarray(tt.contract().value)

    first, mids, last = stack_tt_cores(tt)
    first = jnp.asarray(np.asarray(first))
    mids = jnp.asarray(np.asarray(mids))
    last = jnp.asarray(np.asarray(last))
    mids_sh, last_sh = place_train_sharded(mesh8, mids, last)

    f_o, m_o, l_o, k0, ranks = tt_prefix_round_sharded(
        mesh8, first, mids_sh, last_sh, 1e-8, chain_precision="dw"
    )
    rebuilt = _rebuild(indices, f_o, m_o, l_o, d, r)
    dense2 = np.asarray(rebuilt.contract().value)
    assert np.allclose(dense, dense2, atol=1e-7)

    bounds = _bond_bounds([n] * d, [r] * (d - 1), r)
    f_r, m_r, l_r, k0_r, ranks_r = _tt_round_prefix_sweep_fn(
        True, chain_precision="dw"
    )(first, mids, last, 1e-8, jnp.asarray(bounds))
    got = [int(k0)] + [int(x) for x in np.asarray(ranks)]
    ref = [int(k0_r)] + [int(x) for x in np.asarray(ranks_r)]
    assert got == ref == [3] * (d - 1), (got, ref)
