"""Time integration (ops/evolve.py) against dense trajectories:
theta-method and projector-splitting TDVP.  No reference counterpart
(pytens has no time integration)."""

import numpy as np
import pytest
import scipy.linalg as sla

from tensor_networks_tpu.ops import packed as pk
from tensor_networks_tpu.ops.evolve import (
    evolve_tdvp,
    evolve_tdvp2,
    evolve_theta,
    tdvp_trajectory,
)
from tensor_networks_tpu.ops.qtt import qtt_exponential, qtt_tridiagonal


def _dense_vec(p):
    d = p.mids.shape[0] + 2
    cs = (
        [np.asarray(p.first)[None]]
        + [np.asarray(p.mids[i]) for i in range(d - 2)]
        + [np.asarray(p.last)[..., None]]
    )
    v = cs[0]
    for k in range(1, d):
        v = np.einsum("...r,rjs->...js", v, cs[k])
    return v.reshape(-1)


def _lin_perm(K):
    n = 2**K
    lin = np.zeros(n, dtype=int)
    for pos in range(n):
        rem, bits = pos, []
        for _ in range(K):
            bits.append(rem % 2)
            rem //= 2
        bits = bits[::-1]
        lin[pos] = sum(b << k for k, b in enumerate(bits))
    return lin


@pytest.mark.parametrize("theta", [1.0, 0.5])
def test_evolve_matches_dense_trajectory(theta):
    """Implicit Euler and Crank-Nicolson on the 1D heat equation
    reproduce the dense 20-step trajectory (per-step ALS warm starts
    at fixed rank)."""
    K = 6
    n = 2**K
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    u0 = pk.pad_rank(qtt_exponential(K, c=3.0), 8)
    dt, steps = 0.1, 20
    u, res = evolve_theta(A, u0, dt, steps, theta=theta, spd=True)
    assert res[-1] < 1e-10

    Ad = 2 * np.eye(n)
    Ad -= np.diag(np.ones(n - 1), 1)
    Ad -= np.diag(np.ones(n - 1), -1)
    lin = _lin_perm(K)
    ud = np.zeros(n)
    ud[lin] = _dense_vec(u0)
    L = np.eye(n) + theta * dt * Ad
    R = np.eye(n) - (1 - theta) * dt * Ad
    for _ in range(steps):
        ud = np.linalg.solve(L, R @ ud)
    uf = np.zeros(n)
    uf[lin] = _dense_vec(u)
    assert np.linalg.norm(uf - ud) / np.linalg.norm(ud) < 1e-6


def test_evolve_with_fem_mass():
    """Generalized step operator (M + theta dt A) with the FEM mass
    matrix, against the dense generalized trajectory."""
    K = 5
    n = 2**K
    h = 1.0 / (n + 1)
    A = qtt_tridiagonal(K, 2.0 / h, -1.0 / h, -1.0 / h)
    M = qtt_tridiagonal(K, 4.0 * h / 6, h / 6, h / 6)
    u0 = pk.pad_rank(qtt_exponential(K, c=2.0), 8)
    dt, steps = 1e-4, 10
    u, res = evolve_theta(A, u0, dt, steps, theta=0.5, mass=M, spd=True)
    assert res[-1] < 1e-10

    Ad = (2 / h) * np.eye(n) + (-1 / h) * (
        np.diag(np.ones(n - 1), 1) + np.diag(np.ones(n - 1), -1)
    )
    Md = (4 * h / 6) * np.eye(n) + (h / 6) * (
        np.diag(np.ones(n - 1), 1) + np.diag(np.ones(n - 1), -1)
    )
    lin = _lin_perm(K)
    ud = np.zeros(n)
    ud[lin] = _dense_vec(u0)
    L = Md + 0.5 * dt * Ad
    R = Md - 0.5 * dt * Ad
    for _ in range(steps):
        ud = np.linalg.solve(L, R @ ud)
    uf = np.zeros(n)
    uf[lin] = _dense_vec(u)
    assert np.linalg.norm(uf - ud) / np.linalg.norm(ud) < 1e-6


@pytest.mark.parametrize("theta", [1.0, 0.5])
def test_evolve_with_constant_source(theta):
    """Inhomogeneous heat equation du/dt = -A u + f (constant f)
    matches the dense theta trajectory."""
    K = 5
    n = 2**K
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    u0 = pk.pad_rank(qtt_exponential(K, c=3.0), 8)
    f = qtt_exponential(K, c=-2.0)
    dt, steps = 0.05, 12
    u, res = evolve_theta(
        A, u0, dt, steps, theta=theta, source=f, spd=True
    )
    assert res[-1] < 1e-9

    Ad = _dense_heat(K)
    lin = _lin_perm(K)
    ud = np.zeros(n)
    ud[lin] = _dense_vec(u0)
    fd = np.zeros(n)
    fd[lin] = _dense_vec(f)
    L = np.eye(n) + theta * dt * Ad
    R = np.eye(n) - (1 - theta) * dt * Ad
    for _ in range(steps):
        ud = np.linalg.solve(L, R @ ud + dt * fd)
    uf = np.zeros(n)
    uf[lin] = _dense_vec(u)
    assert np.linalg.norm(uf - ud) / np.linalg.norm(ud) < 1e-6


def test_evolve_with_time_dependent_source():
    """Callable source f(t) = cos(t) f0 hits the theta quadrature
    points; Crank-Nicolson trajectory matches dense."""
    K = 5
    n = 2**K
    theta = 0.5
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    u0 = pk.pad_rank(qtt_exponential(K, c=3.0), 8)
    f0 = qtt_exponential(K, c=-2.0)
    dt, steps = 0.05, 10
    u, res = evolve_theta(
        A, u0, dt, steps, theta=theta,
        source=lambda t: pk.scale(f0, np.cos(t)), spd=True,
    )
    assert res[-1] < 1e-9

    Ad = _dense_heat(K)
    lin = _lin_perm(K)
    ud = np.zeros(n)
    ud[lin] = _dense_vec(u0)
    fd = np.zeros(n)
    fd[lin] = _dense_vec(f0)
    L = np.eye(n) + theta * dt * Ad
    R = np.eye(n) - (1 - theta) * dt * Ad
    for s in range(steps):
        g = dt * (
            theta * np.cos((s + 1) * dt) + (1 - theta) * np.cos(s * dt)
        )
        ud = np.linalg.solve(L, R @ ud + g * fd)
    uf = np.zeros(n)
    uf[lin] = _dense_vec(u)
    assert np.linalg.norm(uf - ud) / np.linalg.norm(ud) < 1e-6


def _dense_heat(K):
    n = 2**K
    return (
        2 * np.eye(n)
        - np.diag(np.ones(n - 1), 1)
        - np.diag(np.ones(n - 1), -1)
    )


def _dense_of(p, K):
    lin = _lin_perm(K)
    out = np.zeros(2**K)
    out[lin] = _dense_vec(p)
    return out


def test_tdvp_full_rank_is_exact():
    """At full bond rank the projector is the identity and the
    splitting telescopes: TDVP reproduces expm(-T A) u0 to roundoff
    for ANY dt (the Lubich-Oseledets exactness property)."""
    K = 4
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    u0 = pk.pad_rank(qtt_exponential(K, c=3.0), 4)
    dt, steps = 0.05, 10
    u, norms = evolve_tdvp(A, u0, dt, steps)
    ref = sla.expm(-dt * steps * _dense_heat(K)) @ _dense_of(u0, K)
    got = _dense_of(u, K)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-12
    # the reported norm history is the true state norm
    assert abs(norms[-1] - np.linalg.norm(ref)) < 1e-12


def test_tdvp_lanczos_path_matches_dense_path():
    """dense_limit=0 forces every local exponential through the jitted
    Lanczos expm@v; same trajectory to roundoff."""
    K = 4
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    u0 = pk.pad_rank(qtt_exponential(K, c=3.0), 4)
    u_d, _ = evolve_tdvp(A, u0, 0.05, 6)
    u_l, _ = evolve_tdvp(A, u0, 0.05, 6, dense_limit=0, krylov=20)
    ref, got = _dense_of(u_d, K), _dense_of(u_l, K)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-12


def test_tdvp_rank_limited_accuracy_and_rank_preservation():
    """Rank-4 TDVP on a 2^7 heat equation stays at the truncation
    level of the manifold and never grows the rank."""
    K = 7
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    u0 = pk.svd_round(pk.pad_rank(qtt_exponential(K, c=3.0), 4), 4)
    dt, steps = 0.02, 25
    u, _ = evolve_tdvp(A, u0, dt, steps)
    assert u.rank == 4
    ref = sla.expm(-dt * steps * _dense_heat(K)) @ _dense_of(u0, K)
    got = _dense_of(u, K)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 2e-4


def test_tdvp_skew_flow_preserves_norm():
    """A skew-symmetric generator (central advection) makes du/dt=-Au
    norm-preserving; the dense-exponential path reproduces that
    (Lanczos assumes symmetry, so keep dense_limit high)."""
    K = 4
    A = qtt_tridiagonal(K, 0.0, -1.0, 1.0)
    u0 = pk.pad_rank(qtt_exponential(K, c=3.0), 4)
    n0 = float(pk.norm_exact(u0))
    _, norms = evolve_tdvp(A, u0, 0.05, 12)
    assert abs(norms[-1] - n0) / n0 < 1e-12


def test_tdvp_fused_matches_host_loop():
    """The fused single-program step is the host loop's arithmetic,
    reorganized: trajectories agree to roundoff on both the dense and
    the Lanczos local-exponential paths."""
    K = 5
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    u0 = pk.svd_round(pk.pad_rank(qtt_exponential(K, c=3.0), 4), 4)
    for kw in ({}, {"dense_limit": 0, "krylov": 20}):
        u_f, n_f = evolve_tdvp(A, u0, 0.04, 5, fused=True, **kw)
        u_h, n_h = evolve_tdvp(A, u0, 0.04, 5, fused=False, **kw)
        ref = _dense_of(u_h, K)
        got = _dense_of(u_f, K)
        assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-12
        np.testing.assert_allclose(n_f, n_h, rtol=1e-12)


def test_tdvp_fused_callback_path():
    """With a callback the fused path steps one jitted program at a
    time; the observed trajectory equals the scan-over-steps one."""
    K = 4
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    u0 = pk.pad_rank(qtt_exponential(K, c=3.0), 4)
    seen = []
    u_cb, n_cb = evolve_tdvp(
        A, u0, 0.05, 4, callback=lambda s, u: seen.append(_dense_of(u, K))
    )
    u_sc, n_sc = evolve_tdvp(A, u0, 0.05, 4)
    assert len(seen) == 4
    np.testing.assert_allclose(n_cb, n_sc, rtol=1e-12)
    np.testing.assert_allclose(
        seen[-1], _dense_of(u_sc, K), rtol=0, atol=1e-12
    )


def test_tdvp_trajectory_is_differentiable():
    """tdvp_trajectory is a pure traced function: reverse-mode
    gradients of the final energy w.r.t. an operator coefficient AND
    the step size match central finite differences (adjoint
    sensitivities through the whole scan-of-steps program).  Full-rank
    non-overparameterized train (the QR pullback needs tall factors)."""
    import jax

    from tensor_networks_tpu.ops.packed import PackedTTOp

    K, r = 6, 2
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    rng = np.random.default_rng(0)
    u0 = pk.PackedTT(
        np.asarray(rng.standard_normal((2, r))),
        np.asarray(rng.standard_normal((K - 2, r, 2, r))) / np.sqrt(r),
        np.asarray(rng.standard_normal((r, 2))),
    )

    def loss(c, dtv):
        Ac = PackedTTOp(A.first * c, A.mids, A.last)
        _, _, obs = tdvp_trajectory(Ac, u0, dtv, 3, observables=(A,))
        return obs[-1, 0]

    gc, gdt = jax.grad(loss, argnums=(0, 1))(1.0, 0.05)
    eps = 1e-6
    fd_c = (loss(1.0 + eps, 0.05) - loss(1.0 - eps, 0.05)) / (2 * eps)
    fd_dt = (loss(1.0, 0.05 + eps) - loss(1.0, 0.05 - eps)) / (2 * eps)
    assert abs(float(gc) - float(fd_c)) / abs(float(fd_c)) < 1e-6
    assert abs(float(gdt) - float(fd_dt)) / abs(float(fd_dt)) < 1e-6
    # and the forward values match the public integrator
    u_r, n_r, o_r = tdvp_trajectory(A, u0, 0.05, 3, observables=(A,))
    u_p, n_p, o_p = evolve_tdvp(A, u0, 0.05, 3, observables=(A,))
    np.testing.assert_allclose(np.asarray(n_r), n_p, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(o_r)[:, 0], [t[0] for t in o_p], rtol=1e-12
    )
    np.testing.assert_allclose(
        _dense_of(pk.PackedTT(*map(np.asarray, u_r)), K),
        _dense_of(u_p, K), rtol=0, atol=1e-12,
    )


def test_tdvp2_grows_rank_to_exactness():
    """Two-site TDVP from a RANK-1 start with max_rank = the full bond
    dimension grows onto the exact manifold: the trajectory matches
    expm(-T A) u0 to roundoff, where one-site TDVP would be pinned to
    the (useless) rank-1 manifold."""
    K = 6
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    u0 = qtt_exponential(K, c=3.0)
    assert u0.rank == 1
    dt, steps = 0.05, 8
    u, norms, ranks = evolve_tdvp2(A, u0, dt, steps, max_rank=8)
    ref = sla.expm(-dt * steps * _dense_heat(K)) @ _dense_of(u0, K)
    got = _dense_of(u, K)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-11
    assert abs(norms[-1] - np.linalg.norm(ref)) < 1e-11
    assert ranks[-1] > 1  # growth actually happened
    assert max(ranks) <= 8


def test_tdvp2_beats_rank_frozen_tdvp1():
    """From the same low-rank start, the adaptive integrator is orders
    of magnitude closer to the true flow than the rank-frozen one."""
    K = 6
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    u0 = qtt_exponential(K, c=3.0)
    dt, steps = 0.05, 8
    ref = sla.expm(-dt * steps * _dense_heat(K)) @ _dense_of(u0, K)
    u1, _ = evolve_tdvp(A, u0, dt, steps)
    u2, _, _ = evolve_tdvp2(A, u0, dt, steps, max_rank=8)
    err1 = np.linalg.norm(_dense_of(u1, K) - ref) / np.linalg.norm(ref)
    err2 = np.linalg.norm(_dense_of(u2, K) - ref) / np.linalg.norm(ref)
    assert err2 < 1e-11
    assert err1 > 1e3 * err2  # rank-1 manifold cannot follow the flow


def test_tdvp2_eps_truncation_and_rank_reporting():
    """A spectral threshold keeps the effective ranks below the padded
    max while the trajectory stays at truncation-level accuracy; the
    Lanczos path agrees with the dense path."""
    K = 7
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    u0 = qtt_exponential(K, c=3.0)
    dt, steps = 0.02, 10
    u, _, ranks = evolve_tdvp2(A, u0, dt, steps, max_rank=10, eps=1e-6)
    ref = sla.expm(-dt * steps * _dense_heat(K)) @ _dense_of(u0, K)
    got = _dense_of(u, K)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-4
    assert all(r <= 10 for r in ranks)
    # dense/Lanczos agreement is bounded by SVD direction ambiguity at
    # the tiny retained singular values (each local apply agrees to
    # <1e-12; directions carrying ~1e-8 weight are ill-conditioned and
    # legitimately differ between the two equally-valid trajectories)
    u_l, _, _ = evolve_tdvp2(
        A, u0, dt, 3, max_rank=10, eps=1e-6, dense_limit=0, krylov=24
    )
    u_d, _, _ = evolve_tdvp2(A, u0, dt, 3, max_rank=10, eps=1e-6)
    ref3 = _dense_of(u_d, K)
    assert (
        np.linalg.norm(_dense_of(u_l, K) - ref3) / np.linalg.norm(ref3)
        < 1e-6
    )


def test_observables_inside_fused_trajectories():
    """Per-step expectations <u, O u> recorded INSIDE the fused
    trajectory programs match host-side computation; the identity
    observable reproduces the norm history squared; the heat-flow
    energy decays monotonically."""
    K = 5
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    u0 = pk.pad_rank(qtt_exponential(K, c=3.0), 4)
    eye = pk.ttop_identity(K, 2, u0.first.dtype)

    u_f, n_f, e_f = evolve_tdvp(A, u0, 0.04, 5, observables=(A, eye))
    seen = []
    evolve_tdvp(
        A, u0, 0.04, 5, fused=False,
        callback=lambda s, u: seen.append(
            float(pk.inner(u, pk.ttop_apply_packed(A, u)))
        ),
    )
    np.testing.assert_allclose([e[0] for e in e_f], seen, rtol=1e-10)
    np.testing.assert_allclose(
        [e[1] for e in e_f], [n**2 for n in n_f], rtol=1e-12
    )
    energies = [e[0] for e in e_f]
    assert all(b < a for a, b in zip(energies, energies[1:]))

    # two-site: fused vs host hook
    u2, n2, r2, e2 = evolve_tdvp2(
        A, u0, 0.04, 4, max_rank=6, observables=(A,)
    )
    _, _, _, e2h = evolve_tdvp2(
        A, u0, 0.04, 4, max_rank=6, fused=False, observables=(A,)
    )
    np.testing.assert_allclose(e2, e2h, rtol=1e-10)

    # theta integrator: host hook, same convention
    _, res3, e3 = evolve_theta(
        A, u0, 0.05, 3, observables=(A,), spd=True
    )
    assert len(e3) == 3 and all(len(t) == 1 for t in e3)


def test_tdvp2_fused_matches_host_loop():
    """The fused single-program two-site step is the host loop's
    arithmetic, reorganized: trajectories, norms, and reported
    effective ranks agree on both local-exponential paths, including
    rank GROWTH from a rank-1 start and eps truncation."""
    K = 5
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    u0 = qtt_exponential(K, c=3.0)
    for kw in (
        {},
        {"dense_limit": 0, "krylov": 24},
        {"eps": 1e-6},
    ):
        u_f, n_f, r_f = evolve_tdvp2(
            A, u0, 0.04, 4, max_rank=8, fused=True, **kw
        )
        u_h, n_h, r_h = evolve_tdvp2(
            A, u0, 0.04, 4, max_rank=8, fused=False, **kw
        )
        ref = _dense_of(u_h, K)
        got = _dense_of(u_f, K)
        assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-10
        np.testing.assert_allclose(n_f, n_h, rtol=1e-10)
        assert r_f == r_h


def test_tdvp2_fused_callback_path():
    """With a callback the fused path steps one jitted program at a
    time; the observed trajectory equals the scan-over-steps one and
    d=3 (no mid pairs — zero-length scans) works."""
    K = 3
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    u0 = qtt_exponential(K, c=3.0)
    seen = []
    u_cb, n_cb, r_cb = evolve_tdvp2(
        A, u0, 0.05, 4, max_rank=4,
        callback=lambda s, u: seen.append(_dense_of(u, K)),
    )
    u_sc, n_sc, r_sc = evolve_tdvp2(A, u0, 0.05, 4, max_rank=4)
    assert len(seen) == 4
    np.testing.assert_allclose(n_cb, n_sc, rtol=1e-12)
    assert r_cb == r_sc
    np.testing.assert_allclose(
        seen[-1], _dense_of(u_sc, K), rtol=0, atol=1e-12
    )


def test_tdvp2_fused_rejects_two_cores():
    """d=2 has no mid pairs to scan: explicit fused=True raises, the
    default silently keeps the host loop."""
    A = qtt_tridiagonal(2, 2.0, -1.0, -1.0)
    u0 = qtt_exponential(2, c=1.0)
    with pytest.raises(ValueError):
        evolve_tdvp2(A, u0, 0.1, 1, max_rank=4, fused=True)
    u, _, _ = evolve_tdvp2(A, u0, 0.1, 1, max_rank=4)  # host fallback
    assert np.isfinite(_dense_of(u, 2)).all()


def test_tdvp2_rejects_shrinking_max_rank():
    A = qtt_tridiagonal(4, 2.0, -1.0, -1.0)
    u0 = pk.pad_rank(qtt_exponential(4), 6)
    with pytest.raises(ValueError):
        evolve_tdvp2(A, u0, 0.1, 1, max_rank=4)


def test_evolve_rejects_explicit():
    A = qtt_tridiagonal(4, 2.0, -1.0, -1.0)
    u0 = qtt_exponential(4)
    with pytest.raises(ValueError):
        evolve_theta(A, u0, 0.1, 1, theta=0.0)
    with pytest.raises(ValueError):
        evolve_theta(A, u0, 0.1, 1, theta=1.5)
