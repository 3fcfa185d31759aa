"""The one-site DMRG eigensolver (ops/eigen.py): analytic and dense
oracles, Rayleigh monotonicity, and adaptive rank growth.  No
reference counterpart (pytens has no eigensolver)."""

import jax.numpy as jnp
import numpy as np

import tensor_networks_tpu as tnt
from tensor_networks_tpu.ops import packed as pk
from tensor_networks_tpu.ops.eigen import als_eigsh, als_eigsh_adaptive
from tensor_networks_tpu.ops.qtt import (
    qtt_exponential,
    qtt_exponential_nd,
    qtt_screened_laplacian,
    qtt_screened_laplacian_nd,
)


def _trid_min(n, delta):
    m = (2.0 + delta) * np.eye(n)
    m -= np.diag(np.ones(n - 1), 1)
    m -= np.diag(np.ones(n - 1), -1)
    return np.linalg.eigvalsh(m)[0]


def test_eigsh_1d_matches_dense():
    """Ground state of the K=8 screened Laplacian to machine precision,
    unit-norm eigenvector, monotone Rayleigh descent."""
    K, delta = 8, 0.5
    op = qtt_screened_laplacian(K, delta=delta)
    x, lam, hist = als_eigsh(op, pk.pad_rank(qtt_exponential(K), 4),
                             sweeps=8)
    assert abs(lam - _trid_min(2**K, delta)) < 1e-12
    assert abs(float(pk.norm_exact(x)) - 1.0) < 1e-12
    assert all(hist[i + 1] <= hist[i] + 1e-12 for i in range(len(hist) - 1))


def test_eigsh_3d_kron_oracle():
    """3-axis interleaved Laplacian: the ground energy is the sum of
    the per-axis tridiagonal minima (Kronecker-sum spectrum)."""
    op3 = qtt_screened_laplacian_nd(2, 3, delta=1.0)
    x0 = pk.pad_rank(qtt_exponential_nd(2, (1.0, 2.0, 3.0)), 8)
    x, lam, _ = als_eigsh(op3, x0, sweeps=10)
    ref = _trid_min(4, 1.0) + 2 * _trid_min(4, 0.0)
    assert abs(lam - ref) < 1e-12


def test_eigsh_random_spd_matches_dense_eigh():
    """Random SPD-dominant operator sum: eigenvalue AND eigenvector
    against the dense eigh, including overparameterized end bonds
    (rank 8 on a d=4 mode-6 train — the dead-coordinate shift must
    keep the spurious zero modes out of the spectral window)."""
    rng = np.random.RandomState(7)
    d, n = 4, 6
    ins = [tnt.Index(f"x{i}", n) for i in range(d)]
    outs = [tnt.Index(f"y{i}", n) for i in range(d)]
    mats = []
    for _ in range(d):
        g = rng.randn(n, n)
        mats.append(0.3 * (g + g.T) / (2 * np.sqrt(n)))
    opn = tnt.ttop_sum(ins, outs, [[np.eye(n)] * d, mats], "E")
    op = pk.pack_ttop(opn, outs, ins, dtype=jnp.float64)

    # deterministic start (rand_tt draws from the GLOBAL numpy RNG,
    # whose state depends on test order)
    x0 = pk.PackedTT(
        jnp.asarray(rng.randn(n, 8)),
        jnp.asarray(rng.randn(d - 2, 8, n, 8)),
        jnp.asarray(rng.randn(8, n)),
    )
    x, lam, _ = als_eigsh(op, x0, sweeps=12)

    # dense oracle
    A = None
    for s, summand in enumerate([[np.eye(n)] * d, mats]):
        term = summand[0]
        for m in summand[1:]:
            term = np.kron(term, m)
        A = term if A is None else A + term
    w, v = np.linalg.eigh(A)
    assert abs(lam - w[0]) < 1e-9, (lam, w[0])
    u = np.asarray(pk.unpack(x).contract().value).reshape(-1)
    overlap = abs(u @ v[:, 0]) / np.linalg.norm(u)
    assert overlap > 1 - 1e-8, overlap


def test_eigsh_adaptive_enrichment_converges():
    """Adaptive rank growth with residual enrichment reaches the exact
    ground pair from rank 2."""
    op3 = qtt_screened_laplacian_nd(2, 3, delta=1.0)
    x0 = pk.pad_rank(qtt_exponential_nd(2, (1.0, 2.0, 3.0)), 2)
    x, lam, _ = als_eigsh_adaptive(op3, x0, eps=1e-8, max_rank=16)
    ref = _trid_min(4, 1.0) + 2 * _trid_min(4, 0.0)
    assert abs(lam - ref) < 1e-10
    resid = pk.add(pk.ttop_apply_packed(op3, x), pk.scale(x, -lam))
    assert float(pk.norm_exact(resid)) < 1e-8 * abs(lam)


def test_eigsh_overparameterized_bonds_regression():
    """Regression pin for the non-isometric-frame trap: rank 6 on a
    K=6 train (end bonds structurally <= 2) oscillated over half the
    spectrum when the local metric was assumed identity — the Gram-
    whitened generalized solve must be monotone and exact."""
    K, delta = 6, 0.3
    op = qtt_screened_laplacian(K, delta=delta)
    x0 = pk.pad_rank(qtt_exponential(K, c=2.0), 6)
    x, lam, hist = als_eigsh(op, x0, sweeps=12)
    assert abs(lam - _trid_min(2**K, delta)) < 1e-12
    assert all(hist[i + 1] <= hist[i] + 1e-12 for i in range(len(hist) - 1))
    assert abs(float(pk.norm_exact(x)) - 1.0) < 1e-10


def test_eigsh_fused_matches_host_loop():
    """The fused single-program sweep against the host loop: identical
    Rayleigh histories on the padded ground-state config (the descent
    path is gauge-independent even where the whitened local bases are
    not), and equal eigenvalues with deflation and with a mass
    matrix."""
    K, delta = 6, 0.3
    op = qtt_screened_laplacian(K, delta=delta)
    x0 = pk.pad_rank(qtt_exponential(K, c=2.0), 6)
    x_f, lam_f, h_f = als_eigsh(op, x0, sweeps=6, tol=0.0, fused=True)
    x_h, lam_h, h_h = als_eigsh(op, x0, sweeps=6, tol=0.0, fused=False)
    assert abs(lam_f - lam_h) < 1e-12 * abs(lam_h)
    np.testing.assert_allclose(h_f, h_h, rtol=1e-8)

    # deflation (one shared-rank train) through the fused pen envs
    x2_f, l2_f, _ = als_eigsh(
        op, x0, sweeps=10, deflate=(x_f,), fused=True
    )
    x2_h, l2_h, _ = als_eigsh(
        op, x0, sweeps=10, deflate=(x_h,), fused=False
    )
    assert abs(l2_f - l2_h) < 1e-10 * abs(l2_h)
    assert abs(float(pk.inner(x2_f, x_f))) < 1e-9


def test_eigsh_k_deflated_excited_states():
    """The three lowest eigenpairs by penalty deflation: eigenvalues at
    machine precision against the dense spectrum, pairwise orthogonal
    eigenvectors — even from a start dominated by the ground state."""
    from tensor_networks_tpu.ops.eigen import als_eigsh_k

    K, delta = 6, 0.3
    op = qtt_screened_laplacian(K, delta=delta)
    n = 2**K
    A = (2.0 + delta) * np.eye(n)
    A -= np.diag(np.ones(n - 1), 1)
    A += -np.diag(np.ones(n - 1), -1)
    ref = np.linalg.eigvalsh(A)[:3]
    x0 = pk.pad_rank(qtt_exponential(K, c=2.0), 6)
    vecs, vals = als_eigsh_k(op, x0, 3, sweeps=12)
    for v, r in zip(vals, ref):
        assert abs(v - r) < 1e-11, (v, r)
    for i in range(3):
        for j in range(i + 1, 3):
            assert abs(float(pk.inner(vecs[i], vecs[j]))) < 1e-10


def test_eigsh_k_slots_compile_once_and_match():
    """Zero-filled deflation slots keep ONE fused-sweep program shape
    across all k eigenpairs (a zero train's penalty is exactly zero),
    where the growing-stack form traces one program per deflation
    count; eigenvalues agree to roundoff."""
    from tensor_networks_tpu.ops.eigen import _eig_loop_fused, als_eigsh_k

    K, delta = 5, 0.3
    op = qtt_screened_laplacian(K, delta=delta)
    x0 = pk.pad_rank(qtt_exponential(K, c=2.0), 4)
    before = _eig_loop_fused._cache_size()
    _, vals = als_eigsh_k(op, x0, 3, sweeps=8)
    grew = _eig_loop_fused._cache_size() - before
    assert grew <= 1, f"slots path traced {grew} programs"
    before = _eig_loop_fused._cache_size()
    _, vals2 = als_eigsh_k(op, x0, 3, sweeps=8, slots=False)
    grew2 = _eig_loop_fused._cache_size() - before
    assert grew2 >= 2, f"expected per-J traces without slots, got {grew2}"
    np.testing.assert_allclose(vals, vals2, rtol=1e-9, atol=1e-11)

    n = 2**K
    A = (2.0 + delta) * np.eye(n)
    A -= np.diag(np.ones(n - 1), 1)
    A += -np.diag(np.ones(n - 1), -1)
    ref = np.linalg.eigvalsh(A)[:3]
    for v, r in zip(vals, ref):
        assert abs(v - r) < 1e-10, (v, r)


def test_eigsh_generalized_fem_sturm_liouville():
    """Generalized problem A v = lam M v: 1D FEM stiffness/mass pair
    (qtt_tridiagonal) against scipy's dense generalized eigh — the
    ground eigenvalue approximates pi^2; eigenvectors come out
    M-normalized and M-orthogonal under deflation."""
    import scipy.linalg as sla

    from tensor_networks_tpu.ops.eigen import als_eigsh_k
    from tensor_networks_tpu.ops.qtt import qtt_tridiagonal

    K = 6
    n = 2**K
    h = 1.0 / (n + 1)
    A = qtt_tridiagonal(K, 2.0 / h, -1.0 / h, -1.0 / h)
    M = qtt_tridiagonal(K, 4.0 * h / 6, h / 6, h / 6)
    Ad = (2 / h) * np.eye(n) + (-1 / h) * (
        np.diag(np.ones(n - 1), 1) + np.diag(np.ones(n - 1), -1)
    )
    Md = (4 * h / 6) * np.eye(n) + (h / 6) * (
        np.diag(np.ones(n - 1), 1) + np.diag(np.ones(n - 1), -1)
    )
    refs = sla.eigh(Ad, Md, eigvals_only=True)[:3]
    assert abs(refs[0] - np.pi**2) < 2e-3  # the discretization itself

    x0 = pk.pad_rank(qtt_exponential(K, c=1.0), 6)
    x, lam, hist = als_eigsh(A, x0, sweeps=10, mass=M)
    assert abs(lam - refs[0]) < 1e-9
    mnorm = float(pk.inner(x, pk.ttop_apply_packed(M, x)))
    assert abs(mnorm - 1.0) < 1e-9
    assert all(hist[i + 1] <= hist[i] + 1e-9 for i in range(len(hist) - 1))

    vecs, vals = als_eigsh_k(A, x0, 3, sweeps=10, mass=M)
    for v, r in zip(vals, refs):
        assert abs(v - r) < 1e-9, (v, r)
    for i in range(3):
        for j in range(i + 1, 3):
            mij = float(
                pk.inner(vecs[i], pk.ttop_apply_packed(M, vecs[j]))
            )
            assert abs(mij) < 1e-9


def test_eigsh_f32_whitener_cutoff():
    """Regression pin for the dtype-scaled whitener cutoff: in f32 a
    hard-coded 1e-12 rank gate let Gram noise (~1e-7) through, 1/sqrt
    amplified it, and the sweep converged to lam=1.2999998 instead of
    0.302336 (the device path is f32-only)."""
    K, delta = 6, 0.3
    op = qtt_screened_laplacian(K, delta=delta, dtype=jnp.float32)
    x0 = pk.pad_rank(qtt_exponential(K, dtype=jnp.float32), 6)
    x, lam, hist = als_eigsh(op, x0, sweeps=12)
    assert abs(lam - _trid_min(2**K, delta)) < 1e-5, lam
    assert all(hist[i + 1] <= hist[i] + 1e-4 for i in range(len(hist) - 1))


def test_eigsh_adaptive_generalized_residual():
    """als_eigsh_adaptive with a mass matrix must measure the
    GENERALIZED residual |A x - lam M x| — the identity residual never
    converges, burning rank to the ceiling on every run."""
    from tensor_networks_tpu.ops.eigen import als_eigsh_adaptive
    from tensor_networks_tpu.ops.qtt import qtt_tridiagonal

    K = 5
    n = 2**K
    h = 1.0 / (n + 1)
    A = qtt_tridiagonal(K, 2.0 / h, -1.0 / h, -1.0 / h)
    M = qtt_tridiagonal(K, 4.0 * h / 6, h / 6, h / 6)
    x0 = pk.pad_rank(qtt_exponential(K, c=1.0), 4)
    x, lam, _ = als_eigsh_adaptive(A, x0, eps=1e-6, max_rank=16, mass=M)
    r = pk.add(
        pk.ttop_apply_packed(A, x),
        pk.scale(pk.ttop_apply_packed(M, x), -lam),
    )
    assert float(pk.norm_exact(r)) / abs(lam) < 1e-6
    assert x.rank == 4  # converged WITHOUT burning rank to the ceiling


def test_eigsh_k_merges_user_deflate():
    """A caller-supplied deflate= (find pairs above already-known
    eigenvectors) merges with the internally found ones instead of
    raising a duplicate-keyword TypeError."""
    from tensor_networks_tpu.ops.eigen import als_eigsh_k

    K, delta = 6, 0.3
    op = qtt_screened_laplacian(K, delta=delta)
    x0 = pk.pad_rank(qtt_exponential(K, c=2.0), 6)
    v1, _, _ = als_eigsh(op, x0, sweeps=10)
    vecs, vals = als_eigsh_k(op, x0, 2, sweeps=10, deflate=(v1,))
    n = 2**K
    A = (2.0 + delta) * np.eye(n)
    A -= np.diag(np.ones(n - 1), 1)
    A -= np.diag(np.ones(n - 1), -1)
    ref = np.linalg.eigvalsh(A)[:3]
    assert abs(vals[0] - ref[1]) < 1e-11
    assert abs(vals[1] - ref[2]) < 1e-11


def test_eigsh_lanczos_locals_match_dense():
    """MXU-scale local-solve path (round 5): forcing every local
    problem through the matrix-free warm-started Lanczos solver
    (``dense_limit=0``) reproduces the dense whitened-eigh ground
    state on the K=6 screened Laplacian — fused AND host loops.  At
    production ranks (r=64: m=8192 local unknowns) the dense eigh is
    ~m^3-infeasible on TPU, so this path is the r>=64 eigsh engine."""
    K, delta = 6, 1.0
    op = qtt_screened_laplacian(K, delta=delta)
    x0 = pk.pad_rank(qtt_exponential(K, c=3.0), 8)
    ref = _trid_min(2**K, delta)
    for fused in (True, False):
        x, lam, hist = als_eigsh(
            op, x0, sweeps=10, dense_limit=0, lanczos_iters=48,
            fused=fused,
        )
        assert abs(lam - ref) < 1e-6, (fused, lam, ref)
        assert abs(float(pk.norm_exact(x)) - 1.0) < 1e-8


def test_eigsh_lanczos_breakdown_is_masked():
    """Happy breakdown: Lanczos budgets far above the alive subspace
    dimension must not let decoupled zero blocks contaminate the
    minimum Ritz pair (the valid-chain masking in
    ``_local_ground_state_lanczos``)."""
    K = 4
    op = qtt_screened_laplacian(K, delta=0.5)
    x0 = pk.pad_rank(qtt_exponential(K), 4)
    # iters far above every local dimension -> guaranteed breakdown
    x, lam, _ = als_eigsh(op, x0, sweeps=6, dense_limit=0,
                          lanczos_iters=96)
    assert abs(lam - _trid_min(2**K, 0.5)) < 1e-8
