"""The ALS (one-site DMRG) TT linear solver: oracle parity and
convergence behavior.  No reference counterpart (pytens has GMRES
only); the dense oracle is the ground truth."""

import jax.numpy as jnp
import numpy as np
import pytest

import tensor_networks_tpu as tnt
from tensor_networks_tpu.ops import packed as pk
from tensor_networks_tpu.ops.als import als_solve


def _dense_op(op_net, ins, outs):
    """Materialize a TT-operator network as an (n^d, n^d) matrix."""
    t = op_net.contract()
    perm = [t.indices.index(i) for i in (*outs, *ins)]
    n_out = int(np.prod([i.size for i in outs]))
    return np.transpose(np.asarray(t.value), perm).reshape(n_out, -1)


def _setup(seed=3, d=4, n=6, spd=True):
    rng = np.random.RandomState(seed)
    # rand_tt draws from the GLOBAL np.random stream — pin it so the
    # rhs/x0 draws (and with them the convergence plateau each test
    # asserts on) do not depend on which tests ran before this one
    np.random.seed(seed + 7000)
    ins = [tnt.Index(f"x{i}", n) for i in range(d)]
    outs = [tnt.Index(f"y{i}", n) for i in range(d)]
    if spd:
        mats = []
        for _ in range(d):
            g = rng.randn(n, n)
            mats.append(0.3 * (g + g.T) / (2 * np.sqrt(n)))
    else:
        mats = [0.3 * rng.randn(n, n) / np.sqrt(n) for _ in range(d)]
    summands = [[np.eye(n) for _ in range(d)], mats]
    op = tnt.ttop_sum(ins, outs, summands, "A")
    cores = [np.asarray(op.value(i)) for i in range(d)]
    packed_op = pk.PackedTTOp(
        jnp.asarray(cores[0], jnp.float64),
        jnp.asarray(np.stack(cores[1:-1]), jnp.float64),
        jnp.asarray(cores[-1], jnp.float64),
    )
    rhs = tnt.TensorNetwork.rand_tt(ins, [3] * (d - 1))
    x0 = tnt.TensorNetwork.rand_tt(ins, [4] * (d - 1))
    return op, packed_op, rhs, x0, ins, outs


@pytest.mark.slow
def test_als_solve_matches_dense_oracle():
    """On an SPD-dominant operator the Galerkin ALS at sufficient rank
    must reproduce the dense solve."""
    op, packed_op, rhs, x0, ins, outs = _setup(spd=True)
    rhs_p = pk.pack(rhs, jnp.float64)
    x0_p = pk.pad_rank(pk.pack(x0, jnp.float64), 12)

    x, res, hist = als_solve(
        packed_op, rhs_p, x0_p, sweeps=15, tol=1e-10
    )
    rhs_norm = float(pk.norm_exact(rhs_p))
    assert res / rhs_norm < 1e-8
    assert hist[-1] == res

    # against the dense ground truth
    a_mat = _dense_op(op, ins, outs)
    b_vec = np.asarray(rhs.contract().value).reshape(-1)
    x_true = np.linalg.solve(a_mat, b_vec)
    x_got = np.asarray(
        pk.unpack(x).contract().value
    ).reshape(-1)
    assert np.linalg.norm(x_got - x_true) < 1e-7 * np.linalg.norm(x_true)


def test_als_solve_general_operator():
    """Nonsymmetric diagonally-dominant operator: ALS with the
    normal-equation local solves still reaches the GMRES accuracy bar."""
    _, packed_op, rhs, x0, _, _ = _setup(spd=False)
    rhs_p = pk.pack(rhs, jnp.float64)
    x0_p = pk.pad_rank(pk.pack(x0, jnp.float64), 8)
    x, res, _ = als_solve(packed_op, rhs_p, x0_p, sweeps=20, tol=1e-9)
    assert res / float(pk.norm_exact(rhs_p)) < 1e-5


def test_als_fused_matches_host_loop():
    """The fused single-program sweep is the host loop's arithmetic,
    reorganized.  On structurally FULL-RANK trains the two paths agree
    to roundoff (identical histories and solutions, dense and CG local
    paths).  On padded trains the cores are rank-deficient, so the QR
    null-space gauge is arbitrary and XLA picks it differently inside
    the fused program — there the contract is equal convergence
    quality, not bitwise parity."""
    from tensor_networks_tpu.ops.qtt import (
        qtt_exponential,
        qtt_tridiagonal,
    )

    # full-rank start: exact parity on the dense and CG local paths
    _, packed_op, rhs, x0, _, _ = _setup(spd=True)
    rhs_p = pk.pack(rhs, jnp.float64)
    x0_p = pk.pack(x0, jnp.float64)  # rank 4, no padding
    for kw in ({}, {"dense_limit": 0, "spd": True, "cg_iters": 400}):
        x_f, res_f, h_f = als_solve(
            packed_op, rhs_p, x0_p, sweeps=4, tol=0.0, fused=True, **kw
        )
        x_h, res_h, h_h = als_solve(
            packed_op, rhs_p, x0_p, sweeps=4, tol=0.0, fused=False, **kw
        )
        np.testing.assert_allclose(h_f, h_h, rtol=1e-9)
        d_f = np.asarray(pk.unpack(x_f).contract().value).reshape(-1)
        d_h = np.asarray(pk.unpack(x_h).contract().value).reshape(-1)
        assert (
            np.linalg.norm(d_f - d_h) < 1e-10 * np.linalg.norm(d_h)
        )

    # padded QTT system (rank 8 > end-bond mode products: warm_ok
    # varies along the train and cores are rank-deficient): both paths
    # must converge equally well even though the gauge differs
    K = 6
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    b = pk.pad_rank(qtt_exponential(K, c=3.0), 8)
    z0 = pk.pad_rank(qtt_exponential(K, c=-1.0), 8)
    _, res_f, h_f = als_solve(
        A, b, z0, sweeps=3, tol=0.0, spd=True, fused=True
    )
    _, res_h, h_h = als_solve(
        A, b, z0, sweeps=3, tol=0.0, spd=True, fused=False
    )
    bn = float(pk.norm_exact(b))
    assert res_f / bn < 1e-10 and res_h / bn < 1e-10


def test_als_warm_start_preserved():
    """Canonicalization must not change the represented tensor: one
    sweep from a converged x0 stays converged (the R factors are
    absorbed, not discarded)."""
    _, packed_op, rhs, x0, _, _ = _setup(spd=True)
    rhs_p = pk.pack(rhs, jnp.float64)
    x_conv, res_conv, _ = als_solve(
        packed_op, rhs_p, pk.pad_rank(pk.pack(x0, jnp.float64), 12),
        sweeps=15, tol=1e-10,
    )
    rhs_norm = float(pk.norm_exact(rhs_p))
    assert res_conv / rhs_norm < 1e-8
    _, res_again, _ = als_solve(
        packed_op, rhs_p, x_conv, sweeps=1, tol=0.0
    )
    assert res_again <= max(res_conv * 2.0, 1e-12 * rhs_norm)


def test_als_monotone_progress_and_rank_restart():
    """The residual history is (weakly) decreasing after the first
    sweep, and a pad_rank warm restart improves a rank-starved solve."""
    _, packed_op, rhs, x0, _, _ = _setup(spd=True)
    rhs_p = pk.pack(rhs, jnp.float64)
    lean = pk.pack(x0, jnp.float64)  # rank 4: not enough
    x_lean, res_lean, _ = als_solve(
        packed_op, rhs_p, lean, sweeps=8, tol=0.0
    )
    x_rich, res_rich, hist = als_solve(
        packed_op, rhs_p, pk.pad_rank(x_lean, 8), sweeps=8, tol=0.0
    )
    assert res_rich < res_lean
    assert all(b <= a * 1.01 for a, b in zip(hist, hist[1:]))


def test_cg_path_matches_dense_on_singular_locals():
    """Warm-start regression pin: a QTT system at a rank that
    overparameterizes the end bonds (singular local systems) must
    converge through the CG path exactly like the dense path.

    Before the warm_ok gate, warm-started CG preserved the null(H)
    component of the previous core — every LOCAL residual at 1e-15 yet
    the sweep stalled at rel ~1.4e-2 (the junk enters the bond basis at
    the orthogonalization step).  From x0=0 the Krylov space stays in
    range(H), which is the lstsq minimum-norm solution."""
    from tensor_networks_tpu.ops.qtt import (
        qtt_exponential,
        qtt_screened_laplacian,
    )

    K = 6
    op = qtt_screened_laplacian(K, delta=1.0)
    rhs = qtt_exponential(K, c=3.0)
    b = float(pk.norm_exact(rhs))
    for spd in (False, True):
        x, res, h = als_solve(
            op, rhs, pk.pad_rank(rhs, 6), sweeps=6, tol=1e-12,
            dense_limit=0, cg_iters=1000, spd=spd,
        )
        assert res / b < 1e-10, (spd, res / b)


def test_spd_local_solve_matches_general():
    """spd=True (plain CG on the SPD Galerkin projection) reaches the
    same solution as the normal-equation path on an SPD operator."""
    op, packed_op, rhs, x0, ins, outs = _setup(spd=True)
    rhs_p = pk.pack(rhs, jnp.float64)
    # diagonal dominance: the Galerkin projection of I + 0.3*sym is SPD
    x0_p = pk.pad_rank(pk.pack(x0, jnp.float64), 8)
    b = float(pk.norm_exact(rhs_p))
    xs = []
    for spd in (False, True):
        x, res, _ = als_solve(
            packed_op, rhs_p, x0_p, sweeps=8, tol=1e-10,
            dense_limit=0, cg_iters=500, spd=spd,
        )
        # the plateau is the rank-8 representation limit (varies with
        # the globally-seeded random rhs, ~1e-7 class), not a CG limit
        assert res / b < 1e-5, (spd, res / b)
        xs.append(x)
    # the real claim: both local-solve formulations land on the SAME
    # fixed point
    diff = pk.add(xs[0], pk.scale(xs[1], -1.0))
    assert float(pk.norm_exact(diff)) / b < 1e-6


def test_adaptive_enrichment_accelerates():
    """AMEn-style residual enrichment must converge at least as fast
    (in sweeps) as inert zero padding on a 3-axis interleaved QTT
    system, reaching the same final accuracy."""
    from tensor_networks_tpu.ops.als import als_solve_adaptive
    from tensor_networks_tpu.ops.qtt import (
        qtt_exponential_nd,
        qtt_screened_laplacian_nd,
    )

    op = qtt_screened_laplacian_nd(3, 3, delta=1.0)
    rhs = qtt_exponential_nd(3, (2.0, 3.0, 1.5))
    b = float(pk.norm_exact(rhs))
    runs = {}
    for enrich in (False, True):
        x, res, hist = als_solve_adaptive(
            op, rhs, eps=1e-10, rank=2, max_rank=16,
            sweeps_per_rank=2, enrich=enrich,
        )
        assert res / b < 1e-10, (enrich, res / b)
        runs[enrich] = hist
    assert len(runs[True]) <= len(runs[False])
    # enrichment changes only the SPAN of the new directions, never the
    # represented iterate: both runs end at the dense-accurate solution
    assert runs[True][-1] / b < 1e-10
