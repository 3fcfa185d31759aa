"""QTT screened-Poisson construction + solve (examples/qtt_screened_poisson).

Dense oracles at small K pin the rank-3 operator automaton and the
rank-1 exponential right-hand side exactly; the ALS solve is then
checked against ``np.linalg.solve`` on the densified system.
"""

import numpy as np
import pytest

from tensor_networks_tpu.ops.qtt import (
    qtt_exponential,
    qtt_screened_laplacian,
)


def _dense_op(op, K):
    """Densify a PackedTTOp over K binary modes into a 2^K x 2^K matrix
    (little-endian bits: core 0 = least significant)."""
    cores = [np.asarray(op.first)[None]] + [
        np.asarray(c) for c in op.mids
    ] + [np.asarray(op.last)[..., None]]
    # accumulate with output/input bits in core order
    acc = cores[0]  # (R0=1 absorbed later) shape (1, 2, 2, R)
    mat = acc
    for c in cores[1:]:
        # mat: (1, O, I, R); c: (R, 2, 2, R2)
        mat = np.einsum("aoir,rpjs->aopijs", mat, c)
        s = mat.shape
        mat = mat.reshape(s[0], s[1] * s[2], s[3] * s[4], s[5])
    # positions in `full` have the core-0 bit as the SLOWEST axis
    # (reshape stacks earlier cores slower); _perm_to_linear maps a
    # position to its linear grid index
    return mat[0, :, :, 0]


def _dense_vec(x, K):
    cores = [np.asarray(x.first)[None]] + [np.asarray(c) for c in x.mids] + [
        np.asarray(x.last)[..., None]
    ]
    vec = cores[0]  # (1, 2, R)
    for c in cores[1:]:
        vec = np.einsum("air,rjs->aijs", vec, c)
        s = vec.shape
        vec = vec.reshape(s[0], s[1] * s[2], s[3])
    return vec[0, :, 0]


def _perm_to_linear(K):
    """Map position in the densified (core-0-slowest) layout to the
    linear index i = sum b_k 2^k."""
    n = 2**K
    out = np.zeros(n, dtype=int)
    for pos in range(n):
        # decode pos: core 0 is the slowest (most significant) axis
        rem = pos
        bits = []
        for _ in range(K):
            bits.append(rem % 2)
            rem //= 2
        bits = bits[::-1]  # bits[0] = core-0 bit
        out[pos] = sum(b << k for k, b in enumerate(bits))
    return out


@pytest.mark.parametrize("K", [4, 7])
def test_operator_matches_dense_tridiagonal(K):
    delta = 0.7
    op = qtt_screened_laplacian(K, delta=delta)
    full = _dense_op(op, K)
    lin = _perm_to_linear(K)
    n = 2**K
    # reorder densified positions to linear indices
    A = np.zeros((n, n))
    A[np.ix_(lin, lin)] = full
    ref = (2.0 + delta) * np.eye(n)
    ref -= np.diag(np.ones(n - 1), 1)  # -S: (Su)_i = u_{i+1}
    ref -= np.diag(np.ones(n - 1), -1)
    assert np.allclose(A, ref, atol=1e-12), np.abs(A - ref).max()


def test_rhs_matches_dense_exponential():
    K, c = 6, 3.0
    rhs = qtt_exponential(K, c=c)
    vec = _dense_vec(rhs, K)
    lin = _perm_to_linear(K)
    n = 2**K
    f = np.zeros(n)
    f[lin] = vec
    ref = np.exp(-c * np.arange(n) / n)
    assert np.allclose(f, ref, atol=1e-14)


def test_als_solves_to_dense_oracle():
    from tensor_networks_tpu.ops.als import als_solve
    from tensor_networks_tpu.ops.packed import norm_exact, pad_rank

    K, delta, c = 8, 1.0, 3.0
    op = qtt_screened_laplacian(K, delta=delta)
    rhs = qtt_exponential(K, c=c)
    x, resid, _ = als_solve(op, rhs, pad_rank(rhs, 8), sweeps=4, tol=1e-12)
    rel = float(resid) / float(norm_exact(rhs))
    assert rel < 1e-10, rel

    n = 2**K
    lin = _perm_to_linear(K)
    A = np.zeros((n, n))
    full = _dense_op(op, K)
    A[np.ix_(lin, lin)] = full
    f = np.zeros(n)
    f[lin] = _dense_vec(rhs, K)
    u_ref = np.linalg.solve(A, f)
    u = np.zeros(n)
    u[lin] = _dense_vec(x, K)
    assert np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref) < 1e-9


def test_2d_operator_matches_kron_oracle():
    """The interleaved-bit 2D operator (rank-6 via ttop_add of two 1D
    automata) must densify to Ax (x) I + I (x) Ay exactly."""
    from tensor_networks_tpu.ops.qtt import qtt_screened_laplacian_2d

    K, delta = 3, 0.9
    op2 = qtt_screened_laplacian_2d(K, delta=delta)
    full = _dense_op(op2, 2 * K)  # positions: core 0 slowest
    n = 2**K

    # map densified position -> (x, y): even cores are x bits, odd y
    N = 4**K
    lin_x = np.zeros(N, dtype=int)
    lin_y = np.zeros(N, dtype=int)
    for pos in range(N):
        rem = pos
        bits = []
        for _ in range(2 * K):
            bits.append(rem % 2)
            rem //= 2
        bits = bits[::-1]  # bits[p] = core-p bit
        lin_x[pos] = sum(bits[2 * k] << k for k in range(K))
        lin_y[pos] = sum(bits[2 * k + 1] << k for k in range(K))

    def lap1d(d):
        a = (2.0 + d) * np.eye(n)
        a -= np.diag(np.ones(n - 1), 1)
        a -= np.diag(np.ones(n - 1), -1)
        return a

    ref_big = np.kron(lap1d(delta), np.eye(n)) + np.kron(
        np.eye(n), lap1d(0.0)
    )  # indexed by (x * n + y)
    got = np.zeros((N, N))
    for p in range(N):
        for q in range(N):
            got[lin_x[p] * n + lin_y[p], lin_x[q] * n + lin_y[q]] = full[
                p, q
            ]
    assert np.allclose(got, ref_big, atol=1e-12), np.abs(
        got - ref_big
    ).max()


def test_2d_als_solves_to_dense_oracle():
    from tensor_networks_tpu.ops.als import als_solve
    from tensor_networks_tpu.ops.packed import norm_exact, pad_rank

    from tensor_networks_tpu.ops.qtt import (
        qtt_exponential_2d,
        qtt_screened_laplacian_2d,
    )

    K = 4
    op2 = qtt_screened_laplacian_2d(K, delta=1.0)
    rhs2 = qtt_exponential_2d(K)
    x, resid, _ = als_solve(op2, rhs2, pad_rank(rhs2, 16), sweeps=6,
                            tol=1e-12)
    rel = float(resid) / float(norm_exact(rhs2))
    assert rel < 1e-9, rel


def test_als_warns_when_cg_local_solves_stall():
    """Rank 24 on a 2^4-per-axis 2D system pushes the local systems
    (24*2*24 = 1152 unknowns) past dense_limit onto CG-on-normal-
    equations, which stalls — als_solve must say so instead of
    silently burning sweeps (the exact residual is still reported)."""
    import warnings as _w

    import pytest as _pytest

    from tensor_networks_tpu.ops.als import als_solve
    from tensor_networks_tpu.ops.packed import pad_rank

    from tensor_networks_tpu.ops.qtt import (
        qtt_exponential_2d,
        qtt_screened_laplacian_2d,
    )

    op2 = qtt_screened_laplacian_2d(4, delta=1.0)
    rhs2 = qtt_exponential_2d(4)
    with _pytest.warns(RuntimeWarning, match="dense_limit"):
        x, resid, hist = als_solve(
            op2, rhs2, pad_rank(rhs2, 24), sweeps=6, tol=1e-12
        )
    # the warning fires once but the requested sweeps are honored
    # (legitimately slow convergence must not be cut short)
    assert len(hist) == 6


def test_gmres_packed_on_qtt_system():
    """The all-device Krylov solver handles the rank-3 QTT operator
    (complements the ALS lane; dense oracle at K=6)."""
    from tensor_networks_tpu.ops.packed import (
        gmres_packed,
        norm_exact,
        pad_rank,
    )

    K = 6
    op = qtt_screened_laplacian(K, delta=1.0)
    rhs = qtt_exponential(K, c=3.0)
    x, resid = gmres_packed(op, rhs, pad_rank(rhs, 4), eps=1e-9, rank=8)
    rel = float(resid) / float(norm_exact(rhs))
    assert rel < 1e-8, rel

    n = 2**K
    lin = _perm_to_linear(K)
    A = np.zeros((n, n))
    A[np.ix_(lin, lin)] = _dense_op(op, K)
    f = np.zeros(n)
    f[lin] = _dense_vec(rhs, K)
    u_ref = np.linalg.solve(A, f)
    u = np.zeros(n)
    u[lin] = _dense_vec(x, K)
    assert np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref) < 1e-7


def test_als_solve_adaptive_finds_the_rank():
    """Starting below the solution rank, the adaptive wrapper doubles
    until the relative residual target is met (2D system: rank 12 is
    not enough, 24 is — see the measured decay in the example)."""
    from tensor_networks_tpu.ops.als import als_solve_adaptive
    from tensor_networks_tpu.ops.packed import norm_exact

    from tensor_networks_tpu.ops.qtt import (
        qtt_exponential_2d,
        qtt_screened_laplacian_2d,
    )

    op2 = qtt_screened_laplacian_2d(5, delta=1.0)
    rhs2 = qtt_exponential_2d(5)
    x, resid, hist = als_solve_adaptive(
        op2, rhs2, eps=1e-8, rank=6, max_rank=48, dense_limit=8192
    )
    rel = float(resid) / float(norm_exact(rhs2))
    assert rel < 1e-8, rel
    assert x.rank > 6  # it actually had to adapt


def test_3d_operator_matches_kron_oracle():
    """The 3-axis interleaved operator (rank 9) densifies to
    Ax(+)I(+)I + I(+)Ay(+)I + I(+)I(+)Az exactly at K=2 (64 unknowns)."""
    from tensor_networks_tpu.ops.qtt import qtt_screened_laplacian_nd

    K, delta, naxes = 2, 0.8, 3
    op3 = qtt_screened_laplacian_nd(K, naxes, delta=delta)
    full = _dense_op(op3, naxes * K)
    n = 2**K
    N = n**naxes

    # densified position -> per-axis indices (core p belongs to axis
    # p % naxes, bit p // naxes; core 0 is the slowest axis)
    ax_idx = np.zeros((N, naxes), dtype=int)
    for pos in range(N):
        rem = pos
        bits = []
        for _ in range(naxes * K):
            bits.append(rem % 2)
            rem //= 2
        bits = bits[::-1]
        for a in range(naxes):
            ax_idx[pos, a] = sum(
                bits[naxes * k + a] << k for k in range(K)
            )

    def lap1d(d):
        m = (2.0 + d) * np.eye(n)
        m -= np.diag(np.ones(n - 1), 1)
        m -= np.diag(np.ones(n - 1), -1)
        return m

    eye = np.eye(n)
    ref = (
        np.kron(np.kron(lap1d(delta), eye), eye)
        + np.kron(np.kron(eye, lap1d(0.0)), eye)
        + np.kron(np.kron(eye, eye), lap1d(0.0))
    )  # indexed by x*n^2 + y*n + z
    got = np.zeros((N, N))
    for p in range(N):
        for q in range(N):
            gp = ax_idx[p, 0] * n * n + ax_idx[p, 1] * n + ax_idx[p, 2]
            gq = ax_idx[q, 0] * n * n + ax_idx[q, 1] * n + ax_idx[q, 2]
            got[gp, gq] = full[p, q]
    assert np.allclose(got, ref, atol=1e-12), np.abs(got - ref).max()


def test_nd_rhs_matches_separable_exponential():
    """qtt_exponential_nd is the exact rank-1 interleaving of per-axis
    exponentials (checked pointwise against the dense product at
    K=3, naxes=3)."""
    from tensor_networks_tpu.ops.qtt import qtt_exponential_nd

    K, cs = 3, (2.0, 3.0, 1.5)
    naxes = len(cs)
    rhs = qtt_exponential_nd(K, cs)
    vec = _dense_vec(rhs, naxes * K)
    n = 2**K
    for pos in range(n**naxes):
        # densified position -> per-axis indices (core p = axis
        # p % naxes, bit p // naxes; densify makes core 0 slowest)
        rem, bits = pos, []
        for _ in range(naxes * K):
            bits.append(rem % 2)
            rem //= 2
        bits = bits[::-1]
        ref = 1.0
        for a in range(naxes):
            xa = sum(bits[naxes * k + a] << k for k in range(K))
            ref *= np.exp(-cs[a] * xa / n)
        assert abs(vec[pos] - ref) < 1e-13


def test_3d_als_solves_to_dense_oracle():
    """End-to-end 3-axis solve at K=3 (512 unknowns) against the dense
    kron oracle."""
    from tensor_networks_tpu.ops.als import als_solve_adaptive
    from tensor_networks_tpu.ops.packed import norm_exact
    from tensor_networks_tpu.ops.qtt import (
        qtt_exponential_nd,
        qtt_screened_laplacian_nd,
    )

    K, naxes, delta, cs = 3, 3, 1.0, (2.0, 3.0, 1.5)
    op = qtt_screened_laplacian_nd(K, naxes, delta=delta)
    rhs = qtt_exponential_nd(K, cs)
    x, resid, _ = als_solve_adaptive(op, rhs, eps=1e-9, rank=4,
                                     max_rank=16)
    rel = float(resid) / float(norm_exact(rhs))
    assert rel < 1e-9, rel

    d = naxes * K
    A = _dense_op(op, d)
    f = _dense_vec(rhs, d)
    u_ref = np.linalg.solve(A, f)
    u = _dense_vec(x, d)
    assert np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref) < 1e-8


@pytest.mark.slow
def test_cross_recovers_qtt_solution():
    """QTT-regime cross approximation: rebuild the d=16 binary-mode
    screened-Poisson solution from point evaluations alone — the
    many-tiny-modes regime the reference README flags as broken
    ('dimension scaling is off ... may be a problem if QTT
    considered'), driven end-to-end through the cross engine."""
    from tensor_networks_tpu.cross import (
        CrossApproximation,
        CrossConfig,
        FuncTensorNetwork,
    )
    from tensor_networks_tpu import Index, TensorNetwork
    from tensor_networks_tpu.ops.als import als_solve
    from tensor_networks_tpu.ops.packed import pad_rank, unpack
    from tensor_networks_tpu.ops.qtt import (
        qtt_exponential,
        qtt_screened_laplacian,
    )

    K = 16
    op = qtt_screened_laplacian(K, delta=1.0)
    rhs = qtt_exponential(K, c=3.0)
    x, resid, _ = als_solve(op, rhs, pad_rank(rhs, 8), sweeps=4,
                            tol=1e-12)
    target_net = unpack(x, [f"b{k}" for k in range(K)])
    indices = target_net.free_indices()
    func = FuncTensorNetwork(indices, target_net)

    init = TensorNetwork.rand_tt(indices, [1] * (K - 1))
    res = CrossApproximation(func, CrossConfig(kickrank=2)).cross(
        init, eps=1e-6
    )

    rng = np.random.default_rng(3)
    pts = rng.integers(0, 2, (4096, K))
    real = np.asarray(func(pts))
    approx = np.asarray(res.net.evaluate(indices, pts))
    rel = np.linalg.norm(real - approx) / np.linalg.norm(real)
    assert rel < 1e-5, rel


def test_nonsymmetric_solve_via_normal_equations():
    """The packed operator algebra closes the loop for nonsymmetric
    systems: A = 1.5 I - S (upwind shift, nonsymmetric) solved through
    the SPD normal equations ttop_round(ttop_compose(A^T, A)) with
    als_solve(spd=True), against the dense oracle."""
    import jax.numpy as jnp

    from tensor_networks_tpu.ops import packed as pk
    from tensor_networks_tpu.ops.als import als_solve_adaptive
    from tensor_networks_tpu.ops.qtt import qtt_exponential, qtt_shift

    K = 8
    S = qtt_shift(K)
    eye = jnp.eye(2, dtype=jnp.float64)
    I = pk.PackedTTOp(
        1.5 * eye[:, :, None],
        jnp.broadcast_to(eye[None, None, :, :, None], (K - 2, 1, 2, 2, 1)),
        eye[None],
    )
    A = pk.ttop_add(I, pk.PackedTTOp(-S.first, S.mids, S.last))
    At = pk.ttop_transpose(A)
    N = pk.ttop_round(pk.ttop_compose(At, A), 1e-13)
    assert N.first.shape[-1] <= 5  # exact rank 4 of a structural 9

    rhs = qtt_exponential(K, c=3.0)
    rhs_n = pk.ttop_apply_packed(At, rhs)
    x, res, _ = als_solve_adaptive(
        N, rhs_n, eps=1e-11, rank=4, max_rank=16, spd=True
    )
    assert res / float(pk.norm_exact(rhs_n)) < 1e-11

    u_ref = np.linalg.solve(_dense_op(A, K), _dense_vec(rhs, K))
    u = _dense_vec(x, K)
    assert np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref) < 1e-10


def test_qtt_trig_pointwise():
    """qtt_trig is the exact rank-2 angle-addition automaton: pinned
    pointwise against np.sin over the full 2^K grid."""
    from tensor_networks_tpu.ops import packed as pk
    from tensor_networks_tpu.ops.qtt import qtt_trig

    K = 10
    idx = np.arange(2**K)
    bits = (idx[:, None] >> np.arange(K)[None, :]) & 1
    for freq, phase in ((7.3, 0.0), (25.0, 1.1), (2.0, np.pi / 2)):
        t = qtt_trig(K, freq, phase)
        assert t.rank == 2
        got = np.asarray(pk.evaluate(t, bits))
        ref = np.sin(freq * idx / 2**K + phase)
        assert np.abs(got - ref).max() < 1e-13


def test_qtt_polynomial_pointwise():
    """qtt_polynomial is the exact rank-(q+1) binomial automaton over
    the normalized argument x = i / 2^K."""
    from tensor_networks_tpu.ops import packed as pk
    from tensor_networks_tpu.ops.qtt import qtt_polynomial

    K = 10
    idx = np.arange(2**K)
    bits = (idx[:, None] >> np.arange(K)[None, :]) & 1
    for coeffs in ([1.0, -2.0, 3.0], [0.5, 0, 0, 0, 1.0, -0.3]):
        p = qtt_polynomial(K, coeffs)
        assert p.rank == len(coeffs)
        got = np.asarray(pk.evaluate(p, bits))
        x = idx / 2**K
        ref = sum(c * x**q for q, c in enumerate(coeffs))
        assert np.abs(got - ref).max() < 1e-13


def test_ttop_identity_is_compose_unit():
    """ttop_identity applies as the identity and is the unit of
    ttop_compose."""
    import jax.numpy as jnp

    from tensor_networks_tpu.ops import packed as pk

    g = np.random.default_rng(11)
    d, n, r, R = 6, 2, 3, 2
    x = pk.PackedTT(
        jnp.asarray(g.standard_normal((n, r))),
        jnp.asarray(g.standard_normal((d - 2, r, n, r))),
        jnp.asarray(g.standard_normal((r, n))),
    )
    I = pk.ttop_identity(d, n)
    y = pk.ttop_apply_packed(I, x)
    rel = float(pk.norm_exact(pk.add(y, pk.scale(x, -1.0)))) / float(
        pk.norm_exact(x)
    )
    assert rel < 1e-12

    A = pk.PackedTTOp(
        jnp.asarray(g.standard_normal((n, n, R))),
        jnp.asarray(g.standard_normal((d - 2, R, n, n, R))),
        jnp.asarray(g.standard_normal((R, n, n))),
    )
    ya = pk.ttop_apply_packed(pk.ttop_compose(I, A), x)
    yb = pk.ttop_apply_packed(A, x)
    rel = float(pk.norm_exact(pk.add(ya, pk.scale(yb, -1.0)))) / float(
        pk.norm_exact(yb)
    )
    assert rel < 1e-12
