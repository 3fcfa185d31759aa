"""End-to-end smoke of the whole library surface on the TPU backend.

Everything in f32 (set TNT_ENABLE_X64=0 before import): graph
contraction, TT algebra + all rounding families, GMRES, cross
approximation, structure search, packed kernels.  Accuracy thresholds are
f32-grade.  Exit code 0 = the full framework runs on device.
"""

import os

os.environ.setdefault("TNT_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from tensor_networks_tpu import (
        Index,
        Tensor,
        TensorNetwork,
        gmres,
        tt_gramsvd_round,
        tt_randomized_round,
        tt_svd_round,
        ttop_apply,
        ttop_rank1,
    )

    dev = jax.devices()[0]
    print(f"[smoke] backend={jax.default_backend()} device={dev}",
          file=sys.stderr)
    np.random.seed(0)

    def f32(tn):
        for node in tn.network.nodes:
            t = tn.node_tensor(node)
            t.value = t.value.astype("float32")
        return tn

    x, y, z = Index("x", 8), Index("y", 8), Index("z", 8)
    a = f32(TensorNetwork.rand_tt([x, y, z], [3, 3]))
    b = f32(TensorNetwork.rand_tt([x, y, z], [2, 2]))

    # graph engine
    dense = np.asarray(a.contract().value)
    assert dense.shape == (8, 8, 8)
    inner = float(a.inner(b))
    ref = float(np.sum(dense * np.asarray(b.contract().value)))
    assert np.isclose(inner, ref, rtol=1e-4), (inner, ref)
    print("[smoke] contract/inner ok", file=sys.stderr)

    # rounding families
    s = a + a
    target = 2 * dense
    for name, rounder in [
        ("svd", lambda t: tt_svd_round(t, 1e-4)),
        ("gram", lambda t: tt_gramsvd_round(t, 1e-4)),
        ("rand", lambda t: tt_randomized_round(t, [3, 3])),
    ]:
        rounded = rounder(a + a)
        got = np.asarray(rounded.contract().value)
        rel = np.linalg.norm(got - target) / np.linalg.norm(target)
        assert rel < 1e-3, (name, rel)
        print(f"[smoke] round[{name}] ok (rel {rel:.1e})", file=sys.stderr)

    # twosided rounding on a d>=4 uniform train (sign-projector path;
    # d=3 trains have ragged end bonds, so build a 5-core train)
    from tensor_networks_tpu.ops.fast import tt_round_fixed

    uni = f32(
        TensorNetwork.rand_tt(
            [Index(f"u{i}", 6) for i in range(5)], [4] * 4
        )
    )
    udense = np.asarray(uni.contract().value)
    out, ranks = tt_round_fixed(uni + uni, 1e-3, method="twosided")
    got = np.asarray(out.contract().value)
    rel = np.linalg.norm(got - 2 * udense) / np.linalg.norm(2 * udense)
    assert rel < 1e-3 and max(ranks) <= 4, (rel, ranks)
    print(
        f"[smoke] round[twosided] ok (rel {rel:.1e}, ranks {ranks})",
        file=sys.stderr,
    )

    # parallel-prefix rounding (GEMM-only chains, batched factorizations)
    out, ranks = tt_round_fixed(uni + uni, 1e-3, method="prefix")
    got = np.asarray(out.contract().value)
    rel = np.linalg.norm(got - 2 * udense) / np.linalg.norm(2 * udense)
    assert rel < 1e-3 and max(ranks) <= 4, (rel, ranks)
    print(
        f"[smoke] round[prefix] ok (rel {rel:.1e}, ranks {ranks})",
        file=sys.stderr,
    )

    # padded thin-ended chain on DEVICE: the structural clamp
    # (_bond_bounds) must hold where it actually matters — TPU eigh
    # noise on rank-deficient Grams is what inflated ranks pre-fix
    # (k0=103 on a (32, 256) first bond); CPU zero padding is exact
    # so only an on-chip run exercises this
    thin = f32(
        TensorNetwork.rand_tt(
            [Index("t0", 2), Index("t1", 24), Index("t2", 20),
             Index("t3", 24)],
            [2, 18, 17],
        )
    )
    tdense = np.asarray(thin.contract().value)
    for meth in ("gram", "prefix"):
        out, ranks = tt_round_fixed(
            thin.__deepcopy__({}), 1e-3, method=meth
        )
        assert ranks[0] <= 2 and ranks[1] <= 18 and ranks[2] <= 17, (
            meth, ranks,
        )
        got = np.asarray(out.contract().value)
        perm = [
            out.free_indices().index(i) for i in thin.free_indices()
        ]
        got = np.transpose(got, perm)
        rel = np.linalg.norm(got - tdense) / np.linalg.norm(tdense)
        assert rel < 1e-3, (meth, rel)
        print(
            f"[smoke] round[{meth} padded-thin] ok (rel {rel:.1e}, "
            f"ranks {ranks})",
            file=sys.stderr,
        )

    # evaluate
    pts = np.random.randint(0, 8, size=(257, 3))
    vals = np.asarray(a.evaluate(a.free_indices(), pts))
    assert np.allclose(
        vals, dense[pts[:, 0], pts[:, 1], pts[:, 2]], atol=1e-3
    )
    print("[smoke] evaluate ok", file=sys.stderr)

    # GMRES with a well-conditioned operator
    mat = np.eye(8) + 0.1 * np.random.randn(8, 8)
    op = ttop_rank1(
        [x, y, z],
        [Index("xp", 8), Index("yp", 8), Index("zp", 8)],
        [mat.astype(np.float32), np.eye(8, dtype=np.float32),
         np.eye(8, dtype=np.float32)],
        "A",
    )
    f32(op)
    _, resid = gmres(
        lambda t: ttop_apply(op, t), a, b, eps=1e-4, round_eps=1e-5,
        maxiter=12,
    )
    assert resid < 1e-2 * a.norm(), resid
    print(f"[smoke] gmres ok (resid {resid:.1e})", file=sys.stderr)

    # ALS/DMRG linear solver on a d=4 SPD-dominant system
    from tensor_networks_tpu.ops import packed as pk
    from tensor_networks_tpu.ops.als import als_solve
    from tensor_networks_tpu import ttop_sum
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    d_als, n_als = 4, 6
    ains = [Index(f"ax{i}", n_als) for i in range(d_als)]
    aouts = [Index(f"ay{i}", n_als) for i in range(d_als)]
    mats = []
    for _ in range(d_als):
        g = rng.randn(n_als, n_als)
        mats.append(0.3 * (g + g.T) / (2 * np.sqrt(n_als)))
    aop = ttop_sum(
        ains, aouts, [[np.eye(n_als)] * d_als, mats], "S"
    )
    acores = [np.asarray(aop.value(i)) for i in range(d_als)]
    pop = pk.PackedTTOp(
        jnp.asarray(acores[0], jnp.float32),
        jnp.asarray(np.stack(acores[1:-1]), jnp.float32),
        jnp.asarray(acores[-1], jnp.float32),
    )
    arhs = pk.pack(
        f32(TensorNetwork.rand_tt(ains, [3] * (d_als - 1))), jnp.float32
    )
    ax0 = pk.pad_rank(
        pk.pack(
            f32(TensorNetwork.rand_tt(ains, [4] * (d_als - 1))),
            jnp.float32,
        ),
        12,
    )
    arhs_norm = float(pk.norm_exact(arhs))
    _, ares, _ = als_solve(
        pop, arhs, ax0, sweeps=4, tol=1e-5 * arhs_norm
    )
    assert ares / arhs_norm < 1e-4, ares / arhs_norm
    print(
        f"[smoke] als_solve ok (rel resid {ares/arhs_norm:.1e})",
        file=sys.stderr,
    )

    # packed operator algebra on device: adjoint, compose, f32 rounding
    at = pk.ttop_transpose(pop)
    nrm_op = pk.ttop_round(pk.ttop_compose(at, pop), 1e-4)
    yn = pk.ttop_apply_packed(nrm_op, arhs)
    y2 = pk.ttop_apply_packed(at, pk.ttop_apply_packed(pop, arhs))
    arel = float(
        pk.norm_exact(pk.add(yn, pk.scale(y2, -1.0)))
    ) / float(pk.norm_exact(y2))
    assert arel < 1e-3, arel
    print(
        f"[smoke] ttop algebra ok (A^T A rel {arel:.1e}, rank "
        f"{pop.first.shape[-1] ** 2}->{nrm_op.first.shape[-1]})",
        file=sys.stderr,
    )

    # DMRG eigensolver: smallest eigenpair of the SPD operator
    from tensor_networks_tpu.ops.eigen import als_eigsh

    xe, lam, _ = als_eigsh(pop, ax0, sweeps=6)
    eres = float(
        pk.norm_exact(
            pk.add(pk.ttop_apply_packed(pop, xe), pk.scale(xe, -lam))
        )
    )
    assert eres < 1e-3 * abs(lam), (eres, lam)
    print(
        f"[smoke] als_eigsh ok (lam {lam:.4f}, resid {eres:.1e})",
        file=sys.stderr,
    )

    # structure search on a small dense target
    from tensor_networks_tpu.search import SearchConfig, SearchEngine

    data = np.random.randn(3, 4, 5).astype(np.float32)
    net = TensorNetwork()
    net.add_node(
        "G", Tensor(data, [Index("i", 3), Index("j", 4), Index("k", 5)])
    )
    config = SearchConfig()
    config.engine.eps = 0.5
    stats = SearchEngine(config=config).partition_search(net)
    assert stats["count"] == 7
    print(
        f"[smoke] search ok (cr_core {stats['cr_core']:.2f})",
        file=sys.stderr,
    )

    # cross approximation of a separable function
    from tensor_networks_tpu.cross import (
        CachedFunc,
        CrossApproximation,
        CrossConfig,
    )

    class ExpSum(CachedFunc):
        def _run(self, args):
            return np.exp(np.sum(args, axis=1))

    indices = [
        Index("i", 8, tuple(np.linspace(0, 1, 8))),
        Index("j", 8, tuple(np.linspace(0, 1, 8))),
        Index("k", 8, tuple(np.linspace(0, 1, 8))),
    ]
    func = ExpSum(indices)
    cross_net = f32(TensorNetwork.rand_tt(func.indices, [1, 1]))
    res = CrossApproximation(func, CrossConfig(kickrank=1)).cross(
        cross_net, eps=1e-3
    )
    grid = np.stack(
        np.meshgrid(*[range(8)] * 3), axis=-1
    ).reshape(-1, 3)
    real = np.asarray(func(grid))
    approx = np.asarray(res.net.evaluate(func.indices, grid))
    rel = np.linalg.norm(real - approx) / np.linalg.norm(real)
    assert rel < 1e-3, rel
    print(f"[smoke] cross ok (rel {rel:.1e})", file=sys.stderr)

    print("[smoke] ALL OK", file=sys.stderr)


if __name__ == "__main__":
    main()
