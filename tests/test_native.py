"""Native C++ path-optimizer tests: validity and optimality vs
opt_einsum's exhaustive search on random instances."""

import numpy as np
import opt_einsum as oe
import pytest

from tensor_networks_tpu.native import native_available, optimal_path

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native optimizer not built"
)


def _random_instance(rng, n_ops):
    """A random connected hyper-network of n_ops operands."""
    n_ids = n_ops + rng.integers(1, 4)
    dims = rng.integers(2, 7, size=n_ids).astype(float)
    ops = []
    for i in range(n_ops):
        k = rng.integers(1, 4)
        ids = list(rng.choice(n_ids, size=k, replace=False))
        if i > 0:  # force connectivity
            ids.append(int(rng.choice(ops[i - 1])))
        ops.append(sorted(set(int(x) for x in ids)))
    counts = {}
    for ids in ops:
        for i in ids:
            counts[i] = counts.get(i, 0) + 1
    out = sorted(i for i, c in counts.items() if c == 1)
    return ops, out, dims


def _expr(ops, out):
    subs = [
        "".join(oe.get_symbol(i) for i in ids) for ids in ops
    ]
    return ",".join(subs) + "->" + "".join(oe.get_symbol(i) for i in out)


def _flops(expr, shapes, path):
    _, info = oe.contract_path(expr, *shapes, shapes=True, optimize=path)
    return float(info.opt_cost)


def test_native_matches_optimal_cost():
    rng = np.random.default_rng(0)
    for _ in range(20):
        n_ops = int(rng.integers(3, 7))
        ops, out, dims = _random_instance(rng, n_ops)
        path = optimal_path(ops, out, list(dims))
        assert path is not None and len(path) == n_ops - 1

        expr = _expr(ops, out)
        shapes = [tuple(int(dims[i]) for i in ids) for ids in ops]
        ref_path, _ = oe.contract_path(
            expr, *shapes, shapes=True, optimize="optimal"
        )
        # same achieved cost (paths may differ)
        assert _flops(expr, shapes, path) <= _flops(
            expr, shapes, ref_path
        ) * (1 + 1e-9)

        # and the contraction result is correct
        arrays = [np.random.randn(*s) for s in shapes]
        ref = oe.contract(expr, *arrays, optimize=ref_path)
        got = oe.contract(expr, *arrays, optimize=path)
        assert np.allclose(ref, got)


def test_native_tt_ladder_finds_zipper():
    """On a TT inner-product ladder the optimal path must avoid the r^4
    blowup (the reference README's known defect)."""
    d, n, r = 7, 4, 6
    ops = []
    # a-side: ids 0..: modes m_i = i, bonds a_i = d + i, b_i = 2d + i
    for i in range(d):
        ids = [i]
        if i > 0:
            ids.insert(0, d + i - 1)
        if i < d - 1:
            ids.append(d + i)
        ops.append(ids)
    for i in range(d):
        ids = [i]
        if i > 0:
            ids.insert(0, 2 * d - 1 + i - 1)
        if i < d - 1:
            ids.append(2 * d - 1 + i)
        ops.append(ids)
    dims = [float(n)] * d + [float(r)] * (d - 1) + [float(r)] * (d - 1)
    path = optimal_path(ops, [], dims)
    assert path is not None

    expr = _expr(ops, [])
    shapes = [tuple(int(dims[i]) for i in ids) for ids in ops]
    cost = _flops(expr, shapes, path)
    # zipper cost ~ 2 d n r^3; assert we are within 4x of it
    zipper = 2 * d * n * r**3
    assert cost <= 4 * zipper, (cost, zipper)


def test_run_host_matches_device_contraction():
    """The host einsum path (TPU small-contraction routing) returns the
    same values as the jitted device contraction, same frozen path."""
    import numpy as np

    from tensor_networks_tpu.planner import get_contraction

    rng = np.random.default_rng(3)
    a = rng.standard_normal((4, 5, 6))
    b = rng.standard_normal((6, 3))
    c = rng.standard_normal((3, 5))
    operand_ids = ((0, 1, 2), (2, 3), (3, 1))
    out_ids = (0,)
    shapes = (a.shape, b.shape, c.shape)
    fn = get_contraction(operand_ids, out_ids, shapes, a.dtype)
    dev = np.asarray(fn(a, b, c))
    host = fn.run_host(a, b, c)
    assert np.allclose(dev, host, atol=1e-12)
