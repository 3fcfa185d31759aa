"""Device-path (f32, packed) GMRES accuracy and its supporting kernels.

These pin VERDICT round-1 item 5: the all-device solver must reach the
reference's <1e-5 residual bar in f32, which requires (a) the packed
TT-operator apply to be correct for operator ranks > 1, and (b) residual
norms measured without catastrophic cancellation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tensor_networks_tpu as tnt
from tensor_networks_tpu.ops import packed as pk


def _setup(seed=3, d=4, n=6, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    ins = [tnt.Index(f"x{i}", n) for i in range(d)]
    outs = [tnt.Index(f"y{i}", n) for i in range(d)]
    summands = [
        [np.eye(n) for _ in range(d)],
        [0.3 * rng.randn(n, n) / np.sqrt(n) for _ in range(d)],
    ]
    op = tnt.ttop_sum(ins, outs, summands, "A")
    cores = [np.asarray(op.value(i)) for i in range(d)]
    packed_op = pk.PackedTTOp(
        jnp.asarray(cores[0], dtype),
        jnp.asarray(np.stack(cores[1:-1]), dtype),
        jnp.asarray(cores[-1], dtype),
    )
    rhs = tnt.TensorNetwork.rand_tt(ins, [3] * (d - 1))
    x0 = tnt.TensorNetwork.rand_tt(ins, [3] * (d - 1))
    return op, packed_op, rhs, x0, ins


def test_ttop_apply_packed_rank2_matches_graph():
    """Operator ranks > 1 exercise the fused-bond layout (regression:
    a mixed x-major/op-major ordering corrupted every R>1 apply)."""
    op, packed_op, rhs, _, _ = _setup(dtype=jnp.float64)
    x = pk.pack(rhs)
    got = np.asarray(
        pk.unpack(pk.ttop_apply_packed(packed_op, x)).contract().value
    )
    want = np.asarray(tnt.ttop_apply(op, rhs).contract().value)
    assert np.max(np.abs(got - want)) < 1e-12


def test_norm_exact_resolves_cancelling_difference():
    """The zipper norm of a near-cancelling difference train is wrong by
    ~sqrt(eps); the orthogonalization norm must stay accurate."""
    np.random.seed(1)
    ins = [tnt.Index(f"x{i}", 6) for i in range(4)]
    a = pk.pack(tnt.TensorNetwork.rand_tt(ins, [3, 3, 3]), jnp.float32)
    # eps(f32)*||a|| of absolute error is inherent; at tiny=1e-4 that is
    # ~0.1% of the truth for the exact norm, while the zipper norm's
    # sqrt(eps)-level cancellation makes it useless here
    tiny = 1e-4
    diff = pk.add(a, pk.scale(a, -(1.0 - tiny)))  # = tiny * a
    truth = tiny * float(pk.norm_exact(a))
    got = float(pk.norm_exact(diff))
    assert abs(got - truth) < 0.01 * truth


def test_gmres_packed_f32_hits_reference_bar():
    """Adaptive restarts + CGS2 + exact norms: f32 relative residual
    below 1e-5 (the reference's accuracy bar, tests/main_test.py:446)."""
    _, packed_op, rhs, x0, _ = _setup(dtype=jnp.float32)
    rhs_p = pk.pack(rhs, jnp.float32)
    x0_p = pk.pack(x0, jnp.float32)
    rhs_norm = float(pk.norm_exact(rhs_p))

    x, resid = pk.gmres_packed(
        packed_op, rhs_p, x0_p, eps=1e-5 * rhs_norm, rank=6, maxiter=20
    )
    assert resid / rhs_norm < 1e-5

    # the reported residual must be trustworthy: re-measure in f64
    op64 = pk.PackedTTOp(
        *(a.astype(jnp.float64) for a in packed_op)
    )
    x64 = pk.PackedTT(*(a.astype(jnp.float64) for a in x))
    rhs64 = pk.pack(rhs, jnp.float64)
    truth = float(
        pk.norm_exact(
            pk.add(
                rhs64, pk.scale(pk.ttop_apply_packed(op64, x64), -1.0)
            )
        )
    )
    assert truth <= resid * 3 + 1e-12 * rhs_norm


@pytest.mark.slow
def test_gmres_graph_residual_not_inflated_by_cancellation():
    """The host-path solver's reported residual is measured on the
    rounded difference train (backward stable)."""
    op, _, rhs, x0, _ = _setup(dtype=jnp.float64)
    x, resid = tnt.gmres(
        lambda t: tnt.ttop_apply(op, t), rhs, x0, 1e-8, 1e-12, maxiter=40
    )
    assert resid < 1e-8 * rhs.norm() * 10
