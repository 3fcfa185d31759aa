"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensor_networks_tpu import Index, TensorNetwork, tt_inner_fast
from tensor_networks_tpu.ops.fast import stack_tt_cores
from tensor_networks_tpu.parallel import (
    default_mesh,
    init_tt_params,
    make_mesh,
    make_train_step,
    shard_tt_params,
    tt_evaluate_batched,
    tt_inner_mode_sharded,
)
from tensor_networks_tpu.parallel.sharded import TTCores


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest should provide 8 cpu devices"
    return make_mesh((1, 8), ("data", "model"))


def _uniform_tt(d, n, r, seed):
    np.random.seed(seed)
    indices = [Index(f"x{i}", n) for i in range(d)]
    return TensorNetwork.rand_tt(indices, [r] * (d - 1))


def test_mode_sharded_inner_matches_dense(mesh8):
    d, n, r = 6, 16, 5
    a = _uniform_tt(d, n, r, 0)
    b = _uniform_tt(d, n, r, 1)
    expected = float(a.inner(b))

    ca = TTCores(*stack_tt_cores(a))
    cb = TTCores(*stack_tt_cores(b))
    ca = shard_tt_params(mesh8, ca)
    cb = shard_tt_params(mesh8, cb)
    got = float(tt_inner_mode_sharded(mesh8, ca, cb))
    assert np.isclose(got, expected, rtol=1e-10)

    fast = float(tt_inner_fast(a, b))
    assert np.isclose(fast, expected, rtol=1e-10)


def test_batched_evaluate_matches_network(mesh8):
    d, n, r = 5, 8, 4
    tt = _uniform_tt(d, n, r, 2)
    first, mids, last = stack_tt_cores(tt)

    idx = np.random.randint(0, n, size=(64, d))
    expected = np.asarray(
        tt.evaluate(tt.free_indices(), idx)
    )
    got = np.asarray(tt_evaluate_batched(first, mids, last, jnp.asarray(idx)))
    assert np.allclose(got, expected, atol=1e-10)


def test_train_step_runs_and_descends(mesh8):
    d, n, r = 6, 8, 4
    params = init_tt_params(d, n, r, dtype=jnp.float64, seed=3)
    step, place_params, place_batch = make_train_step(mesh8)
    params = place_params(params)

    # target: entries of a random rank-2 TT
    target = _uniform_tt(d, n, 2, 4)
    idx = np.random.randint(0, n, size=(256, d))
    y = np.asarray(target.evaluate(target.free_indices(), idx))
    idx_dev, y_dev = place_batch(idx, y)

    losses = []
    for _ in range(10):
        params, loss = step(params, idx_dev, y_dev, 1e-3)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_dp_tp_mesh_train_step():
    mesh = make_mesh((2, 4), ("data", "model"))
    d, n, r = 5, 8, 3
    params = init_tt_params(d, n, r, dtype=jnp.float64, seed=5)
    step, place_params, place_batch = make_train_step(mesh)
    params = place_params(params)
    idx = np.random.randint(0, n, size=(128, d))
    y = np.random.randn(128)
    idx_dev, y_dev = place_batch(idx, y)
    params, loss = step(params, idx_dev, y_dev, 1e-3)
    assert np.isfinite(float(loss))


def test_default_mesh():
    mesh = default_mesh()
    assert mesh.devices.size == jax.device_count()


def test_adam_train_step_descends(mesh8):
    from tensor_networks_tpu.parallel.training import make_adam_train_step

    d, n, r = 6, 8, 4
    params = init_tt_params(d, n, r, dtype=jnp.float64, seed=9)
    step, init_state, place_params, place_batch = make_adam_train_step(
        mesh8, lr=2e-2
    )
    params = place_params(params)
    opt_state = init_state(params)

    target = _uniform_tt(d, n, 2, 10)
    idx = np.random.randint(0, n, size=(256, d))
    y = np.asarray(target.evaluate(target.free_indices(), idx))
    y = y / np.sqrt(np.mean(y**2))
    idx_dev, y_dev = place_batch(idx, y)

    losses = []
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state, idx_dev, y_dev)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0]


def test_hybrid_mesh_dp_over_slices():
    """Multi-slice mesh: pure DP over the slice (DCN) axis, TP within a
    slice — the one-collective-over-DCN layout."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tensor_networks_tpu.parallel import make_hybrid_mesh

    mesh = make_hybrid_mesh(2, (2, 2))
    assert mesh.devices.shape == (2, 2, 2)
    assert mesh.axis_names == ("slice", "data", "model")

    # a batch reduction sharded over (slice, data): one psum result
    x = jnp.arange(32.0).reshape(8, 4)
    x = jax.device_put(x, NamedSharding(mesh, P(("slice", "data"), None)))
    total = jax.jit(lambda v: jnp.sum(v))(x)
    assert float(total) == float(np.sum(np.arange(32.0)))


def test_train_step_hybrid_batch_axes():
    """DP over the (slice, data) axes of a hybrid mesh: the batch shards
    across slices, params replicate, and the step matches the
    single-mesh result."""
    import jax
    import jax.numpy as jnp

    from tensor_networks_tpu.parallel import (
        init_tt_params,
        make_hybrid_mesh,
        make_mesh,
        make_train_step,
    )

    hmesh = make_hybrid_mesh(2, (2, 2))
    step_h, place_p, place_b = make_train_step(
        hmesh, batch_axes=("slice", "data")
    )
    params = init_tt_params(d=5, n=4, r=3, dtype=jnp.float32, seed=0)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 4, size=(16, 5))
    y = rng.standard_normal(16).astype(np.float32)
    p_h, loss_h = step_h(place_p(params), *place_b(idx, y), 1e-3)

    flat = make_mesh((8, 1))
    step_f, place_p_f, place_b_f = make_train_step(flat)
    p_f, loss_f = step_f(place_p_f(params), *place_b_f(idx, y), 1e-3)
    assert np.isclose(float(loss_h), float(loss_f), rtol=1e-6)
    for a, b in zip(p_h, p_f):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)
