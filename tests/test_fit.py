"""Gradient-based network fitting (tensor completion on any topology)."""

import numpy as np

from tensor_networks_tpu import Index, TensorNetwork
from tensor_networks_tpu.fit import completion_error, fit_network

np.random.seed(11)


def _observations(truth_net, indices, n):
    idx = np.stack(
        [np.random.randint(0, i.size, size=n) for i in indices], axis=-1
    )
    y = np.asarray(truth_net.evaluate(indices, idx))
    return idx, y


def test_fit_completes_low_rank_tt():
    np.random.seed(11)  # local: global state depends on test selection
    indices = [Index(f"x{i}", 6) for i in range(5)]
    truth = TensorNetwork.rand_tt(indices, [2, 3, 3, 2])
    idx, y = _observations(truth, indices, 4000)

    model = TensorNetwork.rand_tt(indices, [2, 3, 3, 2])
    for node in model.network.nodes:  # O(1)-scaled init (see docstring)
        t = model.node_tensor(node)
        t.update_val_size(np.asarray(t.value) / np.sqrt(3))
    losses = fit_network(model, indices, idx, y, steps=600, lr=5e-2)
    assert losses[-1] < 1e-4 * losses[0]

    hold_idx, hold_y = _observations(truth, indices, 1000)
    assert completion_error(model, indices, hold_idx, hold_y) < 0.05


def test_fit_works_on_trees_and_tucker():
    indices = [Index(f"t{i}", 4) for i in range(4)]
    truth = TensorNetwork.rand_ht(indices, 2)
    idx, y = _observations(truth, indices, 256)  # full grid size

    for builder in (
        lambda: TensorNetwork.rand_ht(indices, 2),
        lambda: TensorNetwork.rand_tucker(indices),
    ):
        model = builder()
        losses = fit_network(model, indices, idx, y, steps=300, lr=5e-2)
        assert losses[-1] < 0.05 * losses[0]


def test_fit_minibatch_path():
    indices = [Index(f"m{i}", 5) for i in range(4)]
    truth = TensorNetwork.rand_tt(indices, [2, 2, 2])
    idx, y = _observations(truth, indices, 2000)
    model = TensorNetwork.rand_tt(indices, [2, 2, 2])
    losses = fit_network(
        model, indices, idx, y, steps=300, lr=5e-2, batch_size=256
    )
    assert np.mean(losses[-20:]) < 0.1 * np.mean(losses[:20])


def test_als_completes_sparse_smooth_train():
    """ALS on a d=6 smooth rank-2 target at ~2% density converges to
    near machine precision and early-stops at tol."""
    from tensor_networks_tpu.fit import fit_network_als
    from tensor_networks_tpu.ops import tt_separable

    d, n = 6, 8
    grid = np.linspace(-1.0, 1.0, n)
    indices = [Index(f"a{i}", n, tuple(grid)) for i in range(d)]
    truth = tt_separable(indices, [np.sin((i + 1) * grid) for i in range(d)])
    np.random.seed(5)
    idx = np.stack([np.random.randint(0, n, 20000) for _ in indices], -1)
    y = np.asarray(truth.evaluate(indices, idx))

    model = TensorNetwork.rand_tt(indices, [2] * (d - 1))
    errs = fit_network_als(model, indices, idx, y, sweeps=40, tol=1e-6)
    assert errs[-1] < 1e-6
    assert len(errs) < 40  # tol early-stop fired

    hold = np.stack([np.random.randint(0, n, 2000) for _ in indices], -1)
    hy = np.asarray(truth.evaluate(indices, hold))
    assert completion_error(model, indices, hold, hy) < 1e-5


def test_als_ragged_ranks_and_layouts():
    """Ragged bond ranks and permuted core layouts round-trip through
    the canonical extraction and write-back."""
    from tensor_networks_tpu.fit import fit_network_als

    indices = [Index(f"b{i}", 5) for i in range(5)]
    truth = TensorNetwork.rand_tt(indices, [2, 3, 3, 2])
    np.random.seed(6)
    idx = np.stack([np.random.randint(0, 5, 3000) for _ in indices], -1)
    y = np.asarray(truth.evaluate(indices, idx))

    model = TensorNetwork.rand_tt(indices, [2, 3, 3, 2])
    # permute one middle core's axes to exercise layout recovery
    t = model.node_tensor(2)
    perm = [2, 0, 1]
    val = np.transpose(np.asarray(t.value), perm)
    t.indices[:] = [t.indices[p] for p in perm]
    t.update_val_size(val)

    errs = fit_network_als(model, indices, idx, y, sweeps=30, tol=1e-8)
    assert errs[-1] < 1e-6
    got = np.asarray(model.evaluate(indices, idx))
    assert np.linalg.norm(got - y) / np.linalg.norm(y) < 1e-6


def test_als_rejects_non_chain():
    from tensor_networks_tpu.fit import fit_network_als

    indices = [Index(f"c{i}", 4) for i in range(4)]
    tuck = TensorNetwork.rand_tucker(indices)
    import pytest

    with pytest.raises(ValueError):
        fit_network_als(tuck, indices, np.zeros((4, 4), int), np.zeros(4))
