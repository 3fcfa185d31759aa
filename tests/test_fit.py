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
    indices = [Index(f"x{i}", 6) for i in range(5)]
    truth = TensorNetwork.rand_tt(indices, [2, 3, 3, 2])
    idx, y = _observations(truth, indices, 4000)

    model = TensorNetwork.rand_tt(indices, [2, 3, 3, 2])
    losses = fit_network(model, indices, idx, y, steps=400, lr=5e-2)
    assert losses[-1] < 1e-2 * losses[0]

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
