"""Checkpoint/resume behaviors: search replay-from-log and edge-case
(two-core) rounding."""

import copy
import os
import pickle
import tempfile

import numpy as np

from tensor_networks_tpu import (
    Index,
    Tensor,
    TensorNetwork,
    tt_gramsvd_round,
    tt_svd_round,
)
from tensor_networks_tpu.search import SearchConfig, SearchEngine


def test_partition_replay_from_pickle():
    """Resume-by-log: re-running a recorded action program reproduces a
    network of the same quality."""
    np.random.seed(1)
    data = np.random.randn(3, 4, 5)
    indices = [Index("i", 3), Index("j", 4), Index("k", 5)]
    net = TensorNetwork()
    net.add_node("G", Tensor(data, indices))

    config = SearchConfig()
    config.engine.eps = 0.5
    stats = SearchEngine(config=config).partition_search(
        copy.deepcopy(net)
    )
    acs = stats["best_acs"]
    best_cost = stats["best_network"].cost()

    with tempfile.TemporaryDirectory() as td:
        log_path = os.path.join(td, "actions.pkl")
        with open(log_path, "wb") as f:
            pickle.dump(list(acs), f)

        config2 = SearchConfig()
        config2.engine.eps = 0.5
        config2.synthesizer.replay_from = log_path
        config2.output.output_dir = os.path.join(td, "out")
        stats2 = SearchEngine(config=config2).partition_search(
            copy.deepcopy(net)
        )

    assert stats2["best_network"].cost() <= net.cost()
    assert stats2["reconstruction_error"] <= 0.5 * 1.01
    # replay must land at (or beat) the recorded program's cost
    assert stats2["best_network"].cost() <= best_cost * 1.5


def test_round_two_core_train():
    """dim=2 trains exercise the sweep boundaries."""
    np.random.seed(2)
    x, y = Index("x", 6), Index("y", 7)
    a = TensorNetwork.rand_tt([x, y], [3])
    s = a + a
    dense = np.asarray(s.contract().value)
    s = tt_svd_round(s, 1e-8)
    assert s.ranks() == [3]
    assert np.allclose(np.asarray(s.contract().value), dense, atol=1e-12)

    s2 = a + a
    s2 = tt_gramsvd_round(s2, 1e-8)
    assert s2.ranks() == [3]
    assert np.allclose(
        np.asarray(s2.contract().value), dense, atol=1e-12
    )


def test_preprocess_cache_reuse(tmp_path):
    """The spilled-SVD cache is honored on a second run."""
    np.random.seed(3)
    data = np.random.randn(3, 4, 5)
    indices = [Index("i", 3), Index("j", 4), Index("k", 5)]
    net = TensorNetwork()
    net.add_node("G", Tensor(data, indices))

    config = SearchConfig()
    config.engine.eps = 0.5
    config.rank_search.fit_mode = "all"  # spills u,s,v to npz
    config.output.output_dir = str(tmp_path / "cache")
    config.output.remove_temp_after_run = False
    stats = SearchEngine(config=config).partition_search(
        copy.deepcopy(net)
    )
    assert stats["count"] == 7
    files = os.listdir(config.output.output_dir)
    assert any(f.endswith(".npz") for f in files)
