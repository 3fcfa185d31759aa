"""Device-batched split scoring (search/batched.py): bit-identical
search semantics vs the per-action SVD path, on CPU with the batched
path force-enabled (TNT_SEARCH_DEVICE=1)."""

import numpy as np
import pytest

from tensor_networks_tpu import Index, Tensor, TensorNetwork
from tensor_networks_tpu.search import SearchConfig, SearchEngine
from tensor_networks_tpu.search.batched import (
    batched_split_svds,
    device_scoring_eligible,
    maybe_batched_svds,
)
from tensor_networks_tpu.search.mdp import SearchState


def _net(shape=(3, 4, 5), seed=1):
    np.random.seed(seed)
    data = np.random.randn(*shape)
    indices = [Index(f"i{k}", s) for k, s in enumerate(shape)]
    net = TensorNetwork()
    net.add_node("G", Tensor(data, indices))
    return net


def _run(kind, net, eps=0.5, monkeypatch=None, force=None):
    if monkeypatch is not None:
        if force is None:
            monkeypatch.delenv("TNT_SEARCH_DEVICE", raising=False)
        else:
            monkeypatch.setenv("TNT_SEARCH_DEVICE", force)
    config = SearchConfig()
    config.engine.eps = eps
    engine = SearchEngine(config=config)
    return getattr(engine, kind)(net)


@pytest.mark.parametrize("kind,count", [("bfs", 7), ("dfs", 8)])
def test_counts_match_per_action_path(kind, count, monkeypatch):
    stats_host = _run(kind, _net(), monkeypatch=monkeypatch, force="0")
    stats_dev = _run(kind, _net(), monkeypatch=monkeypatch, force="1")
    assert stats_host["count"] == stats_dev["count"] == count
    assert np.isclose(
        stats_host["best_network"].cost(),
        stats_dev["best_network"].cost(),
    )


def test_counts_match_4d(monkeypatch):
    """A 4-way target exercises multi-axis groups and transposed
    orientations (dim_l > dim_r)."""
    net = _net(shape=(3, 4, 5, 6), seed=3)
    stats_host = _run("bfs", net, monkeypatch=monkeypatch, force="0")
    net2 = _net(shape=(3, 4, 5, 6), seed=3)
    stats_dev = _run("bfs", net2, monkeypatch=monkeypatch, force="1")
    assert stats_host["count"] == stats_dev["count"]
    assert np.isclose(
        stats_host["best_network"].cost(),
        stats_dev["best_network"].cost(),
    )


def test_factor_reconstruction(monkeypatch):
    """Trimmed padded factors reconstruct each matricization exactly."""
    monkeypatch.setenv("TNT_SEARCH_DEVICE", "1")
    net = _net(shape=(4, 3, 6), seed=7)
    state = SearchState(net, 0.5)
    actions = state.get_legal_actions(True)  # OSplits
    svds = batched_split_svds(net, actions)
    assert len(svds) == len(actions) == 3
    data = np.asarray(net.node_tensor("G").value)
    free = net.free_indices()
    for action, (u, s, v) in svds.items():
        axes = [free.index(i) for i in action.indices]
        rest = [k for k in range(3) if k not in axes]
        mat = np.transpose(data, axes + rest).reshape(
            int(np.prod([data.shape[a] for a in axes])), -1
        )
        got = np.asarray(u) @ np.diag(np.asarray(s)) @ np.asarray(v)
        assert np.allclose(got, mat, atol=1e-10)
        # spectra match host LAPACK
        s_ref = np.linalg.svd(mat, compute_uv=False)
        assert np.allclose(np.asarray(s), s_ref[: len(s)], atol=1e-10)


def test_eligibility_gates(monkeypatch):
    net = _net()
    monkeypatch.setenv("TNT_SEARCH_DEVICE", "0")
    assert not device_scoring_eligible(net)
    monkeypatch.setenv("TNT_SEARCH_DEVICE", "1")
    assert device_scoring_eligible(net)
    # multi-node states never take the batched path
    net.svd("G", [0])
    assert not device_scoring_eligible(net)
    state = SearchState(net, 0.5)
    assert maybe_batched_svds(state, state.get_legal_actions()) == {}


def test_shape_diverse_tensor_uses_pow2_fallback(monkeypatch):
    """Many distinct oriented matricization shapes (distinct mode
    sizes) fall back to pow2 bucketing — bounded executables — and the
    factors still reconstruct each matricization exactly."""
    monkeypatch.setenv("TNT_SEARCH_DEVICE", "1")
    shape = (2, 3, 5, 7, 11)
    net = _net(shape=shape, seed=11)
    state = SearchState(net, 0.5)
    actions = state.get_legal_actions(True)
    assert len(actions) > 8  # enough bipartitions to trip the cap
    svds = batched_split_svds(net, actions)
    assert len(svds) == len(actions)
    data = np.asarray(net.node_tensor("G").value)
    free = net.free_indices()
    for action, (u, s, v) in svds.items():
        axes = [free.index(i) for i in action.indices]
        rest = [k for k in range(len(shape)) if k not in axes]
        mat = np.transpose(data, axes + rest).reshape(
            int(np.prod([data.shape[a] for a in axes])), -1
        )
        got = np.asarray(u) @ np.diag(np.asarray(s)) @ np.asarray(v)
        assert np.allclose(got, mat, atol=1e-10)


def test_device_scored_children_are_host_resident(monkeypatch):
    """Children committed from a device-scored root must carry HOST
    (numpy) node values: the batched path covers only the root state,
    and a leaked jnp factor would force every descendant matricization
    through svd_full's device branch (a fresh multi-second compile per
    shape through the relay) instead of the host-routed path."""
    import jax

    monkeypatch.setenv("TNT_SEARCH_DEVICE", "1")
    net = _net(shape=(4, 3, 6), seed=9)
    state = SearchState(net, 0.5)
    actions = state.get_legal_actions(True)
    svds = maybe_batched_svds(state, actions)
    # the host-keep branch in update_val_size is TPU-backend-gated;
    # fake it AFTER scoring so the commit path sees "tpu"
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert svds  # batched path engaged
    from tensor_networks_tpu.search.configuration import SearchConfig

    config = SearchConfig()
    children = list(
        state.take_action(actions[0], config, svd=svds[actions[0]])
    )
    assert children
    for child in children:
        for node in child.network.network.nodes:
            val = child.network.value(node)
            assert isinstance(val, np.ndarray), (
                f"device residency leaked into child node {node}: "
                f"{type(val)}"
            )


@pytest.mark.parametrize("kind", ["bfs", "dfs"])
def test_multinode_shared_scoring_counts_match(kind, monkeypatch):
    """Depth-3 searches expand multi-node states: the shared per-node
    orthonormalization + injected-svd path (scored_splits) must keep
    counts and best cost identical to the per-action path."""
    import dataclasses

    def run(force):
        if force is None:
            monkeypatch.delenv("TNT_SEARCH_DEVICE", raising=False)
        else:
            monkeypatch.setenv("TNT_SEARCH_DEVICE", force)
        net = _net(shape=(3, 4, 5, 6), seed=13)
        config = SearchConfig()
        config.engine.eps = 0.4
        config.engine.max_ops = 3
        engine = SearchEngine(config=config)
        return getattr(engine, kind)(net)

    host = run("0")
    shared = run("1")
    assert host["count"] == shared["count"], (
        host["count"], shared["count"],
    )
    assert np.isclose(
        host["best_network"].cost(), shared["best_network"].cost()
    )
