"""Structure-search tests — parity with the reference suite
(``tests/search_test.py``), including the exact visited-state counts that
pin enumeration order and dedup semantics."""

import json

import numpy as np

from tensor_networks_tpu import Index, Tensor, TensorNetwork
from tensor_networks_tpu.search import (
    ISplit,
    OSplit,
    SearchConfig,
    SearchEngine,
    SearchState,
)


class TestConfig:
    def test_config_load(self):
        config_str = json.dumps(
            {
                "synthesizer": {"action_type": "isplit"},
                "rank_search": {"fit_mode": "all", "k": 3},
            }
        )
        config = SearchConfig.load(config_str)
        assert config.synthesizer.action_type == "isplit"
        assert config.rank_search.fit_mode == "all"
        assert config.rank_search.k == 3


class TestAction:
    def test_isplit_equality(self):
        a1 = ISplit("n1", [0, 1])
        a3 = ISplit("n1", [0])
        a4 = ISplit("n2", [0, 1])
        assert a1 != a3
        assert a1 != a4

    def test_osplit_equality(self):
        a1 = OSplit([Index("I0", 1), Index("I1", 2)])
        a2 = OSplit([Index("I0", 1)])
        a3 = OSplit([Index("I1", 2), Index("I0", 1)])
        assert a1 != a2
        assert a1 == a3

    def test_osplit_inequality(self):
        a1 = OSplit([Index("I0", 1), Index("I1", 2)])
        a2 = OSplit([Index("I0", 1)])
        a3 = OSplit([Index("I2", 2), Index("I0", 1)])
        assert a2 < a1
        assert a1 < a3

    def test_isplit_execution(self):
        data = np.random.randn(3, 4, 5, 6)
        indices = [
            Index("i", 3),
            Index("j", 4),
            Index("k", 5),
            Index("l", 6),
        ]
        net = TensorNetwork()
        net.add_node("G", Tensor(data, indices))

        (u, s, v), _ = ISplit("G", [0, 1]).execute(net)
        assert net.value(u).shape == (3, 4, 12)
        assert net.value(s).shape == (12, 12)
        assert net.value(v).shape == (12, 5, 6)

        net.merge(v, s)
        (u, s, v), _ = ISplit("G", [0]).execute(net)
        assert net.value(u).shape == (3, 3)
        assert net.value(s).shape == (3, 3)
        assert net.value(v).shape == (3, 4, 12)

    def test_osplit_execution(self):
        data = np.random.randn(3, 4, 5, 6)
        indices = [
            Index("i", 3),
            Index("j", 4),
            Index("k", 5),
            Index("l", 6),
        ]
        net = TensorNetwork()
        net.add_node("G", Tensor(data, indices))

        (u, s, v), _ = OSplit([Index("i", 3), Index("k", 5)]).execute(net)
        assert net.value(u).shape == (3, 5, 15)
        assert net.value(s).shape == (15, 15)
        assert net.value(v).shape == (15, 4, 6)

        net.merge(v, s)
        (u, s, v), _ = OSplit([Index("i", 3)]).execute(net)
        assert net.value(u).shape == (3, 3)
        assert net.value(s).shape == (3, 3)
        assert net.value(v).shape == (3, 5, 15)


class TestState:
    def test_legal_actions(self):
        data = np.random.randn(3, 4, 5)
        indices = [Index("i", 3), Index("j", 4), Index("k", 5)]
        net = TensorNetwork()
        net.add_node("G", Tensor(data, indices))
        init_state = SearchState(net, net.norm() * 0.1)

        assert init_state.get_legal_actions() == [
            ISplit("G", [0]),
            ISplit("G", [1]),
            ISplit("G", [2]),
        ]
        assert init_state.get_legal_actions(True) == [
            OSplit([Index("i", 3)]),
            OSplit([Index("j", 4)]),
            OSplit([Index("k", 5)]),
        ]

        ac = ISplit("G", [0])
        for new_st in init_state.take_action(ac, config=SearchConfig()):
            assert new_st.get_legal_actions() == [
                ISplit("n0", [0]),
                ISplit("n0", [1]),
                ISplit("n0", [2]),
                ISplit("G", [0]),
            ]

        ac = OSplit([Index("i", 3)])
        for new_st in init_state.take_action(ac, config=SearchConfig()):
            assert new_st.get_legal_actions(True) == [
                OSplit([Index("j", 4)]),
                OSplit([Index("k", 5)]),
            ]


class TestSearch:
    def setup_method(self):
        np.random.seed(1)
        data = np.random.randn(3, 4, 5)
        indices = [Index("i", 3), Index("j", 4), Index("k", 5)]
        self.net = TensorNetwork()
        self.net.add_node("G", Tensor(data, indices))

    def _check_best(self, stats):
        free_indices = self.net.free_indices()
        bn = stats["best_network"]
        bn_indices = bn.free_indices()
        perm = [bn_indices.index(ind) for ind in free_indices]
        bn_val = np.asarray(bn.contract().permute(perm).value)
        target = np.asarray(self.net.contract().value)
        assert np.linalg.norm(target - bn_val) <= 0.5 * self.net.norm()
        assert bn.cost() <= self.net.cost()

    def test_dfs(self):
        config = SearchConfig()
        config.engine.eps = 0.5
        config.engine.verbose = True
        stats = SearchEngine(config=config).dfs(self.net)
        assert stats["count"] == 8
        self._check_best(stats)

    def test_bfs(self):
        config = SearchConfig()
        config.engine.eps = 0.5
        config.engine.verbose = True
        stats = SearchEngine(config=config).bfs(self.net)
        assert stats["count"] == 7
        self._check_best(stats)

    def test_partition(self):
        config = SearchConfig()
        config.engine.eps = 0.5
        config.engine.verbose = True
        stats = SearchEngine(config=config).partition_search(self.net)
        assert stats["count"] == 7
        self._check_best(stats)

    def test_partition_all(self):
        config = SearchConfig()
        config.engine.eps = 0.5
        config.engine.verbose = True
        config.rank_search.fit_mode = "all"
        stats = SearchEngine(config=config).partition_search(self.net)
        assert stats["count"] == 7
        self._check_best(stats)
