"""Tree tensor-network tests — parity with the reference suite
(``tests/main_test.py`` TestTree), same tolerances."""

import numpy as np
import pytest

from tensor_networks_tpu import Index, Tensor, TensorNetwork, rand_tree


def A(x):
    return np.asarray(x)


@pytest.fixture
def tree():
    np.random.seed(100)
    x = Index("x", 5)
    u = Index("u", 10)
    v = Index("v", 20)
    return rand_tree([x, u, v], [1, 2, 3, 4, 5])


def _contract_permuted(net, reference_free):
    t = net.contract()
    free = net.free_indices()
    perm = [free.index(i) for i in reference_free]
    return A(t.value).transpose(perm)


class TestTree:
    def test_tree_split(self, tree):
        original_free = tree.free_indices()
        original = A(tree.contract().value)
        tree.svd(4, [0, 2])
        after = _contract_permuted(tree, original_free)
        assert np.allclose(original, after, atol=1e-5, rtol=1e-5)

    def test_tree_split_free(self, tree):
        original_free = tree.free_indices()
        original = A(tree.contract().value)
        tree.svd(3, [0, 1])
        after = _contract_permuted(tree, original_free)
        assert np.allclose(original, after, atol=1e-5, rtol=1e-5)

    def test_tree_merge(self, tree):
        original_free = tree.free_indices()
        original = A(tree.contract().value)
        tree.merge(2, 3)
        after = _contract_permuted(tree, original_free)
        assert np.allclose(original, after, atol=1e-5, rtol=1e-5)

    def test_tree_orthonorm(self, tree):
        original_indices = tree.free_indices()
        original = A(tree.contract().value)

        root = tree.orthonormalize(3)
        after = _contract_permuted(tree, original_indices)
        assert np.allclose(after, original, atol=1e-5, rtol=1e-5)

        # every environment subtree of the root must be an isometry
        for n in list(tree.network.neighbors(root)):
            tree.network.remove_edge(root, n)
            reachable = tree.network.reachable_from(n)
            subnet = TensorNetwork()
            subnet.network = tree.network.subgraph(reachable)
            sub_norm = subnet.norm()
            # norm^2 of an isometric subnetwork equals the bond dimension
            bond = tree.get_contraction_index(root, n)[0]
            assert np.isclose(sub_norm**2, bond.size, atol=1e-8)
            tree.network.add_edge(root, n)

    def test_tree_canonicalize(self):
        x = np.random.randn(3, 4, 5)
        single1 = TensorNetwork()
        single1.add_node(
            "x", Tensor(x, [Index("i", 3), Index("j", 4), Index("k", 5)])
        )
        single2 = TensorNetwork()
        single2.add_node(
            "y",
            Tensor(
                x.transpose(1, 0, 2),
                [Index("j", 4), Index("i", 3), Index("k", 5)],
            ),
        )
        assert (
            single1.canonical_structure() == single2.canonical_structure()
        )

        # symmetry under child reordering and index permutation
        tree1 = TensorNetwork()
        u = np.random.randn(2, 3, 4)
        v = np.random.randn(4, 5, 6)
        root = np.random.randn(2, 4, 3)
        tree1.add_node(
            "root",
            Tensor(root, [Index("iu", 2), Index("iv", 4), Index("f", 3)]),
        )
        tree1.add_node(
            "u", Tensor(u, [Index("iu", 2), Index("ju", 3), Index("ku", 4)])
        )
        tree1.add_node(
            "v", Tensor(v, [Index("iv", 4), Index("jv", 5), Index("kv", 6)])
        )
        tree1.add_edge("root", "u")
        tree1.add_edge("root", "v")

        tree2 = TensorNetwork()
        tree2.add_node(
            "root",
            Tensor(
                root.transpose(1, 0, 2),
                [Index("iv", 4), Index("iu", 2), Index("f", 3)],
            ),
        )
        tree2.add_node(
            "u",
            Tensor(
                u.transpose(1, 2, 0),
                [Index("ju", 3), Index("ku", 4), Index("iu", 2)],
            ),
        )
        tree2.add_node(
            "v",
            Tensor(
                v.transpose(2, 0, 1),
                [Index("kv", 6), Index("iv", 4), Index("jv", 5)],
            ),
        )
        tree2.add_edge("root", "u")
        tree2.add_edge("root", "v")
        assert tree1.canonical_structure() == tree2.canonical_structure()

        # different free-index sizes must hash differently
        tt1 = TensorNetwork()
        tt1.add_node(
            "u",
            Tensor(np.random.randn(2, 3), [Index("iu", 2), Index("uv", 3)]),
        )
        tt1.add_node(
            "v",
            Tensor(
                np.random.randn(3, 4, 5),
                [Index("uv", 3), Index("jv", 4), Index("vw", 5)],
            ),
        )
        tt1.add_node(
            "w",
            Tensor(np.random.randn(5, 6), [Index("vw", 5), Index("jw", 6)]),
        )
        tt1.add_edge("u", "v")
        tt1.add_edge("v", "w")

        tt2 = TensorNetwork()
        tt2.add_node(
            "u",
            Tensor(np.random.randn(4, 3), [Index("iu", 4), Index("uv", 3)]),
        )
        tt2.add_node(
            "v",
            Tensor(
                np.random.randn(3, 2, 5),
                [Index("uv", 3), Index("jv", 2), Index("vw", 5)],
            ),
        )
        tt2.add_node(
            "w",
            Tensor(np.random.randn(5, 6), [Index("vw", 5), Index("jw", 6)]),
        )
        tt2.add_edge("u", "v")
        tt2.add_edge("v", "w")
        assert tt1.canonical_structure() != tt2.canonical_structure()


def _two_node_net(seed=None):
    x = np.random.randn(2, 13, 14)
    net1 = TensorNetwork()
    net1.add_node(
        "x", Tensor(x, [Index("a", 2), Index("i", 13), Index("j", 14)])
    )
    net1.add_node(
        "u", Tensor(np.random.randn(2, 15), [Index("a", 2), Index("k", 15)])
    )
    net1.add_edge("x", "u")

    net2 = TensorNetwork()
    net2.add_node(
        "y",
        Tensor(
            np.random.randn(3, 13, 14),
            [Index("b", 3), Index("i", 13), Index("j", 14)],
        ),
    )
    net2.add_node(
        "v", Tensor(np.random.randn(3, 15), [Index("b", 3), Index("k", 15)])
    )
    net2.add_edge("y", "v")
    return net1, net2


def _star_nets():
    net1 = TensorNetwork()
    net1.add_node(
        "x",
        Tensor(
            np.random.randn(1, 2, 3, 4),
            [Index("a", 1), Index("b", 2), Index("c", 3), Index("d", 4)],
        ),
    )
    for name, (r, sz, rn, fn) in {
        "u1": (1, 13, "a", "i"),
        "u2": (2, 14, "b", "j"),
        "u3": (3, 15, "c", "k"),
        "u4": (4, 16, "d", "l"),
    }.items():
        net1.add_node(
            name,
            Tensor(np.random.randn(r, sz), [Index(rn, r), Index(fn, sz)]),
        )
        net1.add_edge("x", name)

    net2 = TensorNetwork()
    net2.add_node(
        "y",
        Tensor(
            np.random.randn(2, 3, 4, 5),
            [Index("e", 2), Index("f", 3), Index("g", 4), Index("h", 5)],
        ),
    )
    for name, (r, sz, rn, fn) in {
        "v1": (2, 13, "e", "i"),
        "v2": (3, 14, "f", "j"),
        "v3": (4, 15, "g", "k"),
        "v4": (5, 16, "h", "l"),
    }.items():
        net2.add_node(
            name,
            Tensor(np.random.randn(r, sz), [Index(rn, r), Index(fn, sz)]),
        )
        net2.add_edge("y", name)
    return net1, net2


def _deep_nets(mul=False):
    net1 = TensorNetwork()
    net1.add_node(
        "x" if not mul else "u0",
        Tensor(
            np.random.randn(13, 14, 2, 5),
            [Index("i", 13), Index("j", 14), Index("a", 2), Index("b", 5)],
        ),
    )
    n0 = "x" if not mul else "u0"
    net1.add_node(
        "u1", Tensor(np.random.randn(2, 15), [Index("d", 2), Index("k", 15)])
    )
    net1.add_node(
        "u2",
        Tensor(
            np.random.randn(5, 16),
            [Index("b", 5), Index("m" if not mul else "l", 16)],
        ),
    )
    net1.add_node(
        "u3",
        Tensor(
            np.random.randn(2, 3, 2),
            [Index("a", 2), Index("c", 3), Index("d", 2)],
        ),
    )
    net1.add_node(
        "u4",
        Tensor(
            np.random.randn(3, 17),
            [Index("c", 3), Index("l" if not mul else "m", 17)],
        ),
    )
    net1.add_edge(n0, "u3")
    net1.add_edge(n0, "u2")
    net1.add_edge("u3", "u1")
    net1.add_edge("u3", "u4")

    net2 = TensorNetwork()
    m0 = "y" if not mul else "v0"
    net2.add_node(
        m0,
        Tensor(
            np.random.randn(13, 14, 1, 2),
            [Index("i", 13), Index("j", 14), Index("aa", 1), Index("bb", 2)],
        ),
    )
    net2.add_node(
        "v1",
        Tensor(np.random.randn(3, 15), [Index("dd", 3), Index("k", 15)]),
    )
    net2.add_node(
        "v2",
        Tensor(
            np.random.randn(2, 16),
            [Index("bb", 2), Index("m" if not mul else "l", 16)],
        ),
    )
    net2.add_node(
        "v3",
        Tensor(
            np.random.randn(1, 2, 3),
            [Index("aa", 1), Index("cc", 2), Index("dd", 3)],
        ),
    )
    net2.add_node(
        "v4",
        Tensor(
            np.random.randn(2, 17),
            [Index("cc", 2), Index("l" if not mul else "m", 17)],
        ),
    )
    net2.add_edge(m0, "v2")
    net2.add_edge(m0, "v3")
    net2.add_edge("v3", "v1")
    net2.add_edge("v3", "v4")
    return net1, net2, n0


class TestTreeBinaryOps:
    def test_add1(self):
        net1, net2 = _two_node_net()
        t12 = A(net1.contract().value) + A(net2.contract().value)
        net12 = net1 + net2
        net12.round("x", net12.norm() * 1e-10)
        got = _contract_permuted(net12, net1.free_indices())
        assert np.allclose(got, t12)

    def test_add2(self):
        net1, net2 = _star_nets()
        t12 = A(net1.contract().value) + A(net2.contract().value)
        net12 = net1 + net2
        net12.round("x", net12.norm() * 1e-10)
        got = _contract_permuted(net12, net1.free_indices())
        assert np.allclose(t12, got, rtol=1e-10, atol=1e-10)

    def test_add3(self):
        net1, net2, n0 = _deep_nets()
        t12 = A(net1.contract().value) + A(net2.contract().value)
        net12 = net1 + net2
        net12.round(n0, net12.norm() * 1e-10)
        got = _contract_permuted(net12, net1.free_indices())
        assert np.allclose(t12, got, rtol=1e-10, atol=1e-10)

    def test_add4(self):
        net1, _, n0 = _deep_nets()
        t11 = 2 * A(net1.contract().value)
        net11 = net1 + net1
        net11.round(n0, net11.norm() * 1e-10)
        got = _contract_permuted(net11, net1.free_indices())
        assert np.allclose(got, t11, rtol=1e-10, atol=1e-10)
        assert net11.get_contraction_index("u3", "u1")[0].size == 2
        assert net11.get_contraction_index(n0, "u2")[0].size == 5
        assert net11.get_contraction_index(n0, "u3")[0].size == 2
        assert net11.get_contraction_index("u4", "u3")[0].size == 3

    def test_mul1(self):
        net1, net2 = _two_node_net()
        t12 = A(net1.contract().value) * A(net2.contract().value)
        net12 = net1 * net2
        net12.round("x", net12.norm() * 1e-10)
        got = _contract_permuted(net12, net1.free_indices())
        assert np.allclose(got, t12, rtol=1e-10, atol=1e-10)

    def test_mul2(self):
        net1, net2 = _star_nets()
        t12 = A(net1.contract().value) * A(net2.contract().value)
        net12 = net1 * net2
        net12.round("x", net12.norm() * 1e-10)
        got = _contract_permuted(net12, net1.free_indices())
        assert np.allclose(t12, got, rtol=1e-10, atol=1e-10)

    def test_mul3(self):
        net1, net2, n0 = _deep_nets(mul=True)
        t12 = A(net1.contract().value) * A(net2.contract().value)
        net12 = net1 * net2
        net12.round(n0, net12.norm() * 1e-10)
        got = _contract_permuted(net12, net1.free_indices())
        assert np.allclose(t12, got, rtol=1e-10, atol=1e-10)
