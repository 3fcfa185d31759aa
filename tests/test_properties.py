"""Property-based invariants over random tree networks.

Beyond the reference's fixed-seed oracle tests: every structural rewrite
must preserve the represented tensor, rounding must respect its error
contract, and algebra must match dense oracles for random topologies.
"""

import copy

import numpy as np
import pytest

from tensor_networks_tpu import Index, TensorNetwork, rand_tree, tt_svd_round


def _dense(net, reference_free):
    t = net.contract()
    free = net.free_indices()
    perm = [free.index(i) for i in reference_free]
    return np.asarray(t.value).transpose(perm)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_rewrites_preserve_tensor(seed):
    np.random.seed(seed)
    indices = [Index("x", 4), Index("y", 5), Index("z", 3)]
    net = rand_tree(indices, [2, 3, 2, 4])
    free = net.free_indices()
    dense = _dense(net, free)

    # svd split of a random node by a random bipartition
    nodes = list(net.network.nodes)
    node = nodes[np.random.randint(len(nodes))]
    n_axes = len(net.node_tensor(node).indices)
    if n_axes >= 2:
        lefts = [0]
        net.svd(node, lefts)
        assert np.allclose(_dense(net, free), dense, atol=1e-10)

    # merge a random edge
    edges = net.network.edges()
    u, v = edges[np.random.randint(len(edges))]
    net.merge(u, v)
    assert np.allclose(_dense(net, free), dense, atol=1e-10)

    # orthonormalize at a random node
    nodes = list(net.network.nodes)
    root = nodes[np.random.randint(len(nodes))]
    net.orthonormalize(root)
    assert np.allclose(_dense(net, free), dense, atol=1e-10)


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_round_error_contract(seed):
    """||X - round(X, delta)|| <= delta for the recursive tree rounding."""
    np.random.seed(seed)
    indices = [Index("x", 4), Index("y", 5), Index("z", 3)]
    net = rand_tree(indices, [3, 4, 3, 5])
    free = net.free_indices()
    dense = _dense(net, free)

    delta = 0.05 * net.norm()
    node = list(net.network.nodes)[0]
    net.round(node, delta)
    err = np.linalg.norm(_dense(net, free) - dense)
    assert err <= delta * 1.0000001


@pytest.mark.parametrize("seed", [20, 21, 22])
def test_tt_round_error_contract(seed):
    np.random.seed(seed)
    indices = [Index(f"x{i}", 5) for i in range(6)]
    a = TensorNetwork.rand_tt(indices, [3] * 5)
    b = TensorNetwork.rand_tt(indices, [2] * 5)
    s = a + b
    dense = np.asarray(s.contract().value)
    eps = 1e-2
    norm = float(np.linalg.norm(dense))
    s = tt_svd_round(s, eps)
    got = np.asarray(s.contract().value)
    assert np.linalg.norm(got - dense) <= eps * norm * 1.0000001


def test_evaluate_matches_contract_elements():
    np.random.seed(33)
    indices = [Index("x", 4), Index("y", 5), Index("z", 3)]
    net = rand_tree(indices, [2, 3, 2, 4])
    free = net.free_indices()
    dense = _dense(net, free)
    pts = np.stack(
        np.meshgrid(*[range(i.size) for i in free], indexing="ij"), -1
    ).reshape(-1, 3)
    vals = np.asarray(net.evaluate(free, pts))
    assert np.allclose(vals, dense.ravel(), atol=1e-11)


def test_deepcopy_independent_metadata_shared_buffers():
    np.random.seed(44)
    indices = [Index("x", 4), Index("y", 5), Index("z", 3)]
    net = rand_tree(indices, [2, 3, 2, 4])
    clone = copy.deepcopy(net)
    # metadata independent: renaming the clone leaves the original alone
    clone.rename_indices({"x": "xx"})
    assert Index("x", 4) in net.free_indices()
    assert Index("xx", 4) in clone.free_indices()
    # same represented tensor
    assert np.isclose(clone.norm(), net.norm(), rtol=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_packed_operator_algebra_identities(seed):
    """The packed TT-operator algebra satisfies its ring identities on
    random shapes: (A@B)^T = B^T @ A^T, associativity of compose,
    identity as two-sided unit, and eps-rounding of sums/products
    preserving the applied action."""
    import jax.numpy as jnp

    from tensor_networks_tpu.ops import packed as pk

    g = np.random.default_rng(seed)
    d = int(g.integers(4, 8))
    n = int(g.integers(2, 5))

    def rand_op(R):
        return pk.PackedTTOp(
            jnp.asarray(g.standard_normal((n, n, R))),
            jnp.asarray(g.standard_normal((d - 2, R, n, n, R))),
            jnp.asarray(g.standard_normal((R, n, n))),
        )

    A, B, C = rand_op(2), rand_op(3), rand_op(2)
    x = pk.PackedTT(
        jnp.asarray(g.standard_normal((n, 3))),
        jnp.asarray(g.standard_normal((d - 2, 3, n, 3))),
        jnp.asarray(g.standard_normal((3, n))),
    )

    def rel(y, z):
        return float(pk.norm_exact(pk.add(y, pk.scale(z, -1.0)))) / max(
            float(pk.norm_exact(z)), 1e-300
        )

    ap = pk.ttop_apply_packed
    # adjoint of a product reverses it
    y1 = ap(pk.ttop_transpose(pk.ttop_compose(A, B)), x)
    y2 = ap(pk.ttop_compose(pk.ttop_transpose(B), pk.ttop_transpose(A)), x)
    assert rel(y1, y2) < 1e-10
    # associativity
    y1 = ap(pk.ttop_compose(pk.ttop_compose(A, B), C), x)
    y2 = ap(pk.ttop_compose(A, pk.ttop_compose(B, C)), x)
    assert rel(y1, y2) < 1e-10
    # identity is a two-sided unit
    I = pk.ttop_identity(d, n)
    assert rel(ap(pk.ttop_compose(A, I), x), ap(A, x)) < 1e-10
    assert rel(ap(pk.ttop_compose(I, A), x), ap(A, x)) < 1e-10
    # rounding a sum/product preserves the action
    S = pk.ttop_round(pk.ttop_add(A, B), 1e-12)
    assert rel(ap(S, x), pk.add(ap(A, x), ap(B, x))) < 1e-9
    P = pk.ttop_round(pk.ttop_compose(A, B), 1e-12)
    assert rel(ap(P, x), ap(A, ap(B, x))) < 1e-9
