"""Tensor-train constructors, orthogonalization, sums, and TT-operators.

Parity reference: ``pytens/algs.py`` — tt_rank1 :1592, tt_separable :1621,
tt_right_orth :1654, tt_sum :2535, ttop_rank1/rank2/sum :2383/:2428/:2479,
ttop_apply :2662, ttop_sum_apply :2588, rand_tree :2796.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensor_networks_tpu.kernels import qr_reduced_padded
from tensor_networks_tpu.network import TensorNetwork
from tensor_networks_tpu.tensor import Tensor
from tensor_networks_tpu.types import Index, NodeName


# -- constructors -------------------------------------------------------------


def tt_rank1(indices: List[Index], vals: List[np.ndarray]) -> TensorNetwork:
    """Rank-1 TT from one vector per dimension."""
    dim = len(indices)
    tt = TensorNetwork()
    bonds = [Index("r1", 1)]
    tt.add_node(
        0, Tensor(jnp.asarray(vals[0])[:, None], [indices[0], bonds[0]])
    )
    for ii, index in enumerate(indices[1:-1]):
        bonds.append(Index(f"r{ii + 2}", 1))
        tt.add_node(
            ii + 1,
            Tensor(
                jnp.asarray(vals[ii + 1])[None, :, None],
                [bonds[ii], index, bonds[ii + 1]],
            ),
        )
        tt.add_edge(ii, ii + 1)
    tt.add_node(
        dim - 1,
        Tensor(jnp.asarray(vals[-1])[None, :], [bonds[-1], indices[-1]]),
    )
    tt.add_edge(dim - 2, dim - 1)
    return tt


def tt_separable(
    indices: List[Index], funcs: List[np.ndarray]
) -> TensorNetwork:
    """Rank-2 TT representing a sum of univariate functions."""
    dim = len(indices)
    tt = TensorNetwork()
    bonds: List[Index] = []
    for ii, index in enumerate(indices):
        bonds.append(Index(f"r_{ii + 1}", 2))
        f = np.asarray(funcs[ii])
        if ii == 0:
            val = np.ones((index.size, 2))
            val[:, 0] = f
            tt.add_node(ii, Tensor(jnp.asarray(val), [index, bonds[-1]]))
        elif ii < dim - 1:
            val = np.zeros((2, index.size, 2))
            val[0, :, 0] = 1.0
            val[1, :, 0] = f
            val[1, :, 1] = 1.0
            tt.add_node(
                ii, Tensor(jnp.asarray(val), [bonds[-2], index, bonds[-1]])
            )
        else:
            val = np.ones((2, index.size))
            val[1, :] = f
            tt.add_node(ii, Tensor(jnp.asarray(val), [bonds[-2], index]))
        if ii > 0:
            tt.add_edge(ii - 1, ii)
    return tt


def rand_tree(indices: List[Index], ranks: List[int]) -> TensorNetwork:
    """A random tree tensor network over a uniformly sampled topology."""
    ndims = len(indices)
    num_of_nodes = len(ranks) + 1
    assert ndims <= num_of_nodes

    ranks = list(ranks)
    np.random.shuffle(ranks)
    nodes_with_free = np.random.choice(
        num_of_nodes, len(indices), replace=False
    )

    parent: Dict[int, Tuple[NodeName, int]] = {}
    pool = list(range(num_of_nodes))
    while len(pool) > 1:
        node = np.random.choice(pool, 1)[0]
        pool.remove(node)

        p = np.random.choice(num_of_nodes, 1)[0]
        while p == node:
            p = np.random.choice(num_of_nodes, 1)[0]
        ancestor = p
        while ancestor in parent:
            ancestor, _ = parent[ancestor]
            if ancestor == node:
                p = np.random.choice(num_of_nodes, 1)[0]
                while p == node:
                    p = np.random.choice(num_of_nodes, 1)[0]
                ancestor = p
        parent[node] = (p, len(pool) - 1)

    tree = TensorNetwork()
    for i in range(num_of_nodes):
        i_indices: List[Index] = []
        i_dims: List[int] = []
        if i in nodes_with_free:
            idx = list(nodes_with_free).index(i)
            i_indices.append(indices[idx])
            i_dims.append(indices[idx].size)
        if i in parent:
            _, ridx = parent[i]
            i_indices.append(Index(f"r_{ridx}", ranks[ridx]))
            i_dims.append(ranks[ridx])
        for p, ridx in parent.values():
            if p == i:
                i_indices.append(Index(f"r_{ridx}", ranks[ridx]))
                i_dims.append(ranks[ridx])
        tree.add_node(
            i, Tensor(jnp.asarray(np.random.randn(*i_dims)), i_indices)
        )
    for i, (p, _) in parent.items():
        tree.add_edge(i, p)
    return tree


# -- orthogonalization --------------------------------------------------------


def tt_right_orth(tn: TensorNetwork, node: int) -> TensorNetwork:
    """Right-orthogonalize core ``node`` of a TT, pushing its R factor into
    core ``node - 1``.  Zero-pads when the core is rank-deficient so bond
    dimensions never change.  Modifies the network in place."""
    val = tn.value(node)
    if val.ndim == 3:
        r, n, b = val.shape
        mat = val.reshape(r, n * b)
        q, rr = qr_reduced_padded(mat.T, r)
        new_val = q.T.reshape(r, n, b)
        tn.node_tensor(node).update_val_size(new_val)
    else:
        q, rr = qr_reduced_padded(val.T, val.shape[0])
        tn.node_tensor(node).update_val_size(q.T)

    prev = tn.value(node - 1)
    tn.node_tensor(node - 1).update_val_size(jnp.dot(prev, rr.T))
    return tn


# -- TT sums -------------------------------------------------------------------


def tt_sum(tt_in: List[TensorNetwork]) -> TensorNetwork:
    """Exact k-ary TT sum: first/last cores concatenate, middle cores embed
    block-diagonally."""
    tt_out = TensorNetwork()
    dim = tt_in[0].dim()
    for ii, node in enumerate(tt_in[0].network.nodes):
        inds = tt_in[0].node_tensor(node).indices
        core_values = [tt.value(node) for tt in tt_in]

        if ii == 0:
            new_value = jnp.concatenate(core_values, axis=1)
            new_inds = [
                Index(inds[0].name, inds[0].size),
                Index("rank_0", new_value.shape[1]),
            ]
        elif ii == dim - 1:
            new_value = jnp.concatenate(core_values, axis=0)
            new_inds = [
                Index(f"rank_{ii - 1}", new_value.shape[0]),
                Index(inds[1].name, inds[1].size),
            ]
        else:
            rank_left = sum(v.shape[0] for v in core_values)
            rank_right = sum(v.shape[2] for v in core_values)
            new_value = jnp.zeros(
                (rank_left, core_values[0].shape[1], rank_right),
                dtype=core_values[0].dtype,
            )
            off_l = off_r = 0
            for cv in core_values:
                new_value = new_value.at[
                    off_l : off_l + cv.shape[0],
                    :,
                    off_r : off_r + cv.shape[2],
                ].set(cv)
                off_l += cv.shape[0]
                off_r += cv.shape[2]
            new_inds = [
                Index(f"rank_{ii - 1}", rank_left),
                Index(inds[1].name, inds[1].size),
                Index(f"rank_{ii}", rank_right),
            ]

        tt_out.add_node(ii, Tensor(new_value, new_inds))
        if ii > 0:
            tt_out.add_edge(ii - 1, ii)
    return tt_out


# -- TT operators ----------------------------------------------------------------


def ttop_rank1(
    indices_in: List[Index],
    indices_out: List[Index],
    cores: List[np.ndarray],
    rank_name_prefix: str,
) -> TensorNetwork:
    """Rank-1 TT-operator (matrix TT) from one matrix per dimension."""
    assert len(indices_in) == len(indices_out)
    dim = len(indices_in)
    tt_op = TensorNetwork()

    bonds = [Index(f"{rank_name_prefix}_r1", 1)]
    tt_op.add_node(
        0,
        Tensor(
            jnp.asarray(cores[0])[:, :, None],
            [indices_out[0], indices_in[0], bonds[0]],
        ),
    )
    for ii in range(1, dim):
        bonds.append(Index(f"{rank_name_prefix}_r{ii + 1}", 1))
        if ii < dim - 1:
            tt_op.add_node(
                ii,
                Tensor(
                    jnp.asarray(cores[ii])[None, :, :, None],
                    [bonds[ii - 1], indices_out[ii], indices_in[ii], bonds[ii]],
                ),
            )
        else:
            tt_op.add_node(
                ii,
                Tensor(
                    jnp.asarray(cores[ii])[None, :, :],
                    [bonds[ii - 1], indices_out[ii], indices_in[ii]],
                ),
            )
        tt_op.add_edge(ii - 1, ii)
    return tt_op


def ttop_rank2(
    indices_in: List[Index],
    indices_out: List[Index],
    cores_r1: List[np.ndarray],
    cores_r2: List[np.ndarray],
    rank_name_prefix: str,
) -> TensorNetwork:
    """Sum of two rank-1 TT-operators as a rank-2 TT-operator."""
    return ttop_sum(
        indices_in, indices_out, [cores_r1, cores_r2], rank_name_prefix
    )


def ttop_sum(
    indices_in: List[Index],
    indices_out: List[Index],
    cores: List[List[np.ndarray]],
    rank_name_prefix: str,
) -> TensorNetwork:
    """Sum of k rank-1 TT-operators: rank-k operator with block-diagonal
    middle cores."""
    assert len(indices_in) == len(indices_out)
    dim = len(indices_in)
    num_sum = len(cores)
    tt_op = TensorNetwork()

    bonds = [Index(f"{rank_name_prefix}_r1", num_sum)]
    first = np.zeros((indices_out[0].size, indices_in[0].size, num_sum))
    for jj in range(num_sum):
        first[:, :, jj] = cores[jj][0]
    tt_op.add_node(
        0,
        Tensor(jnp.asarray(first), [indices_out[0], indices_in[0], bonds[0]]),
    )
    for ii in range(1, dim):
        bonds.append(Index(f"{rank_name_prefix}_r{ii + 1}", num_sum))
        if ii < dim - 1:
            core = np.zeros(
                (num_sum, indices_out[ii].size, indices_in[ii].size, num_sum)
            )
            for jj in range(num_sum):
                core[jj, :, :, jj] = cores[jj][ii]
            tt_op.add_node(
                ii,
                Tensor(
                    jnp.asarray(core),
                    [bonds[ii - 1], indices_out[ii], indices_in[ii], bonds[ii]],
                ),
            )
        else:
            core = np.zeros(
                (num_sum, indices_out[ii].size, indices_in[ii].size)
            )
            for jj in range(num_sum):
                core[jj, :, :] = cores[jj][ii]
            tt_op.add_node(
                ii,
                Tensor(
                    jnp.asarray(core),
                    [bonds[ii - 1], indices_out[ii], indices_in[ii]],
                ),
            )
        tt_op.add_edge(ii - 1, ii)
    return tt_op


@jax.jit
def _ttop_first(op, v):
    # op: (n_out, n_in, rop); v: (n_in, r) -> (n_out, r * rop)
    out = jnp.einsum("ijk,jl->ilk", op, v)
    return out.reshape(out.shape[0], -1)


@jax.jit
def _ttop_mid(op, v):
    # op: (rop1, n_out, n_in, rop2); v: (r1, n_in, r2)
    out = jnp.einsum("ijkl,mkp->mijpl", op, v)
    s = out.shape
    return out.reshape(s[0] * s[1], s[2], s[3] * s[4])


@jax.jit
def _ttop_last(op, v):
    # op: (rop, n_out, n_in); v: (r, n_in)
    out = jnp.einsum("ijk,mk->mij", op, v)
    s = out.shape
    return out.reshape(s[0] * s[1], -1)


def ttop_apply(ttop: TensorNetwork, tt_in: TensorNetwork) -> TensorNetwork:
    """Apply a TT-operator to a TT: per-core contraction with rank-product
    reshape.  Each core shape hits a cached jitted kernel."""
    import copy as _copy

    tt = _copy.deepcopy(tt_in)
    dim = tt.dim()
    for ii, (node_op, node_tt) in enumerate(
        zip(ttop.network.nodes, tt.network.nodes)
    ):
        op = ttop.value(node_op)
        v = tt.value(node_tt)
        if ii == 0:
            new_core = _ttop_first(op, v)
        elif ii < dim - 1:
            new_core = _ttop_mid(op, v)
        else:
            new_core = _ttop_last(op, v)
        tt.node_tensor(node_tt).update_val_size(new_core)
    return tt


def ttop_sum_apply(
    tt_in: TensorNetwork,
    indices_in: List[Index],
    indices_out: List[Index],
    cores: List[List[Callable]],
    rank_name_prefix: str,
) -> TensorNetwork:
    """Apply a lazily-defined sum of rank-1 TT-operators (a callable per
    core per summand) without materializing the operator."""
    assert len(indices_in) == len(indices_out)
    dim = len(indices_in)
    num_sum = len(cores)
    tt_out = TensorNetwork()

    node_list = list(tt_in.network.nodes)
    v = tt_in.value(node_list[0])
    bonds = [Index(f"{rank_name_prefix}_r1", num_sum * v.shape[1])]
    blocks = []
    for jj in range(num_sum):
        new_core = jnp.asarray(cores[jj][0](v))
        blocks.append(new_core.reshape(indices_out[0].size, -1))
    tt_out.add_node(
        0,
        Tensor(jnp.concatenate(blocks, axis=1), [indices_out[0], bonds[0]]),
    )

    for ii, node_tt in enumerate(node_list[1:], start=1):
        v = tt_in.value(node_tt)
        if ii < dim - 1:
            bonds.append(
                Index(f"{rank_name_prefix}_r{ii + 1}", v.shape[2] * num_sum)
            )
            core = jnp.zeros(
                (num_sum * v.shape[0], indices_out[ii].size,
                 num_sum * v.shape[2]),
                dtype=v.dtype,
            )
            off1 = off2 = 0
            for jj in range(num_sum):
                blk = jnp.asarray(cores[jj][ii](v))
                blk = blk.reshape(blk.shape[0], blk.shape[1], blk.shape[2])
                core = core.at[
                    off1 : off1 + blk.shape[0], :, off2 : off2 + blk.shape[2]
                ].set(blk)
                off1 += blk.shape[0]
                off2 += blk.shape[2]
            tt_out.add_node(
                ii, Tensor(core, [bonds[ii - 1], indices_out[ii], bonds[ii]])
            )
        else:
            rows = []
            for jj in range(num_sum):
                rows.append(jnp.asarray(cores[jj][ii](v)))
            tt_out.add_node(
                ii,
                Tensor(
                    jnp.concatenate(rows, axis=0),
                    [bonds[ii - 1], indices_out[ii]],
                ),
            )
        tt_out.add_edge(ii - 1, ii)
    return tt_out
