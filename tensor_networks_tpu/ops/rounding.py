"""TT rounding: SVD-sweep, Gram-SVD, TT-sum Gram-SVD, and randomized.

Four families, matching the reference's capabilities
(``pytens/algs.py:1654-2381``):

* :func:`tt_svd_round` — right-orthogonalize then forward delta-SVD sweep,
  threading the remaining error budget (TTSVD, Oseledets 2011).
* :func:`tt_gramsvd_round` — Gram-matrix eigendecomposition rounding
  (Al Daas/Ballard/Manning, IPDPS'22): eigh + GEMMs only, no pivoting —
  the most TPU-friendly exact method.
* :func:`tt_sum_gramsvd_round` — the same applied to an *implicit* sum of
  TTs, exploiting block-diagonal core structure without materializing it.
* :class:`TTRandRound` — randomized sketching (arXiv:2110.04393): all-GEMM
  with fixed target ranks, hence fully static shapes under jit.
"""

from __future__ import annotations

import copy
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from tensor_networks_tpu.kernels import delta_svd, gram_eig_and_svd, qr_reduced
from tensor_networks_tpu.network import TensorNetwork
from tensor_networks_tpu.ops.tt import tt_right_orth


# -- SVD-sweep rounding ---------------------------------------------------------


@jax.jit
def _scale_next(v_mat: jnp.ndarray, next_core: jnp.ndarray) -> jnp.ndarray:
    """Push the (s @ v) factor into the next core along its first axis."""
    return jnp.tensordot(v_mat, next_core, axes=(1, 0))


def tt_svd_round(tn: TensorNetwork, eps: float) -> TensorNetwork:
    """Round a TT in place: backward QR sweep then forward truncation sweep.

    Assumes integer node names 0..dim-1 along the train.  The first SVD
    consumes a norm-relative budget ``eps/sqrt(dim-1)``; whatever error the
    truncation does not spend is carried to the next bond.
    """
    dim = tn.dim()
    out = tt_right_orth(tn, dim - 1)
    for jj in range(dim - 2, 0, -1):
        out = tt_right_orth(out, jj)

    nodes = list(out.network.nodes)
    first = nodes[0]
    value = out.value(first)
    trunc = delta_svd(value, eps / np.sqrt(dim - 1), with_normalizing=True)
    delta = trunc.delta
    assert delta is not None

    v = trunc.s[:, None] * trunc.v
    out.node_tensor(first).update_val_size(trunc.u)
    out.node_tensor(first + 1).update_val_size(
        _scale_next(v, out.value(first + 1))
    )

    for node in nodes[1:-1]:
        value = out.value(node)
        r1, n, r2 = value.shape
        trunc = delta_svd(value.reshape(r1 * n, r2), delta)
        v = trunc.s[:, None] * trunc.v
        rank = trunc.u.shape[1]
        out.node_tensor(node).update_val_size(trunc.u.reshape(r1, n, rank))
        out.node_tensor(node + 1).update_val_size(
            _scale_next(v, out.value(node + 1))
        )
    return out


# -- Gram-SVD rounding -------------------------------------------------------------


@jax.jit
def _gram_step_rl(gram: jnp.ndarray, core: jnp.ndarray) -> jnp.ndarray:
    """G_{k-1} = C_k G_k C_k^T contracted over (mode, right bond)."""
    s = core.shape
    tmp = (core.reshape(-1, s[-1]) @ gram).reshape(-1, s[-2] * s[-1])
    return tmp @ core.reshape(-1, s[-2] * s[-1]).T


@jax.jit
def _gram_left(core: jnp.ndarray) -> jnp.ndarray:
    """Left Gram matrix of a core's right unfolding."""
    mat = core.reshape(-1, core.shape[-1])
    return mat.T @ mat


def tt_gramsvd_round(tn: TensorNetwork, eps: float) -> TensorNetwork:
    """Gram-SVD TT rounding (IPDPS'22).  In-place; integer node names."""
    dim = tn.dim()
    last = tn.value(dim - 1)
    gr_list = [last @ last.T]
    for i in range(dim - 2, -1, -1):
        gr_list.append(_gram_step_rl(gr_list[-1], tn.value(i)))

    norm = float(np.sqrt(np.asarray(gr_list[-1])[0, 0]))
    delta = eps * norm / (dim - 1) ** 0.5
    gr_list = gr_list[::-1]

    for i in range(dim - 1):
        sh = list(tn.value(i).shape)
        shp1 = list(tn.value(i + 1).shape)
        gl = _gram_left(tn.value(i))

        curr, nxt = gram_eig_and_svd(gl, gr_list[i + 1], delta)
        curr_val = tn.value(i).reshape(-1, sh[-1]) @ curr
        next_val = nxt @ tn.value(i + 1).reshape(shp1[0], -1)

        rk = curr_val.shape[-1]
        sh[-1] = rk
        shp1[0] = rk
        tn.node_tensor(i).update_val_size(curr_val.reshape(sh))
        tn.node_tensor(i + 1).update_val_size(next_val.reshape(shp1))
    return tn


# -- TT-sum Gram-SVD rounding ----------------------------------------------------------


def _sum_gram_step_rl(
    gram: jnp.ndarray, cores: List[jnp.ndarray]
) -> jnp.ndarray:
    """One right-to-left Gram step through an implicit block-diagonal core.

    ``gram`` is the full (sum r_i) x (sum r_j) Gram matrix at bond k;
    ``cores`` are the summands' cores at position k.  Exploits the block
    structure: G'[(i,a),(j,b)] = sum_n  c_i[a,n,:] G_ij c_j[b,n,:]^T.
    """
    r_right = [c.shape[-1] for c in cores]
    r_left = [c.shape[0] for c in cores]
    off_r = np.cumsum([0] + r_right)
    blocks = []
    for i, ci in enumerate(cores):
        row = []
        for j, cj in enumerate(cores):
            g_ij = gram[off_r[i] : off_r[i + 1], off_r[j] : off_r[j + 1]]
            row.append(jnp.einsum("ank,kl,bnl->ab", ci, g_ij, cj))
        blocks.append(jnp.concatenate(row, axis=1))
    out = jnp.concatenate(blocks, axis=0)
    assert out.shape == (sum(r_left), sum(r_left))
    return out


def _sum_core_right_multiply(
    mat: jnp.ndarray, cores: List[jnp.ndarray]
) -> jnp.ndarray:
    """``mat @ H`` where H is the horizontal unfolding of the implicit
    block-diagonal core: (m, sum r) -> (m, n * sum r')."""
    m = mat.shape[0]
    n = cores[0].shape[1]
    outs = []
    off = 0
    for c in cores:
        r = c.shape[0]
        c3 = c.reshape(r, n, -1)
        outs.append(jnp.einsum("mk,knl->mnl", mat[:, off : off + r], c3))
        off += r
    return jnp.concatenate(outs, axis=2).reshape(m, -1)


def tt_sum_gramsvd_round(
    factors_list: List[TensorNetwork], eps: float = 1e-14
) -> TensorNetwork:
    """Round the sum of several TTs without materializing the block cores.

    Returns a fresh TT; the summands are untouched.
    """
    dim = factors_list[0].dim()
    ttsum = copy.deepcopy(factors_list[0])

    last_stack = jnp.concatenate(
        [f.value(dim - 1) for f in factors_list], axis=0
    )
    ttsum.node_tensor(dim - 1).update_val_size(last_stack)
    gr_list = [last_stack @ last_stack.T]

    first_stack = jnp.concatenate([f.value(0) for f in factors_list], axis=1)
    ttsum.node_tensor(0).update_val_size(first_stack)

    for i in range(dim - 2, 0, -1):
        gr_list.append(
            _sum_gram_step_rl(
                gr_list[-1], [f.value(i) for f in factors_list]
            )
        )

    norm_sq = jnp.sum((ttsum.value(0) @ gr_list[-1]) * ttsum.value(0))
    gr_list.append(norm_sq)
    norm = float(np.sqrt(np.asarray(norm_sq)))
    delta = eps * norm / (dim - 1) ** 0.5
    gr_list = gr_list[::-1]

    for i in range(dim - 1):
        sh = list(ttsum.value(i).shape)
        gl = _gram_left(ttsum.value(i))
        curr, nxt = gram_eig_and_svd(gl, gr_list[i + 1], delta)
        curr_val = ttsum.value(i).reshape(-1, sh[-1]) @ curr

        if i == dim - 2:
            next_val = nxt @ ttsum.value(dim - 1)
            shp1 = [next_val.shape[0], next_val.shape[1]]
        else:
            cores_next = [f.value(i + 1) for f in factors_list]
            next_val = _sum_core_right_multiply(nxt, cores_next)
            n = cores_next[0].shape[1]
            shp1 = [nxt.shape[0], n, sum(c.shape[-1] for c in cores_next)]

        rk = curr_val.shape[-1]
        sh[-1] = rk
        shp1[0] = rk
        ttsum.node_tensor(i).update_val_size(curr_val.reshape(sh))
        ttsum.node_tensor(i + 1).update_val_size(next_val.reshape(shp1))
    return ttsum


# -- randomized rounding -----------------------------------------------------------------


class TTRandRound:
    """Randomized TT rounding by Gaussian TT sketching (arXiv:2110.04393).

    All-GEMM and QR with *fixed* target ranks, so the whole sweep has
    static shapes — the preferred rounding path on TPU.
    """

    def __init__(
        self,
        y: Union[TensorNetwork, List[TensorNetwork]],
        target_ranks: List[int],
    ):
        self.y = y
        self.target_ranks = list(target_ranks)
        if isinstance(y, list) and isinstance(y[0], TensorNetwork):
            self.ns = len(y)
            self.d = y[0].network.number_of_nodes()
        elif isinstance(y, TensorNetwork):
            self.ns = 1
            self.d = y.network.number_of_nodes()
        else:
            raise ValueError(
                f"Invalid type for y ({type(y)}): expected a TensorNetwork "
                "or a list of TensorNetworks"
            )

    def init_rand_mat(
        self, ranks: Optional[List[int]] = None
    ) -> List[jnp.ndarray]:
        """Gaussian random TT cores with size-normalized variance."""
        if ranks is None:
            ranks = self.target_ranks
        shape = (
            self.y[0].shape() if isinstance(self.y, list) else self.y.shape()
        )
        cores = []
        for i in range(self.d):
            if i == 0:
                shp = [shape[i], ranks[i]]
            elif i == self.d - 1:
                shp = [ranks[i - 1], shape[i]]
            else:
                shp = [ranks[i - 1], shape[i], ranks[i]]
            cores.append(
                jnp.asarray(
                    np.random.randn(*shp) / np.sqrt(np.prod(shp))
                )
            )
        return cores

    def partial_contraction(
        self,
        tt: TensorNetwork,
        sketch: List[jnp.ndarray],
        direction: str = "rl",
    ) -> List[jnp.ndarray]:
        """Right-to-left partial contractions W_i of tt[i:] with sketch[i:]."""
        if direction != "rl":
            raise ValueError("Invalid option")
        w: List[jnp.ndarray] = []
        for i in range(self.d - 1, 0, -1):
            x = tt.value(i)
            if i == self.d - 1:
                w.append(x @ sketch[i].T)
                continue
            sx = x.shape
            sy = sketch[i].shape
            tmp = (x.reshape(-1, sx[-1]) @ w[-1]).reshape(sx[0], -1)
            w.append(tmp @ sketch[i].reshape(sy[0], -1).T)
        return w[::-1]

    def rand_then_orth(self) -> TensorNetwork:
        """Randomize-then-orthogonalize for a single TT (Alg 3.2)."""
        if not isinstance(self.y, TensorNetwork):
            raise ValueError(
                "rand_then_orth expects a single TT, not a TT-sum"
            )
        sketch = self.init_rand_mat()
        w = self.partial_contraction(self.y, sketch, "rl")
        x_approx = self.y.value(0)
        res = copy.deepcopy(self.y)

        for i in range(self.d - 1):
            sx = list(x_approx.shape)
            zn = x_approx.reshape(-1, x_approx.shape[-1])
            q, _ = qr_reduced(zn @ w[i])
            res.node_tensor(i).update_val_size(
                q.reshape(sx[:-1] + [q.shape[-1]])
            )
            sy = list(self.y.value(i + 1).shape)
            x_approx = (
                q.T @ zn @ self.y.value(i + 1).reshape(sy[0], -1)
            ).reshape([q.shape[-1]] + sy[1:])

        res.node_tensor(self.d - 1).update_val_size(x_approx)
        return res

    def rto_rounding_ttsum(self) -> TensorNetwork:
        """Randomize-then-orthogonalize for an implicit TT-sum (Alg 3.4)."""
        if not isinstance(self.y, list):
            raise ValueError(
                "rto_rounding_ttsum expects a list of TTs"
            )
        sketch = self.init_rand_mat()
        w = [self.partial_contraction(y, sketch) for y in self.y]
        res = copy.deepcopy(self.y[0])
        x_approx = jnp.concatenate([y.value(0) for y in self.y], axis=1)

        for i in range(self.d - 1):
            sx = list(x_approx.shape)
            rk = [y.value(i).shape[-1] for y in self.y]
            rkp1 = [y.value(i + 1).shape[-1] for y in self.y]
            rk_off = np.cumsum([0] + rk)

            zn = x_approx.reshape(-1, sx[-1])
            yn = zn @ jnp.concatenate([w[j][i] for j in range(self.ns)], axis=0)
            q, _ = qr_reduced(yn)
            self.target_ranks[i] = min(self.target_ranks[i], q.shape[-1])
            mn = q.T @ zn
            res.node_tensor(i).update_val_size(
                q.reshape(sx[:-1] + [self.target_ranks[i]])
            )

            nxt_blocks = []
            shp1 = None
            for j in range(self.ns):
                shp1 = self.y[j].value(i + 1).shape
                tmp = mn[:, rk_off[j] : rk_off[j + 1]] @ self.y[j].value(
                    i + 1
                ).reshape(shp1[0], -1)
                nxt_blocks.append(tmp.reshape(-1, rkp1[j]))

            if i < self.d - 2:
                x_approx = jnp.concatenate(nxt_blocks, axis=1).reshape(
                    (self.target_ranks[i], shp1[1], int(np.sum(rkp1)))
                )
            else:
                x_approx = jnp.sum(
                    jnp.stack(nxt_blocks, axis=0), axis=0
                ).reshape((self.target_ranks[i], shp1[1]))
                res.node_tensor(self.d - 1).update_val_size(x_approx)
        return res

    def round(self) -> TensorNetwork:
        if isinstance(self.y, list):
            return self.rto_rounding_ttsum()
        return self.rand_then_orth()


def tt_randomized_round(
    y: TensorNetwork, target_ranks: List[int]
) -> TensorNetwork:
    """Randomized rounding of a single TT to fixed target ranks."""
    return TTRandRound(y, target_ranks).rand_then_orth()


def tt_sum_randomized_round(
    y: List[TensorNetwork], target_ranks: List[int]
) -> TensorNetwork:
    """Randomized rounding of an implicit TT-sum to fixed target ranks."""
    return TTRandRound(y, target_ranks).rto_rounding_ttsum()


def tt_rand_precond_svd_round(
    tn: Union[TensorNetwork, List[TensorNetwork]],
    eps: float,
    rank_bound: List[int],
) -> TensorNetwork:
    """Randomized preconditioning down to ``rank_bound``, then a final
    delta-SVD sweep to tolerance ``eps``."""
    rounder = TTRandRound(y=tn, target_ranks=rank_bound)
    res = rounder.round()
    dim = rounder.d

    for i in range(dim - 1, 0, -1):
        cur = res.value(i)
        sh = list(cur.shape)
        prev = res.value(i - 1)
        delta = eps / (dim - 1) ** 0.5
        trunc = delta_svd(cur.reshape(sh[0], -1), delta, True)
        new_cur = trunc.v.reshape([-1] + sh[1:])
        factor = trunc.u * trunc.s[None, :]
        new_prev = jnp.tensordot(prev, factor, axes=(prev.ndim - 1, 0))
        res.node_tensor(i).update_val_size(new_cur)
        res.node_tensor(i - 1).update_val_size(new_prev)
    return res
