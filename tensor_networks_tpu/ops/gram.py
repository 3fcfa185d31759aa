"""Gram-SVD TT rounding: single trains and implicit sums of trains.

The Gram approach (Al Daas/Ballard/Manning, IPDPS'22) never
orthogonalizes: each bond is truncated from the eigendecompositions of
its two Gram matrices — the left one from the train head as rounded so
far, the right one from a precomputed chain of environment Grams.  All
GEMMs and eighs, no pivoting: the TPU-friendly exact method.

Device mapping: the environment chain is one ``lax.scan`` over the
stacked middle cores when the train is uniform (one XLA dispatch instead
of d), and the implicit-sum variant works on a summand-stacked, padded
core array so the block-structured Gram update is a single einsum rather
than a Python loop over block pairs.  The per-bond rank decision stays on
host (dynamic ranks); the fully static-shape alternative is
``ops.fast.tt_round_fixed(method="gram")``.

Capability parity: ``pytens/algs.py`` Gram rounding (:1707-1840) and its
TT-sum form (:1907-2130).
"""

from __future__ import annotations

import copy
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tensor_networks_tpu.kernels import gram_eig_and_svd
from tensor_networks_tpu.network import TensorNetwork
from tensor_networks_tpu.tensor import Tensor
from tensor_networks_tpu.types import Index


# -- environment Gram chains ---------------------------------------------------


@jax.jit
def _env_step(env: jnp.ndarray, core: jnp.ndarray) -> jnp.ndarray:
    """Pull the right-environment Gram through one middle core:
    env'[a, m] = sum_{n, b, c} core[a, n, b] env[b, c] core[m, n, c]."""
    tmp = jnp.einsum("anb,bc->anc", core, env)
    return jnp.einsum("anc,mnc->am", tmp, core)


@jax.jit
def _env_chain_scan(mids: jnp.ndarray, env_last: jnp.ndarray):
    """All bond environments of a uniform train in one scan."""

    def step(env, core):
        nxt = _env_step(env, core)
        return nxt, nxt

    _, envs = jax.lax.scan(step, env_last, mids, reverse=True)
    return envs


def _bond_environments(cores: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    """Right-environment Gram for every bond k = 0..d-2.

    ``envs[k]`` is the Gram of the sub-train right of bond k.  Uniform
    middle cores take the fused scan; ragged trains fall back to one
    jitted step per core.
    """
    last = cores[-1]
    env_last = last @ last.T
    mids = cores[1:-1]
    if not mids:
        return [env_last]
    shapes = {m.shape for m in mids}
    if len(shapes) == 1:
        envs = _env_chain_scan(jnp.stack(mids), env_last)
        return [envs[k] for k in range(len(mids))] + [env_last]
    out = [env_last]
    for core in reversed(mids):
        out.append(_env_step(out[-1], core))
    return out[::-1]


# -- single-train rounding ------------------------------------------------------


def tt_gramsvd_round(tn: TensorNetwork, eps: float) -> TensorNetwork:
    """Round a TT in place by per-bond Gram-SVD truncation.

    Works for any train length >= 2 and ragged ranks; node order follows
    the graph's insertion order.
    """
    names = list(tn.network.nodes)
    cores = [tn.value(nm) for nm in names]
    d = len(cores)
    envs = _bond_environments(cores)

    head = cores[0]
    norm_sq = jnp.sum((head @ envs[0]) * head)
    budget = eps * float(np.sqrt(np.asarray(norm_sq))) / np.sqrt(d - 1)

    for k in range(d - 1):
        bond = head.shape[-1]
        flat = head.reshape(-1, bond)
        shrink, expand = gram_eig_and_svd(flat.T @ flat, envs[k], budget)
        tn.node_tensor(names[k]).update_val_size(
            (flat @ shrink).reshape(*head.shape[:-1], -1)
        )
        nxt = cores[k + 1]
        head = (expand @ nxt.reshape(nxt.shape[0], -1)).reshape(
            -1, *nxt.shape[1:]
        )
        tn.node_tensor(names[k + 1]).update_val_size(head)
    return tn


# -- implicit-sum rounding --------------------------------------------------------


def _pad_to(core: jnp.ndarray, shape) -> jnp.ndarray:
    return jnp.pad(
        core, [(0, t - s) for s, t in zip(core.shape, shape)]
    )


@jax.jit
def _sum_env_step(env4: jnp.ndarray, mids_k: jnp.ndarray) -> jnp.ndarray:
    """Block Gram update over summand-stacked cores: with
    ``mids_k[s] = summand s's core`` and ``env4[i, b, j, d]`` coupling
    summand i's bond b with summand j's bond d, produce the environment
    one bond to the left:
    env'[i, a, j, c] = sum_{n,b,d} M_i[a,n,b] env[i,b,j,d] M_j[c,n,d]."""
    tmp = jnp.einsum("ianb,ibjd->ianjd", mids_k, env4)
    return jnp.einsum("ianjd,jcnd->iajc", tmp, mids_k)


def tt_sum_gramsvd_round(
    factors_list: List[TensorNetwork], eps: float = 1e-14
) -> TensorNetwork:
    """Round a sum of TTs without materializing the block-diagonal cores.

    Summand cores are zero-padded to a common rank and stacked, so the
    block-structured Gram chain runs as stacked einsums; the result is a
    fresh train (summands untouched).
    """
    n_sum = len(factors_list)
    node_lists = [list(f.network.nodes) for f in factors_list]
    d = len(node_lists[0])
    trains = [
        [f.value(nm) for nm in names]
        for f, names in zip(factors_list, node_lists)
    ]
    rank = max(
        max(c.shape[0] for c in train[1:])
        for train in trains
    )
    rank = max(
        rank,
        max(max(c.shape[-1] for c in train[:-1]) for train in trains),
    )

    # stack padded summand cores: firsts (n, S*R), mids (S, R, n, R),
    # lasts (S, R, n)
    firsts = jnp.concatenate(
        [_pad_to(t[0], (t[0].shape[0], rank)) for t in trains], axis=1
    )
    lasts = jnp.stack(
        [_pad_to(t[-1], (rank, t[-1].shape[1])) for t in trains]
    )
    mids_stacked = [
        jnp.stack(
            [
                _pad_to(t[k], (rank, t[k].shape[1], rank))
                for t in trains
            ]
        )
        for k in range(1, d - 1)
    ]

    # environment chain in block form, flattened to (S*R, S*R) per bond
    env4 = jnp.einsum("ian,jbn->iajb", lasts, lasts)
    envs4 = [env4]
    for mids_k in reversed(mids_stacked):
        envs4.append(_sum_env_step(envs4[-1], mids_k))
    envs = [e.reshape(n_sum * rank, n_sum * rank) for e in envs4[::-1]]

    head = firsts  # (n, S*R)
    norm_sq = jnp.sum((head @ envs[0]) * head)
    budget = eps * float(np.sqrt(np.asarray(norm_sq))) / np.sqrt(d - 1)

    out_cores: List[jnp.ndarray] = []
    for k in range(d - 1):
        bond = head.shape[-1]
        flat = head.reshape(-1, bond)
        shrink, expand = gram_eig_and_svd(flat.T @ flat, envs[k], budget)
        out_cores.append(
            (flat @ shrink).reshape(*head.shape[:-1], -1)
        )
        if k == d - 2:
            head = jnp.einsum(
                "kia,ian->kn", expand.reshape(-1, n_sum, rank), lasts
            )
        else:
            nxt = jnp.einsum(
                "kia,ianb->knib",
                expand.reshape(-1, n_sum, rank),
                mids_stacked[k],
            )
            head = nxt.reshape(nxt.shape[0], nxt.shape[1], -1)
    out_cores.append(head)

    # assemble a fresh train with the original free indices
    free0 = factors_list[0]
    result = TensorNetwork()
    mode_indices = [
        next(
            i
            for i in free0.node_tensor(nm).indices
            if i in free0.free_indices()
        )
        for nm in node_lists[0]
    ]
    bonds = [
        Index(f"gr_{k}", int(out_cores[k].shape[-1]))
        for k in range(d - 1)
    ]
    for k, core in enumerate(out_cores):
        if k == 0:
            inds = [mode_indices[0], bonds[0]]
        elif k == d - 1:
            inds = [bonds[-1], mode_indices[-1]]
        else:
            inds = [bonds[k - 1], mode_indices[k], bonds[k]]
        result.add_node(k, Tensor(core, inds))
        if k:
            result.add_edge(k - 1, k)
    return result
