"""Randomized TT rounding by Gaussian train sketching (arXiv:2110.04393).

Everything here is GEMM + thin QR with *fixed* target ranks — fully
static shapes, which makes this the preferred rank-control family on TPU
(the all-device packed variant is :func:`tensor_networks_tpu.ops.packed.rand_round`).

The algorithm in one line: contract the train against a random rank-t
sketch train from the right, producing per-bond *interface matrices*;
then sweep left-to-right, using each interface to pick an orthonormal
bond basis (randomize-then-orthogonalize).  The implicit-sum variant runs
the same sweep over summand-stacked padded cores, so a k-term sum rounds
without ever materializing its block-diagonal cores.

Capability parity: ``pytens/algs.py`` TTRandRound family (:2133-2380).
"""

from __future__ import annotations

import copy
from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from tensor_networks_tpu.kernels import qr_reduced
from tensor_networks_tpu.network import TensorNetwork


def _train_values(tn: TensorNetwork) -> List[jnp.ndarray]:
    return [tn.value(nm) for nm in tn.network.nodes]


def _gaussian_train(
    modes: Sequence[int], ranks: Sequence[int], dtype, seed: int
) -> List[jnp.ndarray]:
    """A random TT with unit-variance-normalized cores."""
    d = len(modes)
    shapes = (
        [(modes[0], ranks[0])]
        + [(ranks[k - 1], modes[k], ranks[k]) for k in range(1, d - 1)]
        + [(ranks[-1], modes[-1])]
    )
    keys = jax.random.split(jax.random.PRNGKey(seed), d)
    return [
        jax.random.normal(key, shape, dtype)
        / jnp.sqrt(jnp.asarray(float(np.prod(shape)), dtype))
        for key, shape in zip(keys, shapes)
    ]


def _interfaces(
    cores: Sequence[jnp.ndarray], sketch: Sequence[jnp.ndarray]
) -> List[jnp.ndarray]:
    """Interface matrices: ``ifc[k]`` contracts cores k+1.. against
    sketch cores k+1.. over all their modes, one (r_k, t_k) matrix per
    bond k = 0..d-2."""
    out = [cores[-1] @ sketch[-1].T]
    for core, sk in zip(cores[-2:0:-1], sketch[-2:0:-1]):
        r0, n, r1 = core.shape
        t0 = sk.shape[0]
        folded = (core.reshape(-1, r1) @ out[-1]).reshape(r0, -1)
        out.append(folded @ sk.reshape(t0, -1).T)
    return out[::-1]


def tt_randomized_round(
    y: TensorNetwork, target_ranks: Sequence[int], seed: int = 0
) -> TensorNetwork:
    """Round a single TT to fixed target ranks (randomize-then-orth)."""
    cores = _train_values(y)
    d = len(cores)
    modes = [cores[0].shape[0]] + [c.shape[1] for c in cores[1:]]
    sketch = _gaussian_train(modes, target_ranks, cores[0].dtype, seed)
    ifc = _interfaces(cores, sketch)

    result = copy.deepcopy(y)
    names = list(result.network.nodes)
    head = cores[0]
    for k in range(d - 1):
        flat = head.reshape(-1, head.shape[-1])
        basis, _ = qr_reduced(flat @ ifc[k])
        result.node_tensor(names[k]).update_val_size(
            basis.reshape(*head.shape[:-1], -1)
        )
        nxt = cores[k + 1]
        head = ((basis.T @ flat) @ nxt.reshape(nxt.shape[0], -1)).reshape(
            -1, *nxt.shape[1:]
        )
    result.node_tensor(names[-1]).update_val_size(head)
    return result


def tt_sum_randomized_round(
    y: List[TensorNetwork], target_ranks: Sequence[int], seed: int = 0
) -> TensorNetwork:
    """Round an implicit sum of TTs to fixed target ranks.

    Summand cores are zero-padded to a common rank and stacked; the sweep
    then runs on (S, R, n, R) arrays with einsum contractions, summing the
    summand axis only at the final core.
    """
    trains = [_train_values(t) for t in y]
    n_sum = len(trains)
    d = len(trains[0])
    modes = [trains[0][0].shape[0]] + [c.shape[1] for c in trains[0][1:]]
    dtype = trains[0][0].dtype

    rank = max(
        max(max(c.shape[0] for c in t[1:]) for t in trains),
        max(max(c.shape[-1] for c in t[:-1]) for t in trains),
    )

    def pad(c, shape):
        return jnp.pad(c, [(0, b - a) for a, b in zip(c.shape, shape)])

    firsts = jnp.stack([pad(t[0], (modes[0], rank)) for t in trains])
    lasts = jnp.stack([pad(t[-1], (rank, modes[-1])) for t in trains])
    mids = [
        jnp.stack(
            [pad(t[k], (rank, modes[k], rank)) for t in trains]
        )
        for k in range(1, d - 1)
    ]

    sketch = _gaussian_train(modes, target_ranks, dtype, seed)
    # per-summand interfaces, stacked to (S, R, t) per bond
    ifc = [
        jnp.stack(cols)
        for cols in zip(
            *[
                _interfaces(
                    [firsts[s]] + [m[s] for m in mids] + [lasts[s]],
                    sketch,
                )
                for s in range(n_sum)
            ]
        )
    ]

    result = copy.deepcopy(y[0])
    names = list(result.network.nodes)
    head = jnp.moveaxis(firsts, 0, 1).reshape(modes[0], -1)  # (n, S*R)
    for k in range(d - 1):
        flat = head.reshape(-1, n_sum, rank)
        probe = jnp.einsum("mia,iat->mt", flat, ifc[k])
        basis, _ = qr_reduced(probe)
        result.node_tensor(names[k]).update_val_size(
            basis.reshape(*head.shape[:-1], -1)
        )
        coeff = jnp.einsum("mk,mia->kia", basis, flat)  # (t, S, R)
        if k == d - 2:
            head = jnp.einsum("kia,ian->kn", coeff, lasts)
        else:
            nxt = jnp.einsum("kia,ianb->knib", coeff, mids[k])
            head = nxt.reshape(nxt.shape[0], nxt.shape[1], -1)
    result.node_tensor(names[-1]).update_val_size(head)
    return result


def tt_rand_precond_svd_round(
    tn: Union[TensorNetwork, List[TensorNetwork]],
    eps: float,
    rank_bound: Sequence[int],
    seed: int = 0,
) -> TensorNetwork:
    """Randomized preconditioning to ``rank_bound`` followed by an exact
    delta-SVD re-round to tolerance ``eps`` — the hybrid that combines
    the sketch's speed with the SVD sweep's optimal ranks."""
    from tensor_networks_tpu.ops.rounding import tt_svd_round

    if isinstance(tn, list):
        coarse = tt_sum_randomized_round(tn, rank_bound, seed)
    else:
        coarse = tt_randomized_round(tn, rank_bound, seed)
    return tt_svd_round(coarse, eps)


class TTRandRound:
    """Object-style facade over the functional API (kept for parity with
    the reference's class interface)."""

    def __init__(
        self,
        y: Union[TensorNetwork, List[TensorNetwork]],
        target_ranks: Sequence[int],
        seed: int = 0,
    ):
        if isinstance(y, list):
            if not all(isinstance(t, TensorNetwork) for t in y):
                raise ValueError("expected a list of TensorNetworks")
            self.d = y[0].network.number_of_nodes()
            self.ns = len(y)
        elif isinstance(y, TensorNetwork):
            self.d = y.network.number_of_nodes()
            self.ns = 1
        else:
            raise ValueError(
                f"Invalid type for y ({type(y)}): expected a TensorNetwork "
                "or a list of TensorNetworks"
            )
        self.y = y
        self.target_ranks = list(target_ranks)
        self.seed = seed

    def rand_then_orth(self) -> TensorNetwork:
        if isinstance(self.y, list):
            raise ValueError("rand_then_orth expects a single TT")
        return tt_randomized_round(self.y, self.target_ranks, self.seed)

    def rto_rounding_ttsum(self) -> TensorNetwork:
        if not isinstance(self.y, list):
            raise ValueError("rto_rounding_ttsum expects a list of TTs")
        return tt_sum_randomized_round(
            self.y, self.target_ranks, self.seed
        )

    def round(self) -> TensorNetwork:
        if isinstance(self.y, list):
            return self.rto_rounding_ttsum()
        return self.rand_then_orth()
