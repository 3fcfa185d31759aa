"""Gradient-based fitting of ANY tensor-network topology to point data.

The reference framework has two ways to build a network from data: cross
approximation (function oracles) and structure search (dense targets).
This module adds the third, TPU-native one: treat every node value as a
parameter and descend on a regression loss over observed entries —
tensor completion / regression for tensor trains, trees, Tucker, or any
other topology the graph engine can hold.

The whole step is one jitted XLA program built on
:meth:`TensorNetwork.evaluator` (batched gather + contraction, cached by
structure); parameters never leave the device between steps, and the
same step function is reusable across networks of identical structure.

No reference counterpart (``pytens`` has no gradient path at all); the
uniform-TT fast path with mesh sharding lives in
:mod:`tensor_networks_tpu.parallel.training`.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensor_networks_tpu.network import TensorNetwork, _next_pow2
from tensor_networks_tpu.types import Index


def fit_network(
    net: TensorNetwork,
    indices: Sequence[Index],
    idx: np.ndarray,
    y: np.ndarray,
    steps: int = 500,
    lr: float = 1e-2,
    optimizer: str = "adam",
    batch_size: Optional[int] = None,
    seed: int = 0,
    callback: Optional[Callable[[int, float], None]] = None,
) -> List[float]:
    """Fit ``net``'s node values to observations ``y`` at multi-indices
    ``idx`` by minimizing mean squared error.  Works for any topology.

    ``idx`` is ``(N, len(indices))`` integers; ``batch_size`` enables
    minibatch SGD over the observations (default: full batch, padded to
    the next power of two so the executable is shared across calls).
    The fitted values are written back into ``net`` in place; the
    returned list is the loss trajectory (in the normalized scale).

    Conditioning: the target is fit in normalized scale (y / std(y));
    the scale folds back into one node at the end.  Model node values
    should be O(1)-scaled for deep networks (e.g. divide each random
    core by sqrt(rank)) or gradients vanish/explode with depth.

    Scope: plain gradient descent recovers shallow networks (d <= ~6)
    well; for deep trains from random init the nonconvex landscape
    traps it far from the optimum (measured: d=8 r=3 plateaus at ~0.5
    relative even overparameterized) — warm-start from cross
    approximation or structure search for those.
    """
    import optax

    idx = np.asarray(idx, dtype=int)
    y = np.asarray(y)
    y_scale = float(np.std(y)) or 1.0
    y = y / y_scale
    n_obs = idx.shape[0]
    if idx.shape[1] != len(list(indices)):
        raise ValueError(
            f"idx has {idx.shape[1]} columns for {len(list(indices))} indices"
        )

    full_batch = batch_size is None
    batch = _next_pow2(n_obs) if full_batch else int(batch_size)
    run, values = net.evaluator(indices, batch)
    params = [jnp.asarray(v) for v in values]
    dtype = params[0].dtype

    if full_batch:
        pad = batch - n_obs
        idx_dev = jnp.asarray(
            np.concatenate([idx, np.repeat(idx[-1:], pad, axis=0)])
        )
        w = jnp.asarray(
            np.concatenate([np.ones(n_obs), np.zeros(pad)]), dtype
        ) * (batch / n_obs)
        y_dev = jnp.asarray(
            np.concatenate([y, np.zeros(pad)]), dtype
        )
    else:
        idx_all = jnp.asarray(idx)
        y_all = jnp.asarray(y, dtype)
        w = jnp.ones((batch,), dtype)

    def loss_fn(vals, cols, targets, weights):
        preds = run(vals, cols)
        return jnp.mean(weights * (preds - targets) ** 2)

    tx = {
        "adam": optax.adam,
        "sgd": optax.sgd,
    }[optimizer](lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(vals, opt_state, cols, targets, weights):
        loss, grads = jax.value_and_grad(loss_fn)(
            vals, cols, targets, weights
        )
        updates, opt_state = tx.update(grads, opt_state, vals)
        vals = optax.apply_updates(vals, updates)
        return vals, opt_state, loss

    rng = np.random.default_rng(seed)
    losses: List[float] = []
    for it in range(steps):
        if full_batch:
            cols, targets = idx_dev, y_dev
        else:
            pick = jnp.asarray(rng.integers(0, n_obs, size=batch))
            cols = idx_all[pick]
            targets = y_all[pick]
        params, opt_state, loss = step(
            params, opt_state, cols, targets, w
        )
        losses.append(float(loss))
        if callback is not None:
            callback(it, losses[-1])

    params[0] = params[0] * jnp.asarray(y_scale, dtype)
    for node, val in zip(net.network.nodes, params):
        net.node_tensor(node).update_val_size(val)
    return losses


def completion_error(
    net: TensorNetwork,
    indices: Sequence[Index],
    idx: np.ndarray,
    y: np.ndarray,
) -> float:
    """Relative l2 error of the fitted network on held-out entries."""
    preds = np.asarray(net.evaluate(list(indices), np.asarray(idx)))
    y = np.asarray(y)
    return float(np.linalg.norm(preds - y) / np.linalg.norm(y))
