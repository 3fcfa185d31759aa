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

from functools import partial
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

    Scope: works on any topology (its advantage over
    :func:`fit_network_als`, which needs a chain) but converges slower;
    for chains prefer ALS.  Both need the observation density to pin
    the model (measured ~0.5% of entries for d=8 chains; spiky targets
    need far more) — below that no optimizer recovers the tensor.
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


@jax.jit
def _advance_interface(L, core, cols):
    """L'(N, r2) = L(N, r1) @ core[:, cols[n], :] per observation."""
    sel = core[:, cols, :]  # (r1, N, r2)
    return jnp.einsum("na,anb->nb", L, sel)


@jax.jit
def _advance_interface_right(R, core, cols):
    """R'(N, r1) = core[:, cols[n], :] @ R(N, r2) per observation."""
    sel = core[:, cols, :]
    return jnp.einsum("anb,nb->na", sel, R)


@partial(jax.jit, static_argnames=("n_mode",))
def _solve_core(L, R, cols, y, n_mode, lam):
    """The per-mode decoupled least squares of one ALS core update.

    Observations with mode value m only touch slice m of the core, so
    the LS splits into ``n_mode`` independent (r1*r2)-dim normal
    equations, assembled with one masked einsum each and solved
    batched.  Returns the core in (r1, n, r2) layout.
    """
    r1, r2 = L.shape[1], R.shape[1]
    lr = jnp.einsum("na,nb->nab", L, R).reshape(L.shape[0], r1 * r2)
    onehot = (
        jax.lax.broadcasted_iota(cols.dtype, (cols.shape[0], n_mode), 1)
        == cols[:, None]
    ).astype(lr.dtype)
    gram = jnp.einsum("nm,ni,nj->mij", onehot, lr, lr)
    rhs = jnp.einsum("nm,ni,n->mi", onehot, lr, y)
    gram = gram + lam * jnp.eye(r1 * r2, dtype=lr.dtype)
    sol = jnp.linalg.solve(gram, rhs[..., None])[..., 0]  # (n, r1*r2)
    return sol.reshape(n_mode, r1, r2).transpose(1, 0, 2)


def fit_network_als(
    net: TensorNetwork,
    indices: Sequence[Index],
    idx: np.ndarray,
    y: np.ndarray,
    sweeps: int = 10,
    lam: float = 1e-8,
    tol: float = 0.0,
) -> List[float]:
    """Alternating-least-squares tensor completion on a TT chain.

    The robust completer for trains where plain gradient descent
    plateaus: each core update is globally optimal given the others
    (per-mode decoupled normal equations, batched device solves, QR
    orthogonal frames for conditioning), so convergence is fast — e.g.
    a d=8, n=8 rank-2 smooth target reaches 1.7e-6 in under 40 sweeps.
    Cost per sweep is O(d N r^2) interface work plus d batched
    (r^2 x r^2) solves; practical for ranks up to ~32.

    Sampling envelope (measured): recovery needs roughly >= 0.5% of
    entries observed for d=8 — below that, BOTH ALS and gradient
    descent sit at a statistical floor (the data does not pin the
    model), and spiky targets (e.g. deep random TTs, kurtosis >> 3)
    need far more because uniform samples miss the mass.  ``net`` must
    be a chain (any core layout, ragged ranks fine); fitted values are
    written back in place.  Returns per-sweep relative training errors.
    Reference has no counterpart (pytens has no data-driven fitting).
    """
    from tensor_networks_tpu.ops.packed import chain_cores

    extracted = chain_cores(net)
    if extracted is None:
        raise ValueError("fit_network_als needs a chain topology (TT)")
    order, cores, frees, perms = extracted

    idx = np.asarray(idx, dtype=int)
    y_raw = np.asarray(y)
    y_scale = float(np.std(y_raw)) or 1.0
    dtype = cores[0].dtype
    y_d = jnp.asarray(y_raw / y_scale, dtype)
    n_obs = idx.shape[0]

    # observation columns in chain order
    col_of = {ind: c for c, ind in enumerate(indices)}
    cols = [
        jnp.asarray(idx[:, col_of[f]], jnp.int32) for f in frees
    ]

    # work in uniform 3D layout: (1, n, r) ... (r, n, 1)
    cores = (
        [cores[0][None]]
        + list(cores[1:-1])
        + [cores[-1][..., None]]
    )
    d = len(cores)
    ones = jnp.ones((n_obs, 1), dtype)
    lam = jnp.asarray(lam, dtype)

    def left_orth(core):
        """Orthonormal columns in the (r1*n, r2) unfolding (the R factor
        is discarded — the next core is re-solved immediately).
        Rank-deficient unfoldings keep their shape via zero columns."""
        r1, n, r2 = core.shape
        q, _ = jnp.linalg.qr(core.reshape(r1 * n, r2))
        if q.shape[1] < r2:
            q = jnp.pad(q, ((0, 0), (0, r2 - q.shape[1])))
        return q.reshape(r1, n, r2)

    def right_orth(core):
        r1, n, r2 = core.shape
        q, _ = jnp.linalg.qr(core.reshape(r1, n * r2).T)
        if q.shape[1] < r1:
            q = jnp.pad(q, ((0, 0), (0, r1 - q.shape[1])))
        return q.T.reshape(r1, n, r2)

    errors: List[float] = []
    for _sweep in range(sweeps):
        # left->right: orthogonal right frames make every normal
        # equation well-conditioned (plain ALS without the QR frames
        # stalls on sparse deep trains)
        rights = [ones]
        for k in range(d - 1, 0, -1):
            rights.append(
                _advance_interface_right(rights[-1], cores[k], cols[k])
            )
        rights.reverse()  # rights[k] = interface right of core k

        left = ones
        for k in range(d):
            core = _solve_core(
                left, rights[k], cols[k], y_d, cores[k].shape[1], lam
            )
            if k < d - 1:
                core = left_orth(core)
            cores[k] = core
            left = _advance_interface(left, core, cols[k])

        # right->left, mirrored
        lefts = [ones]
        for k in range(d - 1):
            lefts.append(
                _advance_interface(lefts[-1], cores[k], cols[k])
            )
        right = ones
        for k in range(d - 1, -1, -1):
            core = _solve_core(
                lefts[k], right, cols[k], y_d, cores[k].shape[1], lam
            )
            if k > 0:
                core = right_orth(core)
            cores[k] = core
            right = _advance_interface_right(right, core, cols[k])

        preds = right[:, 0]
        err = float(
            jnp.linalg.norm(preds - y_d) / jnp.linalg.norm(y_d)
        )
        errors.append(err)
        if tol and err < tol:
            break

    scale = jnp.asarray(y_scale, dtype)
    out = [cores[0][0] * scale] + cores[1:-1] + [cores[-1][..., 0]]
    for node, val, perm in zip(order, out, perms):
        net.node_tensor(node).update_val_size(
            jnp.transpose(val, np.argsort(perm))
        )
    return errors


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
