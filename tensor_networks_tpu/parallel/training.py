"""A sharded TT-regression training step (tensor completion by SGD).

The framework's "training" workload: fit the cores of a tensor train to
observed entries of a target tensor.  The step is a single jitted XLA
program over a ("data", "model") mesh:

* DP  — the sample batch is sharded over ``data``,
* TP  — the mode dimension of every core is sharded over ``model``,
* gradients flow through the sharded gathers/GEMMs; XLA inserts the
  psum/all-gather collectives implied by the shardings.

This is the path exercised by ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensor_networks_tpu.parallel.sharded import (
    TTCores,
    tt_evaluate_batched,
)

TTParams = TTCores


def init_tt_params(
    d: int, n: int, r: int, dtype=jnp.float32, seed: int = 0
) -> TTParams:
    """Gaussian TT cores scaled for O(1) entry variance."""
    rng = np.random.default_rng(seed)
    scale = 1.0 / np.sqrt(r)
    return TTParams(
        first=jnp.asarray(rng.standard_normal((n, r)) * scale, dtype),
        mids=jnp.asarray(
            rng.standard_normal((d - 2, r, n, r)) * scale, dtype
        ),
        last=jnp.asarray(rng.standard_normal((r, n)) * scale, dtype),
    )


def _make_loss_fn(fast_eval: bool):
    if fast_eval:
        from tensor_networks_tpu.ops.packed import tt_evaluate_fast

        def loss_fn(params: TTParams, idx, y):
            preds = tt_evaluate_fast(
                params.first, params.mids, params.last, idx
            )
            return jnp.mean((preds - y.astype(preds.dtype)) ** 2)

        return loss_fn

    def loss_fn(params: TTParams, idx, y):
        preds = tt_evaluate_batched(
            params.first, params.mids, params.last, idx
        )
        return jnp.mean((preds - y) ** 2)

    return loss_fn


def make_train_step(
    mesh: Mesh,
    optimizer: str = "sgd",
    fast_eval: bool = False,
    batch_axes: Tuple[str, ...] = ("data",),
):
    """Build the jitted, mesh-sharded training step.

    ``optimizer`` is "sgd" (stateless; ``step(params, idx, y, lr)``) or
    "adam" (use :func:`make_adam_train_step` for the stateful API).
    Returns ``step`` plus placement helpers for params and batches.

    ``batch_axes`` names the mesh axes the sample batch shards over —
    pass ``("slice", "data")`` on a :func:`make_hybrid_mesh` to run pure
    DP over the DCN slice axis (one gradient all-reduce per step is the
    only collective that crosses slices).

    ``fast_eval=True`` runs the forward pass through the pallas
    evaluation kernel (custom VJP; backward stays the exact XLA form) —
    single-device meshes only, since pallas calls do not SPMD-partition.
    """
    if fast_eval and mesh.size > 1:
        raise ValueError(
            "fast_eval uses a pallas kernel, which does not partition "
            "over a multi-device mesh; use the default XLA evaluation"
        )
    param_shardings = TTParams(
        first=NamedSharding(mesh, P("model", None)),
        mids=NamedSharding(mesh, P(None, None, "model", None)),
        last=NamedSharding(mesh, P(None, "model")),
    )
    batch = tuple(batch_axes)
    idx_sharding = NamedSharding(mesh, P(batch, None))
    y_sharding = NamedSharding(mesh, P(batch))

    loss_fn = _make_loss_fn(fast_eval)

    @jax.jit
    def step(
        params: TTParams, idx, y, lr
    ) -> Tuple[TTParams, jnp.ndarray]:
        loss, grads = jax.value_and_grad(loss_fn)(params, idx, y)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    def place_params(params: TTParams) -> TTParams:
        return TTParams(
            *(
                jax.device_put(p, s)
                for p, s in zip(params, param_shardings)
            )
        )

    def place_batch(idx, y):
        return (
            jax.device_put(jnp.asarray(idx), idx_sharding),
            jax.device_put(jnp.asarray(y), y_sharding),
        )

    return step, place_params, place_batch


def make_adam_train_step(
    mesh: Mesh,
    lr: float = 1e-2,
    fast_eval: bool = False,
    batch_axes: Tuple[str, ...] = ("data",),
):
    """Adam variant of the sharded training step (optax).

    Returns ``(step, init_state, place_params, place_batch)`` with
    ``step(params, opt_state, idx, y) -> (params, opt_state, loss)``.
    ``fast_eval`` and ``batch_axes`` as in :func:`make_train_step`.
    """
    import optax

    sgd_step, place_params, place_batch = make_train_step(
        mesh, fast_eval=fast_eval, batch_axes=batch_axes
    )
    tx = optax.adam(lr)

    loss_fn = _make_loss_fn(fast_eval)

    @jax.jit
    def step(params, opt_state, idx, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, idx, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init_state(params):
        return tx.init(params)

    return step, init_state, place_params, place_batch
