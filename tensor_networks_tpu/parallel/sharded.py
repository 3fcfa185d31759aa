"""Sharded TT kernels: explicit-collective and GSPMD-annotated paths.

Two complementary styles, both idiomatic on TPU:

* :func:`tt_inner_mode_sharded` — ``shard_map`` with a hand-placed
  ``psum``: every device zips its slice of the *mode* dimension and the
  (r x r) carries are reduced over ICI once per core.  This is the
  pattern for sweeps whose carries are small relative to the cores.
* :func:`tt_evaluate_batched` / :func:`shard_tt_params` — GSPMD: arrays
  carry :class:`NamedSharding` annotations and XLA inserts the
  collectives.  Used by the training step in
  :mod:`tensor_networks_tpu.parallel.training`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TTCores(NamedTuple):
    """A uniform TT as stacked device arrays."""

    first: jnp.ndarray  # (n, r)
    mids: jnp.ndarray  # (d-2, r, n, r)
    last: jnp.ndarray  # (r, n)


def shard_tt_params(mesh: Mesh, cores: TTCores) -> TTCores:
    """Place a uniform TT on the mesh: mode dimension sharded over the
    model axis, bonds replicated (bonds are the small carries)."""
    first = jax.device_put(
        cores.first, NamedSharding(mesh, P("model", None))
    )
    mids = jax.device_put(
        cores.mids, NamedSharding(mesh, P(None, None, "model", None))
    )
    last = jax.device_put(cores.last, NamedSharding(mesh, P(None, "model")))
    return TTCores(first, mids, last)


def tt_inner_mode_sharded(mesh: Mesh, a: TTCores, b: TTCores) -> jnp.ndarray:
    """TT inner product with the mode dimension sharded over ``model``.

    Each device zips its n/P slice of every core; the (r_a x r_b) carry is
    psum-reduced across the model axis after each step.  The data axis
    (if present) sees replicated inputs and contributes nothing — pass a
    pure-model mesh for maximal mode parallelism.
    """

    def local_zip(fa, ma, la, fb, mb, lb):
        w = jax.lax.psum(fa.T @ fb, "model")

        def step(w, cores):
            ca, cb = cores
            ra, nl, ra2 = ca.shape
            rb, _, rb2 = cb.shape
            t = (w.T @ ca.reshape(ra, nl * ra2)).reshape(rb * nl, ra2)
            w_next = t.T @ cb.reshape(rb * nl, rb2)
            return jax.lax.psum(w_next, "model"), None

        if ma.shape[0] > 0:
            w, _ = jax.lax.scan(step, w, (ma, mb))
        return jnp.sum(w * jax.lax.psum(la @ lb.T, "model"))

    specs = (
        P("model", None),
        P(None, None, "model", None),
        P(None, "model"),
    )
    fn = jax.shard_map(
        local_zip,
        mesh=mesh,
        in_specs=specs + specs,
        out_specs=P(),
    )
    return jax.jit(fn)(a.first, a.mids, a.last, b.first, b.mids, b.last)


def tt_evaluate_batched(
    first: jnp.ndarray,
    mids: jnp.ndarray,
    last: jnp.ndarray,
    idx: jnp.ndarray,
) -> jnp.ndarray:
    """Evaluate a uniform TT at a batch of integer multi-indices.

    ``idx`` is (B, d), scanned along the train; input shardings decide the
    parallelism (batch over ``data``, modes/bonds over ``model``).

    For modest mode sizes each step is one (B, r) x (r, n*r) MXU matmul
    followed by a row-select — n-times more FLOPs than a per-sample
    gather-matvec, but MXU-shaped and an order of magnitude faster in
    practice.  Large-mode trains fall back to the gather form.
    """
    v = first[idx[:, 0], :]  # (B, r)
    n_mode = first.shape[0]
    matmul_form = n_mode <= 64

    def step_matmul(v, inputs):
        core, cols = inputs  # core (r, n, r); cols (B,)
        r, n, r2 = core.shape
        u = jnp.matmul(v, core.reshape(r, n * r2))  # (B, n*r2) on MXU
        u = u.reshape(v.shape[0], n, r2)
        v_next = jnp.take_along_axis(
            u, cols[:, None, None], axis=1
        )[:, 0, :]
        return v_next, None

    def step_gather(v, inputs):
        core, cols = inputs
        sel = core[:, cols, :]  # (r, B, r2)
        return jnp.einsum("br,rbs->bs", v, sel), None

    if mids.shape[0] > 0:
        cols = idx[:, 1:-1].T  # (d-2, B)
        step = step_matmul if matmul_form else step_gather
        v, _ = jax.lax.scan(step, v, (mids, cols))

    sel_last = last[:, idx[:, -1]]  # (r, B)
    return jnp.sum(v * sel_last.T, axis=-1)
