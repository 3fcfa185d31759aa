"""TT rounding — the exact delta-SVD sweep.

The four rounding families live in three modules:

* here: :func:`tt_svd_round` — right-orthogonalize then forward
  delta-SVD truncation, threading the unspent error budget between bonds
  (TTSVD, Oseledets 2011).  The reference-accuracy path.
* :mod:`tensor_networks_tpu.ops.gram` — Gram-SVD rounding for single
  trains and implicit sums (eigh + GEMMs only, TPU-friendly).
* :mod:`tensor_networks_tpu.ops.randomized` — sketch-based rounding to
  fixed target ranks (static shapes; the production device path, with
  the all-device variant in :mod:`tensor_networks_tpu.ops.packed`).

The fused single-dispatch form of this sweep is
``ops.fast.tt_round_fixed`` (static shapes, masked truncation).
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from tensor_networks_tpu.kernels import delta_svd
from tensor_networks_tpu.network import TensorNetwork
from tensor_networks_tpu.ops.fast import sweep_noise_floor
from tensor_networks_tpu.ops.tt import tt_right_orth


@jax.jit
def _push_right(v_mat: jnp.ndarray, next_core: jnp.ndarray) -> jnp.ndarray:
    """Absorb the (s @ v) factor into the next core's left bond."""
    return jnp.tensordot(v_mat, next_core, axes=(1, 0))


def tt_svd_round(tn: TensorNetwork, eps: float) -> TensorNetwork:
    """Round a TT in place: backward QR sweep then forward truncation.

    The first bond consumes a norm-relative budget ``eps/sqrt(dim-1)``;
    whatever error a truncation does not spend carries to the next bond
    (the ``remaining_delta`` bookkeeping in :func:`delta_svd`).
    """
    dim = tn.dim()
    sample = tn.value(list(tn.network.nodes)[0])
    floor = sweep_noise_floor(sample.dtype, dim)
    if eps < floor:
        warnings.warn(
            f"requested relative eps={eps:.1e} is below the ~{floor:.1e} "
            f"noise floor of a {dim}-core {sample.dtype} rounding sweep; "
            "truncation may not engage on device. Use float64 inputs or "
            "ops.fast.tt_round_fixed(..., reorth=True).",
            RuntimeWarning,
            stacklevel=2,
        )
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
        _push_right(v, out.value(first + 1))
    )

    for node in nodes[1:-1]:
        value = out.value(node)
        r1, n, r2 = value.shape
        trunc = delta_svd(value.reshape(r1 * n, r2), delta)
        v = trunc.s[:, None] * trunc.v
        rank = trunc.u.shape[1]
        out.node_tensor(node).update_val_size(trunc.u.reshape(r1, n, rank))
        out.node_tensor(node + 1).update_val_size(
            _push_right(v, out.value(node + 1))
        )
    return out
