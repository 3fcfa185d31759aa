"""Sharded TT regression (tensor completion): the multi-chip training demo.

Fits a tensor train to sampled entries of a hidden low-rank target by
SGD, with the sample batch sharded over the mesh's ``data`` axis (DP) and
every core's mode dimension sharded over ``model`` (TP).  The whole step
is one jitted XLA program; collectives are inserted by GSPMD.

Run with any device count — on one host, virtual devices work:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/tt_regression_multichip.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import sys

import jax
import jax.numpy as jnp
import numpy as np

from tensor_networks_tpu import Index, TensorNetwork
from tensor_networks_tpu.parallel import (
    init_tt_params,
    make_mesh,
    make_train_step,
)


def main(d: int = 6, n: int = 16, r: int = 4, steps: int = 100):
    n_dev = jax.device_count()
    if jax.default_backend() == "cpu":
        # the in-process CPU communicator deadlocks on Adam's two-axis
        # collective schedule; keep everything on the model axis there
        data, model = 1, n_dev
    else:
        model = max(1, n_dev // 2) if n_dev > 1 else 1
        data = n_dev // model
    mesh = make_mesh((data, model), ("data", "model"))
    print(
        f"[train] mesh data={data} x model={model} "
        f"({jax.default_backend()})",
        file=sys.stderr,
    )

    # hidden target: a rank-3 train
    np.random.seed(0)
    indices = [Index(f"x{i}", n) for i in range(d)]
    target = TensorNetwork.rand_tt(indices, [3] * (d - 1), dtype=np.float32)
    target.scale(float(n) ** (-d / 2))  # O(1) entries

    batch = 1024
    idx = np.random.randint(0, n, size=(batch, d))
    y = np.asarray(target.evaluate(target.free_indices(), idx)).astype(
        np.float32
    )
    y = y / np.sqrt(np.mean(y**2))  # unit-RMS targets

    from tensor_networks_tpu.parallel.training import make_adam_train_step

    params = init_tt_params(d, n, r, dtype=jnp.float32, seed=1)
    step, init_state, place_params, place_batch = make_adam_train_step(
        mesh, lr=2e-2
    )
    params = place_params(params)
    opt_state = init_state(params)
    idx_dev, y_dev = place_batch(idx, y)

    for it in range(steps):
        params, opt_state, loss = step(params, opt_state, idx_dev, y_dev)
        if it % 50 == 0 or it == steps - 1:
            print(f"[train] step {it:4d}  mse {float(loss):.3e}",
                  file=sys.stderr)

    final = float(loss)
    rel = np.sqrt(final) / np.sqrt(np.mean(y**2))
    print(f"[train] final relative fit error: {rel:.3e}", file=sys.stderr)
    return final


if __name__ == "__main__":
    main()
