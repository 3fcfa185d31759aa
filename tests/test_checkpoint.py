"""Training-state checkpoint round-trips (orbax or npz fallback)."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from tensor_networks_tpu.parallel import init_tt_params
from tensor_networks_tpu.parallel.checkpoint import (
    load_train_state,
    save_train_state,
)


def test_params_roundtrip():
    params = init_tt_params(5, 4, 3, dtype=jnp.float32, seed=0)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt")
        save_train_state(path, params, step=7)
        template = {
            "params": init_tt_params(5, 4, 3, dtype=jnp.float32, seed=1),
            "step": 0,
        }
        restored, opt_state, step = load_train_state(path, template)
    assert step == 7
    assert opt_state is None
    for a, b in zip(restored, params):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_params_and_opt_state_roundtrip():
    import optax

    params = init_tt_params(4, 3, 2, dtype=jnp.float32, seed=2)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt")
        save_train_state(path, params, opt_state=opt_state, step=3)
        template = {
            "params": init_tt_params(4, 3, 2, dtype=jnp.float32, seed=9),
            "opt_state": tx.init(
                init_tt_params(4, 3, 2, dtype=jnp.float32, seed=9)
            ),
            "step": 0,
        }
        restored, opt_restored, step = load_train_state(path, template)
    assert step == 3
    assert opt_restored is not None
    for a, b in zip(restored, params):
        assert np.allclose(np.asarray(a), np.asarray(b))
