"""Device-mesh construction helpers.

Axis convention: ``("data", "model")`` — batch parallelism rides the
outer axis (DCN-friendly), tensor/mode parallelism the inner axis
(ICI-friendly).  On a single host the factorization is chosen to keep the
model axis as large as the problem needs and the data axis soaks up the
rest.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    shape: Sequence[int],
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh of the given logical shape over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(
            f"mesh shape {tuple(shape)} needs {n} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[:n]).reshape(shape)
    return Mesh(grid, tuple(axis_names))


def default_mesh(
    n_devices: Optional[int] = None, model_parallel: Optional[int] = None
) -> Mesh:
    """A ("data", "model") mesh over n devices.

    ``model_parallel`` fixes the inner-axis size; by default the devices
    all go to the model axis (tensor parallelism), matching the framework's
    dominant workloads (sharded contractions and sweeps).
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if model_parallel is None:
        model_parallel = n_devices
    assert n_devices % model_parallel == 0
    return make_mesh(
        (n_devices // model_parallel, model_parallel),
        ("data", "model"),
        devices[:n_devices],
    )
