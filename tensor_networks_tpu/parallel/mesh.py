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


def make_hybrid_mesh(
    n_slices: int,
    per_slice_shape: Sequence[int],
    axis_names: Sequence[str] = ("slice", "data", "model"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A multi-slice mesh: the outer axis crosses slice boundaries (DCN),
    the inner axes stay within a slice (ICI).

    On real multi-slice hardware this delegates to
    ``mesh_utils.create_hybrid_device_mesh`` so that the outer axis maps
    onto the slow interconnect; on a single slice (or CPU test meshes) it
    reshapes the flat device list, which preserves the semantics for
    correctness testing.  Shard batch/data axes over ``slice`` (pure
    data parallelism needs one gradient all-reduce per step, the only
    collective that rides DCN) and keep mode/bond shardings on the inner
    ICI axes.
    """
    if devices is None:
        devices = jax.devices()
    shape = (n_slices, *per_slice_shape)
    if len(shape) != len(tuple(axis_names)):
        raise ValueError(
            f"{len(shape)} mesh dims need {len(shape)} axis names, "
            f"got {tuple(axis_names)}"
        )
    n_per_slice = int(np.prod(per_slice_shape))
    try:
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            per_slice_shape,
            (n_slices,) + (1,) * (len(per_slice_shape) - 1),
            devices=devices,
        ).reshape(shape)
    except Exception:
        # single-slice / host-platform fallback: contiguous blocks of
        # devices per slice (what a slice boundary looks like to XLA
        # when every "slice" is the same host)
        n = n_slices * n_per_slice
        if n > len(devices):
            raise ValueError(
                f"hybrid mesh {shape} needs {n} devices, "
                f"have {len(devices)}"
            )
        grid = np.asarray(devices[:n]).reshape(shape)
    return Mesh(grid, tuple(axis_names))
