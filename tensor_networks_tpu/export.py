"""Ahead-of-time export of tensor networks as portable serving artifacts.

The reference serializes network *state* — pickle, node-link dicts,
separated metadata+arrays (``pytens/algs.py:1487-1580``); loading still
requires the library and re-tracing to evaluate.  This module exports the
compiled *program*: the batched point evaluator of a network is lowered
once to a shape-polymorphic StableHLO artifact (``jax.export``) that any
JAX process — with or without ``tensor_networks_tpu`` installed — can
deserialize and run on CPU or TPU at ANY batch size with zero retracing.
No reference counterpart (the reference has no compiled-program story).

Design notes (TPU-first):

* the batch axis is exported symbolically (``jax.export.symbolic_shape``)
  so ONE artifact admits every request size — no re-export, no Python
  retrace.  Execution still specializes per concrete shape (XLA
  compiles static shapes), so the evaluator pads requests to pow2
  buckets by default: any request stream compiles at most
  ``log2(max_batch)`` specializations per backend instead of one per
  distinct size — the difference between bounded and unbounded compile
  cost through a 20-60 s-per-compile TPU relay;
* node values are *arguments* of the exported function, not constants
  baked into it: a serving process can hot-swap refreshed weights of the
  same structure (:meth:`ExportedEvaluator.update_values`) without
  re-exporting, and the artifact stays small;
* out-of-range multi-indices follow XLA gather semantics (clamp to the
  valid range) on every platform, matching the device path of
  :meth:`TensorNetwork.evaluate`.

The module-level helpers keep the artifact self-contained: ``save``
writes ONE ``.npz`` holding the serialized program, the current node
values, and a JSON manifest (index names/sizes, column order, dtype);
``load`` restores a callable evaluator from it.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from tensor_networks_tpu.network import TensorNetwork
from tensor_networks_tpu.types import Index

__all__ = ["ExportedEvaluator", "export_evaluator", "load"]

_BATCH_SYMBOL = "b"


class ExportedEvaluator:
    """A compiled, shape-polymorphic point evaluator of one topology.

    ``ev(points)`` evaluates the network at an ``(N, k)`` integer
    multi-index array (columns ordered like the exported ``indices``)
    and returns an ``(N,)`` NumPy array, for any ``N >= 1``, without
    Python retracing.  ``bucket_batches`` (default True) pads each
    request to the next power of two so a serving process compiles at
    most ``log2(max_batch)`` XLA specializations per backend; set it
    False to run exact request shapes (one specialization per distinct
    size).  Construct via :func:`export_evaluator` or :func:`load`.
    """

    def __init__(
        self,
        exported: jax_export.Exported,
        values: Sequence[jnp.ndarray],
        index_names: Sequence[str],
        index_sizes: Sequence[int],
        bucket_batches: bool = True,
    ):
        self._exported = exported
        self._values = [jnp.asarray(v) for v in values]
        self.index_names = list(index_names)
        self.index_sizes = [int(s) for s in index_sizes]
        self.bucket_batches = bucket_batches

    # -- serving ------------------------------------------------------------------------------

    def __call__(self, points: np.ndarray) -> np.ndarray:
        pts = np.asarray(points)
        if pts.ndim != 2 or pts.shape[1] != len(self.index_names):
            raise ValueError(
                f"points must be (N, {len(self.index_names)}) for indices "
                f"{self.index_names}, got {pts.shape}"
            )
        npts = pts.shape[0]
        if npts == 0:
            return np.empty((0,), dtype=np.asarray(self._values[0]).dtype)
        if self.bucket_batches:
            m = 1 << (npts - 1).bit_length()
            if m > npts:
                pts = np.concatenate(
                    [pts, np.repeat(pts[-1:], m - npts, axis=0)]
                )
        out = self._exported.call(
            self._values, jnp.asarray(pts.astype(np.int32))
        )
        return np.asarray(out)[:npts]

    @property
    def platforms(self) -> List[str]:
        return list(self._exported.platforms)

    def update_values(
        self, source: Union[TensorNetwork, Sequence[np.ndarray]]
    ) -> None:
        """Swap in refreshed node values of the SAME structure.

        ``source`` is a network with identical topology (node order and
        shapes) or an explicit value list.  The compiled program is
        untouched — this is the serving-side weight-refresh path.
        """
        if isinstance(source, TensorNetwork):
            vals = [
                source.node_tensor(n).value for n in source.network.nodes
            ]
        else:
            vals = list(source)
        if len(vals) != len(self._values):
            raise ValueError(
                f"expected {len(self._values)} node values, got {len(vals)}"
            )
        new = []
        for old, v in zip(self._values, vals):
            arr = jnp.asarray(v, dtype=old.dtype)
            if arr.shape != old.shape:
                raise ValueError(
                    f"node value shape {arr.shape} != exported {old.shape}"
                )
            new.append(arr)
        self._values = new

    # -- persistence --------------------------------------------------------------------------

    def save(self, path: str) -> str:
        """Write the artifact (program + values + manifest) as one .npz.

        Returns the path actually written: ``np.savez`` appends
        ``.npz`` to extension-less paths, so ``save``/``load`` normalize
        to that name instead of letting the pair silently diverge.
        """
        if not path.endswith(".npz"):
            path = path + ".npz"
        blob = self._exported.serialize()
        meta = {
            "format": "tnt-exported-evaluator-v1",
            "index_names": self.index_names,
            "index_sizes": self.index_sizes,
            "platforms": self.platforms,
            "n_values": len(self._values),
            "bucket_batches": bool(self.bucket_batches),
        }
        arrays = {
            f"value_{i}": np.asarray(v) for i, v in enumerate(self._values)
        }
        np.savez(
            path,
            artifact=np.frombuffer(blob, dtype=np.uint8),
            manifest=np.frombuffer(
                json.dumps(meta).encode("utf-8"), dtype=np.uint8
            ),
            **arrays,
        )
        return path


def load(path: str) -> ExportedEvaluator:
    """Restore an :class:`ExportedEvaluator` written by ``save``."""
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        # mirror save's np.savez extension normalization
        path = path + ".npz"
    with np.load(path) as data:
        meta = json.loads(bytes(data["manifest"].tobytes()).decode("utf-8"))
        if meta.get("format") != "tnt-exported-evaluator-v1":
            raise ValueError(f"not a tnt exported evaluator: {path}")
        exported = jax_export.deserialize(bytearray(data["artifact"].tobytes()))
        values = [
            jnp.asarray(data[f"value_{i}"])
            for i in range(meta["n_values"])
        ]
    return ExportedEvaluator(
        exported,
        values,
        meta["index_names"],
        meta["index_sizes"],
        bucket_batches=bool(meta.get("bucket_batches", True)),
    )


def export_evaluator(
    net: TensorNetwork,
    indices: Optional[Sequence[Index]] = None,
    dtype=None,
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> ExportedEvaluator:
    """Lower ``net``'s batched evaluator to a portable AOT artifact.

    ``indices`` fixes the column order of the query array (default: the
    network's free indices).  ``dtype`` optionally casts node values at
    export time — pass ``jnp.float32`` when the artifact must run on TPU
    but the network carries f64 cores (TPU has no f64; an f64 artifact
    exports fine but only the CPU platform can execute it).
    """
    if indices is None:
        indices = net.free_indices()
    indices = list(indices)
    free = set(net.free_indices())
    missing = [i for i in indices if i not in free]
    if missing or len(set(indices)) != len(indices) or len(indices) != len(free):
        raise ValueError(
            f"indices must be exactly the free indices of the network; "
            f"got {[i.name for i in indices]} vs "
            f"{sorted(i.name for i in free)}"
        )

    # the pure jitted evaluator of this topology; batch_size only shapes
    # the plan metadata — the traced program is batch-polymorphic
    fn, values = net.evaluator(indices, batch_size=2, host=False)
    values = [
        jnp.asarray(v) if dtype is None else jnp.asarray(v, dtype=dtype)
        for v in values
    ]

    (b,) = jax_export.symbolic_shape(_BATCH_SYMBOL)
    val_specs = [jax.ShapeDtypeStruct(v.shape, v.dtype) for v in values]
    cols_spec = jax.ShapeDtypeStruct((b, len(indices)), np.int32)
    exported = jax_export.export(fn, platforms=tuple(platforms))(
        val_specs, cols_spec
    )
    return ExportedEvaluator(
        exported,
        values,
        [i.name for i in indices],
        [i.size for i in indices],
    )
