"""Training-state checkpointing (orbax when available, npz fallback).

Persists :class:`TTParams` plus arbitrary optimizer-state pytrees for the
sharded training loops; network-level checkpointing lives in
``TensorNetwork.save_npz`` / ``to_separated_dict``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

from tensor_networks_tpu.parallel.training import TTParams

try:
    import orbax.checkpoint as ocp

    ORBAX_AVAILABLE = True
except Exception:  # pragma: no cover
    ORBAX_AVAILABLE = False


def save_train_state(
    path: str, params: TTParams, opt_state: Any = None, step: int = 0
) -> str:
    """Checkpoint params (+ optional optimizer state) to ``path``.

    Uses orbax's standard checkpointer when importable; otherwise a
    plain npz + json fallback with identical restore semantics.
    """
    state = {"params": params._asdict(), "step": np.asarray(step)}
    if opt_state is not None:
        state["opt_state"] = opt_state

    if ORBAX_AVAILABLE:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
        ckptr.wait_until_finished()
        return path

    leaves, treedef = jax.tree.flatten(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(
        path + ".npz",
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
    )
    with open(path + ".treedef.json", "w", encoding="utf-8") as f:
        json.dump({"treedef": str(treedef), "n": len(leaves)}, f)
    return path


def load_train_state(
    path: str, template: Optional[Any] = None
) -> Tuple[TTParams, Any, int]:
    """Restore ``(params, opt_state, step)`` from a checkpoint.

    With orbax, ``template`` (a state pytree of the same structure, e.g.
    from a fresh ``init``) guides restoration; the fallback restores by
    flattening the template.
    """
    if ORBAX_AVAILABLE:
        ckptr = ocp.StandardCheckpointer()
        if template is not None:
            tmpl = {
                "params": template["params"]._asdict()
                if isinstance(template.get("params"), TTParams)
                else template["params"],
                "step": np.asarray(template.get("step", 0)),
            }
            if template.get("opt_state") is not None:
                tmpl["opt_state"] = template["opt_state"]
            state = ckptr.restore(os.path.abspath(path), target=tmpl)
        else:
            state = ckptr.restore(os.path.abspath(path))
    else:
        if template is None:
            raise ValueError(
                "the npz fallback needs a template state pytree"
            )
        tmpl = {
            "params": template["params"]._asdict()
            if isinstance(template.get("params"), TTParams)
            else template["params"],
            "step": np.asarray(template.get("step", 0)),
        }
        if template.get("opt_state") is not None:
            tmpl["opt_state"] = template["opt_state"]
        leaves, treedef = jax.tree.flatten(tmpl)
        data = np.load(path + ".npz")
        restored = [data[f"leaf_{i}"] for i in range(len(leaves))]
        state = jax.tree.unflatten(treedef, restored)

    params = TTParams(**state["params"])
    return params, state.get("opt_state"), int(np.asarray(state["step"]))
