"""Search statistics and error metrics.

Metric names are kept identical to the reference
(``pytens/search/utils.py``) for drop-in log compatibility.
"""

from __future__ import annotations

import os

import numpy as np

from tensor_networks_tpu.network import TensorNetwork
from tensor_networks_tpu.search.state import SearchState
from tensor_networks_tpu.tensor import Tensor

EMPTY_SEARCH_STATS = {
    "networks": [],
    "best_networks": [],
    "best_cost": [],
    "costs": [],
    "errors": [],
    "ops": [],
    "unique": {},
    "count": 0,
}


def approx_error(tensor: Tensor, net: TensorNetwork) -> float:
    """Relative reconstruction error ||X - TN|| / ||X|| with free indices
    matched by identity (robust to index reordering)."""
    target_free = tensor.indices
    net_free = net.free_indices()
    net_value = np.asarray(net.contract().value)
    perm = [net_free.index(i) for i in target_free]
    net_value = net_value.transpose(perm)
    target = np.asarray(tensor.value)
    return float(np.linalg.norm(net_value - target) / np.linalg.norm(target))


def log_stats(
    search_stats: dict,
    target_tensor: Tensor,
    ts: float,
    st: SearchState,
    bn: TensorNetwork,
) -> None:
    """Append one time-series sample of the search trajectory."""
    search_stats["ops"].append((ts, len(st.past_actions)))
    search_stats["costs"].append((ts, st.network.cost()))
    search_stats["errors"].append((ts, approx_error(target_tensor, st.network)))
    search_stats["best_cost"].append((ts, bn.cost()))
    ukey = st.network.canonical_structure()
    search_stats["unique"][ukey] = search_stats["unique"].get(ukey, 0) + 1


def remove_temp_dir(temp_dir: str, temp_files) -> None:
    """Delete spilled preprocessing files and the directory if empty."""
    try:
        for temp_file in temp_files:
            os.remove(temp_file)
        if len(os.listdir(temp_dir)) == 0:
            os.rmdir(temp_dir)
    except FileNotFoundError:
        pass
