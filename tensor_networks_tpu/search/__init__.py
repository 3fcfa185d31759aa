"""Tensor-network structure search.

Layers: the action vocabulary and MDP (:mod:`.actions`, :mod:`.mdp`),
exhaustive drivers (:mod:`.drivers`), bipartition spectra and the exact
rank solver (:mod:`.spectra`, :mod:`.constraint`), program synthesis with
a killable watchdog (:mod:`.synthesis`), and the :class:`SearchEngine`
facade (:mod:`.search`).
"""

from tensor_networks_tpu.search.actions import (
    Action,
    ISplit,
    Merge,
    OSplit,
)
from tensor_networks_tpu.search.configuration import (
    HeuristicConfig,
    OutputConfig,
    PreprocessConfig,
    ProgramSearchConfig,
    RankSearchConfig,
    SearchConfig,
    SearchEngineConfig,
)
from tensor_networks_tpu.search.mdp import SearchState
from tensor_networks_tpu.search.search import SearchEngine

__all__ = [
    "HeuristicConfig",
    "RankSearchConfig",
    "ProgramSearchConfig",
    "SearchEngineConfig",
    "OutputConfig",
    "PreprocessConfig",
    "SearchConfig",
    "Action",
    "OSplit",
    "ISplit",
    "Merge",
    "SearchState",
    "SearchEngine",
]
