"""Tensor-network structure search: exhaustive enumeration and
output-directed-split program synthesis with exact rank assignment."""

from tensor_networks_tpu.search.configuration import (
    HeuristicConfig,
    RankSearchConfig,
    ProgramSearchConfig,
    SearchEngineConfig,
    OutputConfig,
    PreprocessConfig,
    SearchConfig,
)
from tensor_networks_tpu.search.state import (
    Action,
    OSplit,
    ISplit,
    Merge,
    SearchState,
)
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
