"""Cross approximation: rank-adaptive interpolation over dimension trees."""

from tensor_networks_tpu.cross.cross import (
    CrossAlgo,
    CrossApproximation,
    CrossConfig,
    CrossResult,
    ConvergenceCheck,
)
from tensor_networks_tpu.cross.funcs import (
    TensorFunc,
    CachedFunc,
    FuncData,
    FuncTensorNetwork,
)
from tensor_networks_tpu.cross.runner import (
    CrossRunner,
    TTCrossRunner,
    HTCrossRunner,
    TuckerCrossRunner,
)
from tensor_networks_tpu.cross.maxvol import maxvol, maxvol_device

__all__ = [
    "CrossAlgo",
    "CrossApproximation",
    "CrossConfig",
    "CrossResult",
    "ConvergenceCheck",
    "TensorFunc",
    "CachedFunc",
    "FuncData",
    "FuncTensorNetwork",
    "CrossRunner",
    "TTCrossRunner",
    "HTCrossRunner",
    "TuckerCrossRunner",
    "maxvol",
    "maxvol_device",
]
