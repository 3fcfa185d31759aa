"""tensor_networks_tpu — a TPU-native tensor-network framework.

A from-scratch JAX/XLA re-design of the capabilities of
``gorodetsky-umich/tensor_networks`` (pytens): named-index tensor networks
on a host-side graph, einsum contraction with edge-aware cached plans,
TT/Tucker/HT constructors, four TT-rounding families, TT-operators and a
TT-GMRES solver, dimension-tree cross approximation (maxvol/DEIM), and a
tensor-network structure-search engine — plus multi-chip sharding
(:mod:`tensor_networks_tpu.parallel`) that the single-process reference
does not have.

Numerics run as jit-compiled XLA programs; float64 is enabled because the
library's accuracy contract (1e-13-level rounding fidelity) requires it.
On TPU, pass float32/bfloat16 arrays for full-speed execution — x64 mode
only *allows* wide types, it does not force them.
"""

import os as _os

import jax as _jax

# x64 is on by default (the library's accuracy contract needs it on CPU);
# set TNT_ENABLE_X64=0 for pure-f32/bf16 TPU runs.
if _os.environ.get("TNT_ENABLE_X64", "1") != "0":
    _jax.config.update("jax_enable_x64", True)

# On TPU, f32 matmuls default to single-pass bf16 (~1e-3 relative error),
# which violates the library's accuracy contract for graph contractions
# and rounding.  Default everything to full f32; explicit fast paths
# opt into lower precision themselves.  Override: TNT_MATMUL_PRECISION
# in {"default", "high", "highest", ""} ("" leaves JAX's default).
_prec = _os.environ.get("TNT_MATMUL_PRECISION", "highest")
if _prec:
    _jax.config.update("jax_default_matmul_precision", _prec)

from tensor_networks_tpu.types import (  # noqa: E402
    Index,
    IndexName,
    IntOrStr,
    NodeName,
    SVDConfig,
)
from tensor_networks_tpu.dimtree import DimTreeNode, NodeInfo  # noqa: E402
from tensor_networks_tpu.kernels import TruncSVD, delta_svd  # noqa: E402
from tensor_networks_tpu.tensor import Tensor  # noqa: E402
from tensor_networks_tpu.network import (  # noqa: E402
    EinsumArgs,
    TensorNetwork,
    vector,
)
from tensor_networks_tpu.ops import (  # noqa: E402
    tt_rank1,
    tt_separable,
    tt_right_orth,
    tt_sum,
    rand_tree,
    ttop_rank1,
    ttop_rank2,
    ttop_sum,
    ttop_apply,
    ttop_sum_apply,
    tt_svd_round,
    tt_gramsvd_round,
    tt_sum_gramsvd_round,
    TTRandRound,
    tt_randomized_round,
    tt_sum_randomized_round,
    tt_rand_precond_svd_round,
    gmres,
    als_solve,
    als_eigsh,
    evolve_theta,
    tdvp_trajectory,
    evolve_tdvp,
    evolve_tdvp2,
    packed,
    PackedTT,
    PackedTTOp,
    gmres_packed,
    tt_inner_fast,
    tt_inner_fn,
    stack_tt_cores,
    tt_round_fixed,
)
from tensor_networks_tpu import fit  # noqa: E402
from tensor_networks_tpu import export  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "Index",
    "IndexName",
    "IntOrStr",
    "NodeName",
    "SVDConfig",
    "DimTreeNode",
    "NodeInfo",
    "TruncSVD",
    "delta_svd",
    "Tensor",
    "EinsumArgs",
    "TensorNetwork",
    "vector",
    "tt_rank1",
    "tt_separable",
    "tt_right_orth",
    "tt_sum",
    "rand_tree",
    "ttop_rank1",
    "ttop_rank2",
    "ttop_sum",
    "ttop_apply",
    "ttop_sum_apply",
    "tt_svd_round",
    "tt_gramsvd_round",
    "tt_sum_gramsvd_round",
    "TTRandRound",
    "tt_randomized_round",
    "tt_sum_randomized_round",
    "tt_rand_precond_svd_round",
    "gmres",
    "packed",
    "PackedTT",
    "PackedTTOp",
    "gmres_packed",
    "als_solve",
    "als_eigsh",
    "evolve_theta",
    "tdvp_trajectory",
    "evolve_tdvp",
    "evolve_tdvp2",
    "tt_inner_fast",
    "tt_inner_fn",
    "stack_tt_cores",
    "tt_round_fixed",
    "fit",
    "export",
]
