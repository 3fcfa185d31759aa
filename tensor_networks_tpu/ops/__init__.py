"""TT algebra, rounding families, TT-operators, and solvers."""

from tensor_networks_tpu.ops.tt import (
    tt_rank1,
    tt_separable,
    tt_right_orth,
    tt_sum,
    rand_tree,
)
from tensor_networks_tpu.ops.ttop import (
    ttop_rank1,
    ttop_rank2,
    ttop_sum,
    ttop_apply,
    ttop_sum_apply,
)
from tensor_networks_tpu.ops.rounding import tt_svd_round
from tensor_networks_tpu.ops.gram import (
    tt_gramsvd_round,
    tt_sum_gramsvd_round,
)
from tensor_networks_tpu.ops.randomized import (
    TTRandRound,
    tt_randomized_round,
    tt_sum_randomized_round,
    tt_rand_precond_svd_round,
)
from tensor_networks_tpu.ops.solvers import gmres
from tensor_networks_tpu.ops.als import als_solve, als_solve_adaptive
from tensor_networks_tpu.ops.evolve import (
    evolve_tdvp,
    evolve_tdvp2,
    evolve_theta,
    tdvp_trajectory,
)
from tensor_networks_tpu.ops.eigen import (
    als_eigsh,
    als_eigsh_adaptive,
    als_eigsh_k,
)
from tensor_networks_tpu.ops import packed, qtt
from tensor_networks_tpu.ops.packed import (
    PackedTT,
    PackedTTOp,
    gmres_packed,
)
from tensor_networks_tpu.ops.fast import (
    tt_inner_fast,
    tt_inner_fn,
    stack_tt_cores,
    tt_round_fixed,
)

__all__ = [
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
    "als_solve",
    "als_solve_adaptive",
    "als_eigsh",
    "als_eigsh_adaptive",
    "als_eigsh_k",
    "evolve_tdvp",
    "evolve_tdvp2",
    "evolve_theta",
    "tdvp_trajectory",
    "qtt",
    "packed",
    "PackedTT",
    "PackedTTOp",
    "gmres_packed",
    "tt_inner_fast",
    "tt_inner_fn",
    "stack_tt_cores",
    "tt_round_fixed",
]
