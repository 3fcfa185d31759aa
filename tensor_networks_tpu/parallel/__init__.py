"""Multi-chip execution: mesh construction, sharded TT kernels, training.

The reference is single-process NumPy; this subsystem is the TPU-native
scale-out story: ``jax.sharding`` meshes with XLA collectives over ICI.
No hand-written communication layer — shardings are annotated and XLA
lowers the collectives (psum for sharded contractions, all-gathers for
bond factors).
"""

from tensor_networks_tpu.parallel.mesh import (
    make_mesh,
    make_hybrid_mesh,
    default_mesh,
)
from tensor_networks_tpu.parallel.sharded import (
    tt_inner_mode_sharded,
    shard_tt_params,
    tt_evaluate_batched,
)
from tensor_networks_tpu.parallel.training import (
    TTParams,
    make_train_step,
    init_tt_params,
)
from tensor_networks_tpu.parallel.sweeps import (
    tt_right_orth_sharded,
    tt_gram_round_sharded,
    tt_prefix_round_sharded,
    tt_inner_train_sharded,
    place_train_sharded,
)
from tensor_networks_tpu.parallel.evolve import (
    add_sharded,
    evolve_tdvp2_sharded,
    evolve_tdvp_sharded,
    evolve_theta_sharded,
    place_tdvp_sharded,
    tdvp_step_sharded,
    ttop_apply_sharded,
)
from tensor_networks_tpu.parallel.als import (
    als_solve_adaptive_sharded,
    als_solve_sharded,
    place_als_sharded,
)
from tensor_networks_tpu.parallel.eigen import (
    als_eigsh_adaptive_sharded,
    als_eigsh_k_sharded,
    als_eigsh_sharded,
    place_eigsh_sharded,
)

__all__ = [
    "add_sharded",
    "als_eigsh_adaptive_sharded",
    "als_eigsh_k_sharded",
    "als_eigsh_sharded",
    "als_solve_adaptive_sharded",
    "als_solve_sharded",
    "place_als_sharded",
    "place_eigsh_sharded",
    "evolve_tdvp2_sharded",
    "evolve_tdvp_sharded",
    "evolve_theta_sharded",
    "ttop_apply_sharded",
    "place_tdvp_sharded",
    "tdvp_step_sharded",
    "make_mesh",
    "make_hybrid_mesh",
    "default_mesh",
    "tt_inner_mode_sharded",
    "shard_tt_params",
    "tt_evaluate_batched",
    "TTParams",
    "make_train_step",
    "init_tt_params",
    "tt_right_orth_sharded",
    "tt_gram_round_sharded",
    "tt_prefix_round_sharded",
    "tt_inner_train_sharded",
    "place_train_sharded",
]
