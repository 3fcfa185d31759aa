"""Distributed TT sweeps: train sharded across devices, carries over ICI.

The scaling axis of this framework is not batch size but *train length*
(many dimensions — the QTT regime) and *bond width*.  For trains whose
cores exceed one chip's HBM, the cores are sharded along the train
(core block k on device k — the pipeline-parallel placement) and the
orthogonalization sweep passes its (r x r) carry between neighboring
devices with ``lax.ppermute`` — structurally the ring-attention neighbor
pipeline, but carrying bond matrices.

Implemented with ``shard_map`` so the collective schedule is explicit:
stage s is active on device s; everyone else forwards.  The sweep is
inherently sequential across the train, so wall-clock matches the fused
single-chip scan — the win is memory capacity (d x r x n x r / P per
chip) with only (P-1) r x r hops of ICI traffic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_right_orth_block(block: jnp.ndarray, carry: jnp.ndarray):
    """Right-orthogonalize a local block of middle cores given the carry
    entering from the right; returns (new carry, orthogonalized block)."""

    def step(c, core):
        rr, n, rc = core.shape
        cur = jnp.einsum("rnk,kc->rnc", core, c)
        q, rmat = jnp.linalg.qr(cur.reshape(rr, n * rc).T)
        return rmat.T, q.T.reshape(rr, n, rc)

    carry, out = jax.lax.scan(step, carry, block, reverse=True)
    return carry, out


def tt_right_orth_sharded(
    mesh: Mesh, mids: jnp.ndarray, last: jnp.ndarray
):
    """Right-orthogonalize a uniform TT whose middle cores are sharded
    along the train over the mesh's ``model`` axis.

    ``mids`` is (d-2, r, n, r) with the leading axis sharded; ``last`` is
    (r, n) replicated.  Returns (carry for the first core, orthogonalized
    mids with the same sharding, orthogonalized last).

    Stage p runs its local scan while the carry travels right-to-left via
    ``ppermute``; each hop moves only an (r x r) matrix over ICI.
    """
    n_stages = mesh.shape["model"]
    r = last.shape[0]

    def body(mids_local, last_rep):
        my = jax.lax.axis_index("model")

        # last core: QR on every device (replicated, cheap), zero-padded
        # for rank-deficient bonds
        ql, rl = jnp.linalg.qr(last_rep.T)
        if ql.shape[1] < r:
            ql = jnp.pad(ql, ((0, 0), (0, r - ql.shape[1])))
            rl = jnp.pad(rl, ((0, r - rl.shape[0]), (0, 0)))
        last_q = ql.T
        carry = rl.T
        # the carry starts replicated but becomes device-varying once the
        # staged scan runs; mark it varying for shard_map's type system
        carry = jax.lax.pcast(carry, ("model",), to="varying")

        out_block = jnp.zeros_like(mids_local)
        # stages run right-to-left along the train
        for stage in range(n_stages - 1, -1, -1):
            def active(args):
                c, blk = args
                return _local_right_orth_block(blk, c)

            def passive(args):
                c, blk = args
                return c, jnp.zeros_like(blk)

            new_carry, new_block = jax.lax.cond(
                my == stage, active, passive, (carry, mids_local)
            )
            out_block = jnp.where(my == stage, new_block, out_block)
            if stage > 0:
                # hand the carry from device `stage` to `stage - 1`
                perm = [(s, (s - 1) % n_stages) for s in range(n_stages)]
                carry = jax.lax.ppermute(new_carry, "model", perm)
            else:
                carry = new_carry

        # replicate the final carry (only device 0 holds the true value)
        carry = jax.lax.psum(
            jnp.where(my == 0, carry, jnp.zeros_like(carry)), "model"
        )
        return carry, out_block, last_q

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("model", None, None, None), P(None, None)),
        out_specs=(P(), P("model", None, None, None), P(None, None)),
    )
    return jax.jit(fn)(mids, last)


def place_train_sharded(mesh: Mesh, mids: jnp.ndarray, last: jnp.ndarray):
    """Shard the middle cores along the train over the model axis."""
    mids = jax.device_put(
        mids, NamedSharding(mesh, P("model", None, None, None))
    )
    last = jax.device_put(last, NamedSharding(mesh, P(None, None)))
    return mids, last
