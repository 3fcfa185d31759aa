"""Segment-sorted batched TT evaluation via grouped (ragged) matmuls.

The one-hot evaluate kernels (``pallas_ops.tt_evaluate_pallas`` and the
XLA scan form, reference semantics ``pytens/algs.py:1103-1177``) pay
for a ``(B, r) x (r, n*r)`` matmul per train step and then throw away
``(n-1)/n`` of the result in the mode-selection reduce — n-fold wasted
MXU work, which is why throughput plateaued at ~1 Mpts/s (ROADMAP #1:
four kernel redesigns all hit the same wall).

This path does only the useful FLOPs: per step, points are SORTED by
their mode index and each group is multiplied by exactly its own
``(r, r)`` mode slice with ONE ``lax.ragged_dot`` (the MoE grouped
matmul primitive — TPU-native, no static segment capacities, no lossy
bucketing).  Per step that is ``B*r*r`` MACs instead of ``B*r*n*r``.

With the MXU waste gone the kernel is HBM-gather-bound, so the
permutation plumbing is minimized: all sort permutations and group
counts come from ONE batched ``argsort`` over the index matrix outside
the scan, and the unsort of step k is composed with the sort of step
k+1 into a single gather (the carry lives in sorted-by-current-mode
order for the whole train; one ``(B, r)`` gather + one ragged matmul
per step).  Measured on v5e at d=50 n=32 r=100, B=8192: full-f32
("highest") beats the one-hot pallas kernel's bf16x3 mode ~3x while
being MORE accurate; raw-bf16 is faster still.

``precision="bf16x3"`` is intentionally routed to full f32: the
three-pass split is slower here (the extra VPU splits cost more than
the MXU passes they save — this kernel is not MXU-bound) and
``ragged_dot`` on bf16 operands measured only bf16-level accuracy
(~1e-2) on TPU, violating the ~5e-5 bf16x3 contract.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax


@lru_cache(maxsize=8)
def _ragged_eval_fn(precision: str):
    prec = {
        "highest": lax.Precision.HIGHEST,
        "bf16x3": lax.Precision.HIGHEST,  # see module docstring
        "default": lax.Precision.DEFAULT,
    }[precision]

    # "default" carries bf16 end-to-end: the kernel is HBM-bound (the
    # per-step (B, r) carry gather plus the (n, r, r) core stream), so
    # halving the bytes is ~the speedup; accuracy is bf16-level, which
    # is this mode's documented contract
    cdt = jnp.bfloat16 if precision == "default" else jnp.float32

    def run(first, mids, last, idx):
        b = idx.shape[0]
        d_mid, _, n, _ = mids.shape
        # (d_mid, n, r, r): group dim first, as ragged_dot wants
        mids_t = jnp.moveaxis(mids, 2, 1).astype(cdt)
        cols = idx[:, 1:-1].T.astype(jnp.int32)  # (d_mid, B)
        perms = jnp.argsort(cols, axis=1, stable=True).astype(jnp.int32)
        inv = jnp.argsort(perms, axis=1, stable=True).astype(jnp.int32)
        sorted_cols = jnp.take_along_axis(cols, perms, axis=1)
        counts = jax.vmap(
            lambda c: jnp.bincount(c, length=n).astype(jnp.int32)
        )(sorted_cols)

        # composed gathers: step 0 sorts the fresh carry with perms[0];
        # step k>0 maps (k-1)-sorted order straight to k-sorted order
        # via inv[k-1][perms[k]] — one gather per step instead of a
        # sort gather plus an unsort gather
        if d_mid > 1:
            hops = jnp.take_along_axis(inv[:-1], perms[1:], axis=1)
            q = jnp.concatenate([perms[:1], hops], axis=0)
        else:
            q = perms[:1]

        carry = first[idx[:, 0], :].astype(cdt)  # (B, r)

        def step(c, xs):
            qk, cnt, core = xs
            cs = jnp.take(c, qk, axis=0)
            out = lax.ragged_dot(
                cs,
                core,
                cnt,
                precision=prec,
                preferred_element_type=cdt,
            )
            return out, None

        carry, _ = lax.scan(step, carry, (q, counts, mids_t))

        # carry is in perms[-1] order; contract with the matching last
        # fibers, then one gather back to original point order
        lastcols = jnp.take(idx[:, -1].astype(jnp.int32), perms[-1])
        lvec = last.astype(cdt).T[lastcols]  # (B, r)
        vals = jnp.sum(
            carry.astype(jnp.float32) * lvec.astype(jnp.float32), axis=1
        )
        return jnp.take(vals, inv[-1])

    return jax.jit(run)


def tt_evaluate_ragged(first, mids, last, idx, precision: str = "bf16x3"):
    """Evaluate a uniform TT at (B, d) integer multi-indices.

    Same semantics as ``pallas_ops.tt_evaluate_pallas`` / the XLA scan
    form (reference ``pytens/algs.py:1103-1177``): returns (B,) f32.
    Requires d >= 3 and uniform mid cores (r, n, r).
    """
    if mids is None or mids.shape[0] == 0:
        raise ValueError("tt_evaluate_ragged needs d >= 3")
    return _ragged_eval_fn(precision)(first, mids, last, idx)
