"""PackedTT: static-shape tensor trains for production device loops.

The graph engine (:mod:`tensor_networks_tpu.network`) is fully general;
this module is the serving/production path for *uniform* trains: cores
live as three stacked device arrays, every operation is a fused
``lax.scan`` with static shapes, and rank control uses **randomized
rounding to fixed target ranks** (arXiv:2110.04393) so nothing ever
leaves the device — the TPU-native answer to the reference's
dynamically-shaped SVD sweeps.

Provided: pack/unpack, inner/norm/scale, k-ary add (block embedding),
TT-operator apply, fixed-rank randomized rounding, and
:func:`gmres_packed` — TT-GMRES whose whole iteration is jit-compiled.

Parity anchors: ``pytens/algs.py`` tt_sum :2535, ttop_apply :2662,
TTRandRound :2133, gmres :2700.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensor_networks_tpu.network import TensorNetwork
from tensor_networks_tpu.ops.fast import stack_tt_cores, tt_inner_fn
from tensor_networks_tpu.tensor import Tensor
from tensor_networks_tpu.types import Index


class PackedTT(NamedTuple):
    """A uniform TT as (first (n, r), mids (d-2, r, n, r), last (r, n))."""

    first: jnp.ndarray
    mids: jnp.ndarray
    last: jnp.ndarray

    @property
    def d(self) -> int:
        return self.mids.shape[0] + 2

    @property
    def rank(self) -> int:
        return self.first.shape[1]

    @property
    def mode(self) -> int:
        return self.first.shape[0]


class PackedTTOp(NamedTuple):
    """A uniform TT-operator: (first (no, ni, R), mids (d-2, R, no, ni, R),
    last (R, no, ni))."""

    first: jnp.ndarray
    mids: jnp.ndarray
    last: jnp.ndarray


def pack(tn: TensorNetwork, dtype=None) -> PackedTT:
    """Pack a uniform TT network into device arrays."""
    first, mids, last = stack_tt_cores(tn)
    if mids is None:
        raise ValueError("PackedTT needs d >= 3")
    if dtype is not None:
        first, mids, last = (
            x.astype(dtype) for x in (first, mids, last)
        )
    return PackedTT(first, mids, last)


def unpack(p: PackedTT, index_names: Optional[List[str]] = None) -> TensorNetwork:
    """Materialize a PackedTT as a graph network.

    Mode sizes come from the packed arrays: a mixed-mode train packed
    by :func:`pack_ragged` unpacks with every mode at the padded
    maximum (the padded slices are zero) — slice afterwards if the
    original sizes matter.
    """
    d = p.d
    n = p.mode
    if index_names is None:
        index_names = [f"x{i}" for i in range(d)]
    indices = [Index(nm, n) for nm in index_names]
    tn = TensorNetwork()
    bonds = [Index(f"r{i+1}", int(s)) for i, s in enumerate([p.first.shape[1]] + [p.mids.shape[3]] * (d - 2))]
    tn.add_node(0, Tensor(p.first, [indices[0], bonds[0]]))
    for i in range(d - 2):
        tn.add_node(
            i + 1, Tensor(p.mids[i], [bonds[i], indices[i + 1], bonds[i + 1]])
        )
        tn.add_edge(i, i + 1)
    tn.add_node(d - 1, Tensor(p.last, [bonds[-1], indices[-1]]))
    tn.add_edge(d - 2, d - 1)
    return tn


def pad(a: PackedTT) -> PackedTT:
    """Prepad the train's bonds to the 128 lane width so every inner
    product runs as ONE fused pallas dispatch (no per-call padding).
    Padding is numerically inert for inner/norm/add/scale."""
    from tensor_networks_tpu.kernels.pallas_ops import pad_train

    return PackedTT(*pad_train(a.first, a.mids, a.last))


def pad_rank(a: PackedTT, rank: int) -> PackedTT:
    """Zero-pad every bond of the train to ``rank`` (numerically inert)."""
    grow = rank - a.rank
    if grow < 0:
        raise ValueError(f"cannot shrink rank {a.rank} to {rank}")
    if grow == 0:
        return a
    return PackedTT(
        jnp.pad(a.first, ((0, 0), (0, grow))),
        jnp.pad(a.mids, ((0, 0), (0, grow), (0, 0), (0, grow))),
        jnp.pad(a.last, ((0, grow), (0, 0))),
    )


def _chain_order(tn: TensorNetwork) -> Optional[list]:
    """Node names of a path-topology network in chain order, else None."""
    nodes = list(tn.network.nodes)
    if len(nodes) < 3:
        return None
    nbrs = {n: list(tn.network.neighbors(n)) for n in nodes}
    ends = [n for n in nodes if len(nbrs[n]) == 1]
    if len(ends) != 2 or any(len(v) > 2 for v in nbrs.values()):
        return None
    order, prev = [ends[0]], None
    while True:
        step = [m for m in nbrs[order[-1]] if m != prev]
        if not step:
            break
        prev = order[-1]
        order.append(step[0])
    return order if len(order) == len(nodes) else None


def chain_cores(tn: TensorNetwork):
    """Canonical cores of a linear-chain network with ragged ranks.

    Returns ``(order, cores, free_indices, perms)`` — node names in
    chain order, values transposed into (left bond, mode, right bond) /
    (mode, right) / (left, mode) layout from the index metadata, the
    per-node free index, and the axis permutation applied to each node
    (invert with ``np.argsort(perm)`` to write values back) — or None
    when the network is not a chain of >= 3 cores with exactly one free
    index per core.
    """
    order = _chain_order(tn)
    if order is None:
        return None
    tensors = [tn.node_tensor(n) for n in order]
    bonds = []
    for a, b in zip(tensors, tensors[1:]):
        shared = [i for i in a.indices if i in b.indices]
        if len(shared) != 1:
            return None
        bonds.append(shared[0])

    cores, frees, perms = [], [], []
    for k, t in enumerate(tensors):
        near = {bonds[j] for j in (k - 1, k) if 0 <= j < len(bonds)}
        free = [i for i in t.indices if i not in near]
        if len(free) != 1 or len(t.indices) != len(near) + 1:
            return None
        frees.append(free[0])
        axes = (
            [t.indices.index(bonds[k - 1])] if k else []
        ) + [t.indices.index(free[0])] + (
            [t.indices.index(bonds[k])] if k < len(bonds) else []
        )
        cores.append(jnp.transpose(t.value, axes))
        perms.append(tuple(axes))
    return order, cores, frees, perms


def pack_ragged(tn: TensorNetwork, dtype=None) -> Optional[PackedTT]:
    """Pack a linear-chain TT with *ragged* bond ranks into a PackedTT.

    Every bond is zero-padded to the largest rank rounded up to a
    power of two (>= 8) so executables are reused while ranks grow;
    mixed mode sizes are zero-padded to the largest mode.  Both
    paddings are numerically inert for inner/norm/add/norm_exact (zero
    mode slices contribute zero to every mode contraction) and for
    evaluation (indices only address the true range; the network-level
    route clamps per dimension).  Axes are put in canonical (left bond,
    mode, right bond) order from the index metadata, so any core layout
    is accepted.

    Returns None when the network is not a chain of >= 3 cores with one
    free index per core — callers fall back to the graph path.
    """
    extracted = chain_cores(tn)
    if extracted is None:
        return None
    _, cores, frees, _ = extracted
    nmax = max(f.size for f in frees)

    # bucket floor 32: through the TPU relay every new (d, rank) shape
    # is a ~30-60 s remote compile, so one bucket covering the usual
    # cross/rounding rank range beats tighter padding (the padded QR
    # compute is microseconds)
    rmax = max(
        [c.shape[-1] for c in cores[:-1]]
        + [c.shape[0] for c in cores[1:]]
    )
    r = max(32, 1 << (rmax - 1).bit_length())
    first = jnp.pad(
        cores[0],
        ((0, nmax - cores[0].shape[0]), (0, r - cores[0].shape[1])),
    )
    mids = jnp.stack(
        [
            jnp.pad(
                c,
                (
                    (0, r - c.shape[0]),
                    (0, nmax - c.shape[1]),
                    (0, r - c.shape[2]),
                ),
            )
            for c in cores[1:-1]
        ]
    )
    last = jnp.pad(
        cores[-1],
        ((0, r - cores[-1].shape[0]), (0, nmax - cores[-1].shape[1])),
    )
    if dtype is not None:
        first, mids, last = (x.astype(dtype) for x in (first, mids, last))
    return PackedTT(first, mids, last)


def _inner_routed(fa, ma, la, fb, mb, lb, precision: str) -> jnp.ndarray:
    """Zipper forward with the pallas/XLA routing of :func:`inner`."""
    from tensor_networks_tpu.ops.fast import (
        pallas_inner,
        pallas_inner_eligible,
    )

    if ma.ndim == 4 and pallas_inner_eligible(ma, mb):
        out = pallas_inner(fa, ma, la, fb, mb, lb, precision=precision)
        if out is not None:
            return out
    return tt_inner_fn(
        True, "highest" if precision == "bf16x3" else precision
    )(fa, ma, la, fb, mb, lb)


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def _inner_diff(fa, ma, la, fb, mb, lb, precision: str = "highest"):
    """Differentiable zipper: pallas forward, exact XLA scan backward.

    The pallas kernels have no VJP rule; the cotangents here come from
    differentiating the ``lax.scan`` zipper in full f32 regardless of
    the forward ``precision`` — the backward pass is one fused scan, the
    same FLOP count as the forward."""
    return _inner_routed(fa, ma, la, fb, mb, lb, precision)


def _inner_diff_fwd(fa, ma, la, fb, mb, lb, precision):
    out = _inner_routed(fa, ma, la, fb, mb, lb, precision)
    return out, (fa, ma, la, fb, mb, lb)


def _inner_diff_bwd(precision, res, g):
    fa, ma, la, fb, mb, lb = res
    _, vjp = jax.vjp(tt_inner_fn(True), fa, ma, la, fb, mb, lb)
    return vjp(g.astype(fa.dtype))


_inner_diff.defvjp(_inner_diff_fwd, _inner_diff_bwd)


def inner(
    a: PackedTT, b: PackedTT, precision: str = "highest"
) -> jnp.ndarray:
    """<a, b> via the fused zipper (Pallas HBM-roof kernel on TPU;
    one dispatch end-to-end for :func:`pad`-prepadded trains).
    ``precision``: "highest" (full f32) / "bf16x3" (~1e-6, ~2x faster)
    / "default" (raw bf16).  Differentiable: the backward pass is the
    exact VJP of the XLA scan zipper (full f32)."""
    return _inner_diff(
        a.first, a.mids, a.last, b.first, b.mids, b.last, precision
    )


def evaluate(
    x: PackedTT, idx, precision: str = "bf16x3"
) -> jnp.ndarray:
    """Evaluate the train at (B, d) integer multi-indices.

    On TPU this is the segment-sorted ragged-matmul kernel
    (:mod:`tensor_networks_tpu.kernels.ragged_eval`): ~2.8 Mpts/s at
    FULL f32 accuracy, ~4.2 Mpts/s in bf16 ("default") for d=50 n=32
    r=100 B=8192 on one v5e chip; the pallas one-hot kernel and the XLA
    matmul form are the (logged) fallbacks.  For gradients use
    :func:`tt_evaluate_fast` (custom VJP).
    """
    return _eval_routed(x.first, x.mids, x.last, idx, precision)


def _eval_routed(first, mids, last, idx, precision: str) -> jnp.ndarray:
    """Forward evaluation with the same pallas/XLA routing as
    :func:`evaluate`.

    The fallback catches *trace-time* failures (eager calls compile the
    kernel here, so those are covered too).  Under an outer ``jit`` the
    Mosaic compile happens later at that jit boundary; a kernel that
    traces but fails to compile (e.g. the 16 MB scoped-VMEM limit at
    very large padded ranks) surfaces there as an error rather than
    falling back — run one eager call first to validate a new shape.
    """
    import os

    from tensor_networks_tpu.parallel.sharded import tt_evaluate_batched

    # uniform out-of-range semantics at THIS public boundary: XLA
    # gathers clamp, the one-hot pallas kernel zeroes, and the ragged
    # kernel's group partition leaves unmatched rows undefined — clamp
    # once here so every path behaves like the XLA form (and like
    # TensorNetwork.evaluate, which clamps in run())
    d_modes = idx.shape[1]
    mid_caps = [] if mids is None else [mids.shape[2]] * (d_modes - 2)
    caps = [first.shape[0]] + mid_caps + [last.shape[1]]
    idx = jnp.clip(
        idx, 0, jnp.asarray(caps, idx.dtype)[None, :] - 1
    )

    use_fast = (
        jax.default_backend() == "tpu"
        or os.environ.get("TNT_FORCE_PALLAS") == "1"
    )
    if use_fast:
        from tensor_networks_tpu.kernels import pallas_ops as pko

        # segment-sorted ragged-matmul kernel first: ~3.5x the pallas
        # one-hot kernel at d=50 n=32 r=100 (2.8 Mpts/s full-f32 vs
        # 0.81 bf16x3) because it skips the n-fold wasted MXU work
        if mids is not None and mids.shape[0] > 0:
            from tensor_networks_tpu.kernels.ragged_eval import (
                tt_evaluate_ragged,
            )

            try:
                out = tt_evaluate_ragged(
                    first, mids, last, idx, precision=precision
                )
                pko.PATH_STATS["ragged"] += 1
                return out
            except Exception as exc:
                pko.PATH_STATS["fallback"] += 1
                pko.logger.warning(
                    "ragged evaluate failed (%s: %s); trying pallas",
                    type(exc).__name__,
                    exc,
                )
        try:
            out = pko.tt_evaluate_pallas(
                first, mids, last, idx, precision=precision
            )
            pko.PATH_STATS["pallas"] += 1
            return out
        except Exception as exc:
            pko.PATH_STATS["fallback"] += 1
            pko.logger.warning(
                "pallas evaluate failed (%s: %s); using the XLA form",
                type(exc).__name__,
                exc,
            )
    return tt_evaluate_batched(first, mids, last, idx)


def evaluate_dw(x: PackedTT, idx) -> np.ndarray:
    """Evaluate the train at (B, d) multi-indices in DOUBLE-WORD
    arithmetic: every per-step product runs as an Ozaki split-matmul
    and the hi/lo pair is combined to f64 on the host — ~1e-13
    relative on f32 cores vs ~1e-7 for the plain f32 paths.  The
    on-chip cross loop samples its fiber matrices through this
    (``TensorNetwork.evaluate(..., precision="dw")``); the device
    program stays pure f32."""
    from tensor_networks_tpu.kernels.dw_eval import tt_evaluate_dw

    return tt_evaluate_dw(x.first, x.mids, x.last, idx)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def tt_evaluate_fast(first, mids, last, idx, precision: str = "bf16x3"):
    """Differentiable batched evaluation with the fast forward pass.

    Forward runs the VMEM-resident pallas kernel on TPU (the XLA matmul
    form elsewhere); backward rematerializes through the XLA form's VJP
    — the standard trade of FLOPs for memory, and the cotangents are
    exact f32 regardless of the forward ``precision``.  This is what
    lets the training step use the ~3x-faster evaluation kernel.

    Pallas calls do not SPMD-partition: on multi-device meshes keep the
    plain :func:`parallel.sharded.tt_evaluate_batched` (sharding-aware)
    or wrap per-device calls in ``shard_map`` yourself.
    """
    return _eval_routed(first, mids, last, idx, precision)


def _tt_evaluate_fast_fwd(first, mids, last, idx, precision):
    out = _eval_routed(first, mids, last, idx, precision)
    return out, (first, mids, last, idx)


def _tt_evaluate_fast_bwd(precision, res, g):
    from tensor_networks_tpu.parallel.sharded import tt_evaluate_batched

    first, mids, last, idx = res
    _, vjp = jax.vjp(
        lambda f, m, l: tt_evaluate_batched(f, m, l, idx),
        first,
        mids,
        last,
    )
    df, dm, dl = vjp(g.astype(first.dtype))
    return df, dm, dl, np.zeros(idx.shape, dtype=jax.dtypes.float0)


tt_evaluate_fast.defvjp(_tt_evaluate_fast_fwd, _tt_evaluate_fast_bwd)


def evaluate_ensemble(
    trains: Sequence[PackedTT], idx, precision: str = "bf16x3"
) -> jnp.ndarray:
    """Evaluate B same-shape trains in ONE program; returns (B, N).

    The ensemble axis is folded into the MODE axis — the combined train
    has mode ``B * n`` where symbol ``b*n + j`` selects train ``b``'s
    mode-``j`` core slice — so the whole ensemble runs as one standard
    batched evaluation: one dispatch, one sort, one grouped matmul per
    train step for ALL ``B * N`` points.  This amortizes the per-step
    overhead that bounds single-train throughput (ROADMAP #1: the
    remaining evaluate lever) across the ensemble, with exactly the
    same total MXU work as B separate calls.

    ``idx`` is ``(N, d)`` (shared points, broadcast to every train) or
    ``(B, N, d)`` (per-train points); out-of-range indices clamp
    per-train, matching :func:`evaluate`.  Forward-only, like
    :func:`evaluate` — for gradients map :func:`tt_evaluate_fast`
    over the ensemble.
    """
    trains = list(trains)
    if not trains:
        raise ValueError("evaluate_ensemble needs at least one train")
    d, n, r = trains[0].d, trains[0].mode, trains[0].rank
    shapes = (trains[0].first.shape, trains[0].mids.shape,
              trains[0].last.shape)
    for t in trains[1:]:
        if (t.first.shape, t.mids.shape, t.last.shape) != shapes:
            raise ValueError(
                "ensemble trains must share shapes; got "
                f"{(t.first.shape, t.mids.shape, t.last.shape)} vs {shapes}"
            )
    B = len(trains)

    idx = jnp.asarray(idx)
    if idx.ndim == 2:
        idx = jnp.broadcast_to(idx[None], (B,) + idx.shape)
    if idx.ndim != 3 or idx.shape[0] != B or idx.shape[2] != d:
        raise ValueError(
            f"idx must be (N, {d}) or ({B}, N, {d}); got {idx.shape}"
        )
    npts = idx.shape[1]

    first_ens = jnp.stack([t.first for t in trains]).reshape(B * n, r)
    mids_ens = jnp.moveaxis(
        jnp.stack([t.mids for t in trains]), 0, 2
    ).reshape(d - 2, r, B * n, r)
    last_ens = jnp.moveaxis(
        jnp.stack([t.last for t in trains]), 0, 1
    ).reshape(r, B * n)

    # clamp BEFORE the per-train symbol offset so out-of-range points
    # stay inside their own train's symbol block
    idx = jnp.clip(idx.astype(jnp.int32), 0, n - 1)
    offs = (jnp.arange(B, dtype=jnp.int32) * n)[:, None, None]
    idx_ens = (idx + offs).reshape(B * npts, d)

    out = _eval_routed(first_ens, mids_ens, last_ens, idx_ens, precision)
    return out.reshape(B, npts)


def norm(a: PackedTT) -> jnp.ndarray:
    return jnp.sqrt(jnp.abs(inner(a, a)))


@lru_cache(maxsize=8)
def _orth_norm_fn():
    def compute(first, mids, last):
        r = last.shape[0]
        q, rmat = jnp.linalg.qr(last.T)
        if q.shape[1] < r:
            rmat = jnp.pad(rmat, ((0, r - rmat.shape[0]), (0, 0)))
        carry = rmat.T

        def step(carry, core):
            rr = core.shape[0]
            cur = jnp.einsum(
                "rnk,kc->rnc", core, carry, precision="highest"
            )
            _, rmat = jnp.linalg.qr(cur.reshape(rr, -1).T)
            return rmat.T, None

        carry, _ = jax.lax.scan(step, carry, mids, reverse=True)
        return jnp.linalg.norm(first @ carry)

    return jax.jit(compute)


def norm_exact(a: PackedTT) -> jnp.ndarray:
    """Train norm via a right-orthogonalization sweep.

    The zipper norm ``sqrt(<a, a>)`` loses half the mantissa to
    cancellation when ``a`` is a small difference of large trains (e.g.
    a GMRES residual: absolute error ~ sqrt(eps) * component norms).
    The QR sweep is backward stable — error ~ eps * component norms —
    so use this whenever the train encodes a near-cancelling sum.
    """
    return _orth_norm_fn()(a.first, a.mids, a.last)


def scale(a: PackedTT, factor) -> PackedTT:
    """Scale the represented tensor (folds into the first core)."""
    return PackedTT(
        a.first * jnp.asarray(factor, a.first.dtype), a.mids, a.last
    )


@jax.jit
def _add2(a: PackedTT, b: PackedTT) -> PackedTT:
    ra, rb = a.rank, b.rank
    first = jnp.concatenate([a.first, b.first], axis=1)
    d_mid, _, n, _ = a.mids.shape
    mids = jnp.zeros(
        (d_mid, ra + rb, n, ra + rb), dtype=a.mids.dtype
    )
    mids = mids.at[:, :ra, :, :ra].set(a.mids)
    mids = mids.at[:, ra:, :, ra:].set(b.mids)
    last = jnp.concatenate([a.last, b.last], axis=0)
    return PackedTT(first, mids, last)


def add(*terms: PackedTT) -> PackedTT:
    """Exact k-ary sum: bond ranks add (block-diagonal embedding)."""
    out = terms[0]
    for t in terms[1:]:
        out = _add2(out, t)
    return out


def ttop_add(*ops: PackedTTOp) -> PackedTTOp:
    """Exact sum of uniform TT-operators: operator bond ranks add
    (block-diagonal embedding — the operator analogue of :func:`add`;
    reference semantics ``pytens/algs.py:2479-2532`` ``ttop_sum`` built
    for the packed form).  All operands must share (d, n_out, n_in)."""
    # explicit promotion: .at[].set would silently DOWNCAST a wider
    # operand's mids into the first operand's dtype (JAX only warns)
    dt = jnp.result_type(*(o.mids.dtype for o in ops))
    out = ops[0]
    for o in ops[1:]:
        ra = out.first.shape[-1]
        rb = o.first.shape[-1]
        if out.mids.shape[:1] + out.mids.shape[2:4] != (
            o.mids.shape[:1] + o.mids.shape[2:4]
        ):
            raise ValueError(
                f"operator shape mismatch: {out.mids.shape} vs "
                f"{o.mids.shape}"
            )
        first = jnp.concatenate(
            [out.first.astype(dt), o.first.astype(dt)], axis=-1
        )
        d_m, _, no, ni, _ = out.mids.shape
        mids = jnp.zeros((d_m, ra + rb, no, ni, ra + rb), dtype=dt)
        mids = mids.at[:, :ra, :, :, :ra].set(out.mids.astype(dt))
        mids = mids.at[:, ra:, :, :, ra:].set(o.mids.astype(dt))
        last = jnp.concatenate(
            [out.last.astype(dt), o.last.astype(dt)], axis=0
        )
        out = PackedTTOp(first, mids, last)
    return out


def pack_ttop(
    op_net: TensorNetwork,
    indices_out: List[Index],
    indices_in: List[Index],
    dtype=None,
) -> PackedTTOp:
    """Pack a TT-operator network (as built by the ``ops.ttop``
    builders) into the uniform packed layout.

    Position p is the node carrying ``indices_out[p]``; cores are
    permuted to the canonical (bond, out, in, bond) axis order by index
    identity, and ragged bond ranks are zero-padded to the maximum
    (inert for apply/compose/add).  Mode sizes must be uniform
    (the packed layout's contract).
    """
    d = len(indices_out)
    if len(indices_in) != d:
        raise ValueError("operator needs matching input/output arity")
    if d < 3:
        raise ValueError("packed operators need d >= 3")
    # node holding each output index
    pos_node = {}
    for node in op_net.network.nodes:
        t = op_net.node_tensor(node)
        for p, io in enumerate(indices_out):
            if io in t.indices:
                if p in pos_node:
                    raise ValueError(
                        f"output index {io.name} on two nodes"
                    )
                pos_node[p] = node
    if len(pos_node) != d:
        raise ValueError("every output index must sit on exactly one node")
    vals, bonds_r = [], []
    for p in range(d):
        t = op_net.node_tensor(pos_node[p])
        phys = {indices_out[p], indices_in[p]}
        if indices_in[p] not in t.indices:
            raise ValueError(
                f"in/out index pair {p} split across nodes"
            )
        side = [i for i in t.indices if i not in phys]
        if p == 0:
            if len(side) != 1:
                raise ValueError("first operator core must have 1 bond")
            order = [indices_out[p], indices_in[p], side[0]]
            bonds_r.append(side[0])
        else:
            left = bonds_r[-1]
            if left not in side:
                raise ValueError(
                    f"nodes {p-1} and {p} share no bond index"
                )
            rest = [i for i in side if i != left]
            if p == d - 1:
                if rest:
                    raise ValueError("last operator core must have 1 bond")
                order = [left, indices_out[p], indices_in[p]]
            else:
                if len(rest) != 1:
                    raise ValueError(
                        f"mid operator core {p} must have 2 bonds"
                    )
                order = [left, indices_out[p], indices_in[p], rest[0]]
                bonds_r.append(rest[0])
        perm = [t.indices.index(i) for i in order]
        vals.append(jnp.asarray(t.permute(perm).value))
    R = max(i.size for i in bonds_r)
    dt = dtype or jnp.result_type(*(v.dtype for v in vals))

    def padded(v, pads):
        return jnp.pad(v.astype(dt), pads)

    first = padded(vals[0], ((0, 0), (0, 0), (0, R - vals[0].shape[2])))
    mids = jnp.stack(
        [
            padded(
                v,
                (
                    (0, R - v.shape[0]),
                    (0, 0),
                    (0, 0),
                    (0, R - v.shape[3]),
                ),
            )
            for v in vals[1:-1]
        ]
    )
    last = padded(vals[-1], ((0, R - vals[-1].shape[0]), (0, 0), (0, 0)))
    return PackedTTOp(first, mids, last)


def ttop_identity(d: int, n: int, dtype=jnp.float64) -> PackedTTOp:
    """The rank-1 identity operator on d modes of size n — the unit of
    :func:`ttop_compose` and the ``alpha I + ...`` building block of
    shifted systems."""
    if d < 3:
        raise ValueError("packed operators need d >= 3")
    eye = jnp.eye(n, dtype=dtype)
    return PackedTTOp(
        eye[:, :, None],
        jnp.broadcast_to(eye[None, None, :, :, None], (d - 2, 1, n, n, 1)),
        eye[None],
    )


def ttop_scale(op: PackedTTOp, factor) -> PackedTTOp:
    """Scale the represented operator (folds into the first core)."""
    return PackedTTOp(
        op.first * jnp.asarray(factor, op.first.dtype),
        op.mids,
        op.last,
    )


def ttop_transpose(op: PackedTTOp) -> PackedTTOp:
    """The transposed operator (out/in physical axes swapped per core):
    ``ttop_apply_packed(ttop_transpose(A), x)`` applies ``A^T``."""
    return PackedTTOp(
        op.first.transpose(1, 0, 2),
        op.mids.transpose(0, 1, 3, 2, 4),
        op.last.transpose(0, 2, 1),
    )


@jax.jit
def ttop_compose(a: PackedTTOp, b: PackedTTOp) -> PackedTTOp:
    """The operator product ``A @ B`` (apply ``B`` first): per-core
    contraction over the shared physical index, bond ranks multiply.

    Follow with :func:`ttop_round` when composing chains — the product
    rank ``R_A * R_B`` usually overshoots the exact rank.  Typical use:
    the SPD normal equations of a nonsymmetric system,
    ``ttop_compose(ttop_transpose(A), A)``, solved with
    ``als_solve(..., spd=True)``.  No reference counterpart
    (``pytens`` applies operators to trains only,
    ``pytens/algs.py:2662``).
    """
    ra, rb = a.first.shape[-1], b.first.shape[-1]
    if (
        a.mids.shape[0] != b.mids.shape[0]
        or a.first.shape[1] != b.first.shape[0]
        or a.mids.shape[3] != b.mids.shape[2]
    ):
        raise ValueError(
            f"operator shape mismatch: {a.mids.shape} vs {b.mids.shape}"
        )
    first = jnp.einsum(
        "imr,mjs->ijrs", a.first, b.first, precision="highest"
    ).reshape(a.first.shape[0], b.first.shape[1], ra * rb)
    dm = a.mids.shape[0]
    mids = jnp.einsum(
        "kaimt,kbmjs->kabijts", a.mids, b.mids, precision="highest"
    ).reshape(dm, ra * rb, a.mids.shape[2], b.mids.shape[3], ra * rb)
    last = jnp.einsum(
        "aim,bmj->abij", a.last, b.last, precision="highest"
    ).reshape(ra * rb, a.last.shape[1], b.last.shape[2])
    return PackedTTOp(first, mids, last)


def ttop_round(
    op: PackedTTOp, eps: float = 1e-12, reorth: bool = False
) -> PackedTTOp:
    """Compress a uniform TT-operator to its eps-accurate ranks.

    The (out, in) physical pair of every core is fused into one mode of
    size ``no * ni`` and the train runs through the fused Householder
    orthogonalize+truncate sweep (the same kernel as
    :func:`svd_round`); the uniform packed layout is then sliced to the
    largest kept bond — smaller bonds keep zeroed (inert) directions.
    Use after :func:`ttop_add` chains or operator-operator products
    whose block-diagonal ranks overshoot the exact ones.  ``eps`` is
    relative to the operator's Frobenius norm.  No reference
    counterpart (``pytens`` rounds TT tensors only,
    ``pytens/algs.py:1841``).
    """
    from tensor_networks_tpu.ops.fast import (
        _tt_round_sweep_fn,
        sweep_noise_floor,
    )

    dm = op.mids.shape[0]
    if dm < 1:
        raise ValueError("ttop_round needs d >= 3 cores")
    floor = sweep_noise_floor(op.first.dtype, dm + 2)
    if eps < floor:
        import warnings

        warnings.warn(
            f"ttop_round eps={eps:g} is below the {op.first.dtype} "
            f"sweep noise floor ({floor:.1e}): null directions may "
            "stay above budget and the operator may not compress; "
            "raise eps or round in float64",
            RuntimeWarning,
            stacklevel=2,
        )
    no, ni, R = op.first.shape
    f, m, l, k0, ks = _tt_round_sweep_fn(True, reorth)(
        op.first.reshape(no * ni, R),
        op.mids.reshape(dm, R, no * ni, R),
        op.last.reshape(R, no * ni),
        eps,
    )
    r_new = max(int(k0), int(np.asarray(ks).max()))
    return PackedTTOp(
        f[:, :r_new].reshape(no, ni, r_new),
        m[:, :r_new, :, :r_new].reshape(dm, r_new, no, ni, r_new),
        l[:r_new, :].reshape(r_new, no, ni),
    )


@jax.jit
def hadamard(a: PackedTT, b: PackedTT) -> PackedTT:
    """Exact elementwise product: bond ranks multiply (per-core Kronecker
    factors), one fused scan over the train."""
    n = a.mode
    first = jnp.einsum("na,nb->nab", a.first, b.first).reshape(n, -1)

    def step(_, cores):
        ca, cb = cores
        out = jnp.einsum("anb,cnd->acnbd", ca, cb)
        s = out.shape
        return None, out.reshape(s[0] * s[1], s[2], s[3] * s[4])

    _, mids = jax.lax.scan(step, None, (a.mids, b.mids))
    last = jnp.einsum("an,bn->abn", a.last, b.last).reshape(-1, n)
    return PackedTT(first, mids, last)


@jax.jit
def ttop_apply_packed(op: PackedTTOp, x: PackedTT) -> PackedTT:
    """Apply a uniform TT-operator; bond ranks multiply (r * R).

    Every fused bond uses the same (x-rank major, op-rank minor) layout
    on both sides of each core — mixing the orders corrupts any operator
    with R > 1.
    """
    # first: (no, ni, R) x (ni, r) -> (no, r*R)
    first = jnp.einsum("oik,il->olk", op.first, x.first)
    no = first.shape[0]
    first = first.reshape(no, -1)

    def mid_step(_, cores):
        opc, xc = cores  # (R, no, ni, R), (r, ni, r)
        out = jnp.einsum("aoib,mir->maorb", opc, xc)
        s = out.shape
        return None, out.reshape(s[0] * s[1], s[2], s[3] * s[4])

    _, mids = jax.lax.scan(mid_step, None, (op.mids, x.mids))

    # last: (R, no, ni) x (r, ni) -> (r*R, no)
    last = jnp.einsum("aoi,mi->mao", op.last, x.last)
    s = last.shape
    last = last.reshape(s[0] * s[1], s[2])
    return PackedTT(first, mids, last)


@lru_cache(maxsize=64)
def _rand_round_fn(target: int):
    """Randomized rounding to a fixed target rank: all-GEMM, one program."""

    def round_(x: PackedTT, key) -> PackedTT:
        d_mid, r, n, _ = x.mids.shape
        keys = jax.random.split(key, 3)
        dt = x.first.dtype
        s_first = jax.random.normal(keys[0], (n, target), dt) / jnp.sqrt(
            jnp.asarray(n * target, dt)
        )
        s_mids = jax.random.normal(
            keys[1], (d_mid, target, n, target), dt
        ) / jnp.sqrt(jnp.asarray(n * target * target, dt))
        s_last = jax.random.normal(keys[2], (target, n), dt) / jnp.sqrt(
            jnp.asarray(n * target, dt)
        )

        # right-to-left partial contractions W_k (r, target)
        w_last = x.last @ s_last.T  # (r, t)

        def back(w, cores):
            xc, sc = cores  # (r, n, r), (t, n, t)
            tmp = (xc.reshape(-1, xc.shape[-1]) @ w).reshape(
                xc.shape[0], -1
            )  # (r, n*t)
            w_new = tmp @ sc.reshape(sc.shape[0], -1).T  # (r, t)
            return w_new, w_new

        _, ws = jax.lax.scan(back, w_last, (x.mids, s_mids), reverse=True)
        # ws[k] pairs with bond k (after first core k=0 uses ws[0]);
        # the last bond uses w_last

        # forward randomize-then-orthogonalize
        z = x.first  # (n, r)
        y = z @ ws[0]  # (n, t)
        q, _ = jnp.linalg.qr(y)
        if q.shape[1] < target:  # n < target
            q = jnp.pad(q, ((0, 0), (0, target - q.shape[1])))
        first_out = q
        m = q.T @ z  # (t, r)

        def fwd(m, cores):
            xc, w = cores  # (r, n, r), (r, t)
            z = jnp.einsum("ta,anb->tnb", m, xc)  # (t, n, r)
            y = z.reshape(-1, z.shape[-1]) @ w  # (t*n, t)
            q, _ = jnp.linalg.qr(y)
            core = q.reshape(z.shape[0], z.shape[1], -1)
            m_new = q.T @ z.reshape(-1, z.shape[-1])  # (t, r)
            return m_new, core

        ws_mid = jnp.concatenate(
            [ws[1:], jnp.broadcast_to(w_last, (1,) + w_last.shape)], axis=0
        )
        m, mids_out = jax.lax.scan(fwd, m, (x.mids, ws_mid))
        last_out = m @ x.last  # (t, n)
        return PackedTT(first_out, mids_out, last_out)

    return jax.jit(round_)


def rand_round(x: PackedTT, target: int, key) -> PackedTT:
    """Round to fixed target ranks with Gaussian TT sketching (static
    shapes; the cheapest on-device rank-control primitive)."""
    return _rand_round_fn(target)(x, key)


def svd_round(x: PackedTT, target: int, eps: float = 1e-7) -> PackedTT:
    """Round to a fixed target rank through the exact fused SVD sweep.

    Runs the static-shape orthogonalize+truncate sweep (masked, one XLA
    program per input shape) and slices the top ``target`` directions of
    every bond — a true best-rank-``target`` truncation, with noise at
    the dtype roundoff level instead of the sketch-conditioning level of
    :func:`rand_round`.  ~(r/t)x the FLOPs of the sketch; use this when
    accuracy sets the floor (e.g. the GMRES Krylov recurrence in f32).
    """
    # precision-critical path: the Householder sweep resolves structure
    # below the CholQR2 jitter floor (~40*eps relative), which the GMRES
    # Krylov recurrence needs; use method="cholqr2" rounding only for
    # tolerance-based compaction
    from tensor_networks_tpu.ops.fast import _tt_round_sweep_fn

    first, mids, last, _, _ = _tt_round_sweep_fn(True)(
        x.first, x.mids, x.last, eps
    )
    r = x.rank
    if r >= target:
        return PackedTT(
            first[:, :target],
            mids[:, :target, :, :target],
            last[:target, :],
        )
    pad = target - r
    return PackedTT(
        jnp.pad(first, ((0, 0), (0, pad))),
        jnp.pad(mids, ((0, 0), (0, pad), (0, 0), (0, pad))),
        jnp.pad(last, ((0, pad), (0, 0))),
    )


def _gmres_at_rank(
    op: PackedTTOp,
    rhs: PackedTT,
    x0: PackedTT,
    eps: float,
    rank: int,
    maxiter: int,
    key,
    round_method: str = "svd",
) -> Tuple[PackedTT, float]:
    """One GMRES cycle with all Krylov vectors rounded to ``rank``.

    Every iteration reuses the same compiled executables (fixed shapes);
    the tiny Hessenberg solve stays on host.
    """

    def rounded(t, key):
        if round_method == "svd":
            return svd_round(t, rank)
        return rand_round(t, rank, key)

    def op_round(v, key):
        w = ttop_apply_packed(op, v)
        return rounded(w, key)

    key, k0 = jax.random.split(key)
    r0 = add(rhs, scale(op_round(x0, k0), -1.0))
    key, k1 = jax.random.split(key)
    r0 = rounded(r0, k1)
    beta = float(norm_exact(r0))
    if beta == 0.0:
        return x0, 0.0
    v = [scale(r0, 1.0 / beta)]

    h = np.zeros((1, 0))
    y: List[np.ndarray] = []
    for jj in range(maxiter):
        key, ka = jax.random.split(key)
        w = op_round(v[-1], ka)

        h_new = np.zeros((jj + 2, jj + 1))
        h_new[: h.shape[0], : h.shape[1]] = h
        h = h_new

        # CGS2 ("twice is enough"): one block projection pass, round,
        # then a correction pass — restores f32 basis orthogonality that
        # single-pass classical Gram-Schmidt loses
        for _ in range(2):
            # ONE host fetch for the whole coefficient block: each
            # individual float() is a full relay round trip (~25 ms+)
            coeffs = np.asarray(
                jnp.stack([inner(w, v[ii]) for ii in range(jj + 1)])
            ).tolist()
            for ii, c in enumerate(coeffs):
                h[ii, jj] += c
            w = add(
                w, *[scale(v[ii], -c) for ii, c in enumerate(coeffs)]
            )
            key, kb = jax.random.split(key)
            w = rounded(w, kb)

        h[jj + 1, jj] = float(norm_exact(w))

        e = np.zeros(h.shape[0])
        e[0] = beta
        yy, resid, _, _ = np.linalg.lstsq(h, e, rcond=None)
        y.append(yy)
        done = resid.size > 0 and float(np.sqrt(resid[0])) < eps
        if done or h[jj + 1, jj] <= 1e-14 * beta:
            break
        v.append(scale(w, 1.0 / h[jj + 1, jj]))

    x = add(x0, *[scale(vv, float(c)) for vv, c in zip(v, y[-1])])
    key, kc = jax.random.split(key)
    x = rounded(x, kc)

    res = add(rhs, scale(ttop_apply_packed(op, x), -1.0))
    return x, float(norm_exact(res))


def gmres_packed(
    op: PackedTTOp,
    rhs: PackedTT,
    x0: PackedTT,
    eps: float = 1e-5,
    rank: Optional[int] = None,
    maxiter: int = 30,
    seed: int = 0,
    max_rank: Optional[int] = None,
    round_method: str = "svd",
) -> Tuple[PackedTT, float]:
    """TT-GMRES where every Krylov operation is a fused device program.

    Rank control is randomized rounding to a fixed rank, so each cycle
    reuses compiled executables.  The rank ceiling is what limits the
    reachable residual: when a cycle stalls above ``eps``, the solver
    restarts warm from the current iterate with the rank doubled
    (geometric growth amortizes compilation across restarts), up to
    ``max_rank`` (default ``8 x`` the starting rank).
    """
    key = jax.random.PRNGKey(seed)
    rank = int(rank) if rank is not None else 2 * x0.rank
    ceiling = int(max_rank) if max_rank is not None else 8 * rank

    x = x0
    while True:
        key, cycle_key = jax.random.split(key)
        x, resid = _gmres_at_rank(
            op, rhs, x, eps, rank, maxiter, cycle_key, round_method
        )
        if resid < eps or rank >= ceiling:
            return x, resid
        rank = min(2 * rank, ceiling)
