"""Device-batched split scoring for the exhaustive search drivers.

The BFS/DFS hot loop pays one SVD per candidate action (reference:
``pytens/search/exhaustive.py:147-216`` scores each split with its own
decomposition).  For a *single-node* state — the root of every search,
and by far its most expensive level — all candidate matricizations are
views of one dense tensor, so they can be scored together: group the
actions by the EXACT shape of their oriented matricization, build each
group's stacked batch with ONE jitted transpose/stack program, and run
ONE batched SVD per shape.  Two compiled executables per group shape
regardless of how many actions there are — through a ~20-60
s-per-compile TPU relay this is the difference between search being
device-hosted or not (same trick as
:mod:`tensor_networks_tpu.search.spectra`, extended to full U/s/V).

Orientation (m <= n) makes the k-way and (d-k)-way matricizations of a
uniform-mode tensor share one group, so exact grouping costs no more
executables than the earlier pow2 bucketing did (d=8 n=6: four groups
either way) while skipping its padding FLOPs — the dominant pow2
bucket padded (1296, 1296) matrices to (2048, 2048), ~4x the SVD work
for zeros (measured: the whole root level 7.2 s padded vs the
per-action device path's 4.7 s; exact grouping removes that gap's
cause).  Non-uniform mode sizes, where exact shapes would multiply
compiles instead, fall back to pow2 bucketing (see
:func:`batched_split_svds`).

Single-node states need no environment handling: ``network.svd(...,
with_orthonormal=True)`` orthonormalizes the node's environment first,
which is a no-op exactly when the node has no neighbors.  Multi-node
states go through :func:`scored_splits` (round 4): ONE environment
orthonormalization shared per target node, host-decomposed
matricizations, children built from the orthonormalized base via
``take_action(.., network=..)``.

Zero-padding is safe end to end: padding rows/cols only append zero
singular values, and every singular vector with a *nonzero* value is
supported entirely inside the true rows/cols (u_i = A v_i / s_i and the
padded rows of A are zero), so the trimmed factors reconstruct the
matrix exactly; trailing null-space columns may mix into the padding but
are multiplied by zero singular values wherever they are kept.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from tensor_networks_tpu.network import TensorNetwork
from tensor_networks_tpu.search.actions import Action, ISplit, OSplit


def _pow2_shape(mn: Tuple[int, int]) -> Tuple[int, int]:
    return tuple(1 << max(int(v) - 1, 0).bit_length() for v in mn)


def device_scoring_eligible(net: TensorNetwork) -> bool:
    """Batched device scoring applies to large single-node states.

    ``TNT_SEARCH_DEVICE=1`` forces it on any backend (how the CPU parity
    tests drive this path); ``=0`` disables it; default is on for the
    TPU backend when the node clears the host-SVD routing threshold
    (small tensors are faster end-to-end on the host — measured in
    round 2, VALIDATION.md).
    """
    force = os.environ.get("TNT_SEARCH_DEVICE")
    if force == "0":
        return False
    nodes = list(net.network.nodes)
    if len(nodes) != 1:
        return False
    if force == "1":
        return True
    import jax

    from tensor_networks_tpu.kernels.linalg import _host_svd_threshold

    val = net.node_tensor(nodes[0]).value
    return (
        jax.default_backend() == "tpu"
        and val.size >= _host_svd_threshold()
    )


# jitted program caches, keyed by static shape signatures — the point is
# ONE compile per (tensor shape, group) and per bucket, reused across
# every state and search run in the process
_STACK_FNS: Dict[tuple, object] = {}
_SVD_FNS: Dict[tuple, object] = {}


def _stack_fn(
    tshape: Tuple[int, ...],
    dtype_key: str,
    plans: Tuple[Tuple[Tuple[int, ...], bool], ...],
    bucket: Tuple[int, int],
):
    """Jitted transpose/reshape/pad/stack for one shape group."""
    key = (tshape, dtype_key, plans, bucket)
    fn = _STACK_FNS.get(key)
    if fn is not None:
        return fn
    import jax
    import jax.numpy as jnp

    mb, nb = bucket
    nd = len(tshape)

    def build(x):
        mats = []
        for axes, trans in plans:
            rest = tuple(k for k in range(nd) if k not in axes)
            perm = axes + rest
            rows = 1
            for k in axes:
                rows *= tshape[k]
            mat = jnp.transpose(x, perm).reshape(rows, -1)
            if trans:
                mat = mat.T
            mats.append(
                jnp.pad(
                    mat,
                    (
                        (0, mb - mat.shape[0]),
                        (0, nb - mat.shape[1]),
                    ),
                )
            )
        return jnp.stack(mats)

    fn = jax.jit(build)
    _STACK_FNS[key] = fn
    return fn


def _svd_fn(bucket: Tuple[int, int], dtype_key: str):
    """Jitted batched thin SVD for one bucket shape."""
    key = (bucket, dtype_key)
    fn = _SVD_FNS.get(key)
    if fn is not None:
        return fn
    import jax
    import jax.numpy as jnp

    fn = jax.jit(lambda s: jnp.linalg.svd(s, full_matrices=False))
    _SVD_FNS[key] = fn
    return fn


_GRAM_FNS: Dict[tuple, object] = {}
_POOL = None


def _pool():
    """Shared thread pool for host LAPACK calls (they release the GIL)."""
    global _POOL
    if _POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _POOL = ThreadPoolExecutor(min(8, os.cpu_count() or 1))
    return _POOL


def _gram_fn(bucket: Tuple[int, int], dtype_key: str):
    """Jitted batched Gram ``A A^T`` for one bucket shape — the MXU
    reduction that turns a (m, n) scoring SVD into an (m, m) host eigh."""
    key = (bucket, dtype_key)
    fn = _GRAM_FNS.get(key)
    if fn is not None:
        return fn
    import jax
    import jax.numpy as jnp

    fn = jax.jit(
        lambda s: jnp.einsum("kmn,kMn->kmM", s, s, precision="highest")
    )
    _GRAM_FNS[key] = fn
    return fn




def batched_split_svds(
    net: TensorNetwork, actions: Sequence[Action], budget: float = None
) -> Dict[Action, Tuple]:
    """(U, s, V) for every split action on a single-node network.

    Returns a dict the drivers pass into ``take_action(.., svd=..)``;
    actions that are not splits (or fail to resolve) are absent and fall
    back to the per-action path.

    Round-4 placement (each shape group routed where it is actually
    fast; measured breakdown in VALIDATION.md):

    * **square-ish groups** (n < 4 m): a thin device SVD gains nothing
      over host LAPACK — TPU iterative SVD neither batches nor
      pipelines, and the raw tensor is one small fetch — so these run
      as host ``gesdd`` fanned over a thread pool (LAPACK releases the
      GIL).
    * **wide groups** (n >= 4 m), when the caller's truncation budget
      clears the Gram resolution floor (~32 sqrt(mach) ||A||): the MXU
      does the O(n m^2) reduction as ONE batched Gram GEMM and only the
      tiny (m, m) blocks are fetched; the eighs AND the right factors
      ``V = diag(1/s) U^T A`` run on host from the once-fetched raw
      tensor — device-resident V would cost one relay fetch per child
      commit (measured: ~40 s of the 64 s bfs8 leg).
    * **wide groups under a tight budget**: the exact batched device
      SVD (spectra below the Gram floor stay trustworthy).
    """
    nodes = list(net.network.nodes)
    if len(nodes) != 1:
        return {}
    node = nodes[0]
    val = net.node_tensor(node).value
    tshape = tuple(int(s) for s in val.shape)
    nd = len(tshape)

    # resolve every action to (sorted axes, orientation)
    plans: List[Tuple[Action, Tuple[int, ...], bool, int, int]] = []
    for action in actions:
        if isinstance(action, OSplit):
            try:
                isp = action.to_isplit(net)
            except ValueError:
                continue
            if isp.node != node:
                continue
            axes = tuple(isp.left_indices)
        elif isinstance(action, ISplit):
            if action.node != node:
                continue
            axes = tuple(sorted(action.left_indices))
        else:
            continue
        dim_l = 1
        for k in axes:
            dim_l *= tshape[k]
        dim_r = val.size // dim_l
        trans = dim_l > dim_r
        plans.append((action, axes, trans, dim_l, dim_r))

    if not plans:
        return {}

    import jax.numpy as jnp

    x = jnp.asarray(val)
    dtype_key = str(x.dtype)

    # group by the exact oriented shape (m <= n): no padding FLOPs, and
    # at uniform mode sizes the k / (d-k) splits collapse into one
    # group.  Non-uniform modes can explode the number of distinct
    # shapes — every extra shape is a fresh 20-60 s batched-SVD compile
    # through the relay — so above a small cap fall back to pow2
    # bucketing, which bounds executables at the cost of padding FLOPs.
    oriented = []
    for _, _, trans, dim_l, dim_r in plans:
        oriented.append((dim_r, dim_l) if trans else (dim_l, dim_r))
    exact = len(set(oriented))
    use_exact = exact <= max(8, len(set(map(_pow2_shape, oriented))))
    groups: Dict[Tuple[int, int], List[int]] = {}
    for i, mn in enumerate(oriented):
        groups.setdefault(mn if use_exact else _pow2_shape(mn), []).append(
            i
        )

    from tensor_networks_tpu.kernels.linalg import _trunc_rank
    from tensor_networks_tpu.types import SVDConfig

    # the per-action path runs delta_svd(mat, SVDConfig().delta): the
    # installed factors are pre-truncated at that absolute budget.  The
    # batched path applies the identical rule (count parity: the
    # prune_full_rank noop test compares the installed rank to the cap)
    delta0 = SVDConfig().delta

    mach = float(np.finfo(x.dtype).eps)
    fro = None  # lazy: one scalar fetch, only when a wide group asks
    x_np = None  # lazy: one raw-tensor fetch for host-routed groups

    out: Dict[Action, Tuple] = {}
    for bucket, members in groups.items():
        mb, nb_ = bucket

        if nb_ < 4 * mb:
            # square-ish: host LAPACK over the thread pool.  Under a
            # comfortable budget the Gram + eigh + U^T A route is ~2.5x
            # a gesdd per matrix (measured: 1296^2 f32 svd 1.2 s vs
            # gram+eigh 0.42 s) with the sqrt(mach)-floor caveat the
            # budget gate covers; tight budgets keep the exact svd.
            if x_np is None:
                x_np = np.asarray(val)
            if budget is not None and fro is None:
                fro = float(np.linalg.norm(x_np))
            sq_gram = budget is not None and budget >= (
                32.0 * np.sqrt(mach) * fro
            )

            def _one_host(i):
                _, axes, trans, dim_l, dim_r = plans[i]
                rest = tuple(
                    k for k in range(nd) if k not in axes
                )
                mat = np.transpose(x_np, tuple(axes) + rest).reshape(
                    dim_l, dim_r
                )
                # eigh runs in the gram's own dtype: the f32 Gram
                # FORMATION error dominates, so a f64 eigh of it buys
                # nothing but a 2.5x slower syevd
                return _host_svd_or_gram(
                    mat.T if trans else mat, sq_gram, mach
                )
            for i, res in zip(members, _pool().map(_one_host, members)):
                if res is None:
                    continue  # diverged: per-action path has a fallback
                u_m, s_m, vh_m = res
                action, _, trans, dim_l, dim_r = plans[i]
                if not np.all(np.isfinite(s_m)):
                    continue
                rank, _ = _trunc_rank(s_m, delta0)
                if trans:  # oriented matrix was A^T: A = vh^T s u^T
                    u, v = vh_m[:rank].T, u_m[:, :rank].T
                else:
                    u, v = u_m[:, :rank], vh_m[:rank]
                out[action] = (u, s_m[:rank], v)
            continue

        gplans = tuple(
            (plans[i][1], plans[i][2]) for i in members
        )
        stack = _stack_fn(tshape, dtype_key, gplans, bucket)(x)

        gram_ok = False
        if budget is not None:
            if fro is None:
                import jax.numpy as jnp

                fro = float(jnp.linalg.norm(x))
            gram_ok = budget >= 32.0 * np.sqrt(mach) * fro

        if gram_ok:
            # only the (m, m) Grams cross the device boundary; the
            # eighs AND the right factors are computed on host from the
            # once-fetched raw tensor — a device-resident V would cost
            # one relay fetch PER CHILD COMMIT (measured: the 92 wide
            # actions' V fetches were ~40 s of the 64 s bfs8 leg)
            gram_h = np.asarray(_gram_fn(bucket, dtype_key)(stack))
            if x_np is None:
                x_np = np.asarray(val)

            def _one_gram(j):
                try:
                    w, q = np.linalg.eigh(
                        gram_h[j].astype(np.float64)
                    )
                except np.linalg.LinAlgError:
                    return None
                s_j = np.sqrt(np.clip(w[::-1], 0.0, None)).astype(
                    x_np.dtype
                )
                u_j = np.ascontiguousarray(q[:, ::-1]).astype(
                    x_np.dtype
                )
                _, axes, trans, dim_l, dim_r = plans[members[j]]
                rest = tuple(k for k in range(nd) if k not in axes)
                mat = np.transpose(
                    x_np, tuple(axes) + rest
                ).reshape(dim_l, dim_r)
                if trans:
                    mat = mat.T
                sinv = 1.0 / np.maximum(
                    s_j, np.sqrt(mach) * (s_j[0] + 1e-300)
                )
                return u_j, s_j, (u_j.T @ mat) * sinv[:, None]
            grams = list(_pool().map(_one_gram, range(len(members))))
            if any(e is None for e in grams):
                u_b, s_b, vh_b = _svd_fn(bucket, dtype_key)(stack)
                s_host = np.asarray(s_b)
            else:
                s_host = np.stack([e[1] for e in grams])
                u_b = np.stack([e[0] for e in grams])
                vh_b = [e[2] for e in grams]  # ragged n per member: list
        else:
            u_b, s_b, vh_b = _svd_fn(bucket, dtype_key)(stack)
            s_host = np.asarray(s_b)  # ONE small fetch per group

        for j, i in enumerate(members):
            action, _, trans, dim_l, dim_r = plans[i]
            k = min(dim_l, dim_r)
            s_j = s_host[j][:k]
            if not np.all(np.isfinite(s_j)):
                continue  # diverged SVD: per-action path has a fallback
            rank, _ = _trunc_rank(s_j, delta0)
            u_j, vh_j = u_b[j], vh_b[j]
            if trans:  # oriented matrix was A^T: A = vh^T s u^T
                u = vh_j[:rank, :dim_l].T
                v = u_j[:dim_r, :rank].T
            else:
                u = u_j[:dim_l, :rank]
                v = vh_j[:rank, :dim_r]
            out[action] = (u, s_j[:rank], v)
    return out


def _host_svd_or_gram(mat: np.ndarray, use_gram: bool, mach: float):
    """Thin host decomposition of one oriented (m <= n) matricization:
    Gram + eigh + ``U^T A`` under a comfortable budget (~2.5x a gesdd),
    exact ``gesdd`` otherwise.  Returns (u, s, vh) or None on LAPACK
    divergence."""
    try:
        if use_gram:
            w, q = np.linalg.eigh(mat @ mat.T)
            s_m = np.sqrt(np.clip(w[::-1], 0.0, None)).astype(mat.dtype)
            u_m = np.ascontiguousarray(q[:, ::-1]).astype(mat.dtype)
            sinv = 1.0 / np.maximum(
                s_m, np.sqrt(mach) * (s_m[0] + 1e-300)
            )
            return u_m, s_m, (u_m.T @ mat) * sinv[:, None]
        return np.linalg.svd(mat, full_matrices=False)
    except np.linalg.LinAlgError:
        return None


def scored_splits(state, actions: Sequence[Action]) -> Dict[Action, Tuple]:
    """Precompute ``(svd, base_network)`` per split action, any state.

    Single-node states delegate to :func:`batched_split_svds` (base
    None — the environment orthonormalization is a no-op there).
    Multi-node states share ONE environment orthonormalization per
    target node across all of that node's actions — the per-action
    path pays a full post-order QR sweep per ACTION — then score each
    matricization of the orthonormalized node on the host
    (:func:`_host_svd_or_gram`, budget-gated).  The returned base
    network is what ``take_action(.., network=..)`` must build children
    from: injecting factors into the un-orthonormalized graph would
    change the represented tensor.

    Fail-safe by construction: any action absent from the dict (OSplit
    resolution drift on the orthonormalized graph, LAPACK divergence,
    name drift) takes the per-action path unchanged.
    """
    try:
        net = state.network
        budget = getattr(state, "curr_delta", None)
        if len(list(net.network.nodes)) == 1:
            if not device_scoring_eligible(net):
                return {}
            svds = batched_split_svds(net, actions, budget=budget)
            return {a: (t, None) for a, t in svds.items()}
        if os.environ.get("TNT_SEARCH_DEVICE") == "0":
            return {}
        force = os.environ.get("TNT_SEARCH_DEVICE") == "1"
        if not force:
            import jax

            if jax.default_backend() != "tpu":
                return {}

        by_node: Dict = {}
        for action in actions:
            if isinstance(action, OSplit):
                try:
                    isp = action.to_isplit(net)
                except ValueError:
                    continue
                by_node.setdefault(isp.node, []).append(
                    (action, tuple(isp.left_indices))
                )
            elif isinstance(action, ISplit):
                by_node.setdefault(action.node, []).append(
                    (action, tuple(sorted(action.left_indices)))
                )
        if not by_node or all(len(v) < 2 for v in by_node.values()):
            return {}  # no sharing to exploit

        import copy as _copy

        from tensor_networks_tpu.kernels.linalg import _trunc_rank
        from tensor_networks_tpu.types import SVDConfig

        delta0 = SVDConfig().delta
        out: Dict[Action, Tuple] = {}
        for node, acts in by_node.items():
            base = _copy.deepcopy(net)
            kept = base.orthonormalize(node)
            if kept != node:
                continue
            val = np.asarray(base.node_tensor(node).value)
            nd = val.ndim
            mach = float(np.finfo(val.dtype).eps)
            use_gram = budget is not None and budget >= (
                32.0 * np.sqrt(mach) * float(np.linalg.norm(val))
            )
            for action, axes in acts:
                if isinstance(action, OSplit):
                    # execute() re-resolves on the orthonormalized
                    # graph; score only when it lands where we did
                    try:
                        isp2 = action.to_isplit(base)
                    except ValueError:
                        continue
                    if isp2.node != node or (
                        tuple(isp2.left_indices) != axes
                    ):
                        continue
                rest = tuple(k for k in range(nd) if k not in axes)
                dim_l = 1
                for k in axes:
                    dim_l *= val.shape[k]
                dim_r = val.size // dim_l
                mat = np.transpose(val, tuple(axes) + rest).reshape(
                    dim_l, dim_r
                )
                trans = dim_l > dim_r
                res = _host_svd_or_gram(
                    mat.T if trans else mat, use_gram, mach
                )
                if res is None:
                    continue
                u_m, s_m, vh_m = res
                if not np.all(np.isfinite(s_m)):
                    continue
                rank, _ = _trunc_rank(s_m, delta0)
                if trans:  # oriented matrix was A^T: A = vh^T s u^T
                    u, v = vh_m[:rank].T, u_m[:, :rank].T
                else:
                    u, v = u_m[:, :rank], vh_m[:rank]
                out[action] = ((u, s_m[:rank], v), base)
        return out
    except Exception as exc:  # never let scoring break the search
        import warnings

        warnings.warn(
            f"shared split scoring failed ({exc}); falling back to "
            "per-action SVDs",
            RuntimeWarning,
            stacklevel=2,
        )
        return {}


def maybe_batched_svds(
    state, actions: Sequence[Action]
) -> Dict[Action, Tuple]:
    """The drivers' entry point: {} whenever the state is ineligible."""
    try:
        if not device_scoring_eligible(state.network):
            return {}
        return batched_split_svds(
            state.network,
            actions,
            budget=getattr(state, "curr_delta", None),
        )
    except Exception as exc:  # never let scoring break the search
        import warnings

        warnings.warn(
            f"batched device scoring failed ({exc}); falling back to "
            "per-action SVDs",
            RuntimeWarning,
            stacklevel=2,
        )
        return {}
