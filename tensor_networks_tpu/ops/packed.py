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
from typing import List, NamedTuple, Optional, Tuple

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
    """Materialize a PackedTT as a graph network."""
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


def inner(a: PackedTT, b: PackedTT) -> jnp.ndarray:
    """<a, b> via the fused zipper (Pallas HBM-roof kernel on TPU)."""
    if (
        jax.default_backend() == "tpu"
        and a.mids.dtype in (jnp.float32, jnp.bfloat16)
        and a.mids.ndim == 4
        and min(a.mids.shape[1], a.mids.shape[3]) >= 64
    ):
        from tensor_networks_tpu.kernels.pallas_ops import tt_inner_pallas

        try:
            return tt_inner_pallas(
                a.first, a.mids, a.last, b.first, b.mids, b.last
            )
        except Exception:  # pragma: no cover - pallas regression safety
            pass
    return tt_inner_fn(True)(a.first, a.mids, a.last, b.first, b.mids, b.last)


def norm(a: PackedTT) -> jnp.ndarray:
    return jnp.sqrt(jnp.abs(inner(a, a)))


def scale(a: PackedTT, factor) -> PackedTT:
    """Scale the represented tensor (folds into the first core)."""
    return PackedTT(a.first * factor, a.mids, a.last)


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
    """Apply a uniform TT-operator; bond ranks multiply (R * r)."""
    # first: (no, ni, R) x (ni, r) -> (no, r*R)
    first = jnp.einsum("oik,il->olk", op.first, x.first)
    no = first.shape[0]
    first = first.reshape(no, -1)

    def mid_step(_, cores):
        opc, xc = cores  # (R, no, ni, R), (r, ni, r)
        out = jnp.einsum("aoib,mir->maobr", opc, xc)
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
    shapes; the preferred on-device rank-control primitive)."""
    return _rand_round_fn(target)(x, key)


def gmres_packed(
    op: PackedTTOp,
    rhs: PackedTT,
    x0: PackedTT,
    eps: float = 1e-5,
    rank: Optional[int] = None,
    maxiter: int = 30,
    seed: int = 0,
) -> Tuple[PackedTT, float]:
    """TT-GMRES where every Krylov operation is a fused device program.

    Rank control is randomized rounding to a fixed ``rank`` after every
    operator application and basis extension, so each iteration reuses
    the same compiled executables.  The tiny Hessenberg solve stays on
    host (as in the reference).
    """
    key = jax.random.PRNGKey(seed)
    if rank is None:
        rank = x0.rank * 2

    def op_round(v, key):
        w = ttop_apply_packed(op, v)
        return rand_round(w, rank, key)

    key, k0 = jax.random.split(key)
    r0 = add(rhs, scale(op_round(x0, k0), -1.0))
    key, k1 = jax.random.split(key)
    r0 = rand_round(r0, rank, k1)
    beta = float(norm(r0))
    v = [scale(r0, 1.0 / beta)]

    h = np.zeros((1, 0))
    y: List[np.ndarray] = []
    for jj in range(maxiter):
        key, ka = jax.random.split(key)
        w = op_round(v[-1], ka)

        h_new = np.zeros((jj + 2, jj + 1))
        h_new[: h.shape[0], : h.shape[1]] = h
        h = h_new

        coeffs = []
        for ii in range(jj + 1):
            h[ii, jj] = float(inner(w, v[ii]))
            coeffs.append(-h[ii, jj])
        # single k-ary combination + one rounding, instead of j rounds
        w = add(w, *[scale(v[ii], c) for ii, c in enumerate(coeffs)])
        key, kb = jax.random.split(key)
        w = rand_round(w, rank, kb)

        h[jj + 1, jj] = float(norm(w))
        v.append(scale(w, 1.0 / h[jj + 1, jj]))

        e = np.zeros(h.shape[0])
        e[0] = beta
        yy, resid, _, _ = np.linalg.lstsq(h, e, rcond=None)
        y.append(yy)
        if resid.size > 0 and float(np.abs(resid[0])) < eps:
            break

    x = x0
    terms = [scale(vv, float(c)) for vv, c in zip(v, y[-1])]
    x = add(x, *terms)
    key, kc = jax.random.split(key)
    x = rand_round(x, rank, kc)

    key, kd = jax.random.split(key)
    res = add(rhs, scale(op_round(x, kd), -1.0))
    return x, float(norm(res))
