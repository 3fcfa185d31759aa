"""On-chip component budget of the compensated prefix (dw) sweep.

The dw mode measured 7.3 ms vs 5.8 ms for the single-word "high" mode
(d=50 n=32 r=100 f32, VALIDATION round 4).  Before shaving anything,
attribute the milliseconds: this probe slope-times standalone jitted
replicas of each stage of ``ops.fast._tt_round_prefix_sweep_fn`` —

  * the fused H/G chain scan (dw double-word vs single-word highest
    vs single-word high/bf16x3),
  * the batched adaptive Cholesky over both chains (2(d-1) matrices),
  * per-iteration cost of the batched Newton-Schulz sign body,
  * one batched triangular solve (the sweep does three),
  * the final core-projection einsums,

plus the full dw and high sweeps for the end-to-end anchors.

Run on a healthy relay (single-client — serialize with anything else):
    python3 tools/prefix_dw_profile.py
"""

import os
import sys
import time
from functools import partial

os.environ["TNT_ENABLE_X64"] = "0"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from tensor_networks_tpu.ops.fast import (  # noqa: E402
    _chol_adaptive,
    _tt_round_prefix_sweep_fn,
)
from tensor_networks_tpu.kernels.ozaki import (  # noqa: E402
    _pow2_exact,
    two_sum,
)

D, N, R = 50, 32, 100
DT = jnp.float32


def _time(fn, reps=4):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def timed_repeat(run, k1, k2):
    for k in (k1, k2):
        float(run(k))
    t1 = _time(lambda: float(run(k1)))
    t2 = _time(lambda: float(run(k2)))
    return max((t2 - t1) / (k2 - k1), 1e-9)


def make_train(rng):
    first = jnp.asarray(rng.standard_normal((N, R)) / np.sqrt(N), DT)
    mids = jnp.asarray(
        rng.standard_normal((D - 2, R, N, R)) / np.sqrt(N * R), DT
    )
    last = jnp.asarray(rng.standard_normal((R, N)) / np.sqrt(N), DT)
    return first, mids, last


# ---------------------------------------------------------------- chains
def chain_dw(first, mids, last):
    r = R
    dt = DT
    h0 = jnp.matmul(first.T, first, precision="highest")
    s0 = jnp.trace(h0) / r + jnp.asarray(1e-30, dt)
    g0 = jnp.matmul(last, last.T, precision="highest")
    t0 = jnp.trace(g0) / r + jnp.asarray(1e-30, dt)
    xs = jnp.stack(
        [mids, jnp.transpose(jnp.flip(mids, 0), (0, 3, 2, 1))], axis=1
    )

    def step(m, x):
        t = jnp.einsum("ywab,yanc->ywbnc", m, x, precision="highest")
        m2 = jnp.einsum("ywbnc,ybnC->ywcC", t, x, precision="highest")
        hi2, lo2 = two_sum(m2[:, 0], m2[:, 1])
        tr = jnp.einsum("yaa->y", hi2) / r + jnp.asarray(1e-30, dt)
        _, e = jnp.frexp(tr)
        s = _pow2_exact(e).astype(dt)
        hi2 = hi2 / s[:, None, None]
        lo2 = lo2 / s[:, None, None]
        return jnp.stack([hi2, lo2], axis=1), (hi2 + lo2, s)

    m0 = jnp.stack(
        [jnp.stack([h0 / s0, g0 / t0]), jnp.zeros((2, r, r), dt)], axis=1
    )
    _, (m_seq, s_seq) = jax.lax.scan(step, m0, xs)
    return jnp.sum(m_seq) + jnp.sum(s_seq)


def chain_single(first, mids, last, prec):
    r = R
    dt = DT
    h0 = jnp.matmul(first.T, first, precision="highest")
    s0 = jnp.trace(h0) / r + jnp.asarray(1e-30, dt)
    g0 = jnp.matmul(last, last.T, precision="highest")
    t0 = jnp.trace(g0) / r + jnp.asarray(1e-30, dt)
    xs = jnp.stack(
        [mids, jnp.transpose(jnp.flip(mids, 0), (0, 3, 2, 1))], axis=1
    )

    def step(m, x):
        t = jnp.einsum("yab,yanc->ybnc", m, x, precision=prec)
        m2 = jnp.einsum("ybnc,ybnC->ycC", t, x, precision=prec)
        s = jnp.einsum("yaa->y", m2) / r + jnp.asarray(1e-30, dt)
        return m2 / s[:, None, None], (m2, s)

    _, (m_seq, s_seq) = jax.lax.scan(step, jnp.stack([h0 / s0, g0 / t0]), xs)
    return jnp.sum(m_seq) + jnp.sum(s_seq)


def sign_fixed(a, iters):
    eye = jnp.eye(R, dtype=DT)
    alpha = jnp.max(jnp.sum(jnp.abs(a), axis=2), axis=1) + 1e-30
    x = a / alpha[:, None, None]
    for _ in range(iters):
        x2 = jnp.einsum("kab,kbc->kac", x, x, precision="highest")
        x3 = jnp.einsum("kab,kbc->kac", x, x2, precision="highest")
        x = 1.5 * x - 0.5 * x3
    return jnp.sum(x)


def main():
    rng = np.random.default_rng(11)
    first, mids, last = make_train(rng)
    nb = D - 1

    # symmetric PSD stand-ins for the factorization stages
    m_h = jnp.asarray(
        rng.standard_normal((2 * nb, R, R)).astype(np.float32)
    )
    hg = jnp.einsum("kab,kcb->kac", m_h, m_h) / R
    m_s = jnp.asarray(rng.standard_normal((nb, R, R)).astype(np.float32))
    sym = 0.5 * (m_s + jnp.swapaxes(m_s, 1, 2))
    low = jnp.linalg.cholesky(
        jnp.einsum("kab,kcb->kac", m_s, m_s) / R
        + 1e-3 * jnp.eye(R)[None]
    )
    rhs = m_s

    def repeat(body, *args):
        @partial(jax.jit, static_argnames=("k",))
        def run(k, args=args):
            def f(acc, i):
                scale = 1.0 + acc * jnp.asarray(1e-24, DT)
                out = body(args[0] * scale, *args[1:])
                return jnp.asarray(out, DT), None

            acc, _ = jax.lax.scan(
                f, jnp.asarray(0.0, DT), jnp.arange(k, dtype=DT)
            )
            return acc

        return run

    res = {}

    # full sweeps (anchor)
    for label, cp, eps in (
        ("full_dw", "dw", 1e-6),
        ("full_high", "high", 1e-3),
        ("full_highest", "highest", 1e-6),
    ):
        sweep = _tt_round_prefix_sweep_fn(True, chain_precision=cp)

        def body(f, m, l, sweep=sweep, eps=eps):
            fo, mo, lo, k0, ks = sweep(f, m, l, eps)
            return (
                jnp.sum(fo)
                + jnp.sum(mo)
                + jnp.sum(lo)
                + (k0 + jnp.sum(ks)).astype(DT)
            )

        run = repeat(body, first, mids, last)
        res[label] = timed_repeat(lambda k: run(k), 1, 9)
        print(f"[profile] {label}: {res[label]*1e3:.2f} ms", flush=True)

    # chains
    run = repeat(chain_dw, first, mids, last)
    res["chain_dw"] = timed_repeat(lambda k: run(k), 1, 9)
    print(f"[profile] chain_dw: {res['chain_dw']*1e3:.2f} ms", flush=True)
    for prec in ("highest", "high"):
        run = repeat(partial(chain_single, prec=prec), first, mids, last)
        res[f"chain_{prec}"] = timed_repeat(lambda k: run(k), 1, 9)
        print(
            f"[profile] chain_{prec}: {res[f'chain_{prec}']*1e3:.2f} ms",
            flush=True,
        )

    # batched adaptive cholesky over both chains (2 nb matrices)
    def chol_body(g):
        jit = (jnp.einsum("kaa->k", g) / R + 1e-30) * (
            20.0 * jnp.finfo(DT).eps
        )
        l, _ = _chol_adaptive(g, jit)
        return jnp.sum(l)

    run = repeat(chol_body, hg)
    res["chol_2nb"] = timed_repeat(lambda k: run(k), 1, 9)
    print(f"[profile] chol_2nb: {res['chol_2nb']*1e3:.2f} ms", flush=True)

    # NS sign per-iteration cost (fixed-count bodies, nb matrices)
    for iters in (8, 16):
        run = repeat(partial(sign_fixed, iters=iters), sym)
        res[f"sign_{iters}"] = timed_repeat(lambda k: run(k), 1, 9)
        print(
            f"[profile] sign_{iters}: {res[f'sign_{iters}']*1e3:.2f} ms",
            flush=True,
        )
    res["sign_per_iter"] = (res["sign_16"] - res["sign_8"]) / 8.0
    print(
        f"[profile] sign per iter: {res['sign_per_iter']*1e3:.3f} ms",
        flush=True,
    )

    # one batched triangular solve (the sweep does three)
    def tri_body(c, low=low):
        q = jax.lax.linalg.triangular_solve(
            low, c, left_side=False, lower=True, transpose_a=True
        )
        return jnp.sum(q)

    run = repeat(tri_body, rhs)
    res["trisolve"] = timed_repeat(lambda k: run(k), 1, 9)
    print(f"[profile] trisolve: {res['trisolve']*1e3:.2f} ms", flush=True)

    # final projection einsums
    def proj_body(f, m, l, bt=rhs[: nb - 1], ai=rhs[: nb - 1]):
        fo = jnp.matmul(f, rhs[0], precision="highest")
        mo = jnp.einsum(
            "kma,kanb,kbp->kmnp", bt, m, ai, precision="highest"
        )
        lo = jnp.matmul(rhs[-1], l, precision="highest")
        return jnp.sum(fo) + jnp.sum(mo) + jnp.sum(lo)

    run = repeat(proj_body, first, mids, last)
    res["proj"] = timed_repeat(lambda k: run(k), 1, 9)
    print(f"[profile] proj: {res['proj']*1e3:.2f} ms", flush=True)

    import json

    print("PROFILE_JSON " + json.dumps({k: round(v * 1e3, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
