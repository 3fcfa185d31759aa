"""On-chip probe: prefix rounding sweep time vs scan unroll factor.

The prefix sweep's H/G chain is a 48-step ``lax.scan`` of small GEMM
pairs — per-step scan-boundary overhead, not FLOPs, sets its floor at
d=50 r=100 (measured 5.1 ms against a ~1-2 ms roofline estimate).
``unroll`` trades compile time for fewer step boundaries; this probe
slope-times the full sweep at unroll 1/2/4/8 so the default can be set
from measurement (see TNT_PREFIX_UNROLL in ops/fast.py).

Run on the real chip (serialized — single-client relay):
    python3 tools/prefix_unroll_probe.py
"""

import os
import sys
import time

os.environ["TNT_ENABLE_X64"] = "0"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from functools import partial

from tensor_networks_tpu.ops.fast import _tt_round_prefix_sweep_fn

D, N, R = 50, 32, 100
DTYPE = jnp.float32


def _time(fn, reps=4):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    rng = np.random.default_rng(11)
    first = jnp.asarray(rng.standard_normal((N, R)) / np.sqrt(N), DTYPE)
    mids = jnp.asarray(
        rng.standard_normal((D - 2, R, N, R)) / np.sqrt(N * R), DTYPE
    )
    last = jnp.asarray(rng.standard_normal((R, N)) / np.sqrt(N), DTYPE)

    # (unroll, chain matmul precision): unroll trades compile time for
    # fewer scan boundaries; "high" (bf16x3) halves the chain's MXU
    # passes with noise (~3e-5) an order below the mode's sqrt(eps)
    # resolution floor
    variants = (
        (1, "highest"),
        (2, "highest"),
        (4, "highest"),
        (8, "highest"),
        (1, "high"),
        (4, "high"),
        (1, "dw"),
        (4, "dw"),
    )
    only = os.environ.get("TNT_PROBE_VARIANTS")
    if only:
        keep = set(only.split(","))
        variants = tuple(
            (u, c) for u, c in variants if f"{u}:{c}" in keep
        )
    for unroll, cprec in variants:
        sweep = _tt_round_prefix_sweep_fn(
            True, unroll=unroll, chain_precision=cprec
        )

        @partial(jax.jit, static_argnames=("k",))
        def repeat(first, mids, last, k, _sweep=sweep):
            def body(acc, i):
                scale = 1.0 + acc * jnp.asarray(1e-24, DTYPE)
                f, m, l, k0, ks = _sweep(first * scale, mids, last, 1e-3)
                # consume EVERY output (dead-code elimination trap)
                tot = (
                    jnp.sum(f)
                    + jnp.sum(m)
                    + jnp.sum(l)
                    + (k0 + jnp.sum(ks)).astype(DTYPE)
                )
                return acc + tot, (k0, ks)

            acc, (k0s, kss) = jax.lax.scan(
                body, jnp.asarray(0.0, DTYPE), jnp.arange(k, dtype=DTYPE)
            )
            # expose the decisions so chain-precision variants can be
            # rank-compared without a separate compile
            return acc, k0s[-1], kss[-1]

        t_c0 = time.time()
        for k in (1, 5):
            float(repeat(first, mids, last, k)[0])  # compile both
        compile_s = time.time() - t_c0
        t1 = _time(lambda: float(repeat(first, mids, last, 1)[0]))
        t2 = _time(lambda: float(repeat(first, mids, last, 5)[0]))
        slope = max((t2 - t1) / 4.0, 1e-9)
        _, k0v, ksv = repeat(first, mids, last, 1)
        ranks = [int(k0v)] + [int(x) for x in np.asarray(ksv)]
        print(
            f"[prefix-unroll] unroll={unroll} chain={cprec}: "
            f"{slope * 1e3:.2f} ms/sweep (compile {compile_s:.0f} s, "
            f"k0={ranks[0]} min_k={min(ranks)} max_k={max(ranks)})",
            flush=True,
        )


if __name__ == "__main__":
    main()
