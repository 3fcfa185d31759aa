"""On-chip d- and n-scaling envelope: inner product + prefix rounding.

The reference's one benchmark harness sweeps rank, mode size, AND
dimension (``/root/reference/examples/inner_product_scaling.py:29-78``),
and its README names *dimension* scaling as its known defect (bad
contraction paths).  This probe records the framework's envelope on the
real chip along the same two axes the rank envelope (VALIDATION.md)
does not cover:

* d in {10, 50, 100, 200} at n=32, r=100
* n in {32, 128, 512} at d=50, r=100

Each point is slope-timed (K iterations inside one jitted scan with a
data-dependent perturbation, two K values) for the scan zipper inner
product and the parallel-prefix rounding sweep (eps=1e-3, the loose
mode — the d/n-scaling SHAPE is the same for all prefix variants).

Writes ``/root/repo/.scaling_probe.json``; bench.py embeds the record
as ``scaling_probe`` so the envelope lands in the round's BENCH file.

Run on the real chip (serialized — single-client relay):
    python3 tools/scaling_probe.py
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("TNT_ENABLE_X64", "0")

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

OUT_PATH = os.path.join(os.path.dirname(_HERE), ".scaling_probe.json")


def main():
    # health gate (child process — never init the relay in-process
    # before knowing it responds; see CLAUDE.md)
    health = subprocess.run(
        ["timeout", "900", "python3", os.path.join(_HERE, "chip_health.py")],
        capture_output=True,
        text=True,
    )
    tail = (health.stdout or health.stderr).strip().splitlines()
    print(
        f"[scaling] chip_health rc={health.returncode}: "
        f"{tail[-1] if tail else 'no output'}"
    )
    if health.returncode != 0:
        print("[scaling] relay degraded/unreachable — aborting")
        sys.exit(2)

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache"
    )
    from functools import partial

    from tensor_networks_tpu.ops.fast import (
        _bond_bounds,
        _tt_round_prefix_sweep_fn,
        tt_inner_fn,
    )

    dtype = jnp.float32

    def make(d, n, r, seed=0):
        rng = np.random.default_rng(seed)
        s = 1.0 / np.sqrt(n * r)
        return (
            jnp.asarray(rng.standard_normal((n, r)) * s, dtype),
            jnp.asarray(
                rng.standard_normal((d - 2, r, n, r)) * s, dtype
            ),
            jnp.asarray(rng.standard_normal((r, n)) * s, dtype),
        )

    def fetch(x):
        return float(np.asarray(x).ravel()[0])

    def slope(run, k1, k2, reps=4):
        for k in (k1, k2):
            fetch(run(k))  # compile both
        best1 = best2 = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch(run(k1))
            best1 = min(best1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            fetch(run(k2))
            best2 = min(best2, time.perf_counter() - t0)
        return max((best2 - best1) / (k2 - k1), 1e-9)

    record = {"inner_scan_us": {}, "round_prefix_ms": {}}

    configs = [
        ("d10_n32_r100", 10, 32, 100),
        ("d50_n32_r100", 50, 32, 100),
        ("d100_n32_r100", 100, 32, 100),
        ("d200_n32_r100", 200, 32, 100),
        ("d50_n128_r100", 50, 128, 100),
        ("d50_n512_r100", 50, 512, 100),
    ]

    for name, d, n, r in configs:
        f, m, l = make(d, n, r)

        @partial(jax.jit, static_argnames=("k",))
        def inner_rep(f, m, l, k, _d=d):
            fn = tt_inner_fn(True)

            def body(acc, _):
                scale = 1.0 + acc * jnp.asarray(1e-24, dtype)
                return fn(f * scale, m, l, f, m, l).astype(dtype), None

            acc, _ = jax.lax.scan(
                body, jnp.asarray(1.0, dtype), jnp.arange(k)
            )
            return acc

        t_inner = slope(lambda k: inner_rep(f, m, l, k=k), 8, 40)
        record["inner_scan_us"][name] = round(t_inner * 1e6, 1)
        print(
            f"[scaling] {name}: inner {t_inner*1e6:.0f} us", flush=True
        )

        bounds = jnp.asarray(
            _bond_bounds([n] * d, [r] * (d - 1), r)
        )

        @partial(jax.jit, static_argnames=("k",))
        def round_rep(f, m, l, k, _bounds=bounds):
            sweep = _tt_round_prefix_sweep_fn(True)

            def body(acc, _):
                scale = 1.0 + acc * jnp.asarray(1e-24, dtype)
                fo, mo, lo, k0, ks = sweep(
                    f * scale, m, l, 1e-3, _bounds
                )
                tot = (
                    jnp.sum(fo)
                    + jnp.sum(mo)
                    + jnp.sum(lo)
                    + (k0 + jnp.sum(ks)).astype(dtype)
                )
                return tot.astype(dtype), None

            acc, _ = jax.lax.scan(
                body, jnp.asarray(0.0, dtype), jnp.arange(k)
            )
            return acc

        t_round = slope(lambda k: round_rep(f, m, l, k=k), 1, 9)
        record["round_prefix_ms"][name] = round(t_round * 1e3, 2)
        print(
            f"[scaling] {name}: prefix round {t_round*1e3:.2f} ms",
            flush=True,
        )
        del f, m, l

    record["ts"] = time.time()
    record["chip_health"] = tail[-1] if tail else ""
    with open(OUT_PATH, "w") as fh:
        json.dump(record, fh, indent=1)
    print(f"[scaling] wrote {OUT_PATH}")


if __name__ == "__main__":
    main()
