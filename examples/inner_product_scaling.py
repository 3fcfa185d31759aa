"""TT inner-product scaling study (parity with the reference harness
``examples/inner_product_scaling.py``): wall time vs rank r, mode size n,
and dimension d, against the asymptotic guide slopes.

Two paths are measured:
  * graph   — the generic edge-aware cached contraction (first call pays
              planning + compile; steady state is the cached executable),
  * fused   — the single-scan zipper kernel for uniform trains.

Run with --plot to save log-log figures (requires matplotlib).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import argparse
import sys
import time

import numpy as np

from tensor_networks_tpu import Index, TensorNetwork, tt_inner_fast


def tt_inner_timer(r: int, n: int, d: int, num: int = 5, fused: bool = True):
    indices = [Index(f"x{i}", n) for i in range(d)]
    a = TensorNetwork.rand_tt(indices, [r] * (d - 1), dtype=np.float32)
    b = TensorNetwork.rand_tt(indices, [r] * (d - 1), dtype=np.float32)

    def inner():
        if fused:
            return float(tt_inner_fast(a, b))
        return float(a.inner(b))

    inner()  # warm the plan/executable cache
    t0 = time.perf_counter()
    for _ in range(num):
        inner()
    return (time.perf_counter() - t0) / num


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--plot", action="store_true")
    parser.add_argument(
        "--graph",
        action="store_true",
        help="time the generic graph contraction instead of the fused zipper",
    )
    args = parser.parse_args()
    fused = not args.graph

    results = {}

    n, d = 20, 20
    ranks = np.array([10, 20, 40, 80, 160, 320])
    times_r = np.array(
        [tt_inner_timer(r, n, d, fused=fused) for r in ranks]
    )
    results["rank"] = (ranks, times_r)
    print("rank scaling (n=20, d=20):", file=sys.stderr)
    for r, t in zip(ranks, times_r):
        print(f"  r={r:4d}  {t*1e3:10.3f} ms", file=sys.stderr)

    d, r = 20, 20
    ns = np.array([5, 10, 20, 40, 80, 160, 320, 640])
    times_n = np.array(
        [tt_inner_timer(r, nn, d, fused=fused) for nn in ns]
    )
    results["mode"] = (ns, times_n)
    print("mode-size scaling (r=20, d=20):", file=sys.stderr)
    for nn, t in zip(ns, times_n):
        print(f"  n={nn:4d}  {t*1e3:10.3f} ms", file=sys.stderr)

    r, n = 5, 5
    ds = np.array([5, 10, 20, 40, 80, 160, 320, 640])
    times_d = np.array(
        [tt_inner_timer(r, n, dd, fused=fused) for dd in ds]
    )
    results["dim"] = (ds, times_d)
    print("dimension scaling (r=5, n=5):", file=sys.stderr)
    for dd, t in zip(ds, times_d):
        print(f"  d={dd:4d}  {t*1e3:10.3f} ms", file=sys.stderr)

    # the fix the reference README asks for: time must scale ~linearly in d
    big = times_d[-1] / times_d[3]
    ratio = big / (ds[-1] / ds[3])
    print(
        f"d-scaling exponent proxy (should be ~1): "
        f"{np.log(big) / np.log(ds[-1] / ds[3]):.2f}",
        file=sys.stderr,
    )

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(15, 4))
        for ax, (key, xlabel, slopes) in zip(
            axes,
            [
                ("rank", "rank r", (3, 4)),
                ("mode", "mode size n", (1, 2)),
                ("dim", "dimension d", (1, 2)),
            ],
        ):
            xs, ts = results[key]
            ax.loglog(xs, ts, "o-", label="measured")
            for s in slopes:
                ax.loglog(
                    xs,
                    ts[0] * (xs / xs[0]) ** float(s),
                    "--",
                    label=f"slope {s}",
                )
            ax.set_xlabel(xlabel)
            ax.set_ylabel("time [s]")
            ax.legend()
        fig.tight_layout()
        fig.savefig("inner_product_scaling.png", dpi=120)
        print("saved inner_product_scaling.png", file=sys.stderr)

    return results


if __name__ == "__main__":
    main()
