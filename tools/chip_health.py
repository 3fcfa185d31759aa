"""Quick TPU relay health probe.

Measures the known-good pallas zipper (d=50, n=32, r=100 inner product;
healthy v5e through the relay: ~450 us full-f32) and reports the
slowdown factor.  Run BEFORE trusting any benchmark numbers: the relay
chip is shared and has been observed to degrade ~50x for extended
periods (e.g. after a two-client conflict), which silently poisons
every timing taken during the episode.

Usage: python3 tools/chip_health.py   (exit code 1 when degraded >3x)
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TNT_ENABLE_X64", "0")

HEALTHY_US = 460.0


def probe() -> dict:
    """Measure the zipper probe and classify the relay state.

    Returns ``{"us_min", "us_single", "factor", "status"}`` with status
    one of ``healthy | bursty | degraded | not_tpu``.  Importable so
    bench.py can embed the factor in its JSON (self-diagnosing
    benchmarks — a 2x "regression" with factor 2.1 is the relay, not
    the code).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    if jax.default_backend() != "tpu":
        return {
            "us_min": float("nan"),
            "us_single": float("nan"),
            "factor": float("nan"),
            "status": "not_tpu",
        }

    from tensor_networks_tpu.kernels.pallas_ops import (
        pad_train,
        tt_inner_pallas,
    )

    d, n, r = 50, 32, 100
    rng = np.random.default_rng(0)
    first = jnp.asarray(
        rng.standard_normal((n, r)) / np.sqrt(r), jnp.float32
    )
    mids = jnp.asarray(
        rng.standard_normal((d - 2, r, n, r)) / np.sqrt(r), jnp.float32
    )
    last = jnp.asarray(
        rng.standard_normal((r, n)) / np.sqrt(r), jnp.float32
    )
    f, m, l = pad_train(first, mids, last)

    @partial(jax.jit, static_argnames=("k",))
    def rep(f, m, l, k):
        def body(acc, _):
            scale = 1.0 + acc * jnp.asarray(1e-24, jnp.float32)
            val = tt_inner_pallas(f * scale, m, l, f, m, l, prepadded=True)
            return val.astype(jnp.float32), None

        acc, _ = jax.lax.scan(
            body, jnp.asarray(0.0, jnp.float32), jnp.arange(k)
        )
        return acc

    def best_of(k, reps=4):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(rep(f, m, l, k=k))
            best = min(best, time.perf_counter() - t0)
        return best

    for k in (8, 104):
        float(rep(f, m, l, k=k))  # compile

    # single-shot slope: sensitive to bursty relay stalls
    t0 = time.perf_counter()
    float(rep(f, m, l, k=8))
    t1 = time.perf_counter()
    float(rep(f, m, l, k=104))
    t2 = time.perf_counter()
    us_single = ((t2 - t1) - (t1 - t0)) / 96 * 1e6

    # min-of-4 slope: what bench.py::timed_repeat reports
    us_min = (best_of(104) - best_of(8)) / 96 * 1e6

    factor = us_min / HEALTHY_US
    if us_min <= 0 or factor > 3.0:
        status = "degraded"
    elif us_single > 3.0 * us_min:
        status = "bursty"
    else:
        status = "healthy"
    return {
        "us_min": float(us_min),
        "us_single": float(us_single),
        "factor": float(factor),
        "status": status,
        "device": str(dev),
    }


def main() -> int:
    res = probe()
    if res["status"] == "not_tpu":
        print("not a TPU backend; nothing to probe")
        return 0
    print(
        f"[chip_health] {res['device']}: zipper inner "
        f"{res['us_min']:.0f} us/call min-slope "
        f"({res['factor']:.1f}x healthy ~{HEALTHY_US:.0f} us); "
        f"single-shot {res['us_single']:.0f} us"
    )
    if res["status"] == "degraded":
        # non-positive slope means a relay stall hit the measurement
        # itself — exactly the condition the probe exists to catch
        print(
            "[chip_health] DEGRADED — do not trust timings taken now; "
            "re-probe later before benchmarking"
        )
        return 1
    if res["status"] == "bursty":
        print(
            "[chip_health] BURSTY — min-filtered slopes (bench protocol) "
            "are OK, single-shot timings are being poisoned by stalls"
        )
        return 0
    print("[chip_health] healthy")
    return 0


if __name__ == "__main__":
    sys.exit(main())
