"""Benchmark: TT inner product + TT rounding, d=50 n=32 r=100, vs NumPy.

Compares the framework's fused TPU kernels against a faithful NumPy
re-creation of the reference algorithms (``pytens``):

* inner product — the reference contracts the 2d-node joined network with
  a fresh opt_einsum "auto" path search per call (pytens/algs.py:469-485);
* rounding — right-orth QR sweep + forward truncated-SVD sweep
  (pytens/algs.py:1654-1903).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "x", "vs_baseline": ...,
   "extra": {breakdown}}
where value is the geometric mean of the two speedups.

DEADLINE DISCIPLINE (round 5): the whole run works against a
wall-clock budget (``TNT_BENCH_BUDGET`` seconds, default 1500).  The
headline legs (numpy refs, inner, rounding family) always run; every
optional leg runs only if enough budget remains (recording
``skipped_budget`` otherwise), and the JSON line is emitted from a
``try/finally`` — a crash, a relay hang past the alarm, or a SIGTERM
from the driver's ``timeout`` still prints a partial record.  Round 4
lost its whole perf record (BENCH_r04: rc=124, parsed=null) because
the un-budgeted leg chain pushed the single print past the driver's
timeout.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

# last successful real-chip record; reported (labeled) if the relay is
# unreachable when the driver runs bench
_CACHE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_cache.json"
)

# device work is float32; keep the TPU program free of s64/f64 ops
os.environ.setdefault("TNT_ENABLE_X64", "0")


D, N, R = 50, 32, 100
DTYPE = "float32"  # device dtype; the NumPy reference runs float64

# v5e single-chip roofs for the roofline columns (public spec values:
# ~820 GB/s HBM bandwidth, ~197 TFLOP/s bf16 MXU; f32-accurate matmul
# runs as 3-6 bf16 passes, so its practical roof is MXU_BF16/3..6)
HBM_ROOF_GBS = 820.0
MXU_BF16_TFLOPS = 197.0


def _round_stats_snapshot() -> dict:
    """Fallback counters from the library's rounding telemetry."""
    try:
        from tensor_networks_tpu.ops.fast import ROUND_STATS

        return dict(ROUND_STATS)
    except Exception:
        return {}


def _eval_path_snapshot() -> dict:
    """Kernel-routing counters (ragged / pallas / fallback) so the JSON
    records which evaluate path actually ran — same machine-readable
    contract as ``round_fallbacks``."""
    try:
        from tensor_networks_tpu.kernels.pallas_ops import PATH_STATS

        return dict(PATH_STATS)
    except Exception:
        return {}


def _scaling_snapshot() -> dict:
    """The d/n-scaling envelope recorded by tools/scaling_probe.py
    (run separately on a healthy chip; the file carries its own
    timestamp and chip-health line)."""
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                ".scaling_probe.json",
            )
        ) as fh:
            return json.load(fh)
    except Exception:
        return {"status": "not recorded"}


def _time(fn, reps: int, warmup: int = 1) -> float:
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def make_cores(seed: int, dtype):
    rng = np.random.default_rng(seed)
    # keep <a, a> = prod_k ||core_k||-ish terms O(1) so f32 cannot overflow
    scale = 1.0 / np.sqrt(R * N)
    first = (rng.standard_normal((N, R)) * scale).astype(dtype)
    mids = (rng.standard_normal((D - 2, R, N, R)) * scale).astype(dtype)
    last = (rng.standard_normal((R, N)) * scale).astype(dtype)
    return first, mids, last


# ---------------- NumPy baselines (reference algorithms) -----------------


def numpy_inner_reference_style(a_cores, b_cores) -> float:
    """The reference's inner(): one big einsum over all 2d cores with a
    fresh opt_einsum 'auto' path per call."""
    import opt_einsum as oe

    operands = []
    subscripts = []
    sym = oe.get_symbol
    # index ids: modes 0..d-1 shared; bonds a-side d..2d-3, b-side 2d-2..
    d = D
    a_first, a_mids, a_last = a_cores
    b_first, b_mids, b_last = b_cores

    def bond_a(k):
        return d + k

    def bond_b(k):
        return 2 * d - 1 + k

    operands.append(a_first)
    subscripts.append(sym(0) + sym(bond_a(0)))
    for k in range(d - 2):
        operands.append(a_mids[k])
        subscripts.append(sym(bond_a(k)) + sym(k + 1) + sym(bond_a(k + 1)))
    operands.append(a_last)
    subscripts.append(sym(bond_a(d - 2)) + sym(d - 1))

    operands.append(b_first)
    subscripts.append(sym(0) + sym(bond_b(0)))
    for k in range(d - 2):
        operands.append(b_mids[k])
        subscripts.append(sym(bond_b(k)) + sym(k + 1) + sym(bond_b(k + 1)))
    operands.append(b_last)
    subscripts.append(sym(bond_b(d - 2)) + sym(d - 1))

    expr = ",".join(subscripts) + "->"
    return float(oe.contract(expr, *operands, optimize="auto"))


def numpy_tt_round(cores, eps: float):
    """The reference's tt_svd_round: backward QR sweep, forward truncated
    SVD sweep with the remaining-budget rule."""
    first, mids, last = cores
    mids = [m.copy() for m in mids]
    first = first.copy()
    last = last.copy()
    d = D

    # backward right-orthogonalization
    q, rr = np.linalg.qr(last.T)
    last = q.T
    carry = rr.T
    for k in range(d - 3, -1, -1):
        cur = np.einsum("rnk,kc->rnc", mids[k], carry)
        r0, nn, r1 = cur.shape
        q, rr = np.linalg.qr(cur.reshape(r0, nn * r1).T)
        mids[k] = q.T.reshape(r0, nn, r1)
        carry = rr.T
    first = first @ carry

    # forward truncation sweep
    def trunc(mat, delta):
        u, s, vt = np.linalg.svd(mat, full_matrices=False)
        tail = np.cumsum(s[::-1] ** 2)
        k = int(np.searchsorted(tail, delta**2, side="right"))
        rank = max(len(s) - k, 1)
        used = tail[k - 1] if k > 0 else 0.0
        rem = np.sqrt(max(delta**2 - used, 0.0))
        return u[:, :rank], (s[:rank, None] * vt[:rank]), rem

    norm = np.linalg.norm(first)
    delta = eps / np.sqrt(d - 1) * norm
    u, sv, delta = trunc(first, delta)
    first = u
    carry = sv
    for k in range(d - 2):
        cur = np.einsum("ak,knc->anc", carry, mids[k])
        r0, nn, r1 = cur.shape
        u, sv, delta = trunc(cur.reshape(r0 * nn, r1), delta)
        mids[k] = u.reshape(r0, nn, -1)
        carry = sv
    last = carry @ last
    return first, mids, last


def numpy_evaluate_reference_style(cores, idx) -> np.ndarray:
    """The reference's batched evaluation: per-node fancy-index gathers
    plus one batch-shared einsum (pytens/algs.py:1103-1177)."""
    import opt_einsum as oe

    first, mids, last = cores
    b = idx.shape[0]
    sym = oe.get_symbol
    operands = []
    subscripts = []
    batch = sym(0)
    # first core: gather rows -> (B, r)
    operands.append(first[idx[:, 0], :])
    subscripts.append(batch + sym(1))
    for k in range(mids.shape[0]):
        operands.append(mids[k][:, idx[:, k + 1], :].transpose(1, 0, 2))
        subscripts.append(batch + sym(k + 1) + sym(k + 2))
    operands.append(last[:, idx[:, -1]].T)
    subscripts.append(batch + sym(mids.shape[0] + 1))
    expr = ",".join(subscripts) + "->" + batch
    return oe.contract(expr, *operands, optimize="random-greedy")


# ---------------------------- device paths ----------------------------


def _backend_reachable(timeout_s: int = 180) -> bool:
    """Probe jax backend init in a CHILD with a hard timeout.

    When the axon relay is unreachable, ``jax.devices()`` HANGS forever
    in-process (observed 2026-08-17, multi-hour outage) — it does not
    raise.  A benchmark that hangs violates the one-JSON-line driver
    contract, so the probe runs in a killable subprocess.
    """
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            capture_output=True,
            timeout=timeout_s,
            text=True,
        )
        return proc.returncode == 0 and "ok" in proc.stdout
    except Exception:
        return False


def _backend_reachable_retry() -> bool:
    """Reachability with a bounded retry window.

    Relay outages are often transient (minutes); a single failed probe
    at the moment the driver happens to run bench would zero the whole
    round's record.  Retry a couple of times (each probe is itself
    timeout-bounded) before giving up.  Tunables:
    ``TNT_BENCH_PROBE_ATTEMPTS`` (default 2) and
    ``TNT_BENCH_PROBE_SLEEP`` seconds between attempts (default 45) —
    worst case ~7 min, small against the leg budget (round 4's
    4x240s+sleep worst case alone could eat a driver timeout).
    """
    attempts = int(os.environ.get("TNT_BENCH_PROBE_ATTEMPTS", "2"))
    sleep_s = float(os.environ.get("TNT_BENCH_PROBE_SLEEP", "45"))
    for i in range(max(1, attempts)):
        if _backend_reachable():
            return True
        print(
            f"[bench] backend probe {i + 1}/{attempts} failed",
            file=sys.stderr,
        )
        if i + 1 < attempts:
            time.sleep(sleep_s)
    return False


# ------------------------- deadline framework -------------------------


class _Deadline(Exception):
    """Raised by the SIGALRM/SIGTERM handlers to unwind into the
    finally-emission path."""


class _Bench:
    """Shared state + budget + one-shot JSON emission.

    ``s`` holds every measured quantity (missing -> NaN at emission);
    ``legs`` records each leg's outcome so a partial record is
    self-describing.
    """

    def __init__(self, budget_s: float):
        self.t0 = time.monotonic()
        self.budget = budget_s
        self.s: dict = {}
        self.legs: dict = {}
        self.emitted = False

    def elapsed(self) -> float:
        return time.monotonic() - self.t0

    def remaining(self) -> float:
        return self.budget - self.elapsed()

    def leg(self, name: str, est_s: float, fn, required: bool = False):
        """Run one leg under the budget.

        Optional legs are skipped (and say so in the record) when the
        remaining budget is below the leg's cost estimate; ANY leg's
        exception is contained so the legs after it still run.  A
        ``_Deadline`` (alarm/SIGTERM) always propagates — that is the
        unwind-to-emission path.
        """
        rem = self.remaining()
        if not required and rem < est_s:
            self.legs[name] = (
                f"skipped_budget (est {est_s:.0f}s > {rem:.0f}s left)"
            )
            print(f"[bench] leg {name}: {self.legs[name]}", file=sys.stderr)
            return
        t0 = time.monotonic()
        try:
            fn(self)
            self.legs[name] = f"ok ({time.monotonic() - t0:.1f}s)"
        except _Deadline:
            self.legs[name] = (
                f"deadline ({time.monotonic() - t0:.1f}s in)"
            )
            raise
        except Exception as exc:
            self.legs[name] = f"failed: {exc}"[:200]
            print(
                f"[bench] leg {name} failed: {exc}", file=sys.stderr
            )

    def get(self, key: str, default=float("nan")):
        return self.s.get(key, default)

    def emit(self):
        """Build + print the one-JSON-line record from whatever state
        exists.  Idempotent (finally + signal paths can both reach it)."""
        if self.emitted:
            return
        self.emitted = True
        s = self.get
        inner_speedup = s("t_np_inner") / s("t_inner")
        round_speedup = s("t_np_round") / s("t_round")
        geomean = float(np.sqrt(inner_speedup * round_speedup))

        result = {
            "metric": "tt_d50_n32_r100_speedup_vs_numpy_geomean",
            "value": round(geomean, 2),
            "unit": "x",
            "vs_baseline": round(geomean, 2),
            "extra": {
                "inner_speedup_x": round(inner_speedup, 2),
                "tpu_inner_scan_us": round(s("t_inner_scan") * 1e6, 1),
                "round_speedup_x": round(round_speedup, 2),
                "tpu_inner_us": round(s("t_inner") * 1e6, 1),
                "tpu_inner_bf16x3_us": round(s("t_inner_b3") * 1e6, 1),
                "numpy_inner_ms": round(s("t_np_inner") * 1e3, 2),
                "tpu_round_ms": round(s("t_round") * 1e3, 2),
                "tpu_round_svd_ms": round(s("t_round_svd") * 1e3, 2),
                "tpu_round_cholqr2_ms": round(s("t_round_c2") * 1e3, 2),
                "tpu_round_twosided_ms": round(s("t_round_ts") * 1e3, 2),
                "tpu_round_gram_ms": round(s("t_round_gram") * 1e3, 2),
                "tpu_round_prefix_ms": round(s("t_round_prefix") * 1e3, 2),
                "tpu_round_prefix_dw_ms": round(s("t_round_dw") * 1e3, 2),
                "numpy_round_ms": round(s("t_np_round") * 1e3, 2),
                "round_gflops_est": round(s("gflops"), 1),
                "evaluate_mpts_per_s": round(s("eval_mpts"), 2),
                "evaluate_mpts_per_s_bf16": round(s("eval_mpts_bf16"), 2),
                "evaluate_ensemble_mpts_per_s": round(s("eval_ens_mpts"), 2),
                "ensemble_small_batch_speedup_x": round(
                    s("ens_small_x"), 2
                ),
                # per-point ratio: numpy measured on a small slice, TPU
                # rate extrapolated from its 8192-pt throughput — the
                # name says so
                "evaluate_speedup_x_per_point_extrapolated": round(
                    s("eval_speedup"), 1
                ),
                "numpy_eval_pts_measured": s("numpy_eval_pts", 0),
                "roofline": s("roofline", {}),
                "cross_d8_wall_s": round(s("cross_wall"), 2),
                "cross_d8_rel_err": float(f"{s('cross_err'):.2e}"),
                "cross_d8_unique_evals": s("cross_calls", -1),
                "search_partition_wall_s": round(s("search_wall"), 2),
                "search_partition_programs": s("search_count", -1),
                "search_dfs_wall_s": round(s("dfs_wall"), 2),
                "search_dfs_states": s("dfs_count", -1),
                # d=8 n=6 root scoring through the real bfs driver,
                # ONE device/host pair (round-4 verdict cut the
                # 5-run protocol that blew the budget)
                "search_bfs8_device_s": round(s("sdev_wall"), 2),
                "search_bfs8_host_s": round(s("shost_wall"), 2),
                "search_bfs8_counts": [
                    s("sdev_count", -1), s("shost_count", -1)
                ],
                # cross with a device-resident network target: every
                # fiber matrix evaluates on the TPU
                "cross_device_wall_s": round(s("cdev_wall"), 2),
                "cross_device_rel_err": float(f"{s('cdev_err'):.2e}"),
                "cross_device_rel_err_dw": float(
                    f"{s('cdev_err_dw'):.2e}"
                ),
                "cross_device_unique_evals": s("cdev_calls", -1),
                "inner_self_rel_diff_f32": float(f"{s('rel'):.2e}"),
                "chip_health_x": round(s("chip_health_x"), 2),
                "chip_health_status": s(
                    "chip_health_status", "not probed"
                ),
                "round_fallbacks": _round_stats_snapshot(),
                "eval_path_stats": _eval_path_snapshot(),
                "solver_cpu": s("solver_cpu", {"status": "not run"}),
                "solver_tpu": s("solver_tpu", {"status": "not run"}),
                "solver_tpu_r64": s(
                    "solver_tpu_r64", {"status": "not run"}
                ),
                "scaling_probe": _scaling_snapshot(),
                "legs": dict(self.legs),
                "budget_s": self.budget,
                "elapsed_s": round(self.elapsed(), 1),
                "device": s("device", "unknown"),
            },
        }
        print(json.dumps(result))
        sys.stdout.flush()
        # cache the record: if a later driver-run bench hits a relay
        # outage it can report this last real measurement (labeled)
        # instead of NaN.  Partial (deadline) records are cached too —
        # better a labeled partial than nothing — but only if they got
        # past the headline legs.
        if s("t_inner") == s("t_inner"):
            try:
                with open(_CACHE_PATH, "w") as fh:
                    json.dump(
                        {
                            "saved_utc": time.strftime(
                                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                            ),
                            "record": result,
                        },
                        fh,
                    )
            except OSError as exc:
                print(
                    f"[bench] cache write failed: {exc}", file=sys.stderr
                )


def _emit_unreachable():
    """Relay down: prefer the last REAL measurement over a NaN record
    (multi-hour relay outages exist, 2026-08-17); the reused record is
    explicitly labeled with its capture time."""
    try:
        with open(_CACHE_PATH) as fh:
            cached = json.load(fh)
        rec = cached["record"]
        rec.setdefault("extra", {})["status"] = (
            "backend_unreachable_reporting_cached_run"
        )
        rec["extra"]["cached_run_utc"] = cached.get("saved_utc")
        print(
            "[bench] backend unreachable — reporting the cached "
            f"real-chip record from {cached.get('saved_utc')}",
            file=sys.stderr,
        )
        print(json.dumps(rec))
        return
    except (OSError, ValueError, KeyError):
        pass
    print(
        "[bench] jax backend unreachable (relay down?) — emitting "
        "NaN record instead of hanging",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "tt_d50_n32_r100_speedup_vs_numpy_geomean",
                "value": float("nan"),
                "unit": "x",
                "vs_baseline": float("nan"),
                "extra": {"status": "backend_unreachable"},
            }
        )
    )


# ------------------------------- legs --------------------------------


def _leg_numpy_refs(B: _Bench):
    a_np = B.s["a_np"]
    b_np = B.s["b_np"]
    B.s["t_np_inner"] = _time(
        lambda: numpy_inner_reference_style(a_np, b_np), reps=3
    )
    print(
        f"[bench] numpy inner: {B.s['t_np_inner'] * 1e3:.1f} ms",
        file=sys.stderr,
    )
    B.s["t_np_round"] = _time(
        lambda: numpy_tt_round(a_np, 1e-10), reps=3
    )
    print(
        f"[bench] numpy round: {B.s['t_np_round'] * 1e3:.1f} ms",
        file=sys.stderr,
    )


def _derive_chip_health(B: _Bench):
    """Health factor derived from the inner leg's own zipper timing.

    tools/chip_health.py compiles its probe programs fresh in every
    process (~7 min of relay compiles for 4.5 s of measurement —
    pallas programs do not replay from the persistent cache), which
    twice ate most of a bench budget.  The inner leg already measures
    the SAME pallas zipper at the same config, so the factor is free:
    us/call vs the known-healthy ~460 us (scan zipper ~950 us when
    pallas is unavailable)."""
    if not B.s["on_tpu"]:
        B.s["chip_health_status"] = "not_tpu"
        return
    t = B.get("t_inner")
    scan_only = t == B.get("t_inner_scan")
    healthy = 950e-6 if scan_only else 460e-6
    if t != t:
        B.s["chip_health_status"] = "unmeasured"
        return
    factor = t / healthy
    B.s["chip_health_x"] = float(factor)
    B.s["chip_health_status"] = (
        "degraded" if factor > 3.0 else "healthy"
    )
    print(
        f"[bench] chip health (derived from inner leg): "
        f"{B.s['chip_health_status']} ({factor:.2f}x vs healthy "
        f"{'scan' if scan_only else 'pallas'} zipper)",
        file=sys.stderr,
    )


def _leg_inner(B: _Bench):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from tensor_networks_tpu.ops.fast import tt_inner_fn
    from tensor_networks_tpu.kernels.pallas_ops import tt_inner_pallas

    dtype = B.s["dtype"]
    a_dev = B.s["a_dev"]
    a_np = B.s["a_np"]
    on_tpu = B.s["on_tpu"]
    a_mids_padded = B.s["a_mids_padded"]

    @partial(jax.jit, static_argnames=("k", "which"))
    def inner_repeat(fa, ma, la, fb, mb, lb, k, which):
        def call(f):
            if which == "pallas":
                return tt_inner_pallas(
                    f, ma, la, fb, mb, lb, prepadded=True
                )
            if which == "pallas_b3":
                return tt_inner_pallas(
                    f, ma, la, fb, mb, lb,
                    prepadded=True, precision="bf16x3",
                )
            return tt_inner_fn(True)(f, ma, la, fb, mb, lb)

        def body(acc, _i):
            # data-dependent perturbation: the next iteration's input
            # depends on the previous result, so XLA can neither hoist
            # the zipper out of the loop nor factor the scalar through
            scale = 1.0 + acc * jnp.asarray(1e-24, dtype)
            return call(fa * scale).astype(dtype), None

        acc, _ = jax.lax.scan(
            body, jnp.asarray(1.0, dtype), jnp.arange(k, dtype=dtype)
        )
        return acc

    fetch = B.s["fetch"]
    timed_repeat = B.s["timed_repeat"]

    t_inner_scan = timed_repeat(
        lambda k: inner_repeat(*a_dev, *a_dev, k=k, which="scan"), 8, 104
    )
    print(
        f"[bench] tpu inner (scan): {t_inner_scan * 1e6:.0f} us/call",
        file=sys.stderr,
    )
    B.s["t_inner_scan"] = t_inner_scan
    B.s["t_inner"] = t_inner_scan
    if on_tpu:
        try:
            t_inner_pl = timed_repeat(
                lambda k: inner_repeat(
                    a_dev[0], a_mids_padded, a_dev[2],
                    a_dev[0], a_mids_padded, a_dev[2],
                    k=k, which="pallas",
                ),
                8, 104,
            )
            print(
                f"[bench] tpu inner (pallas): "
                f"{t_inner_pl * 1e6:.0f} us/call",
                file=sys.stderr,
            )
            B.s["t_inner"] = min(B.s["t_inner"], t_inner_pl)
            # the 3-pass split point: ~3e-5 relative at near-bf16 speed
            B.s["t_inner_b3"] = timed_repeat(
                lambda k: inner_repeat(
                    a_dev[0], a_mids_padded, a_dev[2],
                    a_dev[0], a_mids_padded, a_dev[2],
                    k=k, which="pallas_b3",
                ),
                8, 104,
            )
            print(
                f"[bench] tpu inner (pallas bf16x3): "
                f"{B.s['t_inner_b3'] * 1e6:.0f} us/call",
                file=sys.stderr,
            )
        except Exception as exc:
            print(f"[bench] pallas path failed: {exc}", file=sys.stderr)

    # sanity: <a, a> is a positive-accumulating sum (no cancellation),
    # so it checks kernel correctness at true f32 resolution
    inner_fn = tt_inner_fn(True)
    ref_val = numpy_inner_reference_style(a_np, a_np)
    got_val = float(inner_fn(*a_dev, *a_dev))
    B.s["rel"] = abs(got_val - ref_val) / max(abs(ref_val), 1e-30)
    print(
        f"[bench] <a,a> rel diff vs numpy f64: {B.s['rel']:.2e}",
        file=sys.stderr,
    )
    if on_tpu:
        try:
            got_pl = float(tt_inner_pallas(*a_dev, *a_dev))
            rel_pl = abs(got_pl - ref_val) / max(abs(ref_val), 1e-30)
            print(
                f"[bench] pallas <a,a> rel diff vs numpy f64: "
                f"{rel_pl:.2e}",
                file=sys.stderr,
            )
        except Exception as exc:
            print(f"[bench] pallas sanity failed: {exc}", file=sys.stderr)


def _leg_round_family(B: _Bench):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from tensor_networks_tpu.ops.fast import (
        _tt_round_cholqr2_sweep_fn,
        _tt_round_gram_sweep_fn,
        _tt_round_prefix_sweep_fn,
        _tt_round_sweep_fn,
        _tt_round_twosided_sweep_fn,
    )

    dtype = B.s["dtype"]
    a_dev = B.s["a_dev"]
    timed_repeat = B.s["timed_repeat"]

    def make_repeat(sweep, eps):
        @partial(jax.jit, static_argnames=("k",))
        def rep(first, mids, last, k):
            def body(acc, i):
                # acc-dependent: serializes iterations (an i-only scale
                # lets the scheduler overlap independent sweeps)
                scale = 1.0 + acc * jnp.asarray(1e-24, dtype)
                f, m, l, k0, ks = sweep(first * scale, mids, last, eps)
                # depend on EVERY output or XLA dead-code-eliminates
                # the forward truncation sweep and the timing is only
                # the backward half (a ~50x flattery caught 2026-08-17)
                tot = (
                    jnp.sum(f) + jnp.sum(m) + jnp.sum(l)
                    + (k0 + jnp.sum(ks)).astype(dtype)
                )
                return acc + tot, None

            acc, _ = jax.lax.scan(
                body, jnp.asarray(0.0, dtype), jnp.arange(k, dtype=dtype)
            )
            return acc

        return rep

    # (state key, label, sweep fn, eps, NaN-probe first).  The loose
    # modes (gram/prefix) only resolve sigma above sqrt(eps) so they
    # run at 1e-3; the accurate modes run at 1e-6.
    modes = [
        ("t_round_svd", "svd", _tt_round_sweep_fn(True), 1e-6, False),
        (
            "t_round_c2", "cholqr2",
            _tt_round_cholqr2_sweep_fn(True), 1e-6, False,
        ),
        (
            "t_round_ts", "twosided",
            _tt_round_twosided_sweep_fn(True), 1e-6, True,
        ),
        ("t_round_gram", "gram", _tt_round_gram_sweep_fn(True), 1e-3, False),
        (
            "t_round_prefix", "prefix",
            _tt_round_prefix_sweep_fn(True), 1e-3, True,
        ),
        (
            "t_round_dw", "prefix-dw",
            _tt_round_prefix_sweep_fn(True, chain_precision="dw"),
            1e-6, True,
        ),
    ]
    for key, label, sweep, eps, nan_probe in modes:
        if B.remaining() < 30 and key not in (
            "t_round_svd", "t_round_dw"
        ):
            B.legs[f"round:{label}"] = "skipped_budget"
            continue
        try:
            rep = make_repeat(sweep, eps)
            if nan_probe:
                # guard against the nondeterministic TPU miscompile
                # documented in VALIDATION.md: never let a
                # NaN-producing compilation into the headline min()
                probe = float(rep(a_dev[0], a_dev[1], a_dev[2], k=1))
                if probe != probe:
                    raise FloatingPointError(
                        f"{label} sweep compiled to NaN"
                    )
            t = timed_repeat(
                lambda k: rep(a_dev[0], a_dev[1], a_dev[2], k=k), 1, 9
            )
            B.s[key] = t
            print(
                f"[bench] tpu round ({label}): {t * 1e3:.2f} ms/call",
                file=sys.stderr,
            )
        except Exception as exc:
            print(
                f"[bench] {label} path failed: {exc}", file=sys.stderr
            )

    # headline: best ACCURATE sweep (svd/cholqr2/twosided eps=1e-6 +
    # the dw mode, which reaches the twosided fidelity class)
    acc_times = [
        B.get(k)
        for k in ("t_round_svd", "t_round_c2", "t_round_ts", "t_round_dw")
    ]
    ok = [t for t in acc_times if t == t]
    B.s["t_round"] = min(ok) if ok else float("nan")

    # FLOP estimate for the HOUSEHOLDER rounding sweep (QR + SVD +
    # carry GEMMs) — tied to t_round_svd, the sweep the model
    # describes; t_round may be the twosided sweep, which does no SVDs
    qr_flops = 2.0 * (N * R) * R * R  # per-core Householder QR
    svd_flops = 8.0 * (N * R) * R * R  # iterative SVD estimate
    gemm_flops = 2.0 * R * R * N * R * 2  # carry absorb fwd+bwd
    round_flops = D * (qr_flops + svd_flops + gemm_flops)
    B.s["round_flops_est"] = round_flops
    B.s["gflops"] = round_flops / B.get("t_round_svd") / 1e9


def _leg_evaluate(B: _Bench):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from tensor_networks_tpu.parallel.sharded import tt_evaluate_batched

    dtype = B.s["dtype"]
    a_dev = B.s["a_dev"]
    on_tpu = B.s["on_tpu"]
    timed_repeat = B.s["timed_repeat"]

    n_pts = 8192
    idx = jnp.asarray(
        np.random.default_rng(2).integers(0, N, size=(n_pts, D)),
        jnp.int32,
    )
    B.s["n_pts"] = n_pts

    @partial(jax.jit, static_argnames=("k",))
    def eval_repeat(first, mids, last, idx, k):
        def body(acc, _):
            scale = 1.0 + acc * jnp.asarray(1e-24, dtype)
            vals = tt_evaluate_batched(first * scale, mids, last, idx)
            return jnp.sum(vals).astype(dtype), None

        acc, _ = jax.lax.scan(
            body, jnp.asarray(0.0, dtype), jnp.arange(k, dtype=dtype)
        )
        return acc

    t_eval = timed_repeat(
        lambda k: eval_repeat(a_dev[0], a_dev[1], a_dev[2], idx, k=k),
        2, 10,
    )
    eval_mpts = n_pts / t_eval / 1e6
    print(
        f"[bench] evaluate (xla): {eval_mpts:.2f} Mpts/s "
        f"({t_eval * 1e3:.2f} ms / {n_pts} pts)",
        file=sys.stderr,
    )

    eval_mpts_bf16 = float("nan")
    if on_tpu:
        from tensor_networks_tpu.kernels.pallas_ops import (
            tt_evaluate_pallas,
        )

        for prec, label in (("bf16x3", "accurate"), ("default", "bf16")):

            @partial(jax.jit, static_argnames=("k",))
            def eval_pl_repeat(first, mids, last, idx, k, _p=prec):
                def body(acc, _):
                    scale = 1.0 + acc * jnp.asarray(1e-24, dtype)
                    vals = tt_evaluate_pallas(
                        first * scale, mids, last, idx, precision=_p
                    )
                    return jnp.sum(vals).astype(dtype), None

                acc, _ = jax.lax.scan(
                    body,
                    jnp.asarray(0.0, dtype),
                    jnp.arange(k, dtype=dtype),
                )
                return acc

            t_pl = timed_repeat(
                lambda k: eval_pl_repeat(
                    a_dev[0], a_dev[1], a_dev[2], idx, k=k
                ),
                2, 10,
            )
            mpts = n_pts / t_pl / 1e6
            print(
                f"[bench] evaluate (pallas {label}): {mpts:.2f} Mpts/s",
                file=sys.stderr,
            )
            if label == "accurate":
                eval_mpts = max(eval_mpts, mpts)
            else:
                eval_mpts_bf16 = mpts

        # segment-sorted ragged-matmul kernel (round 3): only the
        # useful (r x r) slice per point-step — "highest" is FULL f32
        # and is the accurate headline; "default" is the bf16 mode
        from tensor_networks_tpu.kernels.ragged_eval import (
            tt_evaluate_ragged,
        )

        for prec, label in (("highest", "f32"), ("default", "bf16")):

            @partial(jax.jit, static_argnames=("k",))
            def eval_rg_repeat(first, mids, last, idx, k, _p=prec):
                def body(acc, _):
                    scale = 1.0 + acc * jnp.asarray(1e-24, dtype)
                    vals = tt_evaluate_ragged(
                        first * scale, mids, last, idx, _p
                    )
                    return jnp.sum(vals).astype(dtype), None

                acc, _ = jax.lax.scan(
                    body,
                    jnp.asarray(0.0, dtype),
                    jnp.arange(k, dtype=dtype),
                )
                return acc

            t_rg = timed_repeat(
                lambda k: eval_rg_repeat(
                    a_dev[0], a_dev[1], a_dev[2], idx, k=k
                ),
                2, 10,
            )
            mpts = n_pts / t_rg / 1e6
            print(
                f"[bench] evaluate (ragged {label}): {mpts:.2f} Mpts/s",
                file=sys.stderr,
            )
            if label == "f32":
                eval_mpts = max(eval_mpts, mpts)
                B.s["t_eval_ragged_f32"] = t_rg
            else:
                eval_mpts_bf16 = max(eval_mpts_bf16, mpts)

    B.s["eval_mpts"] = eval_mpts
    B.s["eval_mpts_bf16"] = eval_mpts_bf16

    # honest baseline labeling: the reference-style evaluation is
    # minutes-slow at full batch, so the numpy number is MEASURED on
    # a small slice and the speedup compares per-point times
    numpy_eval_pts = 256
    a_np = B.s["a_np"]
    idx_np = np.asarray(idx)[:numpy_eval_pts]
    t_np_eval = _time(
        lambda: numpy_evaluate_reference_style(a_np, idx_np),
        reps=1,
        warmup=0,
    )
    B.s["numpy_eval_pts"] = numpy_eval_pts
    B.s["eval_speedup"] = (t_np_eval / numpy_eval_pts) / (
        1 / (eval_mpts * 1e6)
    )
    print(
        f"[bench] numpy evaluate: {t_np_eval * 1e3:.1f} ms for "
        f"{numpy_eval_pts} pts (per-point speedup "
        f"{B.s['eval_speedup']:.0f}x)",
        file=sys.stderr,
    )


def _leg_ensemble(B: _Bench):
    """Ensemble fold (round 3): B same-shape trains folded into the
    mode axis run as ONE ragged evaluation — measures how the per-step
    overhead amortizes across independent evaluate calls."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from tensor_networks_tpu.kernels.ragged_eval import tt_evaluate_ragged

    dtype = B.s["dtype"]
    timed_repeat = B.s["timed_repeat"]
    n_pts = B.s["n_pts"]

    n_ens = 8
    rng_e = np.random.default_rng(7)
    f_e = jnp.asarray(rng_e.standard_normal((n_ens * N, R)), dtype)
    m_e = jnp.asarray(
        rng_e.standard_normal((D - 2, R, n_ens * N, R)) / np.sqrt(R),
        dtype,
    )
    l_e = jnp.asarray(rng_e.standard_normal((R, n_ens * N)), dtype)
    offs = rng_e.integers(0, n_ens, size=(n_ens * n_pts, 1)) * N
    idx_e = jnp.asarray(
        rng_e.integers(0, N, size=(n_ens * n_pts, D)) + offs,
        jnp.int32,
    )

    try:
        @partial(jax.jit, static_argnames=("k",))
        def eval_ens_repeat(first, mids, last, idx, k):
            def body(acc, _):
                scale = 1.0 + acc * jnp.asarray(1e-24, dtype)
                vals = tt_evaluate_ragged(
                    first * scale, mids, last, idx, "highest"
                )
                return jnp.sum(vals).astype(dtype), None

            acc, _ = jax.lax.scan(
                body, jnp.asarray(0.0, dtype), jnp.arange(k, dtype=dtype)
            )
            return acc

        t_ens = timed_repeat(
            lambda k: eval_ens_repeat(f_e, m_e, l_e, idx_e, k=k), 2, 10
        )
        B.s["eval_ens_mpts"] = n_ens * n_pts / t_ens / 1e6
        print(
            f"[bench] evaluate (ensemble x{n_ens}, f32): "
            f"{B.s['eval_ens_mpts']:.2f} Mpts/s aggregate "
            f"({t_ens * 1e3:.2f} ms / {n_ens}x{n_pts} pts)",
            file=sys.stderr,
        )

        # the ensemble's actual regime: FEW points per train (cross
        # fibers, serving lookups), where a single-train call is
        # dispatch-bound.  Compare one fused ensemble dispatch against
        # n_ens separate warm dispatches at 1024 points each — wall
        # time, because dispatch IS the quantity the fold amortizes
        # (relay ~25 ms per call).
        n_small = 1024
        idx_s = idx_e[: n_ens * n_small]
        f_1 = f_e[:N]
        m_1 = m_e[:, :, :N] + 0.0  # materialized slice
        l_1 = l_e[:, :N]
        idx_1 = jnp.asarray(np.asarray(idx_s[:n_small]) % N, jnp.int32)

        @jax.jit
        def eval_ens_once(first, mids, last, idx):
            return jnp.sum(
                tt_evaluate_ragged(first, mids, last, idx, "highest")
            )

        @jax.jit
        def eval_one_once(first, mids, last, idx):
            return jnp.sum(
                tt_evaluate_ragged(first, mids, last, idx, "highest")
            )

        float(eval_ens_once(f_e, m_e, l_e, idx_s))  # compile
        float(eval_one_once(f_1, m_1, l_1, idx_1))
        t_fused = _time(
            lambda: float(eval_ens_once(f_e, m_e, l_e, idx_s)), reps=4
        )

        def _loop8():
            acc = 0.0
            for _ in range(n_ens):
                acc += float(eval_one_once(f_1, m_1, l_1, idx_1))
            return acc

        t_loop = _time(_loop8, reps=4)
        B.s["ens_small_x"] = t_loop / max(t_fused, 1e-9)
        print(
            f"[bench] ensemble small-batch ({n_ens}x{n_small} pts): "
            f"fused {t_fused * 1e3:.1f} ms vs {n_ens} dispatches "
            f"{t_loop * 1e3:.1f} ms ({B.s['ens_small_x']:.1f}x)",
            file=sys.stderr,
        )
    finally:
        # the ensemble stack holds ~0.5 GB of HBM; later legs should
        # not share the chip with it
        f_e = m_e = l_e = idx_e = None  # noqa: F841


def _leg_cross_host(B: _Bench):
    from tensor_networks_tpu import Index, TensorNetwork
    from tensor_networks_tpu.cross import (
        CachedFunc,
        ConvergenceCheck,
        CrossApproximation,
        CrossConfig,
    )

    class _Ackley(CachedFunc):
        def _run(self, args):
            y1 = np.sqrt(np.sum(args**2, axis=1) / args.shape[1])
            y2 = np.sum(np.cos(2 * np.pi * args), axis=1)
            return (
                -20.0 * np.exp(-0.2 * y1)
                - np.exp(y2 / args.shape[1])
                + 20.0
                + np.e
            )

    np.random.seed(7)
    # d=8 is the hardest cross case the reference tests (1e-4 bar,
    # tests/main_test.py:1293); we converge ~20x below it
    cross_d = 8
    c_inds = [
        Index(f"c{k}", 16, tuple(np.linspace(-2.0, 2.0, 16)))
        for k in range(cross_d)
    ]
    func = _Ackley(c_inds)
    net = TensorNetwork.rand_tt(c_inds, [1] * (cross_d - 1))
    tic = time.perf_counter()
    res = CrossApproximation(
        func,
        CrossConfig(
            kickrank=2,
            convergence=ConvergenceCheck.VALID_ERROR,
            validation_size=2000,
        ),
    ).cross(net, eps=1e-4)
    B.s["cross_wall"] = time.perf_counter() - tic
    grid = np.random.default_rng(5).integers(0, 16, size=(4096, cross_d))
    got = np.asarray(res.net.evaluate(func.indices, grid))
    real = np.asarray(func(grid))
    B.s["cross_err"] = float(
        np.linalg.norm(got - real) / np.linalg.norm(real)
    )
    B.s["cross_calls"] = func.num_calls()
    print(
        f"[bench] cross d=8 n=16: {B.s['cross_wall']:.1f} s, rel err "
        f"{B.s['cross_err']:.1e}, {B.s['cross_calls']} unique evals",
        file=sys.stderr,
    )


def _leg_search_small(B: _Bench):
    from tensor_networks_tpu import Index, Tensor, TensorNetwork
    from tensor_networks_tpu.search import SearchConfig, SearchEngine

    np.random.seed(1)
    snet = TensorNetwork()
    snet.add_node(
        "G",
        Tensor(
            np.random.randn(8, 9, 10, 11),
            [Index(nm, sz) for nm, sz in zip("ijkl", (8, 9, 10, 11))],
        ),
    )
    cfg = SearchConfig()
    cfg.engine.eps = 0.3
    tic = time.perf_counter()
    stats = SearchEngine(cfg).partition_search(snet)
    B.s["search_wall"] = time.perf_counter() - tic
    B.s["search_count"] = stats["count"]
    print(
        f"[bench] partition search 8x9x10x11: {B.s['search_wall']:.1f} s,"
        f" {B.s['search_count']} programs, cr_start "
        f"{stats['cr_start']:.2f}",
        file=sys.stderr,
    )

    np.random.seed(4)
    dnet = TensorNetwork()
    dnet.add_node(
        "G",
        Tensor(
            np.random.randn(3, 4, 5),
            [Index(nm, sz) for nm, sz in zip("ijk", (3, 4, 5))],
        ),
    )
    dcfg = SearchConfig()
    dcfg.engine.eps = 0.5
    tic = time.perf_counter()
    dstats = SearchEngine(dcfg).dfs(dnet)
    B.s["dfs_wall"] = time.perf_counter() - tic
    B.s["dfs_count"] = dstats["count"]
    print(
        f"[bench] dfs search 3x4x5: {B.s['dfs_wall']:.2f} s, "
        f"{B.s['dfs_count']} states",
        file=sys.stderr,
    )


def _leg_solver_tpu(B: _Bench):
    """Fused vs host-loop step/sweep pairs for TDVP(1,2-site)/ALS/eigsh
    at the K=22 QTT rank-8 f32 shapes — compiled programs come from the
    shared persistent cache, so this costs seconds when warm."""
    import importlib.util as _ilu

    _spec = _ilu.spec_from_file_location(
        "tdvp_fused_probe",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "tools",
            "tdvp_fused_probe.py",
        ),
    )
    _probe_mod = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_probe_mod)
    # the probe prints progress with plain print(): keep stdout clean
    # for the one-JSON-line driver contract
    import contextlib

    with contextlib.redirect_stdout(sys.stderr):
        out = _probe_mod.run_probes(reps=5)
    out["status"] = "ok"
    B.s["solver_tpu"] = out


def _leg_solver_r64(B: _Bench):
    """Solver family at MXU-relevant rank (r=64): fused ALS solve +
    eigsh sweep on the screened-Poisson QTT system, slope-timed, with
    achieved GFLOP/s and a NumPy-f64 reference ALS at the SAME config
    so the speedup is apples-to-apples (VERDICT r4 item 2)."""
    import importlib.util as _ilu

    _spec = _ilu.spec_from_file_location(
        "solver_r64_probe",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "tools",
            "solver_r64_probe.py",
        ),
    )
    _probe_mod = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_probe_mod)
    import contextlib

    with contextlib.redirect_stdout(sys.stderr):
        out = _probe_mod.run_probes(
            budget_s=max(60.0, min(B.remaining() - 30.0, 420.0))
        )
    out["status"] = "ok"
    B.s["solver_tpu_r64"] = out


def _leg_cross_device(B: _Bench):
    """Cross with a device-resident network target: every fiber matrix
    evaluates on the TPU.  The compensated (dw) evaluation path keeps
    the on-chip fibers at ~f64 fidelity (VERDICT r4 item 5)."""
    import jax.numpy as jnp

    from tensor_networks_tpu import Index, TensorNetwork
    from tensor_networks_tpu.cross import (
        ConvergenceCheck,
        CrossApproximation,
        CrossConfig,
        FuncTensorNetwork,
    )

    rng_c = np.random.default_rng(11)
    dt_, nt_, rt_ = 8, 32, 24
    t_inds = [Index(f"t{k}", nt_) for k in range(dt_)]
    target = TensorNetwork.rand_tt(t_inds, [rt_] * (dt_ - 1))
    for node in list(target.network.nodes):
        v = target.value(node)
        target.node_tensor(node).update_val_size(
            jnp.asarray(np.asarray(v) / np.sqrt(rt_), jnp.float32)
        )
    # round-5 fiber precision: the cross samples its fiber matrices
    # through the double-word device evaluation (~1e-13 relative on
    # f32 cores) — with f32 fibers the whole approximation had a ~1e-6
    # error floor (BENCH r04: 4.9e-6)
    dfunc = FuncTensorNetwork(t_inds, target, precision="dw")
    for bexp in range(3, 14):  # prewarm pow2 evaluate buckets (dw)
        target.evaluate(
            t_inds, rng_c.integers(0, nt_, size=(2**bexp, dt_)),
            precision="dw",
        )
    cnet = TensorNetwork.rand_tt(t_inds, [1] * (dt_ - 1))
    tic = time.perf_counter()
    # max_iters=8 (not 6): convergence on this flat-spectrum target
    # happens only at full rank, and a bad fresh-pivot roll at rank 25
    # stalls the model at ~1.6e-7 — the extra sweeps oversample the
    # pivot basis past the roll (measured: a stalled seed recovers to
    # 4e-15 with the larger budget; the early-exit on err<=eps keeps
    # lucky rolls from paying for it)
    cres = CrossApproximation(
        dfunc,
        CrossConfig(
            kickrank=4,
            convergence=ConvergenceCheck.VALID_ERROR,
            validation_size=2000,
            max_iters=8,
        ),
    ).cross(cnet, eps=1e-8)
    B.s["cdev_wall"] = time.perf_counter() - tic
    grid_c = rng_c.integers(0, nt_, size=(4096, dt_))
    # dw-measured approximation error (the honest model error: both
    # sides sampled at ~1e-13) and the plain-f32 end-to-end error a
    # default evaluate call would see
    got_dw = np.asarray(
        cres.net.evaluate(t_inds, grid_c, precision="dw")
    )
    real_dw = np.asarray(
        target.evaluate(t_inds, grid_c, precision="dw")
    )
    B.s["cdev_err_dw"] = float(
        np.linalg.norm(got_dw - real_dw) / np.linalg.norm(real_dw)
    )
    got_c = np.asarray(cres.net.evaluate(t_inds, grid_c))
    B.s["cdev_err"] = float(
        np.linalg.norm(got_c - real_dw) / np.linalg.norm(real_dw)
    )
    B.s["cdev_calls"] = dfunc.num_calls()
    print(
        f"[bench] cross device-target d=8 n=32 r=24 (dw fibers): "
        f"{B.s['cdev_wall']:.1f} s, rel err dw "
        f"{B.s['cdev_err_dw']:.1e} / f32-eval {B.s['cdev_err']:.1e}, "
        f"{B.s['cdev_calls']} unique device evals",
        file=sys.stderr,
    )


def _leg_bfs8(B: _Bench):
    """Device-vs-host search scoring: d=8 n=6 root level, 127
    bipartition SVDs through the REAL bfs driver — ONE device/host
    pair (the round-3 five-run protocol was the single biggest budget
    sink for a secondary metric; VERDICT r4 weak #4)."""
    import jax.numpy as jnp

    from tensor_networks_tpu import Index, Tensor, TensorNetwork
    from tensor_networks_tpu.search import SearchConfig
    from tensor_networks_tpu.search.drivers import run_bfs

    def _bfs8(mode: str):
        # "batched": shape-grouped batched device SVDs.
        # "host": per-action SVDs FORCED to host LAPACK by raising the
        #   routing threshold above the tensor size (without this the
        #   "host" leg silently ran on device — the round-3
        #   bench-anomaly finding, VALIDATION.md).
        rng8 = np.random.default_rng(0)
        val = rng8.standard_normal([6] * 8).astype(np.float32)
        net8 = TensorNetwork()
        net8.add_node(
            "G",
            Tensor(
                jnp.asarray(val) if mode == "batched" else val,
                [Index(f"i{k}", 6) for k in range(8)],
            ),
        )
        c8 = SearchConfig()
        c8.engine.eps = 0.5
        c8.engine.max_ops = 1
        saved = {
            k: os.environ.get(k)
            for k in ("TNT_SEARCH_DEVICE", "TNT_DEVICE_SVD_MIN")
        }
        os.environ["TNT_SEARCH_DEVICE"] = (
            "1" if mode == "batched" else "0"
        )
        if mode == "host":
            os.environ["TNT_DEVICE_SVD_MIN"] = str(1 << 40)
        try:
            tic = time.perf_counter()
            stats8, best8, _ = run_bfs(net8, c8)
            return time.perf_counter() - tic, stats8["count"]
        finally:
            for k, old in saved.items():
                if old is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = old

    _bfs8("batched")  # warm the device executables before timing
    B.s["sdev_wall"], B.s["sdev_count"] = _bfs8("batched")
    B.s["shost_wall"], B.s["shost_count"] = _bfs8("host")
    print(
        f"[bench] bfs d=8 n=6 root scoring: device-batched "
        f"{B.s['sdev_wall']:.1f} s vs host-LAPACK "
        f"{B.s['shost_wall']:.1f} s (counts "
        f"{B.s['sdev_count']}/{B.s['shost_count']})",
        file=sys.stderr,
    )


def _leg_solver_cpu(B: _Bench):
    """CPU f64 subprocess: the 2^30 QTT linear solve and the 32^3 DMRG
    ground state are f64 accuracy demonstrations; a child process
    keeps them off the relay and x64-clean."""
    child_src = (
        "import jax, json, time\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import warnings; warnings.filterwarnings('ignore')\n"
        "from tensor_networks_tpu.ops import packed as pk\n"
        "from tensor_networks_tpu.ops.als import als_solve\n"
        "from tensor_networks_tpu.ops.eigen import als_eigsh\n"
        "from tensor_networks_tpu.ops.qtt import (\n"
        "    qtt_exponential, qtt_exponential_nd,\n"
        "    qtt_screened_laplacian, qtt_screened_laplacian_nd)\n"
        "out = {}\n"
        "op = qtt_screened_laplacian(30, delta=1.0)\n"
        "rhs = qtt_exponential(30, c=3.0)\n"
        "t0 = time.time()\n"
        "x, res, _ = als_solve(op, rhs, pk.pad_rank(rhs, 8),\n"
        "                      sweeps=2, tol=1e-12)\n"
        "out['als_2pow30_wall_s'] = round(time.time() - t0, 2)\n"
        "out['als_2pow30_rel_resid'] = float(\n"
        "    f\"{res / float(pk.norm_exact(rhs)):.2e}\")\n"
        "op3 = qtt_screened_laplacian_nd(5, 3, delta=1.0)\n"
        "x0 = pk.pad_rank(qtt_exponential_nd(5, (1.0, 2.0, 3.0)), 8)\n"
        "t0 = time.time()\n"
        "x3, lam, _ = als_eigsh(op3, x0, sweeps=8)\n"
        "out['eigsh_32cubed_wall_s'] = round(time.time() - t0, 2)\n"
        "import numpy as _np\n"
        "N = 32\n"
        "l1 = 2 - 2 * _np.cos(_np.pi / (N + 1))\n"
        "out['eigsh_32cubed_err'] = float(\n"
        "    f\"{abs(lam - (1.0 + 3 * l1)):.2e}\")\n"
        # two-site TDVP: rank-adaptive trajectory, solve-free; error
        # vs the analytic spectral solution of the heat equation
        "from tensor_networks_tpu.ops.evolve import evolve_tdvp2\n"
        "from tensor_networks_tpu.ops.qtt import qtt_tridiagonal\n"
        "K = 12; n = 2 ** K; T = 0.2; steps = 10\n"
        "A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)\n"
        "u0 = qtt_exponential(K, c=3.0)\n"
        "t0 = time.time()\n"
        "u, _, rks = evolve_tdvp2(A, u0, T / steps, steps,\n"
        "                         max_rank=12, eps=1e-8)\n"
        "out['tdvp2_2pow12_wall_s'] = round(time.time() - t0, 2)\n"
        "cs = ([_np.asarray(u.first)[None]]\n"
        "      + [_np.asarray(u.mids[i]) for i in range(K - 2)]\n"
        "      + [_np.asarray(u.last)[..., None]])\n"
        "v = cs[0]\n"
        "for c in cs[1:]:\n"
        "    v = _np.einsum('...r,rjs->...js', v, c)\n"
        "got = _np.zeros(n)\n"
        "for pos in range(n):\n"
        "    rem, lin = pos, 0\n"
        "    for b in range(K):\n"
        "        lin |= (rem % 2) << (K - 1 - b); rem //= 2\n"
        "    got[lin] = v.reshape(-1)[pos]\n"
        "ii = _np.arange(1, n + 1)\n"
        "V = _np.sqrt(2.0 / (n + 1)) * _np.sin(\n"
        "    _np.outer(ii, ii) * _np.pi / (n + 1))\n"
        "lams = 2 - 2 * _np.cos(ii * _np.pi / (n + 1))\n"
        "w0 = _np.exp(-3.0 * _np.arange(n) / n)\n"
        "ref = V @ (_np.exp(-lams * T) * (V @ w0))\n"
        "out['tdvp2_2pow12_rel_err'] = float(\n"
        "    f\"{_np.linalg.norm(got - ref) / _np.linalg.norm(ref):.2e}\")\n"
        "out['tdvp2_2pow12_max_rank_seen'] = int(max(rks))\n"
        "print('SOLVER_JSON ' + json.dumps(out))\n"
    )
    import subprocess

    # the parent exports TNT_ENABLE_X64=0 for the TPU program; the
    # child is a CPU f64 accuracy demonstration — re-enable x64 or
    # every "f64" number below silently truncates to f32
    child_env = dict(os.environ)
    child_env["TNT_ENABLE_X64"] = "1"
    child_timeout = max(60.0, min(B.remaining() - 20.0, 420.0))
    proc = subprocess.run(
        [sys.executable, "-c", child_src],
        capture_output=True, text=True, timeout=child_timeout,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        env=child_env,
    )
    solver_cpu = {"status": "failed"}
    for line in proc.stdout.splitlines():
        if line.startswith("SOLVER_JSON "):
            solver_cpu = json.loads(line[len("SOLVER_JSON "):])
            solver_cpu["status"] = "ok"
    B.s["solver_cpu"] = solver_cpu
    print(
        f"[bench] solver family (cpu f64): {solver_cpu}", file=sys.stderr
    )


def _leg_roofline(B: _Bench):
    """Achieved bytes/s and FLOP/s for the headline kernels against the
    v5e HBM / MXU roofs (VERDICT r4 item 4).  FLOP/byte counts are
    derived from the algorithm shapes, not measured; each entry names
    its formula so regressions are attributable."""
    rl = {}
    hbm = HBM_ROOF_GBS * 1e9
    mxu = MXU_BF16_TFLOPS * 1e12

    # inner product: per mid-core two rank-r GEMMs (carry @ core,
    # core^T @ partial) = 4 n r^3 flops; bytes = both trains once.
    inner_flops = 4.0 * D * N * R**3
    inner_bytes = 2 * (D * R * N * R) * 4.0
    for key, label in (
        ("t_inner", "inner_best"),
        ("t_inner_b3", "inner_bf16x3"),
    ):
        t = B.get(key)
        if t == t:
            rl[label] = {
                "ms": round(t * 1e3, 3),
                "gflops": round(inner_flops / t / 1e9, 1),
                "gbs": round(inner_bytes / t / 1e9, 1),
                "hbm_pct": round(100 * inner_bytes / t / hbm, 1),
                "mxu_bf16_pct": round(100 * inner_flops / t / mxu, 1),
                "flops_formula": "4*d*n*r^3",
                "bytes_formula": "2 trains read once",
            }

    # rounding (Householder svd sweep): the existing QR+SVD+GEMM
    # estimate; bytes = train read+written twice (bwd orth + fwd trunc)
    t = B.get("t_round_svd")
    rf = B.get("round_flops_est")
    round_bytes = 4 * (D * R * N * R) * 4.0
    if t == t and rf == rf:
        rl["round_svd"] = {
            "ms": round(t * 1e3, 2),
            "gflops": round(rf / t / 1e9, 1),
            "gbs": round(round_bytes / t / 1e9, 1),
            "hbm_pct": round(100 * round_bytes / t / hbm, 1),
            "mxu_bf16_pct": round(100 * rf / t / mxu, 1),
            "flops_formula": "d*(2nr^3 QR + 8nr^3 SVD est + 4nr^3 GEMM)",
            "bytes_formula": "train r/w twice (bwd+fwd sweeps)",
        }

    # prefix-dw sweep: measured component budget (VALIDATION r4): the
    # dw Gram chain is ~6x-bf16 work on 2 n r^3-class GEMMs per core
    # per direction plus batched panel factorizations; the chain FLOP
    # count (hi/lo split products) is 3 passes * 2 dirs * 2 n r^3.
    t = B.get("t_round_dw")
    if t == t:
        dw_flops = 3 * 2 * 2.0 * D * N * R**3
        rl["round_prefix_dw"] = {
            "ms": round(t * 1e3, 2),
            "gflops": round(dw_flops / t / 1e9, 1),
            "gbs": round(round_bytes / t / 1e9, 1),
            "hbm_pct": round(100 * round_bytes / t / hbm, 1),
            "mxu_bf16_pct": round(100 * dw_flops / t / mxu, 1),
            "flops_formula": "12*d*n*r^3 (3-pass dw chain, 2 dirs)",
            "bytes_formula": "train r/w twice",
        }

    # ragged evaluate (f32): per point per mid-step one (1,r)@(r,r)
    # GEMV = 2 r^2 flops.  Bytes: the segment-sorted kernel reads each
    # group's (r,r) slice ONCE per group (not per point), so traffic
    # is the point-vector stream (read+write per step) plus one pass
    # over the mid-core stack — counting slices per point gave a
    # >100%-of-roof absurdity.
    t = B.get("t_eval_ragged_f32")
    n_pts = B.get("n_pts", 0)
    if t == t and n_pts:
        ev_flops = 2.0 * n_pts * (D - 2) * R * R
        ev_bytes = (
            n_pts * (D - 2) * R * 8.0  # carry read + write per step
            + (D - 2) * N * R * R * 4.0  # mid stack, one pass
        )
        rl["evaluate_ragged_f32"] = {
            "ms": round(t * 1e3, 2),
            "gflops": round(ev_flops / t / 1e9, 1),
            "gbs": round(ev_bytes / t / 1e9, 1),
            "hbm_pct": round(100 * ev_bytes / t / hbm, 1),
            "mxu_bf16_pct": round(100 * ev_flops / t / mxu, 1),
            "flops_formula": "2*npts*(d-2)*r^2",
            "bytes_formula": "carry stream r/w + one mid-stack pass",
        }
    B.s["roofline"] = rl
    print(f"[bench] roofline: {json.dumps(rl)}", file=sys.stderr)


# -------------------------------- main --------------------------------


def main():
    # ~11 min of the budget is a FIXED per-process cost: the Mosaic
    # (pallas) probe programs do not replay from the persistent cache,
    # so the inner/evaluate legs recompile them every run.  1500 s
    # covers the full leg chain warm; if the driver's own timeout is
    # tighter, the SIGTERM handler still emits everything measured.
    budget = float(os.environ.get("TNT_BENCH_BUDGET", "1500"))
    B = _Bench(budget)

    # unwind-to-emission paths: the driver's `timeout` sends SIGTERM;
    # a wedged relay call is caught by the alarm a bit past the budget.
    def _on_signal(signum, frame):
        raise _Deadline(f"signal {signum}")

    try:
        signal.signal(signal.SIGTERM, _on_signal)
        signal.signal(signal.SIGALRM, _on_signal)
        signal.alarm(int(budget + 120))
    except (ValueError, OSError) as exc:
        print(f"[bench] signal setup failed: {exc}", file=sys.stderr)

    if not _backend_reachable_retry():
        _emit_unreachable()
        return

    try:
        _run_legs(B)
    except _Deadline as exc:
        print(
            f"[bench] deadline hit ({exc}) — emitting partial record",
            file=sys.stderr,
        )
    except Exception as exc:
        print(
            f"[bench] fatal leg chain error: {exc} — emitting partial",
            file=sys.stderr,
        )
    finally:
        signal.alarm(0)
        B.emit()


def _run_legs(B: _Bench):
    import jax

    # persistent compilation cache: remote compiles through the relay
    # cost 20-700 s; the cache survives processes AND rounds (verified:
    # a 37 s SVD compile replays in 3 s from a fresh process)
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as exc:
        print(f"[bench] compile cache unavailable: {exc}", file=sys.stderr)

    import jax.numpy as jnp

    dev = jax.devices()[0]
    B.s["device"] = str(dev)
    print(f"[bench] device: {dev}", file=sys.stderr)

    a_np = make_cores(0, np.float64)
    b_np = make_cores(1, np.float64)
    B.s["a_np"] = a_np
    B.s["b_np"] = b_np

    dtype = jnp.float32 if DTYPE == "float32" else jnp.float64
    B.s["dtype"] = dtype
    B.s["a_dev"] = tuple(
        jax.device_put(jnp.asarray(x, dtype)) for x in a_np
    )
    B.s["on_tpu"] = jax.default_backend() == "tpu"

    from tensor_networks_tpu.kernels.pallas_ops import pad_bond

    B.s["a_mids_padded"] = jax.device_put(pad_bond(B.s["a_dev"][1]))

    # ---- device timing protocol ----
    # This environment reaches the chip through a relay with ~25 ms
    # per-dispatch latency, so single-call wall times measure the
    # relay, not the kernel.  Each kernel is iterated K times inside
    # ONE XLA program (lax.scan with a data dependency per iteration)
    # and the per-iteration cost is the slope between two K values.
    def fetch(out):
        # under the relay, block_until_ready returns before execution
        # completes; a host fetch of the scalar is the only real barrier
        return float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])

    def timed_repeat(run, k1, k2):
        for k in (k1, k2):
            fetch(run(k))  # compile both
        t1 = _time(lambda: fetch(run(k1)), reps=4)
        t2 = _time(lambda: fetch(run(k2)), reps=4)
        return max((t2 - t1) / (k2 - k1), 1e-9)

    B.s["fetch"] = fetch
    B.s["timed_repeat"] = timed_repeat

    # ---- the leg chain: required headline first, optional legs in
    # decreasing (value / cost) order, expensive budget sinks last ----
    B.leg("numpy_refs", 40, _leg_numpy_refs, required=True)
    B.leg("inner", 90, _leg_inner, required=True)
    B.leg("chip_health", 5, _derive_chip_health)
    B.leg("round_family", 200, _leg_round_family, required=True)
    B.leg("evaluate", 150, _leg_evaluate)
    B.leg("ensemble", 90, _leg_ensemble)
    B.leg("roofline", 5, _leg_roofline)
    B.leg("cross_host", 30, _leg_cross_host)
    B.leg("search_small", 30, _leg_search_small)
    if B.s["on_tpu"]:
        B.leg("solver_tpu", 180, _leg_solver_tpu)
        B.leg("cross_device", 120, _leg_cross_device)
    B.leg("solver_cpu", 120, _leg_solver_cpu)
    if B.s["on_tpu"]:
        # a cache-miss compile of the r=64 solver programs runs tens
        # of minutes through the relay and cannot be preempted
        # in-process — if it blows the budget, the SIGALRM emission
        # still carries every earlier leg.  bfs8 (a secondary metric,
        # and the most expensive leg) goes last.
        B.leg("solver_r64", 150, _leg_solver_r64)
        B.leg("bfs8", 260, _leg_bfs8)
    # roofline may gain entries from later legs? no — inputs are all
    # earlier; re-run cheaply in case evaluate filled in after a retry
    if "roofline" not in B.s:
        B.leg("roofline_late", 5, _leg_roofline)


if __name__ == "__main__":
    main()
