"""On-chip probe: fused vs host-loop one-site TDVP dispatch cost.

Times one TDVP step of a K=22 QTT heat state (rank 8, f32) in both
forms on the real chip.  The host loop pays ~6*K relay dispatches per
step; the fused form is ONE program per step (or per trajectory).
Run through the serialized chip session only (single-client relay).
"""

import os
import sys
import time

os.environ.setdefault("TNT_ENABLE_X64", "0")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    # CLAUDE.md benchmarking protocol: numbers from a degraded relay
    # are meaningless — probe health FIRST, in a child process BEFORE
    # this process initializes the (single-client) relay backend
    import subprocess

    health = subprocess.run(
        ["timeout", "900", "python3",
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "chip_health.py")],
        capture_output=True, text=True,
    )
    tail = (health.stdout or health.stderr).strip().splitlines()
    print(f"[tdvp-probe] chip_health rc={health.returncode}: "
          f"{tail[-1] if tail else 'no output'}")
    if health.returncode != 0:
        # rc=124: backend init hung (relay UNREACHABLE) — proceeding
        # would wedge this process at jax.devices() too.  rc=1:
        # DEGRADED — CLAUDE.md protocol: timings are meaningless.
        print("[tdvp-probe] relay DEGRADED or unreachable — aborting "
              "(timings would be unreliable)")
        sys.exit(2)

    dev = jax.devices()[0]
    print(f"[tdvp-probe] device: {dev.device_kind}")
    run_probes()


def run_probes(reps: int = 10) -> dict:
    """Time the fused vs host-loop solver family on the current backend.

    Returns {tdvp_step_tpu_ms, tdvp_step_host_ms, tdvp2_step_tpu_ms,
    tdvp2_step_host_ms, als_sweep_tpu_ms, als_sweep_host_ms,
    eigsh_sweep_tpu_ms, eigsh_sweep_host_ms} — the bench embeds this
    dict as ``solver_tpu`` (VERDICT r3 missing #2).  Caller is
    responsible for chip-health gating.
    """
    out = {}
    from tensor_networks_tpu.ops import packed as pk
    from tensor_networks_tpu.ops.evolve import (
        _fused_operands,
        _tdvp_step_fused,
        evolve_tdvp,
    )
    from tensor_networks_tpu.ops.qtt import qtt_exponential, qtt_tridiagonal

    K, rank = 22, 8
    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    u0 = pk.pad_rank(qtt_exponential(K, c=3.0), rank)
    f32 = jnp.float32
    A = type(A)(*(x.astype(f32) for x in A))
    u0 = type(u0)(*(x.astype(f32) for x in u0))
    dt = 1e-4

    # fused: compile once, then time steady-state steps
    x0, X, xl, a0, Am, al = _fused_operands(A, u0)
    h = jnp.asarray(dt, f32)
    t0 = time.perf_counter()
    o = _tdvp_step_fused(x0, X, xl, a0, Am, al, h, 1024, 24)
    print(f"[tdvp-probe] fused first call (compile): "
          f"{time.perf_counter() - t0:.1f} s, norm {float(jnp.linalg.norm(o[0])):.6f}")
    t0 = time.perf_counter()
    c = (x0, X, xl)
    for _ in range(reps):
        c = _tdvp_step_fused(c[0], c[1], c[2], a0, Am, al, h, 1024, 24)
    barrier = float(jnp.linalg.norm(c[0]))  # host fetch = the only real sync
    t_fused = (time.perf_counter() - t0) / reps
    out["tdvp_step_tpu_ms"] = round(t_fused * 1e3, 2)
    print(f"[tdvp-probe] fused step: {t_fused * 1e3:.1f} ms "
          f"(norm {barrier:.6f})")

    # host loop, same shapes (2 steps is enough to time the dispatches)
    t0 = time.perf_counter()
    _, norms = evolve_tdvp(A, u0, dt, 1, fused=False)
    print(f"[tdvp-probe] host-loop first step (incl. compiles): "
          f"{time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    _, norms = evolve_tdvp(A, u0, dt, 2, fused=False)
    t_host = (time.perf_counter() - t0) / 2
    out["tdvp_step_host_ms"] = round(t_host * 1e3, 2)
    print(f"[tdvp-probe] host-loop step: {t_host * 1e3:.1f} ms "
          f"(norm {norms[-1]:.6f})")
    print(f"[tdvp-probe] fused speedup: {t_host / t_fused:.1f}x")

    # two-site (rank-adaptive) pair: K is smaller — the merged-pair
    # exponential works on r*n x n*r blocks, a heavier step by design
    from tensor_networks_tpu.ops.evolve import evolve_tdvp2

    from tensor_networks_tpu.ops.evolve import _tdvp2_step_fused

    K2 = 16
    A2 = qtt_tridiagonal(K2, 2.0, -1.0, -1.0)
    A2 = type(A2)(*(x.astype(f32) for x in A2))
    u2 = pk.pad_rank(qtt_exponential(K2, c=3.0), rank)
    u2 = type(u2)(*(x.astype(f32) for x in u2))
    ej = jnp.asarray(1e-6, f32)
    x0, X, xl, a0, Am, al = _fused_operands(A2, u2)
    t0 = time.perf_counter()
    o = _tdvp2_step_fused(x0, X, xl, a0, Am, al, h, ej, 1024, 24, rank)
    print(f"[tdvp2-probe] fused first call (compile): "
          f"{time.perf_counter() - t0:.1f} s, "
          f"norm {float(jnp.linalg.norm(o[0])):.6f}")
    t0 = time.perf_counter()
    c = (x0, X, xl)
    for _ in range(reps):
        c = _tdvp2_step_fused(
            c[0], c[1], c[2], a0, Am, al, h, ej, 1024, 24, rank
        )[:3]
    barrier = float(jnp.linalg.norm(c[0]))
    t2_fused = (time.perf_counter() - t0) / reps
    out["tdvp2_step_tpu_ms"] = round(t2_fused * 1e3, 2)
    print(f"[tdvp2-probe] fused step: {t2_fused * 1e3:.1f} ms "
          f"(norm {barrier:.6f})")
    t0 = time.perf_counter()
    _, n1, _ = evolve_tdvp2(
        A2, u2, dt, 1, max_rank=rank, eps=1e-6, fused=False,
        dense_limit=1024, krylov=24,
    )
    print(f"[tdvp2-probe] host-loop first step (incl. compiles): "
          f"{time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    _, n2, rk = evolve_tdvp2(
        A2, u2, dt, 2, max_rank=rank, eps=1e-6, fused=False,
        dense_limit=1024, krylov=24,
    )
    t2_host = (time.perf_counter() - t0) / 2
    out["tdvp2_step_host_ms"] = round(t2_host * 1e3, 2)
    print(f"[tdvp2-probe] host-loop step: {t2_host * 1e3:.1f} ms "
          f"(norm {n2[-1]:.6f}, ranks {rk}); "
          f"fused speedup {t2_host / t2_fused:.1f}x")

    # same pair for the ALS sweep (the theta-stepping workhorse).
    # The fused path runs the WHOLE sweep loop as one program (one
    # dispatch + one fetch per solve), so the honest per-sweep number
    # is the SLOPE between two sweep budgets inside one compile bucket
    # (cap=16 covers sweeps 9..16); tol=-1 disables the on-device
    # early stop (tol=0 can trigger on bit-identical f32 iterates).
    # The host loop keeps wall/2 — its per-sweep dispatches ARE its
    # production cost.
    from tensor_networks_tpu.ops.als import als_solve

    s_lo, s_hi = 9, 16

    def _slope(fn):
        fn(s_lo)  # compile (cap=16 program)
        t_lo = min(_wall(lambda: fn(s_lo)) for _ in range(3))
        t_hi = min(_wall(lambda: fn(s_hi)) for _ in range(3))
        return (t_hi - t_lo) / (s_hi - s_lo), t_lo

    def _wall(f):
        t0 = time.perf_counter()
        f()
        return time.perf_counter() - t0

    b = pk.pad_rank(qtt_exponential(K, c=-1.0), rank)
    b = type(b)(*(x.astype(f32) for x in b))

    def _als(sw):
        _, res, _ = als_solve(
            A, b, u0, sweeps=sw, tol=-1.0, spd=True, fused=True
        )
        return res

    per, t_lo = _slope(_als)
    out["als_sweep_tpu_ms"] = round(per * 1e3, 2)
    print(f"[als-probe] fused sweep: {per * 1e3:.1f} ms slope "
          f"(solve@{s_lo} {t_lo * 1e3:.0f} ms, res {_als(s_lo):.3e})")

    t0 = time.perf_counter()
    _, res, _ = als_solve(
        A, b, u0, sweeps=1, tol=0.0, spd=True, fused=False
    )
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, res, _ = als_solve(
        A, b, u0, sweeps=2, tol=0.0, spd=True, fused=False
    )
    t_sweep = (time.perf_counter() - t0) / 2
    out["als_sweep_host_ms"] = round(t_sweep * 1e3, 2)
    print(f"[als-probe] host-loop sweep: {t_sweep * 1e3:.1f} ms "
          f"(first {t_first:.1f} s, res {res:.3e})")

    # DMRG eigensolver sweep on the same generator
    from tensor_networks_tpu.ops.eigen import als_eigsh

    def _eig(sw):
        _, lam, _ = als_eigsh(A, u0, sweeps=sw, tol=-1.0, fused=True)
        return lam

    per, t_lo = _slope(_eig)
    out["eigsh_sweep_tpu_ms"] = round(per * 1e3, 2)
    print(f"[eigsh-probe] fused sweep: {per * 1e3:.1f} ms slope "
          f"(solve@{s_lo} {t_lo * 1e3:.0f} ms, lam {_eig(s_lo):.6e})")

    t0 = time.perf_counter()
    _, lam, _ = als_eigsh(A, u0, sweeps=1, tol=0.0, fused=False)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, lam, _ = als_eigsh(A, u0, sweeps=2, tol=0.0, fused=False)
    t_sweep = (time.perf_counter() - t0) / 2
    out["eigsh_sweep_host_ms"] = round(t_sweep * 1e3, 2)
    print(f"[eigsh-probe] host-loop sweep: {t_sweep * 1e3:.1f} ms "
          f"(first {t_first:.1f} s, lam {lam:.6e})")


    return out


if __name__ == "__main__":
    main()
