"""Reproducer + bisect harness for the rank-deficient rounding NaN.

Round-2 finding (VALIDATION.md): on a rank-deficient f32 train (r=200
doubled TT, d=50 n=32), SOME fresh-process compilations of the
cholqr2/twosided sweeps return NaN while others run the byte-identical
program over bit-identical inputs clean — evidence of a
nondeterministic TPU compile, with a call-site Householder fallback
keeping library behavior correct.  This tool turns that process-level
evidence into a controlled experiment:

* ``trial`` mode: ONE fresh process, builds deterministic inputs,
  runs ONE program variant, prints a machine-parseable verdict line.
* ``drive`` mode: runs N serialized trial subprocesses per
  (variant, xla-flag-set) cell — the relay is single-client, so trials
  never overlap — and tabulates NaN rates.  A variant that never NaNs
  while the full sweep does localizes the miscompiled stage; a flag
  set that suppresses the NaN identifies the responsible pass.

Variants (each is a standalone jitted program over the same inputs):
  back      backward CholeskyQR2 chain only
  fwd       forward CholeskyQR2 chain on the raw (unorthogonalized) cores
  back+fwd  both chains, no truncation stage
  twosided  the full twosided sweep (ops/fast.py)
  cholqr2   the full cholqr2 sweep
  prefix    the GEMM-only prefix sweep (control: no cholesky in chains)

Usage:
  python3 tools/nan_repro.py trial twosided
  python3 tools/nan_repro.py drive --trials 6 --variants twosided,back
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TNT_ENABLE_X64", "0")

# Flag sets for the bisect: name -> XLA_FLAGS value ("" = baseline).
FLAG_SETS = {
    "baseline": "",
    "no_fusion": "--xla_disable_hlo_passes=fusion",
    "opt1": "--xla_backend_optimization_level=1",
}

D, N, R_BASE = 50, 32, 100


def _inputs():
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(42)
    r = R_BASE
    first = rng.standard_normal((N, r)) / np.sqrt(N)
    mids = rng.standard_normal((D - 2, r, N, r)) / np.sqrt(N * r)
    last = rng.standard_normal((r, N)) / np.sqrt(N)
    # double every bond: block structure [A 0; 0 A] represents a + a —
    # exactly 2x rank-deficient at every bond, the observed trigger class
    first2 = np.concatenate([first, first], axis=1)
    mids2 = np.zeros((D - 2, 2 * r, N, 2 * r))
    mids2[:, :r, :, :r] = mids
    mids2[:, r:, :, r:] = mids
    last2 = np.concatenate([last, last], axis=0) * 0.5
    return (
        jnp.asarray(first2, jnp.float32),
        jnp.asarray(mids2, jnp.float32),
        jnp.asarray(last2, jnp.float32),
    )


def _chain_only(which: str):
    """Standalone jitted programs for the chain stages (mirrors the
    chol2_rows structure in ops/fast.py twosided/cholqr2 sweeps)."""
    import jax
    import jax.numpy as jnp

    def chol_rows(mat):
        g = jnp.matmul(mat, mat.T, precision="highest")
        jitter = (
            jnp.trace(g) / g.shape[0] + jnp.asarray(1e-30, mat.dtype)
        ) * (20.0 * jnp.finfo(mat.dtype).eps)
        l1 = jnp.linalg.cholesky(
            g + jitter * jnp.eye(g.shape[0], dtype=g.dtype)
        )
        q = jax.scipy.linalg.solve_triangular(l1, mat, lower=True)
        return l1, q

    def chol2_rows(mat):
        l1, q1 = chol_rows(mat)
        l2, q2 = chol_rows(q1)
        return l1 @ l2, q2

    def back_chain(first, mids, last):
        carry, last_q = chol2_rows(last)

        def back_step(carry, core):
            rr, n, rc = core.shape
            cur = jnp.einsum(
                "rnk,kc->rnc", core, carry, precision="highest"
            )
            l_tot, q = chol2_rows(cur.reshape(rr, n * rc))
            return l_tot, q.reshape(rr, n, rc)

        carry, mids_q = jax.lax.scan(back_step, carry, mids, reverse=True)
        return carry, mids_q, last_q, first @ carry

    def fwd_chain(first_c, mids_q):
        lt1, u1t = chol2_rows(first_c.T)

        def fwd_step(l_prev, core):
            rr, n, rc = core.shape
            cur = jnp.einsum(
                "ak,knc->anc", l_prev, core, precision="highest"
            )
            lt, qt = chol2_rows(cur.reshape(rr * n, rc).T)
            return lt.T, (qt.T.reshape(rr, n, rc), lt.T)

        l_end, (u_mids, l_mids) = jax.lax.scan(fwd_step, lt1.T, mids_q)
        return u1t.T, u_mids, l_mids, l_end

    if which == "back":

        @jax.jit
        def prog(first, mids, last):
            carry, mids_q, last_q, first_c = back_chain(first, mids, last)
            return (
                jnp.sum(carry) + jnp.sum(mids_q) + jnp.sum(last_q)
                + jnp.sum(first_c)
            )

        return prog

    if which == "fwd":

        @jax.jit
        def prog(first, mids, last):
            u1, u_mids, l_mids, l_end = fwd_chain(first, mids)
            return (
                jnp.sum(u1) + jnp.sum(u_mids) + jnp.sum(l_mids)
                + jnp.sum(l_end)
            )

        return prog

    if which == "back+fwd":

        @jax.jit
        def prog(first, mids, last):
            carry, mids_q, last_q, first_c = back_chain(first, mids, last)
            u1, u_mids, l_mids, l_end = fwd_chain(first_c, mids_q)
            return (
                jnp.sum(u1) + jnp.sum(u_mids) + jnp.sum(l_mids)
                + jnp.sum(l_end) + jnp.sum(last_q)
            )

        return prog

    raise ValueError(which)


def run_trial(variant: str) -> int:
    import jax
    import numpy as np

    dev = jax.devices()[0]
    first, mids, last = _inputs()

    if variant in ("twosided", "cholqr2", "prefix"):
        from tensor_networks_tpu.ops.fast import (
            _tt_round_cholqr2_sweep_fn,
            _tt_round_prefix_sweep_fn,
            _tt_round_twosided_sweep_fn,
        )

        fn = {
            "twosided": _tt_round_twosided_sweep_fn,
            "cholqr2": _tt_round_cholqr2_sweep_fn,
            "prefix": _tt_round_prefix_sweep_fn,
        }[variant](True)
        f, m, l, k0, ks = fn(first, mids, last, 1e-3)
        ks_np = np.asarray(ks)
        total = float(
            np.sum(np.asarray(f))
            + np.sum(np.asarray(m))
            + np.sum(np.asarray(l))
        )
        nan = total != total
        print(
            f"RESULT variant={variant} device={dev} "
            f"status={'NAN' if nan else 'OK'} k0={int(k0)} "
            f"ks0={int(ks_np[0])} checksum={total:.6e}",
            flush=True,
        )
        return 2 if nan else 0

    prog = _chain_only(variant)
    total = float(prog(first, mids, last))
    nan = total != total
    print(
        f"RESULT variant={variant} device={dev} "
        f"status={'NAN' if nan else 'OK'} checksum={total:.6e}",
        flush=True,
    )
    return 2 if nan else 0


def drive(trials: int, variants, flag_sets) -> None:
    results = {}
    for fname in flag_sets:
        flags = FLAG_SETS[fname]
        for variant in variants:
            key = (fname, variant)
            results[key] = []
            for t in range(trials):
                env = dict(os.environ)
                if flags:
                    env["XLA_FLAGS"] = (
                        env.get("XLA_FLAGS", "") + " " + flags
                    ).strip()
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "trial",
                     variant],
                    capture_output=True,
                    text=True,
                    env=env,
                    timeout=900,
                )
                line = [
                    ln
                    for ln in proc.stdout.splitlines()
                    if ln.startswith("RESULT")
                ]
                verdict = line[-1] if line else f"CRASH rc={proc.returncode}"
                results[key].append(verdict)
                print(f"[{fname}/{variant} #{t}] {verdict}", flush=True)
                if not line:
                    sys.stderr.write(proc.stderr[-2000:] + "\n")

    print("\n==== summary ====")
    for (fname, variant), rows in results.items():
        nans = sum("status=NAN" in r for r in rows)
        crashes = sum(r.startswith("CRASH") for r in rows)
        print(
            f"{fname:10s} {variant:10s}: {nans}/{len(rows)} NaN, "
            f"{crashes} crashes"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["trial", "drive"])
    ap.add_argument("variant", nargs="?", default="twosided")
    ap.add_argument("--trials", type=int, default=6)
    ap.add_argument(
        "--variants", default="twosided,back,back+fwd,prefix"
    )
    ap.add_argument("--flags", default="baseline")
    args = ap.parse_args()

    if args.mode == "trial":
        sys.exit(run_trial(args.variant))
    drive(
        args.trials,
        args.variants.split(","),
        args.flags.split(","),
    )


if __name__ == "__main__":
    main()
