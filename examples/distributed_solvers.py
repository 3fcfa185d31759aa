"""The distributed solver family on one virtual 8-device mesh.

Every solver in the package runs TRAIN-SHARDED: the iterate, the
operators, and every environment chain live split along the mesh's
``model`` axis (core block k on device k — pipeline placement), so the
per-chip working set scales as ``1/P`` and trains too big for one
chip's HBM become solvable.  The carries that hop between neighbors
over ICI are bond-sized (``(r, s, r)`` operator environments, ``(r,
r)`` bond factors) — tiny next to the blocks they summarize.

This script walks the whole family on one screened-Poisson /
heat-equation setup (K binary modes, 2^K unknowns):

1. linear solve            — ``als_solve_sharded``
2. adaptive linear solve   — ``als_solve_adaptive_sharded`` (AMEn
   rank growth, every piece distributed)
3. ground + excited states — ``als_eigsh_k_sharded`` (compile-once
   deflation slots)
4. generalized eigenpair   — ``als_eigsh_sharded(mass=...)`` (FEM pair)
5. time integration        — ``evolve_theta_sharded`` (Crank-Nicolson
   with mass + source) and ``evolve_tdvp_sharded`` (projector
   splitting)

Each step cross-checks against the fused single-device solver or an
analytic oracle.  Runs on CPU with 8 virtual devices — the same
``jax.sharding.Mesh`` code drives real multi-chip TPU topologies.

No reference counterpart: ``pytens``'s only solver is a
single-process GMRES (``pytens/algs.py:2700``).

Run:
    python3 examples/distributed_solvers.py [K]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
from jax.sharding import Mesh

from tensor_networks_tpu.ops import packed as pk
from tensor_networks_tpu.ops.qtt import (
    qtt_exponential,
    qtt_screened_laplacian,
    qtt_tridiagonal,
)
from tensor_networks_tpu.parallel import (
    als_eigsh_k_sharded,
    als_eigsh_sharded,
    als_solve_adaptive_sharded,
    als_solve_sharded,
    evolve_tdvp_sharded,
    evolve_theta_sharded,
)


def main(K: int = 10) -> None:
    assert (K - 2) % 8 == 0, "K - 2 middle cores must split over 8 devices"
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("model",))
    print(f"mesh: {mesh}  |  2^{K} = {2**K} unknowns")

    op = qtt_screened_laplacian(K, delta=1.0)
    rhs = qtt_exponential(K, c=3.0)
    bn = float(pk.norm_exact(rhs))

    # 1. linear solve at fixed rank
    t0 = time.perf_counter()
    x, res, _ = als_solve_sharded(
        mesh, op, rhs, pk.pad_rank(rhs, 6), sweeps=4, spd=True
    )
    print(
        f"[1] als_solve_sharded      rel res {res / bn:.2e}  "
        f"({time.perf_counter() - t0:.1f} s, rank {x.rank}, "
        f"mids on {len(x.mids.sharding.device_set)} devices)"
    )

    # 2. adaptive: grow ranks until 1e-10, AMEn kicks distributed
    t0 = time.perf_counter()
    xa, res_a, _ = als_solve_adaptive_sharded(
        mesh, op, rhs, eps=1e-10, rank=2, max_rank=16, spd=True
    )
    print(
        f"[2] adaptive (AMEn)        rel res {res_a / bn:.2e}  "
        f"final rank {xa.rank}  ({time.perf_counter() - t0:.1f} s)"
    )

    # 3. three lowest eigenpairs of the 1D screened Laplacian; the
    # analytic spectrum is delta + 4 sin^2(pi j / (2 (N+1)))
    t0 = time.perf_counter()
    delta = 0.5
    opg = qtt_screened_laplacian(K, delta=delta)
    x0 = pk.pad_rank(qtt_exponential(K, c=2.0), 6)
    vecs, vals = als_eigsh_k_sharded(mesh, opg, x0, 3, sweeps=6)
    N = 2**K
    exact = [
        delta + 4.0 * np.sin(np.pi * j / (2 * (N + 1))) ** 2
        for j in (1, 2, 3)
    ]
    errs = [abs(v - e) for v, e in zip(vals, exact)]
    print(
        f"[3] als_eigsh_k_sharded    lam {vals[0]:.6f} {vals[1]:.6f} "
        f"{vals[2]:.6f}  vs analytic err {max(errs):.1e}  "
        f"({time.perf_counter() - t0:.1f} s)"
    )

    # 4. generalized FEM pair: lam_min -> pi^2 as h -> 0
    t0 = time.perf_counter()
    h = 1.0 / (2**K + 1)
    A = qtt_tridiagonal(K, 2.0 / h, -1.0 / h, -1.0 / h)
    M = qtt_tridiagonal(K, 4.0 * h / 6, h / 6, h / 6)
    _, mu, _ = als_eigsh_sharded(mesh, A, x0, sweeps=6, mass=M)
    print(
        f"[4] generalized (FEM)      lam {mu:.6f}  vs pi^2 "
        f"err {abs(mu - np.pi**2):.1e}  "
        f"({time.perf_counter() - t0:.1f} s)"
    )

    # 5. time integration: CN heat step with the FEM pair + source,
    # and a TDVP flow under the identity (exact decay oracle)
    t0 = time.perf_counter()
    src = pk.pad_rank(qtt_exponential(K, c=-2.0), 8)
    u0 = pk.pad_rank(qtt_exponential(K, c=1.0), 8)
    _, res_t = evolve_theta_sharded(
        mesh, A, u0, 1e-5, 3, theta=0.5, mass=M, source=src,
        sweeps=6, spd=True,
    )
    ident = pk.ttop_identity(K, 2, u0.first.dtype)
    _, norms = evolve_tdvp_sharded(mesh, ident, u0, 0.05, 2)
    ratio = norms[1] / norms[0]
    print(
        f"[5] evolve_theta_sharded   step residuals "
        f"{max(res_t):.1e};  tdvp decay ratio {ratio:.6f} "
        f"(exact {np.exp(-0.05):.6f})  "
        f"({time.perf_counter() - t0:.1f} s)"
    )
    print("ALL OK")


if __name__ == "__main__":
    main(int(_sys.argv[1]) if len(_sys.argv) > 1 else 10)
