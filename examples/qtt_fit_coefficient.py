"""Differentiable simulation: recover a PDE coefficient by gradient
descent THROUGH the TDVP integrator.

The observed data is the energy series ``E_n = <u_n, A u_n>`` of a heat
flow ``du/dt = -c* A u`` at an unknown diffusion coefficient ``c*``.
``tdvp_trajectory`` (`ops/evolve.py`) runs the whole fused trajectory
as one pure traced program, so ``jax.grad`` of the data misfit

    L(c) = sum_n (E_n(c) - E_n(c*))^2

flows REVERSE-MODE through every step of the integrator — site/bond
matrix exponentials, QR gauge moves, the scan over steps — giving the
exact adjoint sensitivity, not a finite-difference estimate.  A plain
Newton-like descent on the 1D coefficient then recovers ``c*`` to
~1e-8 in a handful of iterations, each a single compiled program.

This is the capability PDE-constrained optimization / optimal control
needs, and it falls out of the TPU-first design: because the whole
trajectory had to be ONE jittable scan (dispatch cost through the TPU
relay), it is automatically differentiable end to end.

No reference counterpart (``pytens`` has no time integration and no
autodiff).
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

# f64 accuracy study: CPU by default (see qtt_tdvp.py for the knob)
if os.environ.get("TNT_QTT_DEVICE", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from tensor_networks_tpu.ops import packed as pk
    from tensor_networks_tpu.ops.evolve import tdvp_trajectory
    from tensor_networks_tpu.ops.packed import PackedTTOp
    from tensor_networks_tpu.ops.qtt import qtt_tridiagonal

    K, rank = 8, 2
    steps, dt = 12, 0.05
    c_true, c_start = 1.3, 0.4

    A = qtt_tridiagonal(K, 2.0, -1.0, -1.0)
    # full-rank random start; reverse mode needs tall QR factors, so a
    # UNIFORM packed rank must not exceed the mode size (the boundary
    # bonds are the binding ones) — rank 2 on binary modes
    rng = np.random.default_rng(0)
    u0 = pk.PackedTT(
        jnp.asarray(rng.standard_normal((2, rank))),
        jnp.asarray(
            rng.standard_normal((K - 2, rank, 2, rank)) / np.sqrt(rank)
        ),
        jnp.asarray(rng.standard_normal((rank, 2))),
    )

    def energies(c):
        Ac = PackedTTOp(A.first * c, A.mids, A.last)
        _, _, obs = tdvp_trajectory(Ac, u0, dt, steps, observables=(A,))
        return obs[:, 0]

    data = energies(jnp.asarray(c_true))

    def loss(c):
        r = energies(c) - data
        return jnp.sum(r * r)

    g = jax.jit(jax.value_and_grad(loss))
    h = jax.jit(jax.grad(jax.grad(loss)))  # 1D: exact Newton step

    c = jnp.asarray(c_start)
    t0 = time.time()
    print(f"fitting c (true {c_true}) from the energy series of "
          f"{steps} TDVP steps on 2^{K} points, start c={c_start}")
    for it in range(12):
        val, grad = g(c)
        curv = h(c)
        step = jnp.where(curv > 0, grad / curv, jnp.sign(grad) * 0.1)
        c = c - step
        print(f"  it {it}: loss {float(val):.3e}  c {float(c):.10f}")
        if float(val) < 1e-22:
            break
    wall = time.time() - t0
    err = abs(float(c) - c_true)
    print(f"recovered c = {float(c):.10f} (|err| {err:.2e}) in {wall:.1f}s")
    assert err < 1e-7, err
    print("OK")


if __name__ == "__main__":
    main()
