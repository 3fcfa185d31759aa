"""QTT stretch: a 2^30-point quantized tensor train.

The reference README flags this regime as broken ("dimension scaling is
off ... may be a problem if QTT considered"): 30 dimensions of mode size
2 make contraction-path quality decisive.  Here the planner's edge-aware
path (and the fused zipper) handle it directly.

Builds a rank-chi QTT over 30 binary modes (2^30 ~ 1e9 logical points),
computes norms/inner products, evaluates at random points, and rounds.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import sys
import time

import numpy as np

from tensor_networks_tpu import (
    Index,
    TensorNetwork,
    tt_inner_fast,
    tt_svd_round,
)


def _normalized_qtt(indices, chi):
    """Random QTT with every core scaled so norms stay O(1) in f32 over
    30 products."""
    net = TensorNetwork.rand_tt(indices, [chi] * (len(indices) - 1),
                                dtype=np.float32)
    for node in net.network.nodes:
        t = net.node_tensor(node)
        t.value = t.value / np.sqrt(np.prod(t.value.shape[:-1]) + 1.0)
    return net


def main(d: int = 30, chi: int = 16):
    np.random.seed(0)  # reproducible (and f32-validated) draws
    indices = [Index(f"q{i}", 2) for i in range(d)]
    a = _normalized_qtt(indices, chi)
    b = _normalized_qtt(indices, chi)

    t0 = time.perf_counter()
    val = float(tt_inner_fast(a, b))
    t_fused = time.perf_counter() - t0
    print(
        f"[qtt] 2^{d} points, rank {chi}: <a,b> = {val:.6e} "
        f"(fused zipper, {t_fused*1e3:.1f} ms first call)",
        file=sys.stderr,
    )

    t0 = time.perf_counter()
    val2 = float(a.inner(b))
    t_graph = time.perf_counter() - t0
    print(
        f"[qtt] graph-path inner = {val2:.6e} ({t_graph*1e3:.1f} ms "
        "first call incl. planning)",
        file=sys.stderr,
    )
    assert np.isclose(val, val2, rtol=1e-4), (val, val2)

    # point evaluation over the 2^30 grid without densifying
    pts = np.random.randint(0, 2, size=(1000, d))
    t0 = time.perf_counter()
    vals = a.evaluate(a.free_indices(), pts)
    print(
        f"[qtt] evaluated 1000 points in {(time.perf_counter()-t0)*1e3:.1f} "
        f"ms; mean={vals.mean():.3e}",
        file=sys.stderr,
    )

    # round a + a back down.  The tolerance must clear the f32 noise the
    # 30 chained QRs accumulate (~1e-5 relative per bond on TPU), so the
    # per-bond budget eps/sqrt(d-1) needs eps >= ~1e-3 in f32.
    s = a + a
    s = tt_svd_round(s, 1e-3)
    print(f"[qtt] rounded (a+a) ranks: max={max(s.ranks())}", file=sys.stderr)
    assert max(s.ranks()) <= chi

    print("qtt stretch OK", file=sys.stderr)


if __name__ == "__main__":
    main()
