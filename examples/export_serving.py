"""AOT export round-trip: compile once, serve anywhere, no library.

Builds a random TT, exports its batched evaluator as ONE artifact file
(`tensor_networks_tpu/export.py`: shape-polymorphic StableHLO via
``jax.export`` — symbolic batch axis, weights as arguments), then
demonstrates the serving side TWICE:

1. in-process through :class:`ExportedEvaluator` (any batch size, zero
   retracing, hot-swapped weights), and
2. in a SUBPROCESS that never imports ``tensor_networks_tpu`` — just
   ``numpy`` + ``jax.export.deserialize`` — proving the artifact is a
   self-contained serving contract, not a pickle of library objects.

The reference's serialization (``pytens/algs.py:1487-1580``) ships
state only; loading requires the library and re-tracing.
"""

import os
import subprocess
import sys
import tempfile
import textwrap
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

if os.environ.get("TNT_QTT_DEVICE", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

_SERVER = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    import json
    import numpy as np
    from jax import export as jax_export

    path = sys.argv[1]
    with np.load(path) as data:
        meta = json.loads(bytes(data["manifest"].tobytes()).decode())
        exported = jax_export.deserialize(
            bytearray(data["artifact"].tobytes())
        )
        values = [data[f"value_{i}"] for i in range(meta["n_values"])]

    rng = np.random.default_rng(7)
    sizes = meta["index_sizes"]
    for batch in (1, 17, 4096):
        pts = np.stack(
            [rng.integers(0, s, batch) for s in sizes], axis=1
        ).astype(np.int32)
        out = exported.call(values, pts)
        print(f"served batch {batch}: first={float(out[0]):.6f}")
    print("library-free serving OK")
    """
)


def main():
    from tensor_networks_tpu import Index, TensorNetwork
    from tensor_networks_tpu import export as tnt_export

    np.random.seed(11)
    inds = [Index(f"x{k}", 8) for k in range(10)]
    net = TensorNetwork.rand_tt(inds, [5] * 9, dtype=np.float32)

    t0 = time.perf_counter()
    ev = tnt_export.export_evaluator(net)
    print(f"exported {len(inds)}-D evaluator "
          f"(platforms {ev.platforms}) in "
          f"{time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(3)
    for batch in (1, 100, 10000):
        pts = np.stack(
            [rng.integers(0, 8, batch) for _ in inds], axis=1
        )
        t0 = time.perf_counter()
        out = ev(pts)
        dt = time.perf_counter() - t0
        ref = net.evaluate(inds, pts[:4])
        assert np.allclose(out[:4], ref, rtol=1e-4, atol=1e-5)
        print(f"batch {batch:>6}: {dt * 1e3:7.1f} ms "
              f"(symbolic batch axis; pow2-bucketed specializations)")

    # hot-swap refreshed weights of the same structure
    net2 = TensorNetwork.rand_tt(inds, [5] * 9, dtype=np.float32)
    ev.update_values(net2)
    pts = np.stack([rng.integers(0, 8, 64) for _ in inds], axis=1)
    assert np.allclose(
        ev(pts), net2.evaluate(inds, pts), rtol=1e-4, atol=1e-5
    )
    print("hot-swapped weights serve the new network")

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "evaluator.npz")
        ev.save(path)
        print(f"artifact: {os.path.getsize(path) / 1024:.0f} KiB")
        proc = subprocess.run(
            [sys.executable, "-c", _SERVER, path],
            capture_output=True,
            text=True,
            timeout=600,
        )
        sys.stdout.write(proc.stdout)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr)
            raise SystemExit("subprocess serving failed")
    print("OK")


if __name__ == "__main__":
    main()
