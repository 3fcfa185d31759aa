"""Tracing and profiling hooks.

The reference sprinkles ``line_profiler`` decorators on its cross-approx
hot path (``pytens/cross/cross.py:79-354``); the TPU-native equivalent is
XLA-level tracing: :func:`trace` wraps a region in ``jax.profiler`` and
writes a perfetto/tensorboard trace, and :func:`annotate` names regions
so sweep kernels are identifiable in the timeline.

Usage::

    from tensor_networks_tpu.profiling import trace, annotate

    with trace("/tmp/tnt-trace"):
        with annotate("tt_round"):
            tt_svd_round(tn, 1e-8)
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a device trace for the enclosed region."""
    jax.profiler.start_trace(
        log_dir, create_perfetto_link=create_perfetto_link
    )
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Name the enclosed region in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Lightweight wall-clock accumulator for host-side phases.

    Covers the role of the reference's per-function line profiles for
    code that never reaches the device (search enumeration, tree sweeps).
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"{name:<40s} {self.totals[name]*1e3:10.2f} ms "
                f"({self.counts[name]} calls)"
            )
        return "\n".join(lines)


_GLOBAL_TIMER: Optional[Timer] = None


def global_timer() -> Timer:
    """Process-wide timer used by ``--profile``-style flags."""
    global _GLOBAL_TIMER
    if _GLOBAL_TIMER is None:
        _GLOBAL_TIMER = Timer()
    return _GLOBAL_TIMER
