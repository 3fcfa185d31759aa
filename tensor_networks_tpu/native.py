"""ctypes bridge to the native C++ path optimizer.

Builds ``native/path_optimizer.cpp`` into a shared object on first use
(g++, cached next to the source) and exposes :func:`optimal_path`.  When
the toolchain or the binary is unavailable, callers fall back to
opt_einsum's searchers — the native optimizer is a performance component,
never a correctness dependency.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native",
    "path_optimizer.cpp",
)
_SO = os.path.join(os.path.dirname(_SRC), "libtnt_path.so")

MAX_NATIVE_OPERANDS = 18


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(
        _SRC
    ):
        return _SO
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                "-shared",
                "-fPIC",
                "-std=c++17",
                _SRC,
                "-o",
                _SO,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _SO
    except Exception as exc:  # toolchain missing or compile failure
        logger.info("native path optimizer unavailable: %s", exc)
        return None


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        so = _build()
        if so is None:
            _LIB_FAILED = True
            return None
        try:
            lib = ctypes.CDLL(so)
            lib.tnt_optimal_path.restype = ctypes.c_int
            lib.tnt_optimal_path.argtypes = [
                ctypes.c_int32,
                np.ctypeslib.ndpointer(np.int32),
                np.ctypeslib.ndpointer(np.int32),
                ctypes.c_int32,
                np.ctypeslib.ndpointer(np.float64),
                np.ctypeslib.ndpointer(np.int32),
                ctypes.c_int32,
                np.ctypeslib.ndpointer(np.int32),
            ]
            _LIB = lib
        except OSError as exc:
            logger.info("failed to load native optimizer: %s", exc)
            _LIB_FAILED = True
        return _LIB


def native_available() -> bool:
    return _lib() is not None


def optimal_path(
    operand_ids: Sequence[Sequence[int]],
    out_ids: Sequence[int],
    dim_of_id: Sequence[float],
) -> Optional[List[Tuple[int, int]]]:
    """Exact minimum-flop pairwise contraction path.

    Index ids must be dense 0..n_ids-1 with ``dim_of_id[i]`` the extent of
    id ``i``.  Returns opt_einsum-convention position pairs, or None when
    the native library is unavailable or the instance is out of range.
    """
    n_ops = len(operand_ids)
    n_ids = len(dim_of_id)
    if n_ops < 2 or n_ops > MAX_NATIVE_OPERANDS or n_ids >= 64:
        return None
    lib = _lib()
    if lib is None:
        return None

    flat = np.asarray(
        [i for ids in operand_ids for i in ids], dtype=np.int32
    )
    offsets = np.zeros(n_ops + 1, dtype=np.int32)
    for i, ids in enumerate(operand_ids):
        offsets[i + 1] = offsets[i] + len(ids)
    dims = np.asarray(dim_of_id, dtype=np.float64)
    out = np.asarray(list(out_ids), dtype=np.int32)
    if out.size == 0:
        out = np.zeros(0, dtype=np.int32)
    path = np.zeros(2 * (n_ops - 1), dtype=np.int32)

    rc = lib.tnt_optimal_path(
        n_ops, flat, offsets, n_ids, dims, out, len(out_ids), path
    )
    if rc != 0:
        return None
    return [
        (int(path[2 * k]), int(path[2 * k + 1]))
        for k in range(n_ops - 1)
    ]
