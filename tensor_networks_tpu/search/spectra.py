"""Bipartition spectra: the data the program synthesizer reasons over.

For every free-index bipartition of the dense target, the singular-value
tail mass determines which bond ranks are reachable within the error
budget.  :class:`SplitSpectra` computes these spectra — grouped by
matricized shape and batched through one vmapped device SVD per group —
and subsamples the feasible truncation points into bins so the downstream
rank solver sees a handful of candidates per edge instead of hundreds.

Functionally equivalent to the preprocessing in the reference's
``pytens/search/constraint.py`` (abstract/preprocess, Gurobi-era), with
the device batching and the bin walk vectorized our way.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from tensor_networks_tpu.kernels import svd_full
from tensor_networks_tpu.search.actions import OSplit
from tensor_networks_tpu.search.configuration import SearchConfig
from tensor_networks_tpu.search.mdp import SearchState
from tensor_networks_tpu.tensor import Tensor
from tensor_networks_tpu.types import Index


@functools.lru_cache(maxsize=1)
def _padded_svals_fn():
    """The one jitted batched-SVD executable (shape-polymorphic via jit's
    per-shape cache; buckets keep the shape count tiny).  Cached so the
    compiled executable is reused across calls — rebuilding the jit
    wrapper would pay a fresh 20-60 s relay compile every time."""
    import jax
    import jax.numpy as jnp

    return jax.jit(
        jax.vmap(lambda m: jnp.linalg.svd(m, compute_uv=False))
    )


def bin_spectrum(
    spectrum: np.ndarray, delta: float, bin_frac: float
) -> Tuple[List[float], List[int]]:
    """Subsample feasible truncation points of one spectrum.

    Walks the squared tail sums that fit within ``delta**2`` and keeps at
    most one candidate per ``bin_frac * delta**2`` window of error mass
    (the deepest cut inside each window).  The drop-one candidate is
    always offered, even if infeasible — the solver rejects it by budget.

    Returns ``(errors, kept_sizes)`` aligned pairwise.
    """
    budget = delta * delta
    window = bin_frac * budget
    tails = np.cumsum(spectrum[::-1] ** 2)
    feasible = tails[tails <= budget]

    errors: List[float] = [float(spectrum[-1]) ** 2]
    drops: List[int] = [1]
    top = window
    pend_err = 0.0
    pend_n = 0
    for t in feasible[1:]:
        if t >= top:
            top += window
            if pend_n:
                errors.append(pend_err)
                drops.append(pend_n)
            pend_err, pend_n = float(t), 1
        else:
            pend_err, pend_n = float(t), pend_n + 1
    if pend_n:
        errors.append(pend_err)
        drops.append(pend_n)

    kept = len(spectrum) - np.cumsum(drops)
    return errors, [int(k) for k in kept]


def _matricize(target: Tensor, comb: Sequence[Index]) -> np.ndarray:
    """Permute ``comb`` axes to the front and flatten to a matrix."""
    free = target.indices
    rest = [i for i in free if i not in comb]
    axes = [free.index(i) for i in (*comb, *rest)]
    rows = int(np.prod([i.size for i in comb]))
    return np.transpose(np.asarray(target.value), axes).reshape(rows, -1)


class SplitSpectra:
    """Binned truncation candidates for every candidate OSplit."""

    def __init__(self, config: SearchConfig):
        self.config = config
        self.delta = 0.0
        self.free_indices: List[Index] = []
        self._cands: Dict[OSplit, Tuple[List[float], List[int]]] = {}
        self._spill: Dict[OSplit, str] = {}
        self.temp_files: List[str] = []

    # -- keyed access ---------------------------------------------------------

    def _resolve(self, split: OSplit) -> OSplit:
        """Bipartitions are stored under one of their two halves; the
        complement names the same cut (identical spectrum)."""
        if split in self._cands or split in self._spill:
            return split
        other = OSplit(
            [i for i in self.free_indices if i not in split.indices]
        )
        return other

    def candidates(self, split: OSplit) -> Tuple[List[float], List[int]]:
        """(error sums, kept sizes) for one bipartition."""
        return self._cands[self._resolve(split)]

    def svd_file(self, split: OSplit) -> Optional[str]:
        """Path of the spilled (U, s, V) for one bipartition, if any."""
        return self._spill.get(self._resolve(split))

    # -- construction -----------------------------------------------------------

    def build(
        self,
        target: Tensor,
        combs: Optional[Sequence[Sequence[Index]]] = None,
        spill_uv: bool = False,
    ) -> "SplitSpectra":
        """Compute (or reload) the spectra.

        ``combs`` restricts to the given bipartitions (replay path);
        ``spill_uv`` additionally saves full (U, s, V) factors to npz for
        later data replay, computing them one by one on the host.
        Otherwise singular values are computed in shape-grouped vmapped
        batches on device.
        """
        self.free_indices = list(target.indices)
        self.delta = self.config.engine.eps * float(
            np.linalg.norm(np.asarray(target.value))
        )

        if combs is not None:
            for comb in combs:
                self._one_host_svd(target, comb, spill_uv=False)
            return self

        cache_probe = os.path.join(self.config.output.output_dir, "0.npz")
        use_cache = not spill_uv and not (
            self.config.preprocess.force_recompute
            or not os.path.exists(cache_probe)
        )
        if spill_uv or use_cache:
            for comb in SearchState.all_index_combs(target.indices):
                self._one_host_svd(target, comb, spill_uv=spill_uv)
        else:
            self._batched_device_svals(target)
        return self

    def _one_host_svd(
        self, target: Tensor, comb: Sequence[Index], spill_uv: bool
    ) -> None:
        """One bipartition on the host, optionally spilling factors."""
        split = OSplit(comb)
        out_dir = self.config.output.output_dir
        path = os.path.join(out_dir, f"{len(self._spill)}.npz")

        if spill_uv:
            u, s, vt = (
                np.asarray(m) for m in svd_full(_matricize(target, comb))
            )
            os.makedirs(out_dir, exist_ok=True)
            np.savez(path, u=u, s=s, v=vt)
            self._spill[split] = path
            self.temp_files.append(path)
            return

        if not self.config.preprocess.force_recompute and os.path.exists(
            path
        ):
            s = np.load(path)["s"]
            self._spill[split] = path
        else:
            s = np.asarray(svd_full(_matricize(target, comb))[1])
        self._cands[split] = bin_spectrum(
            s, self.delta, self.config.synthesizer.bin_size
        )

    def _batched_device_svals(self, target: Tensor) -> None:
        """All bipartition spectra in ONE vmapped device SVD.

        Every matricization is oriented short-side-first (singular values
        are transpose-invariant) and zero-padded to a common
        pow2-bucketed shape, so the whole preprocessing is a single
        executable regardless of how many distinct shapes the
        bipartitions produce.  Zero rows/cols only append zero singular
        values; each spectrum is trimmed back to its true length before
        binning.  One compile instead of one per shape — through the
        ~20-60 s-per-compile TPU relay this is what makes search
        preprocessing on-chip practical.
        """
        import jax

        from tensor_networks_tpu.kernels.linalg import _host_svd_threshold

        combs = list(SearchState.all_index_combs(target.indices))
        mats = []
        for comb in combs:
            mat = _matricize(target, comb)
            if mat.shape[0] > mat.shape[1]:
                mat = mat.T
            mats.append(mat)

        if jax.default_backend() == "tpu" and all(
            m.size < _host_svd_threshold() for m in mats
        ):
            # small targets: host LAPACK beats per-shape device compiles
            for comb, mat in zip(combs, mats):
                s = np.linalg.svd(np.asarray(mat), compute_uv=False)
                self._cands[OSplit(comb)] = bin_spectrum(
                    s, self.delta, self.config.synthesizer.bin_size
                )
            return

        m_b = 1 << (max(m.shape[0] for m in mats) - 1).bit_length()
        k_b = 1 << (max(m.shape[1] for m in mats) - 1).bit_length()
        stack = np.zeros((len(mats), m_b, k_b), dtype=np.asarray(mats[0]).dtype)
        for i, mat in enumerate(mats):
            stack[i, : mat.shape[0], : mat.shape[1]] = mat
        svals = np.asarray(_padded_svals_fn()(stack))
        for comb, mat, s in zip(combs, mats, svals):
            self._cands[OSplit(comb)] = bin_spectrum(
                s[: mat.shape[0]],
                self.delta,
                self.config.synthesizer.bin_size,
            )
