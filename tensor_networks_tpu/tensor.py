"""The local tensor: a device array plus an ordered list of named indices.

All per-node numerical operations (contract, SVD/QR splits, Hadamard
products, block-diagonal embeddings) live here and execute on device via
jitted kernels; operations are keyed by index *identity*, never by
position conventions shared between networks.

Parity reference: ``pytens/algs.py:46-344`` (Tensor and its methods).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from tensor_networks_tpu.kernels import delta_svd, qr_reduced
from tensor_networks_tpu.planner import contract_values
from tensor_networks_tpu.types import Index, IntOrStr


@dataclass
class Tensor:
    """An n-dimensional array with one named :class:`Index` per axis."""

    value: jnp.ndarray
    indices: List[Index]

    def __deepcopy__(self, memo) -> "Tensor":
        """Deep copies share the (immutable) value buffer.

        Every operation in the framework rebinds ``value`` rather than
        mutating it, so structural copies never need to copy array data —
        this is what keeps search/GMRES cloning cheap.
        """
        return Tensor(self.value, list(self.indices))

    # -- serialization -----------------------------------------------------

    def to_dict(self) -> dict:
        """Plain-dict form; the value is materialized as a NumPy array."""
        return {
            "value": np.ascontiguousarray(np.asarray(self.value)),
            "indices": [index.to_dict() for index in self.indices],
        }

    @classmethod
    def from_dict(cls, data_dict: dict) -> "Tensor":
        indices = [Index.from_dict(d) for d in data_dict["indices"]]
        return cls(value=jnp.asarray(data_dict["value"]), indices=indices)

    # -- metadata updates ----------------------------------------------------

    def update_val_size(self, value, keep_host: bool = False) -> "Tensor":
        """Replace the value in place; index sizes follow the new shape.

        On the TPU backend, small host (NumPy) arrays are kept
        host-resident (as a defensive copy — deepcopy clones share
        value buffers, so an installed array must never alias caller
        memory): small graph tensors flow host SVD -> host contraction
        -> host install, and pushing them to the device here would
        force a relay round trip per operation (measured 10-20x search
        slowdowns).  ``keep_host=True`` keeps a NumPy value host even
        ABOVE the size gate — the search scorer's contract: it chose
        host residency for its factors deliberately, and a device push
        here would cost one relay upload per install plus one fetch
        per child commit (measured: ~42 s of a 71 s search level).
        Everything else converts to a device array as before; device
        consumers (packed kernels, sharded paths) convert at their own
        boundary.
        """
        import jax

        from tensor_networks_tpu.kernels.linalg import _host_svd_threshold

        if isinstance(value, np.ndarray) and (
            keep_host
            or (
                jax.default_backend() == "tpu"
                and value.size < _host_svd_threshold()
            )
        ):
            value = value.copy()
        else:
            value = jnp.asarray(value)
        assert value.ndim == len(self.indices), (
            f"{value.shape}, {self.indices}"
        )
        self.value = value
        for ii, index in enumerate(self.indices):
            self.indices[ii] = index.with_new_size(value.shape[ii])
        return self

    def rename_indices(self, rename_map: Dict[IntOrStr, IntOrStr]) -> "Tensor":
        """Rename indices in place by name."""
        for ii, index in enumerate(self.indices):
            if index.name in rename_map:
                self.indices[ii] = index.with_new_name(rename_map[index.name])
        return self

    def relabel_indices(self, relabel_map: Dict[IntOrStr, Any]) -> "Tensor":
        """Re-size indices in place by name (sizes may become tuples during
        rank search)."""
        for ii, index in enumerate(self.indices):
            if index.name in relabel_map:
                self.indices[ii] = index.with_new_size(
                    relabel_map[index.name]
                )
        return self

    def permute(self, target_order: Optional[Sequence[int]]) -> "Tensor":
        """A new tensor with axes permuted by position."""
        if not target_order:
            return self
        value = (
            np if isinstance(self.value, np.ndarray) else jnp
        ).transpose(self.value, tuple(target_order))
        indices = [self.indices[i] for i in target_order]
        return Tensor(value, indices)

    # -- pairwise algebra ------------------------------------------------------

    def contract(self, other: "Tensor") -> "Tensor":
        """Contract over all indices shared (by identity) with ``other``.

        Output indices: self-only indices (in self order) followed by
        other-only indices (in other order).
        """
        out_indices = [i for i in self.indices if i not in other.indices]
        out_indices += [i for i in other.indices if i not in self.indices]
        out = contract_values(
            [self.indices, other.indices],
            [self.value, other.value],
            out_indices,
        )
        return Tensor(out, out_indices)

    def mult(self, other: "Tensor", indices_common: Sequence[Index]) -> "Tensor":
        """Hadamard on common indices, tensor (Kronecker) product on the
        rest; positionally-aligned axes are merged pairwise.

        Used by tree-aligned elementwise multiplication: result rank on a
        merged axis is the product of the two input sizes.
        """
        assert len(self.indices) == len(other.indices)
        lhs_ids: List[int] = []
        rhs_ids: List[int] = []
        out_ids: List[int] = []
        new_indices: List[Index] = []
        new_shape: List[int] = []
        counter = 0
        for ind_a, ind_b in zip(self.indices, other.indices):
            if ind_a in indices_common:
                assert ind_a.size == ind_b.size
                lhs_ids.append(counter)
                rhs_ids.append(counter)
                out_ids.append(counter)
                counter += 1
                new_indices.append(ind_a)
                new_shape.append(ind_a.size)
            else:
                lhs_ids.append(counter)
                out_ids.append(counter)
                counter += 1
                rhs_ids.append(counter)
                out_ids.append(counter)
                counter += 1
                merged = ind_a.size * ind_b.size
                new_indices.append(Index(f"{ind_a.name}", merged))
                new_shape.append(merged)

        out = jnp.einsum(
            self.value, lhs_ids, other.value, rhs_ids, out_ids
        ).reshape(new_shape)
        return Tensor(out, new_indices)

    def concat_fill(
        self, other: "Tensor", indices_common: Sequence[Index]
    ) -> "Tensor":
        """Direct sum along non-common axes (zero-padded block concat)."""
        return self.block_diagonal(other, indices_common)

    def block_diagonal(
        self, other: "Tensor", free_inds: Sequence[Index]
    ) -> "Tensor":
        """Embed the two tensors block-diagonally along all non-free axes.

        The TT/tree addition kernel: free axes stay shared, every bond axis
        becomes the direct sum of the two inputs' bonds.
        """
        shape: List[int] = []
        offsets: List[int] = []  # start of other's block per axis
        for i, ind in enumerate(self.indices):
            if ind in free_inds:
                assert ind.size == other.indices[i].size
                shape.append(ind.size)
                offsets.append(0)
            else:
                shape.append(ind.size + other.indices[i].size)
                offsets.append(ind.size)

        big = jnp.zeros(shape, dtype=jnp.result_type(self.value, other.value))
        slc_self = tuple(
            slice(None) if ind in free_inds else slice(0, ind.size)
            for ind in self.indices
        )
        slc_other = tuple(
            slice(None)
            if ind in free_inds
            else slice(off, off + oth.size)
            for ind, off, oth in zip(self.indices, offsets, other.indices)
        )
        big = big.at[slc_self].set(self.value)
        big = big.at[slc_other].set(other.value)
        new_indices = [
            Index(ind.name, big.shape[i]) for i, ind in enumerate(self.indices)
        ]
        return Tensor(big, new_indices)

    # -- factorizations ---------------------------------------------------------

    def _split_permute(
        self, lefts: Sequence[int]
    ) -> Tuple[jnp.ndarray, List[int], List[int], int, int]:
        rights = [i for i in range(len(self.indices)) if i not in lefts]
        xp = np if isinstance(self.value, np.ndarray) else jnp
        value = xp.transpose(self.value, tuple(list(lefts) + rights))
        left_sz = int(np.prod([self.indices[i].size for i in lefts]))
        right_sz = int(np.prod([self.indices[j].size for j in rights]))
        return value.reshape(left_sz, right_sz), list(lefts), rights, left_sz, right_sz

    def svd(
        self, lefts: Sequence[int], delta: float = 1e-5
    ) -> Tuple[List["Tensor"], float]:
        """Delta-truncated SVD split by axis positions.

        Returns ``[U, S, V]`` tensors joined by fresh ``r_split_l`` /
        ``r_split_r`` bond indices, plus the unused error budget.
        """
        mat, lefts, rights, _, _ = self._split_permute(lefts)
        result = delta_svd(mat, delta)
        rank = result.u.shape[1]

        u_val = result.u.reshape(
            [self.indices[i].size for i in lefts] + [rank]
        )
        u_indices = [self.indices[i] for i in lefts]
        u_indices.append(Index("r_split_l", rank))

        s_indices = [Index("r_split_l", rank), Index("r_split_r", rank)]
        xp = np if isinstance(result.s, np.ndarray) else jnp
        s_tensor = Tensor(xp.diag(result.s), s_indices)

        v_val = result.v.reshape(
            [rank] + [self.indices[j].size for j in rights]
        )
        v_indices = [Index("r_split_r", rank)] + [
            self.indices[j] for j in rights
        ]
        return (
            [Tensor(u_val, u_indices), s_tensor, Tensor(v_val, v_indices)],
            result.remaining_delta,
        )

    def qr(self, lefts: Sequence[int]) -> Tuple["Tensor", "Tensor"]:
        """QR split by axis positions, joined by a fresh ``r_split`` bond."""
        mat, lefts, rights, _, _ = self._split_permute(lefts)
        q, r = qr_reduced(mat)
        rank = q.shape[1]

        q_val = q.reshape([self.indices[i].size for i in lefts] + [rank])
        q_indices = [self.indices[i] for i in lefts]
        q_indices.append(Index("r_split", rank))

        r_val = r.reshape([rank] + [self.indices[j].size for j in rights])
        r_indices = [Index("r_split", rank)] + [
            self.indices[j] for j in rights
        ]
        return Tensor(q_val, q_indices), Tensor(r_val, r_indices)
