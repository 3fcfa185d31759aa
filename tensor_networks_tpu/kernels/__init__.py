"""Jitted device kernels: truncated SVD, QR, Gram factorizations, maxvol.

Every numerical statement in the framework ultimately lowers through one of
these kernels.  The host decides *shapes and ranks*; the device does the
FLOPs.
"""

from tensor_networks_tpu.kernels.linalg import (
    TruncSVD,
    delta_svd,
    svd_full,
    qr_reduced,
    qr_reduced_padded,
    gram_eig_and_svd,
    eps_to_rank,
)

__all__ = [
    "TruncSVD",
    "delta_svd",
    "svd_full",
    "qr_reduced",
    "qr_reduced_padded",
    "gram_eig_and_svd",
    "eps_to_rank",
]
