"""Sparse core: device-resident sparse matrices and host-side graph transforms."""

from .matrix import SparseMatrix, BSR, spmm, device_sparse
from . import transforms

__all__ = ["SparseMatrix", "BSR", "spmm", "device_sparse", "transforms"]
