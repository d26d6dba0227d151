"""Sparse-format conversion utilities (host-side numpy).

TPU-native counterpart of the reference's CPU thrust converters
(hrt/include/DGLHackKernel/OpExport/DataConverters.inc.h:10-60,346-356:
``transpose_csr``, ``convert_integrated_{csr,coo}_to_separate_{csr,coo}``)
and the python adjacency oracle (hrt/python/testing/adjacency_manipulation.py).
These run once at graph-build time; the device never sees ragged formats.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = [
    "coo_to_csr",
    "csr_to_coo",
    "transpose_csr",
    "integrated_coo_to_separate_coo",
]


def coo_to_csr(
    row: np.ndarray, col: np.ndarray, data: np.ndarray, num_rows: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """COO -> CSR with a stable counting sort by row."""
    row = np.asarray(row)
    order = np.argsort(row, kind="stable")
    counts = np.bincount(row, minlength=num_rows)
    row_ptr = np.zeros(num_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=row_ptr[1:])
    return row_ptr, np.asarray(col)[order], np.asarray(data)[order]


def csr_to_coo(
    row_ptr: np.ndarray, col: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    num_rows = len(row_ptr) - 1
    counts = np.diff(row_ptr)
    row = np.repeat(np.arange(num_rows, dtype=np.int64), counts)
    return row, np.asarray(col)


def transpose_csr(
    row_ptr: np.ndarray,
    col: np.ndarray,
    eids: np.ndarray,
    rel_types: np.ndarray,
    num_cols: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Transpose an integrated CSR carrying eid + rel_type edge data.

    Mirrors the semantics tested by the reference's involution unit test
    (hrt/python/test/test_kernel_correctness.py:9-44): transpose twice must
    round-trip (up to intra-row edge order; we keep it canonical by sorting
    rows stably, like the thrust path)."""
    row, _ = csr_to_coo(row_ptr, col)
    t_ptr, t_col, packed = coo_to_csr(
        np.asarray(col), row, np.stack([np.asarray(eids), np.asarray(rel_types)], 1),
        num_cols,
    )
    return t_ptr, t_col, packed[:, 0], packed[:, 1]


def integrated_coo_to_separate_coo(
    src: np.ndarray, dst: np.ndarray, rel: np.ndarray, num_rels: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Sort edges by (rel) stably; return (rel_ptrs, src, dst, eids).

    Reference: hrt/python/utils/mydgl_graph.py:686-733 (separate-COO
    generation via convert + sort_coo_by_etype_eids)."""
    order = np.argsort(rel, kind="stable")
    counts = np.bincount(rel, minlength=num_rels)
    rel_ptrs = np.zeros(num_rels + 1, dtype=np.int64)
    np.cumsum(counts, out=rel_ptrs[1:])
    return rel_ptrs, np.asarray(src)[order], np.asarray(dst)[order], order
