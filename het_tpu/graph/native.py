"""ctypes bindings for the native graph-preprocessing library
(native/graphops.cpp), with transparent numpy fallback.

The library is built on demand with the in-tree Makefile (g++); absence of
a toolchain degrades to the numpy implementations in build.py — behaviour
is identical, only ingest speed differs.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO = os.path.join(_NATIVE_DIR, "libhetgraphops.so")

_I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


def _try_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_NATIVE_DIR, "graphops.cpp")
    stale = os.path.exists(_SO) and os.path.exists(src) and (
        os.path.getmtime(src) > os.path.getmtime(_SO)
    )
    if not os.path.exists(_SO) or stale:
        try:
            subprocess.run(
                ["make", "-s", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            if stale:
                pass  # keep the existing (older) library
            else:
                return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.hetg_counting_sort.argtypes = [
            _I64P, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, _I64P,
        ]
        lib.hetg_canonical_sort.argtypes = [
            _I64P, _I64P, _I64P,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _I64P,
        ]
        lib.hetg_bincount.argtypes = [
            _I64P, ctypes.c_int64, ctypes.c_int64, _I64P
        ]
        lib.hetg_unique_pairs.restype = ctypes.c_int64
        lib.hetg_unique_pairs.argtypes = [
            _I64P, _I64P, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            _I64P, _I64P, _I64P,
        ]
        lib.hetg_degree_sort.argtypes = [_I64P, ctypes.c_int64, _I64P]
        lib.hetg_sample_fanout.restype = ctypes.c_int64
        lib.hetg_sample_fanout.argtypes = [
            _I64P, _I64P, _I64P, _I64P,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            _I64P, _I64P, _I64P, _I64P, _I64P,
        ]
        assert lib.hetg_version() == 2
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _try_load() is not None


def canonical_sort(
    src: np.ndarray, dst: np.ndarray, rel: np.ndarray,
    num_nodes: int, num_rels: int,
) -> np.ndarray:
    """Stable argsort of edges by (dst, rel, src)."""
    lib = _try_load()
    n = len(src)
    if n:
        assert int(np.max(src)) < num_nodes and int(np.max(dst)) < num_nodes, (
            "canonical_sort: node id exceeds key bound"
        )
    if lib is None:
        return np.lexsort((src, rel, dst))
    out = np.empty(n, dtype=np.int64)
    lib.hetg_canonical_sort(
        np.ascontiguousarray(src, np.int64),
        np.ascontiguousarray(dst, np.int64),
        np.ascontiguousarray(rel, np.int64),
        n, num_nodes, num_rels, out,
    )
    return out


def counting_argsort(keys: np.ndarray, num_keys: int) -> np.ndarray:
    """Stable argsort of bounded integer keys (keys in [0, num_keys)):
    single-pass native counting sort, O(n + num_keys) — replaces numpy's
    comparison-based stable argsort (~8x at 21M keys) in every
    graph-build ordering pass."""
    lib = _try_load()
    keys = np.ascontiguousarray(keys, np.int64)
    if lib is None:
        return np.argsort(keys, kind="stable").astype(np.int64)
    out = np.empty(len(keys), dtype=np.int64)
    lib.hetg_counting_sort(keys, len(keys), num_keys, None, out)
    return out


def bincount(ids: np.ndarray, num_bins: int) -> np.ndarray:
    lib = _try_load()
    if lib is None:
        return np.bincount(ids, minlength=num_bins).astype(np.int64)
    out = np.empty(num_bins, dtype=np.int64)
    lib.hetg_bincount(
        np.ascontiguousarray(ids, np.int64), len(ids), num_bins, out
    )
    return out


def unique_pairs(
    rel: np.ndarray, node: np.ndarray, num_nodes: int, num_rels: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sorted unique (rel, node) pairs + inverse map; numpy-compatible
    with np.unique over rel * num_nodes + node."""
    lib = _try_load()
    n = len(rel)
    if lib is None:
        key = rel.astype(np.int64) * np.int64(num_nodes) + node.astype(
            np.int64
        )
        uniq, inverse = np.unique(key, return_inverse=True)
        return (uniq // num_nodes, uniq % num_nodes, inverse)
    ur = np.empty(n, dtype=np.int64)
    un = np.empty(n, dtype=np.int64)
    inv = np.empty(n, dtype=np.int64)
    nu = lib.hetg_unique_pairs(
        np.ascontiguousarray(rel, np.int64),
        np.ascontiguousarray(node, np.int64),
        n, num_nodes, num_rels, ur, un, inv,
    )
    return ur[:nu].copy(), un[:nu].copy(), inv


def sample_fanout(
    ptr: np.ndarray,
    nbr_src: np.ndarray,
    nbr_rel: np.ndarray,
    seeds: np.ndarray,
    fanout: int,
    num_hops: int,
    rng_seed: int,
    num_nodes: int,
    max_edges: int,
    max_nodes: int,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Native uniform fanout sampling over the in-CSR; returns
    (edges_src_local, edges_dst_local, edges_rel, node_map) or None when
    the library is unavailable (caller falls back to the python loop)."""
    lib = _try_load()
    if lib is None:
        return None
    es = np.empty(max_edges, dtype=np.int64)
    ed = np.empty(max_edges, dtype=np.int64)
    er = np.empty(max_edges, dtype=np.int64)
    nm = np.empty(max_nodes, dtype=np.int64)
    nn = np.empty(1, dtype=np.int64)
    ne = lib.hetg_sample_fanout(
        np.ascontiguousarray(ptr, np.int64),
        np.ascontiguousarray(nbr_src, np.int64),
        np.ascontiguousarray(nbr_rel, np.int64),
        np.ascontiguousarray(seeds, np.int64),
        len(seeds), fanout, num_hops, rng_seed, num_nodes,
        max_edges, max_nodes, es, ed, er, nm, nn,
    )
    n_nodes = int(nn[0])
    return es[:ne].copy(), ed[:ne].copy(), er[:ne].copy(), nm[:n_nodes].copy()


def degree_sort(deg: np.ndarray) -> np.ndarray:
    """Node ids ordered by descending degree (reference 'infidel sort')."""
    lib = _try_load()
    if lib is None:
        return np.argsort(-np.asarray(deg), kind="stable")
    out = np.empty(len(deg), dtype=np.int64)
    lib.hetg_degree_sort(np.ascontiguousarray(deg, np.int64), len(deg), out)
    return out
