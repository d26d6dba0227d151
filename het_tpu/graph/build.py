"""Host-side (numpy) construction of :class:`HeteroGraph`.

Replaces the reference's graph-preparation pipeline — COO/CSR conversion,
etype/eid sorting, per-relation unique-node-index generation
(hrt/python/utils/mydglgraph_converters.py:104-250,
hrt/python/utils/coo_sorters.py, hrt/python/utils_lite/mydgl_graph_methods.py:11)
— but targets the TPU layout: one canonical dst-sorted edge ordering plus
tile-padded relation segments, built once on the host.

A native C++ fast path for the heavy sorts lives in ``het_tpu.graph.native``
(used automatically when built); numpy is the fallback.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

from . import native
from .structures import CompactInfo, HeteroGraph, Segments, TileTables

__all__ = [
    "build_segments",
    "build_heterograph",
    "build_tile_tables",
    "round_up",
]

def KERNEL_NB() -> int:
    """Node-tile width of the one-hot segment-reduce kernels (must match
    ops/pallas/seg_reduce.NB, both resolved from the per-TPU-generation
    tuning table); tables are precomputed here because on-device
    scalar-prefetch production costs ~1 ms per kernel call (TileTables)."""
    from ..ops.pallas.tuning import get_table

    return get_table().nb


def _density_nb_enabled() -> bool:
    import os

    return os.environ.get("HET_DENSITY_NB", "1") not in ("0", "off")


def build_tile_tables(
    ptr: np.ndarray, N: int, nb: int = None, chunk_edges: int = None
) -> TileTables:
    """Host (numpy) mirror of seg_reduce._tables_from_ptr (tile count
    padded to the kernel's super-block multiple; pad tiles are empty),
    plus the flattened (tile x edge-block) work list that drives the
    pipelined reduce kernel's 1-D grid (TileTables docstring).

    ``chunk_edges`` (edge-block width) is a per-table parameter so SPMD
    shards can be rebuilt with one common geometry
    (parallel/partition._unify_tables).  The default stays the tuned
    global value: a round-4 density-matched-blocks experiment won its
    kernel micro-benchmarks by 1.3-2x but LOST the composed training step
    by 0.5-1.7 ms in interleaved A/B reps — the composed step is the
    ground truth, isolated kernel timings are not."""
    from ..ops.pallas.seg_reduce import CHUNK_EDGES, TABLE_PAD

    ptr = np.asarray(ptr)
    if nb is None:
        nb = KERNEL_NB()
        if _density_nb_enabled():
            # density-matched node-tile width: sparse segmentations
            # (compact edge_row_ptr / canon runs average ~2-3 edges per
            # row at mag scale) make tiles tiny relative to payload
            # blocks, so the per-(tile, block) work list re-DMAs each
            # block once per covering tile (measured 185 MB moved for a
            # 44 MB payload on the srcC reduce).  Wider tiles amortize
            # that; affordable since round 5 because the split3/bf16
            # payloads take ONE one-hot MXU pass (the round-4
            # density-matched experiment lost e2e under the 3-pass f32
            # kernel, whose MXU cost scales with nb).
            density = float(ptr[min(N, len(ptr) - 1)]) / max(N, 1)
            if density < 2.0:
                nb = min(4 * nb, 512)
            elif density < 4.0:
                nb = min(2 * nb, 256)
    if chunk_edges is None:
        chunk_edges = CHUNK_EDGES
    # always keep >= 1 FULLY empty trailing tile (every row beyond N, so
    # lower == upper throughout): partition table unification
    # (parallel/partition._unify_tables) pads work lists with no-op items
    # that must target such a tile to accumulate nothing
    n_tiles = -(-(-(-N // nb) + 1) // TABLE_PAD) * TABLE_PAD if N else 0
    idx = np.minimum(np.arange(n_tiles + 1, dtype=np.int64) * nb, N)
    tptr = ptr[idx]
    node_idx = np.minimum(
        np.arange(n_tiles * nb, dtype=np.int64), N
    ).reshape(n_tiles, nb)
    lower = ptr[node_idx][:, None, :]
    upper = ptr[np.minimum(node_idx + 1, N)][:, None, :]
    # work list: tile t spans edge blocks [b0, b1) (>=1 even when empty,
    # so every tile's accumulator is zeroed and flushed exactly once)
    ce = chunk_edges
    b0 = tptr[:-1] // ce
    b1 = np.maximum(-(-tptr[1:] // ce), b0 + 1)
    cnt = b1 - b0
    n_work = int(cnt.sum())
    w_tile = np.repeat(np.arange(n_tiles, dtype=np.int64), cnt)
    cum = np.concatenate([[0], np.cumsum(cnt)])
    w_block = b0[w_tile] + (np.arange(n_work, dtype=np.int64) - cum[w_tile])
    w_first = np.zeros(n_work, np.int32)
    if n_work:
        w_first[cum[:-1]] = 1
    return TileTables(
        nb=nb, tptr=_i32(tptr), lower=_i32(lower), upper=_i32(upper),
        w_tile=_i32(w_tile), w_block=_i32(w_block), w_first=w_first,
        chunk_edges=ce, n_blocks=int(b1.max()) if n_tiles else 0,
    )


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _i32(a) -> np.ndarray:
    # Keep host-built arrays as numpy: they become device arrays on first
    # jit call.  Eager jnp.asarray here would round-trip every array through
    # the (possibly remote) accelerator at build time.
    return np.ascontiguousarray(np.asarray(a, dtype=np.int32))


def build_segments(
    seg_of_row: np.ndarray,
    n_segments: int,
    tile: int,
    force_rows: Optional[int] = None,
) -> Segments:
    """Group ``n_src`` source rows by segment id, padding each segment to a
    multiple of ``tile`` rows so every row-tile is single-segment.

    ``force_rows`` pads the total to a fixed size (extra invalid rows are
    appended to the last segment) so shards of a partitioned graph share
    identical shapes (het_tpu/parallel/partition.py)."""
    seg_of_row = np.asarray(seg_of_row)
    n_src = int(seg_of_row.shape[0])
    order = native.counting_argsort(seg_of_row, n_segments)
    counts = np.bincount(seg_of_row, minlength=n_segments).astype(np.int64)
    padded = ((counts + tile - 1) // tile * tile) if tile > 1 else counts
    seg_ptrs = np.zeros(n_segments + 1, dtype=np.int64)
    np.cumsum(padded, out=seg_ptrs[1:])
    if force_rows is not None:
        assert force_rows >= seg_ptrs[-1] and force_rows % max(tile, 1) == 0
        seg_ptrs[-1] = force_rows
    n_rows = int(seg_ptrs[-1])

    perm = np.zeros(n_rows, dtype=np.int64)
    row_valid = np.zeros(n_rows, dtype=bool)
    row_seg = np.zeros(n_rows, dtype=np.int64)
    inv = np.zeros(n_src, dtype=np.int64)
    src_ptr = np.zeros(n_segments + 1, dtype=np.int64)
    np.cumsum(counts, out=src_ptr[1:])
    for s in range(n_segments):
        c = counts[s]
        lo = seg_ptrs[s]
        rows = order[src_ptr[s] : src_ptr[s + 1]]
        perm[lo : lo + c] = rows
        inv[rows] = np.arange(lo, lo + c)
        row_valid[lo : lo + c] = True
        row_seg[seg_ptrs[s] : seg_ptrs[s + 1]] = s

    n_tiles = n_rows // tile if tile > 0 else 0
    tile_seg = row_seg[:: tile][:n_tiles] if tile > 0 else row_seg[:0]

    return Segments(
        n_src=n_src,
        n_rows=n_rows,
        n_segments=n_segments,
        tile=tile,
        seg_ptrs_static=tuple(int(p) for p in seg_ptrs),
        seg_ptrs=_i32(seg_ptrs),
        tile_seg=_i32(tile_seg),
        row_seg=_i32(row_seg),
        perm=_i32(perm),
        inv=_i32(inv),
        row_valid=np.ascontiguousarray(row_valid),
    )


def _build_compact(
    rel: np.ndarray,
    node: np.ndarray,
    num_nodes: int,
    num_rels: int,
    tile: int,
    num_padded_edges: int,
    force_rows: Optional[int] = None,
    force_pairs: Optional[int] = None,
) -> CompactInfo:
    """Unique (relation, node) pairs + direct-index edge map.

    Reference semantics: per-relation ``torch.unique`` over the edge endpoint
    slice plus inverse indices (hrt/python/utils_lite/mydgl_graph_methods.py:11
    and kernel_enums.h direct-indexing kind).

    ``force_pairs`` pads the unique-pair count itself with dummy
    (last-relation, sentinel-node) pairs so partitioned shards share one
    static shape (het_tpu/parallel/partition.py): dummy rows gather the
    zero sentinel row forward and are referenced by no edge, so they carry
    exactly zero gradient."""
    pair_rel, pair_node, inverse = native.unique_pairs(
        rel, node, num_nodes, num_rels
    )
    E = int(rel.shape[0])
    return _compact_from_pairs(
        pair_rel, pair_node, np.asarray(inverse), E, num_nodes, num_rels,
        tile, num_padded_edges, force_rows, force_pairs,
    )


def _compact_from_pairs(
    pair_rel, pair_node, inverse, E, num_nodes, num_rels, tile,
    num_padded_edges, force_rows, force_pairs, seg=None, node_ids=None,
) -> CompactInfo:
    """Segment/pad the unique pairs (unless a shared ``seg`` is passed —
    the union-list build) and attach the sorted-scatter metadata."""
    if seg is None:
        pair_rel = pair_rel.astype(np.int64)
        pair_node = pair_node.astype(np.int64)
        if force_pairs is not None:
            extra = force_pairs - int(pair_rel.shape[0])
            assert extra >= 0, (force_pairs, pair_rel.shape[0])
            pair_rel = np.concatenate(
                [pair_rel, np.full(extra, num_rels - 1, dtype=np.int64)]
            )
            pair_node = np.concatenate(
                [pair_node, np.full(extra, num_nodes, dtype=np.int64)]
            )
        seg = build_segments(pair_rel, num_rels, tile, force_rows=force_rows)
        # node id per padded compact row
        node_ids = np.zeros(seg.n_rows, dtype=np.int64)
        node_ids[np.asarray(seg.inv)] = pair_node
    # canonical edge -> padded compact row
    edge_map = np.zeros(num_padded_edges, dtype=np.int64)
    edge_map[:E] = np.asarray(seg.inv)[inverse]

    # sorted-scatter metadata (see CompactInfo): real edges ordered by
    # compact row (padding appended past edge_row_ptr[n_rows], where the
    # reduce kernel's range-compare drops them)
    edge_sort = native.counting_argsort(edge_map[:E], seg.n_rows)
    edge_sort_perm = np.concatenate(
        [edge_sort, np.arange(E, num_padded_edges, dtype=np.int64)]
    )
    edge_row_ptr = np.zeros(seg.n_rows + 1, dtype=np.int64)
    np.cumsum(
        np.bincount(edge_map[:E], minlength=seg.n_rows), out=edge_row_ptr[1:]
    )
    # compact rows ordered by node id; invalid (padding) rows and dummy
    # forced-pair rows (sentinel node) sort last, past node_row_ptr[-1],
    # where the reduce kernel's range compare drops them
    rv = np.asarray(seg.row_valid)
    real_node = rv & (node_ids < num_nodes)
    node_key = np.where(real_node, node_ids, num_nodes)
    node_sort_perm = native.counting_argsort(node_key, num_nodes + 1)
    node_row_ptr = np.zeros(num_nodes + 1, dtype=np.int64)
    np.cumsum(
        np.bincount(node_ids[real_node], minlength=num_nodes),
        out=node_row_ptr[1:],
    )
    return CompactInfo(
        seg=seg,
        node_ids=_i32(node_ids),
        edge_map=_i32(edge_map),
        edge_sort_perm=_i32(edge_sort_perm),
        edge_row_ptr=_i32(edge_row_ptr),
        edge_tables=build_tile_tables(edge_row_ptr, seg.n_rows),
        node_sort_perm=_i32(node_sort_perm),
        node_row_ptr=_i32(node_row_ptr),
        node_tables=build_tile_tables(node_row_ptr, num_nodes),
    )


def _build_compact_union(
    rel, src, dst, node_space, num_rels, tile, num_padded_edges,
    force_rows=None, force_pairs=None,
):
    """UNION-list compact (the reference's default ``Enabled`` kind,
    hrt/python/utils_lite/mydgl_graph_methods: ``unique(concat([rows,
    cols]))`` per relation — kernel_enums.h:27-47): ONE unique
    (rel, node in srcs-union-dsts) row space shared by both endpoint
    sides, returned as a (src-view, dst-view) CompactInfo pair over the
    SAME padded segment rows.  A projection computed once per union row
    serves el (via the src view) and er (via the dst view) — one
    relational matmul instead of two.  Requires a single node space
    (src_space == num_nodes)."""
    E = int(rel.shape[0])
    rel2 = np.concatenate([rel, rel])
    node2 = np.concatenate([src, dst])
    pair_rel, pair_node, inverse = native.unique_pairs(
        rel2, node2, node_space, num_rels
    )
    inverse = np.asarray(inverse)
    info_src = _compact_from_pairs(
        pair_rel, pair_node, inverse[:E], E, node_space, num_rels, tile,
        num_padded_edges, force_rows, force_pairs,
    )
    info_dst = _compact_from_pairs(
        None, None, inverse[E:], E, node_space, num_rels, tile,
        num_padded_edges, None, None,
        seg=info_src.seg, node_ids=np.asarray(info_src.node_ids),
    )
    return info_src, info_dst


def build_heterograph(
    src: np.ndarray,
    dst: np.ndarray,
    rel: np.ndarray,
    num_nodes: int,
    num_rels: Optional[int] = None,
    *,
    ntype_offsets: Optional[Sequence[int]] = None,
    rel_names: Optional[Sequence[str]] = None,
    tile: int = 128,
    edge_pad: int = 128,
    edge_extra: int = 1024,
    build_compact: bool = True,
    compact_union: bool = False,
    force_sizes: Optional[dict] = None,
    src_space: Optional[int] = None,
    node_ntype: Optional[np.ndarray] = None,
) -> HeteroGraph:
    """Build a :class:`HeteroGraph` from COO arrays (any edge order).

    ``tile`` controls relation-segment padding granularity (128 for MXU
    production graphs; tests may use 8). ``edge_pad`` pads the canonical edge
    arrays to a lane multiple with sentinel edges ``dst == num_nodes``;
    ``edge_extra`` adds guard rows so Pallas chunked DMA (fixed chunk size up
    to 1024 starting at any real-edge offset) never reads past the array.
    """
    src = np.asarray(src).astype(np.int64).ravel()
    dst = np.asarray(dst).astype(np.int64).ravel()
    rel = np.asarray(rel).astype(np.int64).ravel()
    E = int(src.shape[0])
    assert dst.shape[0] == E and rel.shape[0] == E
    if num_rels is None:
        num_rels = int(rel.max()) + 1 if E else 1
    if src_space is None:
        src_space = num_nodes
    if E:
        assert src.min() >= 0 and src.max() < src_space, "src out of range"
        assert dst.min() >= 0 and dst.max() < num_nodes, "dst out of range"
        assert rel.min() >= 0 and rel.max() < num_rels, "rel out of range"
    assert max(num_nodes, src_space) < 2**31 and E < 2**31, \
        "int32 index overflow"

    # canonical order: stable sort by (dst, rel, src); native counting
    # sort when the C++ library is built, numpy lexsort otherwise
    order = native.canonical_sort(
        src, dst, rel, max(num_nodes, src_space), num_rels
    )
    c_src, c_dst, c_rel = src[order], dst[order], rel[order]
    c_eid = order  # canonical position -> original edge id

    force_sizes = force_sizes or {}
    EP = max(round_up(E, edge_pad), edge_pad) + round_up(edge_extra, edge_pad)
    EP = max(EP, force_sizes.get("num_padded_edges", 0))
    pad = EP - E
    p_src = np.concatenate([c_src, np.full(pad, src_space, dtype=np.int64)])
    p_dst = np.concatenate([c_dst, np.full(pad, num_nodes, dtype=np.int64)])
    p_rel = np.concatenate([c_rel, np.zeros(pad, dtype=np.int64)])
    p_eid = np.concatenate([c_eid, np.zeros(pad, dtype=np.int64)])

    in_deg = np.bincount(c_dst, minlength=num_nodes).astype(np.int64)
    out_deg = np.bincount(c_src, minlength=src_space).astype(np.int64)
    in_row_ptr = np.zeros(num_nodes + 1, dtype=np.int64)
    np.cumsum(in_deg, out=in_row_ptr[1:])

    # src-sorted permutation of canonical positions (for backward aggregation)
    out_order = native.counting_argsort(c_src, src_space + 1)
    out_perm = np.concatenate([out_order, np.full(pad, EP - 1 if pad else 0,
                                                  dtype=np.int64)])
    if pad:
        # padding slots of out_perm must point at padding edges (sentinel dst)
        out_perm[E:] = np.arange(E, EP)
    out_row_ptr = np.zeros(src_space + 1, dtype=np.int64)
    np.cumsum(out_deg, out=out_row_ptr[1:])

    # Relation segments cover ALL padded edge slots (padding edges go to
    # relation 0 but are marked invalid), so `inv` maps the full canonical
    # edge space and per-edge results read back at shape (EP, ...).
    edge_rel_seg = build_segments(
        p_rel, num_rels, tile,
        force_rows=force_sizes.get("edge_rel_rows"),
    )
    erv = np.asarray(edge_rel_seg.row_valid) & (
        p_src[np.asarray(edge_rel_seg.perm)] < src_space
    )
    edge_rel_seg = dataclasses.replace(
        edge_rel_seg, row_valid=np.ascontiguousarray(erv)
    )

    # node types: either contiguous ranges (ntype_offsets) or an explicit
    # per-node array (partitioned shards, where a contiguous dst-range can
    # span type boundaries — het_tpu/parallel/partition.py)
    if node_ntype is not None:
        node_ntype = np.asarray(node_ntype, dtype=np.int64)
        assert node_ntype.shape[0] == num_nodes
        num_ntypes = int(node_ntype.max()) + 1 if num_nodes else 1
        if ntype_offsets is None:
            ntype_offsets = (0, num_nodes)
        ntype_offsets = tuple(int(o) for o in ntype_offsets)
        num_ntypes = max(num_ntypes, len(ntype_offsets) - 1)
        ntype_seg = build_segments(
            node_ntype, num_ntypes, tile,
            force_rows=force_sizes.get("ntype_rows"),
        )
    else:
        if ntype_offsets is None:
            ntype_offsets = (0, num_nodes)
        ntype_offsets = tuple(int(o) for o in ntype_offsets)
        num_ntypes = len(ntype_offsets) - 1
        if num_ntypes > 1:
            node_ntype = np.zeros(num_nodes, dtype=np.int64)
            for t in range(num_ntypes):
                node_ntype[ntype_offsets[t] : ntype_offsets[t + 1]] = t
            ntype_seg = build_segments(
                node_ntype, num_ntypes, tile,
                force_rows=force_sizes.get("ntype_rows"),
            )
        else:
            ntype_seg = build_segments(
                np.zeros(num_nodes, dtype=np.int64), 1, tile,
                force_rows=force_sizes.get("ntype_rows"),
            )

    compact_src = compact_dst = None
    if build_compact:
        if compact_union:
            assert src_space == num_nodes, (
                "union-list compact needs one node space (single-chip); "
                "partitioned shards use the dual-list kind"
            )
            compact_src, compact_dst = _build_compact_union(
                c_rel, c_src, c_dst, num_nodes, num_rels, tile, EP,
                force_rows=force_sizes.get("compact_src_rows"),
                force_pairs=force_sizes.get("compact_src_pairs"),
            )
        else:
            compact_src = _build_compact(
                c_rel, c_src, src_space, num_rels, tile, EP,
                force_rows=force_sizes.get("compact_src_rows"),
                force_pairs=force_sizes.get("compact_src_pairs"),
            )
            compact_dst = _build_compact(
                c_rel, c_dst, num_nodes, num_rels, tile, EP,
                force_rows=force_sizes.get("compact_dst_rows"),
                force_pairs=force_sizes.get("compact_dst_pairs"),
            )
        # canonical (dst, rel) runs: contiguous in canonical order, so
        # dst-compact reductions need no edge permute (CompactInfo)
        if E:
            change = (c_dst[1:] != c_dst[:-1]) | (c_rel[1:] != c_rel[:-1])
            starts = np.concatenate(
                [[0], np.nonzero(change)[0] + 1]
            ).astype(np.int64)
        else:
            starts = np.zeros(0, dtype=np.int64)
        n_runs = int(starts.shape[0])
        # one run per real unique (dst, rel) pair; forced dummy pairs pad
        # the run table with empty [E, E) ranges so shard shapes match
        runs_cap = compact_dst.seg.n_src
        assert n_runs <= runs_cap, (n_runs, runs_cap)
        canon_ptr = np.concatenate(
            [starts, np.full(runs_cap - n_runs + 1, E, dtype=np.int64)]
        )
        run_row = np.asarray(compact_dst.edge_map)[starts]
        to_run = np.full(compact_dst.seg.n_rows, runs_cap, dtype=np.int64)
        to_run[run_row] = np.arange(n_runs, dtype=np.int64)
        compact_dst = dataclasses.replace(
            compact_dst,
            canon_ptr=_i32(canon_ptr),
            canon_to_row=_i32(to_run),
            canon_tables=build_tile_tables(canon_ptr, runs_cap),
        )
        # src-side composed maps in edge_sort_perm order (CompactInfo
        # docstring): backward payloads build directly in the sorted-
        # reduce's edge order from small-source gathers, skipping the
        # EP-row payload permute.  Padding entries read row 0 (finite;
        # the kernel's range compare drops them).
        permS = np.asarray(compact_src.edge_sort_perm).astype(np.int64)
        pad = permS >= E
        self_m = np.asarray(compact_src.edge_map)[permS]
        peer_m = np.where(pad, 0, np.asarray(compact_dst.edge_map)[permS])
        dst_m = np.where(pad, 0, p_dst[permS])
        inv_m = np.empty(EP, dtype=np.int64)
        inv_m[permS] = np.arange(EP, dtype=np.int64)
        compact_src = dataclasses.replace(
            compact_src,
            perm_self_map=_i32(self_m),
            perm_peer_map=_i32(peer_m),
            perm_dst=_i32(dst_m),
            perm_inv=_i32(inv_m),
        )

    if rel_names is None:
        rel_names = tuple(f"rel{i}" for i in range(num_rels))

    return HeteroGraph(
        compact_shared=bool(build_compact and compact_union),
        num_nodes=int(num_nodes),
        num_edges=E,
        num_padded_edges=EP,
        num_rels=int(num_rels),
        num_ntypes=num_ntypes,
        ntype_offsets=ntype_offsets,
        rel_names=tuple(rel_names),
        src=_i32(p_src),
        dst=_i32(p_dst),
        rel=_i32(p_rel),
        eid_orig=_i32(p_eid),
        in_row_ptr=_i32(in_row_ptr),
        edge_rel_seg=edge_rel_seg,
        out_perm=_i32(out_perm),
        out_row_ptr=_i32(out_row_ptr),
        ntype_seg=ntype_seg,
        compact_src=compact_src,
        compact_dst=compact_dst,
        in_deg=_i32(in_deg),
        out_deg=_i32(out_deg),
        in_tables=build_tile_tables(in_row_ptr, num_nodes),
        out_tables=build_tile_tables(out_row_ptr, src_space),
        num_src_space=0 if src_space == num_nodes else int(src_space),
    )


def reverse_heterograph(g: HeteroGraph, **kw) -> HeteroGraph:
    """Graph with every edge reversed (reference ``transpose``,
    hrt/python/utils/mydgl_graph.py:233). Rebuilds all derived structures."""
    E = g.num_edges
    src = np.asarray(g.dst)[:E]
    dst = np.asarray(g.src)[:E]
    rel = np.asarray(g.rel)[:E]
    return build_heterograph(
        src,
        dst,
        rel,
        g.num_nodes,
        g.num_rels,
        ntype_offsets=g.ntype_offsets,
        rel_names=g.rel_names,
        tile=g.edge_rel_seg.tile,
        **kw,
    )
