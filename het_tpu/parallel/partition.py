"""Host-side edge partitioning of a heterograph across a device mesh.

The reference is single-GPU (SURVEY.md §2.4: no distributed layer exists);
this module is the new TPU-native scaling axis: contiguous destination-range
partitioning so that

* **aggregation is communication-free** — every edge lives on the shard that
  owns its destination node, so the dst-segment reductions (the only
  scatters in the framework) stay local;
* the only collective in a layer is an **all-gather of source features**
  (boundary/halo exchange), which rides ICI and overlaps with local compute
  under XLA's latency-hiding scheduler;
* gradients of replicated parameters reduce with a single psum (the
  shard_map transpose inserts it automatically).

Shards must be identically shaped for SPMD, so nodes are relabeled into a
padded global space of ``n_parts * nodes_per_part`` and every per-shard
array is padded to the across-shard maximum (sentinel edges / invalid
segment rows — the same mechanisms single-chip padding already uses).
Per-shard graphs use **local destination indexing** (num_nodes = padded
per-shard count) and **padded-global source indexing**
(num_src_space = n_parts * nodes_per_part) — see HeteroGraph.num_src_space.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import numpy as np

from ..graph.build import build_heterograph, round_up
from ..graph.structures import HeteroGraph


@dataclass(frozen=True)
class PartitionInfo:
    n_parts: int
    orig_per_part: int  # uniform node-range size per part (node-balanced)
    nodes_per_part: int  # padded (tile-aligned) per-shard node count
    num_global_nodes: int  # original N (pre-relabel)
    # non-uniform contiguous dst ranges (edge-balanced partitioning):
    # bounds[p] .. bounds[p+1] is part p's original node range.  None =
    # uniform ranges of orig_per_part.
    bounds: Optional[Tuple[int, ...]] = None

    @property
    def num_padded_global_nodes(self) -> int:
        return self.n_parts * self.nodes_per_part

    def part_of(self, node_ids: np.ndarray) -> np.ndarray:
        node_ids = np.asarray(node_ids)
        if self.bounds is None:
            return node_ids // self.orig_per_part
        return (
            np.searchsorted(np.asarray(self.bounds), node_ids, side="right")
            - 1
        )

    def part_range(self, p: int) -> Tuple[int, int]:
        if self.bounds is None:
            lo = p * self.orig_per_part
            return lo, min(lo + self.orig_per_part, self.num_global_nodes)
        return self.bounds[p], self.bounds[p + 1]

    def relabel(self, node_ids: np.ndarray) -> np.ndarray:
        """Original node id -> padded-global id."""
        node_ids = np.asarray(node_ids)
        part = self.part_of(node_ids)
        if self.bounds is None:
            local = node_ids % self.orig_per_part
        else:
            local = node_ids - np.asarray(self.bounds)[part]
        return part * self.nodes_per_part + local

    def pad_node_data(self, data: np.ndarray, fill=0) -> np.ndarray:
        """(N, ...) node-indexed data -> (num_padded_global_nodes, ...)."""
        data = np.asarray(data)
        out = np.full(
            (self.num_padded_global_nodes,) + data.shape[1:],
            fill,
            dtype=data.dtype,
        )
        out[self.relabel(np.arange(self.num_global_nodes))] = data
        return out


jax.tree_util.register_dataclass(
    PartitionInfo,
    data_fields=[],
    meta_fields=[
        "n_parts",
        "orig_per_part",
        "nodes_per_part",
        "num_global_nodes",
        "bounds",
    ],
)


def _force_size_keys(g: HeteroGraph) -> dict:
    d = {
        "num_padded_edges": g.num_padded_edges,
        "edge_rel_rows": g.edge_rel_seg.n_rows,
        "ntype_rows": g.ntype_seg.n_rows,
    }
    if g.compact_src is not None:
        d["compact_src_rows"] = g.compact_src.seg.n_rows
        d["compact_dst_rows"] = g.compact_dst.seg.n_rows
        d["compact_src_pairs"] = g.compact_src.seg.n_src
        d["compact_dst_pairs"] = g.compact_dst.seg.n_src
    return d


def partition_by_dst(
    src: np.ndarray,
    dst: np.ndarray,
    rel: np.ndarray,
    num_nodes: int,
    num_rels: int,
    n_parts: int,
    *,
    tile: int = 128,
    build_compact: bool = False,
    ntype_offsets=None,
    balance: str = "nodes",
    halo: str = "gather",
) -> Tuple[HeteroGraph, PartitionInfo]:
    """Split edges into ``n_parts`` contiguous destination ranges; return
    identically-shaped per-part HeteroGraphs **stacked** on a leading axis
    (shard with ``jax.sharding.PartitionSpec('dp')``) plus the relabeling.

    ``balance='nodes'``: uniform dst ranges (edge skew absorbed by sentinel
    padding).  ``balance='edges'``: range boundaries chosen on the
    cumulative in-degree so each shard owns ~E/P edges — the degree-aware
    split skewed graphs need (the distributed analogue of the reference's
    infidel degree sort, hrt/python/utils/coo_sorters.py:173).  Shard
    shapes are padded to the across-shard max either way (SPMD).

    ``halo`` selects the per-layer source-feature exchange:

    * ``'gather'`` — shards index the padded-global source space; each
      layer all-gathers every node row (O(N*F) per device).
    * ``'boundary'`` — per-(sender, receiver) unique boundary source lists
      are precomputed here; shard edges index a compact per-shard buffer
      ``[own sources | per-sender received rows]`` and each layer
      exchanges ONLY those rows via all_to_all over ICI
      (parallel/dp.halo_exchange) — the north-star boundary exchange
      (BASELINE.json).  SPMD padding: every (p != q) block is padded to
      the across-pair max ``B_off``.
    * ``'auto'`` — boundary, unless the padded boundary buffer is no
      smaller than the all-gather's (badly-partitioned graph), in which
      case gather."""
    src = np.asarray(src).astype(np.int64).ravel()
    dst = np.asarray(dst).astype(np.int64).ravel()
    rel = np.asarray(rel).astype(np.int64).ravel()
    orig_per = -(-num_nodes // n_parts)
    if balance == "edges":
        indeg = np.bincount(dst, minlength=num_nodes)
        cum = np.concatenate([[0], np.cumsum(indeg)])
        targets = np.arange(1, n_parts) * (len(src) / n_parts)
        cuts = np.searchsorted(cum, targets, side="left")
        bounds = np.concatenate([[0], cuts, [num_nodes]])
        # enforce strictly increasing, non-empty ranges
        for p in range(1, n_parts + 1):
            bounds[p] = max(bounds[p], bounds[p - 1] + 1)
        bounds = np.minimum(bounds, num_nodes)
        bounds[-1] = num_nodes
        assert (np.diff(bounds) > 0).all(), "too few nodes for n_parts"
        bounds = tuple(int(b) for b in bounds)
        widest = max(b - a for a, b in zip(bounds[:-1], bounds[1:]))
        per = round_up(widest, max(tile, 128))
    else:
        assert balance == "nodes", balance
        bounds = None
        per = round_up(orig_per, max(tile, 128))
    info = PartitionInfo(
        n_parts=n_parts,
        orig_per_part=orig_per,
        nodes_per_part=per,
        num_global_nodes=num_nodes,
        bounds=bounds,
    )
    n_glob = info.num_padded_global_nodes
    part_of_dst = info.part_of(dst)

    # ---- boundary-exchange source lists (halo='boundary'/'auto') ----
    assert halo in ("gather", "boundary", "auto"), halo
    halo_mode = halo
    bl = b_self = b_off = None
    if halo != "gather":
        part_of_src = info.part_of(src)
        # bl[p][q]: sorted unique original src ids in part p's node range
        # that shard q's edges read
        bl = [[None] * n_parts for _ in range(n_parts)]
        for q in range(n_parts):
            m = part_of_dst == q
            sq, pq = src[m], part_of_src[m]
            for p in range(n_parts):
                bl[p][q] = np.unique(sq[pq == p])
        b_self = max(
            [1] + [len(bl[q][q]) for q in range(n_parts)]
        )
        b_off = max(
            [1]
            + [
                len(bl[p][q])
                for p in range(n_parts)
                for q in range(n_parts)
                if p != q
            ]
        )
        b_self = round_up(b_self, 8)
        b_off = round_up(b_off, 8)
        if halo == "auto" and b_self + n_parts * b_off >= n_parts * per:
            halo_mode = "gather"  # boundary buffer would not be smaller
        else:
            halo_mode = "boundary"

    def _src_boundary_ids(q: int, s: np.ndarray) -> np.ndarray:
        """Original src ids -> shard q's boundary-buffer rows."""
        p = info.part_of(s)
        out = np.empty(len(s), np.int64)
        for pp in range(n_parts):
            mm = p == pp
            if not mm.any():
                continue
            ranks = np.searchsorted(bl[pp][q], s[mm])
            base = 0 if pp == q else b_self + pp * b_off
            out[mm] = base + ranks
        return out

    # per-node types in original ids (contiguous type ranges globally; a
    # shard's dst range may span type boundaries, so shards carry an
    # explicit node_ntype array)
    node_ntype_glob = None
    num_ntypes = 1
    if ntype_offsets is not None:
        ntype_offsets = tuple(int(o) for o in ntype_offsets)
        num_ntypes = len(ntype_offsets) - 1
        node_ntype_glob = np.zeros(num_nodes, dtype=np.int64)
        for t in range(num_ntypes):
            node_ntype_glob[ntype_offsets[t] : ntype_offsets[t + 1]] = t

    def _part_ntype(p: int):
        if node_ntype_glob is None:
            return None
        lo, hi = info.part_range(p)
        out = np.zeros(per, dtype=np.int64)
        out[: hi - lo] = node_ntype_glob[lo:hi]
        return out

    def build_part(p: int, force: Optional[dict]) -> HeteroGraph:
        m = part_of_dst == p
        if halo_mode == "boundary":
            part_src = _src_boundary_ids(p, src[m])
            space = b_self + n_parts * b_off
        else:
            part_src = info.relabel(src[m])
            space = n_glob
        return build_heterograph(
            part_src,
            dst[m] - info.part_range(p)[0],
            rel[m],
            num_nodes=per,
            num_rels=num_rels,
            tile=tile,
            build_compact=build_compact,
            force_sizes=force,
            src_space=space,
            node_ntype=_part_ntype(p),
            ntype_offsets=(0,) * num_ntypes + (per,)
            if node_ntype_glob is not None
            else None,
        )

    # three sizing passes: forcing the padded edge total changes the
    # relation-0 segment (padding edges live there) and forcing the
    # compact PAIR counts grows the last compact segment, so the derived
    # row counts are only final once those are fixed
    parts = [build_part(p, None) for p in range(n_parts)]

    def _maxes(parts, keys):
        return {
            k: max(_force_size_keys(g)[k] for g in parts) for k in keys
        }

    keys0 = set(_force_size_keys(parts[0]))
    force = _maxes(
        parts,
        keys0 - {"edge_rel_rows", "compact_src_rows", "compact_dst_rows"},
    )
    parts = [build_part(p, force) for p in range(n_parts)]
    force.update(
        _maxes(
            parts,
            keys0 & {"edge_rel_rows", "compact_src_rows",
                     "compact_dst_rows"},
        )
    )
    parts = [build_part(p, force) for p in range(n_parts)]
    # num_edges is static; unify to the max (extra slots are sentinel edges)
    import dataclasses

    max_e = max(g.num_edges for g in parts)
    parts = [dataclasses.replace(g, num_edges=max_e) for g in parts]
    if halo_mode == "boundary":
        # per-shard exchange index arrays (HeteroGraph docstring): shard
        # p's own-source rows, and the rows it must SEND to each peer q
        def _local(p: int, ids: np.ndarray, width: int) -> np.ndarray:
            out = np.zeros(width, np.int32)
            out[: len(ids)] = ids - info.part_range(p)[0]
            return out

        for p in range(n_parts):
            send = np.stack(
                [
                    _local(p, bl[p][q] if q != p else bl[p][q][:0], b_off)
                    for q in range(n_parts)
                ]
            )
            parts[p] = dataclasses.replace(
                parts[p],
                halo_self_idx=_local(p, bl[p][p], b_self),
                halo_send_idx=send.astype(np.int32),
            )
    stacked = _stack_graphs(parts)
    return stacked, info


def _pad_worklist(t, n_work: int):
    """Pad a TileTables work list to ``n_work`` items with no-ops: items
    that accumulate the last edge block into the guaranteed-empty last
    tile (build_tile_tables keeps >= 1 fully-empty trailing tile) without
    resetting it — every range compare is empty, so they add nothing."""
    import dataclasses

    cur = int(t.w_tile.shape[0])
    if cur == n_work:
        return t
    n_tiles = int(t.lower.shape[0])
    pad = n_work - cur
    wt = np.concatenate(
        [t.w_tile, np.full(pad, n_tiles - 1, np.int32)]
    )
    wb = np.concatenate(
        [t.w_block, np.full(pad, max(t.n_blocks - 1, 0), np.int32)]
    )
    wf = np.concatenate([t.w_first, np.zeros(pad, np.int32)])
    return dataclasses.replace(t, w_tile=wt, w_block=wb, w_first=wf)


def _unify_tables(parts):
    """SPMD shards must share one treedef and leaf shapes, but tile tables
    are built per shard with density-matched geometry (graph/build.py) and
    data-dependent work-list lengths.  Rebuild diverging tables with the
    across-shard max (nb, chunk_edges) and pad every work list to the max
    length with no-op items."""
    import dataclasses

    from ..graph.build import build_tile_tables

    specs = [
        # (getter: graph -> (tables, ptr, N), setter kwargs path)
        ("in_tables", lambda g: (g.in_tables, g.in_row_ptr, g.num_nodes)),
        ("out_tables", lambda g: (g.out_tables, g.out_row_ptr, g.src_space)),
    ]

    def unify(tabs, ptrs, ns):
        ce = max(t.chunk_edges for t in tabs)
        nb = max(t.nb for t in tabs)
        # n_blocks must also match (meta): rebuild everything when any
        # geometry or block-count field diverges
        if any(
            t.chunk_edges != ce or t.nb != nb
            or t.n_blocks != tabs[0].n_blocks
            for t in tabs
        ):
            tabs = [
                build_tile_tables(np.asarray(p), n, nb=nb, chunk_edges=ce)
                for p, n in zip(ptrs, ns)
            ]
            nbl = max(t.n_blocks for t in tabs)
            tabs = [dataclasses.replace(t, n_blocks=nbl) for t in tabs]
        nw = max(t.w_tile.shape[0] for t in tabs)
        return [_pad_worklist(t, nw) for t in tabs]

    for name, get in specs:
        tabs, ptrs, ns = zip(*[get(g) for g in parts])
        if tabs[0] is None:
            continue
        parts = [
            dataclasses.replace(g, **{name: t})
            for g, t in zip(parts, unify(tabs, ptrs, ns))
        ]

    def unify_ci(cis):
        if cis[0] is None:
            return cis
        edge = unify(
            [c.edge_tables for c in cis],
            [c.edge_row_ptr for c in cis],
            [c.seg.n_rows for c in cis],
        )
        node = unify(
            [c.node_tables for c in cis],
            [c.node_row_ptr for c in cis],
            [int(np.asarray(c.node_row_ptr).shape[0]) - 1 for c in cis],
        )
        canon = None
        if cis[0].canon_tables is not None:
            canon = unify(
                [c.canon_tables for c in cis],
                [c.canon_ptr for c in cis],
                [int(np.asarray(c.canon_ptr).shape[0]) - 1 for c in cis],
            )
        return [
            dataclasses.replace(
                c,
                edge_tables=e,
                node_tables=n,
                canon_tables=canon[i] if canon else c.canon_tables,
            )
            for i, (c, e, n) in enumerate(zip(cis, edge, node))
        ]

    css = unify_ci([g.compact_src for g in parts])
    cds = unify_ci([g.compact_dst for g in parts])
    return [
        dataclasses.replace(g, compact_src=cs, compact_dst=cd)
        for g, cs, cd in zip(parts, css, cds)
    ]


def _drop_unshared_static(parts):
    """Null out ``Segments.seg_ptrs_static`` wherever shards disagree.

    SPMD traces ONE program for all shards, so trace-time-constant
    relation offsets are only usable when identical across shards (per-
    shard relation sizes generally differ; only totals are forced equal).
    Keeping a single shard's offsets would silently mis-slice the rest."""
    import dataclasses

    def fix_seg(segs):
        if segs[0] is None or all(
            s.seg_ptrs_static == segs[0].seg_ptrs_static for s in segs
        ):
            return segs
        return [
            dataclasses.replace(s, seg_ptrs_static=None) for s in segs
        ]

    def fix_ci(cis):
        if cis[0] is None:
            return cis
        segs = fix_seg([c.seg for c in cis])
        return [
            dataclasses.replace(c, seg=s) for c, s in zip(cis, segs)
        ]

    ers = fix_seg([g.edge_rel_seg for g in parts])
    nts = fix_seg([g.ntype_seg for g in parts])
    css = fix_ci([g.compact_src for g in parts])
    cds = fix_ci([g.compact_dst for g in parts])
    return [
        dataclasses.replace(
            g, edge_rel_seg=e, ntype_seg=n, compact_src=cs, compact_dst=cd
        )
        for g, e, n, cs, cd in zip(parts, ers, nts, css, cds)
    ]


def _stack_graphs(graphs) -> HeteroGraph:
    """Stack identically-shaped HeteroGraphs on a new leading axis."""
    graphs = _drop_unshared_static(graphs)
    graphs = _unify_tables(graphs)
    treedef = jax.tree.structure(graphs[0])
    assert all(
        jax.tree.structure(g) == treedef for g in graphs[1:]
    ), "shard treedefs diverge (static metadata mismatch)"
    leaves = [jax.tree.leaves(g) for g in graphs]
    stacked = [np.stack(ls, axis=0) for ls in zip(*leaves)]
    return jax.tree.unflatten(treedef, stacked)


def unstack_local(g_stacked: HeteroGraph) -> HeteroGraph:
    """Inside shard_map: drop the (length-1) leading shard axis."""
    return jax.tree.map(lambda a: a[0], g_stacked)
