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
) -> Tuple[HeteroGraph, PartitionInfo]:
    """Split edges into ``n_parts`` contiguous destination ranges; return
    identically-shaped per-part HeteroGraphs **stacked** on a leading axis
    (shard with ``jax.sharding.PartitionSpec('dp')``) plus the relabeling.

    ``balance='nodes'``: uniform dst ranges (edge skew absorbed by sentinel
    padding).  ``balance='edges'``: range boundaries chosen on the
    cumulative in-degree so each shard owns ~E/P edges — the degree-aware
    split skewed graphs need (the distributed analogue of the reference's
    infidel degree sort, hrt/python/utils/coo_sorters.py:173).  Shard
    shapes are padded to the across-shard max either way (SPMD)."""
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
        return build_heterograph(
            info.relabel(src[m]),
            dst[m] - info.part_range(p)[0],
            rel[m],
            num_nodes=per,
            num_rels=num_rels,
            tile=tile,
            build_compact=build_compact,
            force_sizes=force,
            src_space=n_glob,
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
    stacked = _stack_graphs(parts)
    return stacked, info


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
