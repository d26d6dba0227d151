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
    orig_per_part: int  # original contiguous node-range size per part
    nodes_per_part: int  # padded (tile-aligned) per-shard node count
    num_global_nodes: int  # original N (pre-relabel)

    @property
    def num_padded_global_nodes(self) -> int:
        return self.n_parts * self.nodes_per_part

    def relabel(self, node_ids: np.ndarray) -> np.ndarray:
        """Original node id -> padded-global id."""
        node_ids = np.asarray(node_ids)
        part = node_ids // self.orig_per_part
        local = node_ids % self.orig_per_part
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
) -> Tuple[HeteroGraph, PartitionInfo]:
    """Split edges into ``n_parts`` contiguous destination ranges; return
    identically-shaped per-part HeteroGraphs **stacked** on a leading axis
    (shard with ``jax.sharding.PartitionSpec('dp')``) plus the relabeling.

    Node-balanced; edge-count skew is absorbed by sentinel padding so SPMD
    shapes stay static."""
    src = np.asarray(src).astype(np.int64).ravel()
    dst = np.asarray(dst).astype(np.int64).ravel()
    rel = np.asarray(rel).astype(np.int64).ravel()
    orig_per = -(-num_nodes // n_parts)
    per = round_up(orig_per, max(tile, 128))
    info = PartitionInfo(
        n_parts=n_parts,
        orig_per_part=orig_per,
        nodes_per_part=per,
        num_global_nodes=num_nodes,
    )
    n_glob = info.num_padded_global_nodes
    part_of_dst = dst // orig_per

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
        lo = p * orig_per
        hi = min(lo + orig_per, num_nodes)
        out = np.zeros(per, dtype=np.int64)
        out[: hi - lo] = node_ntype_glob[lo:hi]
        return out

    def build_part(p: int, force: Optional[dict]) -> HeteroGraph:
        m = part_of_dst == p
        return build_heterograph(
            info.relabel(src[m]),
            dst[m] - p * orig_per,
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
    # relation-0 segment (padding edges live there), so edge_rel row counts
    # are only final once EP is fixed
    parts = [build_part(p, None) for p in range(n_parts)]
    force = {
        k: max(_force_size_keys(g)[k] for g in parts)
        for k in _force_size_keys(parts[0])
    }
    force.pop("edge_rel_rows")
    parts = [build_part(p, force) for p in range(n_parts)]
    force["edge_rel_rows"] = max(g.edge_rel_seg.n_rows for g in parts)
    parts = [build_part(p, force) for p in range(n_parts)]
    # num_edges is static; unify to the max (extra slots are sentinel edges)
    import dataclasses

    max_e = max(g.num_edges for g in parts)
    parts = [dataclasses.replace(g, num_edges=max_e) for g in parts]
    stacked = _stack_graphs(parts)
    return stacked, info


def _stack_graphs(graphs) -> HeteroGraph:
    """Stack identically-shaped HeteroGraphs on a new leading axis."""
    leaves = [jax.tree.leaves(g) for g in graphs]
    treedef = jax.tree.structure(graphs[0])
    stacked = [np.stack(ls, axis=0) for ls in zip(*leaves)]
    return jax.tree.unflatten(treedef, stacked)


def unstack_local(g_stacked: HeteroGraph) -> HeteroGraph:
    """Inside shard_map: drop the (length-1) leading shard axis."""
    return jax.tree.map(lambda a: a[0], g_stacked)
