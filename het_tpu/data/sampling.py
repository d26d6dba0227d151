"""Minibatch neighborhood sampling for very large graphs.

Reference: ``convert_sampled_iteration_to_mydgl_graph`` /
``get_mydgl_graph_dataloader`` over DGL message-flow-graph blocks
(hrt/python/utils/mydglgraph_converters.py:18-103).  DGL is absent here;
this is a self-contained host-side fanout sampler producing standard
HeteroGraphs (so the whole op/kernels stack applies unchanged to
minibatches).  Shapes vary per batch; for jit-stability pass
``force_sizes``-style padding via ``pad_edges_to``."""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np

from ..graph.build import build_heterograph
from ..graph.convert import coo_to_csr
from ..graph.structures import HeteroGraph


class NeighborSampler:
    """Uniform fanout sampling of in-neighborhoods around seed nodes."""

    def __init__(
        self,
        src: np.ndarray,
        dst: np.ndarray,
        rel: np.ndarray,
        num_nodes: int,
        num_rels: int,
        fanout: int = 10,
        num_hops: int = 2,
        seed: int = 0,
    ):
        self.src = np.asarray(src).astype(np.int64)
        self.dst = np.asarray(dst).astype(np.int64)
        self.rel = np.asarray(rel).astype(np.int64)
        self.num_nodes = num_nodes
        self.num_rels = num_rels
        self.fanout = fanout
        self.num_hops = num_hops
        self.rng = np.random.default_rng(seed)
        # in-CSR for O(1) neighborhood lookup
        data = np.stack([self.src, self.rel], axis=1)
        self.ptr, _, packed = coo_to_csr(self.dst, self.src, data,
                                         num_nodes)
        self.nbr_src = packed[:, 0]
        self.nbr_rel = packed[:, 1]

    def sample(self, seeds: np.ndarray, *, tile: int = 8,
               pad_edges_to: Optional[int] = None,
               pad_nodes_to: Optional[int] = None,
               build_compact: bool = False) -> tuple:
        """Returns (subgraph, node_map) where node_map[i] = original id of
        local node i; seeds occupy the first ``len(seeds)`` local ids.

        The traversal hot loop runs in the native C++ library when built
        (hetg_sample_fanout), with this python loop as the fallback —
        identical contract, different RNG streams."""
        seeds = np.asarray(seeds).astype(np.int64)
        from ..graph import native

        cap_e = pad_edges_to or (
            len(seeds)
            * sum(self.fanout ** h for h in range(1, self.num_hops + 1))
            + 1
        )
        cap_n = pad_nodes_to or (cap_e + len(seeds))
        got = native.sample_fanout(
            self.ptr, self.nbr_src, self.nbr_rel, seeds,
            self.fanout, self.num_hops,
            int(self.rng.integers(0, 2**63 - 1)), self.num_nodes,
            cap_e, cap_n,
        )
        if got is not None:
            edges_s, edges_d, edges_r, node_map = got
            return self._finalize(
                list(edges_s), list(edges_d), list(edges_r), node_map,
                tile, pad_edges_to, pad_nodes_to, build_compact,
            )
        frontier = seeds
        edges_s, edges_d, edges_r = [], [], []
        visited = dict((int(s), i) for i, s in enumerate(seeds))
        for _ in range(self.num_hops):
            nxt = []
            for v in frontier:
                lo, hi = self.ptr[v], self.ptr[v + 1]
                deg = hi - lo
                if deg == 0:
                    continue
                take = (
                    np.arange(lo, hi)
                    if deg <= self.fanout
                    else self.rng.choice(
                        np.arange(lo, hi), self.fanout, replace=False
                    )
                )
                for t in take:
                    u = int(self.nbr_src[t])
                    if u not in visited:
                        visited[u] = len(visited)
                        nxt.append(u)
                    edges_s.append(visited[u])
                    edges_d.append(visited[int(v)])
                    edges_r.append(int(self.nbr_rel[t]))
            frontier = np.asarray(nxt, dtype=np.int64)
            if frontier.size == 0:
                break
        n_local = len(visited)
        node_map = np.empty(n_local, dtype=np.int64)
        for orig, local in visited.items():
            node_map[local] = orig
        return self._finalize(
            edges_s, edges_d, edges_r, node_map, tile, pad_edges_to,
            pad_nodes_to, build_compact,
        )

    def _finalize(self, edges_s, edges_d, edges_r, node_map, tile,
                  pad_edges_to, pad_nodes_to, build_compact=False):
        n_local = len(node_map)
        # shape-stable batches: pad node count (extra isolated nodes,
        # mapped to node 0's features) and edge/segment row totals so jit
        # caches hit across batches
        if pad_nodes_to is not None:
            assert pad_nodes_to >= n_local, (n_local, pad_nodes_to)
            node_map = np.concatenate(
                [node_map, np.zeros(pad_nodes_to - n_local, np.int64)]
            )
        num_nodes = pad_nodes_to or n_local
        force = None
        if pad_edges_to:
            t = max(tile, 1)
            force = {
                "num_padded_edges": pad_edges_to,
                "edge_rel_rows": -(-pad_edges_to // t) * t
                + self.num_rels * t,
                "ntype_rows": -(-num_nodes // t) * t,
            }
            if build_compact:
                # compact tables are per-batch-shaped; force them to the
                # worst-case static bound (every edge its own unique
                # (rel, node) pair) so jit caches hit across batches —
                # same mechanism as compact-on-shards
                # (parallel/partition.py::_force_size_keys)
                rows_cap = -(-pad_edges_to // t) * t + self.num_rels * t
                force.update(
                    compact_src_pairs=pad_edges_to,
                    compact_dst_pairs=pad_edges_to,
                    compact_src_rows=rows_cap,
                    compact_dst_rows=rows_cap,
                )
        sub = build_heterograph(
            np.asarray(edges_s),
            np.asarray(edges_d),
            np.asarray(edges_r),
            num_nodes=num_nodes,
            num_rels=self.num_rels,
            tile=tile,
            force_sizes=force,
            build_compact=build_compact,
        )
        return sub, node_map

    def batches(
        self, nodes: Sequence[int], batch_size: int, **kw
    ) -> Iterator[tuple]:
        nodes = np.asarray(nodes)
        for i in range(0, len(nodes), batch_size):
            yield self.sample(nodes[i : i + batch_size], **kw)
