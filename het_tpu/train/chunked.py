"""Chunked (dst-range) full-graph execution on ONE chip.

Why this exists (round-5 full-scale diagnosis, docs/TRACE_FULL_r5.md): at
21M-edge mag scale XLA lays the big narrow per-edge arrays out col-major
to dodge the (8, 128) tile padding a row-major layout would cost
(a padded (21M, 32) f32 buffer is 10.8 GB), and col-major row gathers run
at ~6 GB/s per element — the step collapses from 53 Medges/s
(sample-scale regime) to ~10-16.  The fix is not more layout coercion but
keeping every per-edge buffer at the sample-scale size where the
row-major regime holds: split the canonical (dst-sorted) edge space into
K contiguous destination ranges — the SAME partitioning the multi-chip
layer uses (parallel/partition.partition_by_dst) — and ``lax.map`` the
layer over the K shard subgraphs, with ``jax.checkpoint`` on the shard
body so the backward re-materializes one shard at a time.

Edge softmax chunks EXACTLY: canonical order is dst-sorted, so a dst
range owns every edge of its destinations and the per-dst softmax
normalization is shard-local.  Weight gradients sum across shards through
the scan's transpose; source-feature gradients accumulate into the
padded-global feature space.

This is the single-chip twin of the distributed data layout: the shard
graphs index the padded-global source space (``halo='gather'``), so the
layer body is bit-identical to the multi-chip all-gather path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.structures import HeteroGraph

Array = jax.Array


def _is_stacked(g, k: int) -> bool:
    try:
        return jax.tree.leaves(g)[0].shape[0] == k and g.src.ndim == 2
    except Exception:
        return False


class ChunkedRGATModel:
    """RGAT over K dst-range chunks of one graph (single chip).

    Interface mirrors the other driver models (init/apply) except the
    graph is bound at construction (``build``): the chunking is part of
    the executable's data layout.  ``apply`` returns logits in ORIGINAL
    node order.  Deterministic only (chunked runs are the capacity /
    benchmark path; dropout would need per-shard key plumbing through
    lax.map)."""

    def __init__(
        self,
        in_feat: int,
        hidden: int,
        num_classes: int,
        num_rels: int,
        num_heads: int = 1,
        num_layers: int = 1,
        compact: bool = False,
        multiply_first: bool = False,
        stable_softmax="clip",
        n_chunks: int = 8,
        unroll: bool = True,
        param_dtype=jnp.float32,
    ):
        from ..models.rgat import RGATLayer

        self.dims = [in_feat] + [hidden] * (num_layers - 1) + [num_classes]
        self.n_chunks = n_chunks
        self.unroll = unroll
        self.num_layers = num_layers
        self.layers = [
            RGATLayer(
                in_feat=self.dims[i],
                out_feat=self.dims[i + 1],
                num_rels=num_rels,
                num_heads=num_heads,
                compact=compact,
                multiply_first=multiply_first,
                dropout=0.0,
                stable_softmax=stable_softmax,
                activation=jax.nn.relu if i < num_layers - 1 else None,
                param_dtype=param_dtype,
            )
            for i in range(num_layers)
        ]
        self.sg = None  # stacked shard graphs (K, ...)

    def build(
        self,
        g: HeteroGraph,
        *,
        tile: int = 128,
        balance: str = "edges",
        compact_built: bool = True,
    ) -> None:
        """Partition ``g``'s COO into K dst-range shard graphs."""
        from ..parallel.partition import partition_by_dst

        E = g.num_edges
        src = np.asarray(g.src)[:E]
        dst = np.asarray(g.dst)[:E]
        rel = np.asarray(g.rel)[:E]
        # drop sentinel-source padding edges (src == src_space)
        keep = (src < g.num_nodes) & (dst < g.num_nodes)
        sg, info = partition_by_dst(
            src[keep], dst[keep], rel[keep], g.num_nodes, g.num_rels,
            self.n_chunks, tile=tile, build_compact=compact_built,
            balance=balance, halo="gather",
        )
        self.sg = sg
        self.info = info
        # original node id -> padded-global row, and its sentinel-filled
        # inverse (device gathers; built host-side once)
        N = g.num_nodes
        self.relabel_idx = np.asarray(
            info.relabel(np.arange(N)), dtype=np.int32
        )
        inv = np.full(info.num_padded_global_nodes, N, dtype=np.int32)
        inv[self.relabel_idx] = np.arange(N, dtype=np.int32)
        self.orig_of_padded = inv

    def init(self, key, g: HeteroGraph, x: Array):
        assert self.sg is not None, "call build(g) first"
        g0 = jax.tree.map(lambda a: a[0], self.sg)
        from ..ops.common import gather_nodes

        x_glob = gather_nodes(x, jnp.asarray(self.orig_of_padded))
        per = self.info.nodes_per_part
        params = []
        h = x_glob
        for layer in self.layers:
            key, k = jax.random.split(key)
            p = layer.init(k, g0, h, x_dst=h[:per])
            params.append(p)
            h = jnp.tile(
                layer.apply(p, g0, h, x_dst=h[:per]),
                (self.n_chunks, 1),
            )
        return params

    def apply(
        self, params, g, x: Array, *,
        deterministic: bool = True, rngs=None,
    ) -> Array:
        """``g`` may be the STACKED shard pytree (pass ``model.sg`` as
        the jit argument — a closure would bake 21M-edge constants into
        the HLO and blow the remote-compile request) or any placeholder
        when tracing with ``self.sg`` bound."""
        sg = g if _is_stacked(g, self.n_chunks) else self.sg
        assert sg is not None
        from ..ops.common import gather_nodes

        K = self.n_chunks
        per = self.info.nodes_per_part
        h_glob = gather_nodes(x, jnp.asarray(self.orig_of_padded))
        for layer, p in zip(self.layers, params):
            def per_shard(args, layer=layer, p=p, h_glob=h_glob):
                g_k, x_dst_k = args
                return layer.apply(p, g_k, h_glob, x_dst=x_dst_k)

            x_dst = h_glob.reshape(K, per, h_glob.shape[1])
            if self.unroll:
                # UNROLLED: a straightline program of K sample-scale
                # sub-programs.  Measured necessary: inside a lax.map
                # while body XLA lays the narrow per-edge arrays
                # col-major even at sample-scale shard sizes (the K=4
                # sample chunk run fell to 22.9 Medges/s vs 54
                # monolithic), and no remat is needed — chunking here is
                # about LAYOUT, not memory.
                # jax.checkpoint per shard: without it the straightline
                # form keeps all K shards' row-major tile-padded
                # residuals live into the backward (bf16 (E_k, 32)
                # buffers pad 4-32x) and OOMs at full mag; with it the
                # backward holds one shard's working set at a time
                ck = jax.checkpoint(per_shard)
                h = jnp.stack([
                    ck(jax.tree.map(lambda a, k=k: a[k], (sg, x_dst)))
                    for k in range(K)
                ])
            else:
                h = jax.lax.map(jax.checkpoint(per_shard), (sg, x_dst))
            h_glob = h.reshape(K * per, h.shape[-1])
        # back to original node order
        return gather_nodes(h_glob, jnp.asarray(self.relabel_idx))
