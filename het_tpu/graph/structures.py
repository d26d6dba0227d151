"""Core graph containers: ``Segments`` and ``HeteroGraph`` pytrees.

TPU-native replacement for the reference's ``MyDGLGraph`` nested-dict container
(reference: hrt/python/utils/mydgl_graph.py:81) and its TorchScript twin
(hrt/python/utils/scripted_mydgl_graph.py) — a frozen dataclass registered as
a JAX pytree jits cleanly, so a single structure serves both roles.

Design notes (TPU-first, not a translation):

* **Canonical edge order is destination-sorted.** TPUs have no cheap atomics,
  so every aggregation must be a *sorted* segment reduction.  The reference
  instead keeps an "integrated CSR" + a relation-sorted "separate COO" and
  scatter-adds with ``atomicAdd`` (hrt/include/DGLHackKernel/RGAT/
  RGATKernelsSeparateCOO.cu.h:77,195).  Here, per-edge tensors live in
  dst-sorted order; aggregation over destinations is a contiguous segment sum
  (MXU one-hot reduction inside Pallas kernels, ``segment_sum`` in the XLA
  fallback path).

* **Relation-typed ragged rows become tile-padded segments.**  The MXU wants
  128x128 tiles with static shapes; each relation's row segment is padded to a
  multiple of ``tile`` so that every row-tile belongs to exactly one relation.
  This plays the role of the reference's per-relation block scheduler
  (hrt/include/DGLHackKernel/RGNN/mysgemm_KernelsBlockConfigurations.h:44) —
  but resolved at graph-construction time on the host instead of per launch.

* **Compact materialization is direct-indexed.**  The reference supports both
  binary-search and precomputed-inverse-map resolution of (relation, node) ->
  compact row (``CompactAsOfNodeKind`` in hrt/include/kernel_enums.h:6-14).
  Precomputing the inverse map once on the host strictly dominates on TPU, so
  only the direct-indexing form exists; it is built unconditionally.

* **Edge padding uses a sentinel destination.** Canonical arrays are padded to
  a lane multiple; padding edges carry ``dst == num_nodes`` and are dropped by
  allocating ``num_nodes + 1`` segments and slicing, which keeps both forward
  values and autodiff cotangents of padding lanes exactly zero.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _register(cls, data_fields, meta_fields):
    jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )
    return cls


@dataclass(frozen=True)
class Segments:
    """A tile-padded, segment-partitioned row space.

    Generic over what a "segment" is: relations (edge-wise typed ops), node
    types (per-ntype linears, replacing the reference's
    ``rgnn_relational_matmul_no_scatter_gather_list`` row segmentation —
    hrt/include/DGLHackKernel/OpExport/RGNNOps.inc.h:744), or relations over
    unique-(rel, node) compact rows.

    ``n_rows`` is the padded total; every segment occupies
    ``seg_ptrs[s]:seg_ptrs[s+1]`` which is a multiple of ``tile`` long, so
    row-tile ``t`` is entirely inside segment ``tile_seg[t]``.
    """

    # -- static metadata --
    n_src: int  # number of real (unpadded) source rows
    n_rows: int  # padded total rows
    n_segments: int
    tile: int

    # -- arrays (all int32 except row_valid) --
    seg_ptrs: Array  # (n_segments + 1,) padded row offsets per segment
    tile_seg: Array  # (n_rows // tile,) segment id per row-tile
    row_seg: Array  # (n_rows,) segment id per padded row
    perm: Array  # (n_rows,) source-row index per padded row (0 on padding)
    inv: Array  # (n_src,) source row -> padded row
    row_valid: Array  # (n_rows,) bool, False on padding rows

    # host-known copy of seg_ptrs (trace-time constant).  Enables the
    # static-hybrid large-R segment matmul: per-relation STATIC-sliced
    # dense matmuls for the largest relations — zero gather traffic —
    # measured 2.6 ms vs 3.4 ms XLA gather-einsum at wikikg2 scale
    # (docs/SEGMM_STRATEGIES_r2.json).  None on legacy pickles.
    seg_ptrs_static: Optional[Tuple[int, ...]] = None

    @property
    def n_tiles(self) -> int:
        return self.n_rows // self.tile if self.tile else 0

    def gather(self, x: Array) -> Array:
        """Arrange source rows into the padded segment space."""
        from ..ops.common import take_rows

        return take_rows(x, self.perm)

    def scatter_back(self, y: Array) -> Array:
        """Read padded-space rows back into source-row order.  inv/perm are
        inverse injections, so the backward is a masked gather (custom
        VJP), not a scatter."""
        from ..ops.common import take_rows_injective

        return take_rows_injective(y, self.inv, self.perm, self.row_valid)


_register(
    Segments,
    data_fields=("seg_ptrs", "tile_seg", "row_seg", "perm", "inv", "row_valid"),
    meta_fields=("n_src", "n_rows", "n_segments", "tile", "seg_ptrs_static"),
)


@dataclass(frozen=True)
class TileTables:
    """Host-precomputed per-node-tile boundary tables for the one-hot
    segment-reduce kernels (ops/pallas/seg_reduce.py).

    For output tile ``t`` over ``nb`` consecutive segment rows, ``tptr``
    bounds the tile's edge range and ``lower``/``upper`` give each local
    row's ``[row_ptr[v], row_ptr[v+1])`` edge range.  Precomputing these on
    the host matters: producing scalar-prefetch arguments with on-device
    XLA ops measured **+1.0 ms per kernel call** (the pallas grid scheduler
    must synchronize on the XLA compute before it can start).

    ``w_tile``/``w_block``/``w_first`` flatten the ragged (tile x
    edge-block) iteration into a 1-D work list for the pipelined reduce
    kernel: work item ``w`` accumulates edge block ``w_block[w]`` (a
    ``chunk_edges``-wide slab of the payload) into tile ``w_tile[w]``'s
    accumulator, zeroed when ``w_first[w]``.  Driving the kernel grid from
    a host-static work list is what lets Pallas's automatic pipeline
    stream the payload DMA across tiles — the round-2 per-tile manual
    DMA start/wait serialized on DMA latency (measured 1.57 ms to move
    22 MB; the pipelined form is bandwidth-bound).
    """

    nb: int
    tptr: Array  # (n_tiles + 1,)
    lower: Array  # (n_tiles, 1, nb)
    upper: Array  # (n_tiles, 1, nb)
    # -- work list (None on tables built before round 3) --
    w_tile: Optional[Array] = None  # (n_work,)
    w_block: Optional[Array] = None  # (n_work,)
    w_first: Optional[Array] = None  # (n_work,)
    chunk_edges: int = 0  # edge-block width the work list was built for
    n_blocks: int = 0  # max(w_block) + 1


_register(
    TileTables,
    data_fields=("tptr", "lower", "upper", "w_tile", "w_block", "w_first"),
    meta_fields=("nb", "chunk_edges", "n_blocks"),
)


@dataclass(frozen=True)
class CompactInfo:
    """Unique-(relation, node) compact materialization metadata.

    Implements Hector's compact materialization (reference flag
    ``--compact_as_of_node_flag``, hrt/python/RGNNUtils/RGNNUtils.py:670) in
    its direct-indexing form: ``edge_map`` maps each canonical edge to the
    padded compact row of its (relation, endpoint-node) pair — the analogue of
    ``edata_idx_to_inverse_idx`` in hrt/include/kernel_enums.h:100-119.
    """

    seg: Segments  # unique (rel, node) pairs grouped by relation
    node_ids: Array  # (seg.n_rows,) node id per padded compact row
    edge_map: Array  # (num_padded_edges,) canonical edge -> padded compact row

    # -- sorted-scatter metadata: the transposes of ``edge_map`` expansion
    #    and of the node-row gather, reified as *sorted* segmentations so
    #    both backward passes run on the one-hot segment-reduce kernel
    #    instead of XLA's unsorted scatter-add (measured ~6 ms vs ~1 ms at
    #    mag scale).  This is the TPU-native form of the reference's
    #    single-sided compact kernels (rgat_layers_and_funcs.py:826,
    #    rgcn_layers_and_funcs.py:782): aggregate per compact row without
    #    ever scattering. --
    edge_sort_perm: Optional[Array] = None  # (EP,) edges sorted by compact row
    edge_row_ptr: Optional[Array] = None  # (seg.n_rows + 1,)
    edge_tables: Optional[TileTables] = None
    node_sort_perm: Optional[Array] = None  # (seg.n_rows,) rows by node id
    node_row_ptr: Optional[Array] = None  # (node_space + 1,)
    node_tables: Optional[TileTables] = None

    # -- destination-side only: canonical (dst, rel) runs.  The canonical
    #    edge order is sorted by (dst, rel, src), so each dst-compact
    #    row's edges are already CONTIGUOUS — reductions into dst-compact
    #    rows need no edge permutation at all (a 346k-row edge-space
    #    permute measures ~2.25 ms regardless of width; this path skips
    #    it).  ``canon_ptr`` bounds run k's canonical edge range;
    #    ``canon_to_row`` maps compact row -> run index (sentinel n_runs
    #    on padding rows). --
    canon_ptr: Optional[Array] = None  # (n_runs + 1,)
    canon_to_row: Optional[Array] = None  # (seg.n_rows,)
    canon_tables: Optional[TileTables] = None

    # -- source-side only: host-composed index maps in ``edge_sort_perm``
    #    order, so fused-op backwards can build their payload DIRECTLY in
    #    the sorted-reduce's edge order from small-source gathers
    #    (compact rows / node rows) instead of permuting an EP-row payload
    #    (EP-source permutes cannot stage in VMEM and measure 3-4 ms at
    #    mag scale; padding entries point at row 0). --
    perm_self_map: Optional[Array] = None  # edge_map[perm] (monotone)
    perm_peer_map: Optional[Array] = None  # other side's edge_map[perm]
    perm_dst: Optional[Array] = None  # dst[perm]
    perm_inv: Optional[Array] = None  # inverse of edge_sort_perm


_register(
    CompactInfo,
    data_fields=(
        "seg",
        "node_ids",
        "edge_map",
        "edge_sort_perm",
        "edge_row_ptr",
        "edge_tables",
        "node_sort_perm",
        "node_row_ptr",
        "node_tables",
        "canon_ptr",
        "canon_to_row",
        "canon_tables",
        "perm_self_map",
        "perm_peer_map",
        "perm_dst",
        "perm_inv",
    ),
    meta_fields=(),
)


@dataclass(frozen=True)
class HeteroGraph:
    """Relation-partitioned heterogeneous graph, canonical dst-sorted order.

    All per-edge tensors in the framework are indexed by *canonical edge
    position*: edges stably sorted by (dst, rel, src), padded to
    ``num_padded_edges`` with sentinel edges (``dst == num_nodes``).
    """

    # -- static metadata --
    num_nodes: int
    num_edges: int  # real edges
    num_padded_edges: int
    num_rels: int
    num_ntypes: int
    ntype_offsets: Tuple[int, ...]  # length num_ntypes + 1
    rel_names: Tuple[str, ...]

    # -- canonical (dst-sorted) edge arrays, padded, int32 --
    src: Array  # (EP,)
    dst: Array  # (EP,)  == num_nodes on padding
    rel: Array  # (EP,)
    eid_orig: Array  # (EP,) original dataset edge id (input order)
    in_row_ptr: Array  # (num_nodes + 1,) CSR over dst in canonical order

    # -- relation-sorted view for segment matmul (separate-COO analogue,
    #    reference hrt/python/utils/mydgl_graph.py:631-733) --
    edge_rel_seg: Segments

    # -- src-sorted permutation for backward-pass aggregation over sources --
    out_perm: Array  # (EP,) canonical positions sorted by src
    out_row_ptr: Array  # (num_nodes + 1,)

    # -- node-type segments (for per-ntype linears; None if single ntype) --
    ntype_seg: Optional[Segments]

    # -- compact materialization, single-sided (reference
    #    generate_separate_unique_node_indices_single_sided_for_each_etype,
    #    hrt/python/utils/mydgl_graph.py:826-885) --
    compact_src: Optional[CompactInfo]
    compact_dst: Optional[CompactInfo]

    # -- degrees --
    in_deg: Array  # (num_nodes,) int32 over real edges
    out_deg: Array  # (src_space,) int32

    # -- host-precomputed kernel scheduling tables (see TileTables) --
    in_tables: Optional[TileTables] = None  # over in_row_ptr / num_nodes
    out_tables: Optional[TileTables] = None  # over out_row_ptr / src_space

    # Source-index space. Single-chip: == num_nodes (encoded as 0).  On a
    # partitioned shard (het_tpu/parallel): destinations are local
    # (num_nodes = padded per-shard count) while sources index either the
    # padded-global feature space assembled by the halo all-gather, or —
    # when the boundary-exchange arrays below are present — the compact
    # per-shard boundary buffer ``[own rows | per-sender received rows]``.
    num_src_space: int = 0

    # -- boundary-only halo exchange (het_tpu/parallel/dp.halo_exchange) --
    # Built by partition_by_dst(halo='boundary'): this shard's edges index
    # a src space of ``B_self + n_parts * B_off`` rows where rows
    # [0, B_self) are this shard's own sources (``halo_self_idx`` local
    # ids) and block p holds the rows peer p sends it (peer p selects them
    # with row p of ITS ``halo_send_idx``).  Exchanging only these rows
    # over ICI replaces the O(N*F)-per-device all-gather with
    # O(boundary*F) (north star: BASELINE.json boundary all-to-all).
    halo_self_idx: Optional[Array] = None  # (B_self,) local row ids
    halo_send_idx: Optional[Array] = None  # (n_parts, B_off) local row ids

    # True when compact_src/compact_dst are the two VIEWS of one shared
    # union-list row space (the reference's default ``Enabled`` compact
    # kind: unique (rel, node in srcs-union-dsts) rows,
    # kernel_enums.h:27-47) — models may then compute one projection per
    # union row and read el via the src view, er via the dst view.  False
    # = dual-list kind (independent per-side lists).
    compact_shared: bool = False

    @property
    def src_space(self) -> int:
        return self.num_src_space or self.num_nodes

    @property
    def edge_valid(self) -> Array:
        """(EP,) bool mask of real (non-padding) edges."""
        return self.dst < jnp.int32(self.num_nodes)

    def edge_mask(self, x: Array, fill=0) -> Array:
        """Zero (or ``fill``) padding-edge rows of a per-edge tensor."""
        mask = self.edge_valid.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(mask, x, jnp.asarray(fill, dtype=x.dtype))

    @property
    def rel_per_mm_row(self) -> Array:
        return self.edge_rel_seg.row_seg

    def compact_duplication(self, side: str = "src") -> Optional[float]:
        """Edges per unique (relation, node) pair — the factor compact
        materialization divides the typed-linear work by.  Near 1.0 the
        flag only adds the expand indirection (measured: a net SLOWDOWN
        on mag's RGCN at dup ~1.4); the reference treats compact as a win
        on duplicated workloads (paper §compact).  None if compact
        metadata was not built."""
        info = self.compact_src if side == "src" else self.compact_dst
        if info is None:
            return None
        if self.compact_shared and info.edge_map is not None:
            # union-list graphs share ONE (rel, node in srcs-union-dsts)
            # row space between both views, so seg.n_src counts the
            # union and understates per-side duplication; count the
            # side's actually-referenced rows instead (ADVICE r4)
            import numpy as np_

            em = np_.asarray(info.edge_map)[: self.num_edges]
            return self.num_edges / max(len(np_.unique(em)), 1)
        return self.num_edges / max(info.seg.n_src, 1)

    def describe(self) -> str:
        return (
            f"HeteroGraph(nodes={self.num_nodes}, edges={self.num_edges}"
            f" (padded {self.num_padded_edges}), rels={self.num_rels},"
            f" ntypes={self.num_ntypes})"
        )


_register(
    HeteroGraph,
    data_fields=(
        "src",
        "dst",
        "rel",
        "eid_orig",
        "in_row_ptr",
        "edge_rel_seg",
        "out_perm",
        "out_row_ptr",
        "ntype_seg",
        "compact_src",
        "compact_dst",
        "in_deg",
        "out_deg",
        "in_tables",
        "out_tables",
        "halo_self_idx",
        "halo_send_idx",
    ),
    meta_fields=(
        "num_nodes",
        "num_edges",
        "num_padded_edges",
        "num_rels",
        "num_ntypes",
        "ntype_offsets",
        "rel_names",
        "num_src_space",
        "compact_shared",
    ),
)


def replace(obj, **kw):
    return dataclasses.replace(obj, **kw)
