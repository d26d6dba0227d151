"""Relation/type-typed segment matmul — the framework's workhorse op.

TPU-native replacement for the reference's gather-GEMM-scatter template
``_basic_MatMulKernel`` (hrt/include/DGLHackKernel/RGNN/
my_shmem_sgemm_func.cu.h:14-35) and its torch export
``rgnn_relational_matmul`` / ``rgnn_relational_matmul_no_scatter_gather_list``
(hrt/include/DGLHackKernel/OpExport/RGNNOps.inc.h:93-238,744).

One core serves every variant, exactly like the reference's single template:

* per-edge typed linear (gather rows by edge src/dst),
* compact typed linear (rows = unique (relation, node) pairs),
* per-node-type linear (rows = nodes grouped by ntype; HGT k/q/v/a),

because each is just a :class:`~het_tpu.graph.Segments` row space plus a
row -> feature-row index map.  Relation raggedness is resolved at graph-build
time into tile-aligned segments, so the compute is a clean batched MXU matmul
with per-tile weight selection — the role the per-relation block scheduler
(mysgemm_KernelsBlockConfigurations.h:44-148) plays on GPU.

The XLA path below is the reference implementation and CPU/interpret oracle;
the Pallas kernel (het_tpu/ops/pallas/segment_mm.py) avoids materializing
per-tile weight gathers by scalar-prefetching ``tile_seg``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.structures import HeteroGraph, Segments
from .common import gather_nodes, take_rows

Array = jax.Array


def segment_matmul_rows(
    x_rows: Array, w: Array, seg: Segments, *, accum_dtype=jnp.float32
) -> Array:
    """Multiply padded segment rows by their segment's weight.

    x_rows: (n_rows, K) or (n_rows, H, K); w: (S, H, K, O) -> (n_rows, H, O).
    """
    S, H, K, O = w.shape
    nt, T = seg.n_tiles, seg.tile
    wt = jnp.take(w, seg.tile_seg, axis=0)  # (nt, H, K, O)
    if x_rows.ndim == 2:
        xt = x_rows.reshape(nt, T, K)
        y = jnp.einsum(
            "tbk,thko->tbho", xt, wt, preferred_element_type=accum_dtype
        )
    else:
        assert x_rows.shape[1] == H or x_rows.shape[1] == 1
        xt = x_rows.reshape(nt, T, x_rows.shape[1], K)
        y = jnp.einsum(
            "tbhk,thko->tbho", xt, wt, preferred_element_type=accum_dtype
        )
    return y.reshape(seg.n_rows, H, O).astype(x_rows.dtype)


def segment_matmul(x_rows: Array, w: Array, seg: Segments) -> Array:
    """Backend-dispatching segment matmul (XLA tile-batched einsum or the
    Pallas kernel set in ops/pallas/segment_mm.py).

    Weights beyond the VMEM-residency budget use the XLA path even on the
    pallas backend: the streamed per-tile Pallas variant is correct but
    measured ~2x slower than XLA's gather-einsum at wikikg2-like relation
    counts (535 rels, K=128) — per-grid-step overhead dominates."""
    from . import get_backend

    if get_backend() == "pallas":
        import numpy as np

        from .pallas.segment_mm import (
            W_RESIDENT_BYTES,
            segment_matmul_rows_pallas,
        )

        if w.size * np.dtype(w.dtype).itemsize <= W_RESIDENT_BYTES:
            return segment_matmul_rows_pallas(x_rows, w, seg)
    return segment_matmul_rows(x_rows, w, seg)


@jax.custom_vjp
def _gather_rows_injective(x, perm, inv, row_valid):
    """``x[perm]`` zeroed on invalid rows, where perm/inv are mutually
    inverse injections (each source row appears exactly once among valid
    rows).  The transpose is then ``ct[inv]`` — a gather, not XLA's
    unsorted scatter-add (~4x slower on TPU)."""
    rows = take_rows(x, jnp.where(row_valid, perm, 0))
    mask = row_valid.reshape((-1,) + (1,) * (rows.ndim - 1))
    return jnp.where(mask, rows, jnp.zeros_like(rows))


def _gri_fwd(x, perm, inv, row_valid):
    return _gather_rows_injective(x, perm, inv, row_valid), inv


def _gri_bwd(inv, ct):
    return take_rows(ct, inv), None, None, None


_gather_rows_injective.defvjp(_gri_fwd, _gri_bwd)


def typed_linear(
    x: Array, w: Array, seg: Segments, row_idx: Optional[Array] = None
) -> Array:
    """Gather feature rows into the padded segment space and apply the
    per-segment weight. Returns (n_rows, H, O); read back per-source-row
    results with ``seg.scatter_back``.

    ``row_idx`` maps padded rows to rows of ``x`` (sentinel ``x.shape[0]``
    allowed -> zero row). Defaults to the segment permutation itself (source
    rows of the segment space index ``x`` directly, e.g. ntype), in which
    case the gather is injective and gets a gather-transpose VJP."""
    if row_idx is None:
        x_rows = _gather_rows_injective(x, seg.perm, seg.inv, seg.row_valid)
    else:
        x_rows = gather_nodes(x, row_idx)
    return segment_matmul(x_rows, w, seg)


def _edge_row_idx(g: HeteroGraph, side: str) -> Array:
    idx = g.src if side == "src" else g.dst
    sentinel = g.src_space if side == "src" else g.num_nodes
    seg = g.edge_rel_seg
    return jnp.where(
        seg.row_valid, jnp.take(idx, seg.perm), jnp.int32(sentinel)
    )


def _make_edge_row_gather(side: str):
    """Custom-VJP gather of node features into the edge-segment row space.

    The automatic backward is an unsorted scatter-add over per-row node
    ids (~6 ms on mag); the transpose here instead hops through edge space
    (injective row->edge gather) and lands in a *sorted* segment reduction
    over the src/dst CSR — the framework's fast aggregation path."""

    @jax.custom_vjp
    def gather(x, g, seg):
        from .common import gather_nodes as _gn

        return _gn(x, _edge_row_idx(g, side))

    def fwd(x, g, seg):
        return gather(x, g, seg), (g, seg)

    def bwd(res, ct_rows):
        from .common import scatter_sum_dst, scatter_sum_src, take_rows

        g, seg = res
        ct_e = take_rows(ct_rows, seg.inv)  # injective rows -> edges
        dx = (
            scatter_sum_src(g, ct_e)
            if side == "src"
            else scatter_sum_dst(g, ct_e)
        )
        return dx, None, None

    gather.defvjp(fwd, bwd)
    return gather


_gather_edge_rows = {
    "src": _make_edge_row_gather("src"),
    "dst": _make_edge_row_gather("dst"),
}


def edge_typed_linear(
    g: HeteroGraph, x: Array, w: Array, side: str = "src"
) -> Array:
    """Per-edge typed linear: y_e = x[side(e)] @ W[rel(e)].

    Returns (num_padded_edges, H, O) in canonical (dst-sorted) edge order;
    padding edges are exactly zero.  Reference: ``rgnn_relational_matmul``
    with separate-COO gather lists (RGNNOps.inc.h:93-238)."""
    x_rows = _gather_edge_rows[side](x, g, g.edge_rel_seg)
    rows = segment_matmul(x_rows, w, g.edge_rel_seg)
    return g.edge_rel_seg.scatter_back(rows)


@jax.custom_vjp
def _compact_gather(x, row_idx, info):
    return gather_nodes(x, row_idx)


def _cg_fwd(x, row_idx, info):
    return gather_nodes(x, row_idx), info


def _cg_bwd(info, ct):
    # transpose of the (node -> compact row) gather: permute cotangent rows
    # into node-sorted order and run the *sorted* one-hot segment reduction
    # (invalid padding rows sort past node_row_ptr[-1] and are dropped by
    # the kernel's range compare)
    from .pallas.seg_reduce import seg_sum_sorted_pallas_raw

    shape = ct.shape
    flat = ct.reshape(shape[0], -1)
    vals_p = take_rows(flat, info.node_sort_perm)
    N = info.node_row_ptr.shape[0] - 1
    out = seg_sum_sorted_pallas_raw(
        vals_p,
        info.node_row_ptr,
        N,
        info.seg.n_rows - info.seg.n_src,  # padding rows = DMA guard
        tables=info.node_tables,
    )
    return out.reshape((N,) + shape[1:]), None, None


_compact_gather.defvjp(_cg_fwd, _cg_bwd)


def compact_typed_linear(
    g: HeteroGraph, x: Array, w: Array, side: str = "src"
) -> Array:
    """Compact-materialized typed linear over unique (relation, node) rows.

    Returns (compact_n_rows, H, O) in padded compact space.  Implements
    Hector's compact materialization (reference kind=Enabled/DirectIndexing,
    RGNNOps.inc.h:238 + kernel_enums.h:27-47): the matmul runs once per
    unique (rel, node) instead of once per edge."""
    from . import get_backend

    info = g.compact_src if side == "src" else g.compact_dst
    assert info is not None, "graph built without compact indices"
    sentinel = g.src_space if side == "src" else g.num_nodes
    seg = info.seg
    row_idx = jnp.where(seg.row_valid, info.node_ids, jnp.int32(sentinel))
    if get_backend() == "pallas":
        x_rows = _compact_gather(x, row_idx, info)
        return segment_matmul(x_rows, w, seg)
    return typed_linear(x, w, seg, row_idx)


@jax.custom_vjp
def _expand_compact_sorted(c, info, g):
    return take_rows(c, info.edge_map)


def _ecs_fwd(c, info, g):
    return take_rows(c, info.edge_map), (info, g)


def _ecs_bwd(res, ct):
    # transpose of the compact -> edge expansion as a sorted reduction over
    # compact-row-ordered edges: the TPU-native equivalent of the
    # reference's single-sided compact aggregation kernels
    # (rgat_layers_and_funcs.py:826, rgcn_layers_and_funcs.py:782) — no
    # unsorted scatter anywhere (measured ~6 ms -> ~1 ms at mag scale)
    from .pallas.seg_reduce import seg_sum_sorted_pallas_raw

    info, g = res
    shape = ct.shape
    flat = ct.reshape(shape[0], -1)
    vals_p = take_rows(flat, info.edge_sort_perm)
    n_rows = info.seg.n_rows
    out = seg_sum_sorted_pallas_raw(
        vals_p,
        info.edge_row_ptr,
        n_rows,
        g.num_padded_edges - g.num_edges,
        tables=info.edge_tables,
    )
    return out.reshape((n_rows,) + shape[1:]), None, None


_expand_compact_sorted.defvjp(_ecs_fwd, _ecs_bwd)


def expand_compact(g: HeteroGraph, c: Array, side: str = "src") -> Array:
    """Expand compact (rel, node) rows to per-edge canonical order.

    Reference: ``rgnn_gather_compact_to_non_compact``
    (RGNNOps.inc.h:446-560). Padding edges get row 0's value; mask downstream
    where it matters (aggregations drop padding lanes by construction).

    On the pallas backend the backward runs as a sorted segment reduction
    over ``CompactInfo.edge_sort_perm`` instead of XLA's unsorted
    scatter-add."""
    from . import get_backend

    info = g.compact_src if side == "src" else g.compact_dst
    assert info is not None
    # measured: the sorted-kernel backward beats XLA's unsorted scatter
    # even for H-column logit cotangents (e2e 27.8 vs 32.2 ms on mag when
    # narrow expansions were gated back to the scatter)
    if get_backend() == "pallas" and info.edge_sort_perm is not None:
        return _expand_compact_sorted(c, info, g)
    return take_rows(c, info.edge_map)


@jax.custom_vjp
def _edge_rel_inner_core(feat_e, a, rel, seg: Segments):
    from .common import take_rows

    return jnp.einsum("e...d,e...d->e...", feat_e, take_rows(a, rel))


def _eri_fwd(feat_e, a, rel, seg):
    return _edge_rel_inner_core(feat_e, a, rel, seg), (feat_e, a, rel, seg)


def _eri_bwd(res, ct):
    from .common import take_rows

    feat_e, a, rel, seg = res
    a_e = take_rows(a, rel)
    d_feat = ct[..., None] * a_e
    fr = take_rows(feat_e, seg.perm)
    cr = take_rows(ct, seg.perm)
    cr = jnp.where(
        seg.row_valid.reshape((-1,) + (1,) * (cr.ndim - 1)), cr, 0.0
    )
    from . import get_backend

    R, H, D = a.shape
    if get_backend() == "pallas":
        from .pallas.segment_mm import segment_matmul_rows_dw

        da = segment_matmul_rows_dw(
            fr, cr[..., None], (R, H, D, 1), seg
        )[..., 0].astype(a.dtype)
    else:
        da = jax.ops.segment_sum(
            (fr * cr[..., None]).reshape(seg.n_rows, H * D),
            seg.row_seg,
            num_segments=R,
            indices_are_sorted=True,
        ).reshape(R, H, D)
    return d_feat, da, None, None


_edge_rel_inner_core.defvjp(_eri_fwd, _eri_bwd)


def edge_rel_inner(g: HeteroGraph, feat_e: Array, a: Array) -> Array:
    """score_e[h] = <feat_e[h, :], a[rel_e, h, :]> — the attention-logit
    inner product (reference computes it as a degenerate relational matmul,
    hrt/python/RGAT/models.py:284).

    Custom VJP: the naive einsum's dA is an unsorted (EP, H, D) scatter by
    relation (~20 ms on mag); routing it through the relation-sorted dW
    Pallas kernel makes it a sorted revisit accumulation.  Traced operands
    flow through arguments (shard_map-safe); ``seg`` is a pytree argument
    whose cotangent is None."""
    return _edge_rel_inner_core(feat_e, a, g.rel, g.edge_rel_seg)


def ntype_linear(g: HeteroGraph, x: Array, w: Array) -> Array:
    """Per-node-type linear: y_n = x[n] @ W[ntype(n)], returned at node rows.

    Reference: ``rgnn_relational_matmul_no_scatter_gather_list``
    (RGNNOps.inc.h:744; used for HGT k/q/v/a projections)."""
    assert g.ntype_seg is not None
    rows = typed_linear(x, w, g.ntype_seg)
    return g.ntype_seg.scatter_back(rows)
