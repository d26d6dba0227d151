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

from functools import lru_cache, partial
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


def STATIC_MIX_TOPK() -> int:
    """Number of largest relations given dedicated static-sliced matmuls in
    the hybrid large-R path (device sweep: top64 = 2.61 ms, top128 =
    2.68 ms, top32 = 3.18 ms, all-static = 3.30 ms, gather-einsum = 3.43 ms
    at wikikg2 scale — docs/SEGMM_STRATEGIES_r2.json).  Resolved through
    the per-TPU-generation tuning table (ops/pallas/tuning.py)."""
    from .pallas.tuning import get_table

    return get_table().static_mix_topk


@lru_cache(maxsize=None)
def _static_mix_plan(ptrs, k_static):
    """Plan of ('mm', lo, hi, rel) / ('gather', lo, hi) items covering the
    padded row space in order.  The ``k_static`` largest relations get
    dedicated entries; contiguous runs of the rest merge into gather
    chunks.  All bounds are Python ints (trace-time constants)."""
    import numpy as np

    ptrs = np.asarray(ptrs)
    R = len(ptrs) - 1
    sizes = ptrs[1:] - ptrs[:-1]
    big = set(np.argsort(sizes)[::-1][:k_static].tolist())
    plan = []
    r = 0
    while r < R:
        if r in big and sizes[r] > 0:
            plan.append(("mm", int(ptrs[r]), int(ptrs[r + 1]), r))
            r += 1
        else:
            r0 = r
            while r < R and not (r in big and sizes[r] > 0):
                r += 1
            if ptrs[r] > ptrs[r0]:
                plan.append(("gather", int(ptrs[r0]), int(ptrs[r]), r0))
    return tuple(plan)


def _static_mix_fwd_impl(x_rows, w, seg, k_static):
    """Static-hybrid segment matmul for beyond-VMEM weight tensors.

    Relation row offsets are host-known at graph build
    (``Segments.seg_ptrs_static``), so the largest relations each get a
    dense matmul over a *statically sliced* row range — zero gather
    traffic, the memory-roofline path — while the small-relation tail
    runs through the tile-batched gather-einsum.  This is the TPU-native
    answer to the reference's per-relation block scheduler at high
    relation counts (mysgemm_KernelsBlockConfigurations.h:44-148): the
    schedule is resolved at trace time instead of per kernel launch.

    Fully differentiable as plain jnp: dW of a static piece is another
    static matmul; dX is the slice transpose (one fused pad/concat).
    Compile cost is ~15 s at R=535 (one-time per graph shape).

    Matmul precision is the XLA default (bf16 passes, f32 accumulation) —
    the same numerics as the XLA gather-einsum baseline; measured HIGHEST
    costs +0.9 ms at wikikg2 scale (compute-bound) and nothing at mag
    scale."""
    S, H, K, O = w.shape
    T = seg.tile
    plan = _static_mix_plan(seg.seg_ptrs_static, k_static)
    x3 = x_rows.ndim == 3
    if x3 and x_rows.shape[1] == 1:
        x_rows, x3 = x_rows[:, 0, :], False
    pieces = []
    for kind, lo, hi, r0 in plan:
        xs = jax.lax.slice_in_dim(x_rows, lo, hi)
        if kind == "mm":
            eq = "bhk,hko->bho" if x3 else "bk,hko->bho"
            y = jnp.einsum(eq, xs, w[r0],
                           preferred_element_type=jnp.float32)
        else:
            ntc = (hi - lo) // T
            wt = jnp.take(w, seg.tile_seg[lo // T : hi // T], axis=0)
            if x3:
                y = jnp.einsum(
                    "tbhk,thko->tbho", xs.reshape(ntc, T, H, K), wt,
                    preferred_element_type=jnp.float32,
                )
            else:
                y = jnp.einsum(
                    "tbk,thko->tbho", xs.reshape(ntc, T, K), wt,
                    preferred_element_type=jnp.float32,
                )
            y = y.reshape(hi - lo, H, O)
        pieces.append(y.astype(x_rows.dtype))
    return jnp.concatenate(pieces, axis=0)


def _static_mix_bwd_impl(x_rows, w, seg, k_static, ct):
    """Mirror of the static-mix plan for the pullback: per-piece dX over
    DISJOINT row ranges concatenates directly.  (jax.grad of the forward
    turns each piece's slice-transpose into a full-length pad + add — six
    88.7 MB pad fusions in the plain-RGAT backward HLO, ~1 GB of pure pad
    traffic at mag-sample scale.)"""
    S, H, K, O = w.shape
    T = seg.tile
    plan = _static_mix_plan(seg.seg_ptrs_static, k_static)
    x3 = x_rows.ndim == 3
    hx1 = x3 and x_rows.shape[1] == 1
    if hx1:
        x_rows, x3 = x_rows[:, 0, :], False
    pf = jnp.float32
    dx_pieces = []
    dw = jnp.zeros((S, H, K, O), pf)
    for kind, lo, hi, r0 in plan:
        xs = jax.lax.slice_in_dim(x_rows, lo, hi)
        cts = jax.lax.slice_in_dim(ct, lo, hi)  # (b, H, O)
        if kind == "mm":
            if x3:
                dx = jnp.einsum("bho,hko->bhk", cts, w[r0],
                                preferred_element_type=pf)
                dwr = jnp.einsum("bhk,bho->hko", xs, cts,
                                 preferred_element_type=pf)
            else:
                dx = jnp.einsum("bho,hko->bk", cts, w[r0],
                                preferred_element_type=pf)
                dwr = jnp.einsum("bk,bho->hko", xs, cts,
                                 preferred_element_type=pf)
            dw = dw.at[r0].add(dwr)
        else:
            ntc = (hi - lo) // T
            tseg = seg.tile_seg[lo // T : hi // T]
            wt = jnp.take(w, tseg, axis=0)
            ct_t = cts.reshape(ntc, T, H, O)
            if x3:
                xt = xs.reshape(ntc, T, H, K)
                dx = jnp.einsum("tbho,thko->tbhk", ct_t, wt,
                                preferred_element_type=pf)
                dwt = jnp.einsum("tbhk,tbho->thko", xt, ct_t,
                                 preferred_element_type=pf)
            else:
                xt = xs.reshape(ntc, T, K)
                dx = jnp.einsum("tbho,thko->tbk", ct_t, wt,
                                preferred_element_type=pf)
                dwt = jnp.einsum("tbk,tbho->thko", xt, ct_t,
                                 preferred_element_type=pf)
            dx = dx.reshape((hi - lo,) + x_rows.shape[1:])
            dw = dw + jax.ops.segment_sum(dwt, tseg, num_segments=S)
        dx_pieces.append(dx.astype(x_rows.dtype))
    dxf = jnp.concatenate(dx_pieces, axis=0)
    if hx1:
        dxf = dxf[:, None, :]
    return dxf, dw


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _static_mix_vjp(x_rows, w, seg, k_static):
    return _static_mix_fwd_impl(x_rows, w, seg, k_static)


def _smv_fwd(x_rows, w, seg, k_static):
    return _static_mix_fwd_impl(x_rows, w, seg, k_static), (x_rows, w, seg)


def _smv_bwd(k_static, res, ct):
    x_rows, w, seg = res
    dx, dw = _static_mix_bwd_impl(
        x_rows, w, seg, k_static, ct.astype(jnp.float32)
    )
    return dx, dw.astype(w.dtype), None


_static_mix_vjp.defvjp(_smv_fwd, _smv_bwd)


def segment_matmul_static_mix(
    x_rows: Array, w: Array, seg: Segments, *, k_static: int = None
) -> Array:
    from .common import match_vma

    if k_static is None:
        k_static = STATIC_MIX_TOPK()
    return _static_mix_vjp(x_rows, match_vma(x_rows, w), seg, k_static)


def ragged_segment_matmul(
    x_rows: Array, w: Array, seg: Segments, *, accum_dtype=jnp.float32
) -> Array:
    """Grouped-GEMM segment matmul via ``jax.lax.ragged_dot`` — the
    TPU-native (MoE-style) grouped matmul over relation-sorted rows.

    Unlike the gather-einsum form this never materializes a per-tile
    weight gather: XLA's ragged-dot lowering walks the group boundaries
    directly, which is what makes it win at large relation counts
    (wikikg2: R=535; see docs/SEGMM_STRATEGIES_r2.json).  Plays the role
    of the reference's relation-scheduled SGEMM at high R
    (hrt/include/DGLHackKernel/RGNN/mysgemm_KernelsBlockConfigurations.h).

    x_rows: (n_rows, K) or (n_rows, H|1, K); w: (S, H, K, O).
    Rows must be segment-sorted (they are, by construction); padded rows
    are zero so group sizes may include them harmlessly."""
    S, H, K, O = w.shape
    gs = jnp.asarray(jnp.diff(jnp.asarray(seg.seg_ptrs)), jnp.int32)
    x3 = x_rows.ndim == 3
    Hx = x_rows.shape[1] if x3 else 1
    outs = []
    for h in range(H):
        lhs = x_rows[:, h % Hx, :] if x3 else x_rows
        outs.append(
            jax.lax.ragged_dot(
                lhs,
                w[:, h],
                gs,
                preferred_element_type=accum_dtype,
            )
        )
    return jnp.stack(outs, axis=1).astype(x_rows.dtype)


def segment_matmul(x_rows: Array, w: Array, seg: Segments) -> Array:
    """Backend-dispatching segment matmul.

    pallas backend (measured choices, docs/SEGMM_STRATEGIES_r2.json):

    * relation offsets host-known (the normal case) -> the static-hybrid
      plan (``segment_matmul_static_mix``): per-relation static-sliced
      dense matmuls + gather-einsum tail.  Zero gather traffic; wins at
      EVERY relation count measured — mag-like 0.32 ms vs 1.52 ms
      (W-resident Pallas kernel) vs 1.27 ms (gather-einsum), wikikg2
      (R=535) 2.58 ms vs 3.37 ms gather-einsum (round 1 silently fell
      back to XLA there) vs 5.1 ms streamed-DMA Pallas;
    * static offsets unavailable (SPMD shards whose per-shard relation
      sizes differ, legacy pickles) -> the W-resident Pallas kernel for
      small weights, gather-einsum beyond the VMEM budget.
    """
    from . import get_backend

    if get_backend() == "pallas":
        import numpy as np

        from .pallas.segment_mm import (
            W_RESIDENT_BYTES,
            segment_matmul_rows_pallas,
        )

        if seg.seg_ptrs_static is not None:
            return segment_matmul_static_mix(x_rows, w, seg)
        if w.size * np.dtype(w.dtype).itemsize <= W_RESIDENT_BYTES:
            from .common import match_vma

            return segment_matmul_rows_pallas(
                x_rows, match_vma(x_rows, w), seg
            )
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
        from .common import scatter_sum_dst, take_rows
        from .pallas.seg_reduce import seg_sum_sorted_packed
        from . import get_backend

        g, seg = res
        if side == "src" and get_backend() == "pallas":
            # COMPOSED permute (round-3 probe): rows -> canon (seg.inv)
            # and canon -> src order (g.out_perm) are both full-payload
            # row gathers (~2.2 ms each for (EP, 64) at mag scale); the
            # composition inv[out_perm] is a cheap (EP,) int gather, so
            # the payload moves ONCE, fused into the reduce's pack pass.
            shape = ct_rows.shape
            flat = ct_rows.reshape(shape[0], -1)
            C = flat.shape[1]
            perm = take_rows(seg.inv, g.out_perm)
            ct_src = take_rows(flat, perm)  # (EP, C) src-sorted
            out = seg_sum_sorted_packed(
                [ct_src],
                C,
                flat.dtype,
                g.out_row_ptr,
                g.src_space,
                g.num_padded_edges,
                g.num_edges,
                g.out_tables,
            )[:, :C]
            dx = out.reshape((g.src_space,) + shape[1:]).astype(
                ct_rows.dtype
            )
            return dx, None, None
        ct_e = take_rows(ct_rows, seg.inv)  # injective rows -> edges
        if side == "src":
            from .common import scatter_sum_src

            dx = scatter_sum_src(g, ct_e)
        else:
            dx = scatter_sum_dst(g, ct_e)
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
    # the kernel's range compare).  Packed entry: narrow payloads fold
    # instead of zero-padding to 128 lanes, and the permute fuses into the
    # payload-pack pass.
    from .pallas.seg_reduce import seg_sum_sorted_packed

    shape = ct.shape
    flat = ct.reshape(shape[0], -1)
    C = flat.shape[1]
    N = info.node_row_ptr.shape[0] - 1
    out = seg_sum_sorted_packed(
        [flat],
        C,
        flat.dtype,
        info.node_row_ptr,
        N,
        info.seg.n_rows,
        info.seg.n_src,
        info.node_tables,
        perm=info.node_sort_perm,
    )[:, :C]
    return out.reshape((N,) + shape[1:]).astype(ct.dtype), None, None


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
    from .pallas.seg_reduce import seg_sum_sorted_packed

    info, g = res
    shape = ct.shape
    flat = ct.reshape(shape[0], -1)
    C = flat.shape[1]
    n_rows = info.seg.n_rows
    out = seg_sum_sorted_packed(
        [flat],
        C,
        flat.dtype,
        info.edge_row_ptr,
        n_rows,
        g.num_padded_edges,
        g.num_edges,
        info.edge_tables,
        perm=info.edge_sort_perm,
    )[:, :C]
    return out.reshape((n_rows,) + shape[1:]).astype(ct.dtype), None, None


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

    import numpy as _np

    info = g.compact_src if side == "src" else g.compact_dst
    assert info is not None
    # per-shape dispatch (round-4): the sorted-kernel backward pays a flat
    # edge permute + folded reduce, which only amortizes on payloads of
    # >= ~16 lanes; for narrower cotangents ((EP, H) logit expansions)
    # XLA's scatter-add lowering measured ~3.5x faster at mag scale
    # (docs/BREAKDOWN_r3.md: 27.8 vs 7.9 ms fwd+grad at H=4), so those
    # route to the XLA path on both backends
    lanes = int(_np.prod(c.shape[1:]))
    if (
        get_backend() == "pallas"
        and info.edge_sort_perm is not None
        and lanes >= 16
    ):
        return _expand_compact_sorted(c, info, g)
    return take_rows(c, info.edge_map)


@jax.custom_vjp
def _compact_dst_inner_core(c2d, x, g):
    return _cdi_fwd(c2d, x, g)[0]


def _cdi_fwd(c2d, x, g):
    EP = g.num_padded_edges
    H, dk = x.shape[1], x.shape[2]
    c_e = take_rows(c2d, g.compact_dst.edge_map).reshape(EP, H, dk)
    x_e = gather_nodes(x, g.src).reshape(EP, H, dk)
    score = jnp.sum(
        c_e.astype(jnp.float32) * x_e.astype(jnp.float32), axis=-1
    )
    return score.astype(x.dtype), (c2d, x, g)


def _cdi_bwd(res, ct):
    from .common import scatter_sum_src

    c2d, x, g = res
    infoD = g.compact_dst
    EP = g.num_padded_edges
    H, dk = x.shape[1], x.shape[2]
    ct = ct.astype(jnp.float32)
    x_e = gather_nodes(x, g.src).reshape(EP, H, dk).astype(jnp.float32)
    # d_c: cotangents reduce into dst-compact rows over canonical
    # (dst, rel) runs — contiguous by construction, no edge permute;
    # packed entry folds narrow H*dk payloads instead of zero-padding
    payload_c = (ct[..., None] * x_e).reshape(EP, H * dk)
    n_runs = int(infoD.canon_ptr.shape[0]) - 1
    from .pallas.seg_reduce import seg_sum_sorted_packed

    red = seg_sum_sorted_packed(
        [payload_c],
        H * dk,
        payload_c.dtype,
        infoD.canon_ptr,
        n_runs,
        EP,
        g.num_edges,
        infoD.canon_tables,
    )
    d_c = gather_nodes(red, infoD.canon_to_row)[:, : H * dk]
    # d_x: src-sorted segment reduction (the framework's fast src scatter)
    c_e = take_rows(c2d, infoD.edge_map).reshape(EP, H, dk)
    payload_x = (ct[..., None] * c_e.astype(jnp.float32)).reshape(EP, H * dk)
    d_x = scatter_sum_src(g, payload_x).reshape(g.src_space, H, dk)
    return d_c.astype(c2d.dtype), d_x.astype(x.dtype), None


_compact_dst_inner_core.defvjp(_cdi_fwd, _cdi_bwd)


def compact_dst_inner(g: HeteroGraph, c_dst: Array, x_src: Array) -> Array:
    """score_e[h] = <c_dst[compact_dst_row(e), h, :], x_src[src(e), h, :]> —
    the single-sided compact SDDMM (HGT attention score with the
    attn·q product materialized once per unique (rel, dst)).

    c_dst (UCd, H, dk) destination-compact rows; x_src (src_space, H, dk)
    per-node.  Per-edge expansions exist only inside this op; the backward
    reduces d_c over canonical (dst, rel) runs with no edge permute.
    Reference: compact attention-score path (hrt/python/HGT/models.py:179-210)
    + inner product kernels (RGNN/InnerProduct.cu.h), compact resolution
    kernel_enums.h:100-119."""
    from . import get_backend

    UC, H, dk = c_dst.shape
    if get_backend() == "pallas" and g.compact_dst.canon_ptr is not None:
        return _compact_dst_inner_core(c_dst.reshape(UC, H * dk), x_src, g)
    c_e = expand_compact(g, c_dst, side="dst")
    return jnp.sum(c_e * gather_nodes(x_src, g.src), axis=-1)


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
    from .common import match_vma

    return _edge_rel_inner_core(
        feat_e, match_vma(feat_e, a), g.rel, g.edge_rel_seg
    )


def ntype_linear(g: HeteroGraph, x: Array, w: Array) -> Array:
    """Per-node-type linear: y_n = x[n] @ W[ntype(n)], returned at node rows.

    Reference: ``rgnn_relational_matmul_no_scatter_gather_list``
    (RGNNOps.inc.h:744; used for HGT k/q/v/a projections)."""
    assert g.ntype_seg is not None
    rows = typed_linear(x, w, g.ntype_seg)
    return g.ntype_seg.scatter_back(rows)
