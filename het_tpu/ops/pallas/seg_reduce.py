"""Pallas TPU kernel: destination-segment sum over canonical edge order.

The TPU answer to every atomicAdd aggregation in the reference
(RGAT ``gatSumProdZipDivKernel`` scatter stage, RGCN Layer1 accumulation,
HGT mean aggregation — hrt/include/DGLHackKernel/{RGAT,RGCN,HGT}):

* canonical edge order is dst-sorted (het_tpu/graph/build.py), so each
  node tile of ``nb`` destinations owns a contiguous edge range
  ``[ptr[v0], ptr[v0 + nb])`` (the integrated in-CSR the reference also
  aggregates over);
* the kernel walks that ragged range in fixed-size chunks, DMA'ing edge
  values from HBM, and accumulates each chunk into the node tile with a
  **one-hot MXU matmul** — the scatter-free segment reduction (TPUs have
  no usable atomics);
* the one-hot needs no per-edge ids at all: edge ``e`` belongs to local
  node ``n`` iff ``lower[n] <= e < upper[n]``, where ``lower``/``upper``
  are per-tile row-pointer tables streamed as tiny blocked inputs — an
  iota range-compare builds the (chunk, nb) one-hot in registers;
* raggedness across relations/degrees is absorbed by the chunk loop, the
  analogue of the reference's node-per-warp/node-per-block hybrid
  load-balancing (SeastarRGCNKernels.cu.h:75-192) — here load balance is
  inherent because work is proportional to edges, not nodes.

The backward of a segment sum is a (fast, sorted) gather, so the op is
wrapped in ``jax.custom_vjp`` with an XLA gather backward.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..common import out_struct
from ...graph.structures import HeteroGraph
from ..common import gather_dst

Array = jax.Array

# Kernel geometry resolves through the per-TPU-generation tuning table
# (tuning.py, the analogue of the reference's CUDA_ARCHS-keyed macros.h);
# this module is imported lazily at first pallas-op use, after the JAX
# backend is settled.
from .tuning import get_table as _tune  # noqa: E402

NB = _tune().nb  # nodes per output tile
# edges per DMA chunk (max kernel only; the sum path is work-list driven)
CHUNK = _tune().chunk_max
# edges per work-item block of the pipelined sum kernel.  The 1-D grid
# runs over host-precomputed (tile, edge-block) work items so Pallas's
# automatic pipeline streams the payload DMA continuously across tiles —
# the round-2 per-tile manual start/wait serialized on DMA latency
# (1.57 ms to move 22 MB at mag scale; the work-list form is
# bandwidth/MXU-bound).
CHUNK_EDGES = _tune().chunk_edges
# tile-table length padding (kept for table-shape stability)
TABLE_PAD = 8


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _make_wl_kernel(
    W: int, nb: int, rows_pb: int, k: int, bf16_vals: bool,
    interpret: bool = False, combine_lanes: int = 0,
):
    """Work-list segment-sum kernel body.

    One grid step = one work item: accumulate payload block
    ``w_block[w]`` (``rows_pb`` rows x ``W`` lanes; ``rows_pb * k`` edges,
    fold factor ``k``) into tile ``w_tile[w]``'s f32 accumulator via the
    one-hot MXU reduction; the accumulator is zeroed on ``w_first[w]`` and
    written through to the (revisited) output block every step — Pallas
    flushes it to HBM only when the tile index changes, so each tile costs
    one HBM write.  All DMA (payload blocks, boundary tables, output
    flushes) is the automatic pipeline's, double-buffered across grid
    steps.

    ``combine_lanes`` (round-5): when nonzero (= Cp) and k > 1, the k fold
    blocks are combined IN-KERNEL at write-through — the output block is
    (nb, Cp) instead of (nb, 128), cutting the kernel's HBM writes by k
    (the round-4 device trace showed the fold-block outputs dominating the
    reduce custom-calls: 73 MB written for 9 MB useful on the srcC
    reduce).  The combine is a tiny 0/1 matmul (HIGHEST precision — exact
    on the f32 accumulator) replacing the caller-side fold-combine dot."""
    # on TPU the MXU accumulates bf16 products in f32 natively; the
    # interpret-mode (CPU) dot accumulates in the operand dtype, so tests
    # force f32 operands there to keep the reduction exact
    op_dt = jnp.float32 if interpret else jnp.bfloat16
    Cp = W // k

    def kernel(wt_ref, wb_ref, wf_ref, wl_ref, vals_ref, lo_ref, hi_ref,
               out_ref, acc):
        w = pl.program_id(0)

        @pl.when(wf_ref[w] == 1)
        def _():
            acc[...] = jnp.zeros_like(acc)

        lower = lo_ref[0]  # (1, nb)
        upper = hi_ref[0]
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows_pb, 1), 0)
        base = wb_ref[w] * rows_pb  # global payload-row offset
        v = vals_ref[...]
        if bf16_vals or interpret:
            parts = (v.astype(op_dt),)
        else:
            # bf16x3 significand split of the f32 values (24 mantissa
            # bits): 3 bf16 MXU passes instead of the ~6 of
            # Precision.HIGHEST — exact for the 0/1 operand
            v32 = v.astype(jnp.float32)
            v_hi = v32.astype(jnp.bfloat16)
            r1 = v32 - v_hi.astype(jnp.float32)
            v_mid = r1.astype(jnp.bfloat16)
            v_lo = (r1 - v_mid.astype(jnp.float32)).astype(jnp.bfloat16)
            parts = (v_hi, v_mid, v_lo)
        prec = jax.lax.Precision.HIGHEST if interpret else None
        total = acc[...]
        if k == 1:
            gidx = row_iota + base
            onehot = jnp.where(
                (gidx >= lower) & (gidx < upper), 1.0, 0.0
            ).astype(op_dt)  # (rows_pb, nb); exact in bf16
            for part in parts:
                total = total + jax.lax.dot_general(
                    onehot, part,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    # interpret mode may execute on a real TPU where
                    # default f32 dot precision rounds operands to bf16
                    precision=prec,
                )
        else:
            # STACKED one-hot: all k fold slots in one (rows, k*nb)
            # operand -> one MXU dot per part instead of k lane-masked
            # sub-dots (24 small dots/step measured 1.9 us/step; the
            # stacked form is 3 wide dots + one VPU extract).  Fold slot
            # jj's result lands in output rows [jj*nb, (jj+1)*nb); the
            # extract keeps only its own lane block, so cross-block
            # pollution cancels exactly as in the masked form.
            lane_jj = (
                jax.lax.broadcasted_iota(jnp.int32, (rows_pb, k * nb), 1)
                // nb
            )
            gidx = (row_iota + base) * k + lane_jj  # (rows, k*nb)
            lower_cat = jnp.concatenate([lower] * k, axis=1)  # (1, k*nb)
            upper_cat = jnp.concatenate([upper] * k, axis=1)
            onehot = jnp.where(
                (gidx >= lower_cat) & (gidx < upper_cat), 1.0, 0.0
            ).astype(op_dt)
            chunk_f = None
            for part in parts:
                d = jax.lax.dot_general(
                    onehot, part,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )  # (k*nb, W)
                chunk_f = d if chunk_f is None else chunk_f + d
            lane_blk = (
                jax.lax.broadcasted_iota(jnp.int32, (nb, W), 1) // Cp
            )
            for jj in range(k):
                total = total + jnp.where(
                    lane_blk == jj,
                    chunk_f[jj * nb : (jj + 1) * nb, :],
                    jnp.zeros_like(total),
                )
        acc[...] = total
        if combine_lanes and k > 1:
            # fold-combine + write ONLY on the tile's last work item (the
            # matmul-epilogue pattern): a per-step combine dot measured
            # +2.5 ms on the composed headline — tiny MXU ops serialized
            # into every grid step.  Intermediate steps leave the output
            # buffer untouched; Pallas flushes it when the tile index
            # changes, by which point the last item has written it.
            @pl.when(wl_ref[w] == 1)
            def _():
                Cpc = combine_lanes
                # (128, Cp) 0/1 fold-combine matrix built in registers:
                # M[l, c] = 1 iff l % Cp == c
                li = jax.lax.broadcasted_iota(jnp.int32, (128, Cpc), 0)
                ci = jax.lax.broadcasted_iota(jnp.int32, (128, Cpc), 1)
                m = jnp.where(li % Cpc == ci, 1.0, 0.0).astype(
                    jnp.float32
                )
                combined = jax.lax.dot_general(
                    total, m,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                out_ref[...] = combined.astype(out_ref.dtype)
        else:
            out_ref[...] = total.astype(out_ref.dtype)

    return kernel


def _wl_from_ptr_device(row_ptr, N: int, nb: int, n_edges_cap: int):
    """Device (jnp) fallback of the host work list for traced row
    pointers (per-batch compact tables): a STATIC-length work list padded
    with no-op items (empty pad block, last tile, not-first).  Returns
    (wt, wb, wf, lower, upper, n_tiles, n_blocks)."""
    tptr, lower, upper = _tables_from_ptr(row_ptr, N, nb)
    T = int(lower.shape[0])
    ce = CHUNK_EDGES
    n_blocks = n_edges_cap // ce + 2  # last block is all-pad (no-op items)
    b0 = tptr[:-1] // ce
    b1 = jnp.maximum(-(-tptr[1:] // ce), b0 + 1)
    cnt = b1 - b0
    cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt, dtype=jnp.int32)]
    )
    nw_max = T + n_edges_cap // ce + 2  # static bound on sum(cnt)
    w = jnp.arange(nw_max, dtype=jnp.int32)
    t = jnp.clip(
        jnp.searchsorted(cum, w, side="right").astype(jnp.int32) - 1,
        0,
        T - 1,
    )
    valid = w < cum[-1]
    wt = jnp.where(valid, t, T - 1)
    wb = jnp.where(valid, jnp.take(b0, t) + w - jnp.take(cum, t),
                   n_blocks - 1)
    wf = (valid & (w == jnp.take(cum, t))).astype(jnp.int32)
    return wt, wb, wf, lower, upper, T, n_blocks


def _make_max_kernel(C: int, nb: int, chunk: int):
    """Destination-segment max, same structure as the sum kernel but with a
    masked VPU max instead of the one-hot matmul: for each of the nb local
    nodes, lanes outside its [lower, upper) edge range are -inf."""

    def kernel(tptr_ref, vals_hbm, lo_ref, hi_ref, out_ref, vch, acc, sem):
        # acc is kept transposed (C_pad, nb) so per-column updates are 2-D
        # row writes (Mosaic-friendly); transposed back once at the end
        i = pl.program_id(0)
        start = tptr_ref[i]
        end = tptr_ref[i + 1]
        astart = (start // 128) * 128
        n_chunks = (end - astart + chunk - 1) // chunk
        acc[...] = jnp.full_like(acc, -jnp.inf)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        lower = lo_ref[0]  # (1, nb)
        upper = hi_ref[0]

        def body(c, _):
            off = astart + c * chunk
            cp = pltpu.make_async_copy(
                vals_hbm.at[pl.ds(off, chunk), :], vch, sem
            )
            cp.start()
            cp.wait()
            gidx = lane_iota + off  # (chunk, 1)
            in_range = (gidx >= lower) & (gidx < upper)  # (chunk, nb)
            v = vch[...].astype(jnp.float32)  # (chunk, C_pad)
            for col in range(C):
                masked = jnp.where(
                    in_range, v[:, col : col + 1], -jnp.inf
                )  # (chunk, nb)
                m_col = jnp.max(masked, axis=0, keepdims=True)  # (1, nb)
                acc[col : col + 1, :] = jnp.maximum(
                    acc[col : col + 1, :], m_col
                )
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)
        res = acc[...].T  # (nb, C_pad)
        out_ref[...] = jnp.where(
            jnp.isfinite(res), res, jnp.zeros_like(res)
        ).astype(out_ref.dtype)

    return kernel


def seg_max_dst_pallas_raw(
    g: HeteroGraph,
    vals2d: Array,
    *,
    interpret: Optional[bool] = None,
    nb: int = NB,
    chunk: int = CHUNK,
) -> Array:
    """Max-reduce (EP, C) rows into (N, C) by canonical destination; empty
    segments yield 0 (matching the XLA fallback's finite-filtered output).
    Intended for small C (softmax max over heads)."""
    if interpret is None:
        interpret = _interpret_default()
    EP, C = vals2d.shape
    N = g.num_nodes
    assert EP == g.num_padded_edges
    assert chunk % 128 == 0
    assert EP >= g.num_edges + chunk
    C_orig = C
    C = -(-C // 128) * 128 if not interpret else C
    if C != C_orig:
        vals2d = jnp.pad(vals2d, ((0, 0), (0, C - C_orig)))
    n_tiles = -(-N // nb)
    tptr, lower, upper = _tile_tables(g, nb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, nb), lambda i, tp: (i, 0, 0)),
            pl.BlockSpec((1, 1, nb), lambda i, tp: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, C), lambda i, tp: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((chunk, C), vals2d.dtype),
            pltpu.VMEM((C, nb), jnp.float32),  # transposed accumulator
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _make_max_kernel(C_orig, nb, chunk),
        grid_spec=grid_spec,
        out_shape=out_struct((n_tiles * nb, C), vals2d.dtype, vals2d),
        interpret=interpret,
    )(tptr, vals2d, lower, upper)
    return out[:N, :C_orig]


def _tables_from_ptr(ptr: Array, N: int, nb: int):
    """(tile_ptr (T+1,), lower (T, 1, nb), upper (T, 1, nb)) boundary
    tables for any sorted segmentation given its (N+1,) row pointer.
    T is padded to a TABLE_PAD multiple (pad tiles have empty ranges)."""
    ptr = jnp.asarray(ptr)
    n_tiles = -(-(-(-N // nb)) // TABLE_PAD) * TABLE_PAD if N else 0
    idx = jnp.minimum(
        jnp.arange(n_tiles + 1, dtype=jnp.int32) * nb, N
    )
    tptr = jnp.take(ptr, idx)
    node_idx = jnp.minimum(
        jnp.arange(n_tiles * nb, dtype=jnp.int32), N
    ).reshape(n_tiles, nb)
    # 3D (T, 1, nb) so the blocked (1, 1, nb) spec satisfies Mosaic's
    # minor-dims rule (each equals the full array dim)
    lower = jnp.take(ptr, node_idx)[:, None, :]
    upper = jnp.take(ptr, jnp.minimum(node_idx + 1, N))[:, None, :]
    # rows beyond N: empty range (lower == upper) — both clamp to ptr[N]
    return tptr, lower, upper


def _tile_tables(g: HeteroGraph, nb: int) -> Tuple[Array, Array, Array]:
    t = g.in_tables
    if t is not None and t.nb == nb:
        return jnp.asarray(t.tptr), jnp.asarray(t.lower), jnp.asarray(t.upper)
    return _tables_from_ptr(g.in_row_ptr, g.num_nodes, nb)


def _seg_sum_wl(
    vals: Array,
    k: int,
    row_ptr: Array,
    N: int,
    *,
    tables=None,
    interpret: bool = False,
    nb: int = NB,
    out_dtype=None,
    combine_lanes: int = 0,
) -> Array:
    """Unified work-list segment sum: ``vals`` is (rows, W) holding
    ``rows * k`` edges (fold factor ``k``; k=1 means one edge per row),
    summed over the sorted segmentation ``row_ptr`` into (n_tiles*nb, W).
    Callers slice [:N] and fold-combine."""
    rows, W = vals.shape
    n_edges_cap = rows * k
    if tables is not None and tables.w_tile is not None:
        # the tables carry their own geometry (nb, chunk_edges), chosen at
        # build time from the segmentation's density (graph/build.py)
        nb = tables.nb
        rows_pb = tables.chunk_edges // k
        wt = jnp.asarray(tables.w_tile)
        wb = jnp.asarray(tables.w_block)
        wf = jnp.asarray(tables.w_first)
        lower = jnp.asarray(tables.lower)
        upper = jnp.asarray(tables.upper)
        n_tiles = int(lower.shape[0])
        n_blocks = int(tables.n_blocks)
    else:
        rows_pb = CHUNK_EDGES // k
        wt, wb, wf, lower, upper, n_tiles, n_blocks = _wl_from_ptr_device(
            row_ptr, N, nb, n_edges_cap
        )
    n_work = int(wt.shape[0])
    need_rows = n_blocks * rows_pb
    if rows < need_rows:
        vals = jnp.concatenate(
            [vals, jnp.zeros((need_rows - rows, W), vals.dtype)], axis=0
        )
    if n_tiles == 0 or n_work == 0:
        W0 = combine_lanes if (combine_lanes and k > 1) else W
        return jnp.zeros((max(N, 0), W0), out_dtype or jnp.float32)

    bf16_vals = vals.dtype == jnp.bfloat16
    if out_dtype is None:
        # f32 output default (the accumulator dtype) so downstream
        # divides keep precision; mixed-precision backward reduces pass
        # out_dtype=bf16 — numerically identical to casting the f32
        # result but half the HBM on the big (rows, W) buffer
        out_dtype = jnp.float32 if bf16_vals else vals.dtype
    W_out = combine_lanes if (combine_lanes and k > 1) else W
    # w_last flag (tile's final work item — where the fold-combine runs):
    # derived from w_tile on device so TileTables needs no new field and
    # persisted graphs stay loadable
    wl = jnp.concatenate(
        [
            (wt[1:] != wt[:-1]).astype(jnp.int32),
            jnp.ones((1,), jnp.int32),
        ]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_work,),
        in_specs=[
            pl.BlockSpec(
                (rows_pb, W), lambda w, wt, wb, wf, wl: (wb[w], 0)
            ),
            pl.BlockSpec(
                (1, 1, nb), lambda w, wt, wb, wf, wl: (wt[w], 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, nb), lambda w, wt, wb, wf, wl: (wt[w], 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (nb, W_out), lambda w, wt, wb, wf, wl: (wt[w], 0)
        ),
        scratch_shapes=[pltpu.VMEM((nb, W), jnp.float32)],
    )
    out = pl.pallas_call(
        _make_wl_kernel(W, nb, rows_pb, k, bf16_vals, interpret,
                        combine_lanes=W_out if W_out != W else 0),
        grid_spec=grid_spec,
        out_shape=out_struct((n_tiles * nb, W_out), out_dtype, vals),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(2 * n_edges_cap * nb * (W // k))
            * (1 if bf16_vals else 3),
            bytes_accessed=int(
                rows * W * vals.dtype.itemsize
                + n_tiles * nb * W_out * 4
            ),
            transcendentals=0,
        ),
    )(wt, wb, wf, wl, vals, lower, upper)
    return out


def seg_sum_sorted_pallas_raw(
    vals2d: Array,
    row_ptr: Array,
    N: int,
    n_guard: int,
    *,
    tables=None,
    interpret: Optional[bool] = None,
    nb: int = NB,
    chunk: int = CHUNK,
    out_dtype=None,
) -> Array:
    """Sum (EP, C) rows into (N, C) over ANY sorted segmentation described
    by its (N+1,) row pointer (dst-sorted canonical order, src-sorted
    out-CSR order, ...).  ``n_guard`` = rows beyond ``row_ptr[N]`` that are
    safe to over-read (sentinel padding).

    Mosaic requires minor-dim DMA slices to be lane-aligned, so C is padded
    to a multiple of 128 here; callers amortize the padding by batching
    columns (e.g. the fused GAT aggregates messages and softmax
    denominators in one call)."""
    if interpret is None:
        interpret = _interpret_default()
    EP, C = vals2d.shape
    C_orig = C
    C = -(-C // 128) * 128
    if C != C_orig:
        vals2d = jnp.pad(vals2d, ((0, 0), (0, C - C_orig)))
    out = _seg_sum_wl(
        vals2d, 1, row_ptr, N,
        tables=tables, interpret=interpret, nb=nb, out_dtype=out_dtype,
    )
    return out[:N, :C_orig]


def seg_sum_dst_pallas_raw(
    g: HeteroGraph,
    vals2d: Array,
    *,
    interpret: Optional[bool] = None,
    nb: int = NB,
    chunk: int = CHUNK,
) -> Array:
    """Sum (EP, C) rows into (N, C) by canonical destination."""
    assert vals2d.shape[0] == g.num_padded_edges
    return seg_sum_sorted_pallas_raw(
        vals2d,
        g.in_row_ptr,
        g.num_nodes,
        g.num_padded_edges - g.num_edges,
        tables=g.in_tables,
        interpret=interpret,
        nb=nb,
        chunk=chunk,
    )


# --------------------------- folded-payload variant
#
# For narrow payloads (C_useful << 128) the plain kernel wastes most of the
# 128-lane row: the (EP, C)-padded buffer costs ~10x its useful bytes in HBM
# traffic on BOTH the XLA producer side and the kernel DMA side.  The folded
# layout packs k = 128 // Cp consecutive edges into each 128-lane row
# (edge r*k + j owns lanes [j*Cp, (j+1)*Cp)), so a folded (EP/k, 128) buffer
# carries the same payload in 1/k the bytes.  XLA emits folded buffers for
# free: ``take(src, idx).reshape(EP//k, 128)`` fuses the fold into the
# gather (measured: same cost as the unfolded gather).
#
# In-kernel, the one-hot reduction becomes k sub-dots per chunk — sub-dot j
# selects edges at fold position j by range-comparing their EDGE index and
# lane-masks the values to block j, so its contribution lands in lanes
# [j*Cp, (j+1)*Cp) of the accumulator with no cross-block pollution.  Total
# MXU cycles are identical to the unfolded kernel (cycles/edge = #passes,
# independent of k); DMA drops by k.  The caller combines the k lane blocks
# with one tiny node-space pass.

FOLD_CHUNK = 128  # folded rows per DMA chunk (legacy signature default)


@functools.lru_cache(maxsize=None)
def _placement_matrix(c: int, offsets: tuple, width: int):
    """(c, width) 0/1 matrix placing a c-lane part at each lane offset in
    ``offsets`` (numpy; cached)."""
    m = np.zeros((c, width), np.float32)
    for off in offsets:
        m[:, off : off + c] = np.eye(c, dtype=np.float32)
    return m


@functools.lru_cache(maxsize=None)
def _fold_combine_matrix(k: int, Cp: int):
    """(128, Cp) one-hot fold-combine matrix: M[j*Cp + c, c] = 1 for all
    j < k (numpy so cached values never leak tracers across jit scopes)."""
    m = np.zeros((k * Cp, Cp), np.float32)
    for j in range(k):
        m[j * Cp : (j + 1) * Cp] = np.eye(Cp, dtype=np.float32)
    return m


def seg_sum_sorted_folded_pallas_raw(
    vals_folded: Array,
    k: int,
    row_ptr: Array,
    N: int,
    n_guard_rows: int,
    *,
    tables=None,
    interpret: Optional[bool] = None,
    nb: int = NB,
    chunk: int = FOLD_CHUNK,
    out_dtype=None,
) -> Array:
    """Sum folded edge payloads into (N, Cp) rows over a sorted segmentation.

    ``vals_folded`` is (EP // k, 128) with edge ``r*k + j`` on lanes
    ``[j*Cp, (j+1)*Cp)`` of row ``r`` (Cp = 128 // k); ``row_ptr`` is the
    (N+1,) EDGE-unit pointer of the segmentation; ``n_guard_rows`` = folded
    rows past ``ceil(row_ptr[N]/k)`` safe to over-read.  Returns (N, Cp)
    float32 (combined over the k lane blocks)."""
    if interpret is None:
        interpret = _interpret_default()
    assert 128 % k == 0 and k >= 1
    Cp = 128 // k
    assert vals_folded.shape[1] == 128
    if out_dtype is None:
        out_dtype = jnp.float32
    # combine the k disjoint lane blocks in ONE caller-side one-hot MXU
    # dot.  Round-5 negative result: combining IN-KERNEL (combine_lanes,
    # kept for narrow-HBM experiments) measured SLOWER end-to-end
    # (bf16 headline 6.6 -> 8.8 ms even with the dot gated to each tile's
    # last work item) — TPU HBM arrays are (8, 128)-tile padded, so a
    # (T*nb, Cp) output moves the same HBM bytes as (T*nb, 128) but with
    # partial-tile writes; the external dot's extra pass is cheaper.
    # (The dot itself replaced a chained slice-add loop — k-1 separately
    # materialized fusion outputs, 7 x 1.48 GB at full-mag scale — and a
    # reshape-sum whose col-major bitcast cost a physical copy per call.)
    out = _seg_sum_wl(
        vals_folded, k, row_ptr, N,
        tables=tables, interpret=interpret, nb=nb, out_dtype=out_dtype,
    )
    out = out[:N]
    if k == 1:
        return out
    # f32 outputs must combine exactly: default matmul precision rounds
    # operands to bf16 on TPU; HIGHEST costs nothing at node scale.
    prec = (
        jax.lax.Precision.HIGHEST
        if out.dtype == jnp.float32
        else None
    )
    return jax.lax.dot(
        out,
        jnp.asarray(_fold_combine_matrix(k, Cp), out.dtype),
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(out.dtype)


def fold_width(c: int) -> int:
    """Smallest 128-divisor lane-block width >= 16 holding ``c`` payload
    lanes.  The floor of 16 caps the fold factor at k=8: each extra fold
    slot adds one one-hot sub-dot per chunk, and past k=8 the MXU cost of
    the extra sub-dots on sparse segmentations (compact row_ptrs average a
    few edges per row) outweighs the DMA saved (device sweep: k=16 is
    1.7-3.5x slower than k=4-8 on canon/edge compact tables)."""
    floor = _tune().fold_floor
    cp = floor
    while cp <= 64:
        if cp >= c:
            return cp
        cp *= 2
    # no fold: the unfolded kernel takes any multiple of 128 lanes
    return -(-c // 128) * 128


def _use_split3(C: int, pack_dt, perm) -> bool:
    """Should an f32 payload ride as exact bf16 hi|mid|lo lane groups?

    The split (24 significand bits across three bf16 lane groups — the
    same decomposition the kernel used internally for f32 DMA'd payloads)
    moves the component split from in-kernel to the producer pass, which
    buys two things measured on-chip (round 5, scripts/r5_experiments.py):

    * the edge-space PERMUTE runs at bf16-gather speed: 0.3-0.8 ms vs
      1.8-6.0 ms for narrow f32 gathers (XLA lays narrow f32 sources out
      col-major; bf16 sources stage on-chip);
    * the one-hot reduce needs ONE MXU pass instead of three (components
      ride in lanes, each exactly accumulated in f32 by the MXU).

    DMA bytes are unchanged whenever the fold pad absorbs the 3x lane
    count (C=20: Cp 32xf32 = 64xbf16 = 128 B/edge) and at most 2x
    otherwise (C=12/16).  2x is accepted: the bf16 one-pass kernel
    measured 298 GB/s vs ~120 for the f32 three-pass kernel on the same
    segmentation (round-5 device trace), the f32 payload's col-major
    pack chain (copy + physical fold reshape, ~0.5 ms per payload at mag
    sample scale) disappears, and a payload shared between a permuted
    and an unpermuted reduce (the [draw | dfeat] backward pair) stays ONE
    CSE'd materialization instead of splitting into bf16 and f32 twins."""
    if jnp.dtype(pack_dt) != jnp.float32:
        return False
    w3 = fold_width(3 * C)
    if w3 > 64:
        return False  # would unfold: wide payloads keep f32 rows
    return 2 * w3 <= 8 * fold_width(C) or perm is not None


def seg_sum_sorted_packed(
    parts,
    C: int,
    pack_dt,
    row_ptr: Array,
    n_rows: int,
    EP: int,
    E: int,
    tables,
    perm: Optional[Array] = None,
    out_dtype=None,
) -> Array:
    """Concatenate ``parts`` (total C lanes, canonical edge order) into the
    fold-packed per-edge payload and segment-sum it over the sorted
    segmentation ``row_ptr``.  ``perm`` (optional) permutes the packed
    payload into the segmentation's edge order first — the pad lanes are
    emitted by the same fused producer pass, so the permute moves the
    final buffer once.  Returns (n_rows, >=C) in ``out_dtype`` (default
    float32).  This is the ONE entry point for narrow-payload folding:
    every (EP, c < 128) materialization costs full 128-lane rows in HBM,
    so callers must never pre-pad."""
    from ..common import take_rows

    split3 = _use_split3(C, pack_dt, perm)
    if split3:
        # exact f32 -> bf16 hi|mid|lo significand split, lane layout
        # [hi(C)|mid(C)|lo(C)] so the post-reduce combine is three
        # aligned slices.  The pack is built with one-hot PLACEMENT DOTS
        # + a lane-group select rather than jnp.concatenate: XLA lays
        # narrow per-edge part arrays out col-major, so a lane concat of
        # them materializes each part PLUS a row-major copy per part
        # (round-5 device trace: 6 copies at 38-77 GB/s + an 821 us
        # concat).  A dot is layout-neutral and its elementwise consumer
        # chain (the split + select below) fuses into it, writing the
        # bf16 payload in ONE pass.  HIGHEST keeps the f32 values exact
        # through the 0/1 matmul; the FLOPs are trivial.
        C_in = C
        W3 = fold_width(3 * C)
        rows = parts[0].shape[0]
        rep = None
        off = 0
        for p in parts:
            c = p.shape[1]
            P = jnp.asarray(_placement_matrix(
                c, (off, C + off, 2 * C + off), W3
            ))
            d = jax.lax.dot(
                p.astype(jnp.float32), P,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            rep = d if rep is None else rep + d
            off += c
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, W3), 1)
        g0 = rep.astype(jnp.bfloat16)
        r1 = rep - g0.astype(jnp.float32)
        g1 = r1.astype(jnp.bfloat16)
        g2 = (r1 - g1.astype(jnp.float32)).astype(jnp.bfloat16)
        grp = lane // C
        packed = jnp.where(
            lane < 3 * C,
            jnp.where(grp == 0, g0, jnp.where(grp == 1, g1, g2)),
            jnp.zeros_like(g0),
        )
        C = 3 * C
        pack_dt = jnp.bfloat16
        req_out = out_dtype
        out_dtype = None  # component sums stay f32; cast after combine
        Cp = W3
        k = 128 // Cp if Cp <= 128 else 1
    else:
        Cp = fold_width(C)
        k = 128 // Cp if Cp <= 128 else 1
        pad = (Cp if k > 1 else -(-C // 128) * 128) - C
        ps = [p.astype(pack_dt) for p in parts]
        if pad:
            # parts may live in a row space LARGER than EP (e.g. padded
            # segment rows) when ``perm`` (length EP) selects out of it
            ps.append(jnp.zeros((ps[0].shape[0], pad), pack_dt))
        packed = ps[0] if len(ps) == 1 else jnp.concatenate(ps, axis=1)
    if perm is not None:
        # history: the f32 narrow permute gather ran col-major at
        # ~20 GB/s (2.28 ms of the round-4 headline step) and resisted
        # every layout-coercion attempt (pallas identity, pad-rooted
        # gather) — XLA re-flipped the operand col-major each time.  The
        # bf16 split3 payload sidesteps it: bf16 narrow sources gather at
        # 80-183 GB/s (measured round 5).
        packed = take_rows(packed, perm)
    if k == 1:
        out = seg_sum_sorted_pallas_raw(
            packed, row_ptr, n_rows, EP - E, tables=tables,
            out_dtype=out_dtype,
        )
        if out_dtype is None:
            out = out.astype(jnp.float32)
    else:
        packed = packed.reshape(EP // k, 128)
        out = seg_sum_sorted_folded_pallas_raw(
            packed, k, row_ptr, n_rows, EP // k - (E + k - 1) // k,
            tables=tables, out_dtype=out_dtype,
        )
    if split3:
        # combine the exact component sums in node space (tiny)
        out = (
            out[:, :C_in]
            + out[:, C_in : 2 * C_in]
            + out[:, 2 * C_in : 3 * C_in]
        )
        if req_out is not None:
            out = out.astype(req_out)
    return out


@jax.custom_vjp
def _seg_sum_core(vals2d: Array, g: HeteroGraph) -> Array:
    # dtype-stable (bf16 in -> bf16 out) so the custom-vjp cotangent
    # structure matches; the raw kernel's f32 accumulator is internal.
    # Narrow payloads ride the folded layout (k edges per 128-lane row)
    # instead of zero-padding to 128 lanes.
    C = vals2d.shape[1]
    out = seg_sum_sorted_packed(
        [vals2d],
        C,
        vals2d.dtype,
        g.in_row_ptr,
        g.num_nodes,
        g.num_padded_edges,
        g.num_edges,
        g.in_tables,
    )
    return out[:, :C].astype(vals2d.dtype)


def _ssc_fwd(vals2d, g):
    return _seg_sum_core(vals2d, g), g


def _ssc_bwd(g, ct):
    return gather_dst(g, ct), None


_seg_sum_core.defvjp(_ssc_fwd, _ssc_bwd)


def seg_sum_dst_pallas(g: HeteroGraph, vals: Array) -> Array:
    """Differentiable drop-in for ``ops.scatter_sum_dst``: (EP, ...) ->
    (N, ...).  Backward is a sorted XLA gather (fast on TPU).  The graph is
    a pytree argument with a None cotangent (shard_map-safe)."""
    shape = vals.shape
    C = int(np.prod(shape[1:]))
    vals2d = vals.reshape(shape[0], C)
    out = _seg_sum_core(vals2d, g)
    return out.reshape((g.num_nodes,) + shape[1:])


def _identity_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def force_rowmajor(x: Array, *, interpret: Optional[bool] = None) -> Array:
    """Materialize ``x`` (rows, W) in row-major layout via a trivial
    Pallas pass.  XLA assigns col-major layouts to narrow per-edge
    elementwise chains, which turns the downstream row GATHER (the
    backward's edge permute) into per-element strided reads — the round-4
    device trace showed the permute fusion running at 20 GB/s (2.28 ms of
    an 11.75 ms step).  A pallas custom call constrains its operand and
    result to row-major, so the gather that follows streams 64-byte rows
    instead; the identity itself moves 2 x rows x W bytes (~0.06 ms at
    mag scale).  NOTE: measured ineffective for the backward permute —
    layout assignment re-flips the custom-call output col-major before
    the gather (see seg_sum_sorted_packed) — kept for consumers that can
    hold the row-major output directly."""
    if interpret is None:
        interpret = _interpret_default()
    R, W = x.shape
    # VMEM blocks pad lanes to 128, so size by the PADDED width
    blk = max(8, min(R, (1 << 20) // (max(W, 128) * 4)))
    grid = -(-R // blk)
    return pl.pallas_call(
        _identity_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((blk, W), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((blk, W), lambda i: (i, 0)),
        out_shape=out_struct((R, W), x.dtype, x),
        interpret=interpret,
    )(x)
