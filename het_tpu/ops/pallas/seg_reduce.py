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

from ...graph.structures import HeteroGraph
from ..common import gather_dst

Array = jax.Array

NB = 128  # nodes per output tile
# edges per DMA chunk: 512 measured best at mag scale (1.53 ms vs 2.2 ms at
# 256 for the (EP, 128) packed reduction — fewer grid-loop iterations beat
# the extra tile-boundary waste)
CHUNK = 512
# node tiles per grid step (sum kernel): per-grid-step fixed cost (~2 us)
# dominates for ragged segmentations with many small tiles (1113 tiles for
# mag's compact-row space); super-blocking amortizes it without changing
# the per-edge MXU work.  Tile tables are padded to a SUPER multiple.
# Measured on mag (dst 576 tiles / compact 1113 tiles): G=4 best
# (1.44/1.56 ms vs 1.58/2.29 at G=1; G=8 regresses — output-block VMEM
# pressure).  Tables are padded to 8 so any G in {1, 2, 4, 8} divides.
TABLE_PAD = 8
SUPER = 4


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _make_kernel(C: int, nb: int, chunk: int, G: int, bf16_vals: bool):
    def kernel(tptr_ref, vals_hbm, lo_ref, hi_ref, out_ref, vch, acc, sems):
        i = pl.program_id(0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

        for j in range(G):  # G node tiles per grid step (see SUPER)
            start = tptr_ref[i * G + j]
            end = tptr_ref[i * G + j + 1]
            # chunk offsets aligned down to 128 so DMA rows stay
            # tile-aligned; out-of-range lanes fall outside every
            # [lower, upper) and vanish
            astart = (start // 128) * 128
            n_chunks = (end - astart + chunk - 1) // chunk
            acc[...] = jnp.zeros_like(acc)

            lower = lo_ref[j]  # (1, nb)
            upper = hi_ref[j]  # (1, nb)

            def dma(c):
                return pltpu.make_async_copy(
                    vals_hbm.at[pl.ds(astart + c * chunk, chunk), :],
                    vch.at[c % 2],
                    sems.at[c % 2],
                )

            @pl.when(n_chunks > 0)
            def _():
                dma(0).start()

            def body(c, _):
                @pl.when(c + 1 < n_chunks)
                def _():
                    dma(c + 1).start()  # double buffer: prefetch next

                dma(c).wait()
                off = astart + c * chunk
                gidx = lane_iota + off  # (chunk, 1)
                onehot = jnp.where(
                    (gidx >= lower) & (gidx < upper), 1.0, 0.0
                ).astype(jnp.bfloat16)  # exact in bf16
                total = acc[...]
                if bf16_vals:
                    # bf16 payload: ONE MXU pass — the f32 accumulator
                    # sums bf16 products exactly (both operands exact)
                    total = total + jax.lax.dot_general(
                        onehot,
                        vch[c % 2],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    # bf16x3 significand split of the f32 values (24
                    # mantissa bits): 3 bf16 MXU passes instead of the ~6
                    # of Precision.HIGHEST — exact for the 0/1 operand
                    v32 = vch[c % 2].astype(jnp.float32)
                    v_hi = v32.astype(jnp.bfloat16)
                    r1 = v32 - v_hi.astype(jnp.float32)
                    v_mid = r1.astype(jnp.bfloat16)
                    v_lo = (r1 - v_mid.astype(jnp.float32)).astype(
                        jnp.bfloat16
                    )
                    for part in (v_hi, v_mid, v_lo):
                        total = total + jax.lax.dot_general(
                            onehot,
                            part,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                acc[...] = total
                return 0

            jax.lax.fori_loop(0, n_chunks, body, 0)
            out_ref[j * nb : (j + 1) * nb, :] = acc[...].astype(
                out_ref.dtype
            )

    return kernel


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
        out_shape=jax.ShapeDtypeStruct((n_tiles * nb, C), vals2d.dtype),
        interpret=interpret,
    )(tptr, vals2d, lower, upper)
    return out[:N, :C_orig]


def _tables_from_ptr(ptr: Array, N: int, nb: int):
    """(tile_ptr (T+1,), lower (T, 1, nb), upper (T, 1, nb)) boundary
    tables for any sorted segmentation given its (N+1,) row pointer.
    T is padded to a SUPER multiple (pad tiles have empty ranges)."""
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


def _unpack_tables(tables, row_ptr, N, nb):
    """Use host-precomputed TileTables when present (producing the
    scalar-prefetch args with on-device XLA measured +1.0 ms/call — the
    grid scheduler synchronizes on them before any DMA is issued)."""
    if tables is not None and tables.nb == nb:
        return (
            jnp.asarray(tables.tptr),
            jnp.asarray(tables.lower),
            jnp.asarray(tables.upper),
        )
    return _tables_from_ptr(row_ptr, N, nb)


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
    assert chunk % 128 == 0, "chunk must be a multiple of 128"
    if n_guard < chunk:
        # chunked DMA may over-read up to `chunk` rows past row_ptr[N];
        # append guard rows when the caller's layout doesn't provide them
        # (over-read lanes fall outside every [lower, upper) and vanish)
        vals2d = jnp.concatenate(
            [vals2d, jnp.zeros((chunk - n_guard, C), vals2d.dtype)], axis=0
        )
        EP += chunk - n_guard
    C_orig = C
    C = -(-C // 128) * 128 if not interpret else C
    if C != C_orig:
        vals2d = jnp.pad(vals2d, ((0, 0), (0, C - C_orig)))
    tptr, lower, upper = _unpack_tables(tables, row_ptr, N, nb)
    n_tiles = int(lower.shape[0])  # SUPER-padded (pad tiles are empty)
    G = SUPER if n_tiles >= SUPER else 1
    assert n_tiles % max(G, 1) == 0 or n_tiles == 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(max(n_tiles // max(G, 1), 1) if n_tiles else 0,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # vals stay in HBM
            pl.BlockSpec((G, 1, nb), lambda i, tp: (i, 0, 0)),
            pl.BlockSpec((G, 1, nb), lambda i, tp: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((G * nb, C), lambda i, tp: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, C), vals2d.dtype),  # double buffer
            pltpu.VMEM((nb, C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # bf16 payloads take the exact single-pass MXU path; the output
    # default is f32 (the accumulator dtype) so downstream divides keep
    # precision; backward reduces in mixed-precision mode pass
    # out_dtype=bf16 — numerically identical to casting the f32 result
    # (one rounding either way) but the big (rows, C) buffer is half the
    # HBM (at full-mag scale the f32 form is a 3 GB allocation)
    bf16_vals = vals2d.dtype == jnp.bfloat16
    if out_dtype is None:
        out_dtype = jnp.float32 if bf16_vals else vals2d.dtype
    out = pl.pallas_call(
        _make_kernel(C, nb, chunk, G, bf16_vals),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * nb, C), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * EP * nb * C,
            bytes_accessed=(EP * C + N * C) * 4 + EP * 4,
            transcendentals=0,
        ),
    )(tptr, vals2d, lower, upper)
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

FOLD_CHUNK = 128  # folded rows per DMA chunk
FOLD_ALIGN = 16  # sublane alignment of the chunk start (bf16 tile height)


def _make_folded_kernel(
    nb: int, chunk: int, G: int, k: int, bf16_vals: bool,
    interpret: bool = False,
):
    Cp = 128 // k
    # on TPU the MXU accumulates bf16 products in f32 natively; the
    # interpret-mode (CPU) dot accumulates in the operand dtype, so tests
    # force f32 operands there to keep the reduction exact
    op_dt = jnp.float32 if interpret else jnp.bfloat16

    def kernel(tptr_ref, vals_hbm, lo_ref, hi_ref, out_ref, vch, acc, sems):
        i = pl.program_id(0)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        lane_blk = (
            jax.lax.broadcasted_iota(jnp.int32, (chunk, 128), 1) // Cp
        )

        for j in range(G):
            start = tptr_ref[i * G + j]  # edge units
            end = tptr_ref[i * G + j + 1]
            astart = (start // k // FOLD_ALIGN) * FOLD_ALIGN  # folded rows
            fend = (end + k - 1) // k
            n_chunks = (fend - astart + chunk - 1) // chunk
            acc[...] = jnp.zeros_like(acc)

            lower = lo_ref[j]  # (1, nb) edge units
            upper = hi_ref[j]

            def dma(c):
                return pltpu.make_async_copy(
                    vals_hbm.at[pl.ds(astart + c * chunk, chunk), :],
                    vch.at[c % 2],
                    sems.at[c % 2],
                )

            @pl.when(n_chunks > 0)
            def _():
                dma(0).start()

            def body(c, _):
                @pl.when(c + 1 < n_chunks)
                def _():
                    dma(c + 1).start()

                dma(c).wait()
                v = vch[c % 2]
                if bf16_vals or interpret:
                    parts = (v.astype(op_dt),)
                else:
                    v32 = v.astype(jnp.float32)
                    v_hi = v32.astype(jnp.bfloat16)
                    r1 = v32 - v_hi.astype(jnp.float32)
                    v_mid = r1.astype(jnp.bfloat16)
                    v_lo = (r1 - v_mid.astype(jnp.float32)).astype(
                        jnp.bfloat16
                    )
                    parts = (v_hi, v_mid, v_lo)
                total = acc[...]
                base = (row_iota + astart + c * chunk) * k  # (chunk, 1)
                for jj in range(k):
                    gidx = base + jj  # edge index at fold slot jj
                    onehot = jnp.where(
                        (gidx >= lower) & (gidx < upper), 1.0, 0.0
                    ).astype(op_dt)  # (chunk, nb)
                    blk = lane_blk == jj
                    for part in parts:
                        vm = jnp.where(blk, part, jnp.zeros_like(part))
                        total = total + jax.lax.dot_general(
                            onehot,
                            vm,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            # interpret mode may execute on a real TPU
                            # where default f32 dot precision rounds
                            # operands to bf16
                            precision=(
                                jax.lax.Precision.HIGHEST
                                if interpret
                                else None
                            ),
                        )
                acc[...] = total
                return 0

            jax.lax.fori_loop(0, n_chunks, body, 0)
            out_ref[j * nb : (j + 1) * nb, :] = acc[...].astype(
                out_ref.dtype
            )

    return kernel


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
    EPf = vals_folded.shape[0]
    assert vals_folded.shape[1] == 128
    need_guard = chunk + FOLD_ALIGN
    if n_guard_rows < need_guard:
        vals_folded = jnp.concatenate(
            [
                vals_folded,
                jnp.zeros(
                    (need_guard - n_guard_rows, 128), vals_folded.dtype
                ),
            ],
            axis=0,
        )
    tptr, lower, upper = _unpack_tables(tables, row_ptr, N, nb)
    n_tiles = int(lower.shape[0])
    G = SUPER if n_tiles >= SUPER else 1
    assert n_tiles % max(G, 1) == 0 or n_tiles == 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(max(n_tiles // max(G, 1), 1) if n_tiles else 0,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((G, 1, nb), lambda i, tp: (i, 0, 0)),
            pl.BlockSpec((G, 1, nb), lambda i, tp: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((G * nb, 128), lambda i, tp: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, 128), vals_folded.dtype),
            pltpu.VMEM((nb, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    bf16_vals = vals_folded.dtype == jnp.bfloat16
    if out_dtype is None:
        out_dtype = jnp.float32
    out = pl.pallas_call(
        _make_folded_kernel(nb, chunk, G, k, bf16_vals, interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * nb, 128), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * EPf * k * nb * Cp,
            bytes_accessed=EPf * 128 * 4 + N * Cp * 4,
            transcendentals=0,
        ),
    )(tptr, vals_folded, lower, upper)
    out = out[:N]
    # combine the k disjoint lane blocks in ONE pass.  A chained slice-add
    # loop here compiled to k-1 separately-materialized fusion outputs
    # (7 x 1.48 GB allocations at full-mag scale — the difference between
    # fitting and OOM on one chip), and a reshape(N,k,Cp).sum(axis=1)
    # makes XLA bitcast the kernel output to a column-major (N,k,Cp) view,
    # paying a physical (N,128) layout copy per reduce call (8 x 37.7 MB
    # in the GAT step HLO).  A one-hot MXU dot is layout-neutral and the
    # FLOPs are negligible (N*128*Cp*2).
    if k == 1:
        return out
    # f32 outputs must combine exactly: default matmul precision rounds
    # operands to bf16 on TPU, which would silently lose the f32 accuracy
    # the kernel's bf16x3 split preserves.  The flops are negligible
    # (N*128*Cp*2), so HIGHEST costs nothing; bf16 outputs keep DEFAULT
    # (their rounding already happened at the kernel boundary).
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
    for cp in (16, 32, 64):
        if cp >= c:
            return cp
    # no fold: the unfolded kernel takes any multiple of 128 lanes
    return -(-c // 128) * 128


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

    Cp = fold_width(C)
    k = 128 // Cp if Cp <= 128 else 1
    pad = (Cp if k > 1 else -(-C // 128) * 128) - C
    ps = [p.astype(pack_dt) for p in parts]
    if pad:
        ps.append(jnp.zeros((EP, pad), pack_dt))
    packed = ps[0] if len(ps) == 1 else jnp.concatenate(ps, axis=1)
    if perm is not None:
        packed = take_rows(packed, perm)
    if k == 1:
        out = seg_sum_sorted_pallas_raw(
            packed, row_ptr, n_rows, EP - E, tables=tables,
            out_dtype=out_dtype,
        )
        return out if out_dtype is not None else out.astype(jnp.float32)
    packed = packed.reshape(EP // k, 128)
    return seg_sum_sorted_folded_pallas_raw(
        packed, k, row_ptr, n_rows, EP // k - (E + k - 1) // k,
        tables=tables, out_dtype=out_dtype,
    )


@jax.custom_vjp
def _seg_sum_core(vals2d: Array, g: HeteroGraph) -> Array:
    # dtype-stable (bf16 in -> bf16 out) so the custom-vjp cotangent
    # structure matches; the raw kernel's f32 accumulator is internal
    return seg_sum_dst_pallas_raw(g, vals2d).astype(vals2d.dtype)


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
