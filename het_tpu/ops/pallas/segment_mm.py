"""Pallas TPU kernels: relation-typed segment matmul (fwd, dX, dW).

The TPU-native re-design of the reference's gather-GEMM-scatter CUDA
template ``_basic_MatMulKernel`` (hrt/include/DGLHackKernel/RGNN/
my_shmem_sgemm_func.cu.h:14-133) and its backward dX/dW split
(RGNNOps.inc.h:756 ``_BackwardRelationalMatMul``):

* Rows are pre-grouped into tile-aligned relation segments at graph build
  (het_tpu/graph/build.py), so each row-tile belongs to exactly one
  relation — the host-side analogue of the reference's per-relation block
  scheduler (mysgemm_KernelsBlockConfigurations.h:44-148).
* ``tile_seg`` (tile -> relation) is a **scalar-prefetch** argument; the
  weight BlockSpec index_map reads it to stream exactly one (H, K, O)
  weight block per tile from HBM — no per-tile weight gather is ever
  materialized (the XLA fallback pays a (n_tiles, H, K, O) gather).
* Heads live folded into the minor output dimension (Mosaic requires minor
  block dims to be lane/sublane aligned); the kernel loops over heads with
  a static Python loop, one MXU matmul each.
* dW uses the sequential-grid revisit pattern: tiles of one relation are
  consecutive, so the relation's (H, K, O) output block stays resident in
  VMEM across its tiles and the kernel accumulates in place, initializing
  on the segment's first tile — the role atomicAdd + ``OuterProductFlag``
  play in the reference (my_shmem_sgemm_func.cu.h:109-183).

All kernels run in interpret mode off-TPU, which is how the CPU test suite
exercises them against the XLA path and the numpy oracles.

Weight blocks are streamed whole per relation: H * K * O * itemsize must fit
VMEM alongside the row tiles (true for every reference config).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...graph.structures import Segments
from ..common import out_struct

Array = jax.Array


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _dot_precision(dtype):
    """HIGHEST (exact f32 on the MXU) for f32 operands; bf16 runs native —
    Mosaic rejects HIGHEST on bf16 inputs."""
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _itemsize(x) -> int:
    return np.dtype(x.dtype).itemsize


def _fold_x(x_rows: Array) -> Tuple[Array, bool, int]:
    """(n_rows, [H|1,] K) -> (n_rows, Hx*K) plus (was_3d, Hx)."""
    if x_rows.ndim == 3:
        n, hx, k = x_rows.shape
        return x_rows.reshape(n, hx * k), True, hx
    return x_rows, False, 1


from .tuning import get_table as _tune  # noqa: E402

# A weight tensor at most this large stays VMEM-resident for the whole
# kernel (the fast path); larger weights are streamed per relation tile.
# Budget keyed on the TPU generation (tuning.py).
W_RESIDENT_BYTES = _tune().w_resident_bytes


def _choose_block_rows(
    tile: int, n_rows: int, target: int = None, max_g: int = None
) -> int:
    """Super-block size: multiple of ``tile`` near ``target`` rows, to
    amortize per-grid-step overhead over many MXU calls.  The sub-tile loop
    is unrolled in the kernel, so cap the iteration count."""
    target = target or _tune().mm_block_rows
    max_g = max_g or _tune().mm_max_g
    g = max(min(target, n_rows) // tile, 1)
    return tile * min(g, max_g)


# ------------------------------------------------- forward (W-resident)


def _make_fwd_resident_kernel(H, Hx, K, O, T, G, nt, prec):
    def kernel(ts_ref, x_ref, w_ref, o_ref):
        # x_ref: (G*T, Hx*K); o_ref: (G*T, H*O)
        # w_ref: (S, K, H*O) head-folded when Hx == 1, else (S, H, K, O)
        i = pl.program_id(0)
        for j in range(G):
            t = i * G + j

            @pl.when(t < nt)
            def _():
                rel = ts_ref[jnp.minimum(t, nt - 1)]
                rows = slice(j * T, (j + 1) * T)
                if Hx == 1:
                    # one MXU call computes every head: x @ W_cat[rel]
                    o_ref[rows, :] = jax.lax.dot_general(
                        x_ref[rows, :K],
                        w_ref[rel],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    ).astype(o_ref.dtype)
                else:
                    for h in range(H):
                        o_ref[rows, h * O : (h + 1) * O] = jax.lax.dot_general(
                            x_ref[rows, h * K : h * K + K],
                            w_ref[rel, h],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec,
                        ).astype(o_ref.dtype)

    return kernel


def _fwd_resident(x_rows, w, seg, interpret):
    S, H, K, O = w.shape
    T, nt = seg.tile, seg.n_tiles
    xf, x3, Hx = _fold_x(x_rows)
    BT = _choose_block_rows(T, seg.n_rows)
    G = BT // T
    n_super = pl.cdiv(nt, G)
    if Hx == 1:
        w_in = jnp.transpose(w, (0, 2, 1, 3)).reshape(S, K, H * O)
        w_spec = pl.BlockSpec((S, K, H * O), lambda i, ts: (0, 0, 0))
    else:
        w_in = w
        w_spec = pl.BlockSpec((S, H, K, O), lambda i, ts: (0, 0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec((BT, Hx * K), lambda i, ts: (i, 0)),
            w_spec,
        ],
        out_specs=pl.BlockSpec((BT, H * O), lambda i, ts: (i, 0)),
    )
    out = pl.pallas_call(
        _make_fwd_resident_kernel(H, Hx, K, O, T, G, nt,
                                  _dot_precision(x_rows.dtype)),
        grid_spec=grid_spec,
        out_shape=out_struct((seg.n_rows, H * O), x_rows.dtype, x_rows, w),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * seg.n_rows * H * K * O,
            bytes_accessed=(x_rows.size + w.size + seg.n_rows * H * O)
            * _itemsize(x_rows),
            transcendentals=0,
        ),
    )(jnp.asarray(seg.tile_seg), xf, w_in)
    return out.reshape(seg.n_rows, H, O)


# --------------------------------------------- forward (streamed, large R)
#
# Weights beyond the VMEM-residency budget (wikikg2: R=535, K=O=128 -> 34MB)
# stay in HBM; the kernel DMAs one relation's weight block into a VMEM
# scratch buffer only on relation-run boundaries (tiles of one relation are
# consecutive, so that's ~R copies over the whole launch), and super-blocks
# G row-tiles per grid step to amortize per-step overhead — round 1's
# one-tile-per-step streamed variant lost ~2x to XLA from exactly that
# overhead (docs/SEGMM_STRATEGIES_r2.json).  This is the TPU analogue of
# the reference's scheduled kernel at high relation counts
# (hrt/include/DGLHackKernel/RGNN/mysgemm_KernelsBlockConfigurations.h).


def _make_fwd_stream_kernel(H, Hx, K, O, T, G, nt, prec):
    def kernel(ts_ref, wcopy_ref, x_ref, w_hbm, o_ref, w_buf, sem):
        i = pl.program_id(0)
        for j in range(G):
            t = i * G + j
            tc = jnp.minimum(t, nt - 1)
            rel = ts_ref[tc]

            @pl.when(jnp.logical_and(t < nt, wcopy_ref[tc] == 1))
            def _():
                cp = pltpu.make_async_copy(w_hbm.at[rel], w_buf, sem)
                cp.start()
                cp.wait()

            @pl.when(t < nt)
            def _():
                rows = slice(j * T, (j + 1) * T)
                if Hx == 1:
                    o_ref[rows, :] = jax.lax.dot_general(
                        x_ref[rows, :K],
                        w_buf[...],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    ).astype(o_ref.dtype)
                else:
                    for h in range(H):
                        o_ref[rows, h * O : (h + 1) * O] = jax.lax.dot_general(
                            x_ref[rows, h * K : h * K + K],
                            w_buf[h],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec,
                        ).astype(o_ref.dtype)

    return kernel


def _fwd_streamed(x_rows, w, seg, interpret):
    S, H, K, O = w.shape
    T, nt = seg.tile, seg.n_tiles
    xf, x3, Hx = _fold_x(x_rows)
    BT = _choose_block_rows(T, seg.n_rows, target=2048, max_g=16)
    G = BT // T
    ts = jnp.asarray(seg.tile_seg)
    wcopy = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (ts[1:] != ts[:-1]).astype(jnp.int32)]
    )
    if Hx == 1:
        # head-folded: one (K, H*O) block per relation, one MXU call/tile
        w_in = jnp.transpose(w, (0, 2, 1, 3)).reshape(S, K, H * O)
        scratch = pltpu.VMEM((K, H * O), w_in.dtype)
    else:
        w_in = w
        scratch = pltpu.VMEM((H, K, O), w_in.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(pl.cdiv(nt, G),),
        in_specs=[
            pl.BlockSpec((BT, Hx * K), lambda i, ts, wc: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((BT, H * O), lambda i, ts, wc: (i, 0)),
        scratch_shapes=[scratch, pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        _make_fwd_stream_kernel(H, Hx, K, O, T, G, nt,
                                _dot_precision(x_rows.dtype)),
        grid_spec=grid_spec,
        out_shape=out_struct((seg.n_rows, H * O), x_rows.dtype, x_rows, w),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * seg.n_rows * H * K * O,
            bytes_accessed=(x_rows.size + w.size + seg.n_rows * H * O)
            * _itemsize(x_rows),
            transcendentals=0,
        ),
    )(ts, wcopy, xf, w_in)
    return out.reshape(seg.n_rows, H, O)


# ---------------------------------------------------------------- forward


def segment_matmul_rows_fwd(
    x_rows: Array,
    w: Array,
    seg: Segments,
    *,
    interpret: Optional[bool] = None,
) -> Array:
    """(n_rows, [H|1,] K) x (S, H, K, O) -> (n_rows, H, O)."""
    if interpret is None:
        interpret = _interpret_default()
    # Mosaic requires matching operand dtypes on the MXU
    common = jnp.promote_types(x_rows.dtype, w.dtype)
    x_rows = x_rows.astype(common)
    w = w.astype(common)
    S, H, K, O = w.shape
    T, nt = seg.tile, seg.n_tiles
    assert x_rows.shape[0] == seg.n_rows
    if w.size * _itemsize(w) <= W_RESIDENT_BYTES:
        return _fwd_resident(x_rows, w, seg, interpret)
    return _fwd_streamed(x_rows, w, seg, interpret)


# ------------------------------------------------- dX / dW (W-resident)


def _make_dx_resident_kernel(H, Hx, K, O, T, G, nt, prec):
    def kernel(ts_ref, ct_ref, wt_ref, o_ref):
        # Hx == 1: wt_ref is (S, H*O, K) head-folded — one MXU call does the
        # head reduction.  Hx == H: per-head (S, H, O, K).
        i = pl.program_id(0)
        for j in range(G):
            t = i * G + j

            @pl.when(t < nt)
            def _():
                rel = ts_ref[jnp.minimum(t, nt - 1)]
                rows = slice(j * T, (j + 1) * T)
                if Hx == 1:
                    o_ref[rows, :] = jax.lax.dot_general(
                        ct_ref[rows, :],
                        wt_ref[rel],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    ).astype(o_ref.dtype)
                else:
                    for h in range(H):
                        o_ref[rows, h * K : (h + 1) * K] = jax.lax.dot_general(
                            ct_ref[rows, h * O : (h + 1) * O],
                            wt_ref[rel, h],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec,
                        ).astype(o_ref.dtype)

    return kernel


def _dx_resident(ct_rows, w, seg, x3, x_heads, interpret):
    S, H, K, O = w.shape
    T, nt = seg.tile, seg.n_tiles
    Hx = x_heads if x3 else 1
    out_cols = Hx * K if Hx > 1 else K
    BT = _choose_block_rows(T, seg.n_rows)
    G = BT // T
    if Hx == 1:
        # (S, H, K, O) -> (S, H*O, K): dx = ct_flat @ wt_cat sums over heads
        wt_in = jnp.transpose(w, (0, 1, 3, 2)).reshape(S, H * O, K)
        wt_spec = pl.BlockSpec((S, H * O, K), lambda i, ts: (0, 0, 0))
    else:
        wt_in = jnp.swapaxes(w, 2, 3)
        wt_spec = pl.BlockSpec((S, H, O, K), lambda i, ts: (0, 0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(nt, G),),
        in_specs=[
            pl.BlockSpec((BT, H * O), lambda i, ts: (i, 0)),
            wt_spec,
        ],
        out_specs=pl.BlockSpec((BT, out_cols), lambda i, ts: (i, 0)),
    )
    out = pl.pallas_call(
        _make_dx_resident_kernel(H, Hx, K, O, T, G, nt,
                                 _dot_precision(ct_rows.dtype)),
        grid_spec=grid_spec,
        out_shape=out_struct((seg.n_rows, out_cols), ct_rows.dtype,
                             ct_rows, w),
        interpret=interpret,
    )(jnp.asarray(seg.tile_seg), ct_rows.reshape(seg.n_rows, H * O), wt_in)
    if x3:
        return out.reshape(seg.n_rows, Hx, K)
    return out


def _make_dw_resident_kernel(H, Hx, K, O, T, G, nt, prec):
    def kernel(ts_ref, x_ref, ct_ref, o_ref):
        # o_ref resident across the whole grid:
        #   Hx == 1: (S, K, H*O) head-folded; else (S, H, K, O)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        for j in range(G):
            t = i * G + j

            @pl.when(t < nt)
            def _():
                rel = ts_ref[jnp.minimum(t, nt - 1)]
                rows = slice(j * T, (j + 1) * T)
                if Hx == 1:
                    acc = jax.lax.dot_general(
                        x_ref[rows, :K],
                        ct_ref[rows, :],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    )
                    o_ref[rel] = o_ref[rel] + acc.astype(o_ref.dtype)
                else:
                    for h in range(H):
                        acc = jax.lax.dot_general(
                            x_ref[rows, h * K : h * K + K],
                            ct_ref[rows, h * O : (h + 1) * O],
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec,
                        )
                        o_ref[rel, h] = o_ref[rel, h] + acc.astype(o_ref.dtype)

    return kernel


def _dw_resident(x_rows, ct_rows, w_shape, seg, interpret):
    S, H, K, O = w_shape
    T, nt = seg.tile, seg.n_tiles
    xf, x3, Hx = _fold_x(x_rows)
    BT = _choose_block_rows(T, seg.n_rows)
    G = BT // T
    if Hx == 1:
        out_shape = out_struct((S, K, H * O), jnp.float32, x_rows, ct_rows)
        out_spec = pl.BlockSpec((S, K, H * O), lambda i, ts: (0, 0, 0))
    else:
        out_shape = out_struct((S, H, K, O), jnp.float32, x_rows, ct_rows)
        out_spec = pl.BlockSpec((S, H, K, O), lambda i, ts: (0, 0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(nt, G),),
        in_specs=[
            pl.BlockSpec((BT, Hx * K), lambda i, ts: (i, 0)),
            pl.BlockSpec((BT, H * O), lambda i, ts: (i, 0)),
        ],
        out_specs=out_spec,
    )
    out = pl.pallas_call(
        _make_dw_resident_kernel(H, Hx, K, O, T, G, nt,
                                 _dot_precision(x_rows.dtype)),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(seg.tile_seg), xf, ct_rows.reshape(seg.n_rows, H * O))
    if Hx == 1:
        # (S, K, H*O) -> (S, H, K, O)
        out = jnp.transpose(out.reshape(S, K, H, O), (0, 2, 1, 3))
    return out


# ---------------------------------------------------------------- dX


def _make_dx_stream_kernel(H, Hx, K, O, T, G, nt, prec):
    folded = Hx == 1  # (H*O, K) block, one dot reduces over heads

    def kernel(ts_ref, wcopy_ref, ct_ref, wt_hbm, o_ref, w_buf, sem):
        i = pl.program_id(0)
        for j in range(G):
            t = i * G + j
            tc = jnp.minimum(t, nt - 1)
            rel = ts_ref[tc]

            @pl.when(jnp.logical_and(t < nt, wcopy_ref[tc] == 1))
            def _():
                cp = pltpu.make_async_copy(wt_hbm.at[rel], w_buf, sem)
                cp.start()
                cp.wait()

            @pl.when(t < nt)
            def _():
                rows = slice(j * T, (j + 1) * T)
                if folded:
                    # head-folded (H*O, K) block: one dot sums over heads
                    o_ref[rows, :] = jax.lax.dot_general(
                        ct_ref[rows, :],
                        w_buf[...],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    ).astype(o_ref.dtype)
                else:
                    for h in range(H):
                        o_ref[rows, h * K : (h + 1) * K] = jax.lax.dot_general(
                            ct_ref[rows, h * O : (h + 1) * O],
                            w_buf[h],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec,
                        ).astype(o_ref.dtype)

    return kernel


def segment_matmul_rows_dx(
    ct_rows: Array,
    w: Array,
    seg: Segments,
    x3: bool,
    x_heads: int,
    *,
    interpret: Optional[bool] = None,
) -> Array:
    """d x_rows = ct[:, h, :] @ W[rel, h]^T, reduced over heads when the
    forward input was head-broadcast."""
    if interpret is None:
        interpret = _interpret_default()
    common = jnp.promote_types(ct_rows.dtype, w.dtype)
    ct_rows = ct_rows.astype(common)
    w = w.astype(common)
    S, H, K, O = w.shape
    T, nt = seg.tile, seg.n_tiles
    if w.size * _itemsize(w) <= W_RESIDENT_BYTES:
        return _dx_resident(ct_rows, w, seg, x3, x_heads, interpret)
    # streamed large-R path: super-blocked grid + per-relation-run weight
    # DMA, mirroring _fwd_streamed.  Host-side weight transpose like the
    # reference backward (hrt/python/backend/rgnn_layers_and_funcs.py:64).
    Hx = x_heads if x3 else 1
    out_cols = Hx * K if Hx > 1 else K
    BT = _choose_block_rows(T, seg.n_rows, target=2048, max_g=16)
    G = BT // T
    ts = jnp.asarray(seg.tile_seg)
    wcopy = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (ts[1:] != ts[:-1]).astype(jnp.int32)]
    )
    if Hx == 1:
        wt_in = jnp.transpose(w, (0, 1, 3, 2)).reshape(S, H * O, K)
        scratch = pltpu.VMEM((H * O, K), wt_in.dtype)
    else:
        wt_in = jnp.swapaxes(w, 2, 3)  # (S, H, O, K)
        scratch = pltpu.VMEM((H, O, K), wt_in.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(pl.cdiv(nt, G),),
        in_specs=[
            pl.BlockSpec((BT, H * O), lambda i, ts, wc: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((BT, out_cols), lambda i, ts, wc: (i, 0)),
        scratch_shapes=[scratch, pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        _make_dx_stream_kernel(H, Hx, K, O, T, G, nt,
                               _dot_precision(ct_rows.dtype)),
        grid_spec=grid_spec,
        out_shape=out_struct((seg.n_rows, out_cols), ct_rows.dtype,
                             ct_rows, w),
        interpret=interpret,
    )(ts, wcopy, ct_rows.reshape(seg.n_rows, H * O), wt_in)
    if x3:
        return out.reshape(seg.n_rows, Hx, K)
    return out


# ---------------------------------------------------------------- dW


def _make_dw_kernel(H: int, Hx: int, K: int, O: int, prec=None):
    def kernel(tile_seg_ref, first_ref, x_ref, ct_ref, o_ref):
        # x_ref: (T, Hx*K); ct_ref: (T, H*O); o_ref: (1, H, K, O)
        i = pl.program_id(0)
        for h in range(H):
            xh = x_ref[:, (h % Hx) * K : (h % Hx) * K + K] if Hx > 1 else (
                x_ref[:, :K]
            )
            acc = jax.lax.dot_general(
                xh,
                ct_ref[:, h * O : (h + 1) * O],
                dimension_numbers=(((0,), (0,)), ((), ())),  # x^T @ ct
                preferred_element_type=jnp.float32,
                precision=prec,
            )

            @pl.when(first_ref[i] == 1)
            def _():
                o_ref[0, h] = acc.astype(o_ref.dtype)

            @pl.when(first_ref[i] == 0)
            def _():
                o_ref[0, h] = o_ref[0, h] + acc.astype(o_ref.dtype)

    return kernel


def segment_matmul_rows_dw(
    x_rows: Array,
    ct_rows: Array,
    w_shape,
    seg: Segments,
    *,
    interpret: Optional[bool] = None,
) -> Array:
    """dW[s, h] = sum over rows of segment s of x_row^T ct_row[h]."""
    if interpret is None:
        interpret = _interpret_default()
    common = jnp.promote_types(x_rows.dtype, ct_rows.dtype)
    x_rows = x_rows.astype(common)
    ct_rows = ct_rows.astype(common)
    S, H, K, O = w_shape
    T, nt = seg.tile, seg.n_tiles
    if int(np.prod(w_shape)) * 4 <= W_RESIDENT_BYTES:
        return _dw_resident(x_rows, ct_rows, w_shape, seg, interpret)
    xf, x3, Hx = _fold_x(x_rows)
    ts = jnp.asarray(seg.tile_seg)
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (ts[1:] != ts[:-1]).astype(jnp.int32)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),  # tiles of a segment are consecutive -> safe revisit
        in_specs=[
            pl.BlockSpec((T, Hx * K), lambda i, ts, first: (i, 0)),
            pl.BlockSpec((T, H * O), lambda i, ts, first: (i, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, H, K, O), lambda i, ts, first: (ts[i], 0, 0, 0)
        ),
    )
    return pl.pallas_call(
        _make_dw_kernel(H, Hx, K, O, prec=_dot_precision(x_rows.dtype)),
        grid_spec=grid_spec,
        out_shape=out_struct((S, H, K, O), jnp.float32, x_rows, ct_rows),
        interpret=interpret,
    )(ts, first, xf, ct_rows.reshape(seg.n_rows, H * O))


# ------------------------------------------------------- custom_vjp wrapper


@jax.custom_vjp
def segment_matmul_rows_pallas(
    x_rows: Array, w: Array, seg: Segments
) -> Array:
    """Differentiable Pallas segment matmul; drop-in replacement for the XLA
    ``segment_matmul_rows`` (het_tpu/ops/linear.py).

    ``seg`` is a pytree *argument* with a None cotangent — custom_vjp
    closures over traced values break under shard_map."""
    return segment_matmul_rows_fwd(x_rows, w, seg)


def _smm_fwd(x_rows, w, seg):
    return segment_matmul_rows_fwd(x_rows, w, seg), (x_rows, w, seg)


def _smm_bwd(res, ct):
    x_rows, w, seg = res
    # padding rows contribute zero to dW because their x is exactly zero
    # by construction (sentinel-index gathers), and zero to dx consumers
    # because nothing reads padded rows back.
    ct = ct.astype(x_rows.dtype)
    x3 = x_rows.ndim == 3
    hx = x_rows.shape[1] if x3 else 1
    dx = segment_matmul_rows_dx(ct, w, seg, x3, hx)
    dw = segment_matmul_rows_dw(x_rows, ct, w.shape, seg).astype(w.dtype)
    return dx, dw, None


segment_matmul_rows_pallas.defvjp(_smm_fwd, _smm_bwd)
