"""Fused edge softmax + weighted aggregation with an analytic, gather-only
backward — the TPU counterpart of the reference's fused GAT kernel pair
(``HET_gatExpLeakyReluSumKernel`` + ``HET_gatSumProdZipDivKernel``,
hrt/include/DGLHackKernel/RGAT/RGATKernelsSeparateCOO.cu.h:17-215) and the
HGT fused softmax/mean-aggregation ops (HGTForwardKernels.cu.h:51,247,428):

    out[v] = sum_e softmax_dst(act(raw_e))_e * feat_e      (e: dst(e) = v)

Layout rule (round-3 redesign, measured on mag-scale data): per-edge
payloads here are NARROW — [z | z*feat] is 12-16 lanes for classification
heads — so every materialized per-edge pass and every kernel DMA rides the
**folded layout**: k = 128 // Cp consecutive edges per 128-lane row
(seg_reduce.seg_sum_sorted_folded_pallas_raw).  XLA fuses the fold into the
producing gather for free (``take(...).reshape(EP//k, 128)`` measures the
same as the unfolded gather), and the folded reduce kernel runs the same
MXU work on 1/k the DMA bytes (0.53 ms vs 2.0 ms f32 at mag scale, Cp=16).

Gather cost model baked into the backward design (measured):

* a RANDOM row gather costs ~0.55-0.8 ms at mag scale in isolation (HBM
  read-granule bound, width-independent below ~128 lanes);
* a MONOTONE row gather (run expansion: ``er_c[edge_map_dst]``,
  ``ctpack[dst]`` — both non-decreasing in canonical order) streams its
  source and is several times cheaper;
* an edge-space PERMUTE costs ~2.1-2.5 ms flat (width-independent; bf16
  narrow sources drop to ~0.35 ms once they fit on-chip).

Design rule (measured END-TO-END, not from the isolated numbers above):
the backward computes its payload ONCE in canonical order — where the
``ctpack[dst]`` gather is monotone — then pays one flat edge-space permute
into ``edge_sort_perm`` order for the source-compact reduction.  The
alternative (recomputing the payload directly in permuted order from
composed index vectors, so no permute) loses badly in the composed
program: 16.0 ms vs 9.9 ms for the full compact-RGAT pullback at mag
scale, because the permuted variant's three RANDOM gathers defeat XLA's
fusion of the payload pass while the canonical variant's gathers stream.
The destination-side reduction runs over canonical (dst, rel) runs which
need no reorder at all.

Backward math (no segment softmax derivative chains; with ``s`` = softmax
denominators and ``out`` saved from the forward):

    alpha_e   = z_e / s[dst(e)]
    dfeat_e   = alpha_e * ct[dst(e)]
    draw_e    = alpha_e * (<feat_e, ct[dst(e)]> - <out[dst(e)], ct[dst(e)]>)
                * act'(raw_e)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ...graph.structures import HeteroGraph
from ..common import (gather_dst, gather_nodes, safe_div, take_rows,
                      take_rows_padded)
from .seg_reduce import fold_width as _fold_width

Array = jax.Array


def _act_apply(raw, act: str, slope: float, clip: Optional[float]):
    if act == "leaky_relu":
        a = jnp.where(raw >= 0, raw, slope * raw)
    else:
        assert act == "identity"
        a = raw
    if clip is not None:
        a = jnp.clip(a, -clip, clip)
    return a


def _act_deriv(raw, act: str, slope: float, clip: Optional[float]):
    d = jnp.ones_like(raw)
    if act == "leaky_relu":
        d = jnp.where(raw >= 0, d, slope * d)
        inner = jnp.where(raw >= 0, raw, slope * raw)
    else:
        inner = raw
    if clip is not None:
        d = jnp.where(jnp.abs(inner) <= clip, d, jnp.zeros_like(d))
    return d


def _pack_dt(x) -> jnp.dtype:
    return jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32


# Source-compact backward strategy: "permute" computes the payload once in
# canonical order and pays one flat edge permute; "perm_direct" re-derives
# it in edge_sort_perm order from host-composed small-source maps
# (CompactInfo.perm_*) with no EP payload permute.  Round-4 interleaved
# e2e A/B on the real headline step: permute 11.9/12.1 ms, perm_direct
# 23.0/23.0 — the permuted-order random gathers (peer + ctpack) defeat
# XLA's fusion of the payload pass far beyond what isolated gather timings
# suggest, re-confirming the round-3 finding at composed scale.  The
# perm_direct path and its host maps stay as the documented negative
# result (and the maps serve future in-kernel gather experiments).
COMPACT_BWD = "permute"


def _packed_reduce(parts, C, pack_dt, row_ptr, n_rows, EP, E, tables,
                   perm=None, out_dt=None):
    """See :func:`~het_tpu.ops.pallas.seg_reduce.seg_sum_sorted_packed`."""
    from .seg_reduce import seg_sum_sorted_packed

    return seg_sum_sorted_packed(
        parts, C, pack_dt, row_ptr, n_rows, EP, E, tables,
        perm=perm, out_dtype=out_dt,
    )


def _packed_reduce_dst(g: HeteroGraph, parts, C, pack_dt):
    return _packed_reduce(
        parts, C, pack_dt, g.in_row_ptr, g.num_nodes,
        g.num_padded_edges, g.num_edges, g.in_tables,
    )


def _repeat_heads(z: Array, D: int) -> Array:
    """(EP, H) -> (EP, H*D) head-major broadcast (lane index map, fused by
    XLA into the surrounding elementwise pass)."""
    return jnp.repeat(z, D, axis=1) if D > 1 else z


def _head_sums(p: Array, H: int, D: int) -> Array:
    """Sum (EP, H*D) head-major lanes to (EP, H)."""
    if D == 1:
        return p
    return p.reshape(p.shape[0], H, D).sum(axis=-1)


@functools.lru_cache(maxsize=None)
def _head_sum_matrix(H: int, D: int):
    """(H*D, H) one-hot head-sum matrix M[h*D+d, h] = 1 (numpy: caching a
    traced-context jnp constant would leak tracers across jit scopes)."""
    import numpy as np

    m = np.zeros((H * D, H), np.float32)
    for h in range(H):
        m[h * D : (h + 1) * D, h] = 1.0
    return m


def _head_sums_mm(p: Array, H: int, D: int) -> Array:
    """Head sums as a one-hot MXU contraction — strictly 2D, layout-neutral
    (the reshape-sum form makes XLA pick column-major layouts for wide
    elementwise chains, inserting physical copies; see _make_node_fused_op
    docstring)."""
    if D == 1:
        return p
    return jax.lax.dot(
        p.astype(jnp.float32), jnp.asarray(_head_sum_matrix(H, D)),
        preferred_element_type=jnp.float32,
    )


def _repeat_heads_mm(z: Array, D: int) -> Array:
    """(EP, H) -> (EP, H*D) head-major broadcast as a one-hot MXU dot.
    ``jnp.repeat`` lowers through a 3D broadcast_in_dim whose col-major
    bitcast forces a physical (EP, H*D) layout copy AND flips the whole
    consuming elementwise chain col-major (see _make_node_fused_op)."""
    if D == 1:
        return z
    H = z.shape[1]
    return jax.lax.dot(
        z.astype(jnp.float32), jnp.asarray(_head_sum_matrix(H, D).T),
        preferred_element_type=jnp.float32,
    )


@functools.lru_cache(maxsize=None)
def _make_fused_op(act: str, slope: float, clip: Optional[float]):
    """Custom-VJP fused op, per-edge inputs.  Traced operands (the graph
    included) flow through arguments — None cotangents — never closures
    (closures break under shard_map)."""

    def _fwd(feat2d, raw, g):
        EP, HD = feat2d.shape
        H = raw.shape[1]
        D = HD // H
        pack_dt = _pack_dt(feat2d)
        z = jnp.exp(
            _act_apply(raw.astype(jnp.float32), act, slope, clip)
        )  # (EP, H); finite (=1) on padding edges, dropped by the kernel
        zf = _repeat_heads_mm(z, D) * feat2d.astype(jnp.float32)
        agg = _packed_reduce_dst(g, [z, zf], H + HD, pack_dt)
        s, num = agg[:, :H], agg[:, H : H + HD]
        out = safe_div(num.reshape(-1, H, D), s[..., None])
        return out.astype(feat2d.dtype), s, out

    @jax.custom_vjp
    def op(feat2d, raw, g):
        return _fwd(feat2d, raw, g)[0]

    def fwd_rule(feat2d, raw, g):
        out_cast, s, out = _fwd(feat2d, raw, g)
        return out_cast, (feat2d, raw, s, out, g)

    def _bwd(res, ct):
        feat2d, raw, s, out, g = res
        EP, HD = feat2d.shape
        H = raw.shape[1]
        D = HD // H
        z = jnp.exp(_act_apply(raw.astype(jnp.float32), act, slope, clip))
        ct = ct.astype(jnp.float32)
        ct2 = ct.reshape(-1, HD)
        t2 = jnp.sum(out * ct, axis=-1)  # (N, H)
        # one packed dst gather (monotone: canonical order is dst-sorted)
        # serves ct, s and t2
        cpe = gather_dst(g, jnp.concatenate([ct2, s, t2], axis=1))
        ctd = cpe[:, :HD]
        s_d = cpe[:, HD : HD + H]
        t2d = cpe[:, HD + H :]
        alpha = safe_div(z, s_d)
        feat32 = feat2d.astype(jnp.float32)
        dfeat = _repeat_heads(alpha, D) * ctd
        t1 = _head_sums(feat32 * ctd, H, D)
        draw = alpha * (t1 - t2d) * _act_deriv(
            raw.astype(jnp.float32), act, slope, clip
        )
        return dfeat.astype(feat2d.dtype), draw.astype(raw.dtype), None

    op.defvjp(fwd_rule, _bwd)
    return op


def fused_softmax_agg(
    g: HeteroGraph,
    feat_e: Array,
    raw_e: Array,
    *,
    act: str = "leaky_relu",
    slope: float = 0.2,
    clip: Optional[float] = None,
) -> Array:
    """Differentiable fused ``sum_dst softmax(act(raw)) * feat``.

    feat_e (EP, H, D); raw_e (EP, H) pre-activation logits -> (N, H, D).
    """
    EP, H, D = feat_e.shape
    op = _make_fused_op(act, float(slope), clip)
    out = op(feat_e.reshape(EP, H * D), raw_e, g)
    return out.reshape(g.num_nodes, H, D)


# --------------------------- compact (single-sided) fused aggregation


def _sorted_compact_reduce(info, parts, C, pack_dt, EP, E, out_dt=None):
    """Reduce canonical-order per-edge payload parts into compact rows:
    one flat edge permute into ``edge_sort_perm`` order + the sorted
    one-hot kernel over ``edge_row_ptr``."""
    return _packed_reduce(
        parts, C, pack_dt, info.edge_row_ptr, info.seg.n_rows, EP, E,
        info.edge_tables, perm=info.edge_sort_perm, out_dt=out_dt,
    )


@functools.lru_cache(maxsize=None)
def _make_compact_fused_op(act: str, slope: float, clip: Optional[float]):
    """Fused compact (single-sided) relational softmax aggregation.

    The TPU realization of the reference's
    ``relational_fused_gat_compact_as_of_node_separate_coo_single_sided``
    (hrt/python/backend/rgat_layers_and_funcs.py:826) and the compact HGT
    softmax ops: inputs stay in compact (unique (relation, node)) rows —
    ``feat_c``/``el_c`` on the source side, ``er_c`` on the destination
    side — and per-edge tensors exist only as fused-gather emits feeding
    the folded one-hot reduce kernel (module docstring for the layout and
    gather cost rules)."""

    def _edge_terms(el_feat_c, er_c, idx_self, idx_peer, H):
        """Per-edge raw logits / z / act' / feat from compact rows, under
        arbitrary (canonical or permuted) edge-index vectors.  One random
        gather (el|feat concatenated) + one peer gather."""
        ge = take_rows(el_feat_c, idx_self).astype(jnp.float32)
        er_e = take_rows_padded(er_c, idx_peer).astype(jnp.float32)
        raw = ge[:, :H] + er_e
        z = jnp.exp(_act_apply(raw, act, slope, clip))
        actd = _act_deriv(raw, act, slope, clip)
        return z, actd, ge[:, H:]

    def _fwd(feat_c2d, el_c, er_c, g):
        infoS = g.compact_src
        infoD = g.compact_dst
        EP = g.num_padded_edges
        H = el_c.shape[1]
        HD = feat_c2d.shape[1]
        D = HD // H
        pack_dt = _pack_dt(feat_c2d)
        el_feat_c = jnp.concatenate([el_c, feat_c2d], axis=1)
        z, _, feat_e = _edge_terms(
            el_feat_c, er_c, infoS.edge_map, infoD.edge_map, H
        )
        zf = _repeat_heads_mm(z, D) * feat_e
        agg = _packed_reduce_dst(g, [z, zf], H + HD, pack_dt)
        s, num = agg[:, :H], agg[:, H : H + HD]
        out = safe_div(num.reshape(-1, H, D), s[..., None])
        return out.astype(feat_c2d.dtype), (s, out)

    @jax.custom_vjp
    def op(feat_c2d, el_c, er_c, g):
        return _fwd(feat_c2d, el_c, er_c, g)[0]

    def fwd_rule(feat_c2d, el_c, er_c, g):
        # residuals hold NO (EP, ...)-shaped arrays: per-edge terms are
        # recomputed in the backward from compact-row gathers (at full-mag
        # scale a single (EP, H) residual is tens of MB; recomputation is
        # one fused gather pass)
        out_cast, (s, out) = _fwd(feat_c2d, el_c, er_c, g)
        return out_cast, (feat_c2d, el_c, er_c, s, out, g)

    def _bwd(res, ct):
        feat_c2d, el_c, er_c, s, out, g = res
        infoS = g.compact_src
        infoD = g.compact_dst
        EP = g.num_padded_edges
        E = g.num_edges
        HD = feat_c2d.shape[1]
        H = el_c.shape[1]
        D = HD // H
        pack_dt = _pack_dt(feat_c2d)
        el_feat_c = jnp.concatenate([el_c, feat_c2d], axis=1)
        ct = ct.astype(jnp.float32)
        ct2 = ct.reshape(-1, HD)
        t2 = jnp.sum(out * ct, axis=-1)  # (N, H)
        ctpack = jnp.concatenate([ct2, s, t2], axis=1)  # (N, HD + 2H)

        # canonical-order pipeline: every gather either streams
        # (ctpack[dst] is monotone) or reads a compact-row source; feeds
        # d_er's canonical (dst, rel)-run reduce
        z, actd, feat_e = _edge_terms(
            el_feat_c, er_c, infoS.edge_map, infoD.edge_map, H
        )
        cpe = gather_dst(g, ctpack)  # monotone
        ctd = cpe[:, :HD]
        s_d = cpe[:, HD : HD + H]
        t2d = cpe[:, HD + H :]
        alpha = safe_div(z, s_d)
        t1 = _head_sums_mm(feat_e * ctd, H, D)
        draw = alpha * (t1 - t2d) * actd
        dfeat_full = _repeat_heads_mm(alpha, D) * ctd

        # destination side: canonical (dst, rel) runs — no reorder at
        # all.  The payload deliberately matches the source side's
        # ([draw | dfeat]): XLA CSEs the identical pack/pad expression,
        # so ONE materialized canonical payload feeds both this kernel
        # and the permute (the standalone [draw]-only pad chain measured
        # ~1 ms of layout copies in the device trace); the extra lanes
        # cost the canon kernel nothing (same folded 128-lane rows).
        n_runs = int(infoD.canon_ptr.shape[0]) - 1
        redD = _packed_reduce(
            [draw, dfeat_full], H + HD, pack_dt, infoD.canon_ptr, n_runs,
            EP, E, infoD.canon_tables, out_dt=pack_dt,
        )
        d_er_c = gather_nodes(
            redD[:, :H], infoD.canon_to_row, pin_output=True
        )

        if COMPACT_BWD == "perm_direct" and infoS.perm_self_map is not None:
            # source side: RE-derive the payload directly in
            # edge_sort_perm order from the host-composed maps — all
            # gathers read compact/node-sized sources (streamable or
            # VMEM-stageable), no EP-row payload permute (which cannot
            # stage in VMEM and measures 3-4 ms at mag scale).  The
            # duplicated elementwise work fuses into the gather pass.
            zp, actdp, feat_p = _edge_terms(
                el_feat_c, er_c, infoS.perm_self_map, infoS.perm_peer_map,
                H,
            )
            cpp = take_rows(ctpack, infoS.perm_dst).astype(jnp.float32)
            ctdp = cpp[:, :HD]
            s_dp = cpp[:, HD : HD + H]
            t2dp = cpp[:, HD + H :]
            alphap = safe_div(zp, s_dp)
            t1p = _head_sums_mm(feat_p * ctdp, H, D)
            drawp = alphap * (t1p - t2dp) * actdp
            dfeatp = _repeat_heads_mm(alphap, D) * ctdp
            redS = _packed_reduce(
                [drawp, dfeatp], H + HD, pack_dt, infoS.edge_row_ptr,
                infoS.seg.n_rows, EP, E, infoS.edge_tables,
                out_dt=pack_dt,
            )
        else:
            # source side: one flat permute of the canonical packed payload
            redS = _sorted_compact_reduce(
                infoS, [draw, dfeat_full], H + HD, pack_dt, EP, E,
                out_dt=pack_dt,
            )
        d_el_c = redS[:, :H].astype(el_c.dtype)
        d_feat_c = redS[:, H : H + HD].astype(feat_c2d.dtype)
        return d_feat_c, d_el_c, d_er_c.astype(er_c.dtype), None

    op.defvjp(fwd_rule, _bwd)
    return op


@functools.lru_cache(maxsize=None)
def _make_src_compact_fused_op(act: str, slope: float, clip: Optional[float]):
    """Fused softmax aggregation whose FEATURES live on source-compact
    rows while the logits stay per-edge (HGT: message = v·W_msg[rel]
    materialized once per unique (rel, src), score per edge).  The
    reference's compact flag covers the message transform the same way
    (hrt/python/HGT/models.py:255 with unique-node row indices).

        out[v] = sum_e softmax_dst(act(raw_e))_e * feat_c[cmapS(e)]

    Backward: d_feat_c's canonical-order payload rides one flat permute
    into ``edge_sort_perm`` order + the sorted one-hot kernel; d_raw is
    pure per-edge elementwise."""

    def _fwd(feat_c2d, raw_e, g):
        infoS = g.compact_src
        EP = g.num_padded_edges
        H = raw_e.shape[1]
        HD = feat_c2d.shape[1]
        D = HD // H
        pack_dt = _pack_dt(feat_c2d)
        z = jnp.exp(_act_apply(raw_e.astype(jnp.float32), act, slope, clip))
        feat_e = take_rows(feat_c2d, infoS.edge_map).astype(jnp.float32)
        zf = _repeat_heads_mm(z, D) * feat_e
        agg = _packed_reduce_dst(g, [z, zf], H + HD, pack_dt)
        s, num = agg[:, :H], agg[:, H : H + HD]
        out = safe_div(num.reshape(-1, H, D), s[..., None])
        return out.astype(feat_c2d.dtype), (s, out)

    @jax.custom_vjp
    def op(feat_c2d, raw_e, g):
        return _fwd(feat_c2d, raw_e, g)[0]

    def fwd_rule(feat_c2d, raw_e, g):
        out_cast, (s, out) = _fwd(feat_c2d, raw_e, g)
        return out_cast, (feat_c2d, raw_e, s, out, g)

    def _bwd(res, ct):
        feat_c2d, raw_e, s, out, g = res
        infoS = g.compact_src
        EP = g.num_padded_edges
        E = g.num_edges
        HD = feat_c2d.shape[1]
        H = raw_e.shape[1]
        D = HD // H
        pack_dt = _pack_dt(feat_c2d)
        z = jnp.exp(_act_apply(raw_e.astype(jnp.float32), act, slope, clip))
        actd = _act_deriv(raw_e.astype(jnp.float32), act, slope, clip)
        ct = ct.astype(jnp.float32)
        ct2 = ct.reshape(-1, HD)
        t2 = jnp.sum(out * ct, axis=-1)  # (N, H)
        ctpack = jnp.concatenate([ct2, s, t2], axis=1)
        cpe = gather_dst(g, ctpack)  # monotone
        ctd = cpe[:, :HD]
        s_d = cpe[:, HD : HD + H]
        t2d = cpe[:, HD + H :]
        alpha = safe_div(z, s_d)
        feat_e = take_rows(feat_c2d, infoS.edge_map).astype(jnp.float32)
        t1 = _head_sums(feat_e * ctd, H, D)
        draw = alpha * (t1 - t2d) * actd  # (EP, H): pure elementwise
        # d_feat_c: canonical-order payload + one flat permute into
        # edge_sort_perm order (module docstring design rule)
        dfeat = _repeat_heads(alpha, D) * ctd
        red = _sorted_compact_reduce(
            infoS, [dfeat], HD, pack_dt, EP, E, out_dt=pack_dt
        )
        d_feat_c = red[:, :HD].astype(feat_c2d.dtype)
        return d_feat_c, draw.astype(raw_e.dtype), None

    op.defvjp(fwd_rule, _bwd)
    return op


@functools.lru_cache(maxsize=None)
def _make_compact_fused_packed_op(
    act: str, slope: float, clip: Optional[float]
):
    """Packed-operand form of the compact fused op: the source-side operand
    is the raw output of the FUSED feature+logit projection — one
    (UC, H, 1+D) buffer with per-head lanes ``[el, feat_0..feat_{D-1}]`` —
    instead of separate ``el_c``/``feat_c`` arrays.

    Why a separate form exists: narrow arrays pay the TPU's (8, 128) tile
    layout in full — a (UC, H) f32 buffer occupies UC x 512 bytes of HBM
    regardless of H.  At full-mag scale (6.2M compact rows) every separate
    narrow compact array is a 1.5-3 GB allocation; the packed form keeps
    ONE buffer end-to-end (the gradient leaves the backward reduce already
    in the packed layout), which is what lets the 21M-edge single-chip run
    fit.  Numerics are identical to the unpacked op."""

    def _fwd(fe2d, er_c, g):
        infoS = g.compact_src
        infoD = g.compact_dst
        EP = g.num_padded_edges
        H = er_c.shape[1]
        D1 = fe2d.shape[1] // H  # 1 + D
        D = D1 - 1
        HD = H * D
        pack_dt = _pack_dt(fe2d)
        ge = take_rows(fe2d, infoS.edge_map).astype(jnp.float32)
        ge3 = ge.reshape(EP, H, D1)
        er_e = take_rows_padded(er_c, infoD.edge_map).astype(jnp.float32)
        raw = ge3[..., 0] + er_e
        z = jnp.exp(_act_apply(raw, act, slope, clip))
        zf = (z[..., None] * ge3[..., 1:]).reshape(EP, HD)
        agg = _packed_reduce_dst(g, [z, zf], H + HD, pack_dt)
        s, num = agg[:, :H], agg[:, H : H + HD]
        out = safe_div(num.reshape(-1, H, D), s[..., None])
        return out.astype(fe2d.dtype), (s, out)

    @jax.custom_vjp
    def op(fe2d, er_c, g):
        return _fwd(fe2d, er_c, g)[0]

    def fwd_rule(fe2d, er_c, g):
        out_cast, (s, out) = _fwd(fe2d, er_c, g)
        return out_cast, (fe2d, er_c, s, out, g)

    def _bwd(res, ct):
        fe2d, er_c, s, out, g = res
        infoS = g.compact_src
        infoD = g.compact_dst
        EP = g.num_padded_edges
        E = g.num_edges
        H = er_c.shape[1]
        D1 = fe2d.shape[1] // H
        D = D1 - 1
        HD = H * D
        pack_dt = _pack_dt(fe2d)
        ge = take_rows(fe2d, infoS.edge_map).astype(jnp.float32)
        ge3 = ge.reshape(EP, H, D1)
        er_e = take_rows_padded(er_c, infoD.edge_map).astype(jnp.float32)
        raw = ge3[..., 0] + er_e
        z = jnp.exp(_act_apply(raw, act, slope, clip))
        actd = _act_deriv(raw, act, slope, clip)
        ct = ct.astype(jnp.float32)
        ct2 = ct.reshape(-1, HD)
        t2 = jnp.sum(out * ct, axis=-1)  # (N, H)
        cpe = gather_dst(g, jnp.concatenate([ct2, s, t2], axis=1))
        ctd3 = cpe[:, :HD].reshape(EP, H, D)
        s_d = cpe[:, HD : HD + H]
        t2d = cpe[:, HD + H :]
        alpha = safe_div(z, s_d)
        t1 = jnp.sum(ge3[..., 1:] * ctd3, axis=-1)
        draw = alpha * (t1 - t2d) * actd  # (EP, H)
        # src-side payload IN THE PACKED LAYOUT: per-head [draw | dfeat]
        # lanes — the reduce emits d_fe directly, no reassembly pass
        pay3 = jnp.concatenate(
            [draw[..., None], alpha[..., None] * ctd3], axis=-1
        ).reshape(EP, H * D1)
        redS = _sorted_compact_reduce(
            infoS, [pay3], H * D1, pack_dt, EP, E, out_dt=pack_dt
        )
        d_fe = redS[:, : H * D1].astype(fe2d.dtype)
        # dst side: canonical (dst, rel) runs over the SAME packed payload
        # (XLA CSEs the pack with the source side's — see the unpacked
        # op's note); draw sits at lane h*D1 of each head block
        n_runs = int(infoD.canon_ptr.shape[0]) - 1
        redD = _packed_reduce(
            [pay3], H * D1, pack_dt, infoD.canon_ptr, n_runs, EP, E,
            infoD.canon_tables, out_dt=pack_dt,
        )
        d_er_c = gather_nodes(
            redD[:, : H * D1 : D1], infoD.canon_to_row, pin_output=True
        )
        return d_fe, d_er_c.astype(er_c.dtype), None

    op.defvjp(fwd_rule, _bwd)
    return op


def fused_softmax_agg_compact_packed(
    g: HeteroGraph,
    fe: Array,
    er_c: Array,
    *,
    act: str = "leaky_relu",
    slope: float = 0.2,
    clip: Optional[float] = None,
) -> Array:
    """Differentiable compact fused softmax aggregation over the PACKED
    projection output.  fe (UCs, H, 1+D) with per-head lanes
    ``[el, feat...]``; er_c (UCd, H).  Returns (N, H, D)."""
    UC, H, D1 = fe.shape
    op = _make_compact_fused_packed_op(act, float(slope), clip)
    out = op(fe.reshape(UC, H * D1), er_c, g)
    return out.reshape(g.num_nodes, H, D1 - 1)


@functools.lru_cache(maxsize=None)
def _make_node_fused_op(act: str, slope: float, clip: Optional[float]):
    """Node-sided fused GAT: features AND logits live on node rows — the
    homogeneous special case (reference ``fused_gat_csr``,
    GAT/FusedGAT.cu.h:8-21), where "compact (rel, node) rows" degenerate to
    plain nodes, so the source-side reduction rides the graph's src-CSR
    (``out_perm``/``out_row_ptr``) instead of compact metadata.

        out[v] = sum_e softmax_dst(act(el[src(e)] + er[dst(e)]))_e
                 * feat[src(e)]

    Per-edge features exist only as fused-gather emits feeding the reduce
    kernels; for GAT's wide payloads (H*D = 256 at the bench config) this
    removes the (EP, H*D) gather materialization and its backward scatter
    (measured 9.4 ms fwd+bwd alone at mag scale) from the layer.  The wide
    ``zf`` block and the narrow ``z`` block reduce in separate kernel
    calls: splitting avoids padding 256-lane payloads to 384.

    Layout discipline (round-2 fix for GAT's ~20 ms copy residue): every
    wide buffer stays STRICTLY 2D head-major — no (EP, H, D) / (N, H, D)
    views anywhere in this op.  3D reshapes made XLA assign column-major
    layouts to the elementwise chain while the reduce-kernel operands need
    row-major, inserting 6 physical layout conversions of the (EP, 256)
    and (N, 256) buffers (~2.1 GB of pure copy traffic in the step HLO).
    Head broadcasts ride ``_repeat_heads`` (lane index map), head sums ride
    a (HD, H) one-hot matmul (``_head_sums_mm``) — both layout-neutral."""

    def _edge_inputs(feat2d, el, er, g):
        """Per-edge z, act-derivative and gathered features.

        Every (EP, c) f32 edge array physically occupies EP x 512 B (the
        (8,128) tile pads lanes), so for NARROW payloads (H + HD within
        one fold block) the el and feat gathers merge into ONE gather —
        each extra narrow gather costs a full 512 B/row pass.  For WIDE
        payloads they stay split: a fused [el | feat] gather measured
        4.5 ms vs 3.6 for split gathers at GAT widths (the narrow z chain
        blocks fusion of the wide gather otherwise).

        gather_nodes: padding edges (src == src_space sentinel) read the
        zero row -> z = 1, finite; the kernels' range compares drop them.
        """
        H = el.shape[1]
        HD = feat2d.shape[1]
        # merged gather only when dtypes already match: concatenating
        # f32 logits into a bf16 feature buffer would truncate them
        # before exp (the wide path gathers el in its own dtype)
        if (
            _fold_width(HD + H) == _fold_width(HD)
            and el.dtype == feat2d.dtype
        ):
            fe = gather_nodes(
                jnp.concatenate([feat2d, el], axis=1),
                g.src,
            ).astype(jnp.float32)
            feat_e, el_e = fe[:, :HD], fe[:, HD:]
        else:
            el_e = gather_nodes(el, g.src).astype(jnp.float32)
            feat_e = gather_nodes(feat2d, g.src).astype(jnp.float32)
        er_e = gather_dst(g, er).astype(jnp.float32)  # monotone
        raw = el_e + er_e
        z = jnp.exp(_act_apply(raw, act, slope, clip))
        actd = _act_deriv(raw, act, slope, clip)
        return z, actd, feat_e

    def _fwd(feat2d, el, er, g):
        H = el.shape[1]
        HD = feat2d.shape[1]
        D = HD // H
        pack_dt = _pack_dt(feat2d)
        z, _, feat_e = _edge_inputs(feat2d, el, er, g)
        zf = _repeat_heads_mm(z, D) * feat_e  # 2D, head-major lanes
        if _fold_width(H + HD) == _fold_width(HD):
            # narrow: z and zf share one fold block -> ONE reduce pass
            agg = _packed_reduce_dst(g, [z, zf], H + HD, pack_dt)
            s, num = agg[:, :H], agg[:, H : H + HD]
        else:
            # wide: z (narrow -> folded) and zf (multiple-of-128 -> exact)
            # reduce separately; one 384-lane call would move 1.5x the bytes
            s = _packed_reduce_dst(g, [z], H, pack_dt)[:, :H]
            num = _packed_reduce_dst(g, [zf], HD, pack_dt)[:, :HD]
        out = safe_div(num, _repeat_heads_mm(s, D))  # (N, HD) 2D
        return out.astype(feat2d.dtype), (s, out)

    @jax.custom_vjp
    def op(feat2d, el, er, g):
        return _fwd(feat2d, el, er, g)[0]

    def fwd_rule(feat2d, el, er, g):
        out_cast, (s, out) = _fwd(feat2d, el, er, g)
        return out_cast, (feat2d, el, er, s, out, g)

    def _bwd(res, ct):
        feat2d, el, er, s, out, g = res
        EP = g.num_padded_edges
        E = g.num_edges
        HD = feat2d.shape[1]
        H = el.shape[1]
        D = HD // H
        pack_dt = _pack_dt(feat2d)
        z, actd, feat_e = _edge_inputs(feat2d, el, er, g)
        ct2 = ct.astype(jnp.float32)  # (N, HD) 2D
        t2 = _head_sums_mm(out * ct2, H, D)  # (N, H)
        narrow = _fold_width(HD + 2 * H) == _fold_width(HD)
        if narrow:
            # one dst gather for [ct | s | t2] (each extra narrow gather
            # costs a full 512 B/row pass — see _edge_inputs)
            cte = gather_dst(
                g, jnp.concatenate([ct2, s, t2], axis=1)
            )  # monotone
            ctd = cte[:, :HD]
            s_d = cte[:, HD : HD + H]
            t2d = cte[:, HD + H :]
        else:
            ctd = gather_dst(g, ct2)  # wide monotone
            cpe = gather_dst(g, jnp.concatenate([s, t2], axis=1))  # narrow
            s_d = cpe[:, :H]
            t2d = cpe[:, H:]
        alpha = safe_div(z, s_d)
        t1 = _head_sums_mm(feat_e * ctd, H, D)
        draw = alpha * (t1 - t2d) * actd
        dfeat = _repeat_heads_mm(alpha, D) * ctd
        # d_er: canonical (dst-sorted) narrow folded reduce
        d_er = _packed_reduce_dst(g, [draw], H, pack_dt)[:, :H]
        # d_el | d_feat: one flat permute into src-CSR order.  Narrow:
        # both ride one fold block -> one permute + one reduce; wide:
        # zf-class payload and narrow draw ride separate kernels (pad
        # rule in _fwd)
        if narrow:
            dagg = _packed_reduce(
                [draw, dfeat], H + HD, pack_dt, g.out_row_ptr,
                g.src_space, EP, E, g.out_tables, perm=g.out_perm,
                out_dt=pack_dt,
            )
            d_el = dagg[:, :H]
            d_feat = dagg[:, H : H + HD]
        else:
            d_feat = _packed_reduce(
                [dfeat], HD, pack_dt, g.out_row_ptr, g.src_space, EP, E,
                g.out_tables, perm=g.out_perm, out_dt=pack_dt,
            )[:, :HD]
            d_el = _packed_reduce(
                [draw], H, pack_dt, g.out_row_ptr, g.src_space, EP, E,
                g.out_tables, perm=g.out_perm, out_dt=pack_dt,
            )[:, :H]
        return (
            d_feat.astype(feat2d.dtype),
            d_el.astype(el.dtype),
            d_er.astype(er.dtype),
            None,
        )

    op.defvjp(fwd_rule, _bwd)
    return op


def fused_gat_nodes2d(
    g: HeteroGraph,
    feat2d: Array,
    el: Array,
    er: Array,
    *,
    act: str = "leaky_relu",
    slope: float = 0.2,
    clip: Optional[float] = None,
) -> Array:
    """Strictly-2D node-sided fused GAT aggregation: feat2d (src_space,
    H*D) head-major, el (src_space, H), er (N, H) -> (N, H*D).  The 2D
    boundary is the point — see _make_node_fused_op's layout note."""
    H = el.shape[1]
    op = _make_node_fused_op(act, float(slope), clip)
    return op(feat2d, el, er, g)


def fused_gat_nodes(
    g: HeteroGraph,
    feat: Array,
    el: Array,
    er: Array,
    *,
    act: str = "leaky_relu",
    slope: float = 0.2,
    clip: Optional[float] = None,
) -> Array:
    """Differentiable node-sided fused GAT aggregation.

    feat (src_space, H, D), el (src_space, H), er (N, H) -> (N, H, D)."""
    ns, H, D = feat.shape
    out = fused_gat_nodes2d(
        g, feat.reshape(ns, H * D), el, er, act=act, slope=slope, clip=clip
    )
    return out.reshape(g.num_nodes, H, D)


@functools.lru_cache(maxsize=None)
def _make_hgt_compact_attention_op(clip: Optional[float]):
    """Fully-fused HGT compact attention: score SDDMM + typed softmax +
    single-sided compact aggregation in ONE custom-VJP op.

    The TPU counterpart of the reference's fused pair
    ``hgt_full_graph_hetero_attention_ops_coo`` (k·W_att·q score,
    hrt/include/DGLHackKernel/OpExport/HGTOpsEdgeParallel.inc.h:384) +
    ``hgt_full_graph_fused_message_calc_and_mean_aggregation_separate_coo``
    (…:391).  Fusing the chain matters beyond kernel counts: per-edge
    (EP, H) tensors crossing custom-VJP op boundaries get narrow
    column-major layouts from XLA and every boundary inserts physical
    layout copies — the unfused compact chain measured 18.0 ms fwd+bwd at
    mag scale (score op 7.6 + aggregation op 10.4) where this op's math
    is worth ~7 ms.  Inside one op, score/raw/z never materialize outside
    a fusion region.

        score_e[h] = <attq_c[cmapD(e), h, :], k[src(e), h, :]>
        out[v]     = sum_e softmax_dst(clip(score_e * mu[rel_e]))_e
                     * msg_c[cmapS(e)]
    """

    def _score_terms(attq2d, k2d, mu, g, H, dk):
        attq_e = take_rows(attq2d, g.compact_dst.edge_map).astype(
            jnp.float32
        )  # piecewise-constant over (dst, rel) runs
        k_e = gather_nodes(k2d, g.src).astype(jnp.float32)  # random
        score = _head_sums(attq_e * k_e, H, dk)
        mu_e = take_rows(mu, g.rel).astype(jnp.float32)
        raw = score * mu_e
        z = jnp.exp(_act_apply(raw, "identity", 0.0, clip))
        return attq_e, k_e, score, mu_e, raw, z

    def _fwd(msg2d, attq2d, k2d, mu, g):
        H = mu.shape[1]
        Hdk = msg2d.shape[1]
        dk = Hdk // H
        pack_dt = _pack_dt(msg2d)
        *_, z = _score_terms(attq2d, k2d, mu, g, H, dk)
        feat_e = take_rows(msg2d, g.compact_src.edge_map).astype(
            jnp.float32
        )
        zf = _repeat_heads_mm(z, dk) * feat_e
        agg = _packed_reduce_dst(g, [z, zf], H + Hdk, pack_dt)
        s, num = agg[:, :H], agg[:, H : H + Hdk]
        out = safe_div(num.reshape(-1, H, dk), s[..., None])
        return out.astype(msg2d.dtype), (s, out)

    @jax.custom_vjp
    def op(msg2d, attq2d, k2d, mu, g):
        return _fwd(msg2d, attq2d, k2d, mu, g)[0]

    def fwd_rule(msg2d, attq2d, k2d, mu, g):
        out_cast, (s, out) = _fwd(msg2d, attq2d, k2d, mu, g)
        # no (EP, ...) residuals: the score chain is recomputed in the
        # backward from node/compact-row gathers
        return out_cast, (msg2d, attq2d, k2d, mu, s, out, g)

    def _bwd(res, ct):
        msg2d, attq2d, k2d, mu, s, out, g = res
        infoS = g.compact_src
        infoD = g.compact_dst
        EP = g.num_padded_edges
        E = g.num_edges
        H = mu.shape[1]
        Hdk = msg2d.shape[1]
        dk = Hdk // H
        R = mu.shape[0]
        pack_dt = _pack_dt(msg2d)
        attq_e, k_e, score, mu_e, raw, z = _score_terms(
            attq2d, k2d, mu, g, H, dk
        )
        feat_e = take_rows(msg2d, infoS.edge_map).astype(jnp.float32)
        ct = ct.astype(jnp.float32)
        ct2 = ct.reshape(-1, Hdk)
        t2 = jnp.sum(out * ct, axis=-1)  # (N, H)
        cpe = gather_dst(g, jnp.concatenate([ct2, s, t2], axis=1))
        ctd = cpe[:, :Hdk]
        s_d = cpe[:, Hdk : Hdk + H]
        t2d = cpe[:, Hdk + H :]
        alpha = safe_div(z, s_d)  # 0 on padding edges (s_d = 0)
        t1 = _head_sums(feat_e * ctd, H, dk)
        draw = (
            alpha
            * (t1 - t2d)
            * _act_deriv(raw, "identity", 0.0, clip)
        )  # (EP, H), d wrt raw = score * mu_e
        dscore = draw * mu_e
        # d_mu[r] = sum_{rel(e)=r} draw * score — R is small, so one MXU
        # one-hot contraction (padding edges have draw = 0)
        rel_onehot = (
            g.rel[:, None] == jnp.arange(R, dtype=g.rel.dtype)[None, :]
        ).astype(jnp.float32)
        d_mu = jax.lax.dot_general(
            rel_onehot, draw * score,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # R is tiny; exact f32 (default TPU precision rounds the
            # operands to bf16, costing ~1e-3 relative on d_mu)
            precision=jax.lax.Precision.HIGHEST,
        )
        # d_msg_c AND the per-edge half of d_k ride ONE permuted reduce:
        # source-compact rows group edges by (rel, src), so summing the
        # d_k payload per compact row first and then reducing rows into
        # nodes replaces a second full edge permute (g.out_perm) with a
        # compact-row-scale one (UCs rows, ~2.4x fewer)
        dfeat = _repeat_heads(alpha, dk) * ctd
        dsa = _repeat_heads(dscore, dk) * attq_e
        redS = _sorted_compact_reduce(
            infoS, [dfeat, dsa], 2 * Hdk, pack_dt, EP, E, out_dt=pack_dt
        )
        d_msg = redS[:, :Hdk].astype(msg2d.dtype)
        row_dsa = redS[:, Hdk : 2 * Hdk]  # (n_rows, Hdk) per-compact-row
        from .seg_reduce import seg_sum_sorted_pallas_raw

        valsN = take_rows(row_dsa, infoS.node_sort_perm)
        Nsrc = infoS.node_row_ptr.shape[0] - 1
        d_k = seg_sum_sorted_pallas_raw(
            valsN,
            infoS.node_row_ptr,
            Nsrc,
            infoS.seg.n_rows - infoS.seg.n_src,
            tables=infoS.node_tables,
        )[:, :Hdk].astype(k2d.dtype)
        # d_attq_c: reduce dscore ⊗ k_e over canonical (dst, rel) runs
        dsk = _repeat_heads(dscore, dk) * k_e
        n_runs = int(infoD.canon_ptr.shape[0]) - 1
        redD = _packed_reduce(
            [dsk], Hdk, pack_dt, infoD.canon_ptr, n_runs, EP, E,
            infoD.canon_tables, out_dt=pack_dt,
        )
        d_attq = gather_nodes(redD[:, :Hdk], infoD.canon_to_row).astype(
            attq2d.dtype
        )
        return d_msg, d_attq, d_k, d_mu.astype(mu.dtype), None

    op.defvjp(fwd_rule, _bwd)
    return op


def hgt_fused_compact_attention(
    g: HeteroGraph,
    msg_c: Array,
    attq_c: Array,
    k_nodes: Array,
    mu: Array,
    *,
    clip: Optional[float] = None,
) -> Array:
    """Differentiable fully-fused HGT compact attention chain.

    msg_c (UCs, H, dk) source-compact messages; attq_c (UCd, H, dk)
    destination-compact attn·q rows; k_nodes (src_space, H, dk); mu (R, H)
    = relation_pri / sqrt(dk).  Returns (N, H, dk)."""
    from ..common import match_vma

    UCs, H, dk = msg_c.shape
    op = _make_hgt_compact_attention_op(clip)
    out = op(
        msg_c.reshape(UCs, H * dk),
        attq_c.reshape(attq_c.shape[0], H * dk),
        k_nodes.reshape(k_nodes.shape[0], H * dk),
        match_vma(msg_c, mu),  # mu is a replicated param under shard_map
        g,
    )
    return out


def fused_softmax_agg_src_compact(
    g: HeteroGraph,
    feat_c: Array,
    raw_e: Array,
    *,
    act: str = "identity",
    slope: float = 0.2,
    clip: Optional[float] = None,
) -> Array:
    """Differentiable fused softmax aggregation with source-compact
    features and per-edge logits.  feat_c (UCs, H, D); raw_e (EP, H) ->
    (N, H, D)."""
    UC, H, D = feat_c.shape
    op = _make_src_compact_fused_op(act, float(slope), clip)
    out = op(feat_c.reshape(UC, H * D), raw_e, g)
    return out.reshape(g.num_nodes, H, D)


@jax.custom_vjp
def _compact_weighted_agg_op(feat_c2d, w_e, g):
    return _cwa_fwd(feat_c2d, w_e, g)[0]


def _cwa_fwd(feat_c2d, w_e, g):
    infoS = g.compact_src
    C = feat_c2d.shape[1]
    feat_e = take_rows(feat_c2d, infoS.edge_map).astype(jnp.float32)
    vals = feat_e * w_e.astype(jnp.float32)[:, None]
    agg = _packed_reduce_dst(g, [vals], C, _pack_dt(feat_c2d))
    return agg[:, :C].astype(feat_c2d.dtype), (feat_c2d, w_e, g)


def _cwa_bwd(res, ct):
    feat_c2d, w_e, g = res
    infoS = g.compact_src
    EP = g.num_padded_edges
    E = g.num_edges
    C = feat_c2d.shape[1]
    ct = ct.astype(jnp.float32)
    ct_e = gather_dst(g, ct)  # (EP, C) monotone; zero at sentinel dst
    feat_e = take_rows(feat_c2d, infoS.edge_map).astype(jnp.float32)
    d_w = jnp.sum(feat_e * ct_e, axis=-1).astype(w_e.dtype)
    # d_feat_c: canonical-order payload + one flat permute (module
    # docstring design rule)
    payload = ct_e * w_e.astype(jnp.float32)[:, None]
    red = _sorted_compact_reduce(
        infoS, [payload], C, _pack_dt(feat_c2d), EP, E,
        out_dt=_pack_dt(feat_c2d),
    )
    d_feat_c = red[:, :C].astype(feat_c2d.dtype)
    return d_feat_c, d_w, None


_compact_weighted_agg_op.defvjp(_cwa_fwd, _cwa_bwd)


def compact_weighted_agg(g: HeteroGraph, feat_c: Array, w_e: Array) -> Array:
    """Single-sided compact weighted aggregation:

        out[v] = sum_{e: dst(e)=v} w_e * feat_c[compact_src_row(e)]

    feat_c (UCs, C) source-compact rows, w_e (EP,) per-edge scalar weight
    (e.g. the RGCN norm) -> (N, C).  Per-edge features exist only as the
    fused gather feeding the folded one-hot reduce kernel; the backward
    recomputes cotangent payloads in ``edge_sort_perm`` order — the TPU
    realization of the reference's ``rgcn_node_mean_aggregation_compact_
    as_of_node_separate_coo_single_sided``
    (hrt/python/backend/rgcn_layers_and_funcs.py:782)."""
    return _compact_weighted_agg_op(feat_c, w_e, g)


def fused_softmax_agg_compact(
    g: HeteroGraph,
    feat_c: Array,
    el_c: Array,
    er_c: Array,
    *,
    act: str = "leaky_relu",
    slope: float = 0.2,
    clip: Optional[float] = None,
) -> Array:
    """Differentiable single-sided compact fused softmax aggregation.

    feat_c (UCs, H, D) / el_c (UCs, H) live on source-compact rows;
    er_c (UCd, H) on destination-compact rows.  Returns (N, H, D)."""
    UC, H, D = feat_c.shape
    op = _make_compact_fused_op(act, float(slope), clip)
    out = op(feat_c.reshape(UC, H * D), el_c, er_c, g)
    return out.reshape(g.num_nodes, H, D)


# --------------------------- plain-path (non-compact) fused HGT attention


@functools.lru_cache(maxsize=None)
def _make_hgt_plain_attention_op(clip: Optional[float]):
    """Fused PLAIN-path HGT attention: per-edge score SDDMM
    (q[dst]·W_att[rel]·k[src]) + typed softmax + weighted aggregation in
    ONE custom-VJP op — the default-flag counterpart of
    ``hgt_fused_compact_attention``.

    The TPU re-design of the reference's edge-parallel fused score op
    ``hgt_full_graph_hetero_attention_ops_coo``
    (hrt/include/DGLHackKernel/OpExport/HGTOpsEdgeParallel.inc.h:384,
    kernels in HGT/HGTForwardKernels.cu.h), which computes the k·W·q
    matvec per edge in registers.  Here the per-relation matmul runs over
    the relation-sorted row space (the static-mix segment matmul) and the
    inner product + softmax + packed reduce fuse around it — ``att_q_e``
    never crosses an op boundary in EITHER direction:

    * forward: att_q exists only inside the fusion region between the
      segment matmul and the reduce's producer pass;
    * backward: d_att_q is consumed in ROW space directly by the matmul
      pullback (jax.vjp of segment_matmul), and both node-side cotangents
      ride single fused permute+reduce passes (d_q over canonical dst
      runs with perm=seg.inv; d_k over the src CSR with the composed
      rows->src permutation) — no canonical-order (EP, H*dk) payload is
      ever materialized.

    Only ``score`` (EP, H — narrow) is saved; att_q is recomputed in the
    backward (one gather + one MXU pass, cheaper than an (EP, H*dk)
    HBM round-trip at every measured scale).
    """

    def _score_from_rows(attq_rows, k_rows, seg, H, dk):
        prod = attq_rows.reshape(-1, H * dk).astype(jnp.float32) * k_rows
        score_rows = _head_sums(prod, H, dk)  # (n_rows, H) f32
        return seg.scatter_back(score_rows[:, :, None])[..., 0]  # (EP, H)

    def _fwd(msg2d, q2d, k2d, w_att, mu, g):
        from ..linear import _edge_row_idx, segment_matmul

        seg = g.edge_rel_seg
        H = mu.shape[1]
        Hdk = q2d.shape[1]
        dk = Hdk // H
        pack_dt = _pack_dt(msg2d)
        q_rows = gather_nodes(q2d, _edge_row_idx(g, "dst"))
        attq_rows = segment_matmul(
            q_rows.reshape(-1, H, dk), w_att, seg
        )  # (n_rows, H, dk)
        k_rows = gather_nodes(k2d, _edge_row_idx(g, "src")).astype(
            jnp.float32
        )
        score = _score_from_rows(attq_rows, k_rows, seg, H, dk)
        mu_e = take_rows(mu, g.rel).astype(jnp.float32)
        raw = score * mu_e
        z = jnp.exp(_act_apply(raw, "identity", 0.0, clip))
        zf = _repeat_heads_mm(z, dk) * msg2d.astype(jnp.float32)
        agg = _packed_reduce_dst(g, [z, zf], H + Hdk, pack_dt)
        s, num = agg[:, :H], agg[:, H : H + Hdk]
        out = safe_div(num.reshape(-1, H, dk), s[..., None])
        return out.astype(msg2d.dtype), (score, s, out)

    @jax.custom_vjp
    def op(msg2d, q2d, k2d, w_att, mu, g):
        return _fwd(msg2d, q2d, k2d, w_att, mu, g)[0]

    def fwd_rule(msg2d, q2d, k2d, w_att, mu, g):
        out_cast, (score, s, out) = _fwd(msg2d, q2d, k2d, w_att, mu, g)
        # narrow residuals only: score (EP, H); att_q is recomputed
        return out_cast, (msg2d, q2d, k2d, w_att, mu, score, s, out, g)

    def _bwd(res, ct):
        from ..linear import _edge_row_idx, segment_matmul
        from .seg_reduce import seg_sum_sorted_packed

        msg2d, q2d, k2d, w_att, mu, score, s, out, g = res
        seg = g.edge_rel_seg
        EP, E = g.num_padded_edges, g.num_edges
        H = mu.shape[1]
        Hdk = q2d.shape[1]
        dk = Hdk // H
        R = mu.shape[0]
        pack_dt = _pack_dt(msg2d)
        mu_e = take_rows(mu, g.rel).astype(jnp.float32)
        raw = score * mu_e
        z = jnp.exp(_act_apply(raw, "identity", 0.0, clip))
        ct = ct.astype(jnp.float32)
        ct2 = ct.reshape(-1, Hdk)
        t2 = jnp.sum(out * ct, axis=-1)  # (N, H)
        cpe = gather_dst(g, jnp.concatenate([ct2, s, t2], axis=1))
        ctd = cpe[:, :Hdk]
        s_d = cpe[:, Hdk : Hdk + H]
        t2d = cpe[:, Hdk + H :]
        alpha = safe_div(z, s_d)  # 0 on padding edges
        d_msg = (_repeat_heads(alpha, dk) * ctd).astype(msg2d.dtype)
        t1 = _head_sums(msg2d.astype(jnp.float32) * ctd, H, dk)
        draw = alpha * (t1 - t2d) * _act_deriv(raw, "identity", 0.0, clip)
        dscore = draw * mu_e  # (EP, H)
        rel_onehot = (
            g.rel[:, None] == jnp.arange(R, dtype=g.rel.dtype)[None, :]
        ).astype(jnp.float32)
        d_mu = jax.lax.dot_general(
            rel_onehot, draw * score,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(mu.dtype)
        # ROW space: recompute att_q (gather + one MXU pass) and build the
        # matmul pullback with the existing dispatched custom paths
        q_rows = gather_nodes(q2d, _edge_row_idx(g, "dst"))
        attq_rows, mm_vjp = jax.vjp(
            lambda qr, w: segment_matmul(qr, w, seg),
            q_rows.reshape(-1, H, dk), w_att,
        )
        k_rows = gather_nodes(k2d, _edge_row_idx(g, "src")).astype(
            jnp.float32
        )
        dscore_rows = take_rows(dscore, seg.perm)
        dscore_rows = jnp.where(
            seg.row_valid[:, None], dscore_rows, 0.0
        )
        d_attq_rows = _repeat_heads(dscore_rows, dk) * k_rows
        d_q_rows, d_watt = mm_vjp(
            d_attq_rows.reshape(-1, H, dk).astype(attq_rows.dtype)
        )
        # d_q: rows -> canonical dst runs; the rows->edges permute
        # (seg.inv) fuses into the reduce's payload-pack pass
        d_q = seg_sum_sorted_packed(
            [d_q_rows.reshape(-1, Hdk)], Hdk, pack_dt,
            g.in_row_ptr, g.num_nodes, EP, E, g.in_tables, perm=seg.inv,
        )[:, :Hdk].astype(q2d.dtype)
        # d_k: rows -> src CSR via the composed rows->src permutation
        # (payload moves once, inside the pack pass)
        dk_payload = _repeat_heads(dscore_rows, dk) * attq_rows.reshape(
            -1, Hdk
        ).astype(jnp.float32)
        perm_src = take_rows(seg.inv, g.out_perm)
        d_k = seg_sum_sorted_packed(
            [dk_payload], Hdk, pack_dt, g.out_row_ptr, g.src_space,
            EP, E, g.out_tables, perm=perm_src,
        )[:, :Hdk].astype(k2d.dtype)
        return d_msg, d_q, d_k, d_watt.astype(w_att.dtype), d_mu, None

    op.defvjp(fwd_rule, _bwd)
    return op


def hgt_fused_plain_attention(
    g: HeteroGraph,
    msg_e: Array,
    q_nodes: Array,
    k_nodes: Array,
    w_att: Array,
    mu: Array,
    *,
    clip: Optional[float] = None,
) -> Array:
    """Differentiable fused plain-path HGT attention chain.

    msg_e (EP, H, dk) per-edge messages (canonical order); q_nodes
    (N, H, dk); k_nodes (src_space, H, dk); w_att (R, H, dk, dk);
    mu (R, H) = relation_pri / sqrt(dk).  Returns (N, H, dk)."""
    from ..common import match_vma

    EP, H, dk = msg_e.shape
    op = _make_hgt_plain_attention_op(clip)
    out = op(
        msg_e.reshape(EP, H * dk),
        q_nodes.reshape(q_nodes.shape[0], H * dk),
        k_nodes.reshape(k_nodes.shape[0], H * dk),
        match_vma(msg_e, w_att),  # replicated params under shard_map
        match_vma(msg_e, mu),
        g,
    )
    return out


@functools.lru_cache(maxsize=None)
def _make_hgt_plain_full_op(clip: Optional[float]):
    """Fully-fused plain-path HGT layer core: BOTH per-edge relational
    matmuls (v·W_msg and q·W_att), the score SDDMM, the typed softmax and
    the weighted aggregation in ONE custom-VJP op.

    Beyond :func:`_make_hgt_plain_attention_op` this also pulls the
    message transform inside the boundary: ``message_e`` exists only as a
    rows-space matmul output whose rows->canonical permute fuses into the
    reduce's payload-pack pass, and its cotangent feeds the matmul
    pullback in row space directly.  The two src-side node cotangents
    (d_k and d_v) share ONE packed permute+reduce over the src CSR.

    Reference pair: ``hgt_full_graph_hetero_attention_ops_coo`` +
    ``hgt_full_graph_fused_message_calc_and_mean_aggregation_separate_coo``
    (HGTOpsEdgeParallel.inc.h:384,391) — the same fusion boundary."""

    def _rows_mm(x2d, w, side, g, H, dk):
        from ..linear import _edge_row_idx, segment_matmul

        seg = g.edge_rel_seg
        rows = gather_nodes(x2d, _edge_row_idx(g, side))
        return rows, segment_matmul(rows.reshape(-1, H, dk), w, seg)

    def _fwd(v2d, q2d, k2d, w_msg, w_att, mu, g):
        from ..linear import _edge_row_idx

        seg = g.edge_rel_seg
        H = mu.shape[1]
        Hdk = q2d.shape[1]
        dk = Hdk // H
        pack_dt = _pack_dt(v2d)
        _, attq_rows = _rows_mm(q2d, w_att, "dst", g, H, dk)
        k_rows = gather_nodes(k2d, _edge_row_idx(g, "src")).astype(
            jnp.float32
        )
        prod = attq_rows.reshape(-1, Hdk).astype(jnp.float32) * k_rows
        score_rows = _head_sums(prod, H, dk)  # (n_rows, H)
        _, msg_rows = _rows_mm(v2d, w_msg, "src", g, H, dk)
        # ONE rows->canonical take serves score AND msg: narrow (EP, H)
        # takes through seg.inv run col-major at 7-17 GB/s (~1.8 ms each
        # in the round-4 HGT device trace); merging into the wide take
        # removes the standalone narrow pass entirely
        se = take_rows(
            jnp.concatenate(
                [score_rows, msg_rows.reshape(-1, Hdk)], axis=1
            ),
            seg.inv,
        ).astype(jnp.float32)
        score = se[:, :H]  # (EP, H)
        msg_e = se[:, H:]
        mu_e = take_rows(mu, g.rel).astype(jnp.float32)
        raw = score * mu_e
        z = jnp.exp(_act_apply(raw, "identity", 0.0, clip))
        zf = _repeat_heads_mm(z, dk) * msg_e
        agg = _packed_reduce_dst(g, [z, zf], H + Hdk, pack_dt)
        s, num = agg[:, :H], agg[:, H : H + Hdk]
        out = safe_div(num.reshape(-1, H, dk), s[..., None])
        return out.astype(v2d.dtype), (score, s, out)

    @jax.custom_vjp
    def op(v2d, q2d, k2d, w_msg, w_att, mu, g):
        return _fwd(v2d, q2d, k2d, w_msg, w_att, mu, g)[0]

    def fwd_rule(v2d, q2d, k2d, w_msg, w_att, mu, g):
        out_cast, (score, s, out) = _fwd(v2d, q2d, k2d, w_msg, w_att, mu, g)
        return out_cast, (v2d, q2d, k2d, w_msg, w_att, mu, score, s, out, g)

    def _bwd(res, ct):
        from ..linear import _edge_row_idx, segment_matmul
        from .seg_reduce import seg_sum_sorted_packed

        v2d, q2d, k2d, w_msg, w_att, mu, score, s, out, g = res
        seg = g.edge_rel_seg
        EP, E = g.num_padded_edges, g.num_edges
        H = mu.shape[1]
        Hdk = q2d.shape[1]
        dk = Hdk // H
        R = mu.shape[0]
        pack_dt = _pack_dt(v2d)
        mu_e = take_rows(mu, g.rel).astype(jnp.float32)
        raw = score * mu_e
        z = jnp.exp(_act_apply(raw, "identity", 0.0, clip))
        ct = ct.astype(jnp.float32)
        ct2 = ct.reshape(-1, Hdk)
        t2 = jnp.sum(out * ct, axis=-1)
        cpe = gather_dst(g, jnp.concatenate([ct2, s, t2], axis=1))
        ctd = cpe[:, :Hdk]
        s_d = cpe[:, Hdk : Hdk + H]
        t2d = cpe[:, Hdk + H :]
        alpha = safe_div(z, s_d)
        # recompute both rows-space matmuls with their pullbacks
        q_rows = gather_nodes(q2d, _edge_row_idx(g, "dst"))
        attq_rows, att_vjp = jax.vjp(
            lambda xr, w: segment_matmul(xr, w, seg),
            q_rows.reshape(-1, H, dk), w_att,
        )
        v_rows = gather_nodes(v2d, _edge_row_idx(g, "src"))
        msg_rows, msg_vjp = jax.vjp(
            lambda xr, w: segment_matmul(xr, w, seg),
            v_rows.reshape(-1, H, dk), w_msg,
        )
        msg_e = take_rows(
            msg_rows.reshape(-1, Hdk), seg.inv
        ).astype(jnp.float32)
        t1 = _head_sums_mm(msg_e * ctd, H, dk)
        draw = alpha * (t1 - t2d) * _act_deriv(raw, "identity", 0.0, clip)
        dscore = draw * mu_e
        rel_onehot = (
            g.rel[:, None] == jnp.arange(R, dtype=g.rel.dtype)[None, :]
        ).astype(jnp.float32)
        d_mu = jax.lax.dot_general(
            rel_onehot, draw * score,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(mu.dtype)
        # row-space cotangents
        k_rows = gather_nodes(k2d, _edge_row_idx(g, "src")).astype(
            jnp.float32
        )
        # ONE canonical->rows take serves dscore AND dmsg (narrow (EP, H)
        # takes through seg.perm are the 7-17 GB/s pathology — see _fwd)
        both = take_rows(
            jnp.concatenate(
                [dscore, _repeat_heads_mm(alpha, dk) * ctd], axis=1
            ),
            seg.perm,
        )
        both = jnp.where(seg.row_valid[:, None], both, 0.0)
        dscore_rows = both[:, :H]
        dmsg_rows = both[:, H:]
        d_attq_rows = _repeat_heads(dscore_rows, dk) * k_rows
        d_q_rows, d_watt = att_vjp(
            d_attq_rows.reshape(-1, H, dk).astype(attq_rows.dtype)
        )
        d_v_rows, d_wmsg = msg_vjp(
            dmsg_rows.reshape(-1, H, dk).astype(msg_rows.dtype)
        )
        # d_q: rows -> canonical dst runs (permute fused into the pack)
        d_q = seg_sum_sorted_packed(
            [d_q_rows.reshape(-1, Hdk)], Hdk, pack_dt,
            g.in_row_ptr, g.num_nodes, EP, E, g.in_tables, perm=seg.inv,
        )[:, :Hdk].astype(q2d.dtype)
        # d_k AND d_v share one composed rows->src permute + reduce
        dk_payload = _repeat_heads(dscore_rows, dk) * attq_rows.reshape(
            -1, Hdk
        ).astype(jnp.float32)
        perm_src = take_rows(seg.inv, g.out_perm)
        redS = seg_sum_sorted_packed(
            [dk_payload, d_v_rows.reshape(-1, Hdk)], 2 * Hdk, pack_dt,
            g.out_row_ptr, g.src_space, EP, E, g.out_tables,
            perm=perm_src,
        )
        d_k = redS[:, :Hdk].astype(k2d.dtype)
        d_v = redS[:, Hdk : 2 * Hdk].astype(v2d.dtype)
        return (d_v, d_q, d_k, d_wmsg.astype(w_msg.dtype),
                d_watt.astype(w_att.dtype), d_mu, None)

    op.defvjp(fwd_rule, _bwd)
    return op


def hgt_fused_plain_full(
    g: HeteroGraph,
    v_nodes: Array,
    q_nodes: Array,
    k_nodes: Array,
    w_msg: Array,
    w_att: Array,
    mu: Array,
    *,
    clip: Optional[float] = None,
) -> Array:
    """Differentiable fully-fused plain-path HGT core (message transform +
    attention score + typed softmax + aggregation).

    v_nodes/k_nodes (src_space, H, dk); q_nodes (N, H, dk);
    w_msg/w_att (R, H, dk, dk); mu (R, H).  Returns (N, H, dk)."""
    from ..common import match_vma

    H, dk = q_nodes.shape[1], q_nodes.shape[2]
    op = _make_hgt_plain_full_op(clip)
    return op(
        v_nodes.reshape(v_nodes.shape[0], H * dk),
        q_nodes.reshape(q_nodes.shape[0], H * dk),
        k_nodes.reshape(k_nodes.shape[0], H * dk),
        match_vma(q_nodes, w_msg),
        match_vma(q_nodes, w_att),
        match_vma(q_nodes, mu),
        g,
    )


# --------------------------- fully-fused homogeneous GAT layer core

# save the forward's per-edge feature gather as a residual below this
# byte size (re-gathering (EP, H*D) measures 2.6 ms at mag scale vs ~0.5
# to re-read the saved buffer; above the cap — full-mag wide layers — the
# memory-lean recompute keeps the step on one chip)
GAT_SAVE_FEAT_BYTES = 512 << 20


@functools.lru_cache(maxsize=None)
def _make_gat_layer_op(slope: float, clip: Optional[float]):
    """Fully-fused homogeneous GAT layer core: projection x·W, attention
    logits el/er, raw-exp edge softmax and weighted aggregation in ONE
    custom-VJP op (reference ``fused_gat_csr``, GAT/FusedGAT.cu.h:8-21 —
    plus the projection, which the reference leaves to torch).

    Pulling the projection inside the boundary is what unlocks the
    backward reassociations that remove every WIDE source-side pass
    (round-3's GAT was the slowest family, 32.2 ms at the bench config,
    precisely because of them):

    * ``dW``(aggregation) = x_eᵀ @ (alpha ⊙ ct_dst) — ONE MXU contraction
      over edges instead of a (src_space, H*D) segment-reduced
      d_feat followed by the matmul pullback;
    * ``dx``(aggregation) = src-CSR reduce of the HEAD-MIXED payload
      sum_h alpha_h * (ct W_hᵀ)[dst] — F lanes instead of H*D, with
      (ct W_hᵀ) computed once at node scale (requires F <= H*D; the
      caller falls back to the unfused path otherwise);
    * d_el / d_er and the mixed dx payload share one packed src-CSR
      permute+reduce; d_er reduces over the canonical dst CSR directly.

    Strictly-2D layout discipline throughout (see _make_node_fused_op).
    """

    def _block_alr(al, ar, H, D):
        eye = jnp.eye(H, dtype=jnp.float32)
        return jnp.concatenate(
            [
                (al.astype(jnp.float32)[:, :, None] * eye[:, None, :])
                .reshape(H * D, H),
                (ar.astype(jnp.float32)[:, :, None] * eye[:, None, :])
                .reshape(H * D, H),
            ],
            axis=1,
        )  # (H*D, 2H)

    def _block_wT(w, H, D, F):
        """(H*D, H*F) block-diagonal transpose: u = ct @ blk gives
        u[:, hF:(h+1)F] = ct_h @ W_hᵀ."""
        w3 = w.astype(jnp.float32).reshape(F, H, D)
        blocks = []
        for h in range(H):
            row = [jnp.zeros((D, F), jnp.float32)] * H
            row[h] = w3[:, h, :].T
            blocks.append(jnp.concatenate(row, axis=1))
        return jnp.concatenate(blocks, axis=0)  # (H*D, H*F)

    def _node_terms(x2d, w, al, ar, H, D):
        feat2d = jax.lax.dot(
            x2d.astype(jnp.float32), w.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )  # (S, HD)
        eler = jax.lax.dot(
            feat2d, _block_alr(al, ar, H, D),
            preferred_element_type=jnp.float32,
        )
        return feat2d, eler[:, :H], eler[:, H:]

    def _edge_z(el, er, g):
        el_e = gather_nodes(el, g.src)
        er_e = gather_dst(g, er)
        raw = el_e + er_e
        z = jnp.exp(_act_apply(raw, "leaky_relu", slope, clip))
        actd = _act_deriv(raw, "leaky_relu", slope, clip)
        return z, actd

    def _fwd(x2d, w, al, ar, g):
        H, D = al.shape
        HD = H * D
        pack_dt = _pack_dt(x2d)
        feat2d, el, er = _node_terms(x2d, w, al, ar, H, D)
        z, _ = _edge_z(el, er, g)
        feat_e = gather_nodes(feat2d, g.src)  # (EP, HD) random
        zf = _repeat_heads_mm(z, D) * feat_e
        if _fold_width(H + HD) == _fold_width(HD):
            agg = _packed_reduce_dst(g, [z, zf], H + HD, pack_dt)
            s, num = agg[:, :H], agg[:, H : H + HD]
        else:
            s = _packed_reduce_dst(g, [z], H, pack_dt)[:, :H]
            num = _packed_reduce_dst(g, [zf], HD, pack_dt)[:, :HD]
        out = safe_div(num, _repeat_heads_mm(s, D))
        save = feat_e if feat_e.size * 4 <= GAT_SAVE_FEAT_BYTES else None
        return out.astype(x2d.dtype), (s, out, save)

    @jax.custom_vjp
    def op(x2d, w, al, ar, g):
        return _fwd(x2d, w, al, ar, g)[0]

    def fwd_rule(x2d, w, al, ar, g):
        out_cast, (s, out, save) = _fwd(x2d, w, al, ar, g)
        return out_cast, (x2d, w, al, ar, s, out, save, g)

    def _bwd(res, ct):
        x2d, w, al, ar, s, out, save, g = res
        H, D = al.shape
        HD = H * D
        F = x2d.shape[1]
        S = x2d.shape[0]
        N = g.num_nodes
        EP, E = g.num_padded_edges, g.num_edges
        pack_dt = _pack_dt(x2d)
        feat2d, el, er = _node_terms(x2d, w, al, ar, H, D)
        z, actd = _edge_z(el, er, g)
        ct2 = ct.astype(jnp.float32)
        t2 = _head_sums_mm(out * ct2, H, D)  # (N, H)
        ctd = gather_dst(g, ct2)  # (EP, HD) monotone
        cpe = gather_dst(g, jnp.concatenate([s, t2], axis=1))
        s_d, t2d = cpe[:, :H], cpe[:, H:]
        feat_e = save if save is not None else gather_nodes(feat2d, g.src)
        alpha = safe_div(z, s_d)
        t1 = _head_sums_mm(feat_e * ctd, H, D)
        draw = alpha * (t1 - t2d) * actd  # (EP, H)
        dfeat_e = _repeat_heads_mm(alpha, D) * ctd  # (EP, HD)

        # dW(agg): one MXU contraction over edges (padding edges carry
        # alpha = 0 via s_d = 0)
        x_e = gather_nodes(x2d, g.src).astype(jnp.float32)  # (EP, F)
        dW_agg = jax.lax.dot_general(
            x_e, dfeat_e,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (F, HD)

        # dx(agg): head-mixed payload, F lanes (guaranteed F <= HD by the
        # caller's gate), sharing the src-CSR pass with d_el
        u = jax.lax.dot(
            ct2, _block_wT(w, H, D, F),
            preferred_element_type=jnp.float32,
        )  # (N, H*F)
        u_e = gather_dst(g, u)  # monotone
        mix = jnp.zeros((EP, F), jnp.float32)
        for h in range(H):
            mix = mix + alpha[:, h : h + 1] * u_e[:, h * F : (h + 1) * F]
        redS = _packed_reduce(
            [draw, mix], H + F, pack_dt, g.out_row_ptr, g.src_space,
            EP, E, g.out_tables, perm=g.out_perm, out_dt=pack_dt,
        )
        d_el = redS[:, :H].astype(jnp.float32)  # (S, H)
        dx_agg = redS[:, H : H + F].astype(jnp.float32)
        # d_er: canonical dst CSR, no reorder
        d_er = _packed_reduce_dst(g, [draw], H, pack_dt)[:, :H].astype(
            jnp.float32
        )  # (N, H)

        # logit path at node scale: el/er pull back through feat2d = x W
        d_feat_node = jax.lax.dot(
            jnp.concatenate(
                [d_el, jnp.pad(d_er, ((0, S - N), (0, 0)))], axis=1
            ),
            _block_alr(al, ar, H, D).T,
            preferred_element_type=jnp.float32,
        )  # (S, HD)
        d_al = jnp.einsum(
            "sh,shd->hd", d_el, feat2d.reshape(S, H, D),
            preferred_element_type=jnp.float32,
        )
        d_ar = jnp.einsum(
            "sh,shd->hd",
            jnp.pad(d_er, ((0, S - N), (0, 0))),
            feat2d.reshape(S, H, D),
            preferred_element_type=jnp.float32,
        )
        dx = dx_agg + jax.lax.dot(
            d_feat_node, w.astype(jnp.float32).T,
            preferred_element_type=jnp.float32,
        )
        dW = dW_agg + jax.lax.dot_general(
            x2d.astype(jnp.float32), d_feat_node,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (
            dx.astype(x2d.dtype),
            dW.astype(w.dtype),
            d_al.astype(al.dtype),
            d_ar.astype(ar.dtype),
            None,
        )

    op.defvjp(fwd_rule, _bwd)
    return op


def gat_layer_fused(
    g: HeteroGraph,
    x2d: Array,
    w: Array,
    attn_l: Array,
    attn_r: Array,
    *,
    slope: float = 0.2,
    clip: Optional[float] = None,
) -> Array:
    """Differentiable fully-fused GAT layer core (projection + logits +
    softmax + aggregation).  x2d (src_space, F); w (F, H*D); attn_l/r
    (H, D).  Returns (N, H*D).  Requires F <= H*D (the dx reassociation's
    head-mixed payload is F lanes) and single-chip node spaces; callers
    gate and fall back to the composed path otherwise."""
    op = _make_gat_layer_op(float(slope), clip)
    return op(x2d, w, attn_l, attn_r, g)
