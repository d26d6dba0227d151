"""Fused edge softmax + weighted aggregation with an analytic, gather-only
backward — the TPU counterpart of the reference's fused GAT kernel pair
(``HET_gatExpLeakyReluSumKernel`` + ``HET_gatSumProdZipDivKernel``,
hrt/include/DGLHackKernel/RGAT/RGATKernelsSeparateCOO.cu.h:17-215) and the
HGT fused softmax/mean-aggregation ops (HGTForwardKernels.cu.h:51,247,428):

    out[v] = sum_e softmax_dst(act(raw_e))_e * feat_e      (e: dst(e) = v)

Forward: XLA computes ``z = exp(clip(act(raw)))`` and the z-scaled messages
and emits them as one packed ``[z | z*feat]`` buffer (a single fused pass —
measured 0.47 ms at mag scale), which the one-hot-MXU segment-sum kernel
(seg_reduce.py) reduces per destination; numerator and denominator ride the
same kernel call.  Padding edges need no masking: the kernel's one-hot
range-compare drops any edge outside every node's [lower, upper) range.

Design note (measured, not assumed): an in-kernel variant that performed
the exp + per-head broadcast scaling inside the Pallas kernel was built and
measured *slower* (2.4-2.9 ms vs 2.0 ms total) — Mosaic lane-broadcast
multiplies of a (chunk, 1) column are expensive on the VPU, while XLA fuses
the same math into its packing pass at near-roofline.  The kernel therefore
stays a pure reduction; fusion lives in (a) packing numerator+denominator
into one reduction and (b) the custom VJP below.

Backward (the big win — it contains **no segment reductions at all**; with
``s`` = softmax denominators and ``out`` saved from the forward):

    alpha_e   = z_e / s[dst(e)]
    dfeat_e   = alpha_e * ct[dst(e)]
    draw_e    = alpha_e * (<feat_e, ct[dst(e)]> - <out[dst(e)], ct[dst(e)]>)
                * act'(raw_e)

— every term is a dst-sorted gather or elementwise op, left to XLA's fusion
engine (measured 0.85 ms vs 5.8 ms for the round-1 autodiff backward).
This mirrors the reference backward's reuse of saved exp/sum/ret
(RGATBackwardKernelsSeparateCOO.cu.h) with gathers instead of atomics.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ...graph.structures import HeteroGraph
from ..common import gather_dst, safe_div, take_rows

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


@functools.lru_cache(maxsize=None)
def _make_fused_op(act: str, slope: float, clip: Optional[float]):
    """Build the custom-VJP fused op for one static (act, slope, clip)
    config.  Traced operands (the graph included) flow through arguments —
    None cotangents — never closures (closures break under shard_map)."""

    def _fwd(feat2d, raw, g):
        from .seg_reduce import seg_sum_dst_pallas_raw

        EP, HD = feat2d.shape
        H = raw.shape[1]
        D = HD // H
        # bf16 inputs ride the kernel's exact single-pass bf16 MXU path
        # (half the DMA bytes, 1/3 the MXU work); f32 keeps bf16x3
        pack_dt = (
            jnp.bfloat16 if feat2d.dtype == jnp.bfloat16 else jnp.float32
        )
        z = jnp.exp(
            _act_apply(raw.astype(jnp.float32), act, slope, clip)
        )  # (EP, H); finite (=1) on padding edges, dropped by the kernel
        zf = (
            feat2d.astype(jnp.float32).reshape(EP, H, D) * z[..., None]
        ).reshape(EP, HD)
        # pack to the kernel's 128-lane width here so the zero columns are
        # emitted by this same fused pass (an inner jnp.pad would cost one
        # extra full read+write of the packed buffer)
        pad = -(H + HD) % 128
        parts = [z.astype(pack_dt), zf.astype(pack_dt)]
        if pad:
            parts.append(jnp.zeros((EP, pad), pack_dt))
        packed = jnp.concatenate(parts, axis=1)
        agg = seg_sum_dst_pallas_raw(g, packed)  # (N, H + HD [+ pad]) f32
        agg = agg.astype(jnp.float32)
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
        ctd = gather_dst(g, ct.reshape(-1, HD)).reshape(EP, H, D)
        s_d = gather_dst(g, s)  # (EP, H); zero at sentinel -> alpha 0
        alpha = safe_div(z, s_d)
        feat3 = feat2d.astype(jnp.float32).reshape(EP, H, D)
        dfeat = (alpha[..., None] * ctd).reshape(EP, HD)
        t1 = jnp.sum(feat3 * ctd, axis=-1)  # (EP, H)
        t2 = jnp.sum(out * ct, axis=-1)  # (N, H)
        draw = alpha * (t1 - gather_dst(g, t2)) * _act_deriv(
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


def _sorted_compact_reduce(info, payload2d, n_guard):
    """Reduce per-edge rows into compact rows: permute into compact-row
    order (CompactInfo.edge_sort_perm) + the sorted one-hot kernel."""
    from .seg_reduce import seg_sum_sorted_pallas_raw

    vals_p = take_rows(payload2d, info.edge_sort_perm)
    return seg_sum_sorted_pallas_raw(
        vals_p,
        info.edge_row_ptr,
        info.seg.n_rows,
        n_guard,
        tables=info.edge_tables,
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
    the one-hot reduce kernel.

    Measured design rules baked in (mag scale, v5e):

    * every gather reads from a *small* (node/compact-row) source —
      edge-space permutes cost ~2.25 ms flat regardless of width, small-
      source row gathers ~0.9 ms;
    * ``el_c`` rides the same gather as ``feat_c`` (host concat, one
      mapS gather) and the backward's three destination-indexed operands
      (ct, s, t2) ride one packed dst gather;
    * the destination-side cotangent reduction runs over canonical
      (dst, rel) runs — contiguous by construction — so it needs no edge
      permute at all (CompactInfo.canon_ptr);
    * the source side pays the one unavoidable edge permute
      (edge_sort_perm) with [d_el | d_feat] batched into a single kernel
      call.

    Round-1's expand-then-aggregate form paid three separate unsorted
    scatter backwards (~10 ms vs ~6 ms for this op's whole backward)."""

    def _fwd(feat_c2d, el_c, er_c, g):
        from .seg_reduce import seg_sum_dst_pallas_raw

        infoS = g.compact_src
        infoD = g.compact_dst
        EP = g.num_padded_edges
        H = el_c.shape[1]
        HD = feat_c2d.shape[1]
        D = HD // H
        raw = (
            take_rows(el_c, infoS.edge_map)
            + take_rows(er_c, infoD.edge_map)
        ).astype(jnp.float32)
        z = jnp.exp(_act_apply(raw, act, slope, clip))
        feat_e = take_rows(feat_c2d, infoS.edge_map).astype(jnp.float32)
        zf = (feat_e.reshape(EP, H, D) * z[..., None]).reshape(EP, HD)
        pack_dt = (
            jnp.bfloat16 if feat_c2d.dtype == jnp.bfloat16 else jnp.float32
        )
        pad = -(H + HD) % 128
        parts = [z.astype(pack_dt), zf.astype(pack_dt)]
        if pad:
            parts.append(jnp.zeros((EP, pad), pack_dt))
        packed = jnp.concatenate(parts, axis=1)
        agg = seg_sum_dst_pallas_raw(g, packed).astype(jnp.float32)
        s, num = agg[:, :H], agg[:, H : H + HD]
        out = safe_div(num.reshape(-1, H, D), s[..., None])
        return out.astype(feat_c2d.dtype), (s, out)

    @jax.custom_vjp
    def op(feat_c2d, el_c, er_c, g):
        return _fwd(feat_c2d, el_c, er_c, g)[0]

    def fwd_rule(feat_c2d, el_c, er_c, g):
        # residuals hold NO (EP, H)-shaped arrays: a narrow-minor per-edge
        # array is lane-padded 32x on TPU (H=4 -> 128), which at full-mag
        # scale (21M edges) is ~10 GB each.  z / act' are recomputed in
        # the backward from two compact-row gathers instead.
        out_cast, (s, out) = _fwd(feat_c2d, el_c, er_c, g)
        return out_cast, (feat_c2d, el_c, er_c, s, out, g)

    def _bwd(res, ct):
        from .seg_reduce import seg_sum_sorted_pallas_raw

        feat_c2d, el_c, er_c, s, out, g = res
        infoS = g.compact_src
        infoD = g.compact_dst
        EP = g.num_padded_edges
        HD = feat_c2d.shape[1]
        H = el_c.shape[1]
        D = HD // H
        n_guard = EP - g.num_edges
        pack_dt = (
            jnp.bfloat16 if feat_c2d.dtype == jnp.bfloat16 else jnp.float32
        )
        # z / act' recomputed from compact rows (see fwd_rule note)
        raw = (
            take_rows(el_c, infoS.edge_map)
            + take_rows(er_c, infoD.edge_map)
        ).astype(jnp.float32)
        z = jnp.exp(_act_apply(raw, act, slope, clip))
        actd = _act_deriv(raw, act, slope, clip)
        feat_e = take_rows(feat_c2d, infoS.edge_map).astype(jnp.float32)
        ct = ct.astype(jnp.float32)
        ct2 = ct.reshape(-1, HD)
        t2 = jnp.sum(out * ct, axis=-1)  # (N, H)
        # one packed dst gather serves ct, s and t2 (pack_dt keeps the
        # (EP, 128)-class buffer at half size under mixed precision)
        ctpack = jnp.concatenate([ct2, s, t2], axis=1).astype(pack_dt)
        cpe = gather_dst(g, ctpack)  # (EP, HD + 2H)
        ctd = cpe[:, :HD].astype(jnp.float32).reshape(EP, H, D)
        s_d = cpe[:, HD : HD + H].astype(jnp.float32)
        t2d = cpe[:, HD + H :].astype(jnp.float32)
        alpha = safe_div(z, s_d)
        dfeat_e = (alpha[..., None] * ctd).reshape(EP, HD)
        t1 = jnp.sum(feat_e.reshape(EP, H, D) * ctd, axis=-1)
        draw = alpha * (t1 - t2d) * actd
        # bf16 training: backward reduce payloads ride the single-pass
        # bf16 kernel path too (grads are bf16-precision in mixed mode)
        draw = draw.astype(pack_dt)
        dfeat_e = dfeat_e.astype(pack_dt)
        # destination side: canonical (dst, rel) runs — no permute
        padD = 128 - H
        valsD = jnp.concatenate(
            [draw, jnp.zeros((EP, padD), pack_dt)], axis=1
        )
        n_runs = int(infoD.canon_ptr.shape[0]) - 1
        redD = seg_sum_sorted_pallas_raw(
            valsD,
            infoD.canon_ptr,
            n_runs,
            n_guard,
            tables=infoD.canon_tables,
        )
        from ..common import gather_nodes

        d_er_c = gather_nodes(redD, infoD.canon_to_row)[:, :H]
        # source side: [d_el | d_feat] batched through one permuted kernel
        padS = -(H + HD) % 128
        partsS = [draw, dfeat_e]
        if padS:
            partsS.append(jnp.zeros((EP, padS), pack_dt))
        payload = jnp.concatenate(partsS, axis=1)
        vals_p = take_rows(payload, infoS.edge_sort_perm)
        redS = seg_sum_sorted_pallas_raw(
            vals_p,
            infoS.edge_row_ptr,
            infoS.seg.n_rows,
            n_guard,
            tables=infoS.edge_tables,
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

    Backward: d_feat_c reduces over ``edge_sort_perm`` into compact rows
    (one sorted kernel call); d_raw is pure per-edge elementwise (no
    reduction at all)."""

    def _fwd(feat_c2d, raw_e, g):
        from .seg_reduce import seg_sum_dst_pallas_raw

        infoS = g.compact_src
        EP = g.num_padded_edges
        H = raw_e.shape[1]
        HD = feat_c2d.shape[1]
        D = HD // H
        z = jnp.exp(_act_apply(raw_e.astype(jnp.float32), act, slope, clip))
        feat_e = take_rows(feat_c2d, infoS.edge_map).astype(jnp.float32)
        zf = (feat_e.reshape(EP, H, D) * z[..., None]).reshape(EP, HD)
        pack_dt = (
            jnp.bfloat16 if feat_c2d.dtype == jnp.bfloat16 else jnp.float32
        )
        pad = -(H + HD) % 128
        parts = [z.astype(pack_dt), zf.astype(pack_dt)]
        if pad:
            parts.append(jnp.zeros((EP, pad), pack_dt))
        packed = jnp.concatenate(parts, axis=1)
        agg = seg_sum_dst_pallas_raw(g, packed).astype(jnp.float32)
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
        HD = feat_c2d.shape[1]
        H = raw_e.shape[1]
        D = HD // H
        z = jnp.exp(_act_apply(raw_e.astype(jnp.float32), act, slope, clip))
        actd = _act_deriv(raw_e.astype(jnp.float32), act, slope, clip)
        ct = ct.astype(jnp.float32)
        ct2 = ct.reshape(-1, HD)
        t2 = jnp.sum(out * ct, axis=-1)  # (N, H)
        ctpack = jnp.concatenate([ct2, s, t2], axis=1)
        cpe = gather_dst(g, ctpack)
        ctd = cpe[:, :HD].reshape(EP, H, D)
        s_d = cpe[:, HD : HD + H]
        t2d = cpe[:, HD + H :]
        alpha = safe_div(z, s_d)
        feat_e = take_rows(feat_c2d, infoS.edge_map).astype(jnp.float32)
        t1 = jnp.sum(feat_e.reshape(EP, H, D) * ctd, axis=-1)
        draw = alpha * (t1 - t2d) * actd  # (EP, H): pure elementwise
        pack_dt = (
            jnp.bfloat16 if feat_c2d.dtype == jnp.bfloat16 else jnp.float32
        )
        dfeat_e = (alpha[..., None] * ctd).reshape(EP, HD).astype(pack_dt)
        pad = -HD % 128
        if pad:
            dfeat_e = jnp.concatenate(
                [dfeat_e, jnp.zeros((EP, pad), pack_dt)], axis=1
            )
        red = _sorted_compact_reduce(infoS, dfeat_e, EP - g.num_edges)
        d_feat_c = red[:, :HD].astype(feat_c2d.dtype)
        return d_feat_c, draw.astype(raw_e.dtype), None

    op.defvjp(fwd_rule, _bwd)
    return op


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
    from .seg_reduce import seg_sum_dst_pallas_raw

    infoS = g.compact_src
    EP = g.num_padded_edges
    C = feat_c2d.shape[1]
    feat_e = take_rows(feat_c2d, infoS.edge_map).astype(jnp.float32)
    vals = feat_e * w_e.astype(jnp.float32)[:, None]
    pad = -C % 128
    if pad:
        vals = jnp.concatenate(
            [vals, jnp.zeros((EP, pad), jnp.float32)], axis=1
        )
    agg = seg_sum_dst_pallas_raw(g, vals)  # padding edges dropped in-kernel
    return agg[:, :C].astype(feat_c2d.dtype), (feat_c2d, w_e, g)


def _cwa_bwd(res, ct):
    feat_c2d, w_e, g = res
    infoS = g.compact_src
    EP = g.num_padded_edges
    C = feat_c2d.shape[1]
    ct = ct.astype(jnp.float32)
    ct_e = gather_dst(g, ct)  # (EP, C); zero at sentinel dst
    payload = ct_e * w_e.astype(jnp.float32)[:, None]
    pad = -C % 128
    if pad:
        payload = jnp.concatenate(
            [payload, jnp.zeros((EP, pad), jnp.float32)], axis=1
        )
    red = _sorted_compact_reduce(infoS, payload, EP - g.num_edges)
    d_feat_c = red[:, :C].astype(feat_c2d.dtype)
    feat_e = take_rows(feat_c2d, infoS.edge_map).astype(jnp.float32)
    d_w = jnp.sum(feat_e * ct_e, axis=-1).astype(w_e.dtype)
    return d_feat_c, d_w, None


_compact_weighted_agg_op.defvjp(_cwa_fwd, _cwa_bwd)


def compact_weighted_agg(g: HeteroGraph, feat_c: Array, w_e: Array) -> Array:
    """Single-sided compact weighted aggregation:

        out[v] = sum_{e: dst(e)=v} w_e * feat_c[compact_src_row(e)]

    feat_c (UCs, C) source-compact rows, w_e (EP,) per-edge scalar weight
    (e.g. the RGCN norm) -> (N, C).  Per-edge features exist only as the
    fused gather feeding the one-hot reduce kernel; the backward reduces
    cotangents straight into compact rows over ``edge_sort_perm`` — the TPU
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
