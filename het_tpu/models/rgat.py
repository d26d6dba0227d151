"""Relational GAT (RGAT) — flagship model family.

Re-design of the reference ``HET_RGATLayer`` / ``HET_RGATModel``
(hrt/python/RGAT/models.py:16,125,388) with the same capabilities:

* per-relation multi-head attention: ``conv_weights`` (R, H, in, out/H),
  ``attn_l``/``attn_r`` (R, H, out/H) (models.py:86-94);
* **compact materialization** (``compact``): typed linears and attention
  logits computed once per unique (relation, node) instead of per edge
  (reference ``--compact_as_of_node_flag`` path, models.py:152-263);
* **linear-operator reordering** (``multiply_first``): reassociates
  (x·W)·a into x·(W·a) so the attention logits never materialize the
  per-edge projected features (reference
  ``--multiply_among_weights_first_flag``, models.py:300-362) — on the dst
  side this removes the per-edge dst projection entirely;
* fused relational edge softmax + aggregation.

The reference's ``gat_edge_parallel_flag`` selects between CSR/COO kernel
sets; here edge- vs node-parallelism is a Pallas scheduling concern, not a
model concern, so the flag does not exist at this level.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import ops
from ..graph.structures import HeteroGraph

Array = jax.Array

# compact-row count above which the multiply_first path switches to the
# packed-operand fused op (memory form): below it the split form is
# faster; above it separate narrow compact arrays dominate HBM (each is
# n_rows x 128 lanes regardless of width)
PACKED_COMPACT_ROWS = 1_000_000


class RGATLayer(nn.Module):
    in_feat: int
    out_feat: int
    num_rels: int
    num_heads: int
    bias: bool = True
    activation: Optional[Callable[[Array], Array]] = None
    self_loop: bool = False
    compact: bool = False
    multiply_first: bool = False
    dropout: float = 0.5
    leaky_relu_slope: float = 0.2
    stable_softmax: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        g: HeteroGraph,
        x: Array,
        *,
        x_dst: Array = None,
        deterministic: bool = True,
    ) -> Array:
        # x indexes the graph's source space; x_dst its (local) destination
        # space.  They coincide single-chip; they differ on a partitioned
        # shard where x is the halo-gathered global feature matrix.
        if x_dst is None:
            x_dst = x
        assert self.out_feat % self.num_heads == 0
        H = self.num_heads
        D = self.out_feat // H
        init = nn.initializers.xavier_uniform()
        conv_w = self.param(
            "conv_weights", init, (self.num_rels, H, self.in_feat, D),
            self.param_dtype,
        )
        attn_l = self.param(
            "attn_l", init, (self.num_rels, H, D), self.param_dtype
        )
        attn_r = self.param(
            "attn_r", init, (self.num_rels, H, D), self.param_dtype
        )

        if self.compact and g.compact_shared:
            # UNION-list compact (the reference's default ``Enabled`` kind,
            # kernel_enums.h:27-47): compact_src/compact_dst are two views
            # of ONE unique (rel, node in srcs-union-dsts) row space, so a
            # single projection serves both attention sides — one
            # relational matmul instead of two (el via the src view, er
            # via the dst view of the same rows).
            if self.multiply_first:
                wa_l = jnp.einsum("rhkd,rhd->rhk", conv_w, attn_l)
                wa_r = jnp.einsum("rhkd,rhd->rhk", conv_w, attn_r)
                w_cat = jnp.concatenate(
                    [wa_l[..., None], conv_w, wa_r[..., None]], axis=-1
                )  # (R, H, K, 1+D+1)
                fe = ops.compact_typed_linear(g, x, w_cat, side="src")
                h = ops.relational_fused_gat_compact(
                    g, fe[..., 1:-1], fe[..., 0], fe[..., -1],
                    self.leaky_relu_slope, stable=self.stable_softmax,
                )
            else:
                feat_c = ops.compact_typed_linear(g, x, conv_w, side="src")
                rel_of_row = g.compact_src.seg.row_seg
                el_c = jnp.einsum(
                    "uhd,uhd->uh", feat_c, jnp.take(attn_l, rel_of_row, 0)
                )
                er_c = jnp.einsum(
                    "uhd,uhd->uh", feat_c, jnp.take(attn_r, rel_of_row, 0)
                )
                h = ops.relational_fused_gat_compact(
                    g, feat_c, el_c, er_c, self.leaky_relu_slope,
                    stable=self.stable_softmax,
                )
        elif self.compact:
            # one projected row per unique (rel, node); logits also compact.
            # Everything stays in compact rows all the way into the fused
            # single-sided aggregation (no per-edge expansion op).
            if self.multiply_first:
                # el = x · (W·a): skip materializing per-(rel,node)
                # features for the logit, and ride the SAME segment matmul
                # as the feature projection (concatenated output columns —
                # one row gather + one MXU pass instead of two).  The
                # packed [el | feat] buffer flows INTO the fused op and
                # its gradient flows OUT of it without ever splitting
                # (ops.relational_fused_gat_compact_packed) — separate
                # narrow compact arrays cost a full 128-lane HBM row each.
                wa_l = jnp.einsum("rhkd,rhd->rhk", conv_w, attn_l)
                wa_r = jnp.einsum("rhkd,rhd->rhk", conv_w, attn_r)
                w_cat = jnp.concatenate(
                    [wa_l[..., None], conv_w], axis=-1
                )  # (R, H, K, 1+D)
                fe = ops.compact_typed_linear(g, x, w_cat, side="src")
                er_c = ops.compact_typed_linear(
                    g, x_dst, wa_r[..., None], side="dst"
                )[..., 0]
                if g.compact_src.seg.n_rows >= PACKED_COMPACT_ROWS:
                    # memory form: the packed buffer flows through the op
                    # and its gradient comes back packed — no separate
                    # narrow compact arrays (each costs a full 128-lane
                    # HBM row per compact row: 1.5-3 GB apiece at full-mag
                    # scale; this is what fits 21M edges on one chip).
                    # Measured ~4.7 ms slower at sample scale (the
                    # interleaved-lane forms fuse worse), hence the
                    # size-gated auto-select.
                    h = ops.relational_fused_gat_compact_packed(
                        g, fe, er_c, self.leaky_relu_slope,
                        stable=self.stable_softmax,
                    )
                else:
                    h = ops.relational_fused_gat_compact(
                        g, fe[..., 1:], fe[..., 0], er_c,
                        self.leaky_relu_slope, stable=self.stable_softmax,
                    )
            else:
                feat_c_src = ops.compact_typed_linear(
                    g, x, conv_w, side="src"
                )
                el_c = jnp.einsum(
                    "uhd,uhd->uh",
                    feat_c_src,
                    jnp.take(attn_l, g.compact_src.seg.row_seg, axis=0),
                )
                feat_c_dst = ops.compact_typed_linear(g, x_dst, conv_w, side="dst")
                er_c = jnp.einsum(
                    "uhd,uhd->uh",
                    feat_c_dst,
                    jnp.take(attn_r, g.compact_dst.seg.row_seg, axis=0),
                )
                h = ops.relational_fused_gat_compact(
                    g, feat_c_src, el_c, er_c, self.leaky_relu_slope,
                    stable=self.stable_softmax,
                )
        else:
            rel_e = g.rel
            if self.multiply_first:
                wa_l = jnp.einsum("rhkd,rhd->rhk", conv_w, attn_l)
                wa_r = jnp.einsum("rhkd,rhd->rhk", conv_w, attn_r)
                w_cat = jnp.concatenate([conv_w, wa_l[..., None]], axis=-1)
                fe = ops.edge_typed_linear(g, x, w_cat, side="src")
                feat_src_e, el = fe[..., :D], fe[..., D]
                er = ops.edge_typed_linear(g, x_dst, wa_r[..., None], "dst")[..., 0]
            else:
                feat_src_e = ops.edge_typed_linear(g, x, conv_w, side="src")
                el = ops.edge_rel_inner(g, feat_src_e, attn_l)
                feat_dst_e = ops.edge_typed_linear(g, x_dst, conv_w, side="dst")
                er = ops.edge_rel_inner(g, feat_dst_e, attn_r)
            h = ops.relational_fused_gat(
                g, feat_src_e, el, er, self.leaky_relu_slope,
                stable=self.stable_softmax,
            )  # (N, H, D)
        h = h.reshape(g.num_nodes, self.out_feat)

        if self.self_loop:
            loop_w = self.param(
                "loop_weight", init, (self.in_feat, self.out_feat),
                self.param_dtype,
            )
            h = h + x_dst @ loop_w
        if self.bias:
            b = self.param(
                "h_bias", nn.initializers.zeros, (self.out_feat,),
                self.param_dtype,
            )
            h = h + b
        if self.activation is not None:
            h = self.activation(h)
        h = nn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
        return h


class RGATModel(nn.Module):
    """Multi-layer RGAT (reference ``HET_RGATModel``, models.py:388)."""

    in_feat: int
    hidden: int
    num_classes: int
    num_rels: int
    num_heads: int
    num_layers: int = 2
    compact: bool = False
    multiply_first: bool = False
    dropout: float = 0.5
    stable_softmax: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, g: HeteroGraph, x: Array, *, deterministic: bool = True
    ) -> Array:
        kw = dict(
            num_rels=self.num_rels,
            num_heads=self.num_heads,
            compact=self.compact,
            multiply_first=self.multiply_first,
            dropout=self.dropout,
            stable_softmax=self.stable_softmax,
            param_dtype=self.param_dtype,
        )
        h = x
        dims = (
            [self.in_feat]
            + [self.hidden] * (self.num_layers - 1)
            + [self.num_classes]
        )
        for i in range(self.num_layers):
            act = jax.nn.relu if i < self.num_layers - 1 else None
            h = RGATLayer(
                in_feat=dims[i], out_feat=dims[i + 1], activation=act, **kw
            )(g, h, deterministic=deterministic)
        return h
